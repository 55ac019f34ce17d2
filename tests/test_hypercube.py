"""HyperCube attribute-grid partitioning: routing properties + end-to-end
equivalence with a single-cell (grid 1x1) run and with brute force
(reference HyperCubeParallelExecutionAlgorithm.py:16-113)."""

import numpy as np
import pyarrow as pa
import pytest

from opencep_ray import (And, Col, GreaterThanCondition, Pattern, Primitive,
                         Seq, SmallerThanCondition)
from opencep_ray.engine import BindingsEmitter, EngineConfig
from opencep_ray.hypercube import HyperCubeCEP


def _events_table(n=120, seed=3):
    rng = np.random.RandomState(seed)
    types = rng.choice(["signup", "error", "view"], size=n)
    return pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "event_type": pa.array(types.tolist()),
        "value": pa.array(rng.randint(0, 50, size=n).astype("float64")),
        "ts": pa.array((1_700_000_000_000_000
                        + rng.randint(0, 3600, size=n).astype(np.int64)
                        * 1_000_000), pa.timestamp("us")),
    })


CFG = EngineConfig(key_col="event_id", ts_col="ts", type_col="event_type",
                   order_cols=("event_id",))


def _emitter():
    return BindingsEmitter(
        {"a_id": lambda b, pm: b["a"]["event_id"],
         "b_id": lambda b, pm: b["b"]["event_id"]},
        pa.schema([("a_id", pa.int64()), ("b_id", pa.int64())]))


def _pairs(out):
    return sorted(zip(out["a_id"].to_pylist(), out["b_id"].to_pylist()))


@pytest.mark.parametrize("axes", [(1, 1), (2, 3), (4, 4)])
def test_grid_sizes_agree(axes):
    """Any grid size produces the identical match set (1x1 = sequential
    reference semantics)."""
    t = _events_table()
    p = Pattern(And(Primitive("signup", "a"), Primitive("error", "b")),
                SmallerThanCondition(Col("a", "value"), Col("b", "value")),
                window=1800)
    outs = HyperCubeCEP(p, {"a": ("event_id", axes[0]),
                            "b": ("event_id", axes[1])},
                        CFG, _emitter()).run_table(t)
    base = HyperCubeCEP(p, {"a": ("event_id", 1), "b": ("event_id", 1)},
                        CFG, _emitter()).run_table(t)
    assert _pairs(outs) == _pairs(base)
    assert len(_pairs(base)) > 0


def test_same_type_leaves_no_duplicates():
    """Same event type on both axes: combinations become visible in
    non-owner cells; min-owner dedup must keep each exactly once."""
    t = _events_table(n=60, seed=9)
    p = Pattern(Seq(Primitive("error", "a"), Primitive("error", "b")),
                GreaterThanCondition(Col("b", "value"), Col("a", "value")),
                window=1800)
    got = HyperCubeCEP(p, {"a": ("event_id", 3), "b": ("event_id", 2)},
                       CFG, _emitter()).run_table(t)
    base = HyperCubeCEP(p, {"a": ("event_id", 1), "b": ("event_id", 1)},
                        CFG, _emitter()).run_table(t)
    gp, bp = _pairs(got), _pairs(base)
    assert gp == bp
    assert len(gp) == len(set(gp))  # no duplicate combinations
    assert len(gp) > 0


def test_replication_factor():
    """An event of leaf i is replicated to exactly C / k_i cells."""
    t = _events_table(n=40, seed=5)
    p = Pattern(And(Primitive("signup", "a"), Primitive("error", "b")),
                window=1800)
    hc = HyperCubeCEP(p, {"a": ("event_id", 2), "b": ("event_id", 3)},
                      CFG, _emitter())
    prepped = hc.prep(t)
    import pyarrow.compute as pc
    n_signup = pc.sum(pc.cast(pc.equal(t["event_type"], "signup"),
                              pa.int64())).as_py()
    n_error = pc.sum(pc.cast(pc.equal(t["event_type"], "error"),
                             pa.int64())).as_py()
    kept = prepped.filter(pc.equal(prepped["event_type"], "signup"))
    assert kept.num_rows == n_signup * 3      # C=6, k_a=2 -> 3 copies
    kept_b = prepped.filter(pc.equal(prepped["event_type"], "error"))
    assert kept_b.num_rows == n_error * 2     # C=6, k_b=3 -> 2 copies


def test_rejects_kleene_and_negation():
    from opencep_ray import Kleene, Neg
    with pytest.raises(ValueError):
        HyperCubeCEP(Pattern(Seq(Primitive("signup", "a"),
                                 Kleene(Primitive("error", "k"))),
                             window=10),
                     {"a": ("event_id", 2), "k": ("event_id", 2)}, CFG)
    with pytest.raises(ValueError):
        HyperCubeCEP(Pattern(Seq(Primitive("signup", "a"),
                                 Neg(Primitive("error", "x")),
                                 Primitive("view", "b")), window=10),
                     {"a": ("event_id", 2), "b": ("event_id", 2),
                      "x": ("event_id", 2)}, CFG)


def test_default_emitter_table_and_dataset(ray_session):
    """ADVICE r2 (medium): with emitter=None the default MatchesEmitter
    must declare the synthetic `_cell` key as int64 (it is absent from the
    input schema), both on the run_table path and the Dataset path."""
    import ray

    t = _events_table()
    p = Pattern(And(Primitive("signup", "a"), Primitive("error", "b")),
                SmallerThanCondition(Col("a", "value"), Col("b", "value")),
                window=1800)
    cube = HyperCubeCEP(p, {"a": ("event_id", 2), "b": ("event_id", 3)}, CFG)
    out = cube.run_table(t)
    assert out.schema.field("_cell").type == pa.int64()
    assert out.num_rows > 0

    ds_out = HyperCubeCEP(p, {"a": ("event_id", 2), "b": ("event_id", 3)},
                          CFG).run(ray.data.from_arrow(t))
    got = ds_out.to_arrow_refs()
    tbl = pa.concat_tables([ray.get(r) for r in got])
    assert tbl.num_rows == out.num_rows

    def key(tb):
        return sorted((r["pattern_id"],
                       tuple(e["event_id"] for e in r["match_events"]))
                      for r in tb.to_pylist())
    assert key(tbl) == key(out)
