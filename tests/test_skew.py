"""Hot-key (skew) handling: RIP-style time-slice salting with window
overlap + owner-slice dedup must produce exactly the un-salted match set
(reference invariant: parallel/data_parallel/RIPParallelExecutionAlgorithm.py:45-52).
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from opencep_ray import (Kleene, Neg, Pattern, Primitive, Seq,
                         SimpleCondition, Variable)
from opencep_ray.engine import CEP, transcript_config
from opencep_ray.sources.transcripts import SCHEMA, synth_transcripts, text_v
from opencep_ray.streaming import StreamingCEP, read_matches

PATTERNS = [
    Pattern(Seq(Primitive("user", "a"), Primitive("assistant", "b")),
            SimpleCondition(Variable("a", text_v), Variable("b", text_v),
                            relation_op=lambda x, y: y > x),
            window=120, pattern_id=1),
    Pattern(Seq(Primitive("user", "a"), Neg(Primitive("tool", "x")),
                Primitive("assistant", "b")),
            window=90, pattern_id=2),
    Pattern(Seq(Primitive("user", "a"),
                Kleene(Primitive("assistant", "b"), max_size=2)),
            window=60, pattern_id=3),
    # leading negation looks BACKWARD from the match start — exercises the
    # forward slice overlap; trailing negation is unbounded (pending+flush)
    Pattern(Seq(Neg(Primitive("tool", "x")), Primitive("user", "a"),
                Primitive("assistant", "b")),
            window=90, pattern_id=4),
    Pattern(Seq(Primitive("user", "a"), Primitive("assistant", "b"),
                Neg(Primitive("tool", "x"))),
            window=90, pattern_id=5),
]


def make_skewed_table(n_hot_turns=4000, seed=3):
    """A few normal conversations plus one very hot conversation spanning
    many time slices."""
    normal = synth_transcripts(30, 12, seed=seed)
    rng = np.random.RandomState(seed)
    roles = np.where(np.arange(n_hot_turns) % 2 == 0, "user", "assistant")
    roles = np.where(rng.rand(n_hot_turns) < 0.1, "tool", roles)
    gaps = rng.randint(0, 40, n_hot_turns).astype(np.int64) * 1_000_000
    gaps[0] = 0
    ts = 1_700_000_000_000_000 + np.cumsum(gaps)
    v = rng.randint(0, 100, n_hot_turns)
    hot = pa.table({
        "conv_id": pa.array(["hotconv"] * n_hot_turns),
        "turn_idx": pa.array(np.arange(n_hot_turns, dtype=np.int32)),
        "role": pa.array(roles.tolist()),
        "text": pa.array([f"msg {i} v={v[i]}" for i in range(n_hot_turns)]),
        "tool": pa.array([None] * n_hot_turns, pa.string()),
        "ts": pa.array(ts, pa.timestamp("us")),
    })
    return pa.concat_tables([normal.cast(SCHEMA), hot.cast(SCHEMA)])


def canonical(table: pa.Table):
    out = []
    for r in table.to_pylist():
        ev_key = tuple((e["turn_idx"], e["role"]) for e in r["match_events"])
        out.append((r["pattern_id"], r["conv_id"], ev_key))
    return sorted(out, key=repr)


def test_batch_hot_key_salting_exact():
    table = make_skewed_table()
    plain = CEP(PATTERNS, transcript_config(num_partitions=6))
    want = canonical(plain.run_table(table))

    salted = CEP(PATTERNS, transcript_config(num_partitions=6,
                                             hot_keys=["hotconv"]))
    got = canonical(salted.run_table(table))
    assert got == want
    assert len(want) > 1000  # the hot conv dominates

    # the hot conversation must actually spread across partitions
    prep = salted._emitter_for(table.schema)  # noqa: F841 (emitter built)
    from opencep_ray.engine import _Prep
    p = _Prep(salted.cfg, salted.types_needed, 6, salted.max_window_us)
    prepped = p(table)
    import pyarrow.compute as pc
    hot_rows = prepped.filter(pc.equal(prepped["conv_id"], "hotconv"))
    n_parts = len(pc.unique(hot_rows["_part"]))
    assert n_parts > 1, "hot conversation stayed on one partition"
    # overlap duplication exists but is bounded
    assert hot_rows.num_rows >= 4000
    assert hot_rows.num_rows < 4000 * 1.5


def test_streaming_hot_key_salting_exact(ray_session, tmp_path):
    table = make_skewed_table(n_hot_turns=2500, seed=9)
    src = str(tmp_path / "skew.parquet")
    pq.write_table(table, src)

    plain = CEP(PATTERNS, transcript_config(num_partitions=6))
    want = canonical(plain.run_table(table))

    out_dir = str(tmp_path / "out")
    s = StreamingCEP(PATTERNS,
                     transcript_config(hot_keys=["hotconv"]),
                     num_workers=4)
    s.run_files([src], out_dir, micro_batch_rows=700)
    got = canonical(read_matches(out_dir))
    assert got == want
