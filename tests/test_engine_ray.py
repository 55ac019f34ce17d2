"""Ray Data engine: distributed result == single-process result ==
per-conversation oracle, over synthetic transcripts."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from opencep_ray import (And, AndCondition, Col, GreaterThanCondition, Kleene,
                         Neg, Pattern, Primitive, Seq, SimpleCondition,
                         SmallerThanCondition, Variable)
from opencep_ray.engine import CEP, transcript_config
from opencep_ray.oracle import oracle_matches
from opencep_ray.sources.transcripts import synth_transcripts, text_v


def canonical_matches(table: pa.Table):
    rows = table.to_pylist()
    out = []
    for r in rows:
        ev_key = tuple((e["turn_idx"], e["role"], e["text"])
                       for e in r["match_events"])
        out.append((r["pattern_id"], r["conv_id"], ev_key,
                    r["probability"]))
    return sorted(out, key=repr)


PATTERNS = [
    Pattern(Seq(Primitive("user", "a"), Primitive("assistant", "b")),
            SimpleCondition(Variable("a", text_v), Variable("b", text_v),
                            relation_op=lambda x, y: y > x),
            window=120),
    Pattern(Seq(Primitive("user", "a"), Kleene(Primitive("assistant", "b"),
                                               max_size=3),
                Primitive("tool", "c")),
            window=180),
    Pattern(Seq(Primitive("user", "a"), Neg(Primitive("tool", "x")),
                Primitive("assistant", "b")),
            window=150),
    Pattern(And(Primitive("user", "a"), Primitive("tool", "b")),
            GreaterThanCondition(Col("b", "turn_idx"), Col("a", "turn_idx")),
            window=90),
]


@pytest.mark.parametrize("pattern_idx", range(len(PATTERNS)))
def test_run_table_matches_oracle(pattern_idx):
    """Single-process engine vs brute-force oracle, per conversation."""
    pattern = PATTERNS[pattern_idx]
    table = synth_transcripts(25, 12, seed=pattern_idx)
    cep = CEP(pattern, transcript_config(num_partitions=5))
    got = canonical_matches(cep.run_table(table))

    want = []
    for conv in pc.unique(table["conv_id"]).to_pylist():
        sub = table.filter(pc.equal(table["conv_id"], conv))
        idx = pc.sort_indices(sub, sort_keys=[("ts", "ascending"),
                                              ("turn_idx", "ascending")])
        sub = sub.take(idx)
        events = []
        for r in sub.to_pylist():
            ts_us = int(r["ts"].timestamp() * 1_000_000)
            payload = dict(r)
            payload["ts"] = ts_us
            events.append((payload, r["role"], ts_us))
        for key, pid, prob, binding in oracle_matches(pattern, events):
            flat = []
            for slot_idxs in key:
                for i in slot_idxs:
                    e = events[i][0]
                    flat.append((e["turn_idx"], e["role"], e["text"]))
            want.append((pid, conv, tuple(flat), prob))
    want = sorted(want, key=repr)
    assert got == want


def test_ray_run_equals_run_table(ray_session):
    import ray.data as rd
    table = synth_transcripts(60, 15, seed=99)
    pattern = PATTERNS[0]
    cep = CEP(pattern, transcript_config(num_partitions=7))
    local = canonical_matches(cep.run_table(table))
    ds = rd.from_arrow(table).repartition(6)
    batches = list(cep.run(ds).iter_batches(batch_format="pyarrow",
                                            batch_size=10_000))
    dist = canonical_matches(pa.concat_tables(batches)) if batches else []
    assert dist == local
    assert len(local) > 0


def test_ray_multi_pattern(ray_session):
    import ray.data as rd
    table = synth_transcripts(40, 12, seed=5)
    pats = [Pattern(Seq(Primitive("user", "a"), Primitive("assistant", "b")),
                    window=60, pattern_id=1),
            Pattern(And(Primitive("user", "a"), Primitive("tool", "b")),
                    window=60, pattern_id=2)]
    cep = CEP(pats, transcript_config(num_partitions=4))
    local = canonical_matches(cep.run_table(table))
    ds = rd.from_arrow(table).repartition(5)
    batches = list(cep.run(ds).iter_batches(batch_format="pyarrow",
                                            batch_size=10_000))
    dist = canonical_matches(pa.concat_tables(batches)) if batches else []
    assert dist == local
    pids = {m[0] for m in local}
    assert pids == {1, 2}


def test_vector_pushdown_equivalence():
    """Declarative leaf conditions pushed down vectorized pre-shuffle give
    exactly the Python-path results, and actually prune rows."""
    from opencep_ray.engine import EngineConfig, _Prep, build_type_prefilters
    from opencep_ray.evaluator import compile_patterns
    import ray.data as rd

    table = synth_transcripts(40, 15, seed=17)
    p = Pattern(Seq(Primitive("user", "a"), Primitive("assistant", "b")),
                AndCondition(
                    GreaterThanCondition(Col("a", "turn_idx"), 2),
                    SmallerThanCondition(Col("b", "turn_idx"), 12)),
                window=200)
    cfg_on = transcript_config(num_partitions=4)
    cfg_off = transcript_config(num_partitions=4)
    cfg_off.vector_pushdown = False
    got_on = canonical_matches(CEP(p, cfg_on).run_table(table))
    got_off = canonical_matches(CEP(p, cfg_off).run_table(table))
    assert got_on == got_off
    assert len(got_on) > 0

    cep = CEP(p, cfg_on)
    prefilters = build_type_prefilters(cep.compiled)
    assert "user" in prefilters and "assistant" in prefilters
    prep = _Prep(cep.cfg, cep.types_needed, 4, cep.max_window_us,
                 prefilters)
    pruned = prep(table).num_rows
    prep_off = _Prep(cep.cfg, cep.types_needed, 4, cep.max_window_us, {})
    unpruned = prep_off(table).num_rows
    assert pruned < unpruned
