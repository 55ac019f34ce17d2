"""Every public EngineConfig knob exercised end-to-end (round-4 VERDICT
ask #8): the four knobs no other test flips — ``type_fn``
(tool-as-type), ``prob_col`` + ``Pattern.confidence``,
``slice_multiple`` (hot-key slicing granularity), and ``hash_shuffle``
(the exchange-strategy flag kept after the round-3 A/B).  Each is a
results-invariance or oracle check, not just a smoke call."""

import pyarrow as pa
import pytest

from opencep_ray import (Pattern, Primitive, Seq, SimpleCondition,
                         Variable)
from opencep_ray.engine import CEP, EngineConfig, transcript_config
from opencep_ray.oracle import oracle_matches
from opencep_ray.sources.transcripts import synth_transcripts, text_v

from test_engine_ray import PATTERNS, canonical_matches


def test_type_fn_tool_as_type():
    """``type_fn`` derives the event type per batch: with
    ``tool_as_type`` a tool turn's type is the tool NAME, so a pattern
    over a specific tool matches only that tool's turns — checked
    against a manual filter of the same table."""
    table = synth_transcripts(30, 14, seed=11)
    tools = set(pa.compute.drop_null(table["tool"]).to_pylist())
    tool = sorted(tools)[0]
    p = Pattern(Seq(Primitive("user", "a"), Primitive(tool, "b")),
                window=180)
    cfg = transcript_config(num_partitions=4, tool_as_type=True)
    got = canonical_matches(CEP(p, cfg).run_table(table))
    assert got, "fixture must produce at least one match"
    # every matched b-turn really carries that tool
    rows = {(r["conv_id"], e["turn_idx"])
            for r in CEP(p, cfg).run_table(table).to_pylist()
            for e in r["match_events"][1:]}
    tool_turns = {(c, t) for c, t, tl in zip(
        table["conv_id"].to_pylist(), table["turn_idx"].to_pylist(),
        table["tool"].to_pylist()) if tl == tool}
    assert rows <= tool_turns
    # and with type_fn=None the same pattern finds nothing (no event
    # has type == tool name when types come from the role column)
    cfg_off = transcript_config(num_partitions=4, tool_as_type=False)
    assert CEP(p, cfg_off).run_table(table).num_rows == 0


def test_prob_col_confidence_threshold():
    """``prob_col`` + ``Pattern.confidence``: match probability is the
    product of member-event probabilities; matches below the threshold
    are dropped (reference probabilistic streams).  Checked against the
    brute-force oracle on the same (payload, type, ts, prob) stream."""
    table = synth_transcripts(20, 10, seed=7)
    # deterministic per-row probability in (0, 1]
    n = table.num_rows
    probs = pa.array([0.3 + 0.7 * ((i * 37) % 10) / 9.0
                      for i in range(n)], pa.float64())
    table = table.append_column("p", probs)
    p = Pattern(Seq(Primitive("user", "a"), Primitive("assistant", "b")),
                SimpleCondition(Variable("a", text_v),
                                Variable("b", text_v),
                                relation_op=lambda x, y: y > x),
                window=120, confidence=0.5)
    cfg = EngineConfig(key_col="conv_id", ts_col="ts", type_col="role",
                       order_cols=("turn_idx",), prob_col="p",
                       num_partitions=3)
    out = CEP(p, cfg).run_table(table)
    got_probs = out["probability"].to_pylist()
    assert got_probs and all(pr >= 0.5 for pr in got_probs)
    # oracle comparison per conversation
    import collections
    by_conv = collections.defaultdict(list)
    for row in table.sort_by([("conv_id", "ascending"),
                              ("turn_idx", "ascending")]).to_pylist():
        by_conv[row["conv_id"]].append(row)
    expected = 0
    for conv, rows in by_conv.items():
        evs = [({k: r[k] for k in r}, r["role"],
                int(r["ts"].timestamp() * 1e6)
                if hasattr(r["ts"], "timestamp") else r["ts"])
               for r in rows]
        pr = [r["p"] for r in rows]
        expected += len(oracle_matches(p, evs, probs=pr))
    assert out.num_rows == expected


@pytest.mark.parametrize("slice_multiple", [1, 3, 24])
def test_slice_multiple_invariance(slice_multiple):
    """Hot-key time-slicing granularity must not change the match set
    (first-owner-wins invariant): the same skewed table run with the
    hot key sliced coarse and fine equals the unsliced run."""
    base = synth_transcripts(6, 40, seed=3)
    # make one conversation hot by renaming half the convs onto it
    conv = base["conv_id"].to_pylist()
    hot = [("hotconv" if c.endswith(("0", "1", "2")) else c)
           for c in conv]
    table = base.set_column(base.column_names.index("conv_id"),
                            "conv_id", pa.array(hot, pa.string()))
    p = PATTERNS[0]
    plain = canonical_matches(
        CEP(p, transcript_config(num_partitions=4)).run_table(table))
    cfg = transcript_config(num_partitions=4, hot_keys=["hotconv"])
    cfg.slice_multiple = slice_multiple
    sliced = canonical_matches(CEP(p, cfg).run_table(table))
    assert sliced == plain and plain


def test_hash_shuffle_same_matches(ray_session):
    """``hash_shuffle=True`` (Ray's hash-shuffle exchange instead of the
    sort-based one) is a pure execution-strategy flag: identical match
    set on the distributed path."""
    import ray.data as rd
    table = synth_transcripts(25, 12, seed=5)
    p = PATTERNS[0]
    cfg_sort = transcript_config(num_partitions=4)
    cfg_hash = transcript_config(num_partitions=4)
    cfg_hash.hash_shuffle = True
    a = canonical_matches(
        pa.Table.from_pandas(
            CEP(p, cfg_sort).run(rd.from_arrow(table)).to_pandas()))
    b = canonical_matches(
        pa.Table.from_pandas(
            CEP(p, cfg_hash).run(rd.from_arrow(table)).to_pandas()))
    assert a == b and a
