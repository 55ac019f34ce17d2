"""Streaming engine: equivalence with the batch engine, checkpoint/resume
with byte-identical output, watermark-driven state eviction."""

import glob
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from opencep_ray import (Kleene, Neg, Pattern, Primitive, Seq,
                         SimpleCondition, Variable)
from opencep_ray.engine import CEP, transcript_config
from opencep_ray.sources.transcripts import synth_transcripts, text_v
from opencep_ray.streaming import StreamingCEP, read_matches

PATTERNS = [
    Pattern(Seq(Primitive("user", "a"), Primitive("assistant", "b")),
            SimpleCondition(Variable("a", text_v), Variable("b", text_v),
                            relation_op=lambda x, y: y > x),
            window=120, pattern_id=1),
    Pattern(Seq(Primitive("user", "a"),
                Kleene(Primitive("assistant", "b"), max_size=3),
                Primitive("tool", "c")),
            window=180, pattern_id=2),
    Pattern(Seq(Primitive("user", "a"), Neg(Primitive("tool", "x")),
                Primitive("assistant", "b")),
            window=150, pattern_id=3),
]


def canonical(table: pa.Table):
    out = []
    for r in table.to_pylist():
        ev_key = tuple((e["turn_idx"], e["role"], e["text"])
                       for e in r["match_events"])
        out.append((r["pattern_id"], r["conv_id"], ev_key))
    return sorted(out, key=repr)


@pytest.fixture(scope="module")
def input_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_in")
    table = synth_transcripts(120, 14, seed=21)
    # several files, conversations contiguous, one conv split across files
    n = table.num_rows
    cuts = [0, n // 3 + 5, 2 * n // 3 - 3, n]
    files = []
    for i in range(3):
        p = str(d / f"part-{i}.parquet")
        pq.write_table(table.slice(cuts[i], cuts[i + 1] - cuts[i]), p)
        files.append(p)
    return files, table


def test_stream_equals_batch(ray_session, input_files, tmp_path):
    files, table = input_files
    out_dir = str(tmp_path / "out")
    s = StreamingCEP(PATTERNS, transcript_config(), num_workers=3)
    stats = s.run_files(files, out_dir, micro_batch_rows=200)
    got = canonical(read_matches(out_dir))

    cep = CEP(PATTERNS, transcript_config(num_partitions=5))
    want = canonical(cep.run_table(table))
    assert got == want
    assert len(got) > 0
    assert stats["rows"] > 0


def test_stream_key_contiguous_equals_batch(ray_session, input_files,
                                            tmp_path):
    """key_contiguous_input: identical results, bounded worker state (only
    keys straddling the final batch stay live at end-of-stream)."""
    files, table = input_files
    out_dir = str(tmp_path / "out")
    s = StreamingCEP(PATTERNS, transcript_config(), num_workers=3,
                     key_contiguous_input=True)
    stats = s.run_files(files, out_dir, micro_batch_rows=200)
    got = canonical(read_matches(out_dir))

    cep = CEP(PATTERNS, transcript_config(num_partitions=5))
    want = canonical(cep.run_table(table))
    assert got == want
    assert len(got) > 0
    # state bound: far fewer than the 120 conversations stay live
    assert stats["live_conversations"] <= 10


def test_stream_key_contiguous_resume(ray_session, input_files, tmp_path):
    """Eviction is deterministic per batch: crash/resume stays
    byte-identical under key_contiguous_input."""
    files, table = input_files
    full_dir = str(tmp_path / "full")
    mk = lambda: StreamingCEP(PATTERNS, transcript_config(), num_workers=3,
                              checkpoint_every=2, key_contiguous_input=True)
    mk().run_files(files, full_dir, micro_batch_rows=150)
    full = canonical(read_matches(full_dir))

    crash_dir = str(tmp_path / "crash")

    class CrashingStream(StreamingCEP):
        def _micro_batch_plan(self, files_, rows, *a, **kw):
            for item in super()._micro_batch_plan(files_, rows, *a, **kw):
                if item[0] >= 12:
                    raise RuntimeError("simulated crash")
                yield item

    s2 = CrashingStream(PATTERNS, transcript_config(), num_workers=3,
                        checkpoint_every=2, key_contiguous_input=True)
    with pytest.raises(RuntimeError):
        s2.run_files(files, crash_dir, micro_batch_rows=150)
    mk().run_files(files, crash_dir, micro_batch_rows=150, resume=True)
    assert canonical(read_matches(crash_dir)) == full

    full_files = sorted(os.path.basename(p) for p in
                        glob.glob(os.path.join(full_dir, "part-*.parquet")))
    crash_files = sorted(os.path.basename(p) for p in
                         glob.glob(os.path.join(crash_dir,
                                                "part-*.parquet")))
    assert full_files == crash_files
    for name in full_files:
        a = pq.read_table(os.path.join(full_dir, name))
        b = pq.read_table(os.path.join(crash_dir, name))
        assert a.equals(b), f"content mismatch in {name}"


def test_resume_byte_identical(ray_session, input_files, tmp_path):
    files, table = input_files
    full_dir = str(tmp_path / "full")
    s = StreamingCEP(PATTERNS, transcript_config(), num_workers=3,
                     checkpoint_every=2)
    s.run_files(files, full_dir, micro_batch_rows=150)
    full = canonical(read_matches(full_dir))

    # simulate a crash: run only a prefix of batches by truncating the file
    # list mid-stream, keeping the manifest/checkpoint, then resume
    crash_dir = str(tmp_path / "crash")

    class CrashingStream(StreamingCEP):
        def _micro_batch_plan(self, files_, rows, *a, **kw):
            for item in super()._micro_batch_plan(files_, rows, *a, **kw):
                # crash late enough that a checkpoint has been
                # committed: the driver routes max_in_flight batches
                # ahead of submission, so plan consumption leads drains
                # by up to 2x max_in_flight batches
                if item[0] >= 12:
                    raise RuntimeError("simulated crash")
                yield item

    s2 = CrashingStream(PATTERNS, transcript_config(), num_workers=3,
                        checkpoint_every=2)
    with pytest.raises(RuntimeError):
        s2.run_files(files, crash_dir, micro_batch_rows=150)
    assert os.path.exists(os.path.join(crash_dir, "manifest.json"))

    s3 = StreamingCEP(PATTERNS, transcript_config(), num_workers=3,
                      checkpoint_every=2)
    s3.run_files(files, crash_dir, micro_batch_rows=150, resume=True)
    resumed = canonical(read_matches(crash_dir))
    assert resumed == full

    # byte-level: same part files, same contents
    full_files = sorted(os.path.basename(p) for p in
                        glob.glob(os.path.join(full_dir, "part-*.parquet")))
    crash_files = sorted(os.path.basename(p) for p in
                         glob.glob(os.path.join(crash_dir,
                                                "part-*.parquet")))
    assert full_files == crash_files
    for name in full_files:
        a = pq.read_table(os.path.join(full_dir, name))
        b = pq.read_table(os.path.join(crash_dir, name))
        assert a.equals(b), f"content mismatch in {name}"


def test_watermark_eviction(ray_session, tmp_path):
    # ts-ordered input: state must shrink as the watermark advances
    table = synth_transcripts(200, 12, seed=33)
    table = table.take(pc.sort_indices(
        table, sort_keys=[("ts", "ascending"), ("conv_id", "ascending"),
                          ("turn_idx", "ascending")]))
    src = str(tmp_path / "sorted.parquet")
    pq.write_table(table, src)
    out_dir = str(tmp_path / "out")
    s = StreamingCEP(PATTERNS, transcript_config(), num_workers=2,
                     ts_ordered_input=True)
    s.run_files([src], out_dir, micro_batch_rows=300)
    got = canonical(read_matches(out_dir))
    cep = CEP(PATTERNS, transcript_config(num_partitions=4))
    want = canonical(cep.run_table(table))
    assert got == want


def test_adaptive_replan_same_results(ray_session, input_files, tmp_path):
    """Mid-stream replanning with state replay must not change results
    (join order is plan-invariant; only evaluation cost changes)."""
    files, table = input_files
    base_dir = str(tmp_path / "base")
    s1 = StreamingCEP(PATTERNS, transcript_config(), num_workers=3)
    s1.run_files(files, base_dir, micro_batch_rows=150)
    want = canonical(read_matches(base_dir))

    adaptive_dir = str(tmp_path / "adaptive")
    s2 = StreamingCEP(PATTERNS, transcript_config(), num_workers=3,
                      adaptive=True, replan_every=3,
                      tree_builder="greedy")
    s2.run_files(files, adaptive_dir, micro_batch_rows=150)
    got = canonical(read_matches(adaptive_dir))
    assert got == want


def test_plan_builders_do_not_change_results():
    """All order builders produce identical match sets (plan invariance),
    over a 3-event pattern with skewed type frequencies."""
    import pyarrow.compute as pc
    from opencep_ray import compile_patterns
    from opencep_ray.evaluator import ConversationEvaluator
    from opencep_ray.sources.transcripts import synth_transcripts, text_v
    from opencep_ray import SimpleCondition, Variable

    table = synth_transcripts(20, 15, seed=11)
    p = Pattern(Seq(Primitive("user", "a"), Primitive("assistant", "b"),
                    Primitive("tool", "c")),
                window=200)
    stats = {"arrival_rates": [100.0, 200.0, 5.0]}
    results = {}
    for builder in ("trivial", "sort_by_frequency", "greedy",
                    "dynamic_programming", "bushy",
                    "iterative_improvement", "zstream", "zstream_ord"):
        compiled = compile_patterns(p, statistics=stats,
                                    tree_builder=builder)
        out = []
        for conv in pc.unique(table["conv_id"]).to_pylist():
            sub = table.filter(pc.equal(table["conv_id"], conv))
            sub = sub.take(pc.sort_indices(
                sub, sort_keys=[("ts", "ascending"),
                                ("turn_idx", "ascending")]))
            ev = ConversationEvaluator(compiled)
            for r in sub.to_pylist():
                ev.process(dict(r), r["role"],
                           int(r["ts"].timestamp() * 1e6))
            ev.eos()
            for _cp, pm in ev.matches:
                out.append((conv, tuple(
                    e.payload["turn_idx"]
                    for e in ConversationEvaluator.primitive_events(
                        pm, compiled[0]))))
        results[builder] = sorted(out)
    base = results["trivial"]
    assert len(base) > 0
    for builder, res in results.items():
        assert res == base, builder


def test_load_shedding_valve(ray_session, tmp_path):
    """The optional shedding valve bounds live partial matches, trading
    recall: the shed run's matches are a strict subset of the full run's
    (reference fork behavior, engine/LoadSheddingCEP.py)."""
    import json
    from opencep_ray.evaluator import SheddingConfig

    table = synth_transcripts(6, 300, seed=44)   # long convs -> many partials
    src = str(tmp_path / "long.parquet")
    pq.write_table(table, src)
    wide = [Pattern(Seq(Primitive("user", "a"), Primitive("assistant", "b")),
                    window=3600, pattern_id=1)]

    full_dir = str(tmp_path / "full")
    StreamingCEP(wide, transcript_config(), num_workers=2) \
        .run_files([src], full_dir, micro_batch_rows=300)
    full = set(canonical(read_matches(full_dir)))

    shed_dir = str(tmp_path / "shed")
    StreamingCEP(wide, transcript_config(), num_workers=2,
                 shedding=SheddingConfig(max_partial_matches=40,
                                         target=20)) \
        .run_files([src], shed_dir, micro_batch_rows=300)
    shed = set(canonical(read_matches(shed_dir)))

    assert shed < full            # strictly fewer matches (recall tradeoff)
    assert len(shed) > 0
    metrics = json.load(open(os.path.join(shed_dir, "metrics.json")))
    assert metrics["total_shed_partials"] > 0
    full_metrics = json.load(open(os.path.join(full_dir, "metrics.json")))
    assert full_metrics["total_shed_partials"] == 0


def test_bushy_shape_prefers_cheap_pairs():
    from opencep_ray.plan import bushy_shape
    # args 0,1 are hugely selective together; 2,3 likewise -> balanced tree
    sel = [[1.0] * 4 for _ in range(4)]
    sel[0][1] = sel[1][0] = 0.001
    sel[2][3] = sel[3][2] = 0.001
    shape = bushy_shape(4, [100.0, 100.0, 100.0, 100.0], sel)
    flat = repr(shape)
    assert ("(0, 1)" in flat or "(1, 0)" in flat)
    assert ("(2, 3)" in flat or "(3, 2)" in flat)


def test_deviation_aware_replan_trigger(ray_session, input_files, tmp_path):
    """DeviationAwareTester semantics: with a huge threshold only the
    initial (no-snapshot) replan fires; with a tight threshold on a
    drift-free stream no further replans fire either; results always
    match the non-adaptive run."""
    files, table = input_files
    base_dir = str(tmp_path / "base")
    s0 = StreamingCEP(PATTERNS, transcript_config(), num_workers=3)
    s0.run_files(files, base_dir, micro_batch_rows=150)
    want = canonical(read_matches(base_dir))

    gated_dir = str(tmp_path / "gated")
    s1 = StreamingCEP(PATTERNS, transcript_config(), num_workers=3,
                      adaptive=True, replan_every=2,
                      tree_builder="greedy", deviation_threshold=1e9)
    st1 = s1.run_files(files, gated_dir, micro_batch_rows=150)
    assert st1["replans"] == 1  # first check snapshots + replans once
    assert canonical(read_matches(gated_dir)) == want

    eager_dir = str(tmp_path / "eager")
    s2 = StreamingCEP(PATTERNS, transcript_config(), num_workers=3,
                      adaptive=True, replan_every=2,
                      tree_builder="greedy")
    st2 = s2.run_files(files, eager_dir, micro_batch_rows=150)
    # unconditional periodic adaptation replans at every point
    assert st2["replans"] > st1["replans"]
    assert canonical(read_matches(eager_dir)) == want


def test_deviation_trigger_fires_on_drift(ray_session, tmp_path):
    """A stream whose type mix flips mid-way must trip a tight
    deviation threshold more than once."""
    import numpy as np
    import pyarrow.parquet as pq
    from opencep_ray.sources.transcripts import synth_transcripts

    t = synth_transcripts(60, 15, seed=5)
    # drift: first half keeps roles, second half rewrites most
    # assistant turns to tool turns (arrival-share flip)
    roles = t["role"].to_pylist()
    half = len(roles) // 2
    drifted = roles[:half] + ["tool" if r == "assistant" else r
                              for r in roles[half:]]
    t = t.set_column(t.column_names.index("role"), "role",
                     pa.array(drifted, pa.string()))
    d = tmp_path / "drift_in"
    d.mkdir()
    pq.write_table(t, str(d / "part-0.parquet"))
    files = [str(d / "part-0.parquet")]

    out1 = str(tmp_path / "out1")
    s = StreamingCEP(PATTERNS, transcript_config(), num_workers=3,
                     adaptive=True, replan_every=2,
                     tree_builder="greedy", deviation_threshold=1.1)
    st = s.run_files(files, out1, micro_batch_rows=100)
    assert st["replans"] >= 2

    # identical results to a non-adaptive run over the same input
    out2 = str(tmp_path / "out2")
    s2 = StreamingCEP(PATTERNS, transcript_config(), num_workers=3)
    s2.run_files(files, out2, micro_batch_rows=100)
    assert canonical(read_matches(out1)) == canonical(read_matches(out2))


def test_simultaneous_replan_same_results(ray_session, input_files,
                                          tmp_path):
    """The Simultaneous tree-update variant (old plan serves while the
    new one warms up for one window, then swap) yields the identical
    match set as replay-based replanning and as no replanning
    (reference SimultaneousTreeBasedEvaluationMechanism.py:14-92)."""
    files, table = input_files
    base_dir = str(tmp_path / "base")
    s0 = StreamingCEP(PATTERNS, transcript_config(), num_workers=3)
    s0.run_files(files, base_dir, micro_batch_rows=150)
    want = canonical(read_matches(base_dir))

    sim_dir = str(tmp_path / "simultaneous")
    s1 = StreamingCEP(PATTERNS, transcript_config(), num_workers=3,
                      adaptive=True, replan_every=3,
                      tree_builder="greedy", replan_mode="simultaneous")
    st = s1.run_files(files, sim_dir, micro_batch_rows=150)
    assert st["replans"] >= 1
    assert canonical(read_matches(sim_dir)) == want


def test_invariant_aware_replan_trigger(ray_session, input_files, tmp_path):
    """Invariant-aware optimizer (reference plan/invariant/*): the greedy
    plan's optimality invariants gate replans — on a drift-free stream
    only the initial plan build fires; results match non-adaptive."""
    files, table = input_files
    base_dir = str(tmp_path / "base")
    s0 = StreamingCEP(PATTERNS, transcript_config(), num_workers=3)
    s0.run_files(files, base_dir, micro_batch_rows=150)
    want = canonical(read_matches(base_dir))

    inv_dir = str(tmp_path / "inv")
    s1 = StreamingCEP(PATTERNS, transcript_config(), num_workers=3,
                      adaptive=True, replan_every=2,
                      tree_builder="greedy", invariant_aware=True)
    st = s1.run_files(files, inv_dir, micro_batch_rows=150)
    assert canonical(read_matches(inv_dir)) == want
    # stationary stream: the greedy invariants keep holding, so the
    # trigger fires far fewer times than the unconditional cadence
    n_points = st["batches"] // 2
    assert 1 <= st["replans"] < n_points


def test_resume_byte_identical_adaptive(ray_session, input_files, tmp_path):
    """Replan points are a pure function of the ABSOLUTE batch id, so a
    resumed ADAPTIVE run replays the identical replan schedule and
    reproduces byte-identical part files (a checkpoint-relative schedule
    would reorder re-written rows — ADVICE r1)."""
    import hashlib
    files, table = input_files

    def mk():
        return StreamingCEP(PATTERNS, transcript_config(), num_workers=3,
                            checkpoint_every=2, adaptive=True,
                            replan_every=3, tree_builder="greedy")

    full_dir = str(tmp_path / "full")
    mk().run_files(files, full_dir, micro_batch_rows=150)
    full = canonical(read_matches(full_dir))

    crash_dir = str(tmp_path / "crash")

    class CrashingStream(StreamingCEP):
        def _micro_batch_plan(self, files_, rows, *a, **kw):
            for item in super()._micro_batch_plan(files_, rows, *a, **kw):
                # crash late enough that a checkpoint has been
                # committed: the driver routes max_in_flight batches
                # ahead of submission, so plan consumption leads drains
                # by up to 2x max_in_flight batches
                if item[0] >= 12:
                    raise RuntimeError("simulated crash")
                yield item

    s2 = CrashingStream(PATTERNS, transcript_config(), num_workers=3,
                        checkpoint_every=2, adaptive=True,
                        replan_every=3, tree_builder="greedy")
    with pytest.raises(RuntimeError):
        s2.run_files(files, crash_dir, micro_batch_rows=150)
    mk().run_files(files, crash_dir, micro_batch_rows=150, resume=True)
    assert canonical(read_matches(crash_dir)) == full

    def digest(d):
        out = {}
        for p in sorted(glob.glob(os.path.join(d, "part-*.parquet"))):
            out[os.path.basename(p)] = hashlib.sha256(
                open(p, "rb").read()).hexdigest()
        return out

    assert digest(crash_dir) == digest(full_dir)


def test_ts_ordered_watermark_eviction_bounds_state(ray_session, tmp_path):
    """The 100 TB state story: with globally ts-ordered input and
    event-time watermarks, quiescent conversations are evicted as the
    watermark passes, so live state stays bounded by the window span —
    not by the total number of conversations — while match sets stay
    identical to the unordered run."""
    table = synth_transcripts(800, 12, seed=33)
    order = pc.sort_indices(table, sort_keys=[("ts", "ascending"),
                                              ("conv_id", "ascending"),
                                              ("turn_idx", "ascending")])
    ts_sorted = table.take(order)
    d = tmp_path / "in"
    d.mkdir()
    p = str(d / "part-0.parquet")
    pq.write_table(ts_sorted, p)

    wm_dir = str(tmp_path / "wm")
    s = StreamingCEP(PATTERNS, transcript_config(), num_workers=3,
                     ts_ordered_input=True)
    stats = s.run_files([p], wm_dir, micro_batch_rows=400)
    # conversations are spread over 30 days with ≤3-minute windows: the
    # vast majority must be evicted long before end-of-stream
    assert stats["live_conversations"] < 800 * 0.05, stats

    base_dir = str(tmp_path / "base")
    s2 = StreamingCEP(PATTERNS, transcript_config(), num_workers=3)
    stats2 = s2.run_files([p], base_dir, micro_batch_rows=400)
    assert stats2["live_conversations"] == 800  # no eviction without wm
    assert canonical(read_matches(wm_dir)) == \
        canonical(read_matches(base_dir))


def test_stream_with_sharing_equals_batch_and_resumes(ray_session,
                                                      input_files,
                                                      tmp_path):
    """Multi-pattern sharing inside streaming workers: identical match
    sets, and checkpointed shared structures (mini-trees with
    cross-referenced sinks) survive pickle/restore byte-identically."""
    import hashlib
    files, table = input_files

    def mk():
        cfg = transcript_config()
        cfg.share = "subtrees"
        return StreamingCEP(PATTERNS, cfg, num_workers=3,
                            checkpoint_every=2)

    shared_dir = str(tmp_path / "shared")
    mk().run_files(files, shared_dir, micro_batch_rows=150)
    base_dir = str(tmp_path / "base")
    s0 = StreamingCEP(PATTERNS, transcript_config(), num_workers=3)
    s0.run_files(files, base_dir, micro_batch_rows=150)
    assert canonical(read_matches(shared_dir)) == \
        canonical(read_matches(base_dir))

    crash_dir = str(tmp_path / "crash")

    class CrashingStream(StreamingCEP):
        def _micro_batch_plan(self, files_, rows, *a, **kw):
            for item in super()._micro_batch_plan(files_, rows, *a, **kw):
                # crash late enough that a checkpoint has been
                # committed: the driver routes max_in_flight batches
                # ahead of submission, so plan consumption leads drains
                # by up to 2x max_in_flight batches
                if item[0] >= 12:
                    raise RuntimeError("simulated crash")
                yield item

    cfg = transcript_config()
    cfg.share = "subtrees"
    s2 = CrashingStream(PATTERNS, cfg, num_workers=3, checkpoint_every=2)
    with pytest.raises(RuntimeError):
        s2.run_files(files, crash_dir, micro_batch_rows=150)
    mk().run_files(files, crash_dir, micro_batch_rows=150, resume=True)

    def digest(d):
        return {os.path.basename(p): hashlib.sha256(
            open(p, "rb").read()).hexdigest()
            for p in glob.glob(os.path.join(d, "part-*.parquet"))}

    assert digest(crash_dir) == digest(shared_dir)


def test_simultaneous_swap_keeps_old_pending_negation():
    """ADVICE r2 (high): at warm-up completion the swap must flush the OLD
    evaluator's pending unbounded-negation positives whose first event
    predates the warm-up start — the new evaluator never saw those events,
    so dropping the old state silently loses the match (the reference
    reports them via Tree.get_last_matches at tree replacement,
    SimultaneousTreeBasedEvaluationMechanism.py:60-66)."""
    from opencep_ray.evaluator import ConversationEvaluator, compile_patterns
    from opencep_ray.streaming import _SimultaneousEvaluator

    # trailing negation ⇒ unbounded: held pending until watermark/EOS
    pat = Pattern(Seq(Primitive("user", "a"), Neg(Primitive("tool", "x"))),
                  window=10, pattern_id=7)
    compiled = compile_patterns([pat])
    W = compiled[0].window_us  # 10 s in µs

    def run(with_swap: bool):
        old = ConversationEvaluator(compiled)
        # the pending positive: a lone user turn, never negated
        old.process({"text": "hi"}, "user", 0)
        if with_swap:
            sim = _SimultaneousEvaluator(
                old, ConversationEvaluator(compiled), W)
            # warm-up starts at 20 s (> 0 + W: the old pending's window
            # already passed), completes after one more window
            sim.process({"text": "t1"}, "assistant", 20_000_000)
            sim.process({"text": "t2"}, "assistant", 20_000_000 + W + 1)
            assert sim.new is None, "swap should have happened"
            ev = sim
        else:
            ev = old
        ev.eos()
        return [(cp.pattern_id, pm.first_ts) for cp, pm in ev.matches]

    plain = run(with_swap=False)
    assert plain == [(7, 0)]
    assert run(with_swap=True) == plain


def test_simultaneous_replan_unbounded_negation_end_to_end(
        ray_session, tmp_path):
    """End-to-end: a trailing-negation (unbounded) pattern produces the
    identical match set through replan_mode='simultaneous' as without
    replanning."""
    pats = [Pattern(Seq(Primitive("user", "a"), Neg(Primitive("tool", "x"))),
                    window=90, pattern_id=1),
            Pattern(Seq(Primitive("user", "a"), Primitive("assistant", "b")),
                    window=120, pattern_id=2)]
    table = synth_transcripts(100, 14, seed=5)
    d = tmp_path / "in"
    d.mkdir()
    p = str(d / "part-0.parquet")
    pq.write_table(table, p)

    base_dir = str(tmp_path / "base")
    StreamingCEP(pats, transcript_config(), num_workers=3) \
        .run_files([p], base_dir, micro_batch_rows=100)
    want = canonical(read_matches(base_dir))
    assert len(want) > 0

    sim_dir = str(tmp_path / "sim")
    s1 = StreamingCEP(pats, transcript_config(), num_workers=3,
                      adaptive=True, replan_every=2,
                      tree_builder="greedy", replan_mode="simultaneous")
    st = s1.run_files([p], sim_dir, micro_batch_rows=100)
    assert st["replans"] >= 1
    assert canonical(read_matches(sim_dir)) == want


@pytest.mark.slow
def test_soak_bounded_memory_and_state(ray_session, tmp_path):
    """Standing soak regression guard (round-4 VERDICT ask #7): a
    sustained micro-batched run with per-batch sampling must show live
    evaluator state and worker RSS PLATEAUING, not tracking stream
    position.  Uses the bench flagship's key-contiguous recycling (the
    same mechanism the 10x smoke evidences at 80M turns); the
    ts-ordered watermark variant is covered by
    test_ts_ordered_watermark_eviction_bounds_state."""
    table = synth_transcripts(20_000, 12, seed=44)
    d = tmp_path / "soak_in"
    d.mkdir()
    p = str(d / "part-0.parquet")
    pq.write_table(table, p)

    out = str(tmp_path / "soak_out")
    s = StreamingCEP(PATTERNS, transcript_config(), num_workers=3,
                     checkpoint_every=10 ** 9, key_contiguous_input=True)
    stats = s.run_files([p], out, micro_batch_rows=6_000,
                        sample_every=4)
    samples = stats["samples"]
    assert len(samples) >= 6, stats
    for smp in samples:
        assert {"batch_id", "rows", "live_conversations", "rss_mb_max",
                "rss_mb_sum"} <= set(smp)
        # bounded state: live evaluators stay a small multiple of the
        # conversations present in one micro-batch (~500), never the
        # ~k*batch conversations already streamed past
        assert smp["live_conversations"] < 4_000, smp
    # flat memory: the last sample's worker RSS must not exceed the
    # early-run level by more than a generous allocator-noise margin
    # (skipped where rss_mb is the ru_maxrss monotone peak — non-Linux)
    if not samples[-1].get("rss_is_peak"):
        early = max(s_["rss_mb_max"] for s_ in samples[:3])
        late = samples[-1]["rss_mb_max"]
        assert late <= early * 1.35 + 64, (early, late, samples)
    # and the run's final live count reflects recycling too
    assert stats["live_conversations"] < 4_000, stats


def test_live_jsonl_tail_spool_exactly_once(ray_session, tmp_path):
    """Live-source plumbing (the reference's Twitter push-stream analog,
    sandbox-safe): a producer appends JSONL; the tailer spools complete
    lines into parquet micro-files; run_files(resume=True) generations
    consume the growing spool exactly-once — the final output directory
    is BYTE-IDENTICAL to one batch run over the same spool."""
    import glob
    import hashlib
    import json as _json
    import threading
    import time as _time

    from opencep_ray.sources.live import (json_transcript_schema,
                                          run_live_jsonl)

    table = synth_transcripts(800, 10, seed=21)
    rows = []
    for i in range(table.num_rows):
        rows.append({"conv_id": table["conv_id"][i].as_py(),
                     "turn_idx": table["turn_idx"][i].as_py(),
                     "role": table["role"][i].as_py(),
                     "text": table["text"][i].as_py(),
                     "tool": table["tool"][i].as_py(),
                     "ts": table["ts"][i].cast("int64").as_py()})
    log = str(tmp_path / "collector.jsonl")

    def producer():
        with open(log, "a") as f:
            for lo in range(0, len(rows), 1000):
                for r in rows[lo:lo + 1000]:
                    f.write(_json.dumps(r) + "\n")
                f.flush()
                _time.sleep(0.15)
            # torn final record then completion + sentinel
            f.write(_json.dumps(rows[0])[:20])
            f.flush()
            _time.sleep(0.3)
            f.write(_json.dumps(rows[0])[20:] + "\n")
            f.write("__EOS__\n")

    t = threading.Thread(target=producer)
    t.start()
    live_out = str(tmp_path / "live_out")
    s = StreamingCEP(PATTERNS, transcript_config(), num_workers=3,
                     checkpoint_every=2, key_contiguous_input=False)
    stats = run_live_jsonl(s, log, str(tmp_path / "spool"), live_out,
                           json_transcript_schema(),
                           rows_per_file=2_000, generation_rows=2_500,
                           micro_batch_rows=1_500,
                           poll_sec=0.05, idle_timeout_sec=8.0)
    t.join()
    files = stats["spool_files"]
    assert len(files) >= 3                      # spool really rotated
    assert stats["rows"] > 0
    # exactly-once: a single-shot batch run over the same spool in a
    # fresh directory produces byte-identical part files
    batch_out = str(tmp_path / "batch_out")
    s2 = StreamingCEP(PATTERNS, transcript_config(), num_workers=3,
                      checkpoint_every=2, key_contiguous_input=False)
    batch_stats = s2.run_files(sorted(files), batch_out,
                               micro_batch_rows=1_500, resume=False,
                               file_aligned_batches=True)
    # incremental, not reprocess-everything: the FINAL live generation
    # resumed from the previous generation's boundary checkpoint and
    # processed strictly fewer batches than the full plan
    assert 0 < stats["batches"] < batch_stats["batches"], \
        (stats["batches"], batch_stats["batches"])

    def sha(d):
        h = hashlib.sha256()
        for f in sorted(glob.glob(f"{d}/*.parquet")):
            h.update(os.path.basename(f).encode())
            h.update(open(f, "rb").read())
        return h.hexdigest()

    assert sha(live_out) == sha(batch_out)
    # the torn-then-completed record made it in exactly once: spool row
    # count equals produced rows + the 1 repaired record
    import pyarrow.parquet as _pq
    spooled = sum(_pq.read_metadata(f).num_rows for f in files)
    assert spooled == len(rows) + 1


def test_follow_jsonl_idle_flush(tmp_path):
    """Complete lines below the batching threshold must flush on the
    idle-timeout end-of-stream, not silently drop (tail data loss)."""
    import json as _json
    from opencep_ray.sources.live import (follow_jsonl,
                                          json_transcript_schema)
    log = str(tmp_path / "t.jsonl")
    with open(log, "w") as f:
        for i in range(7):      # tiny: far below min_batch_bytes
            f.write(_json.dumps({"conv_id": "c1", "turn_idx": i,
                                 "role": "user", "text": f"m {i}",
                                 "tool": None, "ts": i * 1000}) + "\n")
    got = sum(t.num_rows for t in follow_jsonl(
        log, json_transcript_schema(), poll_sec=0.05,
        idle_timeout_sec=0.3))
    assert got == 7


def test_live_generations_defer_negation_flush(ray_session, tmp_path):
    """A pending trailing-negation match at a generation boundary must
    NOT be flushed by that generation: its negating event arrives in
    the next generation.  Output must equal the single batch run (no
    match, no stale part file)."""
    import glob
    import json as _json
    from opencep_ray.sources.live import (json_transcript_schema,
                                          run_live_jsonl)

    pats = [Pattern(Seq(Primitive("user", "a"),
                        Primitive("assistant", "b"),
                        Neg(Primitive("tool", "x"))),
                    window=300, pattern_id=9)]
    rows = [
        {"conv_id": "c1", "turn_idx": 0, "role": "user",
         "text": "m 0 v=1", "tool": None, "ts": 0},
        {"conv_id": "c1", "turn_idx": 1, "role": "assistant",
         "text": "m 1 v=2", "tool": None, "ts": 10_000_000},
        # --- generation boundary lands here (rows_per_file=2) ---
        {"conv_id": "c1", "turn_idx": 2, "role": "tool",
         "text": "m 2 v=3", "tool": "code", "ts": 20_000_000},
    ]
    log = str(tmp_path / "neg.jsonl")
    with open(log, "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")
        f.write("__EOS__\n")

    out = str(tmp_path / "neg_out")
    s = StreamingCEP(pats, transcript_config(), num_workers=2,
                     checkpoint_every=1)
    stats = run_live_jsonl(s, log, str(tmp_path / "neg_spool"), out,
                           json_transcript_schema(), rows_per_file=2,
                           generation_rows=1, micro_batch_rows=2,
                           poll_sec=0.05, idle_timeout_sec=5.0)
    assert len(stats["spool_files"]) == 2   # boundary between b and x
    # zero matches -> zero part files (a per-generation eos flush used
    # to leave a stale part with the not-yet-negated (a, b) match)
    parts = glob.glob(f"{out}/part-*.parquet")
    assert not parts, [pq.read_table(p).to_pylist() for p in parts]
