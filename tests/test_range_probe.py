"""Inequality range probes on value-sorted buffers (evaluator.py
``_find_range_probe`` / ``_rb_*``): the engine analog of the reference's
SortedPatternMatchStorage relop slices
(/root/reference/tree/PatternMatchStorage.py:144-283).

The probe is pure pruning — every test here asserts match-set equality
against (a) the linear-scan path with the probe disabled and (b) the
brute-force oracle, over streams with timestamp ties and duplicate
values (the bisect tie-handling edge cases)."""

import random

import pytest

from opencep_ray import (And, Col, GreaterThanCondition,
                         GreaterThanEqCondition, Kleene, Neg, Pattern,
                         Primitive, Seq, SmallerThanCondition,
                         SmallerThanEqCondition, compile_patterns)
from opencep_ray.evaluator import ConversationEvaluator, _NodeSpec

from test_evaluator_vs_oracle import (_canonical, check, gen_stream,
                                       run_oracle)

RELOPS = [GreaterThanCondition, GreaterThanEqCondition,
          SmallerThanCondition, SmallerThanEqCondition]


def _run(compiled, events):
    ev = ConversationEvaluator(compiled)
    for payload, typ, ts in events:
        ev.process(dict(payload), typ, ts)
    ev.eos()
    return sorted((cp.pattern_id, _canonical(cp, pm))
                  for cp, pm in ev.matches)


def _disable_range_probes(compiled):
    for cp in compiled:
        for spec, _, _ in cp.build_program:
            if spec.kind == _NodeSpec.KIND_JOIN:
                spec.range_probe = None


def _probed_node_count(compiled):
    return sum(1 for cp in compiled for spec, _, _ in cp.build_program
               if spec.kind == _NodeSpec.KIND_JOIN
               and spec.range_probe is not None)


@pytest.mark.parametrize("relop_cls", RELOPS)
@pytest.mark.parametrize("flipped", [False, True])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_probed_equals_linear_and_oracle(relop_cls, flipped, seed):
    """All four relops, condition written in both argument orders."""
    args = (Col("a", "v"), Col("b", "v"))
    if flipped:
        args = (args[1], args[0])
    pattern = Pattern(Seq(Primitive("user", "a"), Primitive("assistant", "b")),
                      relop_cls(*args), window=8)
    events = gen_stream(seed, n=60, val_range=6)  # dense value ties

    probed = compile_patterns(pattern)
    assert _probed_node_count(probed) == 1, "probe should be detected"
    linear = compile_patterns(pattern)
    _disable_range_probes(linear)
    assert _run(probed, events) == _run(linear, events)
    check(pattern, events)  # vs brute-force oracle too


@pytest.mark.parametrize("seed", [3, 4])
def test_probe_in_three_event_seq(seed):
    """Probe on one join of a longer SEQ; other conjuncts still filter."""
    pattern = Pattern(
        Seq(Primitive("user", "a"), Primitive("assistant", "b"),
            Primitive("tool", "c")),
        GreaterThanCondition(Col("b", "v"), Col("a", "v")),
        window=10)
    events = gen_stream(seed, n=50, val_range=5)
    probed = compile_patterns(pattern)
    assert _probed_node_count(probed) >= 1
    linear = compile_patterns(pattern)
    _disable_range_probes(linear)
    assert _run(probed, events) == _run(linear, events)
    check(pattern, events)


@pytest.mark.parametrize("seed", [5, 6])
def test_probe_under_and_with_negation(seed):
    pattern = Pattern(
        And(Primitive("user", "a"), Primitive("assistant", "b"),
            Neg(Primitive("tool", "x"))),
        SmallerThanEqCondition(Col("a", "v"), Col("b", "v")),
        window=9)
    events = gen_stream(seed, n=40, val_range=5)
    probed = compile_patterns(pattern)
    linear = compile_patterns(pattern)
    _disable_range_probes(linear)
    assert _run(probed, events) == _run(linear, events)
    check(pattern, events)


def test_kleene_side_not_probed():
    """A condition naming a KC member must not produce a probe (the join
    entry is the aggregate, not a primitive payload)."""
    pattern = Pattern(
        Seq(Primitive("user", "a"), Kleene(Primitive("assistant", "b")),
            Primitive("tool", "c")),
        GreaterThanCondition(Col("c", "v"), Col("a", "v")),
        window=10)
    compiled = compile_patterns(pattern)
    # the a-vs-c condition sits at a join whose sides include the KC
    # aggregate; probe detection must only fire where both named leaves
    # are primitive entries of that join — equality of results is the
    # real contract:
    events = gen_stream(7, n=35, val_range=5)
    linear = compile_patterns(pattern)
    _disable_range_probes(linear)
    assert _run(compiled, events) == _run(linear, events)
    check(pattern, events)


def test_eq_probe_takes_priority():
    """When both an equality and an inequality condition link the sides,
    the (more selective) hash probe wins and results are unchanged."""
    from opencep_ray import AndCondition, EqCondition
    pattern = Pattern(
        Seq(Primitive("user", "a"), Primitive("assistant", "b")),
        AndCondition(EqCondition(Col("a", "v"), Col("b", "v")),
                     GreaterThanCondition(Col("b", "turn"), Col("a", "turn"))),
        window=10)
    compiled = compile_patterns(pattern)
    join = [s for cp in [compiled[0]] for s, _, _ in cp.build_program
            if s.kind == _NodeSpec.KIND_JOIN][0]
    assert join.eq_probe is not None and join.range_probe is None
    events = gen_stream(8, n=50, val_range=4)
    check(pattern, events)


@pytest.mark.parametrize("seed", [9, 10])
def test_reset_reuse_matches_fresh(seed):
    """A pooled (reset) evaluator with range-probed buffers behaves
    exactly like a fresh one."""
    pattern = Pattern(Seq(Primitive("user", "a"), Primitive("assistant", "b")),
                      GreaterThanCondition(Col("b", "v"), Col("a", "v")),
                      window=8)
    compiled = compile_patterns(pattern)
    events1 = gen_stream(seed, n=40, val_range=5)
    events2 = gen_stream(seed + 100, n=40, val_range=5)

    ev = ConversationEvaluator(compiled)
    for payload, typ, ts in events1:
        ev.process(dict(payload), typ, ts)
    ev.eos()
    ev.reset()
    for payload, typ, ts in events2:
        ev.process(dict(payload), typ, ts)
    ev.eos()
    reused = sorted((cp.pattern_id, _canonical(cp, pm))
                    for cp, pm in ev.matches)
    assert reused == _run(compiled, events2)


def test_shedding_with_range_buffers():
    """The load-shedding valve walks range buffers without error and
    sheds to the target size."""
    from opencep_ray.evaluator import SheddingConfig
    pattern = Pattern(Seq(Primitive("user", "a"), Primitive("assistant", "b")),
                      GreaterThanCondition(Col("b", "v"), Col("a", "v")),
                      window=10_000)
    compiled = compile_patterns(pattern)
    shed = SheddingConfig(max_partial_matches=50, target=20)
    ev = ConversationEvaluator(compiled, shedding=shed)
    rng = random.Random(0)
    for i in range(400):
        ev.process({"v": rng.randint(0, 100), "turn": i}, "user", i * 1000)
    assert ev.shed_count > 0
    assert ev._live_pm_count() <= 50


def test_long_stream_expiry_bounds_buffers():
    """Lazy cleanup keeps the sorted buffers bounded on a long stream."""
    pattern = Pattern(Seq(Primitive("user", "a"), Primitive("assistant", "b")),
                      GreaterThanCondition(Col("b", "v"), Col("a", "v")),
                      window=5)
    compiled = compile_patterns(pattern)
    ev = ConversationEvaluator(compiled)
    SEC = 1_000_000
    rng = random.Random(1)
    for i in range(3000):
        typ = "user" if i % 2 == 0 else "assistant"
        ev.process({"v": rng.randint(0, 50), "turn": i}, typ, i * SEC)
    for tree in ev._all_trees:
        for node in tree["nodes"]:
            if node.buffers:
                for buf in node.buffers:
                    if isinstance(buf, dict) and "k" in buf:
                        # window=5s, 1 ev/s/type -> ~a handful live; the
                        # 16-add lazy interval bounds the slack
                        assert len(buf["p"]) < 64


def test_quiescence_with_range_buffers():
    pattern = Pattern(Seq(Primitive("user", "a"), Primitive("assistant", "b")),
                      GreaterThanCondition(Col("b", "v"), Col("a", "v")),
                      window=5)
    compiled = compile_patterns(pattern)
    ev = ConversationEvaluator(compiled)
    SEC = 1_000_000
    ev.process({"v": 1, "turn": 0}, "user", 0)
    assert not ev.is_quiescent(2 * SEC)
    ev.matches.clear()
    assert ev.is_quiescent(100 * SEC)
