"""Conformance: tree evaluator vs the brute-force oracle.

Mirrors the reference's golden-file strategy (test/testUtils.py:163-212):
match-set equality (order-free, duplicate-count-sensitive) between the
incremental tree evaluator and the exhaustive oracle, over deterministic
synthetic transcript-shaped event streams covering the pattern classes in
FIXTURES.md §3.  Pure Python — no Ray needed.
"""

import random

import pytest

from opencep_ray import (And, AndCondition, Col, ConsumptionPolicy,
                         EqCondition, GreaterThanCondition, KCIndexCondition,
                         KCValueCondition, Kleene, Neg, Or, Pattern,
                         Primitive, Seq, SimpleCondition, SmallerThanCondition,
                         Variable, compile_patterns)
from opencep_ray.evaluator import ConversationEvaluator
from opencep_ray.oracle import oracle_matches

SEC = 1_000_000  # µs


def gen_stream(seed, n=30, types=("user", "assistant", "tool"),
               tie_prob=0.3, val_range=20):
    """Deterministic event stream with ts ties and a numeric attribute."""
    rng = random.Random(seed)
    ts = 0
    out = []
    for i in range(n):
        if i > 0 and rng.random() >= tie_prob:
            ts += rng.randint(1, 5) * SEC
        typ = rng.choice(types)
        payload = {"v": rng.randint(0, val_range), "turn": i, "text": f"t{i}"}
        out.append((payload, typ, ts))
    return out


def run_evaluator(pattern, events, probs=None):
    compiled = compile_patterns(pattern)
    ev = ConversationEvaluator(compiled)
    for i, (payload, typ, ts) in enumerate(events):
        ev.process(dict(payload), typ, ts,
                   probs[i] if probs else None)
    ev.eos()
    out = []
    for cp, pm in ev.matches:
        key = _canonical(cp, pm)
        out.append((cp.pattern_id, key, None if pm.prob is None
                    else round(pm.prob, 9)))
    return sorted(out, key=repr)


def _canonical(cp, pm):
    entries = sorted(pm.entries, key=lambda t: cp.entry_slot[t[0]])
    key = []
    for _, e in entries:
        if e.primitives is None:
            key.append((e.idx,))
        else:
            key.append(tuple(p.idx for p in e.primitives))
    return tuple(key)


def run_oracle(pattern, events, probs=None):
    out = []
    for key, pid, prob, _ in oracle_matches(pattern, events, probs):
        out.append((pid, key, None if prob is None else round(prob, 9)))
    return sorted(out, key=repr)


def check(pattern, events, probs=None):
    got = run_evaluator(pattern, events, probs)
    want = run_oracle(pattern, events, probs)
    assert got == want, (f"evaluator={got}\noracle={want}")
    return got


# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", range(8))
def test_seq2_binary_condition(seed):
    p = Pattern(Seq(Primitive("user", "a"), Primitive("assistant", "b")),
                GreaterThanCondition(Col("b", "v"), Col("a", "v")),
                window=10)
    check(p, gen_stream(seed))


@pytest.mark.parametrize("seed", range(6))
def test_seq3_chained(seed):
    p = Pattern(Seq(Primitive("user", "a"), Primitive("assistant", "b"),
                    Primitive("tool", "c")),
                AndCondition(
                    GreaterThanCondition(Col("a", "v"), Col("b", "v")),
                    GreaterThanCondition(Col("b", "v"), Col("c", "v"))),
                window=15)
    check(p, gen_stream(seed + 100))


@pytest.mark.parametrize("seed", range(6))
def test_and_unordered(seed):
    p = Pattern(And(Primitive("user", "a"), Primitive("tool", "b")),
                SmallerThanCondition(Col("a", "v"), Col("b", "v")),
                window=8)
    check(p, gen_stream(seed + 200))


@pytest.mark.parametrize("seed", range(6))
def test_same_type_self_join_seq(seed):
    # ascending-metric self-join, ref test/BasicTests.py:45-61
    p = Pattern(Seq(Primitive("assistant", "a"), Primitive("assistant", "b"),
                    Primitive("assistant", "c")),
                AndCondition(
                    SmallerThanCondition(Col("a", "v"), Col("b", "v")),
                    SmallerThanCondition(Col("b", "v"), Col("c", "v"))),
                window=20)
    check(p, gen_stream(seed + 300, n=20))


@pytest.mark.parametrize("seed", range(5))
def test_ties_both_orders_match(seed):
    # heavy tie probability: same-ts events must match in both orders
    p = Pattern(Seq(Primitive("user", "a"), Primitive("assistant", "b")),
                window=30)
    check(p, gen_stream(seed + 400, n=15, tie_prob=0.8))


@pytest.mark.parametrize("seed", range(6))
def test_kleene_basic(seed):
    p = Pattern(Seq(Primitive("user", "a"), Kleene(Primitive("assistant", "b"))),
                window=6)
    check(p, gen_stream(seed + 500, n=14))


@pytest.mark.parametrize("seed", range(4))
def test_kleene_min_max(seed):
    p = Pattern(Seq(Primitive("user", "a"),
                    Kleene(Primitive("assistant", "b"), min_size=2,
                           max_size=3)),
                window=10)
    check(p, gen_stream(seed + 600, n=14))


@pytest.mark.parametrize("seed", range(4))
def test_kleene_value_condition(seed):
    p = Pattern(Seq(Primitive("user", "a"), Kleene(Primitive("assistant", "b"),
                                                   max_size=4)),
                KCValueCondition(["b"], lambda p_: p_["v"],
                                 lambda v, c: v > c, 5),
                window=8)
    check(p, gen_stream(seed + 700, n=14))


@pytest.mark.parametrize("seed", range(4))
def test_kleene_index_offset_condition(seed):
    # adjacent items must be ascending in v (offset condition)
    p = Pattern(Seq(Primitive("user", "a"), Kleene(Primitive("assistant", "b"),
                                                   max_size=4)),
                KCIndexCondition(["b"], lambda p_: p_["v"],
                                 lambda v1, v2: v1 <= v2, offset=1),
                window=10)
    check(p, gen_stream(seed + 800, n=14))


@pytest.mark.parametrize("seed", range(8))
def test_negation_bounded_middle(seed):
    p = Pattern(Seq(Primitive("user", "a"), Neg(Primitive("tool", "x")),
                    Primitive("assistant", "b")),
                window=12)
    check(p, gen_stream(seed + 900))


@pytest.mark.parametrize("seed", range(6))
def test_negation_unbounded_end(seed):
    p = Pattern(Seq(Primitive("user", "a"), Primitive("assistant", "b"),
                    Neg(Primitive("tool", "x"))),
                window=10)
    check(p, gen_stream(seed + 1000))


@pytest.mark.parametrize("seed", range(6))
def test_negation_begin(seed):
    p = Pattern(Seq(Neg(Primitive("tool", "x")), Primitive("user", "a"),
                    Primitive("assistant", "b")),
                window=10)
    check(p, gen_stream(seed + 1100))


@pytest.mark.parametrize("seed", range(4))
def test_negation_multiple(seed):
    p = Pattern(Seq(Neg(Primitive("tool", "x")), Primitive("user", "a"),
                    Primitive("assistant", "b"), Neg(Primitive("tool", "y"))),
                window=10)
    events = gen_stream(seed + 1200, types=("user", "assistant", "tool"))
    check(p, events)


@pytest.mark.parametrize("seed", range(4))
def test_negation_with_condition(seed):
    p = Pattern(Seq(Primitive("user", "a"), Neg(Primitive("tool", "x")),
                    Primitive("assistant", "b")),
                GreaterThanCondition(Col("x", "v"), Col("a", "v")),
                window=12)
    check(p, gen_stream(seed + 1300))


@pytest.mark.parametrize("seed", range(4))
def test_negation_in_and_pattern(seed):
    # AND top operator: all negatives are unbounded
    p = Pattern(And(Primitive("user", "a"), Primitive("assistant", "b"),
                    Neg(Primitive("tool", "x"))),
                window=6)
    check(p, gen_stream(seed + 1400, n=18))


@pytest.mark.parametrize("seed", range(4))
def test_or_split_to_multipattern(seed):
    p = Pattern(Or(Seq(Primitive("user", "a"), Primitive("assistant", "b")),
                   Seq(Primitive("user", "a"), Primitive("tool", "b"))),
                window=8)
    check(p, gen_stream(seed + 1500))


@pytest.mark.parametrize("seed", range(4))
def test_probability_confidence(seed):
    rng = random.Random(seed + 1600)
    events = gen_stream(seed + 1600, n=20)
    probs = [round(rng.random(), 3) for _ in events]
    p = Pattern(Seq(Primitive("user", "a"), Primitive("assistant", "b")),
                window=10, confidence=0.3)
    check(p, events, probs)


@pytest.mark.parametrize("seed", range(3))
def test_probabilistic_negation(seed):
    rng = random.Random(seed + 1700)
    events = gen_stream(seed + 1700, n=20)
    probs = [round(rng.random(), 3) for _ in events]
    p = Pattern(Seq(Primitive("user", "a"), Neg(Primitive("tool", "x")),
                    Primitive("assistant", "b")),
                window=10, confidence=0.1)
    check(p, events, probs)


def test_lambda_variable_condition():
    # arbitrary-lambda attribute extraction (reference Variable escape hatch)
    events = gen_stream(42, n=25)
    p = Pattern(Seq(Primitive("user", "a"), Primitive("assistant", "b")),
                SimpleCondition(Variable("a", lambda e: len(e["text"])),
                                Variable("b", lambda e: e["v"]),
                                relation_op=lambda la, vb: la <= vb),
                window=10)
    check(p, events)


def test_multi_pattern_union():
    events = gen_stream(7, n=25)
    p1 = Pattern(Seq(Primitive("user", "a"), Primitive("assistant", "b")),
                 window=5, pattern_id=1)
    p2 = Pattern(And(Primitive("user", "a"), Primitive("tool", "b")),
                 window=5, pattern_id=2)
    compiled = compile_patterns([p1, p2])
    ev = ConversationEvaluator(compiled)
    for payload, typ, ts in events:
        ev.process(dict(payload), typ, ts)
    ev.eos()
    got = sorted(((cp.pattern_id, _canonical(cp, pm))
                  for cp, pm in ev.matches), key=repr)
    want = sorted([(pid, key) for key, pid, _, _ in
                   oracle_matches(p1, events)] +
                  [(pid, key) for key, pid, _, _ in
                   oracle_matches(p2, events)], key=repr)
    assert got == want


@pytest.mark.parametrize("seed", range(4))
def test_same_type_kleene_overlap_semantics(seed):
    # an assistant event may be bound to 'a' AND appear inside the KC list
    # (the reference hashes the aggregate as one unit in its dup check)
    p = Pattern(Seq(Primitive("assistant", "a"),
                    Kleene(Primitive("assistant", "b"), max_size=2)),
                window=8)
    check(p, gen_stream(seed + 2000, n=12))


@pytest.mark.parametrize("seed", range(3))
def test_kleene_with_negation(seed):
    p = Pattern(Seq(Primitive("user", "a"),
                    Kleene(Primitive("assistant", "b"), max_size=2),
                    Neg(Primitive("tool", "x"))),
                window=10)
    check(p, gen_stream(seed + 2100, n=14))


@pytest.mark.parametrize("seed", range(5))
def test_nested_and_inside_seq(seed):
    # SEQ(a, AND(b, c), d): b/c unordered between themselves but strictly
    # between a and d (entry-level precedence)
    p = Pattern(Seq(Primitive("user", "a"),
                    And(Primitive("assistant", "b"), Primitive("tool", "c")),
                    Primitive("user", "d")),
                window=12)
    check(p, gen_stream(seed + 2200, n=16))


@pytest.mark.parametrize("seed", range(5))
def test_nested_seq_inside_and(seed):
    # AND(SEQ(a, b), c): a before b; c anywhere in the window
    p = Pattern(And(Seq(Primitive("user", "a"), Primitive("assistant", "b")),
                    Primitive("tool", "c")),
                window=10)
    check(p, gen_stream(seed + 2300, n=16))


@pytest.mark.parametrize("seed", range(4))
def test_nested_seq_inside_seq_with_condition(seed):
    p = Pattern(Seq(Seq(Primitive("user", "a"), Primitive("assistant", "b")),
                    Primitive("tool", "c")),
                GreaterThanCondition(Col("c", "v"), Col("a", "v")),
                window=12)
    check(p, gen_stream(seed + 2400, n=16))


def test_structure_summary():
    p = Pattern(Seq(Primitive("user", "a"),
                    Kleene(Primitive("assistant", "b")),
                    Neg(Primitive("tool", "x"))),
                window=10)
    cp = compile_patterns(p)[0]
    assert cp.structure_summary() == ("NSeq", ("Seq", "a", ("KC", "b")), "x")


@pytest.mark.parametrize("seed", range(6))
def test_equality_join_hash_probe(seed):
    # Col == Col between the two sides activates hash-probed buffers;
    # results must be identical to the oracle's exhaustive join
    p = Pattern(Seq(Primitive("user", "a"), Primitive("assistant", "b")),
                AndCondition(EqCondition(Col("a", "v"), Col("b", "v")),
                             GreaterThanCondition(Col("b", "turn"),
                                                  Col("a", "turn"))),
                window=20)
    compiled = compile_patterns(p)
    assert compiled[0].root.eq_probe is not None or \
        any(n.eq_probe for n in [compiled[0].root]), \
        "equality probe not compiled"
    check(p, gen_stream(seed + 2500, n=25, val_range=5))


@pytest.mark.parametrize("seed", range(3))
def test_equality_probe_three_events(seed):
    p = Pattern(Seq(Primitive("user", "a"), Primitive("assistant", "b"),
                    Primitive("tool", "c")),
                AndCondition(EqCondition(Col("a", "v"), Col("b", "v")),
                             EqCondition(Col("b", "v"), Col("c", "v"))),
                window=25)
    check(p, gen_stream(seed + 2600, n=22, val_range=4))


def test_or_disjuncts_with_different_shapes():
    """OR disjuncts share a pattern_id but have different entry layouts —
    emission must use each match's own compiled disjunct."""
    p = Pattern(Or(Seq(Primitive("user", "a"),
                       Kleene(Primitive("assistant", "k"), max_size=2),
                       Primitive("tool", "c")),
                   Seq(Primitive("tool", "x"), Primitive("user", "y"))),
                window=15, pattern_id=7)
    events = gen_stream(42, n=20)
    compiled = compile_patterns(p)
    assert len(compiled) == 2
    assert all(c.pattern_id == 7 for c in compiled)
    ev = ConversationEvaluator(compiled)
    for payload, typ, ts in events:
        ev.process(dict(payload), typ, ts)
    ev.eos()
    shapes = set()
    for cp, pm in ev.matches:
        # primitive_events with the match's own cp must not raise
        evs = ConversationEvaluator.primitive_events(pm, cp)
        shapes.add(len(pm.entries))
        assert cp.pattern_id == 7
    assert len(ev.matches) > 0


# ---------------------------------------------------------------------------
# Round-2 regressions: KC offset bounds + double-unbounded-negation
# probability accounting (ADVICE.md round 1)


def test_kc_offset_too_large_is_false():
    """Reference rule (condition/KCCondition.py __eval_by_offset): a
    positive offset >= len(event_list) fails the condition outright —
    subsets smaller than the offset must NOT match vacuously."""
    cond = KCIndexCondition({"k"}, lambda p: p["v"], lambda a, b: b > a,
                            offset=2)
    assert not cond.eval({"k": [{"v": 1}]})
    assert not cond.eval({"k": [{"v": 1}, {"v": 2}]})
    assert cond.eval({"k": [{"v": 1}, {"v": 2}, {"v": 3}]})
    assert not cond.eval({"k": [{"v": 3}, {"v": 2}, {"v": 1}]})
    # negative offset pairs are (items[i], items[i+off]) with off < 0
    neg = KCIndexCondition({"k"}, lambda p: p["v"], lambda a, b: a < b,
                           offset=-2)
    assert neg.eval({"k": [{"v": 3}, {"v": 2}, {"v": 1}]})
    assert not KCIndexCondition({"k"}, lambda p: p["v"],
                                lambda a, b: a > b,
                                offset=-2).eval(
        {"k": [{"v": 3}, {"v": 2}, {"v": 1}]})


def test_kc_offset_in_evaluator_excludes_small_subsets():
    events = [({"v": i, "turn": i, "text": f"t{i}"}, "assistant", i * SEC)
              for i in range(4)]
    events.insert(0, ({"v": 0, "turn": -1, "text": "u"}, "user", 0))
    p = Pattern(Seq(Primitive("user", "a"),
                    Kleene(Primitive("assistant", "k"), max_size=3)),
                KCIndexCondition({"k"}, lambda e: e["v"],
                                 lambda x, y: y > x, offset=2),
                window=100)
    got = run_evaluator(p, events)
    # every emitted KC subset has >= 3 items (offset 2 demands it)
    assert got
    for _, key, _ in got:
        assert len(key[1]) >= 3


def test_double_unbounded_negation_probability_exact():
    """ADVICE repro: SEQ(A, NOT B, NOT C) with uncertain negatives of
    prob 0.5 each must emit probability 0.25 (1−p per negative, applied
    once each — reference NegationNode.py:114-117), not 0.125."""
    events = [({"v": 1, "turn": 0, "text": "a"}, "user", 0),
              ({"v": 2, "turn": 1, "text": "b"}, "assistant", 1 * SEC),
              ({"v": 3, "turn": 2, "text": "c"}, "tool", 2 * SEC)]
    probs = [1.0, 0.5, 0.5]
    p = Pattern(Seq(Primitive("user", "a"), Neg(Primitive("assistant", "x")),
                    Neg(Primitive("tool", "y"))),
                window=10)
    got = run_evaluator(p, events, probs)
    assert got == [(0, ((0,),), 0.25)]
    assert run_oracle(p, events, probs) == got


@pytest.mark.parametrize("seed", range(4))
def test_double_unbounded_negation_random(seed):
    rng = random.Random(seed + 2100)
    events = gen_stream(seed + 2100, n=22)
    probs = [round(rng.random(), 3) for _ in events]
    p = Pattern(Seq(Primitive("user", "a"), Neg(Primitive("assistant", "x")),
                    Neg(Primitive("tool", "y"))),
                window=10, confidence=0.05)
    check(p, events, probs)


@pytest.mark.parametrize("seed", range(4))
def test_unbounded_negation_and_pattern_probabilistic(seed):
    """AND patterns make every negation unbounded (negatives may precede
    the positives) — exercises the watermark-2W retention rule."""
    rng = random.Random(seed + 2200)
    events = gen_stream(seed + 2200, n=22)
    probs = [round(rng.random(), 3) for _ in events]
    p = Pattern(And(Primitive("user", "a"), Neg(Primitive("tool", "x")),
                    Primitive("assistant", "b")),
                window=10, confidence=0.05)
    check(p, events, probs)


def run_evaluator_watermarked(pattern, events, probs=None, every=5):
    """Same as run_evaluator but advancing the event-time watermark every
    ``every`` events — exercises incremental pending flush + the
    watermark-driven unbounded negative-buffer expiry."""
    compiled = compile_patterns(pattern)
    ev = ConversationEvaluator(compiled)
    out = []

    def drain():
        for cp, pm in ev.matches:
            out.append((cp.pattern_id, _canonical(cp, pm),
                        None if pm.prob is None else round(pm.prob, 9)))
        ev.matches.clear()

    for i, (payload, typ, ts) in enumerate(events):
        ev.process(dict(payload), typ, ts, probs[i] if probs else None)
        if (i + 1) % every == 0:
            ev.advance_watermark(ts)
            drain()
    ev.eos()
    drain()
    return sorted(out, key=repr)


@pytest.mark.parametrize("seed", range(4))
def test_watermarked_double_negation_matches_oracle(seed):
    rng = random.Random(seed + 2300)
    events = gen_stream(seed + 2300, n=30)
    probs = [round(rng.random(), 3) for _ in events]
    for struct in (
            Seq(Primitive("user", "a"), Neg(Primitive("assistant", "x")),
                Neg(Primitive("tool", "y"))),
            Seq(Primitive("user", "a"), Neg(Primitive("tool", "x")),
                Primitive("assistant", "b")),
            And(Primitive("user", "a"), Neg(Primitive("tool", "x")),
                Primitive("assistant", "b"))):
        p = Pattern(struct, window=8, confidence=0.05)
        got = run_evaluator_watermarked(p, events, probs, every=4)
        want = run_oracle(p, events, probs)
        assert got == want, (f"struct={struct}\nevaluator={got}\n"
                             f"oracle={want}")


def test_statistic_negation_ordering_invariant():
    """StatisticNegationAlgorithm analog: type-count statistics reorder
    negation nodes by descending rate within bounded/unbounded classes;
    results are identical either way (cost-only decision, reference
    plan/negation/StatisticNegationAlgorithm.py:6-25)."""
    events = gen_stream(77, n=30)
    p = Pattern(Seq(Primitive("user", "a"), Neg(Primitive("tool", "x")),
                    Neg(Primitive("assistant", "y")),
                    Primitive("user", "b")),
                window=12)
    base = run_evaluator(p, events)
    stats = {"type_counts": {"tool": 5, "assistant": 500}}
    compiled = compile_patterns(p, statistics=stats)
    ev = ConversationEvaluator(compiled)
    for payload, typ, ts in events:
        ev.process(dict(payload), typ, ts)
    ev.eos()
    got = sorted(((cp.pattern_id, _canonical(cp, pm),
                   None if pm.prob is None else round(pm.prob, 9))
                  for cp, pm in ev.matches), key=repr)
    assert got == base
    assert got == run_oracle(p, events)


@pytest.mark.parametrize("seed", range(6))
def test_negative_type_equals_kc_type(seed):
    """Fuzz-found edge: the negated type equals the Kleene child type, so
    one event can be both the completing KC item and a candidate
    negative.  Reference leaf order (positive leaves first) means the
    same-event negative arrives after completion and never invalidates."""
    p = Pattern(Seq(Primitive("user", "a"), Primitive("user", "b"),
                    Neg(Primitive("assistant", "x")),
                    Kleene(Primitive("assistant", "k"), max_size=1)),
                window=8)
    check(p, gen_stream(seed + 3000, n=14))


def test_same_event_negative_does_not_invalidate_completion():
    """Directed version of the fuzz repro: assistant@13 completes the KC
    and is simultaneously a window/order-compatible negative; the match
    must survive (bounded negative arrives after completion)."""
    events = [({"v": 0, "turn": 0, "text": "t"}, "user", 5 * SEC),
              ({"v": 1, "turn": 1, "text": "t"}, "user", 5 * SEC),
              ({"v": 2, "turn": 2, "text": "t"}, "assistant", 13 * SEC)]
    p = Pattern(Seq(Primitive("user", "a"), Primitive("user", "b"),
                    Neg(Primitive("assistant", "x")),
                    Kleene(Primitive("assistant", "k"), max_size=1)),
                window=8)
    got = run_evaluator(p, events)
    assert ((0, ((0,), (1,), (2,)), None) in got
            and (0, ((1,), (0,), (2,)), None) in got)
    assert run_oracle(p, events) == got


def test_and_in_seq_requires_leaf_order():
    """Reference-conformance pin (round-4 ADVICE): in SEQ(a, AND(b, c), d)
    the root SeqNode validates is_sorted over the FULL leaf-index-ordered
    merged match (reference tree/nodes/SeqNode.py:30-33), so b.ts <= c.ts
    is required even though b, c sit inside an AND.  Empirically verified
    against the reference engine: 0 matches when c precedes b, 1 when b
    precedes c."""
    def stream(b_first):
        b_ts, c_ts = (2, 3) if b_first else (3, 2)
        return [({"v": 0, "turn": 0, "text": "t"}, "user", 1 * SEC),
                ({"v": 1, "turn": 1, "text": "t"}, "assistant", b_ts * SEC),
                ({"v": 2, "turn": 2, "text": "t"}, "tool", c_ts * SEC),
                ({"v": 3, "turn": 3, "text": "t"}, "user", 4 * SEC)]

    p = Pattern(Seq(Primitive("user", "a"),
                    And(Primitive("assistant", "b"), Primitive("tool", "c")),
                    Primitive("user", "d")),
                window=10)
    got_ordered = run_evaluator(p, stream(b_first=True))
    got_reversed = run_evaluator(p, stream(b_first=False))
    assert len(got_ordered) == 1
    assert got_reversed == []
    assert run_oracle(p, stream(b_first=True)) == got_ordered
    assert run_oracle(p, stream(b_first=False)) == []
