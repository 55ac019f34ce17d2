"""Property-based conformance fuzz: random flat patterns × random event
streams, tree evaluator vs the brute-force oracle (and, for multi-pattern
sets, sharing modes vs independent evaluation).  Complements the directed
suites in test_evaluator_vs_oracle.py with machine-generated shapes."""

import random

from hypothesis import given, settings, strategies as st

from opencep_ray import (And, Col, GreaterThanCondition, Kleene, Neg,
                         Pattern, Primitive, Seq, SmallerThanCondition,
                         compile_patterns)
from opencep_ray.evaluator import ConversationEvaluator
from opencep_ray.oracle import oracle_matches

SEC = 1_000_000
TYPES = ("user", "assistant", "tool")


@st.composite
def pattern_strategy(draw):
    n_pos = draw(st.integers(2, 3))
    names = [f"e{i}" for i in range(n_pos)]
    args = [Primitive(draw(st.sampled_from(TYPES)), names[i])
            for i in range(n_pos)]
    if draw(st.booleans()):
        # wrap one arg in a Kleene closure
        i = draw(st.integers(0, n_pos - 1))
        args[i] = Kleene(args[i], max_size=draw(st.integers(1, 2)))
    if draw(st.booleans()):
        pos = draw(st.integers(0, len(args)))
        args.insert(pos, Neg(Primitive(draw(st.sampled_from(TYPES)),
                                       "neg0")))
    structure = (Seq if draw(st.booleans()) else And)(*args)
    cond = None
    if draw(st.booleans()) and n_pos >= 2:
        a, b = draw(st.permutations(names[:2]))
        # conditions only between non-Kleene names (oracle contract)
        kc_names = {arg.arg.name for arg in args
                    if isinstance(arg, Kleene)}
        if a not in kc_names and b not in kc_names:
            cls = draw(st.sampled_from([GreaterThanCondition,
                                        SmallerThanCondition]))
            cond = cls(Col(a, "v"), Col(b, "v"))
    window = draw(st.integers(3, 20))
    if cond is None:
        return Pattern(structure, window=window)
    return Pattern(structure, cond, window=window)


def gen_stream(seed, n):
    rng = random.Random(seed)
    ts = 0
    out = []
    for i in range(n):
        if i > 0 and rng.random() >= 0.3:
            ts += rng.randint(1, 5) * SEC
        out.append(({"v": rng.randint(0, 12), "turn": i},
                    rng.choice(TYPES), ts))
    return out


def run_evaluator(patterns, events, share=None):
    compiled = compile_patterns(patterns)
    ev = ConversationEvaluator(compiled, share=share)
    for payload, typ, ts in events:
        ev.process(dict(payload), typ, ts)
    ev.eos()
    out = []
    for cp, pm in ev.matches:
        entries = sorted(pm.entries, key=lambda t: cp.entry_slot[t[0]])
        out.append((cp.pattern_id, tuple(
            tuple(p.idx for p in (e.primitives or (e,)))
            for _, e in entries)))
    return sorted(out, key=repr)


@settings(max_examples=40, deadline=None)
@given(pattern=pattern_strategy(), seed=st.integers(0, 10_000),
       n=st.integers(8, 22))
def test_random_pattern_matches_oracle(pattern, seed, n):
    events = gen_stream(seed, n)
    got = run_evaluator(pattern, events)
    want = sorted(((pid, key) for key, pid, _prob, _b
                   in oracle_matches(pattern, events)), key=repr)
    assert got == want


@settings(max_examples=20, deadline=None)
@given(seed=st.integers(0, 10_000), n=st.integers(10, 25),
       data=st.data())
def test_random_multipattern_sharing_invariance(seed, n, data):
    patterns = [data.draw(pattern_strategy()) for _ in range(3)]
    for i, p in enumerate(patterns):
        p.pattern_id = i
    events = gen_stream(seed, n)
    base = run_evaluator(patterns, events, share=None)
    for mode in ("leaves", "subtrees"):
        assert run_evaluator(patterns, events, share=mode) == base


@st.composite
def nested_pattern_strategy(draw):
    """SEQ/AND with ONE nested composite slot (the oracle's supported
    nesting level), e.g. SEQ(a, AND(b, c)) or AND(SEQ(a, b), c)."""
    inner_n = draw(st.integers(2, 3))
    inner_names = [f"i{k}" for k in range(inner_n)]
    inner = (Seq if draw(st.booleans()) else And)(
        *[Primitive(draw(st.sampled_from(TYPES)), inner_names[k])
          for k in range(inner_n)])
    outer_args = [Primitive(draw(st.sampled_from(TYPES)), "o0"), inner]
    if draw(st.booleans()):
        outer_args = outer_args[::-1]
    structure = (Seq if draw(st.booleans()) else And)(*outer_args)
    cond = None
    if draw(st.booleans()):
        a, b = "o0", inner_names[0]
        cls = draw(st.sampled_from([GreaterThanCondition,
                                    SmallerThanCondition]))
        cond = cls(Col(a, "v"), Col(b, "v"))
    window = draw(st.integers(4, 15))
    if cond is None:
        return Pattern(structure, window=window)
    return Pattern(structure, cond, window=window)


@settings(max_examples=30, deadline=None)
@given(pattern=nested_pattern_strategy(), seed=st.integers(0, 10_000),
       n=st.integers(8, 18))
def test_nested_pattern_matches_oracle(pattern, seed, n):
    events = gen_stream(seed, n)
    got = run_evaluator(pattern, events)
    want = sorted(((pid, key) for key, pid, _prob, _b
                   in oracle_matches(pattern, events)), key=repr)
    assert got == want
