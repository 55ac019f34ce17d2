"""Multi-pattern plan sharing: equivalent leaves/subtrees instantiated
once and fanned out to every consuming pattern (reference
plan/multi/ShareLeavesTreePlanMerger.py:5-14,
SubTreeSharingTreePlanMerger.py:5-13, corpus test/MultiPattern_tests.py).

The invariant under test: for every share mode, the per-pattern match
sets are IDENTICAL to independent evaluation — sharing is a cost-only
decision.  Pure Python — no Ray needed."""

import random

import pytest

from opencep_ray import (Col, GreaterThanCondition, Kleene, Neg, Pattern,
                         Primitive, Seq, And, SmallerThanCondition,
                         compile_patterns)
from opencep_ray.evaluator import ConversationEvaluator

SEC = 1_000_000


def gen_stream(seed, n=30, types=("user", "assistant", "tool"),
               tie_prob=0.3):
    rng = random.Random(seed)
    ts = 0
    out = []
    for i in range(n):
        if i > 0 and rng.random() >= tie_prob:
            ts += rng.randint(1, 5) * SEC
        out.append(({"v": rng.randint(0, 20), "turn": i}, rng.choice(types),
                    ts))
    return out


def run(patterns, events, share=None, probs=None):
    compiled = compile_patterns(patterns)
    ev = ConversationEvaluator(compiled, share=share)
    for i, (payload, typ, ts) in enumerate(events):
        ev.process(dict(payload), typ, ts, probs[i] if probs else None)
    ev.eos()
    out = []
    for cp, pm in ev.matches:
        entries = sorted(pm.entries, key=lambda t: cp.entry_slot[t[0]])
        key = tuple(tuple(p.idx for p in (e.primitives or (e,)))
                    for _, e in entries)
        out.append((cp.pattern_id, key,
                    None if pm.prob is None else round(pm.prob, 9)))
    return sorted(out, key=repr), ev


def check_modes(patterns, events, probs=None):
    base, _ = run(patterns, events, share=None, probs=probs)
    assert base, "empty match set makes a weak test"
    for mode in ("leaves", "subtrees"):
        got, ev = run(patterns, events, share=mode, probs=probs)
        assert got == base, f"mode={mode}\n{got[:4]}\nvs\n{base[:4]}"
    return base


FLAGSHIP = [
    Pattern(Seq(Primitive("user", "a"), Primitive("assistant", "b")),
            GreaterThanCondition(Col("b", "v"), Col("a", "v")),
            window=120, pattern_id=1),
    Pattern(Seq(Primitive("user", "a"),
                Kleene(Primitive("assistant", "b"), max_size=3),
                Primitive("tool", "c")),
            window=180, pattern_id=2),
    Pattern(Seq(Primitive("user", "a"), Neg(Primitive("tool", "x")),
                Primitive("assistant", "b")),
            window=150, pattern_id=3),
]


@pytest.mark.parametrize("seed", range(5))
def test_flagship_trio_share_invariance(seed):
    check_modes(FLAGSHIP, gen_stream(seed + 10, n=25))


def test_flagship_shares_leaves():
    _, ev = run(FLAGSHIP, gen_stream(3, n=10), share="leaves")
    # user leaf shared by all three patterns, assistant by 1 and 3
    assert len(ev._minis) >= 2
    shared_leaf_sigs = [m["owner_spec"].share_sig[1]
                        for m in ev._minis]
    assert "user" in shared_leaf_sigs
    assert "assistant" in shared_leaf_sigs


@pytest.mark.parametrize("seed", range(5))
def test_shared_join_subtree_different_windows(seed):
    """Two patterns sharing a full SEQ(a,b) join subtree with DIFFERENT
    windows: the mini runs at the max window; each pattern's own window
    re-filters (reference MultiPatternTree.py:46-54)."""
    cond = GreaterThanCondition(Col("b", "v"), Col("a", "v"))
    pats = [
        Pattern(Seq(Primitive("user", "a"), Primitive("assistant", "b")),
                cond, window=4, pattern_id=1),
        Pattern(Seq(Primitive("user", "a"), Primitive("assistant", "b")),
                cond, window=15, pattern_id=2),
    ]
    base = check_modes(pats, gen_stream(seed + 40, n=22))
    # the narrow pattern must have strictly fewer matches
    n1 = sum(1 for pid, _, _ in base if pid == 1)
    n2 = sum(1 for pid, _, _ in base if pid == 2)
    assert n1 < n2
    _, ev = run(pats, gen_stream(seed + 40, n=22), share="subtrees")
    assert len(ev._minis) >= 1
    join_minis = [m for m in ev._minis
                  if m["owner_spec"].share_sig[0] == "join"]
    assert join_minis and join_minis[0]["cp"].window_us == 15 * SEC


@pytest.mark.parametrize("seed", range(4))
def test_shared_subtree_under_larger_pattern(seed):
    """SEQ(a,b) shared both as pattern 1's whole tree and as a subtree of
    pattern 2's 3-event chain."""
    cond = SmallerThanCondition(Col("a", "v"), Col("b", "v"))
    pats = [
        Pattern(Seq(Primitive("user", "a"), Primitive("assistant", "b")),
                cond, window=10, pattern_id=1),
        Pattern(Seq(Primitive("user", "a"), Primitive("assistant", "b"),
                    Primitive("tool", "c")), cond, window=10, pattern_id=2),
    ]
    check_modes(pats, gen_stream(seed + 70, n=25))


@pytest.mark.parametrize("seed", range(4))
def test_shared_kleene_subtree(seed):
    pats = [
        Pattern(Seq(Primitive("user", "a"),
                    Kleene(Primitive("assistant", "k"), max_size=2)),
                window=8, pattern_id=1),
        Pattern(Seq(Primitive("user", "a"),
                    Kleene(Primitive("assistant", "k"), max_size=2),
                    Primitive("tool", "c")),
                window=12, pattern_id=2),
    ]
    check_modes(pats, gen_stream(seed + 100, n=18))


@pytest.mark.parametrize("seed", range(4))
def test_shared_with_negation_and_probability(seed):
    rng = random.Random(seed + 130)
    events = gen_stream(seed + 130, n=22)
    probs = [round(rng.random(), 3) for _ in events]
    pats = [
        Pattern(Seq(Primitive("user", "a"), Neg(Primitive("tool", "x")),
                    Primitive("assistant", "b")),
                window=10, confidence=0.05, pattern_id=1),
        Pattern(And(Primitive("user", "a"), Primitive("assistant", "b")),
                window=10, confidence=0.05, pattern_id=2),
    ]
    check_modes(pats, events, probs=probs)


def test_sharing_disabled_with_policies():
    from opencep_ray import ConsumptionPolicy, SelectionStrategy
    pats = [
        Pattern(Seq(Primitive("user", "a"), Primitive("assistant", "b")),
                window=10, pattern_id=1,
                consumption_policy=ConsumptionPolicy(
                    single="user",
                    secondary_selection_strategy=SelectionStrategy
                    .MATCH_SINGLE)),
        Pattern(Seq(Primitive("user", "a"), Primitive("assistant", "b")),
                window=10, pattern_id=2),
    ]
    _, ev = run(pats, gen_stream(5, n=15), share="subtrees")
    assert ev.share is None
    assert not ev._minis


def test_shared_evaluates_leaf_conditions_once():
    """Leaf-condition sharing is the point of ShareLeaves: a shared
    conditioned leaf evaluates its predicate once per event, not once
    per pattern."""
    calls = []

    def pred(v):
        calls.append(v)
        return v > 5

    from opencep_ray import SimpleCondition, Variable
    conds = [SimpleCondition(Variable("a", lambda e: e["v"]),
                             relation_op=pred) for _ in range(2)]
    # same condition OBJECT in both patterns → shareable signature
    cond = conds[0]
    pats = [
        Pattern(Seq(Primitive("user", "a"), Primitive("assistant", "b")),
                cond, window=10, pattern_id=1),
        Pattern(Seq(Primitive("user", "a"), Primitive("tool", "c")),
                cond, window=10, pattern_id=2),
    ]
    events = [({"v": 9, "turn": 0}, "user", 0),
              ({"v": 1, "turn": 1}, "assistant", SEC),
              ({"v": 2, "turn": 2}, "tool", 2 * SEC)]
    # condition references only "a" → attached to the shared user leaf
    base, _ = run(pats, events, share=None)
    calls.clear()
    got, ev = run(pats, events, share="leaves")
    assert got == base
    shared_calls = len(calls)
    calls.clear()
    run(pats, events, share=None)
    unshared_calls = len(calls)
    assert shared_calls < unshared_calls


@pytest.mark.parametrize("seed", range(4))
def test_local_search_share_invariance(seed):
    """Local-search merge selection (reference plan/multi/local_search):
    whatever subset of merges it picks, match sets are identical."""
    base, _ = run(FLAGSHIP, gen_stream(seed + 200, n=25), share=None)
    got, ev = run(FLAGSHIP, gen_stream(seed + 200, n=25),
                  share="local_search")
    assert got == base
    # the chosen configuration is a subset of the subtrees-mode one
    _, ev_all = run(FLAGSHIP, gen_stream(seed + 200, n=25),
                    share="subtrees")
    assert ev._shared_sigs <= ev_all._shared_sigs


def test_local_search_skips_bare_leaves_shares_conditioned_joins():
    """The calibrated cost model: a condition-less leaf is NOT worth the
    per-sink remap, a conditioned join subtree IS."""
    cond = GreaterThanCondition(Col("b", "v"), Col("a", "v"))
    pats = [
        Pattern(Seq(Primitive("user", "a"), Primitive("assistant", "b")),
                cond, window=10, pattern_id=1),
        Pattern(Seq(Primitive("user", "a"), Primitive("assistant", "b"),
                    Primitive("tool", "c")), cond, window=12, pattern_id=2),
        Pattern(Seq(Primitive("user", "a"), Primitive("tool", "x")),
                window=10, pattern_id=3),
    ]
    base, _ = run(pats, gen_stream(9, n=25), share=None)
    got, ev = run(pats, gen_stream(9, n=25), share="local_search")
    assert got == base
    kinds = {sig[0] for sig in ev._shared_sigs}
    # the shared SEQ(a,b)+condition join survives the search
    assert "join" in kinds


def test_auto_share_is_self_tuning_alias(seed=6):
    """share='auto' = the cost model decides, zero user tuning: results
    invariant, same selection as 'local_search', and never MORE sharing
    than subtrees mode."""
    events = gen_stream(seed + 300, n=25)
    base, _ = run(FLAGSHIP, events, share=None)
    got, ev_auto = run(FLAGSHIP, events, share="auto")
    assert got == base
    _, ev_ls = run(FLAGSHIP, events, share="local_search")
    assert ev_auto._shared_sigs == ev_ls._shared_sigs
    _, ev_all = run(FLAGSHIP, events, share="subtrees")
    assert ev_auto._shared_sigs <= ev_all._shared_sigs


def test_auto_share_engine_config_end_to_end(ray_session):
    """EngineConfig(share='auto') through the batch engine: identical
    matches to share=None."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from opencep_ray.engine import CEP, BindingsEmitter, EngineConfig
    cond = GreaterThanCondition(Col("b", "v"), Col("a", "v"))
    pats = [
        Pattern(Seq(Primitive("user", "a"), Primitive("assistant", "b")),
                cond, window=10_000_000, pattern_id=1),
        Pattern(Seq(Primitive("user", "a"), Primitive("assistant", "b"),
                    Primitive("tool", "c")), cond, window=12_000_000,
                pattern_id=2),
    ]
    rng = np.random.RandomState(3)
    n = 400
    table = pa.table({
        "conv": pa.array(rng.randint(0, 20, n), pa.int64()),
        "ts": pa.array(np.sort(rng.randint(0, 40_000_000, n)), pa.int64()),
        "turn": pa.array(np.arange(n), pa.int64()),
        "role": pa.array(rng.choice(["user", "assistant", "tool"], n)),
        "v": pa.array(rng.randint(0, 9, n).astype("float64")),
    })
    emitter = BindingsEmitter(
        {"conv": lambda b, pm: b["a"]["conv"],
         "a_turn": lambda b, pm: b["a"]["turn"],
         "b_turn": lambda b, pm: b["b"]["turn"]},
        pa.schema([("conv", pa.int64()), ("a_turn", pa.int64()),
                   ("b_turn", pa.int64())]))

    def go(share):
        cfg = EngineConfig(key_col="conv", ts_col="ts", type_col="role",
                           order_cols=("turn",), payload_cols=("v", "turn",
                                                               "conv"),
                           num_partitions=8, share=share)
        out = CEP(pats, cfg, emitter).run(rd.from_arrow(table)).to_pandas()
        return sorted(map(tuple, out.values.tolist()))

    assert go("auto") == go(None)


def test_local_search_deterministic():
    _, ev1 = run(FLAGSHIP, gen_stream(4, n=15), share="local_search")
    _, ev2 = run(FLAGSHIP, gen_stream(4, n=15), share="local_search")
    assert ev1._shared_sigs == ev2._shared_sigs


def test_nested_mini_window_bump_propagates_to_inner_sinks():
    """Fuzz-found: a mini consumed by another mini wires its sink while
    the outer mini still has the FIRST pattern's window; a later consumer
    relaxes the outer window, and the inner sink's window check must see
    the relaxed value or valid pairs get dropped."""
    pats = [
        Pattern(Seq(Primitive("tool", "e0"), Primitive("tool", "e1"),
                    Neg(Primitive("tool", "neg0")), Primitive("user", "e2")),
                window=5, pattern_id=0),
        Pattern(Seq(Primitive("tool", "e0"), Neg(Primitive("user", "neg0")),
                    Primitive("tool", "e1"), Primitive("user", "e2")),
                window=12, pattern_id=1),
    ]
    events = [({"v": 0, "turn": 0}, "tool", 9 * SEC),
              ({"v": 0, "turn": 1}, "tool", 16 * SEC),
              ({"v": 9, "turn": 2}, "user", 16 * SEC)]
    base, _ = run(pats, events, share=None)
    assert (1, ((0,), (1,), (2,)), None) in base
    for mode in ("leaves", "subtrees", "local_search"):
        got, _ = run(pats, events, share=mode)
        assert got == base, mode
