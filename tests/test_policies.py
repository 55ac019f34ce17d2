"""Consumption policies: MATCH_SINGLE / MATCH_NEXT / contiguity
(reference: test/PolicyTests.py:9-96 pattern classes)."""

from opencep_ray import (ConsumptionPolicy, Pattern, Primitive,
                         SelectionStrategy, Seq, compile_patterns)
from opencep_ray.evaluator import ConversationEvaluator

SEC = 1_000_000


def run(pattern, events):
    ev = ConversationEvaluator(compile_patterns(pattern))
    for i, (typ, ts) in enumerate(events):
        ev.process({"i": i}, typ, ts * SEC)
    ev.eos()
    out = []
    for _cp, pm in ev.matches:
        out.append(tuple(e.payload["i"]
                         for e in ConversationEvaluator.primitive_events(pm)))
    return out


EVENTS = [("user", 0), ("assistant", 1), ("assistant", 2), ("user", 3),
          ("assistant", 4)]


def test_no_policy_all_matches():
    p = Pattern(Seq(Primitive("user", "a"), Primitive("assistant", "b")),
                window=100)
    got = run(p, EVENTS)
    assert sorted(got) == [(0, 1), (0, 2), (0, 4), (3, 4)]


def test_match_single_at_root():
    # a 'user' event may appear in at most one ACCEPTED full match
    p = Pattern(Seq(Primitive("user", "a"), Primitive("assistant", "b")),
                window=100,
                consumption_policy=ConsumptionPolicy(
                    single="user",
                    secondary_selection_strategy=SelectionStrategy
                    .MATCH_SINGLE))
    got = run(p, EVENTS)
    # arrival order of matches: (0,1) accepted -> user 0 consumed;
    # (0,2) dropped; (3,4) accepted; (0,4) dropped
    assert got == [(0, 1), (3, 4)]


def test_match_next():
    # MATCH_NEXT: the event only matches the next partial match at every
    # node above its leaf
    p = Pattern(Seq(Primitive("user", "a"), Primitive("assistant", "b")),
                window=100,
                consumption_policy=ConsumptionPolicy(
                    single="user",
                    secondary_selection_strategy=SelectionStrategy
                    .MATCH_NEXT))
    got = run(p, EVENTS)
    assert got == [(0, 1), (3, 4)]


def test_contiguity():
    # a and b must be adjacent in arrival order (among pattern-type events)
    p = Pattern(Seq(Primitive("user", "a"), Primitive("assistant", "b")),
                window=100,
                consumption_policy=ConsumptionPolicy(
                    contiguous=["a", "b"]))
    got = run(p, EVENTS)
    assert sorted(got) == [(0, 1), (3, 4)]


def test_contiguity_three_events():
    p = Pattern(Seq(Primitive("user", "a"), Primitive("assistant", "b"),
                    Primitive("assistant", "c")),
                window=100,
                consumption_policy=ConsumptionPolicy(
                    contiguous=["a", "b", "c"]))
    got = run(p, EVENTS)
    assert got == [(0, 1, 2)]




def test_freeze_policy_blocks_until_matched():
    # freeze on 'b': after a 'b'-type event arrives, no new 'a' or 'b'
    # partials start until that freezer is matched or expires
    p = Pattern(Seq(Primitive("user", "a"), Primitive("assistant", "b")),
                window=100,
                consumption_policy=ConsumptionPolicy(freeze="b"))
    # u0: a-candidate; asst1: freezer arrives AND matches (0,1) -> unfrozen
    # immediately; u2 accepted; asst3 joins both live a-partials (freeze
    # never retracts existing partials — reference behavior)
    got = run(p, [("user", 0), ("assistant", 1), ("user", 2),
                  ("assistant", 3)])
    assert got == [(0, 1), (0, 3), (2, 3)]


def test_freeze_policy_blocks_new_starts():
    p = Pattern(Seq(Primitive("user", "a"), Primitive("assistant", "b")),
                window=100,
                consumption_policy=ConsumptionPolicy(freeze="b"))
    # asst0 arrives first: becomes an active freezer with NO match to
    # release it (no prior user) -> user1/user2 are blocked while frozen;
    # asst3: matches nothing (no a partials) and refreezes
    got = run(p, [("assistant", 0), ("user", 1), ("user", 2),
                  ("assistant", 3)])
    assert got == []


def test_freeze_policy_expires_with_window():
    p = Pattern(Seq(Primitive("user", "a"), Primitive("assistant", "b")),
                window=5,
                consumption_policy=ConsumptionPolicy(freeze="b"))
    # freezer at t=0 expires by t=10; the (10, 12) pair then matches
    got = run(p, [("assistant", 0), ("user", 10), ("assistant", 12)])
    assert got == [(1, 2)]
