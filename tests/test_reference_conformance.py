"""Conformance against the ACTUAL reference engine (ref-run): the
OpenCEP reference at /root/reference is pure Python, so these tests run
it in-process side-by-side with our evaluator on identical event
streams and compare canonical MATCH SETS (per-match tuples of member
event ids), not just counts.

Scope: the pattern-structure shapes where semantics are subtle enough
that the brute-force oracle alone is self-referential — flat SEQ with
timestamp ties, AND, and the round-4 ADVICE shape AND-nested-in-SEQ
(reference SeqNode validates is_sorted over the FULL leaf-index-ordered
merged match, tree/nodes/SeqNode.py:30-33, so nested-AND members are
totally ordered).  Skipped wholesale if the reference tree is absent.
"""

import random
from datetime import datetime, timedelta

import pytest

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_engine():
    import os
    import sys
    if not os.path.isdir(REF):
        pytest.skip("reference tree not available")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    try:
        from CEP import CEP                              # noqa: F401
    except Exception as exc:                             # pragma: no cover
        pytest.skip(f"reference engine not importable: {exc}")

    from base.DataFormatter import DataFormatter, EventTypeClassifier
    from stream.Stream import InputStream, OutputStream

    class TypeCls(EventTypeClassifier):
        def get_event_type(self, payload):
            return payload["type"]

    class Fmt(DataFormatter):
        def __init__(self):
            super().__init__(TypeCls())

        def parse_event(self, raw):
            return dict(raw)

        def get_event_timestamp(self, payload):
            return payload["ts"]

    class ListStream(InputStream):
        def __init__(self, items):
            super().__init__()
            for it in items:
                self._stream.put(it)
            self.close()

    def run(ref_pattern, events):
        from CEP import CEP
        out = OutputStream()
        CEP([ref_pattern]).run(ListStream(events), out, Fmt())
        matches = []
        for m in out:
            if m is None:
                continue
            ids = []
            for e in m.events:
                prims = getattr(e, "primitive_events", None)
                if prims is not None:   # Kleene AggregatedEvent
                    ids.extend(p.payload["id"] for p in prims)
                else:
                    ids.append(e.payload["id"])
            matches.append(tuple(sorted(ids)))
        return sorted(matches)

    return run


T0 = datetime(2020, 1, 1)


def _events(spec):
    """spec: [(hours, type), ...] -> reference payloads + our tuples."""
    ref, ours = [], []
    for i, (t, typ) in enumerate(spec):
        ref.append({"type": typ, "ts": T0 + timedelta(hours=t), "id": i})
        ours.append(({"id": i}, typ, int(t * 3600 * 1_000_000)))
    return ref, ours


def _run_ours(pattern, events):
    from opencep_ray import compile_patterns
    from opencep_ray.evaluator import ConversationEvaluator
    ev = ConversationEvaluator(compile_patterns(pattern))
    for payload, typ, ts in events:
        ev.process(dict(payload), typ, ts)
    ev.eos()
    out = []
    for cp, pm in ev.matches:
        ids = []
        for _, e in pm.entries:
            if e.primitives is None:
                ids.append(e.payload["id"])
            else:
                ids.extend(p.payload["id"] for p in e.primitives)
        out.append(tuple(sorted(ids)))
    return sorted(out)


def _ref_pattern(structure, window_hours):
    from base.Pattern import Pattern as RefPattern
    from condition.Condition import TrueCondition
    return RefPattern(structure, TrueCondition(),
                      timedelta(hours=window_hours))


def _our_pattern(structure, window_hours):
    from opencep_ray import Pattern
    return Pattern(structure, window=window_hours * 3600)


def _structures(window_hours=10):
    """(reference structure, our structure) pairs for each shape."""
    from base.PatternStructure import (AndOperator,
                                       PrimitiveEventStructure,
                                       SeqOperator)

    from opencep_ray import And, Primitive, Seq

    return {
        "flat_seq3": (
            SeqOperator(PrimitiveEventStructure("V", "a"),
                        PrimitiveEventStructure("C", "b"),
                        PrimitiveEventStructure("P", "d")),
            Seq(Primitive("V", "a"), Primitive("C", "b"),
                Primitive("P", "d"))),
        "flat_and": (
            AndOperator(PrimitiveEventStructure("V", "a"),
                        PrimitiveEventStructure("C", "b")),
            And(Primitive("V", "a"), Primitive("C", "b"))),
        "and_in_seq": (
            SeqOperator(PrimitiveEventStructure("V", "a"),
                        AndOperator(PrimitiveEventStructure("C", "b"),
                                    PrimitiveEventStructure("E", "c")),
                        PrimitiveEventStructure("P", "d")),
            Seq(Primitive("V", "a"),
                And(Primitive("C", "b"), Primitive("E", "c")),
                Primitive("P", "d"))),
        "seq_in_and": (
            AndOperator(SeqOperator(PrimitiveEventStructure("V", "a"),
                                    PrimitiveEventStructure("C", "b")),
                        PrimitiveEventStructure("E", "c")),
            And(Seq(Primitive("V", "a"), Primitive("C", "b")),
                Primitive("E", "c"))),
    }


def test_and_in_seq_directed(ref_engine):
    """The ADVICE shape, pinned: reference emits 1 match when b precedes
    c, 0 when c precedes b — and we agree on the exact match sets."""
    refs, ours = _structures()["and_in_seq"], None
    ref_s, our_s = refs
    for order, expect in ((["V", "C", "E", "P"], 1),
                          (["V", "E", "C", "P"], 0)):
        spec = [(i, t) for i, t in enumerate(order)]
        ref_ev, our_ev = _events(spec)
        got_ref = ref_engine(_ref_pattern(ref_s, 10), ref_ev)
        got_ours = _run_ours(_our_pattern(our_s, 10), our_ev)
        assert len(got_ref) == expect
        assert got_ours == got_ref


@pytest.mark.parametrize("shape", ["flat_seq3", "flat_and",
                                   "and_in_seq", "seq_in_and"])
@pytest.mark.parametrize("seed", range(4))
def test_random_streams_match_reference(ref_engine, shape, seed):
    """Randomized streams (duplicate types, shuffled arrival, window
    expiry in play): exact match-set equality vs the reference."""
    ref_s, our_s = _structures()[shape]
    rng = random.Random(1000 * seed + hash(shape) % 1000)
    n = 12
    spec = [(rng.randint(0, 20), rng.choice("VCEP")) for _ in range(n)]
    spec.sort(key=lambda x: x[0])
    ref_ev, our_ev = _events(spec)
    got_ref = ref_engine(_ref_pattern(ref_s, 8), ref_ev)
    got_ours = _run_ours(_our_pattern(our_s, 8), our_ev)
    assert got_ours == got_ref


def _extended_structures():
    """Shapes beyond the composite nesting: Kleene closure, negation
    (bounded middle + unbounded end), and a value condition."""
    from base.PatternStructure import (KleeneClosureOperator,
                                       NegationOperator,
                                       PrimitiveEventStructure,
                                       SeqOperator)

    from opencep_ray import Kleene, Neg, Primitive, Seq

    return {
        "kleene_in_seq": (
            SeqOperator(PrimitiveEventStructure("V", "a"),
                        KleeneClosureOperator(
                            PrimitiveEventStructure("C", "b"),
                            min_size=1, max_size=2),
                        PrimitiveEventStructure("P", "d")),
            Seq(Primitive("V", "a"),
                Kleene(Primitive("C", "b"), min_size=1, max_size=2),
                Primitive("P", "d"))),
        "neg_middle": (
            SeqOperator(PrimitiveEventStructure("V", "a"),
                        NegationOperator(PrimitiveEventStructure("E", "x")),
                        PrimitiveEventStructure("P", "d")),
            Seq(Primitive("V", "a"), Neg(Primitive("E", "x")),
                Primitive("P", "d"))),
        "neg_end": (
            SeqOperator(PrimitiveEventStructure("V", "a"),
                        PrimitiveEventStructure("P", "d"),
                        NegationOperator(PrimitiveEventStructure("E", "x"))),
            Seq(Primitive("V", "a"), Primitive("P", "d"),
                Neg(Primitive("E", "x")))),
    }


@pytest.mark.parametrize("shape", ["neg_middle", "neg_end"])
@pytest.mark.parametrize("seed", range(4))
def test_negation_match_reference(ref_engine, shape, seed):
    ref_s, our_s = _extended_structures()[shape]
    rng = random.Random(7000 * seed + len(shape))
    spec = sorted((rng.randint(0, 18), rng.choice("VCEP"))
                  for _ in range(12))
    ref_ev, our_ev = _events(spec)
    got_ref = ref_engine(_ref_pattern(ref_s, 8), ref_ev)
    got_ours = _run_ours(_our_pattern(our_s, 8), our_ev)
    assert got_ours == got_ref


def test_kleene_exact_when_no_counter_collision(ref_engine):
    """Exact Kleene match-set equality on a stream where the reference's
    AggregatedEvent index-collision artifact (see below) cannot fire:
    a buffer event between the last Kleene member and the completing
    event moves the global arrival counter along, so no aggregate
    shares an index with a bound primitive.  Both engines emit all
    three newest-containing subsets."""
    ref_s, our_s = _extended_structures()["kleene_in_seq"]
    spec = [(0, "V"), (1, "C"), (2, "C"), (3, "E"), (4, "P")]
    ref_ev, our_ev = _events(spec)
    got_ref = ref_engine(_ref_pattern(ref_s, 8), ref_ev)
    got_ours = _run_ours(_our_pattern(our_s, 8), our_ev)
    assert got_ref == [(0, 1, 2, 4), (0, 1, 4), (0, 2, 4)]
    assert got_ours == got_ref


def test_kleene_counter_collision_artifact_documented(ref_engine):
    """DELIBERATE DIVERGENCE, pinned: the reference's AggregatedEvent
    reuses the CURRENT global event counter as its index without
    incrementing it (base/Event.py:56), so a Kleene aggregate created
    while event k is being handled carries the same index as event k+1;
    the duplicate-events check (tree/nodes/InternalNode.py:28) then
    spuriously rejects any match binding both.  On V C C P the
    reference drops (V, {C2}, P) and (V, {C1,C2}, P) — their aggregates
    were created during C2's handling and collide with P — keeping only
    (V, {C1}, P); inserting ONE unrelated event restores all three
    (test above), proving this is an arrival-interleaving artifact of
    the global counter, not window/order semantics.  A distributed
    engine has no global arrival counter, so we deliberately emit the
    full semantic match set; reference output is always a SUBSET of
    ours on Kleene patterns."""
    ref_s, our_s = _extended_structures()["kleene_in_seq"]
    spec = [(0, "V"), (1, "C"), (2, "C"), (3, "P")]
    ref_ev, our_ev = _events(spec)
    got_ref = ref_engine(_ref_pattern(ref_s, 8), ref_ev)
    got_ours = _run_ours(_our_pattern(our_s, 8), our_ev)
    assert got_ref == [(0, 1, 3)]                 # artifact drops 2
    assert got_ours == [(0, 1, 2, 3), (0, 1, 3), (0, 2, 3)]
    assert set(got_ref) <= set(got_ours)


@pytest.mark.parametrize("seed", range(4))
def test_kleene_random_reference_subset_and_oracle_exact(ref_engine,
                                                         seed):
    """Random Kleene streams: the reference is a subset of us (its
    counter-collision artifact only ever DROPS matches), and our result
    is exactly the brute-force oracle's."""
    from opencep_ray.oracle import oracle_matches
    ref_s, our_s = _extended_structures()["kleene_in_seq"]
    rng = random.Random(9100 + seed)
    spec = sorted((rng.randint(0, 18), rng.choice("VCEP"))
                  for _ in range(12))
    ref_ev, our_ev = _events(spec)
    got_ref = ref_engine(_ref_pattern(ref_s, 8), ref_ev)
    got_ours = _run_ours(_our_pattern(our_s, 8), our_ev)
    assert set(got_ref) <= set(got_ours)
    our_p = _our_pattern(our_s, 8)
    oracle = sorted(
        tuple(sorted(i for leaf in key for i in leaf))
        for key, _, _, _ in oracle_matches(our_p, our_ev))
    assert got_ours == oracle


@pytest.mark.parametrize("seed", range(4))
def test_value_condition_matches_reference(ref_engine, seed):
    """GreaterThanCondition over a payload attribute, evaluated by both
    engines on the same stream (reference condition/BaseRelationCondition
    vs our conditions module)."""
    from base.PatternStructure import PrimitiveEventStructure, SeqOperator
    from base.Pattern import Pattern as RefPattern
    from condition.Condition import Variable as RefVariable
    from condition.BaseRelationCondition import GreaterThanCondition \
        as RefGT

    from opencep_ray import (GreaterThanCondition, Pattern, Primitive,
                             Seq, Variable)

    rng = random.Random(31 + seed)
    spec = sorted((rng.randint(0, 15), rng.choice("VP"))
                  for _ in range(10))
    ref_ev, our_ev = _events(spec)
    for i, (r, (payload, typ, ts)) in enumerate(zip(ref_ev, our_ev)):
        v = rng.randint(0, 9)
        r["v"] = v
        payload["v"] = v

    ref_p = RefPattern(
        SeqOperator(PrimitiveEventStructure("V", "a"),
                    PrimitiveEventStructure("P", "d")),
        RefGT(RefVariable("d", lambda e: e["v"]),
              RefVariable("a", lambda e: e["v"])),
        timedelta(hours=8))
    our_p = Pattern(Seq(Primitive("V", "a"), Primitive("P", "d")),
                    GreaterThanCondition(
                        Variable("d", lambda e: e["v"]),
                        Variable("a", lambda e: e["v"])),
                    window=8 * 3600)
    got_ref = ref_engine(ref_p, ref_ev)
    got_ours = _run_ours(our_p, our_ev)
    assert got_ours == got_ref


def test_reference_cannot_evaluate_or(ref_engine):
    """Negative ref-run pin: the reference engine CANNOT evaluate
    OrOperator — its TreePlanBuilder raises "Unsupported binary
    operator" (plan/TreePlanBuilder.py:331) for any OR in the
    structure.  Our rewrite-to-multi-pattern-union (transformation.
    prepare_patterns) is therefore a strict superset of the reference's
    executable surface; OR semantics are gated by the brute-force
    oracle and the cep_or SQL hash instead."""
    from base.PatternStructure import (OrOperator,
                                       PrimitiveEventStructure,
                                       SeqOperator)
    ref_s = SeqOperator(PrimitiveEventStructure("V", "a"),
                        OrOperator(PrimitiveEventStructure("C", "b"),
                                   PrimitiveEventStructure("E", "b")))
    ref_ev, _ = _events([(0, "V"), (1, "C")])
    with pytest.raises(Exception, match="Unsupported binary operator"):
        ref_engine(_ref_pattern(ref_s, 8), ref_ev)


@pytest.mark.parametrize("seed", range(4))
def test_heavy_tie_streams_match_reference(ref_engine, seed):
    """Many identical timestamps: SEQ tie semantics (non-strict <= with
    the max_timestamp secondary key) must agree exactly."""
    ref_s, our_s = _structures()["flat_seq3"]
    rng = random.Random(5500 + seed)
    # only 3 distinct timestamps over 12 events -> dense ties
    spec = sorted((rng.choice([0, 1, 2]), rng.choice("VCP"))
                  for _ in range(12))
    ref_ev, our_ev = _events(spec)
    got_ref = ref_engine(_ref_pattern(ref_s, 8), ref_ev)
    got_ours = _run_ours(_our_pattern(our_s, 8), our_ev)
    assert got_ours == got_ref


def _ref_policy_imports():
    from base.Pattern import Pattern as RefPattern
    from base.PatternStructure import PrimitiveEventStructure, SeqOperator
    from condition.Condition import TrueCondition
    from misc.ConsumptionPolicy import ConsumptionPolicy as RefCP
    from misc.SelectionStrategies import SelectionStrategies as RefSS
    return RefPattern, PrimitiveEventStructure, SeqOperator, \
        TrueCondition, RefCP, RefSS


@pytest.mark.parametrize("strategy", ["single", "next"])
@pytest.mark.parametrize("seed", range(4))
def test_selection_strategies_match_reference(ref_engine, strategy,
                                              seed):
    """MATCH_SINGLE / MATCH_NEXT selection strategies on the V leaf:
    exact match-set equality vs the reference on random streams."""
    (RefPattern, Prim, SeqOp, TrueC, RefCP, RefSS) = _ref_policy_imports()
    from opencep_ray import (ConsumptionPolicy, Pattern, Primitive,
                             SelectionStrategy, Seq)

    rng = random.Random(6200 + seed + (0 if strategy == "single" else 50))
    spec = sorted((rng.randint(0, 14), rng.choice("VC"))
                  for _ in range(10))
    ref_ev, our_ev = _events(spec)
    ref_ss = RefSS.MATCH_SINGLE if strategy == "single" \
        else RefSS.MATCH_NEXT
    our_ss = SelectionStrategy.MATCH_SINGLE if strategy == "single" \
        else SelectionStrategy.MATCH_NEXT
    # reference API: restricting "single" to specific types requires
    # primary = MATCH_ANY (default) + the strategy as SECONDARY
    # (misc/ConsumptionPolicy.py:55-74)
    ref_p = RefPattern(SeqOp(Prim("V", "a"), Prim("C", "b")), TrueC(),
                       timedelta(hours=8),
                       consumption_policy=RefCP(
                           single="V",
                           secondary_selection_strategy=ref_ss))
    our_p = Pattern(Seq(Primitive("V", "a"), Primitive("C", "b")),
                    window=8 * 3600,
                    consumption_policy=ConsumptionPolicy(
                        single="V",
                        secondary_selection_strategy=our_ss))
    got_ref = ref_engine(ref_p, ref_ev)
    got_ours = _run_ours(our_p, our_ev)
    assert got_ours == got_ref


@pytest.mark.parametrize("seed", range(4))
def test_freeze_matches_reference(ref_engine, seed):
    """Freeze policy: appearance of a C freezes new partial-match
    creation until it is matched or expires — exact equality vs the
    reference on random streams."""
    (RefPattern, Prim, SeqOp, TrueC, RefCP, RefSS) = _ref_policy_imports()
    from opencep_ray import ConsumptionPolicy, Pattern, Primitive, Seq

    rng = random.Random(6900 + seed)
    spec = sorted((rng.randint(0, 14), rng.choice("VC"))
                  for _ in range(10))
    ref_ev, our_ev = _events(spec)
    ref_p = RefPattern(SeqOp(Prim("V", "a"), Prim("C", "b")), TrueC(),
                       timedelta(hours=8),
                       consumption_policy=RefCP(freeze="b"))
    our_p = Pattern(Seq(Primitive("V", "a"), Primitive("C", "b")),
                    window=8 * 3600,
                    consumption_policy=ConsumptionPolicy(freeze="b"))
    got_ref = ref_engine(ref_p, ref_ev)
    got_ours = _run_ours(our_p, our_ev)
    assert got_ours == got_ref


@pytest.mark.parametrize("seed", range(4))
def test_contiguity_matches_reference_on_pure_streams(ref_engine, seed):
    """Strict contiguity (a, b adjacent in the input): ref-run on
    streams containing ONLY pattern-relevant types, where our
    relative-to-relevant-types adjacency and the reference's
    global-arrival-counter adjacency coincide (the general-stream
    difference is a documented divergence, COVERAGE.md §2.3)."""
    (RefPattern, Prim, SeqOp, TrueC, RefCP, RefSS) = _ref_policy_imports()
    from opencep_ray import ConsumptionPolicy, Pattern, Primitive, Seq

    rng = random.Random(7300 + seed)
    spec = sorted((rng.randint(0, 14), rng.choice("VC"))
                  for _ in range(10))
    ref_ev, our_ev = _events(spec)
    ref_p = RefPattern(SeqOp(Prim("V", "a"), Prim("C", "b")), TrueC(),
                       timedelta(hours=8),
                       consumption_policy=RefCP(contiguous=["a", "b"]))
    our_p = Pattern(Seq(Primitive("V", "a"), Primitive("C", "b")),
                    window=8 * 3600,
                    consumption_policy=ConsumptionPolicy(
                        contiguous=["a", "b"]))
    got_ref = ref_engine(ref_p, ref_ev)
    got_ours = _run_ours(our_p, our_ev)
    assert got_ours == got_ref


@pytest.mark.parametrize("seed", range(4))
def test_probabilistic_confidence_matches_reference(ref_engine, seed):
    """Probabilistic streams: per-event probability from the data
    formatter, match probability = joint product, matches below
    Pattern.confidence dropped — exact match sets AND probabilities vs
    the reference."""
    import os
    import sys
    if "/root/reference" not in sys.path:     # fixture already added it
        sys.path.insert(0, "/root/reference")
    from base.DataFormatter import DataFormatter, EventTypeClassifier
    from base.Pattern import Pattern as RefPattern
    from base.PatternStructure import PrimitiveEventStructure, SeqOperator
    from condition.Condition import TrueCondition
    from stream.Stream import InputStream, OutputStream
    from CEP import CEP as RefCEP

    from opencep_ray import Pattern, Primitive, Seq, compile_patterns
    from opencep_ray.evaluator import ConversationEvaluator

    class TypeCls(EventTypeClassifier):
        def get_event_type(self, payload):
            return payload["type"]

    class ProbFmt(DataFormatter):
        def __init__(self):
            super().__init__(TypeCls())

        def parse_event(self, raw):
            return dict(raw)

        def get_event_timestamp(self, payload):
            return payload["ts"]

        def get_probability(self, payload):
            return payload["p"]

    class ListStream(InputStream):
        def __init__(self, items):
            super().__init__()
            for it in items:
                self._stream.put(it)
            self.close()

    rng = random.Random(8800 + seed)
    spec = sorted((rng.randint(0, 12), rng.choice("VC"))
                  for _ in range(10))
    probs = [round(rng.uniform(0.3, 1.0), 3) for _ in spec]
    ref_ev = [{"type": t, "ts": T0 + timedelta(hours=h), "id": i,
               "p": probs[i]} for i, (h, t) in enumerate(spec)]
    our_ev = [({"id": i}, t, int(h * 3600 * 1e6), probs[i])
              for i, (h, t) in enumerate(spec)]

    ref_p = RefPattern(SeqOperator(PrimitiveEventStructure("V", "a"),
                                   PrimitiveEventStructure("C", "b")),
                       TrueCondition(), timedelta(hours=8),
                       confidence=0.5)
    out = OutputStream()
    RefCEP([ref_p]).run(ListStream(ref_ev), out, ProbFmt())
    got_ref = sorted(
        (tuple(sorted(e.payload["id"] for e in m.events)),
         round(m.probability, 9))
        for m in out if m is not None)

    our_p = Pattern(Seq(Primitive("V", "a"), Primitive("C", "b")),
                    window=8 * 3600, confidence=0.5)
    ev = ConversationEvaluator(compile_patterns(our_p))
    for payload, typ, ts, pr in our_ev:
        ev.process(dict(payload), typ, ts, pr)
    ev.eos()
    got_ours = sorted(
        (tuple(sorted(e.payload["id"] for _, e in pm.entries)),
         round(pm.prob, 9))
        for cp, pm in ev.matches)
    assert got_ours == got_ref
