"""Brute-force CEP oracle for conformance tests.

An exhaustive, independent implementation of the match semantics (window,
SEQ order, Kleene subsets, negation, probability) used as the ground truth
that the tree evaluator is verified against — the same role the reference's
``generate_matches`` plays for its golden files (misc/Utils.py:175-215),
but extended to Kleene closure, negation, confidence, and per-slot filters.

Supports flat patterns: SEQ/AND over primitives, Kleene over a primitive,
NOT over a primitive, arbitrary conditions.  Intentionally exponential —
test-scale inputs only.
"""

from __future__ import annotations

from itertools import combinations
from typing import List, Optional, Tuple

from .conditions import AndCondition, TrueCondition
from .evaluator import INDEX_ATTR, _joint_prob
from .pattern import And, Composite, Kleene, Neg, Pattern, Primitive, Seq


class OracleEvent:
    __slots__ = ("payload", "type", "ts", "idx", "prob")

    def __init__(self, payload, type_, ts, idx, prob=None):
        self.payload = payload
        self.type = type_
        self.ts = ts
        self.idx = idx
        self.prob = prob


def oracle_matches(pattern: Pattern, events: List[Tuple[dict, str, int]],
                   probs: Optional[List[float]] = None):
    """Enumerate all matches of ``pattern`` over ``events`` given in arrival
    order as (payload, type, ts_us) tuples.  Returns a list of
    (frozen_match, probability) where frozen_match is a tuple of per-slot
    event-idx tuples (KC slots hold the item idx tuple)."""
    from .transformation import prepare_patterns
    results = []
    for p in prepare_patterns([pattern]):
        results.extend(_oracle_single(p, events, probs))
    return results


def _oracle_single(pattern: Pattern, raw_events, probs):
    evs: List[OracleEvent] = []
    for i, (payload, typ, ts) in enumerate(raw_events):
        payload = dict(payload)
        payload[INDEX_ATTR] = i
        evs.append(OracleEvent(payload, typ, ts,
                               i, probs[i] if probs else None))

    structure = pattern.structure
    if isinstance(structure, Composite):
        args = list(structure.args)
        is_seq = isinstance(structure, Seq)
    else:
        args, is_seq = [structure], False

    pos_args = [a for a in args if not isinstance(a, Neg)]
    neg_args = [(i, a.arg) for i, a in enumerate(args) if isinstance(a, Neg)]
    pos_positions = [i for i, a in enumerate(args) if not isinstance(a, Neg)]
    # bounded-vs-unbounded classification (NegationAlgorithm.py:28-45): a
    # BOUNDED negative only invalidates if it ARRIVED before the event that
    # completes the positive match (the reference does nothing on late
    # bounded negatives, tree/nodes/NegationNode.py:145-147); unbounded
    # negatives retro-invalidate pending positives at any later arrival.
    neg_bounded = {i: (is_seq and any(p > i for p in pos_positions))
                   for i, _ in neg_args}

    # split conjuncts: single-name non-KC conditions act as per-slot filters
    conjuncts = pattern.condition.flatten() \
        if not isinstance(pattern.condition, TrueCondition) else []
    if not conjuncts and not isinstance(pattern.condition, TrueCondition):
        conjuncts = [pattern.condition]
    slot_filters = {}
    rest = []
    all_names = {a.name if isinstance(a, Primitive) else None for a in pos_args}
    for c in conjuncts:
        cn = c.names()
        if len(cn) == 1 and not c.is_kc_condition():
            slot_filters.setdefault(next(iter(cn)), []).append(c)
        else:
            rest.append(c)

    neg_names = {a.name for _, a in neg_args}
    pos_conds = [c for c in rest if not (c.names() & neg_names)]
    neg_conds = {name: [c for c in rest if name in c.names()]
                 for name in neg_names}

    def passes_filters(name, payload):
        for c in slot_filters.get(name, ()):
            if not c.eval({name: payload}):
                return False
        return True

    # candidate lists per positive slot
    def candidates(arg):
        if isinstance(arg, Primitive):
            return [(e,) for e in evs
                    if e.type == arg.event_type
                    and passes_filters(arg.name, e.payload)]
        if isinstance(arg, Kleene):
            if not isinstance(arg.arg, Primitive):
                raise NotImplementedError("oracle supports Kleene over a "
                                          "primitive only")
            prim = arg.arg
            items = [e for e in evs if e.type == prim.event_type
                     and passes_filters(prim.name, e.payload)]
            out = []
            max_size = arg.max_size or len(items)
            for size in range(arg.min_size, max_size + 1):
                out.extend(combinations(items, size))
            return out
        if isinstance(arg, Composite) and all(
                isinstance(a, Primitive) for a in arg.args):
            # one nesting level: SEQ/AND of primitives inside a slot
            from itertools import product as _product
            per_prim = [[e for e in evs if e.type == a.event_type
                         and passes_filters(a.name, e.payload)]
                        for a in arg.args]
            # a SEQ anywhere above this group imposes a total order over ALL
            # leaves beneath it in leaf-index order (reference SeqNode
            # validates is_sorted over the full merged match,
            # tree/nodes/SeqNode.py:30-33) — so AND members nested in an
            # outer SEQ are ordered too, not just inner-SEQ members
            ordered = isinstance(arg, Seq) or is_seq
            out = []
            for combo in _product(*per_prim):
                if len({e.idx for e in combo}) != len(combo):
                    continue
                if ordered and any(combo[k].ts > combo[k + 1].ts
                                   for k in range(len(combo) - 1)):
                    continue
                out.append(tuple(combo))
            return out
        raise NotImplementedError(f"oracle does not support {arg!r}")

    cand_lists = [candidates(a) for a in pos_args]

    window = pattern.window_us
    matches = []
    # slot kinds drive ordering semantics, matching the evaluator's
    # per-ENTRY comparisons: a Kleene slot is ONE aggregate entry with
    # (min_ts, max_ts); a nested-composite slot is one entry PER primitive
    slot_kind = ["kc" if isinstance(a, Kleene)
                 else "group" if isinstance(a, Composite)
                 else "prim" for a in pos_args]

    def entries_of(slot_i, cand):
        if slot_kind[slot_i] == "kc":
            return [(cand[0].ts, cand[-1].ts)]
        return [(e.ts, e.ts) for e in cand]

    def slot_span(chosen):
        mins = [min(e.ts for e in c) for c in chosen]
        maxs = [max(e.ts for e in c) for c in chosen]
        return mins, maxs

    # NOTE on duplicates: the reference's no-duplicate check hashes a
    # Kleene AggregatedEvent as ONE unit (fresh counter id,
    # base/Event.py:53-58, tree/nodes/InternalNode.py:28-30), so an event
    # may appear both bound to a primitive leaf and inside a KC item list.
    # Only primitive-slot bindings participate in the dup check.
    slot_is_kc = [isinstance(a, Kleene) for a in pos_args]

    def recurse(i, chosen, used):
        if i == len(cand_lists):
            finalize(chosen)
            return
        is_kc = slot_is_kc[i]
        for cand in cand_lists[i]:
            if not is_kc:
                idxs = {e.idx for e in cand}
                if idxs & used:
                    continue
                new_used = used | idxs
            else:
                new_used = used
            chosen.append(cand)
            mins, maxs = slot_span(chosen)
            if max(maxs) - min(mins) <= window and order_ok(chosen):
                recurse(i + 1, chosen, new_used)
            chosen.pop()

    def order_ok(chosen):
        if not is_seq:
            return True
        # every entry of an earlier arg must precede every entry of a
        # later arg, component-wise on (min_ts, max_ts) — exactly the
        # evaluator's precompiled precedence checks
        for a in range(len(chosen)):
            for b in range(a + 1, len(chosen)):
                if pos_positions[a] >= pos_positions[b]:
                    continue
                for amin, amax in entries_of(a, chosen[a]):
                    for bmin, bmax in entries_of(b, chosen[b]):
                        if amin > bmin or amax > bmax:
                            return False
        return True

    def binding_of(chosen):
        binding = {}
        for arg, cand in zip(pos_args, chosen):
            if isinstance(arg, Primitive):
                binding[arg.name] = cand[0].payload
            elif isinstance(arg, Kleene):
                binding[arg.arg.name] = [e.payload for e in cand]
            else:  # nested composite: bind each inner primitive
                for prim, e in zip(arg.args, cand):
                    binding[prim.name] = e.payload
        return binding

    def finalize(chosen):
        binding = binding_of(chosen)
        for c in pos_conds:
            if not c.eval(binding):
                return
        prob = None
        for cand in chosen:
            for e in cand:
                prob = _joint_prob(prob, e.prob)
        # negation: each negative arg checked independently
        mins, maxs = slot_span(chosen)
        lo, hi = min(mins), max(maxs)
        used_idx = {e.idx for is_kc, cand in zip(slot_is_kc, chosen)
                    if not is_kc for e in cand}
        completion_idx = max(e.idx for cand in chosen for e in cand)
        for pos_idx, neg_prim in neg_args:
            bounded = neg_bounded[pos_idx]
            for e in evs:
                if e.type != neg_prim.event_type or e.idx in used_idx:
                    continue
                if bounded and e.idx >= completion_idx:
                    # arrived after the completing positive — the reference
                    # dispatches an event to positive leaves BEFORE negative
                    # leaves (get_leaves is left-first; NegationNode stacks on
                    # top), so a negative that IS the completing event never
                    # invalidates (tree/nodes/NegationNode.py:145-147)
                    continue
                if not passes_filters(neg_prim.name, e.payload):
                    continue
                if max(hi, e.ts) - min(lo, e.ts) > window:
                    continue
                if is_seq:
                    entrylists = [entries_of(i, c)
                                  for i, c in enumerate(chosen)]
                    if not _neg_order_ok(pos_idx, e, entrylists,
                                         pos_positions):
                        continue
                b2 = dict(binding)
                b2[neg_prim.name] = e.payload
                if all(c.eval(b2) for c in neg_conds[neg_prim.name]):
                    if e.prob is not None:
                        prob = _joint_prob(prob, 1.0 - e.prob)
                    else:
                        return  # invalidated
        if prob is not None and pattern.confidence is not None \
                and prob < pattern.confidence:
            return
        key_parts = []
        for i, cand in enumerate(chosen):
            if slot_kind[i] == "group":
                key_parts.extend((e.idx,) for e in cand)
            else:
                key_parts.append(tuple(e.idx for e in cand))
        key = tuple(key_parts)
        matches.append((key, prob, binding))

    recurse(0, [], set())
    return [(m, pattern.pattern_id, prob, binding)
            for (m, prob, binding) in matches]


def _neg_order_ok(neg_pos, neg_ev, entrylists, pos_positions):
    """SEQ ordering for a negative event at declared position ``neg_pos``:
    per entry, min-timestamp order against every positive entry before and
    after it (NSeq validation, tree/nodes/NegationNode.py:246-250)."""
    for i, entries in enumerate(entrylists):
        p = pos_positions[i]
        if p < neg_pos:
            for emin, _ in entries:
                if emin > neg_ev.ts:
                    return False
        elif p > neg_pos:
            for emin, _ in entries:
                if neg_ev.ts > emin:
                    return False
    return True
