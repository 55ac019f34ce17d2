"""Local-search selection of WHICH subtrees to share across patterns —
the semantics of the reference's multi-pattern local search
(``/root/reference/plan/multi/local_search/LocalSearch.py:15-180``,
``TabuSearch``): a state is a sharing configuration, neighbors toggle
merges, and a tabu list prevents revisiting; the cheapest visited state
wins under a step threshold.

The cost model is a deliberate simplification of the reference's
tree-cost objective, calibrated to the one effect measured in this
engine (tests/test_multipattern_sharing.py + bench A/B): sharing pays
when the shared node carries WORK (conditions, joins) and costs when it
is a bare leaf (the per-sink entry-key remap of every emitted partial
match outweighs re-creating a trivial PM).  Cost terms per candidate
signature:

* ``own``      — work of evaluating the node once (leaf rate scaled by
  its condition count; join/KC = child work + output estimate);
* ``fanout``   — number of patterns containing the node;
* unshared cost = ``own × fanout``;
* shared cost  = ``own + remap_penalty × emit × (fanout − 1)`` where
  ``emit`` is the node's emitted-matches estimate.

Interactions come from NESTING: sharing a subtree absorbs its
descendants (they are instantiated once inside the mini regardless of
their own sharing state), so per-signature decisions are not
independent and a neighborhood search is meaningful.
"""

from __future__ import annotations

import random
from collections import deque
from typing import Dict, List, Sequence

REMAP_PENALTY = 1.2   # measured: sharing bare leaves lost ~18–27%
COND_WEIGHT = 1.0


def _node_estimates(compiled) -> Dict[int, tuple]:
    """Per-spec (own_work, emit) estimates from type-count statistics
    (uniform rates when absent), keyed by id(spec)."""
    out: Dict[int, tuple] = {}

    for cp in compiled:
        counts = (getattr(cp, "statistics", None) or {}).get("type_counts") \
            if isinstance(getattr(cp, "statistics", None), dict) else None

        def rate(event_type):
            if not counts:
                return 1.0
            total = sum(counts.values()) or 1
            return max(counts.get(event_type, 0) / total, 1e-6)

        def walk(spec):
            if id(spec) in out:
                return out[id(spec)]
            kind = spec.kind
            if kind == 0:      # leaf
                r = rate(spec.leaf.event_type)
                own = r * (1.0 + COND_WEIGHT * len(spec.leaf.conditions))
                emit = r
            elif kind == 2:    # kc
                cw, ce = walk(spec.children[0])
                own = cw + 2.0 * ce
                emit = 2.0 * ce
            else:              # join / neg
                lw, le = walk(spec.children[0])
                rw_, re_ = walk(spec.children[1])
                own = lw + rw_ + le * re_
                emit = 0.5 * le * re_ if kind == 1 else le
            out[id(spec)] = (own, emit)
            return out[id(spec)]

        walk(cp.root)
    return out


def sharing_cost(compiled, subset: frozenset,
                 candidates: frozenset) -> float:
    """Total estimated work of evaluating all patterns under the sharing
    configuration ``subset`` (⊆ ``candidates``): walk each pattern from
    the root; a node whose signature is enabled is accounted ONCE
    globally plus a remap penalty per extra consumer, and its subtree is
    not walked again for other consumers."""
    est = _node_estimates(compiled)
    shared_seen: Dict[tuple, int] = {}
    total = 0.0

    def walk(spec):
        nonlocal total
        sig = spec.share_sig
        if sig is not None and sig in subset:
            n = shared_seen.get(sig, 0)
            shared_seen[sig] = n + 1
            own, emit = est[id(spec)]
            if n == 0:
                total += own
            else:
                total += REMAP_PENALTY * emit
            return
        own, emit = est[id(spec)]
        if not spec.children:
            total += own
            return
        # account this node's local work (own minus children's, which
        # are walked explicitly so sharing inside them can apply)
        child_work = sum(est[id(ch)][0] for ch in spec.children)
        total += max(own - child_work, 0.0)
        for ch in spec.children:
            walk(ch)

    for cp in compiled:
        walk(cp.root)
    return total


def choose_shared_sigs(compiled, candidates: frozenset,
                       steps_threshold: int = 30,
                       lookup_radius: int = 4,
                       tabu_capacity: int = 64,
                       seed: int = 29) -> frozenset:
    """Tabu search over sharing configurations (LocalSearch.py:95-140):
    from the all-shared state, explore ``lookup_radius`` random one-flip
    neighbors per step, move to the cheapest non-tabu one, and keep the
    best state seen; stop after ``steps_threshold`` non-improving steps.
    Deterministic via the seed."""
    cand_list: List[tuple] = sorted(candidates, key=repr)
    if not cand_list:
        return frozenset()
    rng = random.Random(seed)
    current = frozenset(cand_list)
    best = current
    best_cost = sharing_cost(compiled, best, candidates)
    tabu = deque([current], maxlen=tabu_capacity)
    tabu_set = {current}
    allowed = steps_threshold
    while allowed > 0:
        neighbors = []
        for _ in range(lookup_radius):
            flip = rng.choice(cand_list)
            state = current - {flip} if flip in current \
                else current | {flip}
            if state not in tabu_set:
                neighbors.append(state)
        if not neighbors:
            allowed -= 1
            continue
        scored = sorted((sharing_cost(compiled, s, candidates), repr(s), s)
                        for s in neighbors)
        _, _, current = scored[0]
        if len(tabu) == tabu.maxlen:
            tabu_set.discard(tabu[0])
        tabu.append(current)
        tabu_set.add(current)
        cur_cost = scored[0][0]
        if cur_cost < best_cost:
            best, best_cost = current, cur_cost
            allowed = steps_threshold
        else:
            allowed -= 1
    return best
