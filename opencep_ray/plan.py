"""Plan-time optimization: evaluation-order selection from statistics.

Re-implements the reference's plan-builder family semantics
(``/root/reference/plan/LeftDeepTreeBuilders.py``, cost model
``plan/TreeCostModel.py:23-97``) for this engine's architecture.  Because
SEQ ordering is validated through the slot-precedence relation (not through
join-tree shape), ANY join order over the top-level positive args produces
identical match sets — order choice is purely a performance decision, which
makes these builders safe drop-ins.

Statistics format (reference: ``base/Pattern.py`` ``statistics`` dict):

* ``arrival_rates``: list of per-positive-arg event rates (events / window)
* ``selectivity_matrix``: NxN matrix, ``sel[i][j]`` = probability that the
  pairwise conditions between args i and j hold (1.0 when unconstrained)
"""

from __future__ import annotations

from itertools import combinations
from typing import Dict, List, Optional, Sequence

TRIVIAL = "trivial"
SORT_BY_FREQUENCY = "sort_by_frequency"
GREEDY = "greedy"
DYNAMIC_PROGRAMMING = "dynamic_programming"


def intermediate_results_cost(order: Sequence[int], rates: Sequence[float],
                              sel: Sequence[Sequence[float]]) -> float:
    """Σ over prefixes of the expected number of partial matches — the
    reference's IntermediateResultsTreeCostModel for left-deep trees
    (plan/TreeCostModel.py:60-97): leaf i costs ``rate_i·sel[i][i]``; a
    join of prefix P with leaf j multiplies by ``rate_j·Π sel[k][j]``."""
    cost = 0.0
    prefix_card = 1.0
    for pos, i in enumerate(order):
        card_i = rates[i] * sel[i][i]
        prefix_card *= card_i
        for prev in order[:pos]:
            prefix_card *= sel[prev][i] * sel[i][prev]
        cost += prefix_card
    return cost


def order_trivial(n: int, rates=None, sel=None) -> List[int]:
    """Declaration order (plan/LeftDeepTreeBuilders.py:59-65)."""
    return list(range(n))


def order_by_frequency(n: int, rates: Sequence[float],
                       sel=None) -> List[int]:
    """Ascending arrival rate (plan/LeftDeepTreeBuilders.py:68-80);
    ties keep declaration order."""
    return sorted(range(n), key=lambda i: (rates[i], i))


def order_greedy(n: int, rates: Sequence[float],
                 sel: Sequence[Sequence[float]]) -> List[int]:
    """Greedy min-intermediate-results order
    (plan/LeftDeepTreeBuilders.py:83-135): repeatedly append the arg that
    minimizes the running cardinality product."""
    remaining = set(range(n))
    order: List[int] = []
    while remaining:
        best, best_card = None, None
        for j in sorted(remaining):
            card = rates[j] * sel[j][j]
            for i in order:
                card *= sel[i][j] * sel[j][i]
            if best_card is None or card < best_card:
                best, best_card = j, card
        order.append(best)
        remaining.remove(best)
    return order


def order_greedy_with_invariants(n: int, rates: Sequence[float],
                                 sel: Sequence[Sequence[float]]):
    """Greedy order plus its optimality INVARIANTS — the reference's
    InvariantAwareGreedyTreeBuilder (plan/invariant/
    InvariantLeftDeepTreeBuilder.py:49-120, Invariants.py:39-70): at each
    step the chosen arg must keep a smaller change factor than the
    runner-up; each invariant is the (chosen, runner_up) index pair.
    Testing the invariants against fresh statistics decides whether the
    greedy plan is still optimal WITHOUT recomputing it."""
    def change_factor(x, prefix):
        c = rates[x] * sel[x][x]
        for p in prefix:
            c *= sel[x][p] * sel[p][x]
        return c

    remaining = set(range(n))
    order: List[int] = []
    invariants: List[tuple] = []
    while remaining:
        scored = sorted(((change_factor(j, order), j)
                         for j in sorted(remaining)))
        best = scored[0][1]
        if len(scored) > 1:
            invariants.append((best, scored[1][1]))
        order.append(best)
        remaining.remove(best)
    return order, invariants


def greedy_invariants_violated(invariants: Sequence[tuple],
                               rates: Sequence[float],
                               sel: Sequence[Sequence[float]]) -> bool:
    """True when fresh statistics break any stored invariant
    (GreedyTreeInvariants.is_invariants_violated, Invariants.py:39-70):
    the i-th step's chosen arg no longer beats its runner-up given the
    already-chosen prefix."""
    prefix: List[int] = []
    for chosen, runner in invariants:
        def cf(x):
            c = rates[x] * sel[x][x]
            for p in prefix:
                c *= sel[x][p] * sel[p][x]
            return c

        if cf(chosen) > cf(runner):
            return True
        prefix.append(chosen)
    return False


def order_dynamic_programming(n: int, rates: Sequence[float],
                              sel: Sequence[Sequence[float]]) -> List[int]:
    """Exact min-cost left-deep order by DP over subsets
    (plan/LeftDeepTreeBuilders.py:180-223).  O(2^n · n²) — fine for the
    ≤8-arg patterns CEP queries use."""
    if n > 16:
        return order_greedy(n, rates, sel)
    best: Dict[frozenset, tuple] = {}

    def card_of(subset_order):
        card = 1.0
        for pos, i in enumerate(subset_order):
            card *= rates[i] * sel[i][i]
            for prev in subset_order[:pos]:
                card *= sel[prev][i] * sel[i][prev]
        return card

    for i in range(n):
        s = frozenset([i])
        best[s] = (rates[i] * sel[i][i], (i,))
    for size in range(2, n + 1):
        for subset in combinations(range(n), size):
            s = frozenset(subset)
            choice = None
            for j in subset:
                rest = s - {j}
                rest_cost, rest_order = best[rest]
                new_card = card_of(rest_order + (j,))
                total = rest_cost + new_card
                if choice is None or total < choice[0]:
                    choice = (total, rest_order + (j,))
            best[s] = choice
    return list(best[frozenset(range(n))][1])


ITERATIVE_IMPROVEMENT = "iterative_improvement"


def order_iterative_improvement(n: int, rates: Sequence[float],
                                sel: Sequence[Sequence[float]],
                                step_limit: Optional[int] = None,
                                ii_type: str = "swap",
                                init: str = "greedy",
                                seed: int = 23) -> List[int]:
    """Randomized local search over left-deep orders — the reference's
    IterativeImprovementLeftDeepTreeBuilder
    (plan/LeftDeepTreeBuilders.py:138-177, plan/IterativeImprovement.py):
    start from a greedy (or seeded-random) order, propose ``step_limit``
    random swap / 3-cycle moves, keep strictly improving ones.  A fixed
    seed keeps plans deterministic across workers/runs."""
    import random as _random
    rng = _random.Random(seed)
    if init == "greedy":
        order = order_greedy(n, rates, sel)
    else:
        order = list(range(n))
        rng.shuffle(order)
    if n < 2:
        return order
    if step_limit is None:
        step_limit = 10 * n * n
    cost = intermediate_results_cost(order, rates, sel)
    for _ in range(step_limit):
        if ii_type == "circle" and n >= 3:
            i, j, k = sorted(rng.sample(range(n), 3))
            move = (i, j, k) if rng.random() < 0.5 else (i, k, j)
            a, b, c = move
            order[a], order[b], order[c] = order[b], order[c], order[a]
            new_cost = intermediate_results_cost(order, rates, sel)
            if new_cost < cost:
                cost = new_cost
            else:
                order[b], order[c], order[a] = order[a], order[b], order[c]
        else:
            i = rng.randrange(n)
            j = rng.randrange(n)
            order[i], order[j] = order[j], order[i]
            new_cost = intermediate_results_cost(order, rates, sel)
            if new_cost < cost:
                cost = new_cost
            else:
                order[i], order[j] = order[j], order[i]
    return order


_BUILDERS = {
    TRIVIAL: order_trivial,
    SORT_BY_FREQUENCY: order_by_frequency,
    GREEDY: order_greedy,
    DYNAMIC_PROGRAMMING: order_dynamic_programming,
    ITERATIVE_IMPROVEMENT: order_iterative_improvement,
}

BUSHY = "bushy"
ZSTREAM = "zstream"
ZSTREAM_ORD = "zstream_ord"


def bushy_shape(n: int, rates: Sequence[float],
                sel: Sequence[Sequence[float]]):
    """Min-cost BUSHY join shape by DP over all disjoint splits — the
    reference's DynamicProgrammingBushyTreeBuilder
    (plan/BushyTreeBuilders.py:16-65).  Returns a nested tuple of arg
    indices, e.g. ``((0, 1), (2, 3))``; results are plan-invariant, only
    the number of intermediate partial matches changes."""
    if n == 1:
        return 0

    def card(subset: frozenset) -> float:
        c = 1.0
        items = sorted(subset)
        for i in items:
            c *= rates[i] * sel[i][i]
        for x in range(len(items)):
            for y in range(x + 1, len(items)):
                i, j = items[x], items[y]
                c *= sel[i][j] * sel[j][i]
        return c

    best: Dict[frozenset, tuple] = {}
    for i in range(n):
        s = frozenset([i])
        best[s] = (card(s), i)
    for size in range(2, n + 1):
        for subset in combinations(range(n), size):
            s = frozenset(subset)
            choice = None
            seen_splits = set()
            items = sorted(s)
            first = items[0]
            for r in range(1, size):
                for left_rest in combinations(items[1:], r - 1):
                    left = frozenset((first,) + left_rest)
                    right = s - left
                    key = (left, right)
                    if key in seen_splits:
                        continue
                    seen_splits.add(key)
                    total = best[left][0] + best[right][0] + card(s)
                    if choice is None or total < choice[0]:
                        choice = (total, (best[left][1], best[right][1]))
            best[s] = choice
    return best[frozenset(range(n))][1]


def zstream_shape(n: int, rates: Sequence[float],
                  sel: Sequence[Sequence[float]],
                  ordered: bool = False):
    """ZStream: min-cost bushy tree over CONTIGUOUS sub-orders of a fixed
    leaf order — O(n³) DP over order slices instead of the exponential
    all-subsets DP (reference plan/BushyTreeBuilders.py:68-123).
    ``ordered=True`` = ZStreamOrd: the leaf order comes from the greedy
    builder first (reference :118-123)."""
    order = order_greedy(n, rates, sel) if ordered else list(range(n))
    if n == 1:
        return 0

    def card(items) -> float:
        c = 1.0
        for i in items:
            c *= rates[i] * sel[i][i]
        for x in range(len(items)):
            for y in range(x + 1, len(items)):
                i, j = items[x], items[y]
                c *= sel[i][j] * sel[j][i]
        return c

    # suborder -> (shape, cost); cost = Σ cardinalities of internal nodes
    best: Dict[tuple, tuple] = {(i,): (i, 0.0) for i in order}
    for size in range(2, n + 1):
        for j in range(n - size + 1):
            sub = tuple(order[j:j + size])
            sub_card = card(sub)
            choice = None
            for k in range(1, size):
                left, right = sub[:k], sub[k:]
                lshape, lcost = best[left]
                rshape, rcost = best[right]
                total = lcost + rcost + sub_card
                if choice is None or total < choice[1]:
                    choice = ((lshape, rshape), total)
            best[sub] = choice
    return best[tuple(order)][0]


def choose_shape(n_args: int, statistics: Optional[dict],
                 builder: str = BUSHY):
    """Bushy/ZStream shape from statistics; falls back to a left-deep
    chain in declaration order when statistics are unavailable."""
    if not statistics:
        shape = 0
        for i in range(1, n_args):
            shape = (shape, i)
        return shape
    rates = statistics.get("arrival_rates")
    sel = statistics.get("selectivity_matrix")
    if rates is None or len(rates) < n_args:
        return choose_shape(n_args, None)
    if sel is None:
        sel = [[1.0] * n_args for _ in range(n_args)]
    if builder == ZSTREAM:
        return zstream_shape(n_args, rates, sel, ordered=False)
    if builder == ZSTREAM_ORD:
        return zstream_shape(n_args, rates, sel, ordered=True)
    return bushy_shape(n_args, rates, sel)


def choose_order(n_args: int, statistics: Optional[dict],
                 builder: str = TRIVIAL) -> List[int]:
    """Returns the evaluation order of the top-level positive args."""
    if builder == TRIVIAL or not statistics:
        return list(range(n_args))
    rates = statistics.get("arrival_rates")
    sel = statistics.get("selectivity_matrix")
    if rates is None or len(rates) < n_args:
        return list(range(n_args))
    if sel is None:
        sel = [[1.0] * n_args for _ in range(n_args)]
    return _BUILDERS[builder](n_args, rates, sel)


def estimate_statistics_from_counts(type_counts: Dict[str, int],
                                    arg_types: Sequence[str],
                                    total_window_fraction: float = 1.0
                                    ) -> dict:
    """Builds a statistics dict from observed per-type event counts — the
    engine-side analog of the reference's ArrivalRatesStatistics
    (adaptive/statistics/Statistics.py:43-100)."""
    rates = [type_counts.get(t, 0) * total_window_fraction
             for t in arg_types]
    return {"arrival_rates": rates}
