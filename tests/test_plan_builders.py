"""Pure plan-time unit tests for the order/shape builders
(reference plan/LeftDeepTreeBuilders.py, plan/BushyTreeBuilders.py,
plan/IterativeImprovement.py).  No Ray needed."""

from opencep_ray.plan import (bushy_shape, choose_order, choose_shape,
                              intermediate_results_cost, order_greedy,
                              order_iterative_improvement, zstream_shape)

RATES = [100.0, 5.0, 200.0, 50.0]
SEL = [[1.0, 0.1, 1.0, 1.0],
       [0.1, 1.0, 0.5, 1.0],
       [1.0, 0.5, 1.0, 0.2],
       [1.0, 1.0, 0.2, 1.0]]


def _shape_leaves(shape):
    if isinstance(shape, int):
        return {shape}
    out = set()
    for s in shape:
        out |= _shape_leaves(s)
    return out


def test_iterative_improvement_never_worse_than_greedy():
    greedy = order_greedy(4, RATES, SEL)
    ii = order_iterative_improvement(4, RATES, SEL, init="greedy")
    assert sorted(ii) == [0, 1, 2, 3]
    assert intermediate_results_cost(ii, RATES, SEL) <= \
        intermediate_results_cost(greedy, RATES, SEL)


def test_iterative_improvement_deterministic_and_random_init():
    a = order_iterative_improvement(4, RATES, SEL, init="random", seed=5)
    b = order_iterative_improvement(4, RATES, SEL, init="random", seed=5)
    assert a == b
    circle = order_iterative_improvement(4, RATES, SEL, ii_type="circle")
    assert sorted(circle) == [0, 1, 2, 3]


def test_zstream_shapes_cover_all_leaves():
    for ordered in (False, True):
        shape = zstream_shape(4, RATES, SEL, ordered=ordered)
        assert _shape_leaves(shape) == {0, 1, 2, 3}


def test_zstream_contiguity_of_plain_order():
    """Plain ZStream only combines CONTIGUOUS slices of declaration
    order: every subtree's leaf set is an interval of 0..n-1."""
    def assert_contiguous(shape):
        leaves = sorted(_shape_leaves(shape))
        assert leaves == list(range(leaves[0], leaves[-1] + 1))
        if not isinstance(shape, int):
            for s in shape:
                assert_contiguous(s)

    assert_contiguous(zstream_shape(5, RATES + [10.0],
                                    [row + [1.0] for row in SEL]
                                    + [[1.0] * 5]))


def test_zstream_cost_at_most_leftdeep_chain_cost():
    """The ZStream DP must find a shape at least as good as the trivial
    left-deep chain over the same order (the chain is in its search
    space)."""
    def shape_cost(shape, rates, sel):
        if isinstance(shape, int):
            return 0.0, [shape]

        def card(items):
            c = 1.0
            for i in items:
                c *= rates[i] * sel[i][i]
            for x in range(len(items)):
                for y in range(x + 1, len(items)):
                    i, j = items[x], items[y]
                    c *= sel[i][j] * sel[j][i]
            return c

        lcost, lleaves = shape_cost(shape[0], rates, sel)
        rcost, rleaves = shape_cost(shape[1], rates, sel)
        leaves = lleaves + rleaves
        return lcost + rcost + card(leaves), leaves

    chain = 0
    for i in range(1, 4):
        chain = (chain, i)
    z = zstream_shape(4, RATES, SEL)
    assert shape_cost(z, RATES, SEL)[0] <= \
        shape_cost(chain, RATES, SEL)[0]


def test_choose_shape_builder_dispatch():
    assert _shape_leaves(choose_shape(
        3, {"arrival_rates": [1.0, 2.0, 3.0]}, builder="zstream")) \
        == {0, 1, 2}
    assert _shape_leaves(choose_shape(
        3, {"arrival_rates": [1.0, 2.0, 3.0]}, builder="zstream_ord")) \
        == {0, 1, 2}
    assert _shape_leaves(choose_shape(3, None)) == {0, 1, 2}


def test_choose_order_new_builders():
    order = choose_order(4, {"arrival_rates": RATES,
                             "selectivity_matrix": SEL},
                         builder="iterative_improvement")
    assert sorted(order) == [0, 1, 2, 3]
    assert bushy_shape(1, [1.0], [[1.0]]) == 0


def test_greedy_invariants_hold_for_generating_stats():
    from opencep_ray.plan import (greedy_invariants_violated,
                                  order_greedy, order_greedy_with_invariants)
    order, inv = order_greedy_with_invariants(4, RATES, SEL)
    assert order == order_greedy(4, RATES, SEL)
    assert len(inv) == 3
    # the statistics that produced the plan can never violate it
    assert not greedy_invariants_violated(inv, RATES, SEL)


def test_greedy_invariants_violated_on_rate_flip():
    from opencep_ray.plan import (greedy_invariants_violated,
                                  order_greedy_with_invariants)
    order, inv = order_greedy_with_invariants(4, RATES, SEL)
    # make the first-chosen arg massively more frequent than its
    # runner-up: the first invariant must break
    flipped = list(RATES)
    flipped[order[0]] = 1e9
    assert greedy_invariants_violated(inv, flipped, SEL)
