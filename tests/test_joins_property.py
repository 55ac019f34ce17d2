"""Property fuzz of the pure join kernels (no Ray): _AsofMerge and
_RangeBucket + _RangeMerge over random single-key groups with dense
timestamp ties, vs brute-force enumeration.  The Ray plumbing around
these kernels is covered by tests/test_joins.py; the subtle logic
(bisect boundaries, tie-break, tolerance, bucket ownership, inclusive
endpoints) all lives here."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st


def _group_table(l_ts, r_ts, l_ids, r_ids):
    """A merged group table exactly as the union + groupby would feed
    the kernel: left rows (_side=1) then right rows (_side=0),
    interleaved order irrelevant to the kernel."""
    n_l, n_r = len(l_ts), len(r_ts)
    return pa.table({
        "_k0": pa.array([1] * (n_l + n_r), pa.int64()),
        "_ts": pa.array(list(l_ts) + list(r_ts), pa.int64()),
        "_side": pa.array([1] * n_l + [0] * n_r, pa.int8()),
        "l_id": pa.array(list(l_ids) + [None] * n_r, pa.int64()),
        "r_id": pa.array([None] * n_l + list(r_ids), pa.int64()),
    })


ts_lists = st.lists(st.integers(0, 40), min_size=0, max_size=25)


@settings(max_examples=200, deadline=None)
@given(l_ts=ts_lists, r_ts=ts_lists,
       tol=st.one_of(st.none(), st.integers(0, 15)),
       how=st.sampled_from(["inner", "left"]))
def test_asof_merge_kernel(l_ts, r_ts, tol, how):
    from opencep_ray.stages.joins import _AsofMerge
    l_ids = list(range(len(l_ts)))
    r_ids = list(range(100, 100 + len(r_ts)))
    out = _AsofMerge(["k"], ["l_id"], ["r_id"], tol, how)(
        _group_table(l_ts, r_ts, l_ids, r_ids))
    got = {}
    for row in out.to_pylist():
        assert row["l_id"] not in got, "left row emitted twice"
        got[row["l_id"]] = row["r_id"]
    for li, lt in zip(l_ids, l_ts):
        cand = [(rt, ri) for rt, ri in zip(r_ts, r_ids)
                if rt <= lt and (tol is None or lt - rt <= tol)]
        if cand:
            want = max(cand)[1]     # greatest ts, then greatest rid
            assert got.get(li) == want, (li, lt, cand)
        elif how == "left":
            assert li in got and got[li] is None
        else:
            assert li not in got


@settings(max_examples=150, deadline=None)
@given(l_ts=ts_lists, r_ts=ts_lists,
       lo=st.integers(-20, 5), width=st.integers(0, 25))
def test_range_bucket_plus_merge_exactly_once(l_ts, r_ts, lo, width):
    """Replicate rows through _RangeBucket, group by bucket, run
    _RangeMerge per group, union: every qualifying pair appears exactly
    once, none extra."""
    from opencep_ray.stages.joins import _RangeBucket, _RangeMerge
    hi = lo + width
    w = max(hi - lo, 1)
    l_ids = list(range(len(l_ts)))
    r_ids = list(range(100, 100 + len(r_ts)))
    lt = pa.table({
        "_k0": pa.array([1] * len(l_ts), pa.int64()),
        "_ts": pa.array(l_ts, pa.int64()),
        "_side": pa.array([1] * len(l_ts), pa.int8()),
        "l_id": pa.array(l_ids, pa.int64()),
        "r_id": pa.array([None] * len(l_ts), pa.int64())})
    rt = pa.table({
        "_k0": pa.array([1] * len(r_ts), pa.int64()),
        "_ts": pa.array(r_ts, pa.int64()),
        "_side": pa.array([0] * len(r_ts), pa.int8()),
        "l_id": pa.array([None] * len(r_ts), pa.int64()),
        "r_id": pa.array(r_ids, pa.int64())})
    lb = _RangeBucket(1, lo, hi, w)(lt)
    rb = _RangeBucket(0, lo, hi, w)(rt)
    both = pa.concat_tables([lb, rb]).to_pandas()
    merge = _RangeMerge(["k"], ["l_id"], ["r_id"], lo, hi)
    pairs = []
    for _, g in both.groupby("_bkt"):
        out = merge(pa.Table.from_pandas(g, preserve_index=False))
        pairs.extend((row["l_id"], row["r_id"])
                     for row in out.to_pylist())
    brute = [(li, ri) for li, lt_ in zip(l_ids, l_ts)
             for ri, rt_ in zip(r_ids, r_ts)
             if lt_ + lo <= rt_ <= lt_ + hi]
    assert sorted(pairs) == sorted(brute), (lo, hi, l_ts, r_ts)
