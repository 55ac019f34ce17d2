"""asof_join / range_join vs brute-force numpy oracles, including tie
timestamps, tolerance, left-join nulls, empty sides, and range-bucket
boundary pairs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _mk(n, n_keys, seed, span=10_000_000):
    rng = np.random.RandomState(seed)
    return pa.table({
        "k": pa.array(rng.randint(0, n_keys, n), pa.int64()),
        "ts": pa.array(rng.randint(0, span, n), pa.int64()),
        "rid": pa.array(np.arange(n), pa.int64()),
        "v": pa.array(rng.rand(n)),
    })


def _brute_asof(lt, rt, tolerance_us=None):
    l = lt.to_pandas()
    r = rt.to_pandas()
    rows = []
    for lrow in l.itertuples(index=False):
        cand = r[(r.k == lrow.k) & (r.ts <= lrow.ts)]
        if tolerance_us is not None:
            cand = cand[lrow.ts - cand.ts <= tolerance_us]
        if len(cand):
            # greatest ts, then greatest first right col (rid)
            best = cand.sort_values(["ts", "rid"]).iloc[-1]
            rows.append((lrow.k, lrow.ts, lrow.rid,
                         int(best.rid), best.v))
    return sorted(rows)


def _brute_range(lt, rt, lo, hi):
    l = lt.to_pandas()
    r = rt.to_pandas()
    out = []
    for lrow in l.itertuples(index=False):
        cand = r[(r.k == lrow.k) & (r.ts >= lrow.ts + lo)
                 & (r.ts <= lrow.ts + hi)]
        out.extend((lrow.k, lrow.ts, lrow.rid, int(x))
                   for x in cand.rid)
    return sorted(out)


def _ray_asof(lt, rt, **kw):
    import ray.data as rd
    from opencep_ray.stages.joins import asof_join
    out = asof_join(rd.from_arrow(lt), rd.from_arrow(rt), "k", "ts",
                    ["rid"], ["rid", "v"], **kw).to_pandas()
    return out


def test_asof_matches_brute_force(ray_session):
    lt = _mk(300, 12, seed=1)
    rt = _mk(250, 12, seed=2)
    out = _ray_asof(lt, rt)
    got = sorted((int(r.k), int(r.ts), int(r.l_rid), int(r.r_rid),
                  float(r.r_v)) for r in out.itertuples(index=False))
    assert got == [(a, b, c, d, pytest.approx(e))
                   for a, b, c, d, e in _brute_asof(lt, rt)]


def test_asof_tie_timestamps_deterministic(ray_session):
    # three right rows at the SAME ts: greatest rid must win
    lt = pa.table({"k": pa.array([5], pa.int64()),
                   "ts": pa.array([100], pa.int64()),
                   "rid": pa.array([0], pa.int64()),
                   "v": pa.array([0.0])})
    rt = pa.table({"k": pa.array([5, 5, 5], pa.int64()),
                   "ts": pa.array([100, 100, 100], pa.int64()),
                   "rid": pa.array([7, 3, 9], pa.int64()),
                   "v": pa.array([0.1, 0.2, 0.3])})
    out = _ray_asof(lt, rt)
    assert len(out) == 1 and int(out.r_rid.iloc[0]) == 9


def test_asof_tolerance_and_left_join(ray_session):
    lt = pa.table({"k": pa.array([1, 1], pa.int64()),
                   "ts": pa.array([1000, 5000], pa.int64()),
                   "rid": pa.array([0, 1], pa.int64()),
                   "v": pa.array([0.0, 0.0])})
    rt = pa.table({"k": pa.array([1], pa.int64()),
                   "ts": pa.array([900], pa.int64()),
                   "rid": pa.array([42], pa.int64()),
                   "v": pa.array([1.5])})
    inner = _ray_asof(lt, rt, tolerance_us=200)
    assert len(inner) == 1 and int(inner.l_rid.iloc[0]) == 0
    left = _ray_asof(lt, rt, tolerance_us=200, how="left")
    left = left.sort_values("l_rid")
    assert len(left) == 2
    assert int(left.r_rid.iloc[0]) == 42
    assert pd.isna(left.r_rid.iloc[1]) and pd.isna(left.r_v.iloc[1])
    # left join with NO right rows for the key: all-null right side
    lonely = _ray_asof(lt, rt.filter(pa.array([False])), how="left")
    assert len(lonely) == 2 and lonely.r_rid.isna().all()


def test_range_join_matches_brute_force(ray_session):
    lt = _mk(200, 8, seed=3)
    rt = _mk(200, 8, seed=4)
    import ray.data as rd
    from opencep_ray.stages.joins import range_join
    lo, hi = -60_000, 25_000
    out = range_join(rd.from_arrow(lt), rd.from_arrow(rt), "k", "ts",
                     ["rid"], ["rid"], lo_us=lo, hi_us=hi).to_pandas()
    got = sorted((int(r.k), int(r.ts), int(r.l_rid), int(r.r_rid))
                 for r in out.itertuples(index=False))
    assert got == _brute_range(lt, rt, lo, hi)


def test_range_join_bucket_boundaries_exact_once(ray_session):
    """Pairs straddling bucket boundaries appear exactly once, and the
    inclusive endpoints are honoured."""
    import ray.data as rd
    from opencep_ray.stages.joins import range_join
    lo, hi = 0, 100          # bucket width 100
    lt = pa.table({"k": pa.array([1, 1], pa.int64()),
                   "ts": pa.array([50, 99], pa.int64()),
                   "rid": pa.array([0, 1], pa.int64()),
                   "v": pa.array([0.0, 0.0])})
    # rights at 50 (same bucket), 100 (next bucket, == l0.ts+lo+? in
    # range for both), 151 (in range only for l1), 200 (boundary: in
    # range for l1 only via hi inclusive: 99+100=199 -> NOT in range)
    rt = pa.table({"k": pa.array([1, 1, 1, 1], pa.int64()),
                   "ts": pa.array([50, 100, 151, 200], pa.int64()),
                   "rid": pa.array([10, 11, 12, 13], pa.int64()),
                   "v": pa.array([0.0] * 4)})
    out = range_join(rd.from_arrow(lt), rd.from_arrow(rt), "k", "ts",
                     ["rid"], ["rid"], lo_us=lo, hi_us=hi).to_pandas()
    got = sorted((int(r.l_rid), int(r.r_rid))
                 for r in out.itertuples(index=False))
    # l0 ts=50 covers [50,150] -> rights 50,100; l1 ts=99 covers
    # [99,199] -> rights 100,151; right 200 matches nothing
    assert got == _c([(0, 10), (0, 11), (1, 11), (1, 12)],
                     lt, rt, lo, hi)


def test_composite_key_joins(ray_session):
    """Composite (tenant, user) keys: rows only pair within the SAME
    key tuple, and both key columns surface under their original
    names."""
    import ray.data as rd
    from opencep_ray.stages.joins import asof_join, range_join
    lt = pa.table({"tenant": pa.array([1, 1, 2], pa.int64()),
                   "user": pa.array([10, 11, 10], pa.int64()),
                   "ts": pa.array([100, 100, 100], pa.int64()),
                   "rid": pa.array([0, 1, 2], pa.int64())})
    rt = pa.table({"tenant": pa.array([1, 2], pa.int64()),
                   "user": pa.array([10, 10], pa.int64()),
                   "ts": pa.array([50, 60], pa.int64()),
                   "rid": pa.array([100, 200], pa.int64())})
    out = asof_join(rd.from_arrow(lt), rd.from_arrow(rt),
                    ["tenant", "user"], "ts", ["rid"], ["rid"]) \
        .to_pandas().sort_values("l_rid")
    # (1,10)->100, (1,11) unmatched, (2,10)->200
    assert out[["tenant", "user", "l_rid", "r_rid"]].values.tolist() == \
        [[1, 10, 0, 100], [2, 10, 2, 200]]
    rj = range_join(rd.from_arrow(lt), rd.from_arrow(rt),
                    ["tenant", "user"], "ts", ["rid"], ["rid"],
                    lo_us=-100, hi_us=0).to_pandas().sort_values("l_rid")
    assert rj[["tenant", "user", "l_rid", "r_rid"]].values.tolist() == \
        [[1, 10, 0, 100], [2, 10, 2, 200]]


def test_broadcast_asof_equals_shuffled(ray_session):
    """The no-shuffle broadcast variant returns exactly what the
    shuffled asof_join returns — inner/left, tolerance, keys missing
    from the right side — on random data."""
    import ray.data as rd
    from opencep_ray.stages.joins import asof_join, asof_join_broadcast
    lt = _mk(300, 12, seed=5)
    rt = _mk(80, 8, seed=6)     # keys 8-11 absent from the right side

    def canon(df):
        df = df.fillna(-1)
        return sorted(map(tuple, df[sorted(df.columns)]
                          .astype(float).values.tolist()))

    for kw in ({}, {"how": "left"}, {"tolerance_us": 50_000},
               {"how": "left", "tolerance_us": 50_000}):
        a = asof_join(rd.from_arrow(lt), rd.from_arrow(rt), "k", "ts",
                      ["rid"], ["rid", "v"], **kw).to_pandas()
        b = asof_join_broadcast(rd.from_arrow(lt), rt, "k", "ts",
                                ["rid"], ["rid", "v"], **kw).to_pandas()
        assert canon(a) == canon(b), kw


def test_broadcast_asof_composite_key(ray_session):
    import ray.data as rd
    from opencep_ray.stages.joins import asof_join_broadcast
    lt = pa.table({"tenant": pa.array([1, 2], pa.int64()),
                   "user": pa.array([10, 10], pa.int64()),
                   "ts": pa.array([100, 100], pa.int64()),
                   "rid": pa.array([0, 1], pa.int64())})
    rt = pa.table({"tenant": pa.array([1, 2], pa.int64()),
                   "user": pa.array([10, 10], pa.int64()),
                   "ts": pa.array([50, 60], pa.int64()),
                   "rid": pa.array([100, 200], pa.int64())})
    out = asof_join_broadcast(rd.from_arrow(lt), rt, ["tenant", "user"],
                              "ts", ["rid"], ["rid"]) \
        .to_pandas().sort_values("l_rid")
    assert out[["tenant", "user", "l_rid", "r_rid"]].values.tolist() == \
        [[1, 10, 0, 100], [2, 10, 1, 200]]


def _c(expect, lt, rt, lo, hi):
    brute = [(l, r) for _, _, l, r in _brute_range(lt, rt, lo, hi)]
    assert sorted(expect) == sorted(brute), "test vector wrong"
    return sorted(brute)
