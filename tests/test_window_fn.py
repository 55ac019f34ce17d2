"""Window-function (ordered analytics) tests: the two-pass prefix scan
must reproduce SQL window semantics exactly, including keys that span
several block boundaries."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _fold_carries(infos):
    # mirrors the driver fold in partitioned_cumsum
    carries = []
    carry_key, carry_val = None, 0
    for fk, lk, first_total, last_total in infos:
        c = carry_val if (carry_key is not None and fk == carry_key) else 0
        carries.append((fk, c))
        if fk == lk:
            carry_key, carry_val = lk, c + last_total
        else:
            carry_key, carry_val = lk, last_total
    return carries


def test_cumsum_kernels_key_spanning_three_blocks():
    from opencep_ray.stages.window_fn import (_apply_cumsum,
                                              _boundary_summary)
    # key "b" spans blocks 0-2 entirely filling block 1
    blocks = [pa.table({"k": ["a", "b"], "v": [5, 1]}),
              pa.table({"k": ["b", "b"], "v": [2, 3]}),
              pa.table({"k": ["b", "c"], "v": [4, 7]})]
    infos = [_boundary_summary(b, "k", "v") for b in blocks]
    carries = _fold_carries(infos)
    assert carries == [("a", 0), ("b", 1), ("b", 6)]
    out = pa.concat_tables(
        [_apply_cumsum(b, "k", "v", "cs", bk, cv, False)
         for b, (bk, cv) in zip(blocks, carries)])
    assert out["cs"].to_pylist() == [5, 1, 3, 6, 10, 7]
    out_ex = pa.concat_tables(
        [_apply_cumsum(b, "k", "v", "cs", bk, cv, True)
         for b, (bk, cv) in zip(blocks, carries)])
    assert out_ex["cs"].to_pylist() == [0, 0, 1, 3, 6, 0]


def test_lag_kernels_across_blocks():
    from opencep_ray.stages.window_fn import (_apply_lag,
                                              _boundary_last_row)
    blocks = [pa.table({"k": ["a", "b"], "v": [10, 20]}),
              pa.table({"k": ["b", "c"], "v": [30, 40]}),
              pa.table({"k": ["d"], "v": [50]})]
    infos = [_boundary_last_row(b, "k", "v") for b in blocks]
    prevs = [(None, None)] + [(lk, lv) for _, lk, lv in infos[:-1]]
    out = pa.concat_tables(
        [_apply_lag(b, "k", "v", "lag", pk, pv)
         for b, (pk, pv) in zip(blocks, prevs)])
    assert out["lag"].to_pylist() == [None, None, 20, None, None]


@pytest.mark.parametrize("exclusive", [False, True])
def test_partitioned_cumsum_matches_pandas(ray_session, exclusive):
    import ray.data as rd
    from opencep_ray.stages.window_fn import partitioned_cumsum

    rng = np.random.default_rng(3)
    n = 2000
    df = pd.DataFrame({
        "k": rng.integers(0, 7, n).astype(str),
        "o": rng.permutation(n),
        "v": rng.integers(0, 100, n),
    })
    ds = rd.from_pandas(df).repartition(8)
    got = partitioned_cumsum(ds, key="k", order=["o"], val="v",
                             out_col="cs", exclusive=exclusive) \
        .to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    want = df.sort_values(["k", "o"]).reset_index(drop=True)
    cs = want.groupby("k")["v"].cumsum()
    if exclusive:
        cs = cs - want["v"]
    assert (got["cs"].values == cs.values).all()


def test_partitioned_lag_matches_pandas(ray_session):
    import ray.data as rd
    from opencep_ray.stages.window_fn import partitioned_lag

    rng = np.random.default_rng(4)
    n = 1500
    df = pd.DataFrame({
        "k": rng.integers(0, 5, n).astype(str),
        "o": rng.permutation(n),
        "v": rng.integers(0, 1000, n),
    })
    ds = rd.from_pandas(df).repartition(6)
    got = partitioned_lag(ds, key="k", order=["o"], val="v",
                          out_col="lag") \
        .to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    want = df.sort_values(["k", "o"]).reset_index(drop=True)
    lag = want.groupby("k")["v"].shift(1)
    gm = got["lag"].astype("float64")
    assert ((gm.isna() == lag.isna()).all()
            and (gm.dropna().values == lag.dropna().values).all())


def test_partitioned_row_number_matches_pandas(ray_session):
    import ray.data as rd
    from opencep_ray.stages.window_fn import partitioned_row_number

    rng = np.random.default_rng(9)
    n = 800
    df = pd.DataFrame({"k": rng.integers(0, 6, n).astype(str),
                       "o": rng.permutation(n)})
    ds = rd.from_pandas(df).repartition(5)
    got = partitioned_row_number(ds, key="k", order=["o"], out_col="rn") \
        .to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    want = df.sort_values(["k", "o"]).reset_index(drop=True)
    rn = want.groupby("k").cumcount() + 1
    assert (got["rn"].values == rn.values).all()
    assert "__one" not in got.columns


def test_grouped_topk_matches_pandas(ray_session):
    import ray.data as rd
    from opencep_ray.stages.window_fn import grouped_topk

    rng = np.random.default_rng(11)
    n = 1000
    df = pd.DataFrame({"k": rng.integers(0, 8, n).astype(str),
                       "id": np.arange(n),
                       "v": rng.integers(0, 50, n)})  # many ties
    ds = rd.from_pandas(df).repartition(7)
    got = grouped_topk(ds, key="k", val="v", k=3, tiebreak=("id",)) \
        .to_pandas().sort_values(["k", "id"]).reset_index(drop=True)
    want = (df.sort_values(["v", "id"], ascending=[False, True])
            .groupby("k").head(3)
            .sort_values(["k", "id"]).reset_index(drop=True))
    assert got[["k", "id", "v"]].equals(want[["k", "id", "v"]])


def test_pack_shards_and_event_gaps_oracle(ray_session, tmp_path):
    """End-to-end oracle parity for the two window-function queries at
    sf0.001 (the full driver comparison runs at sf0.01)."""
    import duckdb

    from opencep_ray.pipelines.queries import (EVENT_GAPS_SQL,
                                               PACK_SHARDS_SQL,
                                               event_gaps, pack_shards)
    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("documents", "events"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    for fn, sql in ((pack_shards, PACK_SHARDS_SQL),
                    (event_gaps, EVENT_GAPS_SQL)):
        got = fn(sf).to_pandas()
        want = con.execute(sql).fetchdf()
        cols = sorted(got.columns)
        assert cols == sorted(want.columns)
        a = got[cols].sort_values(cols).reset_index(drop=True)
        b = want[cols].sort_values(cols).reset_index(drop=True)
        assert a.astype(str).equals(b.astype(str)), fn.__name__


def test_greedy_bounds_kernel():
    from opencep_ray.stages.pack import _greedy_bounds

    # budget 10: [4,5] fit (9), 3 overflows -> new shard; 12 oversized
    sizes = np.array([4, 5, 3, 12, 2])
    got = _greedy_bounds(np.cumsum(sizes), 10)
    assert got.tolist() == [0, 0, 1, 2, 3]
    # exact fit stays in shard
    got = _greedy_bounds(np.cumsum([5, 5, 1]), 10)
    assert got.tolist() == [0, 0, 1]
    # leading oversized document
    got = _greedy_bounds(np.cumsum([30, 1, 1]), 10)
    assert got.tolist() == [0, 1, 1]


def test_greedy_pack_matches_sequential(ray_session):
    import ray.data as rd
    from opencep_ray.stages.pack import greedy_pack

    rng = np.random.default_rng(5)
    n = 600
    df = pd.DataFrame({"k": rng.integers(0, 4, n).astype(str),
                       "o": rng.permutation(n),
                       "sz": rng.integers(1, 40, n)})
    got = greedy_pack(rd.from_pandas(df).repartition(5), key="k",
                      order="o", size="sz", budget=100) \
        .to_pandas().sort_values(["k", "o"]).reset_index(drop=True)

    def seq_pack(g):
        fill, sid, out = 0, 0, []
        for s in g.sort_values("o")["sz"]:
            if fill and fill + s > 100:
                sid += 1
                fill = 0
            fill += s
            out.append(sid)
        g = g.sort_values("o").copy()
        g["shard_id"] = out
        return g

    want = pd.concat([seq_pack(g) for _, g in df.groupby("k")]) \
        .sort_values(["k", "o"]).reset_index(drop=True)
    assert (got["shard_id"].values == want["shard_id"].values).all()


def test_rolling_kernels_key_spanning_blocks():
    from opencep_ray.stages.window_fn import (_apply_rolling,
                                              _boundary_tail)
    # key "b" spans all three blocks; window 3
    blocks = [pa.table({"k": ["a", "b"], "v": [5, 1]}),
              pa.table({"k": ["b", "b"], "v": [2, 3]}),
              pa.table({"k": ["b", "c"], "v": [4, 7]})]
    infos = [_boundary_tail(b, "k", "v", 2) for b in blocks]
    # mirror the driver fold in partitioned_rolling_sum
    carries, carry_key, carry_tail = [], None, None
    for fk, lk, tail in infos:
        if carry_key is not None and fk == carry_key:
            carries.append((fk, carry_tail))
            if fk == lk:
                joined = np.concatenate([carry_tail, tail])
                carry_key, carry_tail = lk, joined[-2:]
                continue
        else:
            carries.append((None, tail[:0]))
        carry_key, carry_tail = lk, tail
    out = pa.concat_tables(
        [_apply_rolling(b, "k", "v", "r", 3, bk, cv)
         for b, (bk, cv) in zip(blocks, carries)])
    # b-run values: 1,2,3,4 -> rolling3: 1,3,6,9
    assert out["r"].to_pylist() == [5, 1, 3, 6, 9, 7]


def test_partitioned_rolling_sum_matches_pandas(ray_session):
    import ray.data as rd
    from opencep_ray.stages.window_fn import partitioned_rolling_sum

    rng = np.random.default_rng(17)
    n = 1500
    df = pd.DataFrame({"k": rng.integers(0, 5, n).astype(str),
                       "o": rng.permutation(n),
                       "v": rng.integers(0, 100, n)})
    ds = rd.from_pandas(df).repartition(6)
    got = partitioned_rolling_sum(ds, key="k", order=["o"], val="v",
                                  window=4, out_col="r") \
        .to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    want = df.sort_values(["k", "o"]).reset_index(drop=True)
    r = want.groupby("k")["v"].rolling(4, min_periods=1).sum() \
        .reset_index(level=0, drop=True).sort_index()
    assert (got["r"].values == r.values.astype(np.int64)).all()


def test_ordered_collect_matches_pandas(ray_session):
    import ray.data as rd
    from opencep_ray.stages.window_fn import ordered_collect

    rng = np.random.default_rng(23)
    n = 900
    df = pd.DataFrame({"k": rng.integers(0, 6, n).astype(str),
                       "o": rng.permutation(n),
                       "w": rng.choice(list("abcde"), n)})
    got = ordered_collect(rd.from_pandas(df).repartition(5), key="k",
                          order=["o"], col="w", sep="|",
                          out_col="seq") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    want = (df.sort_values(["k", "o"]).groupby("k")["w"]
            .agg(lambda s: "|".join(s)).reset_index()
            .rename(columns={"w": "seq"}))
    assert (got["k"].values == want["k"].values).all()
    assert (got["seq"].values == want["seq"].values).all()


def test_collect_fragment_kernel_key_spanning_blocks():
    from opencep_ray.stages.window_fn import _collect_fragments
    blocks = [pa.table({"k": ["a", "b"], "w": ["x", "y"]}),
              pa.table({"k": ["b", "b"], "w": ["z", "q"]}),
              pa.table({"k": ["c"], "w": ["r"]})]
    frags = pa.concat_tables(
        [_collect_fragments(b, i, "k", "w", "-")
         for i, b in enumerate(blocks)])
    got = {}
    for k, blk, f in zip(frags["k"].to_pylist(),
                         frags["_blk"].to_pylist(),
                         frags["_frag"].to_pylist()):
        got.setdefault(k, []).append((blk, f))
    # merging fragments in block order must rebuild the full sequences
    merged = {k: "-".join(f for _, f in sorted(v)) for k, v in got.items()}
    assert merged == {"a": "x", "b": "y-z-q", "c": "r"}


def test_dense_rank_kernels_value_run_across_blocks():
    from opencep_ray.stages.window_fn import _apply_dense, _dense_summary
    # key "b": values 1,1 | 1,2 | 2,3 across blocks; dense ranks 1,1,1,2,2,3
    blocks = [pa.table({"k": ["a", "b", "b"], "v": [9, 1, 1]}),
              pa.table({"k": ["b", "b"], "v": [1, 2]}),
              pa.table({"k": ["b", "b", "c"], "v": [2, 3, 5]})]
    infos = [_dense_summary(b, "k", "v") for b in blocks]
    carries, carry_key, carry_val, carry_rank = [], None, None, 0
    for fk, fv, lk, lv, d_first, d_last in infos:
        cont = carry_key is not None and fk == carry_key
        carries.append((fk, carry_val, carry_rank) if cont
                       else (None, None, 0))
        if cont and fk == lk:
            carry_rank = carry_rank + d_last - (1 if fv == carry_val else 0)
        else:
            carry_rank = d_last
        carry_key, carry_val = lk, lv
    out = pa.concat_tables(
        [_apply_dense(b, "k", "v", "dr", bk, cv, cr)
         for b, (bk, cv, cr) in zip(blocks, carries)])
    assert out["dr"].to_pylist() == [1, 1, 1, 1, 2, 2, 3, 1]


def test_partitioned_dense_rank_matches_pandas(ray_session):
    import ray.data as rd
    from opencep_ray.stages.window_fn import partitioned_dense_rank

    rng = np.random.default_rng(29)
    n = 1200
    df = pd.DataFrame({"k": rng.integers(0, 5, n).astype(str),
                       "v": rng.integers(0, 25, n)})  # heavy value ties
    got = partitioned_dense_rank(rd.from_pandas(df).repartition(6),
                                 key="k", val="v", out_col="dr") \
        .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    want = df.sort_values(["k", "v"]).reset_index(drop=True)
    dr = want.groupby("k")["v"].rank(method="dense").astype(np.int64)
    assert (got["dr"].values == dr.values).all()
