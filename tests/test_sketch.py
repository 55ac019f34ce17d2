"""exact_quantiles / heavy_hitters vs brute-force numpy and DuckDB
quantile_disc semantics, including tie-heavy distributions."""

import duckdb
import numpy as np
import pyarrow as pa


def _ds(values):
    import ray.data as rd
    return rd.from_arrow(pa.table({"x": pa.array(values)})).repartition(5)


def test_quantiles_match_duckdb_semantics(ray_session):
    from opencep_ray.stages.sketch import exact_quantiles
    rng = np.random.RandomState(2)
    vals = rng.randint(1, 51, 5000).astype("float64")
    qs = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]
    got = exact_quantiles(_ds(vals), "x", qs)
    want = duckdb.connect().execute(
        "SELECT unnest(quantile_disc(x, ?)) FROM t",
        [qs]).fetchall() if False else None
    con = duckdb.connect()
    con.register("t", pa.table({"x": pa.array(vals)}))
    want = con.execute(
        f"SELECT quantile_disc(x, {qs}) FROM t").fetchone()[0]
    assert got["value"].to_pylist() == want
    assert got["q"].to_pylist() == qs


def test_quantiles_skewed_ties(ray_session):
    from opencep_ray.stages.sketch import exact_quantiles
    # 90% of mass on one value
    vals = np.array([7.0] * 900 + list(range(100)), dtype="float64")
    got = exact_quantiles(_ds(vals), "x", [0.5, 0.95])
    con = duckdb.connect()
    con.register("t", pa.table({"x": pa.array(vals)}))
    want = con.execute(
        "SELECT quantile_disc(x, [0.5, 0.95]) FROM t").fetchone()[0]
    assert got["value"].to_pylist() == want


def test_heavy_hitters_deterministic_ties(ray_session):
    from opencep_ray.stages.sketch import heavy_hitters
    vals = [1] * 5 + [2] * 5 + [3] * 5 + [4] * 2
    out = heavy_hitters(_ds(np.array(vals, dtype="int64")), "x",
                        k=3).to_pandas()
    # counts tie at 5: value ascending breaks the tie
    assert out.x.tolist() == [1, 2, 3]
    assert out.n.tolist() == [5, 5, 5]


def test_grouped_quantile_matches_per_key_disc(ray_session):
    import numpy as np
    import ray.data as rd
    import pyarrow as pa
    from opencep_ray.stages.sketch import grouped_quantile

    rng = np.random.default_rng(13)
    n = 1200
    t = pa.table({"k": rng.integers(0, 4, n).astype(str),
                  "v": rng.integers(0, 30, n)})
    got = grouped_quantile(rd.from_arrow(t).repartition(6),
                           key="k", col="v", q=0.25)
    import duckdb
    want = dict(duckdb.sql(
        "SELECT k, quantile_disc(v, 0.25) FROM t GROUP BY k").fetchall())
    assert got == want


def test_distinct_count_matches_duckdb(ray_session):
    import numpy as np
    import ray.data as rd
    import pyarrow as pa
    import duckdb
    from opencep_ray.stages.sketch import distinct_count

    rng = np.random.default_rng(19)
    n = 2000
    t = pa.table({"k": rng.integers(0, 5, n).astype(str),
                  "v": rng.integers(0, 40, n)})
    got = distinct_count(rd.from_arrow(t).repartition(7),
                         key="k", col="v", out_col="n") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    want = duckdb.sql(
        "SELECT k, count(DISTINCT v) AS n FROM t GROUP BY k ORDER BY k") \
        .fetchdf()
    assert (got["k"].values == want["k"].values).all()
    assert (got["n"].values == want["n"].values).all()


def test_quantile_cardinality_guard_raises(ray_session):
    """A raw high-cardinality double column must raise loudly instead of
    silently materializing |rows| on the driver (VERDICT r03 ask #4)."""
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data as rd
    from opencep_ray.stages.sketch import exact_quantiles, grouped_quantile
    rng = np.random.default_rng(7)
    tbl = pa.table({"k": pa.array(np.arange(500) % 3),
                    "x": pa.array(rng.random(500))})  # 500 distinct doubles
    ds = rd.from_arrow(tbl)
    with pytest.raises(ValueError, match="max_distinct"):
        exact_quantiles(ds, "x", [0.5], max_distinct=100)
    with pytest.raises(ValueError, match="max_distinct"):
        grouped_quantile(ds, "k", "x", 0.5, max_distinct=100)
    # under the cap both still work
    out = exact_quantiles(ds, "x", [0.0, 1.0], max_distinct=1000)
    assert out.num_rows == 2
    gq = grouped_quantile(ds, "k", "x", 0.5, max_distinct=1000)
    assert set(gq) == {0, 1, 2}


def test_ddsketch_relative_error_bound(ray_session):
    """DDSketch guarantee: every returned quantile value within alpha
    relative error of the exact quantile — lognormal (heavy right
    tail), mixed-sign, and zero-inflated inputs, at two alphas."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from opencep_ray.stages.sketch import ddsketch_quantiles
    rng = np.random.default_rng(11)
    datasets = {
        "lognormal": rng.lognormal(0.0, 2.0, 200_000),
        "mixed_sign": np.concatenate([rng.normal(-50, 20, 100_000),
                                      rng.normal(80, 30, 100_000)]),
        "zero_inflated": np.concatenate([np.zeros(50_000),
                                         rng.exponential(3.0, 150_000)]),
    }
    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    for name, x in datasets.items():
        ds = rd.from_arrow(pa.table({"x": x})).repartition(8)
        for alpha in (0.01, 0.05):
            got = ddsketch_quantiles(ds, "x", qs, alpha=alpha)
            for q, v in zip(got["q"].to_pylist(),
                            got["value"].to_pylist()):
                exact = np.sort(x)[int(np.floor(q * (len(x) - 1)))]
                if exact == 0.0:
                    assert abs(v) <= 1e-9, (name, alpha, q, v)
                else:
                    rel = abs(v - exact) / abs(exact)
                    assert rel <= alpha * 1.01, (name, alpha, q, v,
                                                 exact, rel)


def test_ddsketch_determinism_and_empty(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from opencep_ray.stages.sketch import ddsketch_quantiles
    x = np.random.default_rng(3).random(10_000)
    a = ddsketch_quantiles(rd.from_arrow(pa.table({"x": x}))
                           .repartition(2), "x", [0.5])
    b = ddsketch_quantiles(rd.from_arrow(pa.table({"x": x}))
                           .repartition(16), "x", [0.5])
    # identical across partitionings (mergeable + deterministic)
    assert a["value"].to_pylist() == b["value"].to_pylist()
    empty = rd.from_arrow(pa.table({"x": pa.array([], pa.float64())}))
    out = ddsketch_quantiles(empty, "x", [0.5])
    assert out.num_rows == 0


def test_hll_approx_distinct_error_bound(ray_session):
    """HLL estimate within 3 standard errors (1.04/sqrt(m)) of the true
    cardinality across magnitudes, int and string keys, and identical
    across partitionings (deterministic hash, no RNG)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from opencep_ray.stages.sketch import approx_distinct
    p = 14
    se = 1.04 / (1 << p) ** 0.5
    for true_n in (100, 5_000, 200_000):
        vals = np.arange(true_n, dtype=np.int64)
        # 3x duplication so distinct != row count
        x = np.concatenate([vals, vals, vals])
        ds = rd.from_arrow(pa.table({"x": x})).repartition(8)
        est = approx_distinct(ds, "x", p=p)
        assert abs(est - true_n) / true_n <= 3 * se + 0.02, (true_n, est)
        est2 = approx_distinct(
            rd.from_arrow(pa.table({"x": x})).repartition(3), "x", p=p)
        assert est == est2  # partitioning-invariant
    # string keys route through the md5 kernel
    ss = pa.table({"s": [f"user-{i}.example.com" for i in range(20_000)]
                   * 2})
    est = approx_distinct(rd.from_arrow(ss), "s", p=p)
    assert abs(est - 20_000) / 20_000 <= 3 * se + 0.02


def test_hll_grouped_matches_exact_within_error(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from opencep_ray.stages.sketch import (distinct_count,
                                           grouped_approx_distinct)
    rng = np.random.default_rng(5)
    n = 60_000
    keys = rng.integers(0, 4, n)
    vals = rng.integers(0, 3_000, n)
    ds = rd.from_arrow(pa.table({"k": keys, "v": vals})).repartition(6)
    exact = {r["k"]: r["n_distinct"]
             for r in distinct_count(ds, "k", "v").take_all()}
    approx = {r["k"]: r["n_distinct_approx"]
              for r in grouped_approx_distinct(ds, "k", "v",
                                               p=12).take_all()}
    assert set(exact) == set(approx)
    se = 1.04 / (1 << 12) ** 0.5
    for k, true_n in exact.items():
        assert abs(approx[k] - true_n) / true_n <= 3 * se + 0.02, \
            (k, true_n, approx[k])


def test_hll_empty_and_validation(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data as rd
    from opencep_ray.stages.sketch import approx_distinct
    empty = rd.from_arrow(pa.table({"x": pa.array([], pa.int64())}))
    assert approx_distinct(empty, "x") == 0
    with pytest.raises(ValueError, match="p must be"):
        approx_distinct(empty, "x", p=2)


def test_grouped_ddsketch_relative_error(ray_session):
    """Per-key DDSketch quantile within alpha relative error of the
    exact per-key quantile, including negative and zero values."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from opencep_ray.stages.sketch import grouped_ddsketch_quantile
    rng = np.random.default_rng(23)
    n = 120_000
    keys = rng.integers(0, 5, n)
    x = np.where(keys == 0, 0.0,
                 rng.lognormal(0, 1.5, n) * np.where(keys % 2 == 0,
                                                     -1.0, 1.0))
    ds = rd.from_arrow(pa.table({"k": keys, "x": x})).repartition(6)
    for q in (0.25, 0.5, 0.9):
        got = {r["k"]: r["value"]
               for r in grouped_ddsketch_quantile(ds, "k", "x", q,
                                                  alpha=0.02).take_all()}
        for k in range(5):
            sub = np.sort(x[keys == k])
            exact = sub[int(np.floor(q * (len(sub) - 1)))]
            if exact == 0.0:
                assert abs(got[k]) <= 1e-9
            else:
                assert abs(got[k] - exact) / abs(exact) <= 0.02 * 1.01, \
                    (q, k, got[k], exact)
