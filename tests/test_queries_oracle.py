"""Driver-style correctness gate, run locally: every query in
``__ray_entry__.queries()`` with an ``oracle_sql()`` entry must match its
DuckDB oracle on row count, column names, and an order-insensitive value
multiset, at sf0.001."""

import math

import duckdb
import pandas as pd
import pytest

import os

SF_DIR = os.environ.get("GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _oracle_df(sql):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con.execute(sql).df()


def _canon(df: pd.DataFrame):
    df = df[sorted(df.columns)].copy()
    rows = []
    for tup in df.itertuples(index=False):
        canon_row = []
        for v in tup:
            if isinstance(v, float):
                canon_row.append(round(v, 6) if not math.isnan(v) else "nan")
            else:
                canon_row.append(str(v))
        rows.append(tuple(canon_row))
    return sorted(rows)


def _to_df(res):
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _load():
    import __ray_entry__ as entrymod
    return entrymod.queries(), entrymod.oracle_sql()


QUERIES, ORACLES = _load()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_vs_oracle(name, ray_session):
    got = _canon(_to_df(QUERIES[name](SF_DIR)))
    want = _canon(_oracle_df(ORACLES[name]))
    assert len(got) == len(want), (
        f"{name}: rows {len(got)} != oracle {len(want)}")
    assert got == want, f"{name}: value mismatch\nray={got[:3]}\nsql={want[:3]}"
    assert len(got) > 0, f"{name}: oracle returned 0 rows — weak test"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, ray_session):
    df = _to_df(QUERIES[name](SF_DIR))
    assert df is not None
    assert len(df.columns) > 0


def test_entry_smoke(ray_session):
    import __ray_entry__ as entrymod
    df = _to_df(entrymod.entry())
    assert len(df.columns) > 0
