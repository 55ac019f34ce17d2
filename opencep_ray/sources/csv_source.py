"""CSV event sources — the engine-side equivalent of the reference's
pluggable ``DataFormatter`` layer (``/root/reference/base/DataFormatter.py``,
``plugin/stocks/Stocks.py:23-61``): a vectorized normalizer from raw CSV to
a typed Arrow event table plus the matching :class:`EngineConfig`.

The Metastock-7 stock format is implemented as the worked example:
``Ticker,Date(YYYYMMDDhhmm),Open,Peak,Low,Close,Volume[,Probability]``;
the ticker is the event type, like the reference's ``MetastockDataFormatter``.
A stock stream has no conversation key, so it evaluates as ONE logical
partition (a constant key) — exactly the reference's sequential semantics;
any column can be promoted to the partition key instead when patterns are
key-local.
"""

from __future__ import annotations

from typing import Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc

from ..engine import EngineConfig

STOCK_COLUMN_NAMES = ["ticker", "date", "open", "peak", "low", "close",
                      "volume"]


def normalize_stocks(batch: pa.Table) -> pa.Table:
    """Vectorized Metastock normalizer: parses the ``YYYYMMDDhhmm`` integer
    date into ``ts:timestamp[us]`` and adds the constant stream key."""
    date = pc.cast(batch["date"], pa.string())
    ts = pc.strptime(date, format="%Y%m%d%H%M", unit="us")
    batch = batch.append_column("ts", ts)
    batch = batch.append_column(
        "stream", pa.array(["s"] * batch.num_rows, pa.string()))
    # a per-file arrival index (ties in ts keep file order)
    batch = batch.append_column(
        "arrival", pa.array(range(batch.num_rows), pa.int64()))
    return batch


def read_stocks_csv(paths, has_probability: bool = False):
    """Reads Metastock-7 CSV (no header) into a normalized event Dataset.

    Each FILE is parsed as one unit (``read_binary_files`` + per-file
    parse) so the ``arrival`` tie-break column reflects true file order —
    a plain ``read_csv`` + ``map_batches`` would restart the index at
    every Ray batch boundary."""
    import io
    import ray.data as rd
    from pyarrow import csv as pacsv
    names = STOCK_COLUMN_NAMES + (["probability"] if has_probability else [])

    def parse_file(batch: pa.Table) -> pa.Table:
        tables = []
        for blob in batch["bytes"].to_pylist():
            t = pacsv.read_csv(
                io.BytesIO(blob),
                read_options=pacsv.ReadOptions(column_names=names))
            tables.append(normalize_stocks(t))
        return pa.concat_tables(tables)

    ds = rd.read_binary_files(paths)
    return ds.map_batches(parse_file, batch_format="pyarrow", batch_size=1)


def stocks_table(lines: Sequence[str],
                 has_probability: bool = False) -> pa.Table:
    """Parses in-memory CSV lines (tests / tiny streams)."""
    import io
    from pyarrow import csv as pacsv
    names = STOCK_COLUMN_NAMES + (["probability"] if has_probability else [])
    data = io.BytesIO("\n".join(lines).encode())
    table = pacsv.read_csv(
        data, read_options=pacsv.ReadOptions(column_names=names))
    return normalize_stocks(table)


def stocks_config(num_partitions: int = 1,
                  has_probability: bool = False) -> EngineConfig:
    """Engine config for the stock stream: event type = ticker, single
    logical partition (reference sequential semantics,
    ``plugin/stocks/Stocks.py:11-21``)."""
    return EngineConfig(key_col="stream", ts_col="ts", type_col="ticker",
                        order_cols=("arrival",),
                        prob_col="probability" if has_probability else None,
                        num_partitions=num_partitions)
