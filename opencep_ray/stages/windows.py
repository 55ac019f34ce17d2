"""Windowed grouping primitives: tumbling / sliding / session windows.

The reference's only window is the CEP sliding pattern window
(``max_ts − min_ts ≤ W``, tree/nodes/Node.py:187-193) — preserved exactly in
the evaluator.  These operators add the engine-level windowed grouping
surface the north rule asks for (tumbling / sliding / session), built
Ray-Data-first:

* tumbling / sliding: vectorized window-id assignment inside ``map_batches``
  with **per-batch partial aggregation** (polars), then one small
  ``groupby().aggregate(Sum)`` over the partials — the shuffle moves one row
  per (window, key) per batch instead of every event;
* session: gap-based windows need per-key ordering → one hash shuffle via
  ``groupby(key)`` with a fully vectorized numpy session assignment per
  group.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Max, Min, Sum


class _PartialWindowAgg:
    """Per-batch partial aggregation of count + optional sum per
    (window_start, *keys).  Sliding windows replicate each row into the
    ``k = size/hop`` windows covering it, vectorized."""

    def __init__(self, size_us: int, hop_us: int, ts_col: str,
                 keys: Sequence[str], value_col: Optional[str]):
        assert size_us % hop_us == 0, "window size must be a multiple of hop"
        self.size_us = size_us
        self.hop_us = hop_us
        self.k = size_us // hop_us
        self.ts_col = ts_col
        self.keys = list(keys)
        self.value_col = value_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl
        df = pl.from_arrow(batch)
        ts = df[self.ts_col].cast(pl.Datetime("us")).cast(pl.Int64)
        df = df.with_columns(ts.alias("_ts_us"))
        # hop-grid cell of the event, then the k windows that contain it
        parts = []
        base = (ts // self.hop_us) * self.hop_us
        for i in range(self.k):
            ws = base - i * self.hop_us
            parts.append(df.with_columns(ws.alias("window_start")))
        rep = pl.concat(parts) if len(parts) > 1 else parts[0]
        aggs = [pl.len().cast(pl.Int64).alias("_n")]
        if self.value_col:
            # integer micro-units: exact, order-independent summation
            aggs.append((pl.col(self.value_col) * 1_000_000).round(0)
                        .cast(pl.Int64).sum().alias("_sum"))
        out = rep.group_by(["window_start"] + self.keys).agg(aggs)
        return out.to_arrow()


def windowed_agg(ds: Dataset, size_s: float, hop_s: Optional[float] = None,
                 ts_col: str = "ts", keys: Sequence[str] = (),
                 value_col: Optional[str] = None) -> Dataset:
    """Tumbling (``hop_s`` omitted) or sliding window count/sum per key.

    Returns a Dataset with columns ``window_start (µs int64), *keys,
    n (int64), sum_<value_col> (float64, when requested)``.
    """
    size_us = int(size_s * 1_000_000)
    hop_us = int((hop_s if hop_s is not None else size_s) * 1_000_000)
    partial = _PartialWindowAgg(size_us, hop_us, ts_col, keys, value_col)
    partials = ds.map_batches(partial, batch_format="pyarrow")
    aggs = [Sum("_n", alias_name="n")]
    if value_col:
        aggs.append(Sum("_sum", alias_name=f"sum_{value_col}"))
    out = partials.groupby(["window_start"] + list(keys),
                           num_partitions=32).aggregate(*aggs)
    if value_col:
        col = f"sum_{value_col}"

        def unscale(t: pa.Table, col=col) -> pa.Table:
            import pyarrow.compute as pc
            i = t.column_names.index(col)
            v = pc.divide(pc.cast(t[col], pa.float64()), 1_000_000.0)
            return t.set_column(i, col, v)

        out = out.map_batches(unscale, batch_format="pyarrow")
    return out


class _SessionAssign:
    """Multi-key numpy session windowing over a COARSE key partition:
    rows are sorted by (key, ts) in one pass; a new session starts at
    every key change or when the gap from the previous event exceeds
    ``gap_us``; all per-session reductions run via reduceat on session
    boundaries.  One UDF call handles every key of the partition — no
    per-key Python (the groupby is on ``_kpart``, see
    stages/partition.py)."""

    def __init__(self, gap_us: int, key_col: str, ts_col: str,
                 value_col: Optional[str]):
        self.gap_us = gap_us
        self.key_col = key_col
        self.ts_col = ts_col
        self.value_col = value_col
        self.__name__ = "SessionAssign"

    def __call__(self, group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        if group.num_rows == 0:
            out = {self.key_col: group[self.key_col].slice(0, 0),
                   "session_start": pa.array([], pa.timestamp("us")),
                   "session_end": pa.array([], pa.timestamp("us")),
                   "n": pa.array([], pa.int64())}
            if self.value_col:
                out[f"sum_{self.value_col}"] = pa.array([], pa.float64())
            return pa.table(out)
        order = pc.sort_indices(
            group, sort_keys=[(self.key_col, "ascending"),
                              (self.ts_col, "ascending")])
        g = group.take(order)
        k = g[self.key_col].to_numpy(zero_copy_only=False)
        ts = pc.cast(pc.cast(g[self.ts_col], pa.timestamp("us")),
                     pa.int64()).to_numpy()
        new_session = np.empty(len(ts), dtype=bool)
        new_session[0] = True
        np.greater(np.diff(ts), self.gap_us, out=new_session[1:])
        new_session[1:] |= k[1:] != k[:-1]
        starts = np.flatnonzero(new_session)
        n = np.diff(np.append(starts, len(ts)))
        session_start = ts[starts]
        session_end = ts[np.append(starts[1:] - 1, len(ts) - 1)]
        out = {
            self.key_col: g[self.key_col].take(pa.array(starts)),
            "session_start": pa.array(session_start, pa.timestamp("us")),
            "session_end": pa.array(session_end, pa.timestamp("us")),
            "n": pa.array(n, pa.int64()),
        }
        if self.value_col:
            v = g[self.value_col].to_numpy(zero_copy_only=False)
            out[f"sum_{self.value_col}"] = pa.array(
                np.add.reduceat(v, starts), pa.float64())
        return pa.table(out)


def session_windows(ds: Dataset, gap_s: float, key_col: str,
                    ts_col: str = "ts",
                    value_col: Optional[str] = None,
                    key_parts: int = 64) -> Dataset:
    """Gap-based session windows per key: one hash shuffle on a coarse
    key partition, then ONE vectorized multi-key assignment per
    partition (UDF calls O(key_parts), not O(|keys|))."""
    from .partition import with_key_part
    fn = _SessionAssign(int(gap_s * 1_000_000), key_col, ts_col, value_col)
    return (with_key_part(ds, key_col, parts=key_parts)
            .groupby("_kpart", num_partitions=32)
            .map_groups(fn, batch_format="pyarrow"))
