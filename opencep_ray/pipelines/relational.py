"""Relational demonstration pipelines over the TPC-H-ish test tables.

Show the two aggregation shapes that matter at 100 TB:

* :func:`pricing_summary` — TPC-H-Q1-style grouped aggregate with
  **map-side partial aggregation**: each batch collapses to one row per
  group before the shuffle, so the exchange moves O(groups × batches)
  rows, not O(rows).
* :func:`segment_revenue` — join where the small side (customer) is
  **broadcast** via ``ray.put`` and probed per batch; no shuffle join.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset
from ray.data.aggregate import Count, Sum


class _Q1Partial:
    """Sums are accumulated in integer micro-units (value × 1e6, rounded to
    the nearest integer) so partial-aggregation order cannot perturb the
    last decimal — integer sums are exact and match the SQL oracle's
    identical integer accumulation bit-for-bit.  (At 100 TB scale the same
    trick needs int128/decimal accumulators.)"""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl
        df = pl.from_arrow(batch)

        def micro(expr):
            return (expr * 1_000_000).round(0).cast(pl.Int64)

        disc_price = pl.col("l_extendedprice") * (1 - pl.col("l_discount"))
        return (df.group_by(["l_returnflag", "l_linestatus"])
                .agg([
                    micro(pl.col("l_quantity")).sum().alias("_sum_qty"),
                    micro(pl.col("l_extendedprice")).sum().alias("_sum_base"),
                    micro(disc_price).sum().alias("_sum_disc"),
                    micro(disc_price * (1 + pl.col("l_tax"))).sum()
                    .alias("_sum_charge"),
                    pl.len().cast(pl.Int64).alias("_n"),
                ]).to_arrow())


def pricing_summary(lineitem: Dataset, cutoff: str = "1998-09-01") -> Dataset:
    """Pricing summary per (returnflag, linestatus) for shipdate < cutoff."""
    cutoff_scalar = pa.scalar(np.datetime64(cutoff, "us"),
                              pa.timestamp("us"))
    filtered = lineitem.map_batches(
        lambda t: t.filter(pc.less(t["l_shipdate"], cutoff_scalar)),
        batch_format="pyarrow")
    partials = filtered.map_batches(_Q1Partial(), batch_format="pyarrow")
    out = (partials.groupby(["l_returnflag", "l_linestatus"],
                           num_partitions=4)
           .aggregate(Sum("_sum_qty", alias_name="sum_qty"),
                      Sum("_sum_base", alias_name="sum_base_price"),
                      Sum("_sum_disc", alias_name="sum_disc_price"),
                      Sum("_sum_charge", alias_name="sum_charge"),
                      Sum("_n", alias_name="count_order")))

    def unscale(t: pa.Table) -> pa.Table:
        for c in ("sum_qty", "sum_base_price", "sum_disc_price",
                  "sum_charge"):
            i = t.column_names.index(c)
            # no further rounding: both sides divide the identical int64
            # sum by 1e6, giving bit-identical doubles
            v = pc.divide(pc.cast(t[c], pa.float64()), 1_000_000.0)
            t = t.set_column(i, c, v)
        return t

    return out.map_batches(unscale, batch_format="pyarrow")


class _SegmentLookup:
    """Broadcast hash-join probe: customer → mktsegment, fetched once per
    actor from the object store; the per-batch probe is one vectorized
    polars hash join (no per-row Python)."""

    def __init__(self, seg_ref):
        import polars as pl
        seg_tbl = ray.get(seg_ref)  # small arrow table, broadcast once
        self.seg_df = (pl.from_arrow(seg_tbl)
                       .with_columns(pl.col("c_custkey").cast(pl.Int64)))

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl
        df = (pl.from_arrow(batch)
              .with_columns(pl.col("o_custkey").cast(pl.Int64))
              .join(self.seg_df, left_on="o_custkey",
                    right_on="c_custkey", how="left")
              .with_columns(pl.col("c_mktsegment").fill_null("UNKNOWN")))
        return (df.group_by("c_mktsegment")
                .agg([(pl.col("o_totalprice") * 1_000_000).round(0)
                      .cast(pl.Int64).sum().alias("_rev"),
                      pl.len().cast(pl.Int64).alias("_n")])
                .to_arrow())


def segment_revenue(orders: Dataset, customer: Dataset) -> Dataset:
    """Total order revenue per customer market segment (broadcast join +
    partial aggregation)."""
    cust = customer.select_columns(["c_custkey", "c_mktsegment"]).to_pandas()
    seg_ref = ray.put(pa.Table.from_pandas(cust, preserve_index=False))
    partials = orders.map_batches(_SegmentLookup, batch_format="pyarrow",
                                  fn_constructor_args=(seg_ref,),
                                  concurrency=(1, 8))
    out = (partials.groupby("c_mktsegment", num_partitions=4)
           .aggregate(Sum("_rev", alias_name="revenue"),
                      Sum("_n", alias_name="n_orders")))

    def unscale(t: pa.Table) -> pa.Table:
        i = t.column_names.index("revenue")
        v = pc.divide(pc.cast(t["revenue"], pa.float64()), 1_000_000.0)
        return t.set_column(i, "revenue", v)

    return out.map_batches(unscale, batch_format="pyarrow")
