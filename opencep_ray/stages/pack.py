"""Greedy first-fit shard packing — sequential semantics, per key.

:func:`opencep_ray.pipelines.queries.pack_shards` assigns documents to
shards by a FIXED grid over the running size (floor(cumsum/budget)); a
document may conceptually straddle two shards.  Real training-shard
writers usually want the GREEDY contract instead: fill the current
shard while the next document still fits, else start a new shard; an
oversized document gets a shard of its own.  That recurrence
(state = current fill) is data-dependent and non-linear, so unlike the
running sum it cannot be folded across block boundaries with a scalar
carry — it is inherently sequential within a key.

Scale shape: ``groupby(key).map_groups`` — one exchange, then each
key's document list is packed independently.  PARTITIONING ASSUMPTION
(documented per SURVEY.md §2.9): one key's rows must fit one worker.
That is the nature of the operator — shard boundaries within a key are
a sequential chain — so the parallelism unit is the key, exactly like
the reference's per-key evaluation.  Within a group the packing is
O(#shards) ``searchsorted`` calls over the cumsum (not a per-row
Python loop): each call finds the largest prefix that still fits the
current budget window.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset


def _greedy_bounds(cum: np.ndarray, budget: int) -> np.ndarray:
    """Shard ids for one key given the inclusive cumsum of sizes.

    Equivalent to: keep adding documents while fill + size <= budget,
    else start a new shard (an oversized document occupies its own)."""
    n = len(cum)
    shard = np.empty(n, np.int64)
    start, sid = 0, 0
    base = 0
    while start < n:
        end = int(np.searchsorted(cum, base + budget, side="right"))
        if end <= start:            # oversized document: its own shard
            end = start + 1
        shard[start:end] = sid
        sid += 1
        base = int(cum[end - 1])
        start = end
    return shard


def greedy_pack(ds: Dataset, key: str, order: str, size: str,
                budget: int, out_col: str = "shard_id") -> Dataset:
    """First-fit shard assignment per ``key`` in ``order``: documents
    fill a shard while the total ``size`` stays within ``budget``.

    Grouping is per COARSE key partition (stages/partition.py): one UDF
    call sorts all its keys by (key, order) and walks each key run with
    the O(#shards) searchsorted chain — Ray/UDF overhead O(parts), the
    only per-key Python being the inherently sequential shard chain."""
    import pyarrow.compute as pc

    from .partition import with_key_part

    def pack_group(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return group.drop_columns(["_kpart"]).append_column(
                out_col, pa.array([], pa.int64()))
        idx = pc.sort_indices(group, sort_keys=[(key, "ascending"),
                                                (order, "ascending")])
        g = group.take(idx)
        k = g[key].to_numpy(zero_copy_only=False)
        sizes = g[size].to_numpy(zero_copy_only=False)
        n = len(k)
        starts = np.flatnonzero(
            np.concatenate([[True], k[1:] != k[:-1]]))
        shard = np.empty(n, np.int64)
        for s, e in zip(starts, np.append(starts[1:], n)):
            shard[s:e] = _greedy_bounds(np.cumsum(sizes[s:e]), budget)
        return g.drop_columns(["_kpart"]).append_column(
            out_col, pa.array(shard))

    return (with_key_part(ds, key)
            .groupby("_kpart").map_groups(pack_group,
                                          batch_format="pyarrow"))
