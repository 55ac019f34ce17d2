"""Resumable partitioned Parquet sink.

The streaming path already has an exactly-once checkpointed sink
(``streaming.py`` — per-partition lineage + offsets).  This module is the
BATCH counterpart the 100 TB plan needs: a long ``write_parquet`` job
that dies at 80 % must not redo the finished 80 %.

Layout::

    <root>/_meta.json                  # {"num_partitions": P, "key_col": k}
    <root>/part=<i>/data.parquet       # all rows with hash(key) % P == i
    <root>/part=<i>/_SUCCESS           # written AFTER data.parquet is final

Semantics:

* the partition id is the same deterministic polars hash the engine's
  shuffle uses (seed 0 — stable across workers, batches and runs;
  ``engine.py:27`` explains why Python's salted ``hash()`` must never be
  used here), so a re-run assigns every row to the same partition;
* a partition is *done* iff its ``_SUCCESS`` marker exists.  Markers are
  enumerated once on the driver (O(P) listdir, no data read) and rows
  belonging to done partitions are dropped inside the very first
  ``map_batches`` — a resumed run never shuffles, sorts or rewrites a
  finished partition;
* each partition is written by exactly ONE ``map_groups`` task:
  data lands under a temp name and is ``os.rename``d (atomic on POSIX)
  before the marker is written, so a task killed mid-write leaves no
  marker and the partition is redone cleanly on the next run;
* ``_meta.json`` pins ``num_partitions``: resuming with a different P
  would mis-route rows into done partitions, so it raises instead.

At cluster scale, one directory per hash partition keeps output files at
``total / P`` bytes (pick P so that's 100 MB–1 GB), and the groupby
shuffle that co-locates each partition is the same single exchange a
plain sorted write would need.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ray.data import Dataset

_MARKER = "_SUCCESS"


def partition_ids(keys, num_partitions: int) -> np.ndarray:
    """Deterministic hash partition id per row (polars hash, seed 0)."""
    import polars as pl
    arr = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
    h = pl.from_arrow(arr).hash(seed=0).to_numpy().astype(np.uint64)
    return (h % np.uint64(num_partitions)).astype(np.int64)


def done_partitions(root: str, num_partitions: int) -> frozenset:
    """Partitions whose ``_SUCCESS`` marker exists (O(P) stat calls)."""
    return frozenset(
        i for i in range(num_partitions)
        if os.path.exists(os.path.join(root, f"part={i}", _MARKER)))


class _AssignSkipDone:
    """map_batches stage: append ``_part`` and drop rows whose partition
    is already done — the skip happens before any shuffle."""

    def __init__(self, key_col: str, num_partitions: int, done: frozenset):
        self.key_col = key_col
        self.P = num_partitions
        self.done = np.array(sorted(done), dtype=np.int64) \
            if done else np.empty(0, dtype=np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        part = partition_ids(batch[self.key_col], self.P)
        if len(self.done):
            keep = ~np.isin(part, self.done)
            batch = batch.filter(pa.array(keep))
            part = part[keep]
        return batch.append_column("_part", pa.array(part, pa.int64()))


class _PartitionWriter:
    """map_groups stage: write one partition atomically, then its marker.
    Returns a one-row stats table so the sink's result is a tiny audit
    dataset, never the data itself."""

    def __init__(self, root: str):
        self.root = root
        self.__name__ = "PartitionWriter"  # Ray's map_groups wants a fn name

    def __call__(self, group: pa.Table) -> pa.Table:
        part = int(group["_part"][0].as_py())
        out_dir = os.path.join(self.root, f"part={part}")
        os.makedirs(out_dir, exist_ok=True)
        final = os.path.join(out_dir, "data.parquet")
        tmp = final + f".inprogress-{os.getpid()}"
        data = group.drop_columns(["_part"])
        pq.write_table(data, tmp)
        os.rename(tmp, final)
        with open(os.path.join(out_dir, _MARKER), "w") as f:
            f.write(str(data.num_rows))
        return pa.table({
            "partition": pa.array([part], pa.int64()),
            "rows": pa.array([data.num_rows], pa.int64()),
            "bytes": pa.array([os.path.getsize(final)], pa.int64())})


def resumable_write_parquet(ds: Dataset, root: str, key_col: str,
                            num_partitions: int = 64,
                            num_shuffle_partitions: Optional[int] = None
                            ) -> pa.Table:
    """Write ``ds`` as ``root/part=<i>/data.parquet`` with per-partition
    ``_SUCCESS`` markers; a re-run after a failure skips every partition
    that already has its marker.  Returns the per-partition stats table
    for the partitions written by THIS run (empty if nothing was left to
    do)."""
    os.makedirs(root, exist_ok=True)
    meta_path = os.path.join(root, "_meta.json")
    if os.path.exists(meta_path):
        meta = json.load(open(meta_path))
        if meta["num_partitions"] != num_partitions \
                or meta["key_col"] != key_col:
            raise ValueError(
                f"resume mismatch: {root} was written with {meta}, "
                f"got num_partitions={num_partitions} key_col={key_col!r}")
    else:
        tmp = meta_path + f".tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"num_partitions": num_partitions,
                       "key_col": key_col}, f)
        os.rename(tmp, meta_path)
    done = done_partitions(root, num_partitions)
    if len(done) == num_partitions:
        return pa.table({"partition": pa.array([], pa.int64()),
                         "rows": pa.array([], pa.int64()),
                         "bytes": pa.array([], pa.int64())})
    stats = (ds.map_batches(
                 _AssignSkipDone, batch_format="pyarrow",
                 fn_constructor_args=(key_col, num_partitions, done),
                 concurrency=(1, 8))
             .groupby("_part",
                      num_partitions=num_shuffle_partitions
                      or min(num_partitions, 64))
             .map_groups(_PartitionWriter(root), batch_format="pyarrow"))
    out = stats.take_all()          # ≤ P tiny audit rows, never the data
    if not out:
        return pa.table({"partition": pa.array([], pa.int64()),
                         "rows": pa.array([], pa.int64()),
                         "bytes": pa.array([], pa.int64())})
    return pa.Table.from_pylist(out).sort_by("partition")


def read_partitioned(root: str) -> Dataset:
    """Read back only the COMPLETE partitions (marker present) of a
    resumable sink directory."""
    import ray.data as rd
    meta = json.load(open(os.path.join(root, "_meta.json")))
    files = [os.path.join(root, f"part={i}", "data.parquet")
             for i in sorted(done_partitions(root, meta["num_partitions"]))]
    if not files:
        raise FileNotFoundError(f"no complete partitions under {root}")
    ds = rd.read_parquet(files)
    # the hive-style dir names (part=<i>) get inferred as a column;
    # it's sink bookkeeping, not data — drop it
    if "part" in ds.schema().names:
        ds = ds.drop_columns(["part"])
    return ds
