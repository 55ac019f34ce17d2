"""Deterministic hash-based dataset splitting and sampling.

The standard way to carve train/val/test out of a 100 TB corpus is NOT
random sampling — it's a pure function of a stable key, so that

* every worker makes the same decision without coordination or RNG
  state (embarrassingly parallel inside ``map_batches``);
* re-runs, resumed runs and incremental refreshes assign every document
  to the SAME split (no leakage when the corpus grows);
* downstream joins can recompute membership instead of shipping it.

The hash is a splitmix64-style finalizer over the key (two wrapping
uint64 multiplies + xor-shifts), reduced to a bucket in [0, 1e6); split
thresholds are INTEGER cumulative fractions of 1e6, so assignment is
exact integer arithmetic end-to-end — bit-reproducible in numpy
(wrapping uint64) and in the DuckDB oracle (128-bit modular arithmetic
with a 32-bit-split multiply; see ``SPLIT_ASSIGN_SQL`` in
pipelines/queries.py).
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np
import pyarrow as pa

from ray.data import Dataset

_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xBF58476D1CE4E5B9)
_BUCKETS = 1_000_000


def keys_to_u64(col) -> np.ndarray:
    """uint64 view of a key column.  Integer keys reinterpret as
    two's-complement uint64 (free).  String/binary keys take the upper
    half of their md5 digest, little-endian — chosen because DuckDB's
    ``md5_number_lower(s)`` computes the identical value, so string
    splits stay bit-reproducible in the SQL oracle.  The md5 loop is
    per-row Python but actor-amortized and ~1 µs/row (same family the
    winnowing fingerprint uses); split-by-domain corpora hash one short
    key per document, not the text."""
    import hashlib
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    t = arr.type
    if pa.types.is_string(t) or pa.types.is_large_string(t) \
            or pa.types.is_binary(t):
        return np.array(
            [int.from_bytes(hashlib.md5(
                s.encode() if isinstance(s, str) else s).digest()[8:],
                "little")
             for s in arr.to_pylist()], dtype=np.uint64)
    return arr.to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)


def mix64(keys: np.ndarray, salt: int = 0) -> np.ndarray:
    """Vectorized splitmix64-style finalizer (wrapping uint64)."""
    with np.errstate(over="ignore"):
        h = keys.astype(np.uint64, copy=False) * _C1 + np.uint64(salt)
        h ^= h >> np.uint64(33)
        h = h * _C2
        h ^= h >> np.uint64(29)
    return h


def bucket_of(keys: np.ndarray, salt: int = 0) -> np.ndarray:
    """Deterministic bucket in [0, 1e6) per key."""
    return (mix64(keys, salt) % np.uint64(_BUCKETS)).astype(np.int64)


def split_thresholds(fractions: Dict[str, float]) -> Sequence[tuple]:
    """[(name, lo, hi)] integer bucket ranges covering [0, 1e6).  The
    LAST split absorbs rounding slack so the ranges always partition the
    bucket space exactly."""
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"fractions must sum to 1, got {total}")
    out, lo = [], 0
    names = list(fractions)
    for i, name in enumerate(names):
        hi = _BUCKETS if i == len(names) - 1 \
            else lo + int(round(fractions[name] * _BUCKETS))
        out.append((name, lo, hi))
        lo = hi
    return out


class _AssignSplit:
    """map_batches stage: append a ``split`` string column."""

    def __init__(self, key_col: str, thresholds, salt: int):
        self.key_col = key_col
        self.thresholds = thresholds
        self.salt = salt

    def __call__(self, batch: pa.Table) -> pa.Table:
        b = bucket_of(keys_to_u64(batch[self.key_col]), self.salt)
        names = np.empty(len(b), dtype=object)
        for name, lo, hi in self.thresholds:
            names[(b >= lo) & (b < hi)] = name
        return batch.append_column("split", pa.array(names, pa.string()))


def hash_split(ds: Dataset, key_col: str,
               fractions: Dict[str, float], salt: int = 0) -> Dataset:
    """Appends a deterministic ``split`` column (e.g. ``{"train": 0.9,
    "val": 0.05, "test": 0.05}``).  Pure per-batch function of the key —
    no shuffle, no RNG, stable across re-runs and corpus growth."""
    return ds.map_batches(
        _AssignSplit, batch_format="pyarrow",
        fn_constructor_args=(key_col, split_thresholds(fractions), salt),
        concurrency=(1, 8))


def hash_sample(ds: Dataset, key_col: str, rate: float,
                salt: int = 0) -> Dataset:
    """Deterministic ~``rate`` sample: keeps rows whose bucket falls
    below ``round(rate * 1e6)``.  Unlike ``Dataset.random_sample`` this
    is reproducible, key-consistent (all rows of a key stay together)
    and needs no seed plumbing across workers."""
    cut = int(round(rate * _BUCKETS))

    class _Sample:
        def __init__(self, key_col=key_col, cut=cut, salt=salt):
            self.key_col, self.cut, self.salt = key_col, cut, salt

        def __call__(self, batch: pa.Table) -> pa.Table:
            b = bucket_of(keys_to_u64(batch[self.key_col]), self.salt)
            return batch.filter(pa.array(b < self.cut))

    return ds.map_batches(_Sample, batch_format="pyarrow",
                          concurrency=(1, 8))


def stratified_sample(ds: Dataset, key_col: str, strata_col: str,
                      rates: Dict[str, float], default_rate: float = 0.0,
                      salt: int = 0) -> Dataset:
    """Per-stratum deterministic sampling — the standard rebalancing
    move (downsample the dominant language/domain, keep the rest): a
    row survives iff ``bucket(key) < rates[stratum] * 1e6``.  Same
    bucket function as :func:`hash_split`, so sampling composes with
    splits without correlation (use a different salt).  Strata absent
    from ``rates`` get ``default_rate``.  Vectorized: one unique() over
    the batch's strata + one integer compare per row."""
    cuts_map = {s: int(round(r * _BUCKETS)) for s, r in rates.items()}
    default_cut = int(round(default_rate * _BUCKETS))

    class _Stratified:
        def __init__(self):
            self.__name__ = "StratifiedSample"

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return batch
            b = bucket_of(keys_to_u64(batch[key_col]), salt)
            strata = batch[strata_col].to_numpy(zero_copy_only=False)
            u, inv = np.unique(strata, return_inverse=True)
            cuts = np.array([cuts_map.get(s, default_cut) for s in u],
                            dtype=np.int64)[inv]
            return batch.filter(pa.array(b < cuts))

    return ds.map_batches(_Stratified, batch_format="pyarrow",
                          concurrency=(1, 8))
