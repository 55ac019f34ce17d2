"""Coarse key-partitioning for vectorized multi-key kernels.

``groupby(key).map_groups(fn)`` invokes ``fn`` once per key — O(|keys|)
Python/Ray overhead (group slicing, table construction, UDF dispatch)
that grows with the corpus.  The pattern used across this package
instead: append ``_kpart`` = a deterministic hash partition of the key,
``groupby("_kpart").map_groups(vec_fn)``, and have ``vec_fn`` process
ALL keys of the partition in one vectorized pass (run-length encoding
over key-sorted rows + reduceat/polars group_by).  UDF-invocation count
becomes O(parts); per-key work stays in C kernels.

Co-location guarantee is identical: every row of a key shares its
``_kpart``, so each key is fully contained in exactly one group.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset


def with_key_part(ds: Dataset, key: str, parts: int = 64,
                  salt: int = 0xA17) -> Dataset:
    """Appends ``_kpart`` (int64 in [0, parts)) — deterministic
    splitmix64/md5 hash partition of ``key`` (ints, strings, binary via
    the split.py kernels).  ``parts`` bounds per-task group size:
    ~``rows / parts`` rows per group; raise it with corpus size."""
    from .split import keys_to_u64, mix64

    def fn(t: pa.Table) -> pa.Table:
        h = mix64(keys_to_u64(t[key]), salt=salt)
        return t.append_column(
            "_kpart", pa.array((h % np.uint64(parts)).astype(np.int64)))
    return ds.map_batches(fn, batch_format="pyarrow")
