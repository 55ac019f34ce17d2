"""Source helpers: parquet readers and format plugins."""

from __future__ import annotations

import glob
import os
from typing import Optional, Sequence


def read_parquet_clean(path, columns: Optional[Sequence[str]] = None,
                       **kwargs):
    """``ray.data.read_parquet`` with two scale hygiene rules applied:

    * **column pruning at the read** — pass ``columns`` so only the
      needed columns leave storage (a read that loads all columns for a
      two-column transform is wrong at 100 TB);
    * **metadata-stripped schema** — parquet files written via pandas
      carry a ``pandas`` schema-metadata dict that defeats Ray Data's
      schema-dedup cache (``Failed to hash the schemas`` log noise on
      every shuffle) and bloats every bundle; reading against the
      stripped schema keeps block schemas clean end-to-end.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    sample = path
    if isinstance(path, (list, tuple)):
        sample = path[0]
    if os.path.isdir(sample):
        sample = sorted(glob.glob(os.path.join(sample, "*.parquet")))[0]
    schema = pq.read_schema(sample).remove_metadata()
    if columns:
        schema = pa.schema([schema.field(c) for c in columns])
        kwargs["columns"] = list(columns)
    return rd.read_parquet(path, schema=schema, **kwargs)
