"""Ordered analytics (window functions) over Ray Datasets.

Ray Data has no SQL-style window functions (``sum() OVER (PARTITION BY k
ORDER BY o)``, ``lag()``), yet training-data pipelines need them
constantly: token-budget shard packing is a partitioned running sum,
inter-event gaps are a partitioned lag.  A ``groupby(k).map_groups``
emulation would shuffle every row AND hold whole groups in one worker —
wrong shape when one key (a hot conversation, a giant source) outweighs
a node.

This module implements them as the classic **two-pass distributed prefix
scan** instead:

1. ``Dataset.sort(key + order)`` — the one unavoidable all-to-all; Ray's
   sort range-partitions, so blocks come back globally ordered and each
   key occupies a CONTIGUOUS run of rows (spanning whole blocks only at
   block boundaries).
2. **Pass 1** (parallel, one tiny result per block): each block reports
   its first/last key and the value subtotal of those boundary runs.
3. **Driver fold** (O(#blocks), not O(rows)): because keys are
   contiguous, the only cross-block state is the carry of the single
   key that straddles each boundary — a scalar per block, never a
   per-key table.
4. **Pass 2** (parallel): vectorized within-block grouped cumsum /
   shifted lag, plus the boundary carry added to rows of the straddling
   key.  Results are re-assembled zero-copy via ``from_arrow_refs``.

Scale shape (100 TB): one sort + two streaming passes; driver state and
network traffic besides the sort are O(#blocks).  Skewed keys are fine —
a key spanning 50 blocks just threads a scalar carry through 50 summary
rows.  Raw ``ray.remote`` tasks are used deliberately: per-block
positional context (what came before this block) is exactly what
``map_batches`` cannot express (SURVEY.md §2.9 additions).

**Total-order requirement**: every scan here (``partitioned_cumsum``,
``partitioned_row_number``, ``partitioned_rolling_sum``,
``partitioned_lag``, ``partitioned_dense_rank``, ``ordered_collect``)
assumes ``[key, *order]`` totally orders the rows.  Ray's sort is not
stable, so with duplicate (key, order) tuples the per-row outputs
(which row gets which running value) are nondeterministic and can
diverge from a SQL oracle — pass enough order columns for uniqueness,
exactly as ``grouped_topk`` documents for its tiebreak.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pyarrow as pa
from ray.data import Dataset


def _as_arrow(block) -> pa.Table:
    if not isinstance(block, pa.Table):
        block = pa.Table.from_pandas(block)
    return block


def _ordered_refs(ds: Dataset, sort_cols: Sequence[str]):
    """Sorts and returns the materialized blocks' object refs in global
    order (empty blocks dropped)."""
    mat = ds.sort(list(sort_cols)).materialize()
    return [ref for bundle in mat.iter_internal_ref_bundles()
            for ref, meta in bundle.blocks if meta.num_rows]


def _key_array(tbl: pa.Table, key: str) -> np.ndarray:
    return tbl[key].to_numpy(zero_copy_only=False)


def _empty_with_scan_col(ds: Dataset, val: str, out_col: str) -> Dataset:
    """Empty-input path for the running-sum family: append an empty
    ``out_col`` whose type matches the non-empty kernels' numpy cumsum
    promotion of ``val`` (int32 → int64, float → float64, ...), so a
    downstream ``select_columns(out_col)`` works on empty inputs too."""
    def fn(t: pa.Table) -> pa.Table:
        v = t[val].to_numpy(zero_copy_only=False)
        return t.append_column(out_col, pa.array(np.cumsum(v)))
    return ds.map_batches(fn, batch_format="pyarrow")


def _empty_with_typed_col(ds: Dataset, out_col: str, typ) -> Dataset:
    """Empty-input path appending an empty column of an explicit type."""
    return ds.map_batches(
        lambda t: t.append_column(out_col, pa.array([], typ)),
        batch_format="pyarrow")


def _boundary_summary(block, key: str, val: str):
    """Pass-1 kernel: (first_key, last_key, subtotal of the first key's
    run, subtotal of the last key's run, block row count)."""
    t = _as_arrow(block)
    k = _key_array(t, key)
    v = t[val].to_numpy(zero_copy_only=False)
    fk, lk = k[0], k[-1]
    first_total = v[k == fk].sum().item()
    last_total = v[k == lk].sum().item()
    return fk, lk, first_total, last_total


def _grouped_cumsum(k: np.ndarray, v: np.ndarray, exclusive: bool):
    """Within-block per-key running sum over key-contiguous rows."""
    cs = np.cumsum(v)
    change = np.empty(len(k), dtype=bool)
    change[0] = True
    change[1:] = k[1:] != k[:-1]
    starts = np.flatnonzero(change)
    group_prior = np.where(starts > 0, cs[starts - 1], 0)
    sizes = np.diff(np.append(starts, len(k)))
    out = cs - np.repeat(group_prior, sizes)
    if exclusive:
        out = out - v
    return out


def _apply_cumsum(block, key: str, val: str, out_col: str,
                  boundary_key, carry, exclusive: bool) -> pa.Table:
    t = _as_arrow(block)
    k = _key_array(t, key)
    v = t[val].to_numpy(zero_copy_only=False)
    run = _grouped_cumsum(k, v, exclusive)
    if carry:
        run = run + carry * (k == boundary_key)
    return t.append_column(out_col, pa.array(run))


def partitioned_cumsum(ds: Dataset, key: str, order: Sequence[str],
                       val: str, out_col: str = "running_sum",
                       exclusive: bool = False) -> Dataset:
    """``sum(val) OVER (PARTITION BY key ORDER BY order ROWS UNBOUNDED
    PRECEDING)`` — inclusive by default; ``exclusive=True`` gives the
    "... AND 1 PRECEDING" frame with 0 (not NULL) for each partition's
    first row.  Requires
    ``[key, *order]`` to totally order rows (see module docstring)."""
    import ray
    import ray.data as rd

    refs = _ordered_refs(ds, [key, *order])
    if not refs:
        return _empty_with_scan_col(ds, val, out_col)
    summary = ray.remote(_boundary_summary)
    infos = ray.get([summary.remote(r, key, val) for r in refs])

    carries: List[tuple] = []       # (boundary_key, carry) per block
    carry_key, carry_val = None, 0
    for fk, lk, first_total, last_total in infos:
        c = carry_val if (carry_key is not None and fk == carry_key) else 0
        carries.append((fk, c))
        if fk == lk:                # whole block is one key: extend run
            carry_key, carry_val = lk, c + last_total
        else:
            carry_key, carry_val = lk, last_total

    apply = ray.remote(_apply_cumsum)
    out = [apply.remote(r, key, val, out_col, bk, cv, exclusive)
           for r, (bk, cv) in zip(refs, carries)]
    return rd.from_arrow_refs(out)


def partitioned_row_number(ds: Dataset, key: str, order: Sequence[str],
                           out_col: str = "row_number") -> Dataset:
    """``row_number() OVER (PARTITION BY key ORDER BY order)`` (1-based)
    — the running count is a partitioned cumsum of ones, so it reuses
    the same two-pass scan."""
    def ones(t: pa.Table) -> pa.Table:
        return t.append_column("__one",
                               pa.array(np.ones(t.num_rows, np.int64)))

    out = partitioned_cumsum(ds.map_batches(ones, batch_format="pyarrow"),
                             key, order, "__one", out_col,
                             exclusive=False)
    return out.map_batches(lambda t: t.drop_columns(["__one"]),
                           batch_format="pyarrow")


def grouped_topk(ds: Dataset, key: str, val: str, k: int,
                 tiebreak: Sequence[str] = (),
                 descending: bool = True) -> Dataset:
    """Top-``k`` rows per key by ``val`` (ties broken by ``tiebreak``
    columns ascending — pass enough columns for a total order, or the
    result is nondeterministic).

    Scale shape: a local per-block top-k prune (vectorized polars
    sort + group head) bounds what enters the exchange to ≤ k rows per
    key per block, then one ``groupby(key).map_groups`` finishes — the
    shuffle moves O(k · keys · blocks) rows, not the corpus.  The SQL
    equivalent is ``row_number() OVER (PARTITION BY key ORDER BY val
    DESC, tiebreak) <= k``."""
    import polars as pl

    order_cols = [val, *tiebreak]
    desc = [descending] + [False] * len(tiebreak)

    def local(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        df = pl.from_arrow(batch)
        out = (df.sort(order_cols, descending=desc)
               .group_by(key, maintain_order=True).head(k))
        return out.to_arrow().select(batch.column_names) \
            .cast(batch.schema)

    # final merge runs the SAME multi-key polars kernel once per COARSE
    # key partition (stages/partition.py) — UDF calls O(parts), not
    # O(|keys|); each key is fully contained in its partition
    from .partition import with_key_part
    pruned = ds.map_batches(local, batch_format="pyarrow")
    out = (with_key_part(pruned, key)
           .groupby("_kpart").map_groups(local, batch_format="pyarrow"))
    return out.map_batches(lambda t: t.drop_columns(["_kpart"]),
                           batch_format="pyarrow")


def _boundary_tail(block, key: str, val: str, n: int):
    """Pass-1 kernel for rolling windows: (first_key, last_key, last
    ≤ n values of the trailing key's run) — the only state a later
    block can need."""
    t = _as_arrow(block)
    k = _key_array(t, key)
    v = t[val].to_numpy(zero_copy_only=False)
    lk = k[-1]
    run = v[k == lk]
    return k[0], lk, run[-n:] if n else run[:0]


def _apply_rolling(block, key: str, val: str, out_col: str, window: int,
                   boundary_key, carry_vals) -> pa.Table:
    """Pass-2 kernel: windowed sum over key-contiguous rows, with
    ``carry_vals`` (≤ window−1 values) prepended to the first run when
    it continues ``boundary_key`` from the previous block."""
    t = _as_arrow(block)
    k = _key_array(t, key)
    v = t[val].to_numpy(zero_copy_only=False)
    m = len(carry_vals) if (boundary_key is not None
                            and len(k) and k[0] == boundary_key) else 0
    if m:
        k = np.concatenate([np.repeat(k[:1], m), k])
        v = np.concatenate([np.asarray(carry_vals, dtype=v.dtype), v])
    n = len(k)
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = k[1:] != k[:-1]
    starts = np.flatnonzero(change)
    sizes = np.diff(np.append(starts, n))
    run_start = np.repeat(starts, sizes)
    cs = np.cumsum(v)
    pos = np.arange(n) - run_start
    # inclusive within-run cumsum
    inc = cs - np.where(run_start > 0, cs[run_start - 1], 0)
    back = np.arange(n) - window
    valid = pos >= window
    prior = np.where(valid, inc[np.clip(back, 0, None)], 0)
    rolling = inc - prior
    out = rolling[m:]
    return t.append_column(out_col, pa.array(out))


def partitioned_rolling_sum(ds: Dataset, key: str, order: Sequence[str],
                            val: str, window: int,
                            out_col: str = "rolling_sum") -> Dataset:
    """``sum(val) OVER (PARTITION BY key ORDER BY order ROWS BETWEEN
    window-1 PRECEDING AND CURRENT ROW)``.  Use integer values for
    bit-exact oracle parity (float window sums are association-
    sensitive).  Cross-block state is the trailing ≤ window−1 values of
    each boundary key — bounded driver fold, same scan shape as
    :func:`partitioned_cumsum`.  Requires
    ``[key, *order]`` to totally order rows (see module docstring)."""
    import ray
    import ray.data as rd

    if window < 1:
        raise ValueError("window must be >= 1")
    refs = _ordered_refs(ds, [key, *order])
    if not refs:
        return _empty_with_scan_col(ds, val, out_col)
    summary = ray.remote(_boundary_tail)
    infos = ray.get([summary.remote(r, key, val, window - 1)
                     for r in refs])

    carries: List[tuple] = []
    carry_key, carry_tail = None, None
    for fk, lk, tail in infos:
        if carry_key is not None and fk == carry_key:
            carries.append((fk, carry_tail))
            if fk == lk:            # run continues through the block
                joined = np.concatenate([carry_tail, tail])
                carry_key, carry_tail = lk, joined[-(window - 1):] \
                    if window > 1 else joined[:0]
                continue
        else:
            carries.append((None, tail[:0]))
        carry_key, carry_tail = lk, tail

    apply = ray.remote(_apply_rolling)
    out = [apply.remote(r, key, val, out_col, window, bk, cv)
           for r, (bk, cv) in zip(refs, carries)]
    return rd.from_arrow_refs(out)


def _dense_summary(block, key: str, val: str):
    """Pass-1 kernel for dense_rank: boundary keys, their first/last
    values, and the distinct-value counts of the boundary runs."""
    t = _as_arrow(block)
    k = _key_array(t, key)
    v = t[val].to_numpy(zero_copy_only=False)
    fk, lk = k[0], k[-1]
    fv = v[k == fk]
    lv = v[k == lk]
    d_first = int(1 + (fv[1:] != fv[:-1]).sum()) if len(fv) else 0
    d_last = int(1 + (lv[1:] != lv[:-1]).sum()) if len(lv) else 0
    return fk, v[0], lk, v[-1], d_first, d_last


def _apply_dense(block, key: str, val: str, out_col: str,
                 boundary_key, carry_val, carry_rank) -> pa.Table:
    """Pass-2 kernel: within-block dense rank per key-contiguous run
    (input sorted by key, val), shifted by the boundary carry."""
    t = _as_arrow(block)
    k = _key_array(t, key)
    v = t[val].to_numpy(zero_copy_only=False)
    n = len(k)
    key_change = np.empty(n, dtype=bool)
    key_change[0] = True
    key_change[1:] = k[1:] != k[:-1]
    new_distinct = np.empty(n, dtype=bool)
    new_distinct[0] = True
    new_distinct[1:] = key_change[1:] | (v[1:] != v[:-1])
    rank = _grouped_cumsum(k, new_distinct.astype(np.int64),
                           exclusive=False)
    if boundary_key is not None and k[0] == boundary_key:
        adjust = carry_rank - (1 if v[0] == carry_val else 0)
        rank = rank + adjust * (k == boundary_key)
    return t.append_column(out_col, pa.array(rank))


def partitioned_dense_rank(ds: Dataset, key: str, val: str,
                           out_col: str = "dense_rank") -> Dataset:
    """``dense_rank() OVER (PARTITION BY key ORDER BY val)`` — carry is
    (last value, running dense rank) of each boundary key, so a value
    run crossing a block boundary does not double-count.  Requires
    ``[key, val]`` rows to have a deterministic order per rank (equal
    values share a rank, so only key/val matter here)."""
    import ray
    import ray.data as rd

    refs = _ordered_refs(ds, [key, val])
    if not refs:
        return _empty_with_typed_col(ds, out_col, pa.int64())
    summary = ray.remote(_dense_summary)
    infos = ray.get([summary.remote(r, key, val) for r in refs])

    carries: List[tuple] = []
    carry_key, carry_val, carry_rank = None, None, 0
    for fk, fv, lk, lv, d_first, d_last in infos:
        cont = carry_key is not None and fk == carry_key
        carries.append((fk, carry_val, carry_rank) if cont
                       else (None, None, 0))
        if cont and fk == lk:
            carry_rank = carry_rank + d_last \
                - (1 if fv == carry_val else 0)
        else:
            carry_rank = d_last
        carry_key, carry_val = lk, lv
    apply = ray.remote(_apply_dense)
    out = [apply.remote(r, key, val, out_col, bk, cv, cr)
           for r, (bk, cv, cr) in zip(refs, carries)]
    return rd.from_arrow_refs(out)


def _collect_fragments(block, blk_idx: int, key: str, col: str,
                       sep: str) -> pa.Table:
    """Collapses one sorted block to (key, fragment) rows — the ordered
    within-block concatenation, one row per key present."""
    import polars as pl
    t = _as_arrow(block)
    df = pl.from_arrow(t.select([key, col]))
    out = (df.group_by(key, maintain_order=True)
           .agg(pl.col(col).cast(pl.String).str.join(sep).alias("_frag")))
    frag = out.to_arrow()
    return pa.table({key: pa.compute.cast(frag[key],
                                          t.schema.field(key).type),
                     "_blk": pa.array(np.full(frag.num_rows, blk_idx,
                                              np.int64)),
                     "_frag": pa.compute.cast(frag["_frag"], pa.string())})


def ordered_collect(ds: Dataset, key: str, order: Sequence[str],
                    col: str, sep: str = ",",
                    out_col: str = "collected") -> Dataset:
    """``string_agg(col, sep ORDER BY order) GROUP BY key``.

    Same sorted-block shape as the scans: each block collapses to ONE
    fragment row per key it contains (vectorized polars group-join), so
    the final merge runs over #key-block fragments — tiny relative to
    the corpus — ordered by block index within each key.  Requires
    ``[key, *order]`` to totally order rows (see module docstring)."""
    import ray
    import ray.data as rd

    refs = _ordered_refs(ds, [key, *order])
    if not refs:
        # output schema is (key, out_col), not the input schema
        return ds.map_batches(
            lambda t: pa.table({key: t[key].slice(0, 0),
                                out_col: pa.array([], pa.string())}),
            batch_format="pyarrow")
    frag = ray.remote(_collect_fragments)
    frags = rd.from_arrow_refs(
        [frag.remote(r, i, key, col, sep) for i, r in enumerate(refs)])

    def merge(group: pa.Table) -> pa.Table:
        # multi-key merge per coarse partition: polars ordered group-join
        # over (key, _blk)-sorted fragments — no per-key Python
        import polars as pl
        if group.num_rows == 0:
            return pa.table({key: group[key].slice(0, 0),
                             out_col: pa.array([], pa.string())})
        df = (pl.from_arrow(group.select([key, "_blk", "_frag"]))
              .sort([key, "_blk"])
              .group_by(key, maintain_order=True)
              .agg(pl.col("_frag").str.join(sep).alias(out_col)))
        out = df.to_arrow()
        return pa.table({key: pa.compute.cast(
            out[key], group.schema.field(key).type),
            out_col: pa.compute.cast(out[out_col], pa.string())})

    from .partition import with_key_part
    return (with_key_part(frags, key)
            .groupby("_kpart").map_groups(merge, batch_format="pyarrow"))


def _boundary_last_row(block, key: str, val: str):
    t = _as_arrow(block)
    k = _key_array(t, key)
    return k[0], k[-1], t[val][-1].as_py()


def _apply_lag(block, key: str, val: str, out_col: str,
               prev_key, prev_val) -> pa.Table:
    t = _as_arrow(block)
    k = _key_array(t, key)
    col = t[val]
    lagged = col.slice(0, len(col) - 1) if len(col) > 1 else col.slice(0, 0)
    first = prev_val if (prev_key is not None and k[0] == prev_key) \
        else None
    head = pa.array([first], type=col.type)
    shifted = pa.concat_arrays([head, *(lagged.chunks
                                        if isinstance(lagged,
                                                      pa.ChunkedArray)
                                        else [lagged])])
    # null out rows where the key changes (each partition's first row)
    change = np.empty(len(k), dtype=bool)
    change[0] = False               # block head handled via prev_key above
    change[1:] = k[1:] != k[:-1]
    shifted = pa.compute.if_else(pa.array(~change), shifted,
                                 pa.nulls(len(k), col.type))
    return t.append_column(out_col, shifted)


def partitioned_lag(ds: Dataset, key: str, order: Sequence[str],
                    val: str, out_col: str = "lag") -> Dataset:
    """``lag(val) OVER (PARTITION BY key ORDER BY order)`` — NULL for
    each partition's first row.  Requires
    ``[key, *order]`` to totally order rows (see module docstring)."""
    import ray
    import ray.data as rd

    refs = _ordered_refs(ds, [key, *order])
    if not refs:
        return ds.map_batches(
            lambda t: t.append_column(out_col, t[val].slice(0, 0)),
            batch_format="pyarrow")
    summary = ray.remote(_boundary_last_row)
    infos = ray.get([summary.remote(r, key, val) for r in refs])

    prevs: List[tuple] = [(None, None)]
    for fk, lk, last_val in infos[:-1]:
        prevs.append((lk, last_val))

    apply = ray.remote(_apply_lag)
    out = [apply.remote(r, key, val, out_col, pk, pv)
           for r, (pk, pv) in zip(refs, prevs)]
    return rd.from_arrow_refs(out)
