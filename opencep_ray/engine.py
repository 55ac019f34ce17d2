"""Batch CEP engine on Ray Data.

Pipeline shape (SURVEY.md §3.4):

.. code-block::

    read_parquet(transcripts)
      └─ map_batches(_Prep)            # vectorized: project columns, derive
      │                                 #   event type, prefilter to types the
      │                                 #   patterns use, int64 µs timestamps,
      │                                 #   deterministic hash partition id
      └─ groupby(_part).map_groups(_PartitionCEP)
      │                                 # ONE hash shuffle on the partition id;
      │                                 #   inside: sort by (key, ts, order),
      │                                 #   per-key incremental tree evaluation
      └─ matches table (Dataset)

Scale design notes:

* the only all-to-all exchange is the single ``groupby`` on ``_part`` —
  the partition count is fixed and small (default 2–4 × CPUs), matches
  never cross keys (GroupByKey contract, reference
  ``parallel/data_parallel/GroupByKeyParallelExecutionAlgorithm.py:13-21``),
  so partition evaluation is embarrassingly parallel;
* the type prefilter happens **before** the shuffle, so only events whose
  types appear in some pattern are shuffled;
* the partition id is a deterministic polars hash — stable across workers,
  batches and runs (plain ``hash()`` is salted per process and must never
  be used here);
* each group is evaluated with vectorized column extraction and a tight
  per-conversation Python loop bounded by the pattern window.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .evaluator import (INDEX_ATTR, CompiledPattern, ConversationEvaluator,
                        compile_patterns)
from .pattern import Pattern


class EngineConfig:
    """Column mapping of the input table.

    ``type_col``: the column holding the event type (reference
    ``EventTypeClassifier``, base/DataFormatter.py:4-15).  ``type_fn`` may
    instead derive the type vectorized from a batch (e.g. role-or-tool for
    transcripts).  ``order_cols`` break timestamp ties to fix arrival order
    (the reference's global arrival counter, base/Event.py:13-27).
    """

    def __init__(self, key_col: str = "conv_id", ts_col: str = "ts",
                 type_col: str = "role",
                 type_fn: Optional[Callable[[pa.Table], pa.Array]] = None,
                 order_cols: Sequence[str] = ("turn_idx",),
                 payload_cols: Optional[Sequence[str]] = None,
                 prob_col: Optional[str] = None,
                 num_partitions: int = 64,
                 hot_keys: Optional[Sequence] = None,
                 slice_multiple: int = 12,
                 vector_pushdown: bool = True,
                 hash_shuffle: bool = False,
                 share: "Optional[str]" = None,
                 storage=None):
        self.key_col = key_col
        self.ts_col = ts_col
        self.type_col = type_col
        self.type_fn = type_fn
        self.order_cols = tuple(order_cols)
        self.payload_cols = tuple(payload_cols) if payload_cols else None
        self.prob_col = prob_col
        self.num_partitions = num_partitions
        # skew handling: hot keys are split into time slices of
        # ``slice_multiple × max-window`` with one-window overlap; a match
        # is emitted only by its owner slice (first-owner-wins invariant,
        # reference parallel/data_parallel/RIPParallelExecutionAlgorithm.py:45-52)
        self.hot_keys = frozenset(hot_keys) if hot_keys else frozenset()
        self.slice_multiple = slice_multiple
        # vectorized pushdown of declarative leaf conditions pre-shuffle
        self.vector_pushdown = vector_pushdown
        # multi-pattern plan sharing: None | "leaves" | "subtrees" |
        # "local_search" | "auto" — "auto" self-tunes via the tabu-search
        # cost model (evaluator.ConversationEvaluator docstring;
        # cost-only, results invariant, disabled with consumption
        # policies)
        self.share = share
        # per-compilation storage knobs (evaluator.StorageConfig — the
        # TreeStorageParameters analog); None = engine defaults
        self.storage = storage
        # exchange strategy for the batch engine's one shuffle: sort-based
        # (default; cheapest at small scale) or Ray's hash-shuffle operator
        # (aggregator actor pool, pipelined — no all-to-all sort barrier;
        # preferable on long-running large jobs where actor startup
        # amortizes)
        self.hash_shuffle = hash_shuffle


def transcript_config(num_partitions: int = 64,
                      payload_cols: Optional[Sequence[str]] = None,
                      tool_as_type: bool = False,
                      hot_keys: Optional[Sequence] = None) -> EngineConfig:
    """Config for the canonical transcripts table (BASELINE input_hint).
    With ``tool_as_type`` the event type is the tool name on tool turns and
    the role otherwise."""
    type_fn = None
    if tool_as_type:
        def type_fn(batch: pa.Table) -> pa.Array:
            return pc.coalesce(batch["tool"], batch["role"])
    return EngineConfig(key_col="conv_id", ts_col="ts", type_col="role",
                        type_fn=type_fn, order_cols=("turn_idx",),
                        payload_cols=payload_cols,
                        num_partitions=num_partitions,
                        hot_keys=hot_keys)


# ---------------------------------------------------------------------------
# Emitters: how a PM becomes output rows


def detect_hot_keys(ds, key_col: str, threshold_rows: int = 100_000,
                    top_k: int = 64):
    """Pre-pass hot-key detector: per-key counts via partial aggregation
    (one small shuffle of (key, count) partials), returning keys whose
    event count exceeds ``threshold_rows`` (capped at ``top_k``).  Feed
    the result into ``EngineConfig(hot_keys=...)``."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl
        return (pl.from_arrow(batch.select([key_col]))
                .group_by(key_col).agg(pl.len().cast(pl.Int64).alias("_n"))
                .to_arrow())

    counts = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(key_col).aggregate(Sum("_n", alias_name="n")))
    # expression filter: vectorized, never a per-row Python call
    hot = counts.filter(expr=f"n >= {int(threshold_rows)}") \
        .sort("n", descending=True).limit(top_k).to_pandas()
    return frozenset(hot[key_col].tolist())


class MatchesEmitter:
    """Canonical matches table: ``pattern_id, <key>, match_events
    list<struct<payload columns>>, first_ts, last_ts, probability``
    (FIXTURES.md §4).  Per-turn payloads survive byte-identically."""

    def __init__(self, cfg: EngineConfig, payload_schema: pa.Schema):
        fields = [f for f in payload_schema
                  if f.name not in (cfg.key_col,)]
        self.event_struct = pa.struct(fields)
        self.cfg = cfg
        key_field = payload_schema.field(cfg.key_col) \
            if cfg.key_col in payload_schema.names \
            else pa.field(cfg.key_col, pa.string())
        self.out_schema = pa.schema([
            pa.field("pattern_id", pa.int32()),
            key_field,
            pa.field("match_events", pa.list_(self.event_struct)),
            pa.field("first_ts", pa.timestamp("us")),
            pa.field("last_ts", pa.timestamp("us")),
            pa.field("probability", pa.float64()),
        ])
        self._event_names = [f.name for f in fields]
        self._ts_col = cfg.ts_col

    def schema(self) -> pa.Schema:
        return self.out_schema

    def row(self, pattern_id: int, key, pm, cp: CompiledPattern,
            evaluator) -> dict:
        # payload dicts go in as-is: Arrow's struct conversion projects to
        # the schema fields and ignores extra keys (the hidden arrival
        # index, partition columns), so no per-event dict copies are made
        return {
            "pattern_id": pattern_id,
            self.cfg.key_col: key,
            "match_events": [
                e.payload
                for e in ConversationEvaluator.primitive_events(pm, cp)],
            "first_ts": pm.first_ts,
            "last_ts": pm.last_ts,
            "probability": pm.prob,
        }


class BindingsEmitter:
    """Flat projection of match bindings — one output column per extractor.
    Used for SQL-comparable query outputs (driver oracle checks)."""

    def __init__(self, columns: Dict[str, Callable],
                 schema: pa.Schema):
        """``columns``: name -> fn(binding, pm) where binding maps event
        names to payload dicts (lists of payloads for Kleene names)."""
        self.columns = columns
        self.out_schema = schema

    def schema(self) -> pa.Schema:
        return self.out_schema

    def row(self, pattern_id: int, key, pm, cp: CompiledPattern,
            evaluator) -> dict:
        binding = {}
        for k, e in pm.entries:
            content = e.content()
            for name in cp.entry_names[k]:
                binding[name] = content
        return {name: fn(binding, pm) for name, fn in self.columns.items()}


# ---------------------------------------------------------------------------
# Stage callables (picklable; shipped to workers once)


_SLICE_MIX = np.uint64(0x9E3779B97F4A7C15)

_PC_OPS = {
    "==": pc.equal, "!=": pc.not_equal, ">": pc.greater,
    ">=": pc.greater_equal, "<": pc.less, "<=": pc.less_equal,
}


def build_type_prefilters(compiled) -> Dict[str, list]:
    """Vectorized leaf-condition pushdown: for event types where EVERY
    leaf (across all patterns) carries only declarative Col-vs-constant
    conditions, rows are kept iff at least one leaf would accept them —
    evaluated with pyarrow.compute BEFORE the shuffle.  Types with any
    non-declarative (Python-lambda) or unconditioned leaf are left
    untouched."""
    # contiguity compares arrival indices, which are assigned to every
    # routed event BEFORE leaf conditions — dropping rows pre-assignment
    # would change adjacency, so pushdown is disabled wholesale then
    if any(getattr(cp, "has_contiguity", False) for cp in compiled):
        return {}
    by_type: Dict[str, list] = {}
    for cp in compiled:
        for lf in cp.leaves:
            by_type.setdefault(lf.event_type, []).append(
                cp.leaf_vector_specs[lf.leaf_id])
    out = {}
    for t, specs in by_type.items():
        if any(s is None or len(s) == 0 for s in specs):
            continue
        out[t] = specs
    return out


class _Prep:
    """Vectorized pre-shuffle stage: project, derive type, prefilter,
    µs timestamps, deterministic partition id.

    Hot keys (``cfg.hot_keys``) are split into time slices of
    ``slice_len_us`` with a one-window overlap: each hot row is assigned
    its own slice and, when it falls within one window after a slice
    boundary, duplicated into the previous slice.  Every ≤window match is
    then fully contained in its owner slice (the slice of its first
    timestamp) and emitted exactly once — the RIP invariant."""

    def __init__(self, cfg: EngineConfig, types_needed: frozenset,
                 num_partitions: int, max_window_us: int = 0,
                 type_prefilters: Optional[Dict[str, list]] = None):
        self.cfg = cfg
        self.types_needed = list(types_needed)
        self.P = num_partitions
        self.max_window_us = max_window_us
        self.slice_len_us = max(1, cfg.slice_multiple * max_window_us)
        self.type_prefilters = type_prefilters or {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl
        cfg = self.cfg
        if cfg.type_fn is not None:
            typ = cfg.type_fn(batch)
            if not isinstance(typ, (pa.Array, pa.ChunkedArray)):
                typ = pa.array(typ)
        else:
            typ = batch[cfg.type_col]
        batch = batch.append_column("_type", pc.cast(typ, pa.string())) \
            if "_type" not in batch.column_names else batch
        mask = pc.is_in(batch["_type"],
                        value_set=pa.array(self.types_needed, pa.string()))
        batch = batch.filter(mask)
        if self.type_prefilters and batch.num_rows:
            batch = self._apply_prefilters(batch)
        ts_us = pc.cast(pc.cast(batch[self.cfg.ts_col], pa.timestamp("us")),
                        pa.int64())
        batch = batch.append_column("_ts_us", ts_us)

        # project to the declared column contract BEFORE the shuffle:
        # with payload_cols set, conditions/emitters only ever touch
        # payload_cols ∪ {key, order, prob}, so everything else (e.g. a
        # wide text column) would be shuffled for nothing
        if cfg.payload_cols is not None:
            need = {cfg.key_col, "_type", "_ts_us", *cfg.order_cols,
                    *cfg.payload_cols}
            if cfg.prob_col:
                need.add(cfg.prob_col)
            keep = [c for c in batch.column_names if c in need]
            if len(keep) < batch.num_columns:
                batch = batch.select(keep)

        n = batch.num_rows
        ts_np = ts_us.to_numpy() if n else np.empty(0, dtype=np.int64)
        slice_arr = np.full(n, -1, dtype=np.int64)
        if cfg.hot_keys and n:
            L = self.slice_len_us
            hot_mask = pc.is_in(
                batch[cfg.key_col],
                value_set=pa.array(list(cfg.hot_keys))).to_numpy(
                    zero_copy_only=False)
            if hot_mask.any():
                s1 = ts_np // L
                slice_arr[hot_mask] = s1[hot_mask]
                # overlap BOTH ways: a slice must see one full window on
                # each side of its boundaries — backward copies let a match
                # started near a boundary complete in the earlier owner
                # slice; forward copies let leading/unbounded NEGATIVES
                # (which look backward from a match's first_ts,
                # tree/nodes/NegationNode.py:246-250) reach the later slice
                s2 = (ts_np - self.max_window_us) // L
                s3 = (ts_np + self.max_window_us) // L
                extra = []
                for s_alt in (s2, s3):
                    dup_idx = np.flatnonzero(hot_mask & (s_alt != s1))
                    if len(dup_idx):
                        dup = batch.take(pa.array(dup_idx))
                        dup = dup.append_column(
                            "_slice", pa.array(s_alt[dup_idx], pa.int64()))
                        extra.append(dup)
                if extra:
                    batch = batch.append_column(
                        "_slice", pa.array(slice_arr, pa.int64()))
                    batch = pa.concat_tables([batch] + extra)
                    return self._with_part(batch)
        batch = batch.append_column("_slice", pa.array(slice_arr, pa.int64()))
        return self._with_part(batch)

    def _apply_prefilters(self, batch: pa.Table) -> pa.Table:
        """Drops rows no leaf of their type would accept (nulls compare
        false, as in SQL — the Python path would raise on None instead,
        so dropped-before-raise is strictly more permissive)."""
        keep = None
        type_arr = batch["_type"]
        for t, leaf_specs in self.type_prefilters.items():
            if any(attr not in batch.column_names
                   for conjs in leaf_specs for attr, _, _ in conjs):
                continue
            is_t = pc.equal(type_arr, t)
            if not pc.any(is_t).as_py():
                continue
            accept = None
            for conjs in leaf_specs:
                conj_mask = None
                for attr, op, const in conjs:
                    m = _PC_OPS[op](batch[attr], const)
                    conj_mask = m if conj_mask is None \
                        else pc.and_kleene(conj_mask, m)
                accept = conj_mask if accept is None \
                    else pc.or_kleene(accept, conj_mask)
            accept = pc.fill_null(accept, False)
            row_keep = pc.or_(pc.invert(is_t), accept)
            keep = row_keep if keep is None else pc.and_(keep, row_keep)
        if keep is not None:
            batch = batch.filter(pc.fill_null(keep, False))
        return batch

    def _with_part(self, batch: pa.Table) -> pa.Table:
        import polars as pl
        key_hash = pl.from_arrow(batch[self.cfg.key_col]) \
            .hash(seed=0).to_numpy().astype(np.uint64)
        slices = batch["_slice"].to_numpy().astype(np.int64)
        mixed = key_hash + (slices + 1).astype(np.uint64) * _SLICE_MIX
        part = (mixed % np.uint64(self.P)).astype(np.int32)
        return batch.append_column("_part", pa.array(part))


def extract_sorted_columns(shard: pa.Table, cfg: EngineConfig):
    """Shared shard preparation for both engines: stable sort by
    (key, slice, ts, order), then plain-Python column extraction for the
    evaluation loop.  Returns (keys, slices, types, ts_us, probs,
    payloads) — ``payloads`` is one dict per event, with the ts column
    already in µs ints.  The dicts are built in ONE Arrow C pass
    (``Table.to_pylist``) instead of a per-event Python comprehension —
    the per-row dict construction was the last per-event Python cost in
    shard prep (round-2 verdict item #1)."""
    sort_keys = [(cfg.key_col, "ascending")]
    if "_slice" in shard.column_names:
        sort_keys.append(("_slice", "ascending"))
    sort_keys.append(("_ts_us", "ascending"))
    for c in cfg.order_cols:
        if c in shard.column_names:
            sort_keys.append((c, "ascending"))
    shard = shard.take(pc.sort_indices(shard, sort_keys=sort_keys))

    keys = shard[cfg.key_col].to_pylist()
    slices = shard["_slice"].to_numpy().tolist() \
        if "_slice" in shard.column_names else None
    types = shard["_type"].to_pylist()
    ts_us = shard["_ts_us"].to_pylist()
    probs = shard[cfg.prob_col].to_pylist() if cfg.prob_col else None
    payload_names = [c for c in shard.column_names
                     if c not in ("_type", "_ts_us", "_part", "_slice")]
    if cfg.payload_cols is not None:
        payload_names = [c for c in payload_names
                         if c in cfg.payload_cols or c == cfg.key_col]
    ptable = shard.select(payload_names)
    if cfg.ts_col in payload_names:
        ptable = ptable.set_column(
            payload_names.index(cfg.ts_col), cfg.ts_col, shard["_ts_us"])
    payloads = ptable.to_pylist()
    return keys, slices, types, ts_us, probs, payloads


class _PartitionCEP:
    """Per-partition stateful evaluation: sort by (key, ts, order), run a
    fresh ConversationEvaluator per key, emit matches."""

    def __init__(self, compiled: List[CompiledPattern], cfg: EngineConfig,
                 emitter, slice_len_us: int = 1):
        self.compiled = compiled
        self.cfg = cfg
        self.emitter = emitter
        self.slice_len_us = slice_len_us
        self.__name__ = "PartitionCEP"  # Ray's map_groups wants a fn name

    def __call__(self, group: pa.Table) -> pa.Table:
        cfg = self.cfg
        if group.num_rows == 0:
            return pa.Table.from_pylist([], schema=self.emitter.schema())
        # suspend automatic cyclic GC for the evaluation loop: PM/Ev
        # allocations are cycle-free (refcount-reclaimed) but tick the
        # gen0 counter, so auto-GC rescans live state constantly
        # (measured 25-35 % of shard wall time; see _StreamWorker)
        import gc
        gc_was_enabled = gc.isenabled()
        if gc_was_enabled:
            gc.disable()
        try:
            return self._eval(group)
        finally:
            if gc_was_enabled:
                gc.enable()

    def _eval(self, group: pa.Table) -> pa.Table:
        cfg = self.cfg
        keys, slices, types, ts_us, probs, payloads = \
            extract_sorted_columns(group, cfg)

        rows = []
        n = group.num_rows
        emit_row = self.emitter.row
        L = self.slice_len_us
        i = 0
        ev = None
        while i < n:
            key = keys[i]
            cur_slice = int(slices[i]) if slices is not None else -1
            j = i
            # one evaluator, reset per conversation (pooling: wiring is
            # conversation-independent and dominates short conversations)
            if ev is None:
                ev = ConversationEvaluator(self.compiled, share=cfg.share)
            else:
                ev.reset()
            while j < n and keys[j] == key and \
                    (slices is None or slices[j] == cur_slice):
                ev.process(payloads[j], types[j], ts_us[j],
                           probs[j] if probs else None)
                j += 1
            ev.eos()
            for cp, pm in ev.matches:
                if cur_slice >= 0 and pm.first_ts // L != cur_slice:
                    continue  # another slice owns this match (RIP dedup)
                rows.append(emit_row(cp.pattern_id, key, pm, cp, ev))
            i = j
        return pa.Table.from_pylist(rows, schema=self.emitter.schema())


# ---------------------------------------------------------------------------
# Public engine


class CEP:
    """The engine façade, mirroring the reference's ``CEP`` entry point
    (``/root/reference/CEP.py:19-32``) but over Ray Data Datasets."""

    def __init__(self, patterns, cfg: Optional[EngineConfig] = None,
                 emitter=None):
        self.cfg = cfg or EngineConfig()
        self.compiled = compile_patterns(patterns, storage=self.cfg.storage)
        self.types_needed = frozenset(
            t for cp in self.compiled for t in cp.routes)
        self.max_window_us = max(cp.window_us for cp in self.compiled)
        self.emitter = emitter

    def _prefilters(self):
        return build_type_prefilters(self.compiled) \
            if self.cfg.vector_pushdown else {}

    def _emitter_for(self, schema: pa.Schema):
        if self.emitter is not None:
            return self.emitter
        cols = [c for c in schema.names]
        payload_fields = []
        for name in cols:
            f = schema.field(name)
            if self.cfg.payload_cols is not None \
                    and name != self.cfg.key_col \
                    and name not in self.cfg.payload_cols:
                continue
            payload_fields.append(f)
        return MatchesEmitter(self.cfg, pa.schema(payload_fields))

    def run(self, ds):
        """Dataset → Dataset of matches (lazy; one shuffle).

        ``num_partitions`` selects Ray Data's HASH shuffle (aggregator
        actors, pipelined with the map stage) instead of the sort-based
        exchange — no all-to-all sort barrier, no empty boundary
        partitions, and group parallelism independent of the input file
        count."""
        emitter = self._emitter_for(ds.schema().base_schema)
        prep = _Prep(self.cfg, self.types_needed, self.cfg.num_partitions,
                     self.max_window_us, self._prefilters())
        evaluate = _PartitionCEP(self.compiled, self.cfg, emitter,
                                 prep.slice_len_us)
        if self.cfg.hash_shuffle:
            from .stages import use_hash_shuffle
            ds = use_hash_shuffle(ds)
        return (ds.map_batches(prep, batch_format="pyarrow")
                .groupby("_part", num_partitions=self.cfg.num_partitions)
                .map_groups(evaluate, batch_format="pyarrow"))

    def run_table(self, table: pa.Table) -> pa.Table:
        """Single-process path (tests, tiny inputs): identical semantics,
        no Ray session required."""
        emitter = self._emitter_for(table.schema)
        prep = _Prep(self.cfg, self.types_needed, self.cfg.num_partitions,
                     self.max_window_us, self._prefilters())
        prepped = prep(table)
        evaluate = _PartitionCEP(self.compiled, self.cfg, emitter,
                                 prep.slice_len_us)
        parts = []
        if prepped.num_rows:
            for p in pc.unique(prepped["_part"]).to_pylist():
                sub = prepped.filter(pc.equal(prepped["_part"], p))
                parts.append(evaluate(sub))
        if not parts:
            return pa.Table.from_pylist([], schema=emitter.schema())
        return pa.concat_tables(parts)
