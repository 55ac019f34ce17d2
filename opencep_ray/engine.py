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
                 num_partitions: int = 64):
        self.key_col = key_col
        self.ts_col = ts_col
        self.type_col = type_col
        self.type_fn = type_fn
        self.order_cols = tuple(order_cols)
        self.payload_cols = tuple(payload_cols) if payload_cols else None
        self.prob_col = prob_col
        self.num_partitions = num_partitions


def transcript_config(num_partitions: int = 64,
                      payload_cols: Optional[Sequence[str]] = None,
                      tool_as_type: bool = False) -> EngineConfig:
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
                        num_partitions=num_partitions)


# ---------------------------------------------------------------------------
# Emitters: how a PM becomes output rows


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
        events = []
        for e in ConversationEvaluator.primitive_events(pm, cp):
            p = e.payload
            events.append({n: p.get(n) for n in self._event_names})
        return {
            "pattern_id": pattern_id,
            self.cfg.key_col: key,
            "match_events": events,
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


class _Prep:
    """Vectorized pre-shuffle stage: project, derive type, prefilter,
    µs timestamps, deterministic partition id."""

    def __init__(self, cfg: EngineConfig, types_needed: frozenset,
                 num_partitions: int):
        self.cfg = cfg
        self.types_needed = list(types_needed)
        self.P = num_partitions

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
        ts_us = pc.cast(pc.cast(batch[self.cfg.ts_col], pa.timestamp("us")),
                        pa.int64())
        batch = batch.append_column("_ts_us", ts_us)
        key_hash = pl.from_arrow(batch[cfg.key_col]).hash(seed=0)
        part = (key_hash % self.P).cast(pl.Int32)
        return batch.append_column("_part", part.to_arrow())


class _PartitionCEP:
    """Per-partition stateful evaluation: sort by (key, ts, order), run a
    fresh ConversationEvaluator per key, emit matches."""

    def __init__(self, compiled: List[CompiledPattern], cfg: EngineConfig,
                 emitter):
        self.compiled = compiled
        self.cfg = cfg
        self.emitter = emitter
        self.__name__ = "PartitionCEP"  # Ray's map_groups wants a fn name

    def __call__(self, group: pa.Table) -> pa.Table:
        cfg = self.cfg
        if group.num_rows == 0:
            return pa.Table.from_pylist([], schema=self.emitter.schema())
        sort_keys = [(cfg.key_col, "ascending"), ("_ts_us", "ascending")]
        for c in cfg.order_cols:
            if c in group.column_names:
                sort_keys.append((c, "ascending"))
        idx = pc.sort_indices(group, sort_keys=sort_keys)
        group = group.take(idx)

        keys = group[cfg.key_col].to_pylist()
        types = group["_type"].to_pylist()
        ts_us = group["_ts_us"].to_pylist()
        probs = group[cfg.prob_col].to_pylist() if cfg.prob_col else None
        payload_names = [c for c in group.column_names
                         if c not in ("_type", "_ts_us", "_part")]
        if cfg.payload_cols is not None:
            payload_names = [c for c in payload_names
                             if c in cfg.payload_cols or c == cfg.key_col]
        cols = {}
        for c in payload_names:
            if c == cfg.ts_col:
                cols[c] = ts_us  # µs ints inside the evaluator
            else:
                cols[c] = group[c].to_pylist()
        col_items = list(cols.items())

        rows = []
        n = group.num_rows
        emit_row = self.emitter.row
        cp_by_id = {cp.pattern_id: cp for cp in self.compiled}
        i = 0
        while i < n:
            key = keys[i]
            j = i
            ev = ConversationEvaluator(self.compiled)
            while j < n and keys[j] == key:
                payload = {c: v[j] for c, v in col_items}
                ev.process(payload, types[j], ts_us[j],
                           probs[j] if probs else None)
                j += 1
            ev.eos()
            for pid, pm in ev.matches:
                rows.append(emit_row(pid, key, pm, cp_by_id[pid], ev))
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
        self.compiled = compile_patterns(patterns)
        self.types_needed = frozenset(
            t for cp in self.compiled for t in cp.routes)
        self.emitter = emitter

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

        The pre-shuffle ``repartition`` splits blocks (no row movement) so
        the sort emits ~``num_partitions`` blocks — otherwise the group
        stage's parallelism is capped at the input file count."""
        emitter = self._emitter_for(ds.schema().base_schema)
        prep = _Prep(self.cfg, self.types_needed, self.cfg.num_partitions)
        evaluate = _PartitionCEP(self.compiled, self.cfg, emitter)
        return (ds.map_batches(prep, batch_format="pyarrow")
                .repartition(self.cfg.num_partitions)
                .groupby("_part")
                .map_groups(evaluate, batch_format="pyarrow"))

    def run_table(self, table: pa.Table) -> pa.Table:
        """Single-process path (tests, tiny inputs): identical semantics,
        no Ray session required."""
        emitter = self._emitter_for(table.schema)
        prep = _Prep(self.cfg, self.types_needed, self.cfg.num_partitions)
        prepped = prep(table)
        evaluate = _PartitionCEP(self.compiled, self.cfg, emitter)
        parts = []
        if prepped.num_rows:
            for p in pc.unique(prepped["_part"]).to_pylist():
                sub = prepped.filter(pc.equal(prepped["_part"], p))
                parts.append(evaluate(sub))
        if not parts:
            return pa.Table.from_pylist([], schema=emitter.schema())
        return pa.concat_tables(parts)
