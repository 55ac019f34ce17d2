"""HyperCube data-parallel CEP: attribute-grid partitioning for patterns
whose events do NOT share a single partition key.

Semantics from the reference's HyperCube algorithm
(``/root/reference/parallel/data_parallel/HyperCubeParallelExecutionAlgorithm.py:16-113``,
routing snapshots in ``test/ParallelTests.py:15-330``): each pattern leaf
gets one axis of a grid; an event is routed to every cell whose
coordinate on that leaf's axis equals the hash of the event's declared
attribute (replication factor = product of the other axis sizes).  Any
event combination then meets in at least its OWNER cell — the cell whose
coordinates are exactly the combination's per-leaf hashes — so each cell
runs ordinary CEP and emits a match only when it owns it (min-owner
dedup; same-type leaves make a combination visible in non-owner cells).

This is the scale-out story for key-less joins (e.g. ``AND(a, b)`` with
only an inequality between ``a`` and ``b``) where GroupByKey has no key
to partition on.  Kleene closure and negation are out of scope here —
aggregated/absent events have no single owning coordinate (the reference
restricts HyperCube to flat patterns the same way).

Ray Data shape: ``map_batches(_HyperPrep)`` (vectorized hash + cell
replication) → ``groupby("_cell").map_groups(_CellCEP)``.  The grid size
bounds replication: an event of leaf ``i`` is copied ``C / k_i`` times,
so total shuffle volume is ``Σ_i n_i · C / k_i`` — choose axis sizes so
this matches the cluster's core count, exactly like the reference's
``units_number``.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .engine import EngineConfig, extract_sorted_columns
from .evaluator import ConversationEvaluator, compile_patterns
from .pattern import Composite, Kleene, Neg, Pattern, Primitive


class _HyperPrep:
    """Vectorized routing: per leaf, hash its attribute into its axis and
    replicate the row into every cell sharing that coordinate.  Also
    stamps per-leaf coordinate columns ``_c_<name>`` so owner checks at
    match time reuse the routing hashes verbatim."""

    def __init__(self, leaves, axes, cfg: EngineConfig):
        # leaves: [(name, event_type, attr)] in axis order
        self.leaves = leaves
        self.axes = axes                    # [k_0, ..., k_{D-1}]
        self.cfg = cfg
        D = len(axes)
        self.C = int(np.prod(axes))
        # strides for linear cell ids: cell = Σ coord_i * stride_i
        self.strides = [int(np.prod(axes[i + 1:])) for i in range(D)]
        # cells_by_coord[i][v] = all cell ids with coord_i == v
        base = np.arange(self.C, dtype=np.int64)
        self.cells_by_coord = []
        for i, k in enumerate(axes):
            coord = (base // self.strides[i]) % k
            self.cells_by_coord.append(
                np.stack([base[coord == v] for v in range(k)]))

    def _hash_col(self, batch: pa.Table, attr: str, k: int) -> np.ndarray:
        import polars as pl
        h = pl.from_arrow(batch[attr]).hash(seed=0).to_numpy()
        return (h % np.uint64(k)).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        typ = pc.cast(batch[cfg.type_col], pa.string())
        batch = batch.append_column("_type", typ)
        ts_us = pc.cast(pc.cast(batch[cfg.ts_col], pa.timestamp("us")),
                        pa.int64())
        batch = batch.append_column("_ts_us", ts_us)
        # per-leaf coordinate columns (−1 where the type differs)
        coords = []
        for i, (name, etype, attr) in enumerate(self.leaves):
            mask = pc.equal(typ, etype).to_numpy(zero_copy_only=False)
            c = np.full(batch.num_rows, -1, dtype=np.int64)
            if mask.any():
                c[mask] = self._hash_col(batch, attr, self.axes[i])[mask]
            coords.append(c)
            batch = batch.append_column(f"_c_{name}",
                                        pa.array(c, pa.int64()))
        # replicate: one copy per (leaf whose type matches) per cell
        # sharing that leaf's coordinate
        take_idx, cells = [], []
        for i, (name, etype, attr) in enumerate(self.leaves):
            rows = np.flatnonzero(coords[i] >= 0)
            if not len(rows):
                continue
            fan = self.cells_by_coord[i][coords[i][rows]]   # (n, C/k_i)
            take_idx.append(np.repeat(rows, fan.shape[1]))
            cells.append(fan.reshape(-1))
        if not take_idx:
            out = batch.slice(0, 0)
            return out.append_column("_cell", pa.array([], pa.int64()))
        take_idx = np.concatenate(take_idx)
        cells = np.concatenate(cells)
        # an event matching several leaves lands in a cell once per leaf;
        # dedupe (row, cell) so the cell's evaluator sees it once
        pair = take_idx * self.C + cells
        uniq = np.unique(pair)
        take_idx = uniq // self.C
        cells = uniq % self.C
        out = batch.take(pa.array(take_idx))
        return out.append_column("_cell", pa.array(cells, pa.int64()))


class _CellCEP:
    """Per-cell evaluation + min-owner match dedup."""

    def __init__(self, compiled, cfg: EngineConfig, emitter, leaves,
                 strides):
        self.compiled = compiled
        self.cfg = cfg
        self.emitter = emitter
        self.leaves = leaves
        self.strides = strides
        self.__name__ = "CellCEP"

    def __call__(self, group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.Table.from_pylist([], schema=self.emitter.schema())
        cell = int(group["_cell"][0].as_py())
        cfg = self.cfg
        sort_keys = [("_ts_us", "ascending")] + \
            [(c, "ascending") for c in cfg.order_cols
             if c in group.column_names]
        group = group.take(pc.sort_indices(group, sort_keys=sort_keys))
        types = group["_type"].to_pylist()
        ts_us = group["_ts_us"].to_pylist()
        payload_names = [c for c in group.column_names
                         if c not in ("_type", "_ts_us", "_cell")]
        ptable = group.select(payload_names)
        if cfg.ts_col in payload_names:
            ptable = ptable.set_column(
                payload_names.index(cfg.ts_col), cfg.ts_col,
                group["_ts_us"])
        payloads = ptable.to_pylist()
        ev = ConversationEvaluator(self.compiled)
        n = group.num_rows
        for j in range(n):
            ev.process(payloads[j], types[j], ts_us[j])
        ev.eos()
        rows = []
        emit_row = self.emitter.row
        for cp, pm in ev.matches:
            binding = {}
            for k, e in pm.entries:
                for name in cp.entry_names[k]:
                    binding[name] = e.payload
            owner = 0
            for i, (name, _etype, _attr) in enumerate(self.leaves):
                owner += int(binding[name][f"_c_{name}"]) * self.strides[i]
            if owner != cell:
                continue  # another cell owns this combination
            rows.append(emit_row(cp.pattern_id, cell, pm, cp, ev))
        return pa.Table.from_pylist(rows, schema=self.emitter.schema())


class HyperCubeCEP:
    """Engine façade for attribute-grid parallel evaluation.

    ``axes`` maps each leaf NAME to ``(attribute, axis_size)``; every
    positive primitive leaf of the pattern must appear.  The pattern must
    be a flat SEQ/AND of primitives (no Kleene / negation)."""

    def __init__(self, pattern: Pattern,
                 axes: Dict[str, Tuple[str, int]],
                 cfg: Optional[EngineConfig] = None, emitter=None):
        self.cfg = cfg or EngineConfig()
        structure = pattern.structure
        if not isinstance(structure, Composite) or any(
                not isinstance(a, Primitive) for a in structure.args):
            raise ValueError(
                "HyperCube supports flat SEQ/AND of primitives only "
                "(Kleene/negation have no single owning coordinate)")
        self.compiled = compile_patterns(pattern)
        leaves = []
        for a in structure.args:
            if a.name not in axes:
                raise ValueError(f"no axis declared for leaf {a.name!r}")
            attr, k = axes[a.name]
            leaves.append((a.name, a.event_type, attr))
        self.leaves = leaves
        self.axes = [axes[name][1] for name, _, _ in leaves]
        self.emitter = emitter
        self.prep = _HyperPrep(self.leaves, self.axes, self.cfg)

    def _emitter_for(self, schema: pa.Schema):
        if self.emitter is not None:
            return self.emitter
        from .engine import MatchesEmitter
        # the synthetic grid key is an int64 cell id produced by _HyperPrep
        # and absent from the input schema — declare it explicitly so the
        # emitter's key field is int64, not the string default (ADVICE r2)
        fields = [f for f in schema if f.name != "_cell"]
        fields.append(pa.field("_cell", pa.int64()))
        key_cfg = EngineConfig(key_col="_cell", ts_col=self.cfg.ts_col,
                               type_col=self.cfg.type_col,
                               order_cols=self.cfg.order_cols)
        return MatchesEmitter(key_cfg, pa.schema(fields))

    def run(self, ds):
        emitter = self._emitter_for(ds.schema().base_schema)
        evaluate = _CellCEP(self.compiled, self.cfg, emitter, self.leaves,
                            self.prep.strides)
        return (ds.map_batches(self.prep, batch_format="pyarrow")
                .groupby("_cell", num_partitions=min(self.prep.C, 64))
                .map_groups(evaluate, batch_format="pyarrow"))

    def run_table(self, table: pa.Table) -> pa.Table:
        """Single-process path (tests): identical semantics."""
        emitter = self._emitter_for(table.schema)
        evaluate = _CellCEP(self.compiled, self.cfg, emitter, self.leaves,
                            self.prep.strides)
        prepped = self.prep(table)
        parts = []
        if prepped.num_rows:
            for c in pc.unique(prepped["_cell"]).to_pylist():
                sub = prepped.filter(pc.equal(prepped["_cell"], c))
                parts.append(evaluate(sub))
        if not parts:
            return pa.Table.from_pylist([], schema=emitter.schema())
        return pa.concat_tables(parts)
