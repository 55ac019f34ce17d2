"""Streaming CEP engine: micro-batches → stateful actor pool → exactly-once
Parquet sink with checkpointed offsets and per-partition lineage.

This is the scale path of the engine (SURVEY.md §3.4 / §7.1 steps 4–5):

* the input is an ordered, partitioned log (Parquet files read as
  deterministic micro-batches);
* each micro-batch is hash-routed by the conversation key to one of
  ``num_workers`` stateful actors; actor tasks execute in submission order,
  so per-conversation arrival order is preserved end-to-end (the
  GroupByKey contract, reference
  ``parallel/data_parallel/GroupByKeyParallelExecutionAlgorithm.py:13-21``);
* workers hold ``{conv_id → ConversationEvaluator}`` plus per-conversation
  arrival counters; watermark-driven eviction bounds state when the source
  is timestamp-ordered;
* the sink is idempotent: each (batch, worker) writes
  ``part-b{batch:06d}-w{worker:03d}.parquet`` via tmp-file + atomic rename;
  a manifest commits the completed batch id and the latest state
  checkpoint, so a killed run resumes from the last checkpoint and
  reproduces byte-identical output (re-processed batches overwrite their
  own files deterministically — exactly-once by idempotence);
* there is NO all-to-all barrier: routing, evaluation, and the sink
  pipeline with the read.

Unlike the reference (no checkpoint/resume, no spill, in-memory queues —
SURVEY.md §2.9), recovery is a first-class design requirement here.
"""

from __future__ import annotations

import json
import os
import sys

from ray import cloudpickle as pickle
from typing import Dict, List, Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray

from .engine import EngineConfig, MatchesEmitter
from .evaluator import CompiledPattern, ConversationEvaluator, compile_patterns


class _SimultaneousEvaluator:
    """Plan swap by parallel warm-up instead of replay — the reference's
    SimultaneousTreeBasedEvaluationMechanism
    (tree/evaluation/SimultaneousTreeBasedEvaluationMechanism.py:14-92):
    the OLD evaluator keeps serving matches while the NEW one warms up on
    the live stream; once the new evaluator has seen one full window of
    events its state is complete, its warm-up matches (already emitted by
    the old one) are discarded, and it takes over."""

    __slots__ = ("old", "new", "window_us", "start_ts", "active")

    def __init__(self, old: "ConversationEvaluator",
                 new: "ConversationEvaluator", window_us: int):
        self.old = old
        self.new = new
        self.window_us = window_us
        self.start_ts = None
        self.active = old

    @property
    def matches(self):
        return self.active.matches

    @property
    def cond_stats(self):
        return self.active.cond_stats

    @property
    def shed_count(self):
        return self.active.shed_count

    def _maybe_swap(self, ts_us: int):
        if self.new is None:
            return
        if self.start_ts is None:
            self.start_ts = ts_us
            return
        if ts_us - self.start_ts > self.window_us:
            # warm-up complete: everything the old evaluator could still
            # complete (first_ts within one window) is in the new state.
            # The new tree's warm-up matches are duplicates of the old
            # tree's and are discarded — EXCEPT that the old tree may
            # hold matches emitted since the last drain; those carry over
            # (dropping both copies would lose them).
            #
            # The old tree may also hold PENDING unbounded-negation
            # positives whose first event predates the warm-up start —
            # the new evaluator never saw those events, so the pendings
            # exist only in the old state and must be flushed here (the
            # reference reports them via Tree.get_last_matches at tree
            # replacement, SimultaneousTreeBasedEvaluationMechanism.py:
            # 60-66).  Flushing exactly first_ts < start_ts is safe:
            # window_us is the max over patterns, so ts_us > start_ts +
            # window_us ≥ first_ts + pattern window — no later negative
            # can still retro-invalidate them.  Pendings with first_ts
            # >= start_ts are duplicated in the new evaluator's state
            # and must NOT be flushed (they would emit twice).
            self.old.flush_pending_before(self.start_ts)
            self.new.matches.clear()
            self.new.matches.extend(self.old.matches)
            self.old = None
            self.active = self.new
            self.new = None

    def process(self, payload: dict, ev_type: str, ts_us: int, prob=None):
        self._maybe_swap(ts_us)
        if self.new is None:
            self.active.process(payload, ev_type, ts_us, prob)
            return
        # both trees consume during warm-up; each gets its own payload
        # dict (they stamp independent arrival indices into it)
        self.old.process(dict(payload), ev_type, ts_us, prob)
        self.new.process(dict(payload), ev_type, ts_us, prob)

    def advance_watermark(self, ts_us: int):
        if self.new is not None:
            self.new.advance_watermark(ts_us)
            self.new.matches.clear()  # warm-up matches never emit
        self.active.advance_watermark(ts_us)

    def eos(self):
        # stream ended mid-warm-up: the old evaluator is authoritative
        self.active.eos()

    def is_quiescent(self, watermark_us: int) -> bool:
        if self.new is not None and not self.new.is_quiescent(watermark_us):
            return False
        return self.active.is_quiescent(watermark_us)

    def rebuilt_with(self, new_compiled, cond_stats=None):
        return self.active.rebuilt_with(new_compiled, cond_stats)


class _WorkerCore:
    """The plain-Python core of a streaming worker (kept actor-free so it
    can be unit-tested and pickled for checkpoints)."""

    def __init__(self, compiled: List[CompiledPattern], cfg: EngineConfig,
                 emitter, slice_len_us: int = 1,
                 retain_events: bool = False, shedding=None,
                 key_contiguous: bool = False):
        self.compiled = compiled
        self.cfg = cfg
        self.emitter = emitter
        self.slice_len_us = slice_len_us
        self.retain_events = retain_events  # enables replan-with-replay
        self.shedding = shedding            # optional overload valve
        # key-contiguous source contract: each key's rows occupy one
        # contiguous range of the stream, so a key absent from the
        # current shard can never reappear — its evaluator is flushed
        # (per-conversation end-of-stream) and recycled at shard end.
        # Bounds worker state to the keys straddling a batch boundary
        # instead of every key ever seen.
        self.key_contiguous = key_contiguous
        # keyed by (conv_id, slice); slice is -1 for non-hot keys
        self.evaluators: Dict[object, ConversationEvaluator] = {}
        self.watermark_us = None
        self.rows_processed = 0
        self.busy_sec = 0.0
        self.cpu_sec = 0.0
        self.first_busy_ts = None
        self.last_busy_ts = None
        self.type_counts: Dict[str, int] = {}
        # {(pattern_id, conjunct_idx): [successes, total]} — selectivity
        # instrumentation (condition/Condition.py:119-125 analog); only
        # collected when adaptivity is on
        self.cond_stats: Dict[tuple, list] = {} if retain_events else None
        self.has_unbounded = any(cp.has_unbounded_negation
                                 for cp in compiled)
        # evicted-evaluator free pool: the tree wiring is
        # conversation-independent, so a quiescent conversation's
        # evaluator is reset and reused for the next new conversation
        self._pool: List[ConversationEvaluator] = []

    # -- processing ---------------------------------------------------------
    def process_shard(self, shard: pa.Table) -> pa.Table:
        """Evaluates one routed shard, returning the matches table."""
        import time as _t
        _t0 = _t.perf_counter()
        _c0 = _t.process_time()
        from .engine import extract_sorted_columns
        keys, slices, types, ts_us, probs, payloads = \
            extract_sorted_columns(shard, self.cfg)

        # arrival-rate statistics (ArrivalRatesStatistics analog,
        # adaptive/statistics/Statistics.py:43-100)
        tc = self.type_counts
        for t in types:
            tc[t] = tc.get(t, 0) + 1

        rows = []
        n = len(keys)
        i = 0
        while i < n:
            key = keys[i]
            cur_slice = int(slices[i]) if slices is not None else -1
            ev_key = key if cur_slice < 0 else (key, cur_slice)
            ev = self.evaluators.get(ev_key)
            if ev is None:
                if self._pool:
                    ev = self._pool.pop()
                    ev.reset()
                else:
                    ev = ConversationEvaluator(
                        self.compiled,
                        retain_events=self.retain_events,
                        cond_stats=self.cond_stats,
                        shedding=self.shedding,
                        share=self.cfg.share)
                self.evaluators[ev_key] = ev
            j = i
            while j < n and keys[j] == key and \
                    (slices is None or slices[j] == cur_slice):
                ev.process(payloads[j], types[j], ts_us[j],
                           probs[j] if probs else None)
                j += 1
            self._drain(key, cur_slice, ev, rows)
            i = j
        if self.key_contiguous:
            # every key not in this shard is complete: flush its pending
            # matches (per-conversation EOS — identical to what stream
            # EOS would emit later) and recycle the evaluator.
            # Deterministic per batch, so checkpoint resume replays the
            # identical eviction sequence and output.
            seen = set()
            if slices is None:
                seen.update(keys)
            else:
                for i2 in range(n):
                    s = int(slices[i2])
                    seen.add(keys[i2] if s < 0 else (keys[i2], s))
            dead = [ek for ek in self.evaluators if ek not in seen]
            for ek in dead:
                ev = self.evaluators.pop(ek)
                ev.eos()
                conv, sl = ek if isinstance(ek, tuple) else (ek, -1)
                self._drain(conv, sl, ev, rows)
                if type(ev) is ConversationEvaluator \
                        and len(self._pool) < 512:
                    self._pool.append(ev)
        self.rows_processed += n
        out = pa.Table.from_pylist(rows, schema=self.emitter.schema())
        self.busy_sec += _t.perf_counter() - _t0
        self.cpu_sec += _t.process_time() - _c0
        # idle-placement diagnostics (metrics.json): wall timestamps of
        # the first shard's start and the latest shard's end
        if self.first_busy_ts is None:
            self.first_busy_ts = _t.time() - (_t.perf_counter() - _t0)
        self.last_busy_ts = _t.time()
        return out

    def _drain(self, key, cur_slice: int, ev: ConversationEvaluator,
               rows: list):
        if not ev.matches:
            return
        emit_row = self.emitter.row
        L = self.slice_len_us
        for cp, pm in ev.matches:
            if cur_slice >= 0 and pm.first_ts // L != cur_slice:
                continue  # another slice owns this match (RIP dedup)
            rows.append(emit_row(cp.pattern_id, key, pm, cp, ev))
        ev.matches.clear()

    def advance_watermark(self, wm_us: int) -> pa.Table:
        """Event-time watermark: flush expired pending unbounded-negation
        matches, then evict quiescent conversations (valid only for
        ts-ordered sources)."""
        self.watermark_us = wm_us
        rows = []
        dead = []
        for ev_key, ev in self.evaluators.items():
            conv, sl = ev_key if isinstance(ev_key, tuple) else (ev_key, -1)
            ev.advance_watermark(wm_us)
            self._drain(conv, sl, ev, rows)
            if ev.is_quiescent(wm_us):
                dead.append(ev_key)
        for ev_key in dead:
            ev = self.evaluators.pop(ev_key)
            # pool plain evaluators only (not mid-warm-up swap pairs);
            # bounded so the pool never outgrows the live peak
            if type(ev) is ConversationEvaluator and len(self._pool) < 512:
                self._pool.append(ev)
        return pa.Table.from_pylist(rows, schema=self.emitter.schema())

    def eos(self) -> pa.Table:
        rows = []
        for ev_key, ev in self.evaluators.items():
            conv, sl = ev_key if isinstance(ev_key, tuple) else (ev_key, -1)
            ev.eos()
            self._drain(conv, sl, ev, rows)
        return pa.Table.from_pylist(rows, schema=self.emitter.schema())

    def replan(self, new_compiled: List[CompiledPattern],
               mode: str = "replay"):
        """Swaps in newly compiled patterns (results are unaffected —
        join order never changes match sets — only evaluation cost).

        ``mode="replay"``: rebuild every evaluator by replaying its
        retained in-window history (the reference's Trivial mechanism).
        ``mode="simultaneous"``: warm the new plan up on the live stream
        while the old one keeps serving, then swap after one window
        (SimultaneousTreeBasedEvaluationMechanism.py:14-92) — no replay
        cost, temporarily double evaluation work."""
        self.compiled = new_compiled
        self._pool.clear()  # pooled evaluators carry the old plan
        if mode == "replay":
            self.evaluators = {
                k: ev.rebuilt_with(new_compiled, self.cond_stats)
                for k, ev in self.evaluators.items()}
            return
        max_w = max(cp.window_us for cp in new_compiled)
        out = {}
        for k, ev in self.evaluators.items():
            if isinstance(ev, _SimultaneousEvaluator):
                # a pair still warming up: keep the active side, restart
                # the warm-up against the newest plan
                ev = ev.active
            fresh = ConversationEvaluator(self.compiled,
                                          retain_events=self.retain_events,
                                          cond_stats=self.cond_stats,
                                          shedding=self.shedding,
                                          share=self.cfg.share)
            out[k] = _SimultaneousEvaluator(ev, fresh, max_w)
        self.evaluators = out

    # -- state --------------------------------------------------------------
    def snapshot(self) -> bytes:
        return pickle.dumps(
            {"evaluators": self.evaluators,
             "watermark_us": self.watermark_us,
             "rows_processed": self.rows_processed,
             "type_counts": self.type_counts,
             "cond_stats": self.cond_stats,
             "compiled": self.compiled})

    def restore(self, blob: bytes):
        state = pickle.loads(blob)
        self.evaluators = state["evaluators"]
        self.watermark_us = state["watermark_us"]
        self.rows_processed = state["rows_processed"]
        self.type_counts = state.get("type_counts", {})
        restored_cs = state.get("cond_stats")
        if restored_cs is not None and self.cond_stats is not None:
            self.cond_stats.clear()
            self.cond_stats.update(restored_cs)
            for ev in self.evaluators.values():
                ev.cond_stats = self.cond_stats
        if state.get("compiled") is not None:
            self.compiled = state["compiled"]


@ray.remote
class _StreamWorker:
    """Stateful streaming worker: evaluation AND the per-partition sink
    (each worker writes its own part files — the driver only sequences
    batches and commits the manifest)."""

    def __init__(self, worker_id, compiled, cfg, emitter, output_dir,
                 slice_len_us: int = 1, retain_events: bool = False,
                 shedding=None, key_contiguous: bool = False):
        # one scheduling slot = one core: pin Arrow's internal pool so a
        # worker can't silently use cores beyond its num_cpus reservation
        # (keeps the two-parallelism-level scaling measurement honest)
        pa.set_cpu_count(1)
        pa.set_io_thread_count(2)
        # The evaluation loop allocates millions of PM/Ev containers per
        # shard, all cycle-free (reclaimed by refcount the moment they
        # expire), but each allocation ticks CPython's gen0 counter, so
        # automatic cyclic GC fires constantly and rescans the live
        # evaluator graphs — measured 25-35 % of worker wall time on the
        # flagship shard.  This process is dedicated to this actor:
        # disable automatic GC and run one explicit collect() every
        # _GC_EVERY shards, which reclaims the only true cycles (tree
        # wiring of evaluators dropped past the reuse-pool cap) on a
        # deterministic cadence.
        import gc
        gc.disable()
        self._gc_tick = 0
        self.worker_id = worker_id
        self.output_dir = output_dir
        self.core = _WorkerCore(compiled, cfg, emitter, slice_len_us,
                                retain_events, shedding, key_contiguous)

    _GC_EVERY = 8

    def _gc_step(self):
        import gc
        self._gc_tick += 1
        if self._gc_tick >= self._GC_EVERY:
            self._gc_tick = 0
            gc.collect()

    def _write(self, table: pa.Table, batch_id: int, suffix: str = "") -> int:
        if table.num_rows == 0:
            return 0
        tag = f"-{suffix}" if suffix else ""
        path = os.path.join(
            self.output_dir,
            f"part-b{batch_id:06d}{tag}-w{self.worker_id:03d}.parquet")
        tmp = path + f".tmp{self.worker_id}"
        pq.write_table(table, tmp)
        os.replace(tmp, path)  # idempotent, atomic
        return table.num_rows

    def process(self, shard: pa.Table, batch_id: int) -> int:
        n = self._write(self.core.process_shard(shard), batch_id)
        self._gc_step()
        return n

    def advance_watermark(self, wm_us, batch_id: int) -> int:
        if wm_us is None:
            return 0
        if self.core.watermark_us is not None \
                and wm_us <= self.core.watermark_us:
            return 0  # watermarks are monotone
        return self._write(self.core.advance_watermark(wm_us), batch_id,
                           suffix="wm")

    def eos(self, batch_id: int) -> int:
        return self._write(self.core.eos(), batch_id, suffix="eos")

    def snapshot(self) -> bytes:
        return self.core.snapshot()

    def restore(self, blob: bytes) -> bool:
        self.core.restore(blob)
        return True

    def type_counts(self) -> dict:
        return dict(self.core.type_counts)

    def statistics(self) -> dict:
        return {"type_counts": dict(self.core.type_counts),
                "cond_stats": dict(self.core.cond_stats or {})}

    def replan(self, new_compiled, mode: str = "replay") -> bool:
        self.core.replan(new_compiled, mode)
        return True

    def stats(self) -> dict:
        import resource
        ru = resource.getrusage(resource.RUSAGE_SELF)
        try:  # CURRENT resident set (ru_maxrss is the monotone peak —
            # useless for flat-memory evidence)
            with open("/proc/self/statm") as f:
                rss_mb = int(f.read().split()[1]) * \
                    (os.sysconf("SC_PAGESIZE") / 1_048_576)
        except (OSError, ValueError, AttributeError):
            # non-Linux fallback: ru_maxrss is KiB on Linux/BSD but BYTES
            # on macOS, and it is a monotone PEAK, not current RSS — the
            # rss_is_peak flag below lets consumers (the soak
            # flat-memory assertions) skip trend checks on such platforms
            import sys as _sys
            div = 1_048_576 if _sys.platform == "darwin" else 1024
            rss_mb = ru.ru_maxrss / div
            rss_is_peak = True
        else:
            rss_is_peak = False
        return {"rows": self.core.rows_processed,
                "busy_sec": round(self.core.busy_sec, 3),
                "cpu_sec": round(self.core.cpu_sec, 3),
                "first_busy_ts": self.core.first_busy_ts,
                "last_busy_ts": self.core.last_busy_ts,
                "utime": round(ru.ru_utime, 3),
                "stime": round(ru.ru_stime, 3),
                "minflt": ru.ru_minflt,
                "nivcsw": ru.ru_nivcsw,
                "rss_mb": round(rss_mb, 1),
                "rss_is_peak": rss_is_peak,
                "live_conversations": len(self.core.evaluators),
                "shed_partials": sum(ev.shed_count for ev in
                                     self.core.evaluators.values())}


class _Router:
    """Vectorized hash routing of a raw micro-batch into worker shards.
    Shares the batch-engine prep (type filter, µs timestamps, hot-key
    time-slice salting) and splits by one stable sort + zero-copy slices
    instead of W filter passes."""

    def __init__(self, cfg: EngineConfig, types_needed, num_workers: int,
                 max_window_us: int = 0, type_prefilters=None):
        from .engine import _Prep
        self.cfg = cfg
        self.W = num_workers
        self.prep = _Prep(cfg, types_needed, num_workers, max_window_us,
                          type_prefilters)

    def route_sorted(self, batch: pa.Table):
        """(partition-sorted table, worker offsets): one shared table the
        workers slice zero-copy by their own id.  Serializing ONE object
        instead of W compacted slices halves the route task's memcpy and
        object-store page traffic (each slice's buffers would be copied
        compactly at serialization)."""
        import numpy as np
        batch = self.prep(batch)
        part_np = batch["_part"].to_numpy()
        order = np.argsort(part_np, kind="stable")
        sorted_batch = batch.take(pa.array(order))
        counts = np.bincount(part_np[order], minlength=self.W)
        offsets = np.zeros(self.W + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        return sorted_batch.drop_columns(["_part"]), offsets.tolist()

    def __call__(self, batch: pa.Table) -> List[pa.Table]:
        sorted_batch, offsets = self.route_sorted(batch)
        return [sorted_batch.slice(offsets[w], offsets[w + 1] - offsets[w])
                for w in range(self.W)]


@ray.remote
def _route_task(slices, router: "_Router", columns=None):
    """Reads one micro-batch (a list of (path, row_group, lo, hi) slices)
    and hash-routes it into worker shards.  Runs as a parallel task;
    returns ``W`` shard tables plus the batch's max timestamp
    (num_returns = W + 1).  Per-worker slice objects beat one shared
    sorted-table object: with a shared object every worker maps and
    page-faults the WHOLE batch (24× the page-table/TLB kernel work per
    batch — measured 2× worse end-to-end), while slice objects give each
    worker exactly its own bytes.  ``columns`` prunes the read to the
    columns the patterns/payload contract actually needs.

    Arrow's thread pool is capped to match the task's CPU reservation:
    left at the default (one pool thread per PHYSICAL core), each in-flight
    route task's read/sort/take would fan out to every core and preempt the
    worker actors — measured as a 1.77× worker-CPU inflation at 24 workers
    on a 32-core box (the 8→32 scaling regression; BASELINE.md §2)."""
    if pa.cpu_count() > 2:
        pa.set_cpu_count(2)
        pa.set_io_thread_count(2)
    parts = []
    for path, rg, lo, hi in slices:
        parts.append(pq.ParquetFile(path)
                     .read_row_group(rg, columns=columns)
                     .slice(lo, hi - lo))
    table = pa.concat_tables(parts) if len(parts) > 1 else parts[0]
    table = table.replace_schema_metadata(None)
    shards = router(table)
    max_ts = None
    if len(table):
        max_ts = pc.max(pc.cast(pc.cast(table[router.cfg.ts_col],
                                        pa.timestamp("us")),
                                pa.int64())).as_py()
    return (*shards, max_ts)


class StreamingCEP:
    """Micro-batch streaming CEP over Parquet files.

    ``ts_ordered_input=True`` enables event-time watermarks (state eviction
    + incremental unbounded-negation flush).  With conversation-contiguous
    (non-ts-ordered) input the watermark stays at −∞ and pending matches
    flush at end-of-stream — results are identical either way; only state
    size and emission latency differ.
    """

    def __init__(self, patterns, cfg: Optional[EngineConfig] = None,
                 num_workers: int = 8, emitter=None,
                 checkpoint_every: int = 8,
                 ts_ordered_input: bool = False,
                 adaptive: bool = False, replan_every: int = 16,
                 tree_builder: str = "greedy", shedding=None,
                 deviation_threshold: Optional[float] = None,
                 replan_mode: str = "replay",
                 invariant_aware: bool = False,
                 key_contiguous_input: bool = False):
        from .pattern import Pattern
        self.cfg = cfg or EngineConfig()
        self._patterns = [patterns] if isinstance(patterns, Pattern) \
            else list(patterns)
        self.compiled = compile_patterns(patterns, storage=self.cfg.storage)
        self.types_needed = frozenset(
            t for cp in self.compiled for t in cp.routes)
        self.max_window_us = max(cp.window_us for cp in self.compiled)
        self.num_workers = num_workers
        self.emitter = emitter
        self.checkpoint_every = checkpoint_every
        self.ts_ordered_input = ts_ordered_input
        # key-contiguous source contract (e.g. a log bucketed per
        # conversation): evaluators for keys absent from the current
        # batch are flushed + recycled at batch end (_WorkerCore)
        self.key_contiguous_input = key_contiguous_input
        # runtime adaptivity (reference §2.6): collect arrival rates in the
        # workers, periodically recompile the evaluation order and swap it
        # in with replay — results are plan-invariant, only cost changes
        self.adaptive = adaptive
        self.replan_every = replan_every
        self.tree_builder = tree_builder
        # deviation-aware trigger (reference adaptive/optimizer/
        # DeviationAwareTester.py, Optimizer.py:75-132): when set, a
        # replan point only fires if some pattern-relevant statistic has
        # drifted by more than this factor since the ACTIVE plan was
        # built (new > t*old or new < old/t); None = replan at every
        # point (the reference's UnconditionalPeriodicalAdaptation)
        self.deviation_threshold = deviation_threshold
        # "replay" (Trivial rebuild-with-replay) or "simultaneous"
        # (warm-up swap) — see _WorkerCore.replan
        self.replan_mode = replan_mode
        # invariant-aware trigger (reference plan/invariant/*): the
        # greedy plan records its optimality invariants; a replan point
        # only fires when fresh statistics VIOLATE one — the cheapest
        # "is my plan still right" test
        self.invariant_aware = invariant_aware
        # optional load-shedding valve (recall tradeoff — OFF by default;
        # see evaluator.SheddingConfig)
        self.shedding = shedding

    def _stats_deviated(self, snapshot, counts: dict,
                        cond_totals: dict) -> bool:
        """True when any relevant arrival share or conjunct selectivity
        drifted beyond the threshold vs the active plan's snapshot
        (DeviationAwareTester semantics; shares are scale-free so
        cumulative counters compare cleanly)."""
        t = self.deviation_threshold
        total = sum(counts.values()) or 1
        old_types, old_conds = snapshot
        for typ in self.types_needed:
            new = counts.get(typ, 0) / total
            old = old_types.get(typ, 0.0)
            if old == 0.0:
                if new > 0.0:
                    return True
                continue
            if new > t * old or new < old / t:
                return True
        for key, (succ, tot) in cond_totals.items():
            if tot <= 0:
                continue
            new = succ / tot
            old = old_conds.get(key)
            if old is None:
                return True
            if new > t * old or new < old / t:
                return True
        return False

    @staticmethod
    def _stats_snapshot(counts: dict, cond_totals: dict):
        total = sum(counts.values()) or 1
        return ({typ: c / total for typ, c in counts.items()},
                {key: (succ / tot) for key, (succ, tot)
                 in cond_totals.items() if tot > 0})

    def _pattern_statistics(self, counts: dict,
                            cond_stats: Optional[dict] = None):
        """Per-pattern (pattern, rates, selectivity-matrix) from observed
        counters (SelectivityStatistics analog,
        adaptive/statistics/Statistics.py:103-181)."""
        from .pattern import Composite, Neg, Primitive, Kleene

        def arg_types(arg):
            if isinstance(arg, Primitive):
                return [arg.event_type]
            if isinstance(arg, (Kleene, Neg)):
                return arg_types(arg.arg)
            if isinstance(arg, Composite):
                out = []
                for a in arg.args:
                    out.extend(arg_types(a))
                return out
            return []

        conj_names = {}
        for cp in self.compiled:
            conj_names.update(cp.conjunct_names)

        out = []
        for p in self._patterns:
            s = p.structure
            if not isinstance(s, Composite):
                continue
            pos_args = [a for a in s.args if not isinstance(a, Neg)]
            rates = [sum(counts.get(t, 0) for t in arg_types(a))
                     for a in pos_args]
            n = len(pos_args)
            sel = [[1.0] * n for _ in range(n)]
            if cond_stats:
                arg_names = [frozenset(a.event_names()) for a in pos_args]
                for key, (succ, tot) in cond_stats.items():
                    if tot <= 0:
                        continue
                    names = conj_names.get(key)
                    if not names:
                        continue
                    touched = [i for i, an in enumerate(arg_names)
                               if names & an]
                    s_hat = succ / tot
                    if len(touched) == 1:
                        i = touched[0]
                        sel[i][i] *= s_hat
                    elif len(touched) == 2:
                        i, j = touched
                        sel[i][j] *= s_hat
            out.append((p, rates, sel))
        return out

    def _recompile_with_counts(self, counts: dict,
                               cond_stats: Optional[dict] = None):
        """Builds per-pattern statistics from observed counters and
        recompiles with the configured order builder."""
        for p, rates, sel in self._pattern_statistics(counts, cond_stats):
            p.statistics = {"arrival_rates": rates,
                            "selectivity_matrix": sel,
                            # feeds StatisticNegationAlgorithm ordering
                            "type_counts": dict(counts)}
        return compile_patterns(self._patterns,
                                tree_builder=self.tree_builder,
                                storage=self.cfg.storage)

    def _plan_invariants(self, counts: dict,
                         cond_stats: Optional[dict] = None):
        """Greedy-plan optimality invariants for every multi-arg pattern
        (InvariantAwareGreedyTreeBuilder analog)."""
        from .plan import order_greedy_with_invariants
        out = []
        for p, rates, sel in self._pattern_statistics(counts, cond_stats):
            if len(rates) > 1:
                _, inv = order_greedy_with_invariants(len(rates), rates,
                                                      sel)
                out.append(inv)
        return out

    def _invariants_violated(self, invariants, counts: dict,
                             cond_stats: Optional[dict] = None) -> bool:
        from .plan import greedy_invariants_violated
        stats = [(rates, sel) for _p, rates, sel
                 in self._pattern_statistics(counts, cond_stats)
                 if len(rates) > 1]
        for inv, (rates, sel) in zip(invariants, stats):
            if greedy_invariants_violated(inv, rates, sel):
                return True
        return False

    # -- source -------------------------------------------------------------
    def _micro_batch_plan(self, files: Sequence[str],
                          micro_batch_rows: int,
                          file_aligned: bool = False):
        """Deterministic micro-batch plan: (batch_id, [(file, row_group,
        lo, hi), ...]) — row-group slices coalesced up to
        ``micro_batch_rows`` rows per batch, in file → row-group order.
        Resume replays the identical sequence; reads run as parallel
        tasks.

        ``file_aligned=True`` never coalesces a batch across a file
        boundary, making the plan of a file list a pure PREFIX of the
        plan of any extension of that list — the property incremental
        consumption of a growing spool needs: a batch id committed
        against files [0..k] still denotes exactly the same rows when
        files [k+1..] arrive (the default plan would extend a trailing
        partial batch with new-file rows under the same id, silently
        skipping those rows on resume)."""
        batch_id = 0
        cur: List[tuple] = []
        cur_rows = 0

        def target(bid: int) -> int:
            # ramp-up: the first batches are small so the actor pool
            # starts evaluating after a fraction of a full route latency
            # (a full-size first batch left every worker idle for the
            # whole first read+route, a measured 2-3 s bubble at 24
            # workers).  Deterministic in batch id, so resume replays
            # the identical plan.
            return max(1, micro_batch_rows >> max(0, 3 - bid))

        for path in files:
            md = pq.ParquetFile(path).metadata
            for rg in range(md.num_row_groups):
                n = md.row_group(rg).num_rows
                lo = 0
                while lo < n:
                    take = min(target(batch_id) - cur_rows, n - lo)
                    cur.append((path, rg, lo, lo + take))
                    cur_rows += take
                    lo += take
                    if cur_rows >= target(batch_id):
                        yield batch_id, cur
                        batch_id += 1
                        cur, cur_rows = [], 0
            if file_aligned and cur:
                yield batch_id, cur
                batch_id += 1
                cur, cur_rows = [], 0
        if cur:
            yield batch_id, cur

    # -- run ----------------------------------------------------------------
    def run_files(self, files: Sequence[str], output_dir: str,
                  micro_batch_rows: int = 100_000,
                  resume: bool = True, max_in_flight: int = 4,
                  sample_every: int = 0, final: bool = True,
                  file_aligned_batches: bool = False) -> dict:
        """``final=False`` runs one GENERATION of an incremental
        consumption loop (sources/live.py): the end-of-stream flush of
        pending unbounded-negation matches is skipped (those matches
        may still be negated by future generations' events) and the
        manifest keeps its last committed checkpoint instead of being
        closed with ``eos: true`` — so the next ``resume=True`` call
        over an EXTENDED file list restores that checkpoint and
        processes only the batches after it.  Pair with
        ``file_aligned_batches=True`` on every generation (including
        the final one) so committed batch ids keep denoting the same
        rows as the file list grows.

        ``sample_every > 0`` additionally snapshots per-worker
        (live_conversations, rss_mb, rows) every N micro-batches —
        enqueued on the actor queues right after that batch's work, so
        each sample reflects state as-of its batch — and returns them
        under ``"samples"``.  This is the soak/flat-memory evidence hook
        (round-4 VERDICT asks #1/#7): a healthy watermark-evicting run
        shows live state and RSS plateauing, not tracking stream
        position."""
        import time as _time
        t_start = _time.perf_counter()
        os.makedirs(output_dir, exist_ok=True)
        manifest_path = os.path.join(output_dir, "manifest.json")
        state_dir = os.path.join(output_dir, "_state")
        os.makedirs(state_dir, exist_ok=True)

        emitter = self.emitter or self._default_emitter(files[0])
        from .engine import build_type_prefilters
        prefilters = build_type_prefilters(self.compiled) \
            if self.cfg.vector_pushdown else {}
        router = _Router(self.cfg, self.types_needed, self.num_workers,
                         self.max_window_us, prefilters)
        workers = [_StreamWorker.remote(w, self.compiled, self.cfg, emitter,
                                        output_dir,
                                        router.prep.slice_len_us,
                                        self.adaptive, self.shedding,
                                        self.key_contiguous_input)
                   for w in range(self.num_workers)]

        start_after = -1
        if resume and os.path.exists(manifest_path):
            with open(manifest_path) as f:
                manifest = json.load(f)
            ck = manifest.get("checkpoint")
            if ck is not None:
                if len(ck["files"]) != self.num_workers:
                    raise ValueError(
                        f"checkpoint was written by {len(ck['files'])} "
                        f"workers but this run has {self.num_workers}; "
                        "hash routing is worker-count dependent — resume "
                        "with the same num_workers")
                blobs = [open(p, "rb").read() for p in ck["files"]]
                ray.get([w.restore.remote(b)
                         for w, b in zip(workers, blobs)])
                start_after = ck["batch_id"]
            print(f"[stream] resuming after batch {start_after}",
                  file=sys.stderr)

        # All actor calls for a batch (process → watermark-flush →
        # snapshot) are submitted IN ORDER at submission time: actor task
        # queues guarantee the snapshot captures exactly the state as of
        # its batch, even while later batches are already queued — so a
        # checkpoint never leaks post-checkpoint state (a drain-time
        # snapshot would).  Output writes + manifest commits happen at
        # drain time, strictly in batch order.
        in_flight: List[tuple] = []  # (batch_id, refs, wm_refs, snap_refs)
        sample_refs: List[tuple] = []  # (batch_id, [stats refs])
        last_ck_scheduled = start_after
        n_batches = 0
        n_replans = 0
        plan_stats = None  # statistics snapshot behind the active plan
        plan_invariants = None  # greedy invariants behind the active plan

        def drain_one():
            batch_id, refs, wm_refs, snap_refs = in_flight.pop(0)
            ray.get(refs)          # workers wrote their own part files
            if wm_refs is not None:
                ray.get(wm_refs)
            if snap_refs is not None:
                ck_files = []
                for wi, blob in enumerate(ray.get(snap_refs)):
                    p = os.path.join(state_dir,
                                     f"ck-b{batch_id:06d}-w{wi:03d}.bin")
                    _atomic_write_bytes(p, blob)
                    ck_files.append(p)
                _atomic_write_json(manifest_path, {
                    "checkpoint": {"batch_id": batch_id,
                                   "files": ck_files},
                    "eos": False,
                })

        W = self.num_workers
        # prune the route read to the declared column contract (key, ts,
        # order, type, prob, payload); a type_fn may touch arbitrary
        # columns, so pruning is only safe with a plain type column
        read_columns = None
        if self.cfg.payload_cols is not None and self.cfg.type_fn is None:
            need = {self.cfg.key_col, self.cfg.ts_col, self.cfg.type_col,
                    *self.cfg.order_cols, *self.cfg.payload_cols}
            if self.cfg.prob_col:
                need.add(self.cfg.prob_col)
            read_columns = [c for c in pq.read_schema(files[0]).names
                            if c in need]
        # fractional CPU: route tasks interleave with the actor pool even
        # when workers reserve nearly every scheduling slot
        route = _route_task.options(num_returns=W + 1, num_cpus=0.5)

        # decoupled route-ahead: keep up to ``max_in_flight`` batches
        # routed (or routing) ahead of worker submission, and pre-pump
        # the first window so the reads overlap actor construction —
        # routing is plan-independent (hash by key + static prefilters),
        # so routing ahead of a replan point is semantics-neutral
        plan_iter = iter(self._micro_batch_plan(files, micro_batch_rows,
                                                file_aligned_batches))
        routed: List[tuple] = []  # (batch_id, shard_refs, max_ts_ref)
        plan_done = False

        def pump_routes():
            nonlocal plan_done
            while not plan_done and len(routed) < max_in_flight:
                try:
                    b, slices = next(plan_iter)
                except StopIteration:
                    plan_done = True
                    break
                if b <= start_after:
                    continue
                *shard_refs, max_ts_ref = route.remote(slices, router,
                                                       read_columns)
                routed.append((b, shard_refs, max_ts_ref))

        pump_routes()
        # force actor construction now so setup cost is attributable
        # (long-lived pool on a real cluster ≠ per-job cost); the first
        # routes are already reading concurrently
        ray.get([w.stats.remote() for w in workers])
        t_ready = _time.perf_counter()

        while routed:
            batch_id, shard_refs, max_ts_ref = routed.pop(0)
            pump_routes()
            refs = [workers[w].process.remote(shard_refs[w], batch_id)
                    for w in range(W)]
            wm_refs = None
            if self.ts_ordered_input:
                wm_refs = [w.advance_watermark.remote(max_ts_ref, batch_id)
                           for w in workers]
            if self.adaptive and \
                    (batch_id + 1) % self.replan_every == 0:
                # gather current statistics (counts reflect exactly the
                # batches up to batch_id — actor-queue ordering)
                # deterministic replan point: counts reflect exactly the
                # batches up to batch_id (actor-queue ordering), and the
                # new plan is enqueued before batch_id+1's work.  The
                # schedule is a pure function of the ABSOLUTE batch id, so
                # a resumed run replays the identical replan points (a
                # checkpoint-relative schedule would replan at different
                # batches and reorder re-written part files, breaking the
                # byte-identical-resume guarantee)
                totals: Dict[str, int] = {}
                cond_totals: Dict[tuple, list] = {}
                for st in ray.get([w.statistics.remote() for w in workers]):
                    for t, cnt in st["type_counts"].items():
                        totals[t] = totals.get(t, 0) + cnt
                    for k, (succ, tot) in st["cond_stats"].items():
                        cur = cond_totals.setdefault(k, [0, 0])
                        cur[0] += succ
                        cur[1] += tot
                if self.invariant_aware:
                    should = plan_stats is None \
                        or self._invariants_violated(plan_invariants,
                                                     totals, cond_totals)
                else:
                    should = self.deviation_threshold is None \
                        or plan_stats is None \
                        or self._stats_deviated(plan_stats, totals,
                                                cond_totals)
                if should:
                    new_compiled = self._recompile_with_counts(totals,
                                                               cond_totals)
                    ray.get([w.replan.remote(new_compiled,
                                              self.replan_mode)
                             for w in workers])
                    plan_stats = self._stats_snapshot(totals, cond_totals)
                    if self.invariant_aware:
                        plan_invariants = self._plan_invariants(
                            totals, cond_totals)
                    n_replans += 1
            snap_refs = None
            if (batch_id - last_ck_scheduled) >= self.checkpoint_every:
                snap_refs = [w.snapshot.remote() for w in workers]
                last_ck_scheduled = batch_id
            if sample_every and (batch_id + 1) % sample_every == 0:
                sample_refs.append(
                    (batch_id, [w.stats.remote() for w in workers]))
            in_flight.append((batch_id, refs, wm_refs, snap_refs))
            last_batch_id = batch_id
            n_batches += 1
            while len(in_flight) >= max_in_flight:
                drain_one()
        while in_flight:
            drain_one()

        if not final and n_batches:
            # checkpoint exactly at the generation boundary so the next
            # generation resumes with zero replay (all actor calls for
            # processed batches are already enqueued ahead of this
            # snapshot — actor-queue ordering makes it the as-of state)
            ck_files = []
            for wi, blob in enumerate(
                    ray.get([w.snapshot.remote() for w in workers])):
                p = os.path.join(state_dir,
                                 f"ck-b{last_batch_id:06d}-w{wi:03d}.bin")
                _atomic_write_bytes(p, blob)
                ck_files.append(p)
            _atomic_write_json(manifest_path, {
                "checkpoint": {"batch_id": last_batch_id,
                               "files": ck_files},
                "eos": False,
            })

        # end of stream: flush pending unbounded-negation matches —
        # ONLY on the final generation (a non-final flush could emit a
        # match whose negating event arrives in a later generation)
        if final:
            ray.get([w.eos.remote(999_999) for w in workers])
        samples = [{"batch_id": b,
                    "rows": sum(s["rows"] for s in ss),
                    "live_conversations": sum(s["live_conversations"]
                                              for s in ss),
                    "rss_mb_max": max(s["rss_mb"] for s in ss),
                    "rss_mb_sum": round(sum(s["rss_mb"] for s in ss), 1),
                    # True where /proc is unavailable and rss_mb is the
                    # monotone ru_maxrss peak — trend assertions must skip
                    "rss_is_peak": any(s.get("rss_is_peak") for s in ss)}
                   for b, ss in ((b, ray.get(refs))
                                 for b, refs in sample_refs)]
        stats = ray.get([w.stats.remote() for w in workers])
        # per-partition lineage + metrics (north rule)
        _atomic_write_json(os.path.join(output_dir, "metrics.json"), {
            "workers": [{"worker": i, **s} for i, s in enumerate(stats)],
            "total_rows": sum(s["rows"] for s in stats),
            "total_shed_partials": sum(s.get("shed_partials", 0)
                                       for s in stats),
            "batches": n_batches,
            "replans": n_replans,
        })
        if final:
            _atomic_write_json(manifest_path, {
                "checkpoint": None, "eos": True,
                "batches": n_batches,
                "rows": sum(s["rows"] for s in stats),
            })
        # non-final: the manifest keeps whatever checkpoint drain_one
        # last committed (possibly from an earlier generation), so the
        # next resume replays only the batches after it
        t_done = _time.perf_counter()
        for w in workers:
            ray.kill(w)
        return {"batches": n_batches,
                "replans": n_replans,
                "rows": sum(s["rows"] for s in stats),
                "live_conversations": sum(s["live_conversations"]
                                          for s in stats),
                "samples": samples,
                "workers": self.num_workers,
                "setup_sec": round(t_ready - t_start, 3),
                "stream_sec": round(t_done - t_ready, 3),
                "worker_busy_sec": round(sum(s["busy_sec"]
                                             for s in stats), 3),
                "max_worker_busy_sec": round(max(s["busy_sec"]
                                                 for s in stats), 3)}

    def _default_emitter(self, sample_file: str):
        schema = pq.read_schema(sample_file)
        fields = []
        for f in schema:
            if self.cfg.payload_cols is not None \
                    and f.name != self.cfg.key_col \
                    and f.name not in self.cfg.payload_cols:
                continue
            fields.append(f)
        return MatchesEmitter(self.cfg, pa.schema(fields))


def read_matches(output_dir: str) -> pa.Table:
    """Reads a streaming run's committed output as one table."""
    import glob
    files = sorted(glob.glob(os.path.join(output_dir, "part-*.parquet")))
    if not files:
        raise FileNotFoundError(f"no output parts under {output_dir}")
    return pa.concat_tables([pq.read_table(f) for f in files])


def _atomic_write_bytes(path: str, blob: bytes):
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def _atomic_write_json(path: str, obj):
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)
