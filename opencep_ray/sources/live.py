"""Live push-stream ingestion: follow a growing JSONL log and feed it
through the streaming engine with exactly-once output.

This is the sandbox-safe analog of the reference's Twitter live source
(`/root/reference/plugin/twitter/TwitterInputStream.py:8-50` — an
external push API wrapped into an event stream, formatted by
`TwitterDataFormatter`): the external feed is modeled as an
append-only JSONL file (what a collector daemon writes), tailed into
rotating parquet micro-files, which `StreamingCEP.run_files` consumes
incrementally.

The composition rides the engine's checkpoint machinery: the spool
directory only ever grows by whole files (tmp+rename), the
FILE-ALIGNED micro-batch plan makes every shorter file list's plan a
pure prefix of every longer one's, and each non-final ``run_files``
generation (``final=False``) ends by checkpointing at its last batch —
so the next generation (``resume=True`` over the extended list)
restores that checkpoint and processes exactly the new files' batches.
Cross-generation partial matches ride the checkpointed worker state;
the unbounded-negation EOS flush waits for the final generation.  Same
byte-identical output contract as crash resume (BASELINE.md round-5
kill/resume evidence).  At 100 TB/day this is the standard collector →
spool → micro-batch shape; one spool per collector shard keeps file
arrival ordered per shard.
"""

from __future__ import annotations

import io
import json
import os
import time
from typing import Iterator, Optional, Sequence

import pyarrow as pa


def follow_jsonl(path: str, schema: pa.Schema,
                 poll_sec: float = 0.2,
                 idle_timeout_sec: float = 10.0,
                 sentinel: str = "__EOS__",
                 min_batch_bytes: int = 1 << 16) -> Iterator[pa.Table]:
    """Tails ``path`` (which may not exist yet) and yields Arrow tables
    of newly appended COMPLETE lines — ``tail -f`` as a generator.

    Stops at a ``sentinel`` line (the producer's explicit end-of-stream
    marker) or after ``idle_timeout_sec`` with no growth.  Partial
    trailing lines (no newline yet) are left in the file for the next
    poll, so a producer crash mid-line never yields a torn record.
    Parsing is pyarrow's vectorized C++ JSONL reader against an
    explicit schema — unknown fields error loudly rather than being
    silently dropped."""
    from pyarrow import json as pa_json
    parse = pa_json.ParseOptions(
        explicit_schema=schema,
        unexpected_field_behavior="error")
    offset = 0
    idle_since = time.monotonic()
    pending = b""       # raw bytes with no trailing newline yet
    held = b""          # COMPLETE lines below the batching threshold
    sent_b = sentinel.encode()
    while True:
        try:
            size = os.path.getsize(path)
        except OSError:
            size = 0
        if size > offset:
            with open(path, "rb") as f:
                f.seek(offset)
                chunk = f.read(size - offset)
            offset = size
            idle_since = time.monotonic()
            pending += chunk
            nl = pending.rfind(b"\n")
            if nl < 0:
                continue
            complete, pending = pending[:nl + 1], pending[nl + 1:]
            lines = complete.splitlines()
            done = sent_b in lines
            if done:
                lines = lines[:lines.index(sent_b)]
            if lines:
                held += b"\n".join(lines) + b"\n"
            if held and (done or len(held) >= min_batch_bytes):
                yield pa_json.read_json(io.BytesIO(held),
                                        parse_options=parse)
                held = b""
            if done:
                return
        else:
            if time.monotonic() - idle_since >= idle_timeout_sec:
                # idle end-of-stream: flush complete lines still held
                # below the batching threshold — dropping them would be
                # silent tail data loss
                if held:
                    yield pa_json.read_json(io.BytesIO(held),
                                            parse_options=parse)
                return
            time.sleep(poll_sec)


def spool_jsonl(jsonl_path: str, spool_dir: str, schema: pa.Schema,
                rows_per_file: int = 100_000,
                sort_by: Optional[Sequence[str]] = None,
                **follow_kwargs) -> list:
    """Drains :func:`follow_jsonl` into rotating parquet files under
    ``spool_dir`` (tmp+rename — a consumer globbing the directory only
    ever sees whole files), returning the ordered file list.  A final
    short file flushes whatever remains at end-of-stream.

    ``sort_by`` optionally sorts each spool file (e.g. by the ts
    column) — the engine only needs PER-FILE arrival order, not a
    global one."""
    return list(spool_jsonl_iter(jsonl_path, spool_dir, schema,
                                 rows_per_file, sort_by=sort_by,
                                 **follow_kwargs))


def run_live_jsonl(engine, jsonl_path: str, spool_dir: str,
                   output_dir: str, schema: pa.Schema,
                   rows_per_file: int = 100_000,
                   generation_rows: int = 0,
                   micro_batch_rows: int = 100_000,
                   **follow_kwargs) -> dict:
    """End-to-end live loop: tail ``jsonl_path`` → spool parquet →
    periodically re-invoke ``engine.run_files`` over the grown spool
    with ``resume=True`` and ``final=False``.  Each non-final
    generation ends by checkpointing at its last batch (run_files'
    generation mode), and the plan is file-aligned, so the next
    generation restores that checkpoint and processes ONLY the new
    spool files' batches — incremental, exactly-once across generations
    AND crashes, with pending cross-generation partial matches carried
    in the checkpointed worker state and the unbounded-negation EOS
    flush deferred to the final generation.

    ``generation_rows`` > 0 runs the engine every time that many new
    rows have spooled; 0 runs it once at end-of-stream (pure spool mode
    until then).  Returns the final generation's stats dict plus the
    spool file list."""
    files: list = []
    spooled_since_run = 0
    stats: dict = {"rows": 0, "batches": 0}

    def generation(final: bool):
        nonlocal spooled_since_run, stats
        if files:
            stats = engine.run_files(sorted(files), output_dir,
                                     micro_batch_rows=micro_batch_rows,
                                     resume=True, final=final,
                                     file_aligned_batches=True)
            spooled_since_run = 0

    import pyarrow.parquet as pq
    for fp in spool_jsonl_iter(jsonl_path, spool_dir, schema,
                               rows_per_file, **follow_kwargs):
        files.append(fp)
        spooled_since_run += pq.read_metadata(fp).num_rows
        if generation_rows and spooled_since_run >= generation_rows:
            generation(final=False)
    generation(final=True)
    stats["spool_files"] = list(files)
    return stats


def spool_jsonl_iter(jsonl_path: str, spool_dir: str, schema: pa.Schema,
                     rows_per_file: int = 100_000,
                     sort_by: Optional[Sequence[str]] = None,
                     **follow_kwargs) -> Iterator[str]:
    """Incremental variant of :func:`spool_jsonl`: yields each spool
    file path as soon as it is durably renamed, so a consumer can act
    between files."""
    import pyarrow.parquet as pq
    os.makedirs(spool_dir, exist_ok=True)
    buf: list = []
    buffered = 0
    n_written = 0

    def flush():
        nonlocal buf, buffered, n_written
        if not buffered:
            return None
        table = pa.concat_tables(buf)
        if sort_by:
            import pyarrow.compute as pc
            table = table.take(pc.sort_indices(
                table, sort_keys=[(c, "ascending") for c in sort_by]))
        fp = os.path.join(spool_dir, f"spool-{n_written:06d}.parquet")
        tmp = fp + f".tmp{os.getpid()}"
        pq.write_table(table, tmp)
        os.rename(tmp, fp)
        n_written += 1
        buf, buffered = [], 0
        return fp

    for batch in follow_jsonl(jsonl_path, schema, **follow_kwargs):
        buf.append(batch)
        buffered += batch.num_rows
        while buffered >= rows_per_file:
            table = pa.concat_tables(buf)
            head = table.slice(0, rows_per_file)
            tail = table.slice(rows_per_file)
            buf, buffered = [head], head.num_rows
            fp = flush()
            if fp:
                yield fp
            buf, buffered = ([tail], tail.num_rows) if tail.num_rows \
                else ([], 0)
    fp = flush()
    if fp:
        yield fp


def json_transcript_schema() -> pa.Schema:
    """The canonical transcript schema as produced by a JSONL collector
    (ts as int64 epoch microseconds — JSONL has no timestamp type; the
    engine's ts columns are int64-µs internally anyway)."""
    return pa.schema([
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.int64()),
    ])
