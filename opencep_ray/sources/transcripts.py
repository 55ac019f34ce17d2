"""Deterministic synthetic conversation-transcript generator.

Produces the canonical input table of this engine (BASELINE.json
``input_hint``): ``conv_id:string, turn_idx:int32, role:string, text:string,
tool:string (nullable), ts:timestamp[us]`` — multi-turn conversation / agent
transcripts, ts non-decreasing per conversation with deliberate ties to
exercise SEQ tie semantics, numeric condition material embedded
deterministically in ``text`` (FIXTURES.md §1).

Vectorized with numpy; a fixed seed makes every call reproducible.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

ROLES = np.array(["user", "assistant", "tool", "system"])
TOOLS = np.array(["search", "code", "browser", "calc"])

SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])


def synth_transcripts(n_convs: int = 100, avg_turns: int = 20,
                      seed: int = 42, start_us: int = 1_700_000_000_000_000,
                      tie_prob: float = 0.15, conv_offset: int = 0) -> pa.Table:
    """Generates ``n_convs`` conversations with ~``avg_turns`` turns each.

    ``conv_offset`` shifts the numeric part of ``conv_id`` so independent
    shards (see :func:`write_transcripts_sharded`) produce globally unique
    conversation ids.  The default 0 keeps output bit-identical to the
    original single-shot generator (md5-pinned in tests)."""
    rng = np.random.RandomState(seed)
    turns = rng.randint(max(2, avg_turns // 2), avg_turns * 3 // 2 + 1,
                        size=n_convs)
    total = int(turns.sum())

    conv_ord = np.repeat(np.arange(n_convs), turns)
    # ramp 0..t-1 per conversation without a per-conv Python loop
    conv_first = np.zeros(n_convs, dtype=np.int64)
    conv_first[1:] = np.cumsum(turns)[:-1]
    turn_idx = (np.arange(total, dtype=np.int64)
                - conv_first[conv_ord]).astype(np.int32)

    # role cycle user → assistant with tool/system interludes
    r = rng.rand(total)
    role_idx = np.where(turn_idx % 2 == 0, 0, 1)          # user / assistant
    role_idx = np.where((r < 0.18) & (turn_idx > 0), 2, role_idx)  # tool
    role_idx = np.where((r > 0.97), 3, role_idx)           # system

    # draw position must stay here (RNG order fixes every later column)
    rng_tool_idx = rng.randint(0, len(TOOLS), size=total)

    # per-conversation start offset + non-decreasing gaps with ties
    conv_start = (rng.randint(0, 30 * 24 * 3600, size=n_convs).astype(np.int64)
                  * 1_000_000)
    gaps = rng.randint(1, 120, size=total).astype(np.int64) * 1_000_000
    gaps[rng.rand(total) < tie_prob] = 0
    first_of_conv = np.zeros(total, dtype=bool)
    first_of_conv[np.cumsum(turns)[:-1]] = True
    first_of_conv[0] = True
    gaps[first_of_conv] = 0
    # cumulative sum within each conversation
    cum = np.cumsum(gaps)
    conv_first_pos = np.zeros(n_convs, dtype=np.int64)
    conv_first_pos[1:] = np.cumsum(turns)[:-1]
    ts = start_us + conv_start[conv_ord] + cum - cum[conv_first_pos][conv_ord]

    # deterministic numeric material inside text: "msg <n> v=<v>".
    # All string construction runs through Arrow C kernels — np.char /
    # .tolist() cost ~µs/row and made an 80M-turn table take ~an hour;
    # this path builds it in seconds.  Values are BIT-IDENTICAL to the
    # original np.char formatting (pinned in tests).
    import pyarrow.compute as pc
    v = rng.randint(0, 100, size=total)
    if conv_offset + n_convs > 10_000_000:
        raise ValueError("conv_id is 7 digits: conv_offset + n_convs must "
                         "stay below 10M")
    conv_ids = pc.binary_join_element_wise(
        pa.scalar("c"),
        pc.utf8_lpad(pc.cast(pa.array(conv_ord + conv_offset), pa.string()),
                     7, "0"),
        pa.scalar(""))
    texts = pc.binary_join_element_wise(
        pa.scalar("msg "),
        pc.cast(pa.array(turn_idx, pa.int32()), pa.string()),
        pa.scalar(" v="),
        pc.cast(pa.array(v), pa.string()),
        pa.scalar(""))
    role_arr = pc.take(pa.array(ROLES.tolist(), pa.string()),
                       pa.array(role_idx))
    # tool name only on tool turns (null elsewhere)
    tool_pick = pc.take(pa.array(TOOLS.tolist(), pa.string()),
                        pa.array(rng_tool_idx))
    tool_arr = pc.if_else(pa.array(role_idx == 2), tool_pick,
                          pa.scalar(None, pa.string()))

    return pa.table({
        "conv_id": conv_ids,
        "turn_idx": pa.array(turn_idx, pa.int32()),
        "role": role_arr,
        "text": texts,
        "tool": tool_arr,
        "ts": pa.array(ts, pa.timestamp("us")),
    })


def text_v(payload: dict) -> int:
    """Extracts the deterministic numeric attribute from a turn's text."""
    text = payload["text"]
    return int(text[text.rfind("=") + 1:])


def write_transcripts(path: str, n_convs: int, avg_turns: int = 20,
                      seed: int = 42, rows_per_file: int = 500_000):
    """Writes the synthetic table as (possibly several) parquet files."""
    import pyarrow.parquet as pq
    import os
    os.makedirs(path, exist_ok=True)
    table = synth_transcripts(n_convs, avg_turns, seed)
    n = table.num_rows
    part = 0
    for lo in range(0, n, rows_per_file):
        chunk = table.slice(lo, rows_per_file)
        pq.write_table(chunk, os.path.join(path, f"part-{part:05d}.parquet"))
        part += 1
    return n


def _synth_shard(path: str, shard: int, conv_lo: int, n_convs: int,
                 avg_turns: int, seed: int, rows_per_file: int) -> int:
    """Generates one conversation range and writes its parquet file(s).
    Runs either inline or as a Ray task — pure function of its args.
    Files land via tmp+rename behind a per-shard ``_done`` marker, so a
    killed generation never leaves a truncated shard that a later run
    would silently reuse, and a re-run skips finished shards (the
    write_documents discipline)."""
    import os

    import pyarrow.parquet as pq
    params = f"{conv_lo}|{n_convs}|{avg_turns}|{seed}|{rows_per_file}"
    done = os.path.join(path, f"shard-{shard:04d}._done")
    if os.path.exists(done):
        content = open(done).read().split("\n")
        # params line guards against reusing a shard generated with a
        # different (n_convs, seed, ...) into the same directory
        if len(content) >= 2 and content[1] == params:
            return int(content[0])
    table = synth_transcripts(n_convs, avg_turns,
                              seed=seed + 1_000_003 * (shard + 1),
                              conv_offset=conv_lo)
    for j, lo in enumerate(range(0, table.num_rows, rows_per_file)):
        fp = os.path.join(path, f"shard-{shard:04d}-{j:03d}.parquet")
        tmp = fp + f".tmp{os.getpid()}"
        pq.write_table(table.slice(lo, rows_per_file), tmp)
        os.rename(tmp, fp)
    with open(done + f".tmp{os.getpid()}", "w") as f:
        f.write(f"{table.num_rows}\n{params}")
    os.rename(done + f".tmp{os.getpid()}", done)
    return table.num_rows


def write_transcripts_sharded(path: str, n_convs: int, avg_turns: int = 20,
                              seed: int = 42,
                              convs_per_shard: int = 100_000,
                              rows_per_file: int = 500_000) -> int:
    """Parallel deterministic generation for large corpora.

    Each shard of ``convs_per_shard`` conversations is generated by an
    independent, fixed-seed RNG stream (seed + 1000003·(shard+1)) with a
    ``conv_offset`` making conversation ids globally unique, so the output
    is a pure function of (n_convs, avg_turns, seed, convs_per_shard) —
    identical whether shards run sequentially or as parallel Ray tasks,
    and at any parallelism level.  NOT bit-identical to
    :func:`write_transcripts` (different RNG stream); the single-shot
    writer stays canonical for oracle fixtures.  This is the 100 TB-shaped
    path: no whole-table driver materialization — each shard is built and
    written by its own worker."""
    import os
    os.makedirs(path, exist_ok=True)
    corpus_params = (f"{n_convs}|{avg_turns}|{seed}|{convs_per_shard}|"
                     f"{rows_per_file}")
    complete = os.path.join(path, "_COMPLETE")
    if os.path.exists(complete):
        content = open(complete).read().split("\n")
        if len(content) >= 2 and content[1] == corpus_params:
            return int(content[0])   # already generated with these params
        raise ValueError(
            f"{path} holds a corpus generated with different parameters "
            f"({content[1:] or 'legacy marker'} vs {corpus_params}); "
            "refusing to mix corpora in one directory — use a fresh path")
    shards = [(i, lo, min(convs_per_shard, n_convs - lo))
              for i, lo in enumerate(range(0, n_convs, convs_per_shard))]
    try:
        import ray
        use_ray = ray.is_initialized() and len(shards) > 1
    except ImportError:  # pragma: no cover - ray is always present here
        use_ray = False
    if use_ray:
        fn = ray.remote(num_cpus=1)(_synth_shard)
        counts = ray.get([
            fn.remote(path, i, lo, cnt, avg_turns, seed, rows_per_file)
            for i, lo, cnt in shards])
    else:
        counts = [_synth_shard(path, i, lo, cnt, avg_turns, seed,
                               rows_per_file) for i, lo, cnt in shards]
    total = int(sum(counts))
    # whole-corpus completeness marker (total + generation params):
    # consumers that skip generation when files exist must check THIS,
    # not a bare glob — a killed run leaves complete shards for a
    # subset of the corpus, and a params mismatch means a different
    # corpus entirely
    with open(complete + f".tmp{os.getpid()}", "w") as f:
        f.write(f"{total}\n{corpus_params}")
    os.rename(complete + f".tmp{os.getpid()}", complete)
    return total
