#!/usr/bin/env python
"""Streaming CEP job entry point — submit with:

    ray job submit --working-dir . -- python scripts/run_stream_job.py \
        --input /data/transcripts --output /data/matches \
        --workers 28 --pattern flagship --checkpoint-every 8 [--resume]

On the sandbox (no cluster) it runs standalone: Ray auto-initializes in
local mode.  The job is resumable: re-submitting with ``--resume`` after
a failure continues from the last committed checkpoint and reproduces
byte-identical output.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def flagship_patterns():
    from opencep_ray import (Kleene, Neg, Pattern, Primitive, Seq,
                             SimpleCondition, Variable)
    from opencep_ray.sources.transcripts import text_v
    return [
        Pattern(Seq(Primitive("user", "a"), Primitive("assistant", "b")),
                SimpleCondition(Variable("a", text_v), Variable("b", text_v),
                                relation_op=lambda x, y: y > x),
                window=120, pattern_id=1),
        Pattern(Seq(Primitive("user", "a"),
                    Kleene(Primitive("assistant", "b"), max_size=3),
                    Primitive("tool", "c")),
                window=180, pattern_id=2),
        Pattern(Seq(Primitive("user", "a"), Neg(Primitive("tool", "x")),
                    Primitive("assistant", "b")),
                window=150, pattern_id=3),
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="directory of transcript parquet files")
    ap.add_argument("--output", required=True)
    ap.add_argument("--workers", type=int, default=0,
                    help="stateful workers (default: CPUs - 4)")
    ap.add_argument("--pattern", default="flagship",
                    choices=["flagship"])
    ap.add_argument("--micro-batch-rows", type=int, default=300_000)
    ap.add_argument("--checkpoint-every", type=int, default=8)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--ts-ordered", action="store_true",
                    help="input is globally ts-ordered: enables event-time "
                         "watermarks + state eviction")
    ap.add_argument("--key-contiguous", action="store_true",
                    help="input is conversation-contiguous (one contiguous "
                         "row range per conv_id, e.g. logs partitioned by "
                         "conversation): workers flush + recycle evaluators "
                         "for conversations absent from the current batch, "
                         "keeping live state and checkpoints bounded")
    ap.add_argument("--adaptive", action="store_true",
                    help="collect arrival rates and replan mid-stream")
    ap.add_argument("--hot-keys", default="",
                    help="comma-separated hot conversation ids to salt, "
                         "or 'auto' for a count pre-pass")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, ignore_reinit_error=True)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from opencep_ray.engine import detect_hot_keys, transcript_config
    from opencep_ray.streaming import StreamingCEP

    files = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
    if not files:
        raise SystemExit(f"no parquet files under {args.input}")

    hot = None
    if args.hot_keys == "auto":
        import ray.data as rd
        hot = detect_hot_keys(rd.read_parquet(files), "conv_id")
        print(f"[job] detected hot keys: {sorted(hot)}", file=sys.stderr)
    elif args.hot_keys:
        hot = args.hot_keys.split(",")

    workers = args.workers or max(2, int(ray.cluster_resources()
                                         .get("CPU", 8)) - 4)
    engine = StreamingCEP(flagship_patterns(),
                          transcript_config(hot_keys=hot),
                          num_workers=workers,
                          checkpoint_every=args.checkpoint_every,
                          ts_ordered_input=args.ts_ordered,
                          key_contiguous_input=args.key_contiguous,
                          adaptive=args.adaptive)
    stats = engine.run_files(files, args.output,
                             micro_batch_rows=args.micro_batch_rows,
                             resume=args.resume)
    print(json.dumps(stats))
    ray.shutdown()


if __name__ == "__main__":
    main()
