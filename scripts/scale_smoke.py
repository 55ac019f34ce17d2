#!/usr/bin/env python
"""10× scale smoke (round-4 VERDICT ask #1) + streaming soak evidence
(ask #7): run the flagship streaming job and the heaviest batch
pipelines at 80M turns / 500k documents on 32 CPUs, recording wall,
host busy-sec, peak host memory, and — for the streaming job —
per-micro-batch samples of live evaluator state and worker RSS (the
flat-memory evidence that eviction/recycling holds at 10×).

    python scripts/scale_smoke.py --which stream,digest,boilerplate,minhash \
        [--n-convs 4000000] [--n-docs 500000] [--out SCALE_SMOKE.json]

Each leg runs in THIS process sequentially (one Ray session); results
append to the JSON after every leg so a partial run still reports.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def host_mem_used_gb() -> float:
    """Host memory in use (total − MemAvailable): tracks real pressure,
    not page cache."""
    m = {}
    with open("/proc/meminfo") as f:
        for line in f:
            k, v = line.split(":", 1)
            m[k] = int(v.split()[0])
    return (m["MemTotal"] - m["MemAvailable"]) / 1_048_576


class MemPeak(threading.Thread):
    def __init__(self, interval: float = 1.0):
        super().__init__(daemon=True)
        self.interval = interval
        self.peak = 0.0
        self.stop_flag = False

    def run(self):
        while not self.stop_flag:
            self.peak = max(self.peak, host_mem_used_gb())
            time.sleep(self.interval)

    def finish(self) -> float:
        self.stop_flag = True
        self.join(timeout=5)
        return round(max(self.peak, host_mem_used_gb()), 2)


def timed(fn):
    import bench
    mem = MemPeak()
    mem.start()
    b0, t0 = bench._proc_busy_sec(), time.perf_counter()
    extra = fn()
    wall = round(time.perf_counter() - t0, 2)
    busy = round(bench._proc_busy_sec() - b0, 1)
    return {"wall_sec": wall, "host_busy_sec": busy,
            "peak_host_mem_gb": mem.finish(), **(extra or {})}


def leg_stream(sample_every: int) -> dict:
    import bench
    os.environ["GRAFT_SAMPLE_EVERY"] = str(sample_every)
    rows = bench.q_cep_stream()
    s = bench.LAST_STREAM_STATS
    return {"rows": rows, "matches_sink_rows": None,
            "stream_sec": s["stream_sec"], "setup_sec": s["setup_sec"],
            "worker_busy_sec": s["worker_busy_sec"],
            "workers": s["workers"], "batches": s["batches"],
            "final_live_conversations": s["live_conversations"],
            "samples": s["samples"],
            "turns_per_sec": round(rows / s["stream_sec"])}


def leg_digest(files) -> dict:
    import ray.data as rd
    from opencep_ray.stages.dedup import conversation_digest_ids
    ds = rd.read_parquet(files, columns=["conv_id", "turn_idx", "text"])
    kept = conversation_digest_ids(ds).count()
    return {"kept_conversations": kept}


def leg_boilerplate(files, min_count: int) -> dict:
    import ray
    import ray.data as rd
    from opencep_ray.stages.text import BoilerplatePrune, \
        build_boilerplate_set
    banned = build_boilerplate_set(
        rd.read_parquet(files, columns=["text"]), col="text",
        min_count=min_count)
    ds = rd.read_parquet(files, columns=["conv_id", "turn_idx", "text"])
    survivors = ds.map_batches(
        BoilerplatePrune, batch_format="pyarrow",
        fn_constructor_args=(ray.put(banned),),
        concurrency=(1, 24)).count()
    return {"banned_values": len(banned), "surviving_turns": survivors}


def leg_minhash(n_docs: int) -> dict:
    import ray.data as rd
    from opencep_ray.sources.documents import write_documents
    from opencep_ray.stages.cc import connected_components
    from opencep_ray.stages.dedup import minhash_lsh_candidates
    path = f"/tmp/graft_bench/documents_{n_docs}"
    write_documents(path, n_docs)
    docs = rd.read_parquet(sorted(glob.glob(f"{path}/*.parquet")),
                           columns=["doc_id", "text"])
    pairs = minhash_lsh_candidates(docs, shingle_k=3,
                                   hash_parts=1024).materialize()
    n_pairs = pairs.count()
    comps = connected_components(pairs, src="id_a", dst="id_b",
                                 num_partitions=32).count()
    return {"candidate_pairs": n_pairs, "component_rows": comps,
            "docs": n_docs}


def leg_ann(n_vecs: int) -> dict:
    """Brute-force vs IVF cosine top-10 over a clustered synthetic
    corpus: wall for both paths plus IVF recall@10 against the exact
    answer (self-validating — no external oracle needed)."""
    import glob
    import numpy as np
    import ray.data as rd
    from opencep_ray.sources.documents import (synth_embeddings,
                                               write_embeddings)
    from opencep_ray.stages.ann import ann_brute_force, ann_ivf, ann_lsh
    path = f"/tmp/graft_bench/embeddings_{n_vecs}"
    write_embeddings(path, n_vecs)
    q = synth_embeddings(32, seed=999)
    q_ids = q["vec_id"].to_numpy().tolist()
    q_vecs = np.array(q["embedding"].to_pylist(), dtype=np.float64)

    def run(fn, **kw):
        ds = rd.read_parquet(sorted(glob.glob(f"{path}/*.parquet")),
                             columns=["vec_id", "embedding"])
        t0 = time.perf_counter()
        out = fn(ds, q_ids, q_vecs, k=10, **kw).to_pandas()
        wall = round(time.perf_counter() - t0, 2)
        top = {qid: set(g["neighbor_id"]) for qid, g in
               out.groupby("q_id")}
        return wall, top

    bf_wall, bf = run(ann_brute_force)
    ivf_wall, ivf = run(ann_ivf, nprobe=4, n_centroids=64)
    lsh_wall, lsh = run(ann_lsh, n_tables=8, n_planes=8)

    def recall(approx):
        return round(sum(len(bf[k] & approx.get(k, set())) for k in bf)
                     / (10 * len(bf)), 3)

    return {"vecs": n_vecs, "brute_wall_sec": bf_wall,
            "ivf_wall_sec": ivf_wall, "lsh_wall_sec": lsh_wall,
            "ivf_recall_at_10": recall(ivf),
            "lsh_recall_at_10": recall(lsh)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-convs", type=int, default=4_000_000)
    ap.add_argument("--n-docs", type=int, default=500_000)
    ap.add_argument("--n-vecs", type=int, default=1_000_000)
    ap.add_argument("--which", default="stream,digest,boilerplate,minhash")
    ap.add_argument("--sample-every", type=int, default=16)
    ap.add_argument("--boilerplate-min-count", type=int,
                    default=1000)
    ap.add_argument("--out", default="SCALE_SMOKE.json")
    args = ap.parse_args()

    os.environ.setdefault("GRAFT_BENCH_CONVS", str(args.n_convs))
    os.environ.setdefault("RAY_GRAFT_CPUS", "32")
    import bench  # reads GRAFT_BENCH_CONVS at import

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=bench.NUM_CPUS,
                 include_dashboard=False, ignore_reinit_error=True)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    results = {"n_convs": args.n_convs, "n_docs": args.n_docs,
               "num_cpus": bench.NUM_CPUS,
               "host_steal_pct_pre": bench.measure_host_steal(),
               "spin_mips_pre": bench.measure_spin_mips(), "legs": {}}

    gen_t0 = time.perf_counter()
    files = sorted(glob.glob(
        f"{bench.ensure_bench_transcripts()}/*.parquet"))
    results["input_files"] = len(files)
    results["generate_or_reuse_sec"] = round(
        time.perf_counter() - gen_t0, 1)

    for leg in args.which.split(","):
        print(f"[smoke] leg {leg} ...", file=sys.stderr)
        if leg == "stream":
            results["legs"]["stream"] = timed(
                lambda: leg_stream(args.sample_every))
        elif leg == "digest":
            results["legs"]["digest"] = timed(lambda: leg_digest(files))
        elif leg == "boilerplate":
            results["legs"]["boilerplate"] = timed(
                lambda: leg_boilerplate(files, args.boilerplate_min_count))
        elif leg == "minhash":
            results["legs"]["minhash"] = timed(
                lambda: leg_minhash(args.n_docs))
        elif leg == "ann":
            results["legs"]["ann"] = timed(
                lambda: leg_ann(args.n_vecs))
        else:
            raise SystemExit(f"unknown leg {leg}")
        results["host_steal_pct_post"] = bench.measure_host_steal()
        results["spin_mips_post"] = bench.measure_spin_mips()
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"[smoke] {leg}: {results['legs'][leg]}", file=sys.stderr)

    print(json.dumps(results))
    ray.shutdown()


if __name__ == "__main__":
    main()
