"""Deterministic synthetic web-document corpus for scale runs.

The sf*/documents.parquet testdata tops out at 5k rows — fine for
correctness, useless for 10× scale smokes of the dedup family.  This
generator builds an arbitrarily large corpus with the structure those
pipelines actually exercise:

* Zipf-skewed vocabulary (hot head + long tail) so MinHash buckets and
  boilerplate censuses see realistic skew;
* planted EXACT duplicates (every ``dup_every``-th doc copies an earlier
  doc verbatim) and NEAR duplicates (every ``near_every``-th doc copies
  an earlier doc with ~6% of tokens resampled) so LSH → verify → CC has
  real clusters to find, with deterministic positions for spot checks;
* fully vectorized construction (one flat word-index array + offset
  gathers + Arrow ``binary_join``), same discipline as
  ``transcripts.synth_transcripts`` — the fixture must never be the
  bottleneck of the run it feeds.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _copy_ranges(flat: np.ndarray, starts_dst: np.ndarray,
                 starts_src: np.ndarray, lens: np.ndarray) -> None:
    """flat[dst:dst+len] = flat[src:src+len] for each range, vectorized
    (one gather over index arithmetic — no per-range Python copy)."""
    if len(lens) == 0 or lens.sum() == 0:
        return
    total = int(lens.sum())
    within = np.arange(total, dtype=np.int64) \
        - np.repeat(np.cumsum(lens) - lens, lens)
    dst = np.repeat(starts_dst, lens) + within
    src = np.repeat(starts_src, lens) + within
    flat[dst] = flat[src]
    return dst


def synth_documents(n_docs: int, seed: int = 7, vocab_size: int = 20_000,
                    min_words: int = 60, max_words: int = 180,
                    dup_every: int = 25, near_every: int = 17,
                    id_offset: int = 0) -> pa.Table:
    """``n_docs`` documents with the sf*/documents.parquet schema
    (doc_id, text, lang, source, n_chars)."""
    rng = np.random.RandomState(seed)
    lens = rng.randint(min_words, max_words + 1, n_docs).astype(np.int64)
    i = np.arange(n_docs, dtype=np.int64)
    exact = (i % dup_every == dup_every - 1) & (i >= dup_every - 1)
    near = (i % near_every == near_every - 1) & (i >= near_every - 1) \
        & ~exact
    src = np.where(exact, i - (dup_every - 1),
                   np.where(near, i - (near_every - 1), i))
    # resolve source CHAINS to a base (unflagged) doc: copies run on the
    # flat word array reading source positions, so a source that is
    # itself a planted copy would be read before its own overwrite and
    # the "verbatim duplicate" contract would silently break (~6% of
    # exact positions at the old one-hop rule).  src strictly decreases
    # along a chain, so this converges in a few hops.
    while True:
        nxt = src[src]
        if (nxt == src).all():
            break
        src = nxt
    # duplicate docs inherit the source length (offsets must be fixed
    # BEFORE the flat array exists)
    lens = lens[src]
    starts = np.cumsum(lens) - lens
    total = int(lens.sum())
    # Zipf-ish skew: a small hot head plus a long tail
    flat = (rng.rand(total) ** 2.5 * vocab_size).astype(np.int32)
    _copy_ranges(flat, starts[exact], starts[src[exact]], lens[exact])
    dst_near = _copy_ranges(flat, starts[near], starts[src[near]],
                            lens[near])
    if dst_near is not None:
        perturb = rng.rand(len(dst_near)) < 0.06
        flat[dst_near[perturb]] = (rng.rand(int(perturb.sum())) ** 2.5
                                   * vocab_size).astype(np.int32)
    words = pa.array([f"w{k:05d}" for k in range(vocab_size)], pa.string())
    gathered = words.take(pa.array(flat))
    offsets = np.empty(n_docs + 1, np.int64)
    offsets[0] = 0
    np.cumsum(lens, out=offsets[1:])
    texts = pc.binary_join(
        pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()),
                                      gathered), " ")
    doc_id = pa.array(i + id_offset, pa.int64())
    return pa.table({
        "doc_id": doc_id,
        "text": texts,
        "lang": pa.array(["en"] * n_docs),
        "source": pc.binary_join_element_wise(
            pa.scalar("src"),
            pc.cast(pc.bit_wise_and(pa.array(i + id_offset), 15),
                    pa.string()), pa.scalar("")),
        "n_chars": pc.cast(pc.utf8_length(texts), pa.int64()),
    })


def write_documents(path: str, n_docs: int, seed: int = 7,
                    docs_per_file: int = 100_000, **kwargs) -> int:
    """Sharded parquet writer; each shard generates independently (its
    own seed + id offset) so memory is bounded by the shard, not the
    corpus, and a re-run can skip finished shards."""
    import os
    import pyarrow.parquet as pq
    os.makedirs(path, exist_ok=True)
    part = 0
    for lo in range(0, n_docs, docs_per_file):
        n = min(docs_per_file, n_docs - lo)
        fp = os.path.join(path, f"part-{part:05d}.parquet")
        if not os.path.exists(fp):
            tbl = synth_documents(n, seed=seed + part, id_offset=lo,
                                  **kwargs)
            tmp = fp + f".tmp{os.getpid()}"
            pq.write_table(tbl, tmp)
            os.rename(tmp, fp)
        part += 1
    return n_docs


def synth_embeddings(n_vecs: int, dim: int = 64, n_clusters: int = 64,
                     seed: int = 3, id_offset: int = 0,
                     noise: float = 0.15) -> pa.Table:
    """Deterministic clustered embeddings with the sf*/embeddings.parquet
    schema (vec_id, embedding list<float>, label).  Vectors are latent
    centroids (FIXED global seed — identical across shards, so IVF/LSH
    bucketing sees the same structure at any sharding) plus Gaussian
    noise from the shard seed; label = the generating centroid, giving
    ANN smoke legs a ground-truth neighborhood signal."""
    if n_vecs * dim >= 2 ** 31:
        raise ValueError(
            f"n_vecs*dim = {n_vecs * dim} overflows the list<float> "
            "int32 offsets (the embeddings.parquet schema); generate in "
            "shards via write_embeddings instead")
    cent_rng = np.random.RandomState(97)
    cents = cent_rng.randn(n_clusters, dim)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    rng = np.random.RandomState(seed)
    assign = rng.randint(0, n_clusters, n_vecs)
    x = (cents[assign] + noise * rng.randn(n_vecs, dim)) \
        .astype(np.float32)
    flat = pa.array(x.reshape(-1), pa.float32())
    offsets = pa.array(np.arange(n_vecs + 1, dtype=np.int32) * dim)
    return pa.table({
        "vec_id": pa.array(np.arange(n_vecs, dtype=np.int64) + id_offset),
        "embedding": pa.ListArray.from_arrays(offsets, flat),
        "label": pa.array(assign.astype(np.int32)),
    })


def write_embeddings(path: str, n_vecs: int, dim: int = 64, seed: int = 3,
                     vecs_per_file: int = 250_000, **kwargs) -> int:
    """Sharded parquet writer with the write_documents discipline:
    per-shard seeds + id offsets, finished shards skipped on re-run."""
    import os
    import pyarrow.parquet as pq
    os.makedirs(path, exist_ok=True)
    part = 0
    for lo in range(0, n_vecs, vecs_per_file):
        n = min(vecs_per_file, n_vecs - lo)
        fp = os.path.join(path, f"part-{part:05d}.parquet")
        if not os.path.exists(fp):
            tbl = synth_embeddings(n, dim=dim, seed=seed + part,
                                   id_offset=lo, **kwargs)
            tmp = fp + f".tmp{os.getpid()}"
            pq.write_table(tbl, tmp)
            os.rename(tmp, fp)
        part += 1
    return n_vecs
