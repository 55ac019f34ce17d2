"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale shapes (100 TB thinking):

* **exact** — hash the content per batch (vectorized), shuffle only the
  64-bit hash + id (never the full text), keep the min id per hash group;
  hash collisions are resolved inside the (tiny) group.
* **MinHash-LSH** — signatures per batch (numpy, one matmul-style pass per
  batch), explode to (band, band_hash, doc_id) rows, one groupby on the
  band key, pairs emitted per bucket; candidate verification joins
  signatures back by broadcast (small) or bucketed join (large).
* **SimHash** — 64-bit signature per batch, banded into 4×16-bit keys for
  candidate generation, Hamming-distance filter on the pair.
* **n-gram Jaccard** — blocked all-pairs inside a user-supplied block key
  (e.g. ``source``); exact within the block, SQL-expressible (the oracle
  mirrors the same blocking).
* **embedding cosine** — blocked all-pairs matmul per block.
"""

from __future__ import annotations

import hashlib
import logging
from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Count, Min

logger = logging.getLogger(__name__)

# byte-wise popcount lookup table for vectorized Hamming distances
_POPCOUNT8 = np.array([bin(x).count("1") for x in range(256)],
                      dtype=np.uint8)

# Universal-hash modulus for MinHash permutations.  2^31−1 (a Mersenne
# prime) with 30-bit shingle hashes keeps every product a·h < 2^61 inside
# int64 — a 2^61−1 modulus would overflow int64 in the a·h multiply and
# silently stop being a universal family (skewing signature uniformity).
_MERSENNE31 = (1 << 31) - 1



def _run_starts(keys: np.ndarray) -> np.ndarray:
    """Start indices of the equal-key runs of a key-sorted array — the
    shared boundary-detection idiom behind the per-key reduceat kernels
    (XOR digests, signature merges, bucket pair generation)."""
    return np.flatnonzero(np.concatenate(([True], keys[1:] != keys[:-1])))


class _ContentHash:
    def __init__(self, col: str, id_col: str):
        self.col = col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl
        # int64 reinterpret: hash-shuffle partitioning needs arrow-native
        # ints (uint64 > 2^63 would fall back to pickled objects)
        h = pl.from_arrow(batch[self.col]).hash(seed=7) \
            .reinterpret(signed=True)
        return pa.table({
            self.id_col: batch[self.id_col],
            "_h": h.to_arrow(),
            "_len": pc.cast(pc.utf8_length(batch[self.col]), pa.int64()),
        })


def exact_dedup_ids(ds: Dataset, col: str = "text",
                    id_col: str = "doc_id",
                    num_partitions: int = 32) -> Dataset:
    """Ids of the kept representative (min id) per distinct content.

    Shuffles only (id, hash) pairs.  The 64-bit polars hash plus the length
    column makes a collision vanishingly unlikely; semantics match the SQL
    oracle ``SELECT min(id) FROM t GROUP BY col``."""
    hashed = ds.map_batches(_ContentHash(col, id_col),
                            batch_format="pyarrow")
    return (hashed.groupby(["_h", "_len"], num_partitions=num_partitions)
            .aggregate(Min(id_col, alias_name=id_col))
            .select_columns([id_col]))


class _KeepMinIdRow:
    """Group = one COARSE content-hash partition holding many distinct
    texts: keep the min-id row per DISTINCT text (exact — the polars
    group_by is on the text itself, the hash only co-locates).  One UDF
    call covers every text of the partition, so invocation count is
    O(partitions), not O(distinct texts)."""

    def __init__(self, col: str, id_col: str):
        self.col = col
        self.id_col = id_col
        self.__name__ = "KeepMinIdRow"

    def __call__(self, group: pa.Table) -> pa.Table:
        import polars as pl
        df = pl.from_arrow(group)
        return (df.sort(self.id_col)
                .group_by(self.col, maintain_order=True).first()
                .to_arrow().select(group.column_names))


def exact_dedup_rows(ds: Dataset, col: str = "text",
                     id_col: str = "doc_id",
                     num_partitions: int = 32) -> Dataset:
    """Full rows of the kept representative (min id) per distinct content
    — the in-shuffle winner selection for composed pipelines: one hash
    shuffle of the rows, no driver-side id set (``exact_dedup_ids``'s
    result at 100 TB is ≈ the corpus, so a broadcast semi-join would OOM
    the driver; see VERDICT r1).  Use :func:`exact_dedup_ids` when only
    ids are needed (it never shuffles text)."""
    # coarse content-hash partition: same text ⇒ same masked hash ⇒ same
    # group, and one vectorized keep-min call handles the whole
    # partition's texts (invocations O(parts), not O(distinct texts))
    parts = max(256, num_partitions * 8)

    def add_hash(batch: pa.Table) -> pa.Table:
        import polars as pl
        h = pl.from_arrow(batch[col]).hash(seed=7).reinterpret(signed=True)
        batch = batch.append_column("_h", h.to_arrow())
        return batch.append_column(
            "_hpart", pc.bit_wise_and(batch["_h"], parts - 1))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    deduped = (hashed.groupby(["_hpart"], num_partitions=num_partitions)
               .map_groups(_KeepMinIdRow(col, id_col),
                           batch_format="pyarrow"))
    return deduped.drop_columns(["_h", "_hpart"])


# ---------------------------------------------------------------------------
# MinHash + LSH


class MinHashSignatures:
    """Per-batch MinHash signatures over word-``shingle_k``-gram shingles,
    fully vectorized: token split + k-gram construction + 64-bit shingle
    hashing run in polars over the whole batch, permutations as one numpy
    broadcast, per-document minima via ``np.minimum.reduceat`` — no
    per-document Python loop in the hot path.

    Stateful stage: permutation parameters generated once per actor from a
    fixed seed (identical on every actor)."""

    def __init__(self, col: str = "text", id_col: str = "doc_id",
                 num_perm: int = 64, shingle_k: int = 3, seed: int = 13):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE31, size=num_perm, dtype=np.int64)
        self.b = rng.randint(0, _MERSENNE31, size=num_perm, dtype=np.int64)
        self.col = col
        self.id_col = id_col
        self.num_perm = num_perm
        self.shingle_k = shingle_k

    def _gram_hashes(self, texts) -> tuple:
        """(doc_index array, 30-bit shingle-hash array), deduped per doc,
        sorted by doc.  Documents shorter than ``shingle_k`` tokens use
        the whole text as their single shingle (one gram per such doc)."""
        import polars as pl
        k = self.shingle_k
        if isinstance(texts, (pa.Array, pa.ChunkedArray)):
            tser = pl.from_arrow(pc.fill_null(
                pc.cast(texts, pa.string()), "")).rename("text")
            n_texts = len(tser)
        else:
            tser = pl.Series("text", [t or "" for t in texts])
            n_texts = len(texts)
        df = pl.DataFrame({
            "d": pl.Series(np.arange(n_texts, dtype=np.int64)),
            "text": tser,
        })
        ex = (df.with_columns(pl.col("text").str.split(" ").alias("t"))
              .select("d", "text", "t").explode("t", empty_as_null=True))
        if k > 1:
            shifted = [pl.col("t").shift(-i).over("d").alias(f"_s{i}")
                       for i in range(1, k)]
            ex = ex.with_columns(shifted)
            gram = pl.concat_str(
                [pl.col("t")] + [pl.col(f"_s{i}") for i in range(1, k)],
                separator=" ")
        else:
            gram = pl.col("t")
        # short docs (< k tokens): every shifted gram is null → fall back
        # to the whole text as the single shingle
        n_tok = pl.col("t").count().over("d")
        gram = pl.when(n_tok < k).then(pl.col("text")).otherwise(gram)
        ex = (ex.with_columns(gram.alias("g")).drop_nulls("g")
              .unique(subset=["d", "g"]).sort("d"))
        # 30-bit shingle hashes: a·h fits int64 under the 2^31−1 modulus
        h = (ex["g"].hash(seed=13).to_numpy() >> np.uint64(34)) \
            .astype(np.int64)
        return ex["d"].to_numpy(), h

    def shingle_hashes(self, text: str) -> np.ndarray:
        _, h = self._gram_hashes([text])
        return h

    def signature(self, text: str) -> np.ndarray:
        return self.signatures([text])[0]

    def signatures(self, texts, max_chunk_grams: int = 16_384
                   ) -> np.ndarray:
        """(n_docs, num_perm) uint64 signature matrix for a text batch.
        The (num_perm × grams) permutation matrix is computed in bounded
        chunks so memory stays ~``num_perm × max_chunk_grams × 8`` bytes
        regardless of batch size.  The chunk default keeps the matrix
        ~8 MB — cache-resident, which both beats the division-based
        ``%`` at any size and (measured) avoids the host's intermittent
        large-allocation dilation that stretched the old 100 MB matrix
        pass 10-20× (BASELINE.md §4 mechanism)."""
        n = len(texts)
        if n == 0:
            return np.zeros((0, self.num_perm), dtype=np.uint64)
        docs, h = self._gram_hashes(texts)
        return self._minima_from_grams(docs, h, n, max_chunk_grams)

    def _minima_from_grams(self, docs: np.ndarray, h: np.ndarray, n: int,
                           max_chunk_grams: int = 16_384) -> np.ndarray:
        """Per-permutation minima over a (doc-sorted) gram-hash stream:
        the shared kernel behind per-document signatures and the
        conversation-fragment variant (where ``docs`` indexes
        conversation runs instead of rows)."""
        bounds = np.searchsorted(docs, np.arange(n + 1))
        sig = np.empty((n, self.num_perm), dtype=np.uint64)
        M = np.int64(_MERSENNE31)
        i = 0
        while i < n:
            j = i + 1
            while j < n and bounds[j + 1] - bounds[i] <= max_chunk_grams:
                j += 1
            hs = h[bounds[i]:bounds[j]]
            # (num_perm, chunk grams) permuted hashes → per-doc minima;
            # a·h + b stays < 2^61, no int64 wraparound.  Reduce mod the
            # Mersenne prime 2^31−1 by two folds (x&M) + (x>>31) — exact
            # for x < 2^62 — plus one conditional subtract; ~25% faster
            # than `%` and identical output (pinned by the batch-vs-
            # scalar parity tests).
            m = self.a[:, None] * hs[None, :]
            m += self.b[:, None]
            t = m >> 31
            m &= M
            m += t
            t = m >> 31
            m &= M
            m += t
            m[m >= M] -= M
            local = (bounds[i:j] - bounds[i])
            # defensive clip keeps reduceat well-defined (empty docs
            # cannot occur: short docs contribute one whole-text gram)
            local = np.clip(local, 0, max(len(hs) - 1, 0))
            sig[i:j] = np.minimum.reduceat(m, local, axis=1).T
            i = j
        return sig

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = self.signatures(batch[self.col])
        return pa.table({
            self.id_col: batch[self.id_col],
            "signature": pa.array(list(sigs), pa.list_(pa.uint64())),
        })


class _BandExplode:
    def __init__(self, id_col: str, bands: int, rows_per_band: int):
        self.id_col = id_col
        self.bands = bands
        self.rows_per_band = rows_per_band

    # odd multiplicative mixing constants for the vectorized band fold
    _MIX = np.uint64(0x9E3779B97F4A7C15)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .ann import list_col_to_numpy
        n = batch.num_rows
        if n == 0:
            return pa.table({self.id_col: batch[self.id_col],
                             "band": pa.array([], pa.int32()),
                             "band_hash": pa.array([], pa.int64())})
        sigs = list_col_to_numpy(batch["signature"], dtype=np.uint64)
        r = self.rows_per_band
        bands = sigs.reshape(n, self.bands, r)
        # vectorized band fold: h = ((h ^ x_i) * MIX) per lane — a
        # deterministic 64-bit mix (wrapping uint64 arithmetic), the
        # whole batch at once
        h = np.zeros((n, self.bands), dtype=np.uint64)
        for lane in range(r):
            h = (h ^ bands[:, :, lane]) * self._MIX
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        return pa.table({
            self.id_col: pa.array(np.repeat(ids, self.bands)),
            "band": pa.array(np.tile(np.arange(self.bands, dtype=np.int32),
                                     n)),
            # int64 reinterpret (see _ContentHash)
            "band_hash": pa.array(h.reshape(-1).view(np.int64)),
        })


class _BucketPairs:
    """Per-bucket pair generation (one UDF call per LSH bucket).  Kept
    as the reference implementation / test baseline; the pipeline uses
    :class:`_BucketPairsVec`, which amortizes the per-group UDF
    overhead across ALL buckets of a coarse hash partition — at corpus
    scale the bucket count grows with the corpus, so a per-bucket
    Python invocation is the wrong shape (round-4 ds.stats() profile:
    per-group overhead was 3x the useful kernel time)."""

    def __init__(self, id_col: str, max_bucket: int = 200):
        self.id_col = id_col
        self.max_bucket = max_bucket
        self.__name__ = "BucketPairs"

    def __call__(self, group: pa.Table) -> pa.Table:
        ids = np.sort(group[self.id_col].to_numpy(zero_copy_only=False))
        m = len(ids)
        if m > self.max_bucket:
            # never a silent cap: a degenerate bucket is loud in the logs
            # so a run can be re-shingled/re-banded instead of quietly
            # losing recall
            logger.warning(
                "minhash-lsh: dropping bucket of %d docs (> cap %d); "
                "%d candidate pairs skipped",
                m, self.max_bucket, m * (m - 1) // 2)
            m = 0
        if m > 1:
            i, j = np.triu_indices(m, k=1)
            a_out, b_out = ids[i], ids[j]
        else:
            a_out = b_out = np.array([], dtype=np.int64)
        return pa.table({"id_a": pa.array(a_out, pa.int64()),
                         "id_b": pa.array(b_out, pa.int64())})


class _BucketPairsVec:
    """Vectorized multi-bucket pair generation: one UDF call per
    (band, hash-partition) group covering MANY buckets.  All buckets in
    the group are run-length encoded from the (band_hash, id)-sorted
    rows and their i<j pairs expand through pure numpy index
    arithmetic — no per-bucket Python.  Emits identical pairs to
    :class:`_BucketPairs` (equality pinned in tests/test_stages.py)."""

    def __init__(self, id_col: str, max_bucket: int = 200):
        self.id_col = id_col
        self.max_bucket = max_bucket
        self.__name__ = "BucketPairs"

    def _empty(self, id_type=None) -> pa.Table:
        id_type = id_type or pa.int64()
        return pa.table({"id_a": pa.array([], id_type),
                         "id_b": pa.array([], id_type)})

    def __call__(self, group: pa.Table) -> pa.Table:
        n = group.num_rows
        id_type = group.schema.field(self.id_col).type
        if n == 0:
            return self._empty(id_type)
        bh = group["band_hash"].to_numpy(zero_copy_only=False)
        ids = group[self.id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, bh))
        bh = bh[order]
        ids = ids[order]
        run_start = _run_starts(bh)
        sizes = np.diff(np.append(run_start, n))
        big = sizes > self.max_bucket
        for m in sizes[big]:
            logger.warning(
                "minhash-lsh: dropping bucket of %d docs (> cap %d); "
                "%d candidate pairs skipped",
                m, self.max_bucket, int(m) * (int(m) - 1) // 2)
        keep = (sizes >= 2) & ~big
        if not keep.any():
            return self._empty(id_type)
        ks, kz = run_start[keep], sizes[keep]
        total = int(kz.sum())
        # flatten kept runs: global row position per flattened element
        seg_off = np.repeat(np.cumsum(kz) - kz, kz)
        within = np.arange(total) - seg_off
        pos = np.repeat(ks, kz) + within
        # element at local index i of a size-s run pairs with s-1-i
        # later elements of the same run
        reps = np.repeat(kz, kz) - 1 - within
        pair_total = int(reps.sum())
        if pair_total == 0:
            return self._empty(id_type)
        left = np.repeat(np.arange(total), reps)
        lstart = np.repeat(np.cumsum(reps) - reps, reps)
        off = np.arange(pair_total) - lstart + 1
        right = left + off
        return pa.table({
            "id_a": pc.cast(pa.array(ids[pos[left]]), id_type),
            "id_b": pc.cast(pa.array(ids[pos[right]]), id_type)})


def minhash_lsh_candidates(ds: Dataset, col: str = "text",
                           id_col: str = "doc_id", num_perm: int = 64,
                           bands: int = 16, shingle_k: int = 3,
                           max_bucket: int = 200,
                           num_partitions: int = 32,
                           hash_parts: int = 256) -> Dataset:
    """Candidate near-duplicate pairs via banded MinHash.

    Buckets larger than ``max_bucket`` are skipped (hot-bucket guard; at
    100 TB a degenerate bucket would otherwise emit O(n²) pairs).  Every
    dropped bucket is logged with its size and skipped-pair count;
    :func:`lsh_bucket_stats` gives a queryable audit of bucket sizes vs
    the cap.

    Grouping granularity: pairs are generated per (band,
    ``band_hash % hash_parts``) group, NOT per bucket — one vectorized
    UDF call covers all buckets of the partition
    (:class:`_BucketPairsVec`), so UDF-invocation overhead is
    O(bands x hash_parts) instead of O(#buckets) ∝ corpus.  Each group
    holds ~``corpus_rows x bands / (bands x hash_parts)`` rows; raise
    ``hash_parts`` with corpus size to bound per-task group memory."""
    rows_per_band = num_perm // bands
    sigs = ds.map_batches(
        MinHashSignatures(col, id_col, num_perm, shingle_k),
        batch_format="pyarrow")
    return _lsh_band_pairs(sigs, id_col, bands, rows_per_band, max_bucket,
                           num_partitions, hash_parts)


def _lsh_band_pairs(sigs: Dataset, id_col: str, bands: int,
                    rows_per_band: int, max_bucket: int,
                    num_partitions: int, hash_parts: int) -> Dataset:
    """Banding tail shared by the document and conversation LSH paths:
    signature table → band explode → coarse-partition vectorized pair
    generation → per-pair band count."""
    exploded = sigs.map_batches(_BandExplode(id_col, bands, rows_per_band),
                                batch_format="pyarrow")
    mask = int(hash_parts) - 1
    if hash_parts & mask:
        raise ValueError(f"hash_parts must be a power of two, "
                         f"got {hash_parts}")

    def part(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_bh_part", pc.bit_wise_and(t["band_hash"], mask))

    pairs = (exploded.map_batches(part, batch_format="pyarrow")
             .groupby(["band", "_bh_part"], num_partitions=num_partitions)
             .map_groups(_BucketPairsVec(id_col, max_bucket),
                         batch_format="pyarrow"))
    # a pair found in several bands appears once
    return pairs.groupby(["id_a", "id_b"],
                         num_partitions=num_partitions).aggregate(
        Count(alias_name="n_bands"))


class ConversationMinHashFragments(MinHashSignatures):
    """Per-batch conversation-fragment MinHash: one ``(key, signature)``
    row per conversation(-block) — the signature is the per-permutation
    minimum over every turn's word-k-gram hashes in the fragment.
    Shingles never cross turn boundaries (a deliberate, documented
    approximation: a near-duplicate that only rewrites turn JOINTS can
    evade it, while any turn-level edit lands in k grams).  Because a
    MinHash signature is a minimum, fragments of one conversation merge
    by ELEMENTWISE MIN — so near-dup detection over conversations needs
    no transcript rebuild and no text shuffle, just one exchange of
    #conv-block signature rows (the `conversation_digest_ids` shape,
    applied to near-dups)."""

    def __init__(self, col: str = "text", key: str = "conv_id",
                 num_perm: int = 64, shingle_k: int = 3, seed: int = 13):
        super().__init__(col, key, num_perm, shingle_k, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        key = self.id_col
        if batch.num_rows == 0:
            return pa.table({key: batch[key].slice(0, 0),
                             "signature": pa.array([],
                                                   pa.list_(pa.uint64()))})
        sort_idx = pc.sort_indices(batch[key]).to_numpy()
        keys = batch[key].to_numpy(zero_copy_only=False)[sort_idx]
        texts = batch[self.col].take(pa.array(sort_idx))
        docs_row, h = self._gram_hashes(texts)
        run_starts = _run_starts(keys)
        run_id = np.zeros(len(keys), dtype=np.int64)
        run_id[run_starts[1:]] = 1
        run_id = np.cumsum(run_id)
        sig = self._minima_from_grams(run_id[docs_row], h,
                                      len(run_starts))
        out = pa.table({
            key: pa.array(keys[run_starts]),
            "signature": pa.array(list(sig), pa.list_(pa.uint64())),
        })
        return out.set_column(0, key, pc.cast(out[key],
                                              batch.schema.field(key).type))


class _MergeMinSignatures:
    """Group = one key-hash partition of conversation-fragment signature
    rows: elementwise-min merge into ONE signature row per conversation
    (vectorized: sorted-run reduceat over the stacked matrix)."""

    def __init__(self, key: str, num_perm: int):
        self.key = key
        self.num_perm = num_perm
        self.__name__ = "MergeMinSignatures"

    def __call__(self, group: pa.Table) -> pa.Table:
        from .ann import list_col_to_numpy
        key = self.key
        if group.num_rows == 0:
            return group.select([key, "signature"])
        sort_idx = pc.sort_indices(group[key]).to_numpy()
        keys = group[key].to_numpy(zero_copy_only=False)[sort_idx]
        mat = list_col_to_numpy(group["signature"],
                                dtype=np.uint64)[sort_idx]
        starts = _run_starts(keys)
        merged = np.minimum.reduceat(mat, starts, axis=0)
        out = pa.table({
            key: pa.array(keys[starts]),
            "signature": pa.array(list(merged), pa.list_(pa.uint64())),
        })
        return out.set_column(0, key, pc.cast(out[key],
                                              group.schema.field(key).type))


def conversation_minhash_candidates(ds: Dataset, key: str = "conv_id",
                                    col: str = "text", num_perm: int = 64,
                                    bands: int = 16, shingle_k: int = 3,
                                    max_bucket: int = 200,
                                    num_partitions: int = 32,
                                    hash_parts: int = 256,
                                    parts: int = 64) -> Dataset:
    """Near-duplicate CONVERSATION candidate pairs via banded MinHash
    over turn-level shingles — the whole-conversation sibling of
    :func:`minhash_lsh_candidates`.  Pipeline: per-batch fragment
    signatures (text never leaves the batch) → one key-hash exchange of
    #conv-block rows with elementwise-min merge → the shared LSH
    banding tail.  Same hot-bucket guard and coarse-partition pair
    kernel as the document path."""
    from .partition import with_key_part
    frags = ds.map_batches(
        ConversationMinHashFragments(col, key, num_perm, shingle_k),
        batch_format="pyarrow")
    sigs = (with_key_part(frags, key, parts=parts)
            .groupby("_kpart")
            .map_groups(_MergeMinSignatures(key, num_perm),
                        batch_format="pyarrow"))
    return _lsh_band_pairs(sigs, key, bands, num_perm // bands,
                           max_bucket, num_partitions, hash_parts)


def lsh_bucket_stats(ds: Dataset, col: str = "text",
                     id_col: str = "doc_id", num_perm: int = 64,
                     bands: int = 16, shingle_k: int = 3,
                     max_bucket: int = 200) -> Dataset:
    """Audit companion to :func:`minhash_lsh_candidates`: per-bucket doc
    counts for buckets that EXCEED the hot-bucket cap (empty result =
    nothing was dropped).  Same signature pipeline, one tiny aggregate."""
    rows_per_band = num_perm // bands
    sigs = ds.map_batches(
        MinHashSignatures(col, id_col, num_perm, shingle_k),
        batch_format="pyarrow")
    exploded = sigs.map_batches(_BandExplode(id_col, bands, rows_per_band),
                                batch_format="pyarrow")
    counts = (exploded.groupby(["band", "band_hash"], num_partitions=32)
              .aggregate(Count(alias_name="bucket_size")))
    return counts.filter(expr=f"bucket_size > {int(max_bucket)}")


class _ShingleSets:
    """(doc_id, sorted shingle-hash list) per document — the join payload
    for candidate verification (shingle ints are shuffled, never text)."""

    def __init__(self, col: str, id_col: str, shingle_k: int):
        self.hasher = MinHashSignatures(col, id_col, 1, shingle_k)
        self.col = col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        # one vectorized hash pass over the whole batch (the hasher takes
        # the Arrow column directly), then split per doc by the returned
        # doc bounds — no per-document polars construction (ADVICE r2)
        n = batch.num_rows
        docs, h = self.hasher._gram_hashes(batch[self.col])
        # per-doc sorted unique hash values (== np.unique per doc)
        order = np.lexsort((h, docs))
        docs, h = docs[order], h[order]
        if len(h):
            keep = np.ones(len(h), dtype=bool)
            np.logical_or(docs[1:] != docs[:-1], h[1:] != h[:-1],
                          out=keep[1:])
            docs, h = docs[keep], h[keep]
        bounds = np.searchsorted(docs, np.arange(n + 1))
        sh = pa.ListArray.from_arrays(pa.array(bounds, pa.int32()),
                                      pa.array(h, pa.int64()))
        return pa.table({
            self.id_col: batch[self.id_col],
            "_sh": sh,
            "_pa": pa.array([None] * n, pa.int64()),
            "_pb": pa.array([None] * n, pa.int64()),
        })


def verify_jaccard(pairs: Dataset, docs: Dataset, col: str = "text",
                   id_col: str = "doc_id", shingle_k: int = 3,
                   threshold: float = 0.5,
                   num_partitions: int = 32) -> Dataset:
    """Exact-Jaccard verification of candidate pairs as a fully
    distributed bucketed join — NO driver-side candidate set, nothing
    broadcast:

    1. each pair ``(a, b)`` explodes into two reference rows keyed by doc
       id; the docs side contributes one sorted-shingle row per doc;
    2. ``groupby(doc id)`` attaches the doc's shingle set to each of its
       pair references (docs with no references shuffle one shingle list
       and are dropped in the group);
    3. ``groupby(pair)`` brings the two sides together and computes the
       exact Jaccard, filtered by ``threshold``.

    Shuffle volume: O(corpus shingle lists + candidate pair refs)."""
    def pair_refs(batch: pa.Table) -> pa.Table:
        ids_a = pc.cast(batch["id_a"], pa.int64())
        ids_b = pc.cast(batch["id_b"], pa.int64())
        both = pa.concat_arrays([ids_a.combine_chunks(),
                                 ids_b.combine_chunks()])
        pa_col = pa.concat_arrays([ids_a.combine_chunks()] * 2)
        pb_col = pa.concat_arrays([ids_b.combine_chunks()] * 2)
        n = len(both)
        return pa.table({
            id_col: both,
            "_sh": pa.array([None] * n, pa.list_(pa.int64())),
            "_pa": pa_col,
            "_pb": pb_col,
        })

    refs = pairs.map_batches(pair_refs, batch_format="pyarrow")
    shingles = docs.map_batches(_ShingleSets(col, id_col, shingle_k),
                                batch_format="pyarrow")
    # reorder ref columns to the shingle schema for the union
    refs = refs.select_columns([id_col, "_sh", "_pa", "_pb"])
    shingles = shingles.select_columns([id_col, "_sh", "_pa", "_pb"])

    # both groupbys run on COARSE hash partitions (stages/partition.py
    # rationale) with one vectorized polars pass per partition — UDF
    # invocations O(parts), not O(docs) / O(pairs)

    def attach_vec(group: pa.Table) -> pa.Table:
        """Multi-doc attach: a polars inner join of the partition's pair
        references with its shingle rows (replaces the per-doc group)."""
        import polars as pl
        df = pl.from_arrow(group.select([id_col, "_sh", "_pa", "_pb"]))
        sh = (df.filter(pl.col("_sh").is_not_null())
              .select(id_col, "_sh").unique(subset=[id_col]))
        rf = df.filter(pl.col("_sh").is_null()).select(id_col, "_pa",
                                                       "_pb")
        j = rf.join(sh, on=id_col, how="inner").with_columns(
            (pl.col("_pb") == pl.col(id_col)).cast(pl.Int8)
            .alias("_side"))
        out = j.select("_pa", "_pb", "_side", "_sh").to_arrow()
        return pa.table({
            "_pa": pc.cast(out["_pa"], pa.int64()),
            "_pb": pc.cast(out["_pb"], pa.int64()),
            "_side": pc.cast(out["_side"], pa.int8()),
            "_sh": pc.cast(out["_sh"], pa.list_(pa.int64()))})

    def pair_jac_vec(group: pa.Table) -> pa.Table:
        """Multi-pair exact Jaccard: valid pairs (both sides present)
        explode their shingle lists once; the intersection is the count
        of shingles seen on both sides, the union n_a + n_b − inter —
        all polars group aggregations, no per-pair Python."""
        import polars as pl
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64()),
                          "jaccard": pa.array([], pa.float64())})
        if group.num_rows == 0:
            return empty
        df = pl.from_arrow(group.select(["_pa", "_pb", "_side", "_sh"]))
        stats = (df.group_by(["_pa", "_pb"])
                 .agg(pl.len().alias("_rows"),
                      pl.col("_side").n_unique().alias("_ns"),
                      pl.col("_sh").list.len().sum().alias("_tot")))
        valid = stats.filter((pl.col("_rows") == 2)
                             & (pl.col("_ns") == 2))
        if valid.height == 0:
            return empty
        dfv = df.join(valid.select("_pa", "_pb"), on=["_pa", "_pb"],
                      how="inner")
        inter = (dfv.select("_pa", "_pb", "_sh").explode("_sh", empty_as_null=True)
                 .group_by(["_pa", "_pb", "_sh"])
                 .agg(pl.len().alias("_c"))
                 .group_by(["_pa", "_pb"])
                 .agg((pl.col("_c") == 2).sum().cast(pl.Int64)
                      .alias("_inter")))
        res = (valid.join(inter, on=["_pa", "_pb"], how="left")
               .with_columns(pl.col("_inter").fill_null(0))
               .with_columns(
                   pl.when(pl.col("_tot") - pl.col("_inter") > 0)
                   .then(pl.col("_inter")
                         / (pl.col("_tot") - pl.col("_inter")))
                   .otherwise(0.0).alias("jaccard"))
               .filter(pl.col("jaccard") >= threshold)
               .select("_pa", "_pb", "jaccard"))
        out = res.to_arrow()
        return pa.table({"id_a": pc.cast(out["_pa"], pa.int64()),
                         "id_b": pc.cast(out["_pb"], pa.int64()),
                         "jaccard": pc.cast(out["jaccard"],
                                            pa.float64())})

    from .partition import with_key_part
    attached = (with_key_part(shingles.union(refs), id_col,
                              parts=max(256, num_partitions * 8))
                .groupby("_kpart", num_partitions=num_partitions)
                .map_groups(attach_vec, batch_format="pyarrow"))

    def pair_part(t: pa.Table) -> pa.Table:
        from .split import keys_to_u64, mix64
        h = mix64(keys_to_u64(t["_pa"]), salt=0x9A1) \
            ^ mix64(keys_to_u64(t["_pb"]), salt=0x9A2)
        return t.append_column(
            "_ppart", pa.array((h % np.uint64(256)).astype(np.int64)))

    return (attached.map_batches(pair_part, batch_format="pyarrow")
            .groupby("_ppart", num_partitions=num_partitions)
            .map_groups(pair_jac_vec, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# SimHash


class SimHashSignatures:
    """64-bit SimHash per document from token hashes — fully vectorized:
    one polars token explode + hash over the batch, bit matrix and
    per-document sign sums as numpy segment reductions."""

    def __init__(self, col: str = "text", id_col: str = "doc_id"):
        self.col = col
        self.id_col = id_col

    def _batch_simhash(self, texts,
                       max_chunk_tokens: int = 1_000_000) -> np.ndarray:
        import polars as pl
        n = len(texts)
        if n == 0:
            return np.zeros(0, dtype=np.uint64)
        if isinstance(texts, (pa.Array, pa.ChunkedArray)):
            tser = pl.from_arrow(pc.fill_null(
                pc.cast(texts, pa.string()), "")).rename("text")
        else:
            tser = pl.Series("text", [t or "" for t in texts])
        df = pl.DataFrame({
            "d": pl.Series(np.arange(n, dtype=np.int64)),
            "text": tser,
        })
        ex = (df.with_columns(pl.col("text").str.split(" ").alias("t"))
              .select("d", "t").explode("t", empty_as_null=True).sort("d"))
        docs = ex["d"].to_numpy()
        hs = ex["t"].hash(seed=11).to_numpy()
        bounds = np.searchsorted(docs, np.arange(n + 1))
        out = np.empty(n, dtype=np.uint64)
        i = 0
        while i < n:
            j = i + 1
            while j < n and bounds[j + 1] - bounds[i] <= max_chunk_tokens:
                j += 1
            chunk = hs[bounds[i]:bounds[j]]
            # bit matrix as uint8 (unpackbits; little bit order matches
            # (h >> k) & 1), summed per doc; sign sum = 2·Σbits − count
            bits = np.unpackbits(chunk.view(np.uint8).reshape(-1, 8),
                                 axis=1, bitorder="little")
            local = bounds[i:j] - bounds[i]
            local = np.clip(local, 0, max(len(chunk) - 1, 0))
            # accumulate uint8 bits straight into int64 (dtype arg avoids
            # materializing an int32 copy of the bit matrix)
            sums = np.add.reduceat(bits, local, axis=0, dtype=np.int64)
            counts = np.diff(bounds[i:j + 1])
            v = 2 * sums - counts[:, None]
            out[i:j] = np.packbits(v > 0, axis=1,
                                   bitorder="little").view(np.uint64)[:, 0]
            i = j
        return out

    def simhash(self, text: str) -> int:
        return int(self._batch_simhash([text])[0])

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = self._batch_simhash(batch[self.col])
        return pa.table({
            self.id_col: batch[self.id_col],
            "simhash": pa.array(sigs),
        })


def simhash_candidates(ds: Dataset, col: str = "text",
                       id_col: str = "doc_id", max_hamming: int = 3,
                       max_bucket: int = 500,
                       num_partitions: int = 32) -> Dataset:
    """Near-dup pairs with Hamming distance ≤ ``max_hamming`` found by
    16-bit banding (any pair within distance 3 shares at least one of the
    4 bands)."""
    sigs = ds.map_batches(SimHashSignatures(col, id_col),
                          batch_format="pyarrow")

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        s = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        shifts = np.uint64(16) * np.arange(4, dtype=np.uint64)
        bh = ((s[None, :] >> shifts[:, None])
              & np.uint64(0xFFFF)).astype(np.int64)
        return pa.table({id_col: pa.array(np.tile(ids, 4)),
                         "band": pa.array(np.repeat(
                             np.arange(4, dtype=np.int32), n)),
                         "band_hash": pa.array(bh.reshape(-1)),
                         "simhash": pa.array(np.tile(s, 4))})

    class _HamPairsVec:
        """One UDF per (band, hash-partition) group covering MANY
        buckets (same shape as :class:`_BucketPairsVec`): run-length
        encode buckets from (band_hash, id)-sorted rows, expand i<j
        pairs via index arithmetic, then one vectorized xor-popcount
        pass filters by Hamming distance."""

        def __init__(self):
            self.__name__ = "HamPairs"

        def _empty(self) -> pa.Table:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "hamming": pa.array([], pa.int32())})

        def __call__(self, group: pa.Table) -> pa.Table:
            n = group.num_rows
            if n == 0:
                return self._empty()
            bh = group["band_hash"].to_numpy(zero_copy_only=False)
            ids = group[id_col].to_numpy(zero_copy_only=False)
            sigs = group["simhash"].to_numpy(zero_copy_only=False) \
                .astype(np.uint64)
            order = np.lexsort((ids, bh))
            bh, ids, sigs = bh[order], ids[order], sigs[order]
            run_start = _run_starts(bh)
            sizes = np.diff(np.append(run_start, n))
            big = sizes > max_bucket
            for m in sizes[big]:
                logger.warning(
                    "simhash: dropping bucket of %d docs (> cap %d)",
                    m, max_bucket)
            keep = (sizes >= 2) & ~big
            if not keep.any():
                return self._empty()
            ks, kz = run_start[keep], sizes[keep]
            total = int(kz.sum())
            seg_off = np.repeat(np.cumsum(kz) - kz, kz)
            within = np.arange(total) - seg_off
            pos = np.repeat(ks, kz) + within
            reps = np.repeat(kz, kz) - 1 - within
            pair_total = int(reps.sum())
            if pair_total == 0:
                return self._empty()
            left = np.repeat(np.arange(total), reps)
            lstart = np.repeat(np.cumsum(reps) - reps, reps)
            right = left + (np.arange(pair_total) - lstart + 1)
            pi, pj = pos[left], pos[right]
            ok = ids[pi] != ids[pj]      # defensive: dup rows in bucket
            pi, pj = pi[ok], pj[ok]
            xors = (sigs[pi] ^ sigs[pj]).view(np.uint8).reshape(-1, 8)
            d = _POPCOUNT8[xors].sum(axis=1).astype(np.int32)
            sel = d <= max_hamming
            return pa.table({"id_a": pa.array(ids[pi[sel]], pa.int64()),
                             "id_b": pa.array(ids[pj[sel]], pa.int64()),
                             "hamming": pa.array(d[sel], pa.int32())})

    def part(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_bh_part", pc.bit_wise_and(t["band_hash"], 255))

    exploded = (sigs.map_batches(explode, batch_format="pyarrow")
                .map_batches(part, batch_format="pyarrow"))
    pairs = (exploded.groupby(["band", "_bh_part"],
                              num_partitions=num_partitions)
             .map_groups(_HamPairsVec(), batch_format="pyarrow"))
    return pairs.groupby(["id_a", "id_b"],
                         num_partitions=num_partitions).aggregate(
        Min("hamming", alias_name="hamming"))


# ---------------------------------------------------------------------------
# Blocked exact n-gram Jaccard and embedding cosine


class _BlockJaccard:
    def __init__(self, col: str, id_col: str, n: int, threshold: float):
        self.col = col
        self.id_col = id_col
        self.n = n
        self.threshold = threshold
        self.__name__ = "BlockJaccard"

    def __call__(self, group: pa.Table) -> pa.Table:
        ids = np.asarray(group[self.id_col].to_pylist(), dtype=np.int64)
        texts = group[self.col].to_pylist()
        m = len(ids)
        # per-doc gram SETS (Python per doc, not per pair); the O(m²)
        # pair scoring below is one incidence-matrix matmul
        doc_idx: list = []
        gram_list: list = []
        for d, t in enumerate(texts):
            toks = (t or "").split(" ")
            if len(toks) < self.n:
                gs = {t or ""}
            else:
                gs = {" ".join(toks[i:i + self.n])
                      for i in range(len(toks) - self.n + 1)}
            doc_idx.extend([d] * len(gs))
            gram_list.extend(gs)
        uniq, gram_ids = np.unique(np.asarray(gram_list, dtype=object),
                                   return_inverse=True)
        inc = np.zeros((m, len(uniq)), dtype=np.float32)
        inc[np.asarray(doc_idx, dtype=np.int64), gram_ids] = 1.0
        # float32 matmul holds exact integer counts (≪ 2^24)
        inter = (inc @ inc.T).astype(np.int64)
        sizes = inc.sum(axis=1).astype(np.int64)
        union = sizes[:, None] + sizes[None, :] - inter
        # exact ratio of identical ints on both sides: no rounding
        # needed (and rounding-mode-safe)
        jac = inter / np.maximum(union, 1)
        order = np.argsort(ids, kind="stable")
        jac_o = jac[np.ix_(order, order)]
        ids_o = ids[order]
        xi, yi = np.triu_indices(m, k=1)
        keep = jac_o[xi, yi] >= self.threshold
        return pa.table({"id_a": pa.array(ids_o[xi[keep]], pa.int64()),
                         "id_b": pa.array(ids_o[yi[keep]], pa.int64()),
                         "jaccard": pa.array(jac_o[xi, yi][keep],
                                             pa.float64())})


def ngram_jaccard_blocked(ds: Dataset, block_col: str, col: str = "text",
                          id_col: str = "doc_id", n: int = 2,
                          threshold: float = 0.2) -> Dataset:
    """Exact word-n-gram Jaccard over all pairs **within a block** (e.g.
    ``source``).  Blocking bounds the pair count; the SQL oracle mirrors
    the same blocking, so results are exactly comparable."""
    return ds.groupby(block_col, num_partitions=16).map_groups(
        _BlockJaccard(col, id_col, n, threshold), batch_format="pyarrow")


class _BlockCosine:
    def __init__(self, id_col: str, vec_col: str, threshold: float):
        self.id_col = id_col
        self.vec_col = vec_col
        self.threshold = threshold
        self.__name__ = "BlockCosine"

    def __call__(self, group: pa.Table) -> pa.Table:
        from .ann import list_col_to_numpy
        ids = np.asarray(group[self.id_col].to_pylist())
        mat = list_col_to_numpy(group[self.vec_col])
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        sims = unit @ unit.T
        order = np.argsort(ids, kind="stable")
        sims_o = sims[np.ix_(order, order)]
        ids_o = np.asarray(ids)[order]
        xi, yi = np.triu_indices(len(order), k=1)
        keep = sims_o[xi, yi] >= self.threshold
        # vectorized pair selection; Python round() only over the few
        # survivors to keep bit-parity with correctly-rounded round()
        s_out = [round(float(v), 6) for v in sims_o[xi, yi][keep]]
        return pa.table({"id_a": pa.array(ids_o[xi[keep]].astype(np.int64),
                                          pa.int64()),
                         "id_b": pa.array(ids_o[yi[keep]].astype(np.int64),
                                          pa.int64()),
                         "cosine": pa.array(s_out, pa.float64())})


def embedding_neardup_blocked(ds: Dataset, block_col: str = "label",
                              vec_col: str = "embedding",
                              id_col: str = "vec_id",
                              threshold: float = 0.9) -> Dataset:
    """Embedding-cosine near-dup pairs within a block (all-pairs matmul per
    block, float64)."""
    return ds.groupby(block_col, num_partitions=16).map_groups(
        _BlockCosine(id_col, vec_col, threshold), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Sort-free conversation dedup (multiset digest)


def _xor_by_key(keys: np.ndarray, vals: np.ndarray,
                counts: np.ndarray | None = None):
    """(key-sorted) xor-reduce + count per key run; returns
    (run_start_idx, xors, counts)."""
    starts = _run_starts(keys)
    xors = np.bitwise_xor.reduceat(vals, starts)
    if counts is None:
        n = np.diff(np.append(starts, len(vals))).astype(np.int64)
    else:
        n = np.add.reduceat(counts, starts).astype(np.int64)
    return starts, xors, n


def conversation_digest_ids(ds: Dataset, key: str = "conv_id",
                            order_col: str = "turn_idx",
                            col: str = "text",
                            parts: int = 64) -> Dataset:
    """Kept ``key`` (min id per distinct conversation content) WITHOUT
    rebuilding transcripts: each turn hashes ``(order_col, col)`` to 64
    bits and a conversation's digest is the XOR of its turn hashes plus
    the turn count — order-independent, so NO global sort and NO text
    shuffle ever happen (the exchange carries one (key, digest) row per
    conversation-block, then one per conversation).  Exact up to 64-bit
    digest collision (~n²/2⁶⁴ — the `exact_dedup_ids` contract); XOR
    self-cancellation cannot occur because ``order_col`` is unique
    within a conversation, making every hashed pair distinct.  Use
    :func:`ordered_collect` + :func:`exact_dedup_rows` when the
    canonical transcript itself is needed downstream.

    Precondition: two conversations are equal iff their
    ``(order_col, col)`` MULTISETS are equal — i.e. ``order_col`` is a
    canonical position label (the transcripts contract: consecutive
    0-based ``turn_idx``).  Conversations with identical text sequences
    under a DIFFERENT numbering (e.g. 3,7 vs 0,1) digest apart even
    though a separator-joined rebuild would collide them; that is
    deliberate, since rank-normalizing across batch fragments would
    need exactly the global per-conversation sort this stage exists to
    avoid.

    Turn hashes come from the repo's own splitmix64/word-fold kernel
    (`split.py:stable_str_hash_u64` — pinned constants, pinned-value
    test), NOT polars ``.hash()``, whose value may change across polars
    versions: stored digests survive environment upgrades, so
    incremental dedup against a persisted digest table is safe."""
    from .partition import with_key_part
    merged = conversation_digest_table(ds, key=key, order_col=order_col,
                                       col=col, parts=parts)
    return (with_key_part(merged, "_x", parts=parts)
            .groupby("_kpart")
            .map_groups(_keep_min_key(key), batch_format="pyarrow")
            .select_columns([key]))


def _digest_partial(key: str, order_col: str, col: str):
    """Per-batch combiner: one (key, _x, _n) fragment row per
    conversation(-block) present in the batch — text never leaves it."""
    from .split import mix64, stable_str_hash_u64

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({key: batch[key].slice(0, 0),
                             "_x": pa.array([], pa.uint64()),
                             "_n": pa.array([], pa.int64())})
        # version-stable turn hash: mix(text_hash ^ mix(order+1))
        order_u64 = batch[order_col].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        h = mix64(stable_str_hash_u64(batch[col])
                  ^ mix64(order_u64 + np.uint64(1), salt=13), salt=7)
        # group per key WITHOUT moving text: sort (key, hash) pairs only
        sort_idx = pc.sort_indices(batch[key]).to_numpy()
        keys = batch[key].to_numpy(zero_copy_only=False)[sort_idx]
        vals = h[sort_idx]
        starts, xors, n = _xor_by_key(keys, vals)
        out = pa.table({key: pa.array(keys[starts]),
                        "_x": pa.array(xors, pa.uint64()),
                        "_n": pa.array(n, pa.int64())})
        return out.set_column(0, key, pc.cast(out[key],
                                              batch.schema.field(key).type))

    return partial


def conversation_digest_table(ds: Dataset, key: str = "conv_id",
                              order_col: str = "turn_idx",
                              col: str = "text",
                              parts: int = 64) -> Dataset:
    """The PERSISTABLE side of :func:`conversation_digest_ids`: one
    ``(key, _x, _n)`` row per conversation, where ``_x`` is the
    version-stable XOR multiset digest and ``_n`` the turn count.
    Write this table out after a dedup run and feed it back to
    :func:`conversation_digest_update` to dedup later batches against
    the corpus WITHOUT re-reading it — the incremental shape a rolling
    100 TB ingest needs.  Same preconditions as
    ``conversation_digest_ids`` (``order_col`` is a canonical position
    label); digests use the repo's pinned splitmix64 kernels, so a
    stored table survives environment upgrades.

    One key-hash exchange carrying one row per conversation(-block)
    merges cross-batch fragments; turns/text never shuffle."""
    from .partition import with_key_part
    frags = ds.map_batches(_digest_partial(key, order_col, col),
                           batch_format="pyarrow")
    return (with_key_part(frags, key, parts=parts)
            .groupby("_kpart")
            .map_groups(_finish_digests(key), batch_format="pyarrow"))


def conversation_digest_update(new_ds: Dataset, stored: Dataset,
                               key: str = "conv_id",
                               order_col: str = "turn_idx",
                               col: str = "text",
                               parts: int = 64) -> Dataset:
    """Incremental conversation dedup against a persisted digest table.

    ``new_ds`` is a turns table (the new ingest batch); ``stored`` is a
    ``(key, _x, _n)`` digest table from a previous
    :func:`conversation_digest_table` /  update run (one row per KEPT
    conversation; an empty table bootstraps).  Returns the UPDATED
    digest table with a ``_new`` flag: ``_new=True`` rows are the new
    batch's survivors (content not in the stored corpus, min ``key``
    among new duplicates), ``_new=False`` rows are the stored table
    passed through.  Persist ``drop_columns(["_new"])`` as the next
    ``stored``; ``filter _new`` for the ids to ingest.

    Cost: the new batch is digested (no text shuffle, as in the batch
    path) and ONE digest-hash exchange co-locates new digests with the
    stored rows — O(|stored| + |new conversations|) rows moved, never
    the old corpus's text."""
    import pyarrow as pa

    from .partition import with_key_part
    new_table = conversation_digest_table(new_ds, key=key,
                                          order_col=order_col, col=col,
                                          parts=parts)

    def tag(flag):
        def fn(b: pa.Table) -> pa.Table:
            return b.select([key, "_x", "_n"]).append_column(
                "_new", pa.array(np.full(b.num_rows, flag)))
        fn.__name__ = f"TagNew{flag}"
        return fn

    both = new_table.map_batches(tag(True), batch_format="pyarrow") \
        .union(stored.map_batches(tag(False), batch_format="pyarrow"))
    return (with_key_part(both, "_x", parts=parts)
            .groupby("_kpart")
            .map_groups(_merge_digest_update(key), batch_format="pyarrow"))


def document_digest_update(new_ds: Dataset, stored: Dataset,
                           col: str = "text", id_col: str = "doc_id",
                           parts: int = 64) -> Dataset:
    """Incremental DOCUMENT dedup against a persisted digest table —
    the single-row sibling of :func:`conversation_digest_update`.

    ``stored`` holds ``(id_col, _x, _n)`` rows (version-stable 64-bit
    content hash + character length) from a previous
    :func:`document_digest_table` / update run; ``new_ds`` is the new
    document batch.  Returns the updated digest table with a ``_new``
    flag (True = new batch's survivors: content not in the stored
    corpus, min id among new duplicates).  One digest-hash exchange of
    one row per document; text never shuffles and the old corpus is
    never re-read.  Hashes come from the repo's pinned splitmix64
    kernel, so stored tables survive environment upgrades (unlike the
    within-run polars hash `_ContentHash` uses)."""
    from .partition import with_key_part
    from .split import stable_str_hash_u64

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({id_col: batch[id_col].slice(0, 0),
                             "_x": pa.array([], pa.uint64()),
                             "_n": pa.array([], pa.int64()),
                             "_new": pa.array([], pa.bool_())})
        return pa.table({
            id_col: batch[id_col],
            "_x": pa.array(stable_str_hash_u64(batch[col]), pa.uint64()),
            # null text hashes to the kernel's fixed sentinel; the length
            # must also be non-null (-1) or the (_x, _n) anti-join would
            # never match a stored null-text row (null != null) and
            # null-text dups would be re-ingested on every update
            "_n": pc.coalesce(
                pc.cast(pc.utf8_length(batch[col]), pa.int64()),
                pa.scalar(-1, pa.int64())),
            "_new": pa.array(np.ones(batch.num_rows, dtype=bool)),
        })

    def tag_stored(b: pa.Table) -> pa.Table:
        return b.select([id_col, "_x", "_n"]).append_column(
            "_new", pa.array(np.zeros(b.num_rows, dtype=bool)))

    both = new_ds.map_batches(partial, batch_format="pyarrow") \
        .union(stored.map_batches(tag_stored, batch_format="pyarrow"))
    return (with_key_part(both, "_x", parts=parts)
            .groupby("_kpart")
            .map_groups(_merge_digest_update(id_col),
                        batch_format="pyarrow"))


def document_digest_table(ds: Dataset, col: str = "text",
                          id_col: str = "doc_id",
                          parts: int = 64) -> Dataset:
    """The persistable ``(id_col, _x, _n)`` digest table of a document
    corpus: one row per KEPT document (min id per distinct content) —
    bootstrap of the :func:`document_digest_update` rolling-ingest
    loop."""
    import ray.data as rd
    sch = ds.schema()
    id_type = dict(zip(sch.names, sch.types))[id_col]
    empty = rd.from_arrow(pa.table({
        id_col: pa.array([], id_type),
        "_x": pa.array([], pa.uint64()),
        "_n": pa.array([], pa.int64())}))
    return document_digest_update(ds, empty, col=col, id_col=id_col,
                                  parts=parts).drop_columns(["_new"])


class _merge_digest_update:
    """Group = one digest-hash partition of tagged digest rows: stored
    rows pass through; a new row survives iff its ``(_x, _n)`` digest
    has no stored row and it holds the min key among new rows sharing
    the digest."""

    def __init__(self, key: str):
        self.key = key
        self.__name__ = "MergeDigestUpdate"

    def __call__(self, group: pa.Table) -> pa.Table:
        import polars as pl
        cols = [self.key, "_x", "_n", "_new"]
        if group.num_rows == 0:
            return group.select(cols)
        df = pl.from_arrow(group.select(cols))
        stored = df.filter(~pl.col("_new"))
        fresh = (df.filter(pl.col("_new"))
                 .join(stored.select(["_x", "_n"]).unique(),
                       on=["_x", "_n"], how="anti")
                 .sort(self.key)
                 .group_by(["_x", "_n"], maintain_order=True).first()
                 .select(cols))
        out = pl.concat([stored.select(cols), fresh]).to_arrow()
        return pa.table({
            self.key: pc.cast(out[self.key],
                              group.schema.field(self.key).type),
            "_x": pc.cast(out["_x"], pa.uint64()),
            "_n": pc.cast(out["_n"], pa.int64()),
            "_new": pc.cast(out["_new"], pa.bool_()),
        })


class _finish_digests:
    """Group = one key-hash partition of (key, _x, _n) fragments:
    xor-merge fragments into ONE digest row per conversation."""

    def __init__(self, key: str):
        self.key = key
        self.__name__ = "FinishDigests"

    def __call__(self, group: pa.Table) -> pa.Table:
        import polars as pl
        if group.num_rows == 0:
            return group.select([self.key, "_x", "_n"])
        df = pl.from_arrow(group.select([self.key, "_x", "_n"])) \
            .sort(self.key)
        keys = df[self.key].to_numpy()
        starts, xors, n = _xor_by_key(
            keys, df["_x"].to_numpy(), df["_n"].to_numpy())
        out = pa.table({self.key: pa.array(keys[starts]),
                        "_x": pa.array(xors, pa.uint64()),
                        "_n": pa.array(n, pa.int64())})
        return out.set_column(
            0, self.key,
            pc.cast(out[self.key], group.schema.field(self.key).type))


class _keep_min_key:
    """Group = one digest-hash partition of per-conversation digest
    rows: keep min key per (_x, _n)."""

    def __init__(self, key: str):
        self.key = key
        self.__name__ = "KeepMinKey"

    def __call__(self, group: pa.Table) -> pa.Table:
        import polars as pl
        if group.num_rows == 0:
            return group.select([self.key])
        df = pl.from_arrow(group.select([self.key, "_x", "_n"]))
        kept = (df.sort(self.key)
                .group_by(["_x", "_n"], maintain_order=True).first())
        out = kept.select(self.key).to_arrow()
        return pa.table({self.key: pc.cast(
            out[self.key], group.schema.field(self.key).type)})
