"""Approximate-nearest-neighbor search over an embedding column.

* :func:`ann_brute_force` — exact cosine top-k: the query matrix is
  broadcast once (``ray.put``), every batch does one float64 matmul and
  emits only its local top-k per query; a final tiny per-query reduction
  yields the global top-k.  Shuffle volume: O(queries × k × batches).
* :func:`build_ivf_index` / :func:`ann_ivf` — the scale path: coarse
  centroids from a deterministic sample (k-means, fixed seed, driver-side
  on the sample only), vectors assigned to their nearest centroid in one
  vectorized pass; queries probe the ``nprobe`` nearest centroids so each
  query touches only a fraction of the corpus.
* :func:`ann_lsh` — random-hyperplane LSH: each vector gets one sign-bit
  code per hash table (``n_tables`` tables × ``n_planes`` bits, planes
  drawn from a fixed seed so every worker regenerates them identically —
  nothing is trained and nothing is broadcast); a vector is a candidate
  for a query iff they share a code in at least one table.  Unlike IVF
  it needs no sample/training pass over the corpus, so it composes with
  a purely streaming read.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset


def _unit_rows(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return mat / norms[:, None]


def list_col_to_numpy(arr, dtype=np.float64) -> np.ndarray:
    """(n, d) numpy matrix from an Arrow ``list<float>`` /
    ``fixed_size_list`` column without a per-row Python round-trip: the
    flat child buffer is viewed and reshaped when rows are uniform-width
    (the embedding-column contract), falling back to ``to_pylist`` only
    for ragged data."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_fixed_size_list(arr.type):
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        return flat.reshape(len(arr), arr.type.list_size) \
            .astype(dtype, copy=False)
    if pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
        offsets = arr.offsets.to_numpy()
        widths = np.diff(offsets)
        if len(widths) and (widths == widths[0]).all() and widths[0] > 0:
            flat = arr.flatten().to_numpy(zero_copy_only=False)
            return flat.reshape(len(arr), int(widths[0])) \
                .astype(dtype, copy=False)
    return np.array(arr.to_pylist(), dtype=dtype)


class _BatchTopK:
    """Local top-k per query per batch (stateful: queries fetched once per
    actor from the object store)."""

    def __init__(self, query_ref, k: int, id_col: str, vec_col: str):
        # accepts the query payload inline (small query sets — avoids
        # object-store constructor args, which break actor restarts) or
        # as an ObjectRef for large broadcast query matrices
        q = ray.get(query_ref) if isinstance(query_ref, ray.ObjectRef) \
            else query_ref
        self.q_ids = q["ids"]
        self.q_unit = _unit_rows(np.asarray(q["vecs"], dtype=np.float64))
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64, copy=False)
        mat = list_col_to_numpy(batch[self.vec_col])
        sims = self.q_unit @ _unit_rows(mat).T        # (Q, B)
        k = min(self.k, sims.shape[1])
        out_q, out_id, out_sim = [], [], []
        for qi in range(sims.shape[0]):
            # deterministic local top-k incl. id tie-break at the boundary
            # (matches the documented sim-desc, id-asc global order)
            cols = np.lexsort((ids, -sims[qi]))[:k]
            for c in cols:
                out_q.append(self.q_ids[qi])
                out_id.append(int(ids[c]))
                out_sim.append(float(sims[qi, c]))
        return pa.table({"q_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_id, pa.int64()),
                         "cosine": pa.array(out_sim, pa.float64())})


class _GlobalTopK:
    def __init__(self, k: int):
        self.k = k
        self.__name__ = "GlobalTopK"

    def __call__(self, group: pa.Table) -> pa.Table:
        sims = group["cosine"].to_numpy(zero_copy_only=False)
        ids = group["neighbor_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -sims))[:self.k]
        return pa.table({
            "q_id": group["q_id"].take(pa.array(order)),
            "nn_rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            "neighbor_id": group["neighbor_id"].take(pa.array(order)),
            "cosine": pa.array(np.round(sims[order], 6), pa.float64()),
        })


def ann_brute_force(ds: Dataset, query_ids, query_vecs, k: int = 10,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> Dataset:
    """Exact cosine top-k of each query vector against the corpus.
    Ties broken by smaller neighbor id (deterministic).  Small query sets
    ship inline with a plain task-pool transform (no actor startup cost);
    larger ones run as an actor pool with the matrix broadcast once per
    actor (pass a ``ray.put`` ref for very large sets)."""
    q = {"ids": list(query_ids), "vecs": query_vecs}
    if len(q["ids"]) <= 64:
        local = ds.map_batches(_BatchTopK(q, k, id_col, vec_col),
                               batch_format="pyarrow")
    else:
        local = ds.map_batches(_BatchTopK, batch_format="pyarrow",
                               fn_constructor_args=(q, k, id_col, vec_col),
                               concurrency=(1, 8))
    return local.groupby("q_id", num_partitions=8).map_groups(
        _GlobalTopK(k), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# IVF (inverted-file) variant — the 100 TB path


def build_ivf_index(ds: Dataset, n_centroids: int = 16,
                    sample_size: int = 2048, seed: int = 11,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding"):
    """Coarse centroids via a few k-means iterations on a deterministic
    sample (driver-side; the sample, not the corpus, is collected)."""
    sample = ds.limit(sample_size).to_pandas()
    x = _unit_rows(np.array(sample[vec_col].tolist(), dtype=np.float64))
    rng = np.random.RandomState(seed)
    cents = x[rng.choice(len(x), size=min(n_centroids, len(x)),
                         replace=False)]
    for _ in range(10):
        assign = np.argmax(x @ cents.T, axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return cents


class _AssignCentroid:
    def __init__(self, cents_ref, id_col: str, vec_col: str):
        cents = ray.get(cents_ref) \
            if isinstance(cents_ref, ray.ObjectRef) else cents_ref
        self.cents = np.asarray(cents, dtype=np.float64)
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _unit_rows(list_col_to_numpy(batch[self.vec_col]))
        assign = np.argmax(mat @ self.cents.T, axis=1)
        return batch.append_column("centroid",
                                   pa.array(assign.astype(np.int32)))


def ann_ivf(ds: Dataset, query_ids, query_vecs, k: int = 10,
            n_centroids: int = 16, nprobe: int = 4,
            id_col: str = "vec_id", vec_col: str = "embedding") -> Dataset:
    """IVF ANN: vectors bucketed by nearest centroid; each query only scans
    the ``nprobe`` closest buckets."""
    cents = build_ivf_index(ds, n_centroids, id_col=id_col, vec_col=vec_col)
    # plain-list constructor arg: numpy args would be auto-put into the
    # object store, which breaks actor restarts (ray#53727)
    assigned = ds.map_batches(_AssignCentroid, batch_format="pyarrow",
                              fn_constructor_args=(cents.tolist(), id_col,
                                                   vec_col),
                              concurrency=(1, 8))
    q_unit = _unit_rows(np.asarray(query_vecs, dtype=np.float64))
    probe = np.argsort(-(q_unit @ cents.T), axis=1)[:, :nprobe]
    # per query: restrict the corpus to probed centroids
    allowed = {int(q): set(int(c) for c in probe[i])
               for i, q in enumerate(query_ids)}
    q_payload = {"ids": list(query_ids), "vecs": query_vecs}

    class _ProbedTopK(_BatchTopK):
        def __init__(self):
            super().__init__(q_payload, k, id_col, vec_col)
            self.allowed = allowed

        def __call__(self, batch: pa.Table) -> pa.Table:
            cents_b = batch["centroid"].to_numpy(zero_copy_only=False)
            outs = []
            for qi, q in enumerate(self.q_ids):
                mask = np.isin(cents_b, list(self.allowed[int(q)]))
                if not mask.any():
                    continue
                sub = batch.filter(pa.array(mask))
                ids = sub[self.id_col].to_numpy(zero_copy_only=False) \
                    .astype(np.int64, copy=False)
                mat = list_col_to_numpy(sub[self.vec_col])
                sims = (self.q_unit[qi:qi + 1] @ _unit_rows(mat).T)[0]
                kk = min(k, len(sims))
                part = np.argpartition(-sims, kk - 1)[:kk]
                outs.append(pa.table({
                    "q_id": pa.array([int(q)] * kk, pa.int64()),
                    "neighbor_id": pa.array(ids[part], pa.int64()),
                    "cosine": pa.array(sims[part], pa.float64()),
                }))
            if not outs:
                return pa.table({"q_id": pa.array([], pa.int64()),
                                 "neighbor_id": pa.array([], pa.int64()),
                                 "cosine": pa.array([], pa.float64())})
            return pa.concat_tables(outs)

    local = assigned.map_batches(_ProbedTopK, batch_format="pyarrow",
                                 concurrency=(1, 8))
    return local.groupby("q_id", num_partitions=8).map_groups(
        _GlobalTopK(k), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Random-hyperplane LSH variant — training-free scale path


def lsh_planes(dim: int, n_tables: int = 4, n_planes: int = 8,
               seed: int = 7) -> np.ndarray:
    """(n_tables, n_planes, dim) Gaussian hyperplanes from a fixed seed.
    Every worker regenerates these identically — the 'index' ships as
    three integers, not as data."""
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_tables, n_planes, dim))


def lsh_codes(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(n, n_tables) int64 sign-bit codes: bit p of table t is
    ``mat @ planes[t, p] >= 0``.  One matmul per table."""
    n_tables, n_planes, _ = planes.shape
    weights = 1 << np.arange(n_planes, dtype=np.int64)
    out = np.empty((mat.shape[0], n_tables), dtype=np.int64)
    for t in range(n_tables):
        bits = (mat @ planes[t].T) >= 0.0          # (n, P) bool
        out[:, t] = bits @ weights
    return out


class _LshTopK:
    """Per-batch candidate restriction + local top-k: a row is scored for
    a query iff its code matches the query's in at least one table."""

    def __init__(self, q_payload, k, id_col, vec_col, n_tables, n_planes,
                 seed, dim):
        q = ray.get(q_payload) if isinstance(q_payload, ray.ObjectRef) \
            else q_payload
        self.q_ids = q["ids"]
        self.q_unit = _unit_rows(np.asarray(q["vecs"], dtype=np.float64))
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col
        self.planes = lsh_planes(dim, n_tables, n_planes, seed)
        self.q_codes = lsh_codes(self.q_unit, self.planes)   # (Q, T)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64, copy=False)
        mat = _unit_rows(list_col_to_numpy(batch[self.vec_col]))
        codes = lsh_codes(mat, self.planes)                  # (B, T)
        outs = []
        k = self.k
        for qi, q in enumerate(self.q_ids):
            mask = (codes == self.q_codes[qi]).any(axis=1)   # (B,)
            if not mask.any():
                continue
            sims = self.q_unit[qi] @ mat[mask].T
            sub_ids = ids[mask]
            kk = min(k, len(sims))
            # deterministic boundary: sim desc, id asc
            part = np.lexsort((sub_ids, -sims))[:kk]
            outs.append(pa.table({
                "q_id": pa.array([int(q)] * kk, pa.int64()),
                "neighbor_id": pa.array(sub_ids[part], pa.int64()),
                "cosine": pa.array(sims[part], pa.float64()),
            }))
        if not outs:
            return pa.table({"q_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        return pa.concat_tables(outs)


def ann_lsh(ds: Dataset, query_ids, query_vecs, k: int = 10,
            n_tables: int = 4, n_planes: int = 8, seed: int = 7,
            id_col: str = "vec_id", vec_col: str = "embedding") -> Dataset:
    """LSH-bucketed ANN: candidates share a random-hyperplane sign code
    with the query in ≥ 1 of ``n_tables`` tables; exact cosine top-k over
    the candidates.  Codes are computed on UNIT vectors (sign bits are
    scale-invariant, but unit-normalizing keeps query and corpus codes on
    the same footing for zero vectors)."""
    qv = np.asarray(query_vecs, dtype=np.float64)
    q_payload = {"ids": list(query_ids), "vecs": qv.tolist()}
    local = ds.map_batches(
        _LshTopK, batch_format="pyarrow",
        fn_constructor_args=(q_payload, k, id_col, vec_col,
                             n_tables, n_planes, seed, qv.shape[1]),
        concurrency=(1, 8))
    return local.groupby("q_id", num_partitions=8).map_groups(
        _GlobalTopK(k), batch_format="pyarrow")
