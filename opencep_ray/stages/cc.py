"""Distributed connected components over candidate-duplicate pairs.

The missing middle of a fuzzy-dedup pipeline: LSH banding emits PAIRS
(:func:`opencep_ray.stages.dedup.minhash_lsh_candidates`), but dedup
decisions need CLUSTERS — the transitive closure of the pair relation —
so that A~B and B~C collapse to one keeper even when A~C was never a
candidate.  The reference engine has no analog (it has no table-level
dedup at all, SURVEY.md §2.9); this is one of the training-data-pipeline
operators this repo adds as first-class.

Algorithm: iterative min-label propagation, the standard MapReduce /
Pregel formulation of connected components (each node repeatedly adopts
the minimum label among itself and its neighbors; labels converge to the
component-minimum node id in O(component diameter) rounds).

Scale shape (100 TB): the candidate graph is orders of magnitude
smaller than the corpus (only pairs that survived banding + the
hot-bucket cap), so it is materialized ONCE into the object store and
then closed in one of two ways:

* **small graph** (``<= local_edge_threshold`` edges, the common case —
  default 10M edges ≈ 160 MB): ONE Ray task runs vectorized min-label
  propagation with pointer jumping over numpy arrays.  No per-round
  shuffles, converges in O(log diameter) in-memory sweeps.
* **giant graph** (loudly logged): iterative distributed rounds — each
  round is (1) one hash JOIN attaching each node's current label to its
  outgoing edges (``Dataset.join``, Ray's hash-shuffle exchange) and
  (2) one vectorized ``groupby(node).min`` over the message stream.
  Round count is bounded by the diameter of the largest near-dup
  cluster — small under the bucket cap — and ``max_rounds`` guards
  degenerate graphs with a loud log.  The label table is materialized
  once per round (loop-carried state, one row per candidate node).

Without the one-time edge materialization every distributed round would
re-execute the whole upstream candidate pipeline (Ray Datasets are
lazy); with it, rounds touch only the (small) graph.

Convergence detection is shuffle-free on top of the round itself: the
self-message carries the node's previous label in a separate column, so
``Min(label)`` yields the new label while ``Max(old)`` (nulls ignored)
recovers the previous one, and "changed" is a vectorized comparison —
no extra join against the prior round.
"""

from __future__ import annotations

import logging

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Max, Min

logger = logging.getLogger(__name__)


def _empty_components(node_type: pa.DataType) -> pa.Table:
    return pa.table({"node": pa.array([], node_type),
                     "component": pa.array([], node_type)})


def _drop_empty_blocks(ds: Dataset) -> Dataset:
    """Strips empty blocks from a (materialized) dataset.

    Ray's join operator emits a ZERO-COLUMN empty block for every empty
    output partition, and map operators forward empty blocks without
    invoking the UDF — so the stray blocks survive any per-batch cast.
    A later ``Dataset.join`` whose hash partition receives only such
    shards then fails inside pyarrow ("No match for key field
    reference"), because the rebuilt partition table has no columns.
    Metadata-only pass: inspects ``num_rows`` per block ref, never
    fetches block payloads to the driver."""
    import ray.data as rd

    refs = []
    for bundle in ds.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows:
                refs.append(ref)
    if not refs:
        return None
    return rd.from_arrow_refs(refs)


def _local_min_label(*tables: pa.Table) -> pa.Table:
    """Single-task kernel: min-label propagation with pointer jumping
    over the whole edge list, vectorized in numpy.  Yields the same
    labels as the distributed loop (component = min node id) — used
    interchangeably below the size threshold."""
    import numpy as np

    tbl = pa.concat_tables([t.select(["u", "v"]) for t in tables])
    u = tbl["u"].to_numpy(zero_copy_only=False)
    v = tbl["v"].to_numpy(zero_copy_only=False)
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    ui, vi = inv[:len(u)], inv[len(u):]
    label = np.arange(len(nodes), dtype=np.int64)
    while True:
        prev = label
        nxt = label.copy()
        # adopt the min label across each edge, both directions
        np.minimum.at(nxt, ui, label[vi])
        np.minimum.at(nxt, vi, label[ui])
        # pointer jumping: chase labels to their root (halves depth
        # per sweep, so convergence is O(log diameter) sweeps)
        while True:
            hop = nxt[nxt]
            if np.array_equal(hop, nxt):
                break
            nxt = hop
        label = nxt
        if np.array_equal(label, prev):
            break
    # labels are indices into the sorted unique-node array, so min
    # index == min node id (numeric or lexicographic alike)
    return pa.table({"node": pa.array(nodes),
                     "component": pa.array(nodes[label])})


def connected_components(edges: Dataset, src: str = "id_a",
                         dst: str = "id_b", num_partitions: int = 16,
                         max_rounds: int = 25,
                         local_edge_threshold: int = 10_000_000) -> Dataset:
    """Labels every node of the undirected pair graph with its
    component id (the minimum node id in the component).

    Returns a Dataset with columns ``node, component`` — one row per
    node that appears in ``edges``; singleton documents (no candidate
    pair) are by definition their own component and are not emitted.

    ``local_edge_threshold``: edge count at or below which the closure
    runs as ONE Ray task (vectorized union-find) instead of iterative
    distributed rounds.  Set to 0 to force the distributed path.
    """
    import ray
    import ray.data as rd

    # Materialize the (small-by-construction) candidate graph once:
    # every downstream consumer — the local task or each distributed
    # round — reads these blocks instead of re-running the upstream
    # candidate pipeline.
    edges_mat = edges.select_columns([src, dst]).materialize()
    n_edges = edges_mat.count()

    if n_edges <= local_edge_threshold:
        refs = [ref for bundle in edges_mat.iter_internal_ref_bundles()
                for ref, meta in bundle.blocks if meta.num_rows]
        if not refs:
            sch = edges.schema()
            node_type = (dict(zip(sch.names, sch.types)).get(src)
                         if sch is not None else None) or pa.int64()
            return rd.from_arrow(_empty_components(node_type))

        def rename(t) -> pa.Table:
            if not isinstance(t, pa.Table):
                t = pa.Table.from_pandas(t)
            return pa.table({"u": t[src], "v": t[dst]})

        kernel = ray.remote(num_returns=1)(
            lambda *ts: _local_min_label(*[rename(t) for t in ts]))
        return rd.from_arrow_refs([kernel.remote(*refs)])

    logger.warning(
        "connected_components: %d edges > local_edge_threshold=%d — "
        "falling back to iterative distributed label propagation "
        "(up to %d join+groupby rounds)", n_edges, local_edge_threshold,
        max_rounds)

    def bidir(batch: pa.Table) -> pa.Table:
        a, b = batch[src], batch[dst]
        return pa.concat_tables([pa.table({"u": a, "v": b}),
                                 pa.table({"u": b, "v": a})])

    edges_bidir = edges_mat.map_batches(bidir, batch_format="pyarrow") \
        .materialize()

    # initial labels: one row per node, label = node id
    labels = _drop_empty_blocks(
        edges_bidir.map_batches(
            lambda b: pa.table({"node": b["u"], "label": b["u"]}),
            batch_format="pyarrow")
        .groupby("node", num_partitions=num_partitions)
        .aggregate(Min("label", alias_name="label")))

    if labels is None or labels.count() == 0:
        sch = edges.schema()
        node_type = (dict(zip(sch.names, sch.types)).get(src)
                     if sch is not None else None) or pa.int64()
        return rd.from_arrow(_empty_components(node_type))

    for rnd in range(max_rounds):
        # (1) attach: label of u onto each edge u->v, emitted as a
        # message (v, label).  Hash join on the node id.
        msgs = edges_bidir.join(labels, join_type="inner",
                                num_partitions=num_partitions,
                                on=("u",), right_on=("node",)) \
            .map_batches(lambda b: pa.table({"node": b["v"],
                                             "label": b["label"],
                                             "old": pa.nulls(
                                                 b.num_rows,
                                                 b["label"].type)}),
                         batch_format="pyarrow")
        # self-message carries the previous label in `old` so the round's
        # aggregate recovers it without a second join
        selfs = labels.map_batches(
            lambda b: pa.table({"node": b["node"], "label": b["label"],
                                "old": b["label"]}),
            batch_format="pyarrow")
        # (2) vectorized min per node
        new_labels = msgs.union(selfs) \
            .groupby("node", num_partitions=num_partitions) \
            .aggregate(Min("label", alias_name="label"),
                       Max("old", alias_name="old")) \
            .materialize()
        changed = new_labels.filter(expr="label < old").count()
        labels = _drop_empty_blocks(new_labels.drop_columns(["old"]))
        if changed == 0:
            break
    else:
        logger.warning(
            "connected_components: hit max_rounds=%d before convergence "
            "(a candidate cluster has diameter > %d; labels of its nodes "
            "may still be split)", max_rounds, max_rounds)

    sch = labels.schema()
    node_type = dict(zip(sch.names, sch.types))["node"]
    out_schema = pa.schema([("node", node_type), ("component", node_type)])

    def finish(batch: pa.Table) -> pa.Table:
        # empty hash-shuffle partitions surface as zero-column blocks;
        # cast them to the output schema so downstream joins see uniform
        # blocks (same hygiene as engine.unscale)
        if batch.num_columns == 0:
            return out_schema.empty_table()
        return pa.table({"node": batch["node"],
                         "component": batch["label"]})

    return labels.map_batches(finish, batch_format="pyarrow")


def dedup_by_components(docs: Dataset, components: Dataset,
                        id_col: str = "doc_id",
                        num_partitions: int = 16) -> Dataset:
    """Keeps one document per near-dup cluster: the component minimum
    (and every document with no candidate pair).  One hash join of the
    corpus against the (small) component table; a document is dropped
    iff it appears there with ``component != node``."""
    tagged = docs.join(components, join_type="left_outer",
                       num_partitions=num_partitions,
                       on=(id_col,), right_on=("node",))

    def keep(batch: pa.Table) -> pa.Table:
        comp = batch["component"]
        ids = batch[id_col]
        mask = pc.or_kleene(pc.is_null(comp),
                            pc.equal(comp, ids))
        out = batch.filter(pc.fill_null(mask, False))
        return out.drop_columns(
            [c for c in ("component", "node") if c in out.column_names])

    return tagged.map_batches(keep, batch_format="pyarrow")
