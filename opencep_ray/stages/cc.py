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

Scale shape (100 TB): every round is (1) one hash JOIN attaching each
node's current label to its outgoing edges — ``Dataset.join``, Ray's
hash-shuffle exchange — and (2) one vectorized ``groupby(node).min``
over the message stream.  Both operate on the CANDIDATE GRAPH only
(pairs that survived banding + the hot-bucket cap), which is orders of
magnitude smaller than the corpus; the per-round label table is one row
per node that appears in any pair.  Round count is bounded by the
diameter of the largest near-dup cluster — small under the bucket cap —
and ``max_rounds`` guards degenerate graphs with a loud log.  The label
table is materialized once per round (it is the loop-carried state; at
one row per candidate node this is the small side by construction).

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


def connected_components(edges: Dataset, src: str = "id_a",
                         dst: str = "id_b", num_partitions: int = 16,
                         max_rounds: int = 25) -> Dataset:
    """Labels every node of the undirected pair graph with its
    component id (the minimum node id in the component).

    Returns a Dataset with columns ``node, component`` — one row per
    node that appears in ``edges``; singleton documents (no candidate
    pair) are by definition their own component and are not emitted.
    """
    import ray.data as rd

    def bidir(batch: pa.Table) -> pa.Table:
        a, b = batch[src], batch[dst]
        return pa.concat_tables([pa.table({"u": a, "v": b}),
                                 pa.table({"u": b, "v": a})])

    edges_bidir = edges.select_columns([src, dst]) \
        .map_batches(bidir, batch_format="pyarrow")

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
