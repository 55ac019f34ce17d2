"""Stage library: dedup, text, windows, ANN, multimodal."""

from __future__ import annotations


def use_hash_shuffle(ds):
    """Switch this dataset chain (the context is a per-dataset copy) to
    Ray Data's HASH shuffle strategy: ``groupby().map_groups`` becomes a
    pipelined hash repartition + per-block sort instead of a global sort
    barrier — the right exchange for key-partitioned stages at scale."""
    from ray.data.context import ShuffleStrategy
    ds.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    return ds
