"""State-management surface: per-conversation evaluator state, checkpoint
snapshot/restore, watermark eviction, and the optional shedding valve.

The implementations live with their engines (:mod:`opencep_ray.evaluator`
holds the per-key mutable state; :mod:`opencep_ray.streaming` serializes it
into checkpoints); this package re-exports the user-facing pieces.
"""

from ..evaluator import ConversationEvaluator, SheddingConfig  # noqa: F401
from ..streaming import read_matches  # noqa: F401

__all__ = ["ConversationEvaluator", "SheddingConfig", "read_matches"]
