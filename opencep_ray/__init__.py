"""opencep_ray — a Ray-Data-native complex-event-processing engine.

A from-scratch re-expression of OpenCEP's pattern-matching capabilities
(SEQ / AND / OR / negation / Kleene closure with windows, conditions,
consumption policies and probabilistic confidence) as Ray Data pipelines:
``read_parquet → map_batches → hash-partition by key → stateful
per-conversation evaluation → matches table``.

See SURVEY.md for the structural analysis of the reference.
"""

from .conditions import (AndCondition, BinaryCondition, Col, Condition,
                         EqCondition, GreaterThanCondition,
                         GreaterThanEqCondition, KCIndexCondition,
                         KCValueCondition, NotCondition, NotEqCondition,
                         OrCondition, RelopTypes, SimpleCondition,
                         SmallerThanCondition, SmallerThanEqCondition,
                         TrueCondition, Variable)
from .evaluator import (CompiledPattern, ConversationEvaluator,
                        StorageConfig, compile_patterns)
from .pattern import (And, ConsumptionPolicy, Kleene, Neg, Or, Pattern,
                      Primitive, SelectionStrategy, Seq)

__all__ = [
    "Pattern", "Primitive", "Seq", "And", "Or", "Kleene", "Neg",
    "ConsumptionPolicy", "SelectionStrategy",
    "Variable", "Col", "Condition", "SimpleCondition", "BinaryCondition",
    "TrueCondition", "AndCondition", "OrCondition", "NotCondition",
    "EqCondition", "NotEqCondition", "GreaterThanCondition",
    "GreaterThanEqCondition", "SmallerThanCondition",
    "SmallerThanEqCondition", "KCIndexCondition", "KCValueCondition",
    "RelopTypes",
    "CompiledPattern", "ConversationEvaluator", "StorageConfig",
    "compile_patterns",
]

__version__ = "0.1.0"


def _install_ray_data_log_filters():
    """Silence two KNOWN-COSMETIC Ray Data log lines (and only those):

    * ``Operator produced a RefBundle with a different schema … new
      schema: .`` — fired when an operator emits a ZERO-ROW bundle whose
      schema is None (empty read splits / empty shuffle partitions at
      sub-scale inputs).  A 0-row bundle cannot "lead to unexpected
      behavior"; real schema divergences (both schemas non-empty) are NOT
      filtered and still warn.
    * ``Failed to hash the schemas (for deduplication)`` — Ray's schema
      cache can't hash parquet pandas-metadata dicts; purely an internal
      caching miss.
    """
    import logging

    class _CosmeticRayDataNoise(logging.Filter):
        def filter(self, record):
            msg = record.getMessage()
            if "different schema than the previous one" in msg \
                    and "new schema: ." in msg:
                return False
            if "Failed to hash the schemas (for deduplication)" in msg:
                return False
            return True

    for name in (
            "ray.data._internal.execution.streaming_executor_state",
            "ray.data._internal.arrow_ops.transform_pyarrow"):
        logging.getLogger(name).addFilter(_CosmeticRayDataNoise())


_install_ray_data_log_filters()
