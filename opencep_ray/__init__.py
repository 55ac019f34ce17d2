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
from .evaluator import CompiledPattern, ConversationEvaluator, compile_patterns
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
    "CompiledPattern", "ConversationEvaluator", "compile_patterns",
]

__version__ = "0.1.0"
