"""Scalar / payload helper functions (the engine's counterpart to the
reference's per-plugin attribute lambdas, condition/Condition.py:50-53).

The condition language itself lives in :mod:`opencep_ray.conditions`; this
package re-exports the pieces users combine into payload extractors plus
the stock text helpers.
"""

from ..conditions import Col, Variable, declarative_form  # noqa: F401
from ..sources.transcripts import text_v  # noqa: F401
from ..stages.text import stable_token_hash  # noqa: F401

__all__ = ["Col", "Variable", "declarative_form", "text_v",
           "stable_token_hash"]
