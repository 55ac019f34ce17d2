"""Pattern AST — the query algebra of the CEP engine.

Re-expresses the reference's pattern-structure operators
(``/root/reference/base/PatternStructure.py:49-205``, ``base/Pattern.py:14-88``)
as plain picklable dataclass-style objects.  The semantics implemented by the
evaluator (see ``opencep_ray.evaluator``) follow the reference exactly:

* ``Seq(*args)``    — all args matched, pairwise timestamp-ascending in arg order
  (non-strict: ties allowed, both orders of tied events match).
* ``And(*args)``    — all args matched within the window, any order.
* ``Or(*args)``     — any arg; rewritten to one pattern per disjunct at compile
  time (reference: ``transformation/PatternTransformer.py:93-115``).
* ``Kleene(arg, min_size, max_size)`` — one-or-more repetitions; every subset of
  in-window sub-matches that contains the newest one, sizes in
  ``[min_size, max_size]`` (reference: ``misc/Utils.py:234-244``,
  ``tree/nodes/KleeneClosureNode.py:58-80``).
* ``Neg(arg)``      — the negated event must not appear in a window-compatible
  position; bounded vs unbounded classification follows
  ``plan/negation/NegationAlgorithm.py:28-45``.

A ``Pattern`` couples a structure with a condition
(:mod:`opencep_ray.conditions`), a time window, optional consumption policies,
and an optional confidence threshold for probabilistic streams.
"""

from __future__ import annotations

from datetime import timedelta
from typing import List, Optional, Union


class PatternStructure:
    """Base class of all pattern-structure AST nodes."""

    def event_names(self) -> List[str]:
        raise NotImplementedError

    def primitive_count(self) -> int:
        return len(self.event_names())


class Primitive(PatternStructure):
    """Binds one event of ``event_type`` to the variable ``name``.

    Reference: ``PrimitiveEventStructure`` (base/PatternStructure.py:49-78).
    """

    def __init__(self, event_type: str, name: str):
        self.event_type = event_type
        self.name = name

    def event_names(self) -> List[str]:
        return [self.name]

    def __repr__(self):
        return f"{self.event_type} {self.name}"


class Composite(PatternStructure):
    def __init__(self, *args: PatternStructure):
        self.args: List[PatternStructure] = list(args)

    def event_names(self) -> List[str]:
        out: List[str] = []
        for a in self.args:
            out.extend(a.event_names())
        return out

    def duplicate_top(self) -> "Composite":
        return type(self)()


class Seq(Composite):
    def __repr__(self):
        return "SEQ(%s)" % ", ".join(map(repr, self.args))


class And(Composite):
    def __repr__(self):
        return "AND(%s)" % ", ".join(map(repr, self.args))


class Or(Composite):
    def __repr__(self):
        return "OR(%s)" % ", ".join(map(repr, self.args))


class Unary(PatternStructure):
    def __init__(self, arg: PatternStructure):
        self.arg = arg

    def event_names(self) -> List[str]:
        return self.arg.event_names()


class Kleene(Unary):
    """Kleene closure.  Reference: ``KleeneClosureOperator``
    (base/PatternStructure.py:168-191)."""

    def __init__(self, arg: PatternStructure, min_size: int = 1,
                 max_size: Optional[int] = None):
        if isinstance(arg, Neg):
            raise ValueError("Kleene closure cannot contain a negation")
        if min_size <= 0:
            raise ValueError("Kleene min_size must be positive")
        if max_size is not None and max_size < min_size:
            raise ValueError("Kleene max_size < min_size")
        super().__init__(arg)
        self.min_size = min_size
        self.max_size = max_size

    def __repr__(self):
        return "(%r)+" % (self.arg,)


class Neg(Unary):
    """Negation.  Reference: ``NegationOperator``
    (base/PatternStructure.py:194-205)."""

    def __repr__(self):
        return "NOT(%r)" % (self.arg,)


# --------------------------------------------------------------------------
# Consumption policies (reference: base/Pattern.py:155-182, misc/ConsumptionPolicy.py)


class SelectionStrategy:
    MATCH_ANY = "match_any"
    MATCH_SINGLE = "match_single"
    MATCH_NEXT = "match_next"


class ConsumptionPolicy:
    """Controls event reuse across matches.

    * ``single``: event types whose events may appear in at most one
      accepted (partial) match — enforced at the node level exactly like the
      reference's ``_filtered_events`` mechanism (tree/nodes/Node.py:133-160).
    * ``contiguous``: a list of event names that must be contiguous in
      arrival order (reference rewrites this into index-adjacency conditions,
      base/Pattern.py:175-182).
    * ``freeze``: event names whose appearance blocks creation of new
      partial matches for every name up to and including the freezer in
      any flat sequence, until the freezer is matched or expires
      (reference: tree/evaluation/TreeBasedEvaluationMechanism.py:173-231).
    """

    def __init__(self,
                 single: Union[str, List[str], None] = None,
                 secondary_selection_strategy: str = SelectionStrategy.MATCH_ANY,
                 contiguous: Optional[List[str]] = None,
                 freeze: Union[str, List[str], None] = None):
        if isinstance(single, str):
            single = [single]
        if isinstance(freeze, str):
            freeze = [freeze]
        self.single_types: List[str] = single or []
        self.secondary_selection_strategy = secondary_selection_strategy
        self.contiguous_names: List[str] = contiguous or []
        self.freeze_names: List[str] = freeze or []


class Pattern:
    """A complete CEP query.

    Reference: ``base/Pattern.py:14-57``.  ``window`` may be a ``timedelta``
    or a number of seconds.  ``confidence`` enables probabilistic-stream
    thresholding (matches with joint probability below it are dropped at
    every node, reference tree/nodes/Node.py:140-146).
    """

    def __init__(self, structure: PatternStructure, condition=None,
                 window: Union[timedelta, float] = timedelta(days=365 * 100),
                 consumption_policy: Optional[ConsumptionPolicy] = None,
                 confidence: Optional[float] = None,
                 pattern_id: Optional[int] = None):
        from .conditions import TrueCondition  # local import to avoid a cycle
        self.structure = structure
        self.condition = condition if condition is not None else TrueCondition()
        if not isinstance(window, timedelta):
            window = timedelta(seconds=float(window))
        self.window = window
        self.window_us = int(window.total_seconds() * 1_000_000)
        self.consumption_policy = consumption_policy
        self.confidence = confidence
        if confidence is not None and not (0.0 <= confidence <= 1.0):
            raise ValueError("confidence must be in [0, 1]")
        self.pattern_id = pattern_id

    def event_names(self) -> List[str]:
        return self.structure.event_names()

    def event_types(self) -> set:
        out = set()

        def walk(s):
            if isinstance(s, Primitive):
                out.add(s.event_type)
            elif isinstance(s, Composite):
                for a in s.args:
                    walk(a)
            elif isinstance(s, Unary):
                walk(s.arg)

        walk(self.structure)
        return out

    def __repr__(self):
        return f"Pattern({self.structure!r} WITHIN {self.window})"


# Aliases mirroring the reference's naming, for familiarity.
PrimitiveEventStructure = Primitive
SeqOperator = Seq
AndOperator = And
OrOperator = Or
KleeneClosureOperator = Kleene
NegationOperator = Neg
