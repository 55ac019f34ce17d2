"""Condition (predicate) language.

Re-implements the semantics of the reference condition hierarchy
(``/root/reference/condition/Condition.py``, ``BaseRelationCondition.py``,
``CompositeCondition.py``, ``KCCondition.py``) as small picklable objects.

A condition is evaluated against a *binding*: ``{event_name: payload}`` where
``payload`` is a plain dict for a primitive event and a **list of payload
dicts** for a Kleene-closure aggregated event (reference:
``tree/nodes/InternalNode.py:70-78``).

Conditions expose:

* ``names()``          — the set of event names referenced,
* ``eval(binding)``    — boolean evaluation,
* ``flatten()``        — decomposition into atomic conjuncts where possible
  (used by the planner to attach each atomic condition to the lowest tree
  node that binds all of its names, mirroring
  ``condition/CompositeCondition.py:30-64``).
"""

from __future__ import annotations

import operator
from typing import Callable, List, Optional, Sequence


class RelopTypes:
    Equal = "=="
    NotEqual = "!="
    Greater = ">"
    GreaterEqual = ">="
    Smaller = "<"
    SmallerEqual = "<="


_RELOP_FN = {
    RelopTypes.Equal: operator.eq,
    RelopTypes.NotEqual: operator.ne,
    RelopTypes.Greater: operator.gt,
    RelopTypes.GreaterEqual: operator.ge,
    RelopTypes.Smaller: operator.lt,
    RelopTypes.SmallerEqual: operator.le,
}


class Variable:
    """Extracts an attribute of the event bound to ``name``.

    ``getattr_func`` maps a payload dict to a value — the reference's
    arbitrary-lambda escape hatch (condition/Condition.py:44-70).  For the
    common case of a plain column access use ``Col(name, attr)``.
    """

    def __init__(self, name: str, getattr_func: Callable):
        self.name = name
        self.getattr_func = getattr_func

    def value(self, binding: dict):
        return self.getattr_func(binding[self.name])

    def names(self):
        return {self.name}


def Col(name: str, attr: str) -> Variable:
    """Declarative column reference: attribute ``attr`` of event ``name``."""
    v = Variable(name, _AttrGetter(attr))
    v.attr = attr  # declarative marker usable for vectorized pushdown
    return v


class _AttrGetter:
    __slots__ = ("attr",)

    def __init__(self, attr: str):
        self.attr = attr

    def __call__(self, payload):
        return payload[self.attr]


class Condition:
    def names(self) -> set:
        raise NotImplementedError

    def eval(self, binding: dict) -> bool:
        raise NotImplementedError

    def flatten(self) -> List["Condition"]:
        """Top-level conjuncts of this condition."""
        return [self]

    def is_kc_condition(self) -> bool:
        return False


class TrueCondition(Condition):
    def names(self):
        return set()

    def eval(self, binding):
        return True

    def flatten(self):
        return []


class SimpleCondition(Condition):
    """N-ary predicate over variables and/or constants.

    ``terms`` are ``Variable`` instances or plain constants;
    ``relation_op`` receives their values positionally.
    Reference: condition/Condition.py:189-226.
    """

    def __init__(self, *terms, relation_op: Callable):
        self.terms = terms
        self.relation_op = relation_op

    def names(self):
        out = set()
        for t in self.terms:
            if isinstance(t, Variable):
                out |= t.names()
        return out

    def _values(self, binding):
        return [t.value(binding) if isinstance(t, Variable) else t
                for t in self.terms]

    def eval(self, binding):
        return bool(self.relation_op(*self._values(binding)))


class BinaryCondition(SimpleCondition):
    """2-ary special case (reference: condition/Condition.py:229-258)."""

    def __init__(self, left, right, relation_op: Callable):
        super().__init__(left, right, relation_op=relation_op)
        self.left = left
        self.right = right


class BaseRelationCondition(BinaryCondition):
    """A relop condition carrying its ``RelopTypes`` tag — the tag is what
    lets the planner derive sorted-buffer probe keys, exactly like the
    reference exploits it for sorted storage
    (tree/nodes/BinaryNode.py:168-256)."""

    def __init__(self, left, right, relop: str):
        super().__init__(left, right, relation_op=_RELOP_FN[relop])
        self.relop = relop

    def __repr__(self):
        return f"({self.left} {self.relop} {self.right})"


class EqCondition(BaseRelationCondition):
    def __init__(self, left, right):
        super().__init__(left, right, RelopTypes.Equal)


class NotEqCondition(BaseRelationCondition):
    def __init__(self, left, right):
        super().__init__(left, right, RelopTypes.NotEqual)


class GreaterThanCondition(BaseRelationCondition):
    def __init__(self, left, right):
        super().__init__(left, right, RelopTypes.Greater)


class GreaterThanEqCondition(BaseRelationCondition):
    def __init__(self, left, right):
        super().__init__(left, right, RelopTypes.GreaterEqual)


class SmallerThanCondition(BaseRelationCondition):
    def __init__(self, left, right):
        super().__init__(left, right, RelopTypes.Smaller)


class SmallerThanEqCondition(BaseRelationCondition):
    def __init__(self, left, right):
        super().__init__(left, right, RelopTypes.SmallerEqual)


_FLIP_RELOP = {
    RelopTypes.Equal: RelopTypes.Equal,
    RelopTypes.NotEqual: RelopTypes.NotEqual,
    RelopTypes.Greater: RelopTypes.Smaller,
    RelopTypes.GreaterEqual: RelopTypes.SmallerEqual,
    RelopTypes.Smaller: RelopTypes.Greater,
    RelopTypes.SmallerEqual: RelopTypes.GreaterEqual,
}


def declarative_form(cond):
    """If ``cond`` is a relop between a ``Col`` reference and a constant,
    returns ``(attr, relop, const)`` normalized to column-OP-constant;
    else None.  This is the engine's vectorized-pushdown fast path — the
    analog of how the reference only exploits ``BaseRelationCondition``
    structure for sorted storage (tree/nodes/BinaryNode.py:173-189)."""
    if not isinstance(cond, BaseRelationCondition):
        return None
    left, right = cond.left, cond.right
    lcol = getattr(left, "attr", None) if isinstance(left, Variable) else None
    rcol = getattr(right, "attr", None) if isinstance(right, Variable) \
        else None
    if lcol is not None and not isinstance(right, Variable):
        return (lcol, cond.relop, right)
    if rcol is not None and not isinstance(left, Variable):
        return (rcol, _FLIP_RELOP[cond.relop], left)
    return None


def _term_signature(t):
    if isinstance(t, Variable):
        attr = getattr(t, "attr", None)
        return ("var", t.name,
                attr if attr is not None else id(t.getattr_func))
    return ("const", repr(t))


def condition_signature(cond) -> tuple:
    """Structural equivalence key for multi-pattern sharing — the analog
    of the reference's ``Condition.__eq__`` used by its tree-plan mergers
    (plan/multi/RecursiveTraversalTreePlanMerger.py:10-60): declarative
    conditions compare structurally; opaque callables compare by
    identity, so two patterns share a lambda-based condition only when
    they literally reuse the same callable object."""
    if isinstance(cond, TrueCondition):
        return ("true",)
    if isinstance(cond, BaseRelationCondition):
        return ("rel", cond.relop, _term_signature(cond.left),
                _term_signature(cond.right))
    if isinstance(cond, KCIndexCondition):
        return ("kcidx", tuple(sorted(cond.names())),
                id(cond.getattr_func), id(cond.relation_op),
                cond.first_index, cond.second_index, cond.offset)
    if isinstance(cond, KCValueCondition):
        return ("kcval", tuple(sorted(cond.names())),
                id(cond.getattr_func), id(cond.relation_op),
                repr(cond.value), cond.index)
    if isinstance(cond, SimpleCondition):  # incl. BinaryCondition
        return ("simple", id(cond.relation_op),
                tuple(_term_signature(t) for t in cond.terms))
    if isinstance(cond, AndCondition):
        return ("and", tuple(condition_signature(c)
                             for c in cond.conditions))
    if isinstance(cond, OrCondition):
        return ("or", tuple(condition_signature(c)
                            for c in cond.conditions))
    if isinstance(cond, NotCondition):
        return ("not", condition_signature(cond.condition))
    return ("obj", id(cond))


class AndCondition(Condition):
    """Conjunction with short-circuiting (reference:
    condition/CompositeCondition.py:134-171)."""

    def __init__(self, *conditions: Condition):
        self.conditions = list(conditions)

    def names(self):
        out = set()
        for c in self.conditions:
            out |= c.names()
        return out

    def eval(self, binding):
        return all(c.eval(binding) for c in self.conditions)

    def flatten(self):
        out: List[Condition] = []
        for c in self.conditions:
            out.extend(c.flatten())
        return out


class OrCondition(Condition):
    """Disjunction with short-circuiting (reference:
    condition/CompositeCondition.py:174-203).  Not decomposed: evaluated
    at the lowest node binding all of its names."""

    def __init__(self, *conditions: Condition):
        self.conditions = list(conditions)

    def names(self):
        out = set()
        for c in self.conditions:
            out |= c.names()
        return out

    def eval(self, binding):
        return any(c.eval(binding) for c in self.conditions)


class NotCondition(Condition):
    def __init__(self, condition: Condition):
        self.condition = condition

    def names(self):
        return self.condition.names()

    def eval(self, binding):
        return not self.condition.eval(binding)


# --------------------------------------------------------------------------
# Kleene-closure conditions — evaluated against the list of payloads of one
# aggregated event (reference: condition/KCCondition.py).


class KCCondition(Condition):
    def __init__(self, names: Sequence[str], getattr_func: Callable,
                 relation_op: Callable):
        self._names = set(names)
        self.getattr_func = getattr_func
        self.relation_op = relation_op

    def names(self):
        return set(self._names)

    def is_kc_condition(self):
        return True

    def _payload_list(self, binding):
        # binding maps the KC name to the list of item payloads
        for n in self._names:
            if n in binding:
                v = binding[n]
                return v if isinstance(v, list) else [v]
        return []


class KCIndexCondition(KCCondition):
    """Compare items at two fixed indices, or every pair at a fixed offset
    (AND over all pairs, early abort).  Reference: condition/KCCondition.py:52-152.
    """

    def __init__(self, names, getattr_func, relation_op,
                 first_index: Optional[int] = None,
                 second_index: Optional[int] = None,
                 offset: Optional[int] = None):
        if offset is None and (first_index is None or second_index is None):
            raise ValueError("specify either offset or both indices")
        if offset is not None and (first_index is not None or second_index is not None):
            raise ValueError("offset is mutually exclusive with explicit indices")
        if first_index is not None and first_index == second_index:
            raise ValueError("first_index == second_index")
        super().__init__(names, getattr_func, relation_op)
        self.first_index = first_index
        self.second_index = second_index
        self.offset = offset

    def eval(self, binding):
        items = self._payload_list(binding)
        n = len(items)
        if self.offset is not None:
            off = self.offset
            # the reference returns False outright when the offset does not
            # fit in the item list (condition/KCCondition.py __eval_by_offset
            # "offset too large restriction"); pairs beyond range are then
            # vacuously true
            if off >= n:
                return False
            if off >= 0:
                rng = range(0, n - off)
            else:
                rng = range(-off, n)
            for i in rng:
                if not self.relation_op(self.getattr_func(items[i]),
                                        self.getattr_func(items[i + off])):
                    return False
            return True
        if self.first_index >= n or self.second_index >= n:
            return False
        return bool(self.relation_op(self.getattr_func(items[self.first_index]),
                                     self.getattr_func(items[self.second_index])))


class KCValueCondition(KCCondition):
    """Every item (or the item at ``index``) versus a constant.
    Reference: condition/KCCondition.py:155-195."""

    def __init__(self, names, getattr_func, relation_op, value,
                 index: Optional[int] = None):
        super().__init__(names, getattr_func, relation_op)
        self.value = value
        self.index = index

    def eval(self, binding):
        items = self._payload_list(binding)
        if self.index is None:
            return all(self.relation_op(self.getattr_func(p), self.value)
                       for p in items)
        if self.index >= len(items):
            return False
        return bool(self.relation_op(self.getattr_func(items[self.index]),
                                     self.value))
