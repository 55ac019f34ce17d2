"""Pattern rewrite rules, applied to a fixpoint before compilation.

Re-implements the semantics of the reference's transformation layer
(``/root/reference/transformation/PatternTransformer.py:64-150``,
``PatternPreprocessor.py:9-94``):

* double-negation elimination:  NOT(NOT(x)) → x
* De Morgan:                    NOT(OR(a, b))  → AND(NOT a, NOT b)
                                NOT(AND(a, b)) → OR(NOT a, NOT b)
* AND flattening:               AND(a, AND(b, c)) → AND(a, b, c)
* pull OR to the top:           SEQ(a, OR(b, c)) → OR(SEQ(a, b), SEQ(a, c))
* split a top-level OR into one pattern per disjunct, all carrying the
  original pattern id — the engine then runs them as a multi-pattern union
  (the reference does exactly this: OR is never evaluated directly,
  ``transformation/PatternTransformer.py:93-115``).
"""

from __future__ import annotations

from itertools import product
from typing import List

from .pattern import And, Composite, Kleene, Neg, Or, Pattern, Primitive, Seq


def _rewrite(s):
    """One bottom-up rewrite pass; returns a new structure."""
    if isinstance(s, Primitive):
        return s
    if isinstance(s, Kleene):
        return Kleene(_rewrite(s.arg), s.min_size, s.max_size)
    if isinstance(s, Neg):
        inner = _rewrite(s.arg)
        if isinstance(inner, Neg):          # double negation
            return _rewrite(inner.arg)
        if isinstance(inner, Or):           # De Morgan NOT-OR
            return And(*[_rewrite(Neg(a)) for a in inner.args])
        if isinstance(inner, And):          # De Morgan NOT-AND
            return Or(*[_rewrite(Neg(a)) for a in inner.args])
        return Neg(inner)
    if isinstance(s, Composite):
        args = [_rewrite(a) for a in s.args]
        # AND/SEQ/OR flattening of same-type children (AND and OR only,
        # SEQ flattening also preserves order so it is safe too)
        flat = []
        for a in args:
            if type(a) is type(s) and isinstance(a, (And, Or)):
                flat.extend(a.args)
            else:
                flat.append(a)
        args = flat
        if isinstance(s, (Seq, And)) and any(isinstance(a, Or) for a in args):
            # pull OR up: cartesian product over OR children
            choice_lists = [a.args if isinstance(a, Or) else [a]
                            for a in args]
            disjuncts = [type(s)(*combo) for combo in product(*choice_lists)]
            return Or(*disjuncts)
        out = type(s)(*args)
        return out
    raise ValueError(f"unsupported structure {s!r}")


def rewrite_to_fixpoint(structure, max_iters: int = 10):
    prev = repr(structure)
    for _ in range(max_iters):
        structure = _rewrite(structure)
        cur = repr(structure)
        if cur == prev:
            break
        prev = cur
    return structure


def prepare_patterns(patterns: List[Pattern]) -> List[Pattern]:
    """Rewrites each pattern and splits top-level ORs into one pattern per
    disjunct (all disjuncts keep the source pattern's id)."""
    out: List[Pattern] = []
    for i, p in enumerate(patterns):
        pid = p.pattern_id if p.pattern_id is not None else i
        s = rewrite_to_fixpoint(p.structure)
        disjuncts = s.args if isinstance(s, Or) else [s]
        for d in disjuncts:
            cond = _project_condition(p.condition, set(d.event_names()))
            q = Pattern(d, cond, p.window,
                        p.consumption_policy, p.confidence,
                        pattern_id=pid)
            if getattr(p, "statistics", None) is not None:
                q.statistics = p.statistics
            out.append(q)
    return out


def _project_condition(condition, names: set):
    """Projects a condition onto the names present in one OR disjunct —
    conjuncts referencing absent names are dropped (reference:
    condition/Condition.py:96-106)."""
    from .conditions import AndCondition, TrueCondition
    if condition.names() <= names:
        return condition
    kept = [c for c in condition.flatten() if c.names() <= names]
    if not kept:
        return TrueCondition()
    if len(kept) == 1:
        return kept[0]
    return AndCondition(*kept)
