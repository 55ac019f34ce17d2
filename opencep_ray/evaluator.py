"""Per-conversation CEP evaluator.

This is the stateful core executed inside Ray Data stages (``map_groups`` for
batch parity runs, actor pools for streaming).  It re-implements, from the
semantics documented in SURVEY.md §2.3/§7.0, the behavior of the reference's
evaluation tree (``/root/reference/tree/nodes/*``) with a redesigned,
callback-free structure:

* a :class:`CompiledPattern` is a picklable, stateless compilation of a
  :class:`~opencep_ray.pattern.Pattern` (slot/precedence assignment, condition
  distribution, negation classification),
* a :class:`ConversationEvaluator` holds the per-key mutable state (leaf/join
  buffers, Kleene buffers, negation pending lists) and is fed events in
  arrival order, emitting matches incrementally.

Parity contract implemented here (reference file:line in parentheses):

* window: ``max_ts − min_ts ≤ W`` inclusive (tree/nodes/Node.py:187-193);
* SEQ order: non-strict ``(min_ts, max_ts)`` ascending along pattern order
  (tree/nodes/SeqNode.py:30-33, misc/Utils.py:159-172) — ties match in both
  orders; generalized here to a slot-precedence relation so arbitrary
  SEQ/AND nesting is supported;
* no duplicate events inside a match (tree/nodes/InternalNode.py:28-30);
* Kleene closure emits every subset of live child matches containing the
  newest one, sizes in ``[min_size, max_size]``, subsets enumerated in
  descending size (tree/nodes/KleeneClosureNode.py:58-80,
  misc/Utils.py:234-244); KC conditions see the list of item payloads;
* negation: bounded = inline anti-check on positive arrival; unbounded =
  positives held in a pending buffer until the watermark passes
  ``first_ts + W`` or end-of-stream, retro-invalidated by later negatives
  (tree/nodes/NegationNode.py:60-183); uncertain negatives scale the match
  probability by ``1 − p`` (tree/nodes/NegationNode.py:114-117);
* probability: joint product across events; matches below the pattern
  confidence are dropped at every node (misc/Utils.py:297-306,
  tree/nodes/Node.py:140-146);
* consumption policies: MATCH_SINGLE (enforced at the output node) and
  MATCH_NEXT (enforced from the leaf's parent upward)
  (misc/ConsumptionPolicy.py, tree/Tree.py:35-37,116-118); contiguity is
  rewritten into arrival-index adjacency conditions (base/Pattern.py:175-182).
"""

from __future__ import annotations

from bisect import bisect_left, bisect_right
from itertools import combinations
from typing import Dict, List, Optional, Tuple

from .conditions import (Condition, RelopTypes, SimpleCondition,
                         TrueCondition, Variable)
from .pattern import (Composite, Kleene, Neg, Or, Pattern, Primitive,
                      SelectionStrategy, Seq)

INDEX_ATTR = "__idx"  # hidden arrival-index payload attribute


class Ev:
    """A primitive or aggregated event inside the evaluator."""

    __slots__ = ("payload", "type", "min_ts", "max_ts", "idx", "prob",
                 "primitives")

    def __init__(self, payload, type_, ts, idx, prob=None, primitives=None):
        self.payload = payload
        self.type = type_
        self.min_ts = ts
        self.max_ts = ts if primitives is None else primitives[-1].max_ts
        self.idx = idx
        self.prob = prob
        self.primitives = primitives  # list[Ev] for Kleene aggregates

    def content(self):
        """Binding content: payload dict, or list of payloads for aggregates
        (reference: tree/nodes/InternalNode.py:70-78)."""
        if self.primitives is None:
            return self.payload
        return [e.payload for e in self.primitives]


class PM:
    """A (partial) match: ``entries`` = tuple of (entry_key, Ev) sorted by
    entry key (entry keys order events by pattern declaration order)."""

    __slots__ = ("entries", "first_ts", "last_ts", "prob")

    def __init__(self, entries: Tuple[Tuple[int, "Ev"], ...], prob=None,
                 first_ts=None, last_ts=None):
        self.entries = entries
        if first_ts is None:
            e0 = entries[0][1]
            first_ts = e0.min_ts
            last_ts = e0.max_ts
            for _, e in entries:
                if e.min_ts < first_ts:
                    first_ts = e.min_ts
                if e.max_ts > last_ts:
                    last_ts = e.max_ts
        self.first_ts = first_ts
        self.last_ts = last_ts
        self.prob = prob


def _joint_prob(p1, p2):
    """None-aware probability product (misc/Utils.py:297-306)."""
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    return p1 * p2


def _is_adjacent(i1, i2):
    return i2 == i1 + 1


class _IndexGetter:
    def __call__(self, payload):
        return payload[INDEX_ATTR]


# ---------------------------------------------------------------------------
# Compilation


class _LeafSpec:
    __slots__ = ("event_type", "name", "leaf_id", "slot", "conditions",
                 "cond_fast", "negative", "kc_member")

    def __init__(self, event_type, name, leaf_id, slot, negative=False,
                 kc_member=False):
        self.event_type = event_type
        self.name = name
        self.leaf_id = leaf_id    # unique entry key of this leaf
        self.slot = slot          # precedence slot (KC members share one)
        self.conditions: List[Condition] = []
        self.cond_fast = None     # compiled payload-direct conjunction
        self.negative = negative
        self.kc_member = kc_member


class _NodeSpec:
    """Stateless template for one evaluator-tree node."""

    KIND_LEAF = 0
    KIND_JOIN = 1
    KIND_KC = 2
    KIND_NEG = 3

    __slots__ = ("kind", "children", "leaf", "conditions", "names",
                 "min_size", "max_size", "is_unbounded", "is_first_unbounded",
                 "kc_key", "kc_slot", "node_id",
                 "merge_plan", "prec_checks", "needs_dup", "cond_plan",
                 "cond_fast", "pair_fast", "eq_probe", "range_probe",
                 "merge_fn", "share_sig")

    def __init__(self, kind, children=(), leaf=None):
        self.kind = kind
        self.children = children          # tuple[_NodeSpec, ...]
        self.leaf: Optional[_LeafSpec] = leaf
        self.conditions: List[Condition] = []
        self.names: frozenset = frozenset()
        self.min_size = 1
        self.max_size = None
        self.is_unbounded = False
        self.is_first_unbounded = False
        self.kc_key = -1                  # entry key of the KC aggregate
        self.kc_slot = -1
        self.node_id = -1
        # compiled node program (entry key layouts are fixed per node, so
        # merging / precedence / dup / binding work is precomputed once):
        self.merge_plan = None    # tuple[(side, idx)] building merged entries
        self.prec_checks = ()     # tuple[(i, j, check_max)] over merged idx
        self.needs_dup = False    # same event type on both sides?
        self.cond_plan = ()       # tuple[(merged_idx, name)] for bindings
        self.cond_fast = None     # compiled entries-direct conjunction
        self.pair_fast = None     # compiled (l, r) pre-merge check (joins)
        # equality-probe plan: (left_pos, left_attr, right_pos, right_attr)
        # — buffers become hash maps keyed by the join value (the engine's
        # analog of the reference's sorted-storage key probes,
        # tree/PatternMatchStorage.py:173-283)
        self.eq_probe = None
        # inequality-probe plan: (left_pos, left_getter, right_pos,
        # right_getter, relop) — buffers become value-sorted lists with
        # bisect range probes (the reference's sorted-storage ``get``
        # slices for >, ≥, <, ≤, tree/PatternMatchStorage.py:263-283)
        self.range_probe = None
        self.merge_fn = None      # shape-specialized merge closure
        self.share_sig = None     # structural signature for multi-pattern
                                  # sharing (None = not shareable)


class StorageConfig:
    """Per-compilation storage knobs — the analog of the reference's
    ``TreeStorageParameters`` (tree/PatternMatchStorage.py:308-332),
    mapped onto this engine's buffer kinds:

    * ``sort_storage`` — enable key-probed buffers at join nodes (hash
      probes for equality conditions, value-sorted bisect-range buffers
      for inequalities).  ``False`` = plain time-ordered linear buffers
      everywhere (the reference's ``UnsortedPatternMatchStorage``; its
      own default, misc/DefaultConfig.py:33).  OUR default is ``True``,
      deviating deliberately: these probes are pure pruning — the full
      condition still runs per candidate — so they never change results
      and have no sort-maintenance downside at our buffer sizes.
    * ``attributes_priorities`` — ``{attribute_name: priority}``; when a
      join has several probe-able conditions, the one touching the
      highest-priority attributes becomes the probe key (reference:
      which attribute the storage is sorted by).  Default: first found.
    * ``clean_up_interval`` — value-sorted buffers amortize their O(n)
      expiry rebuild to every N insertions (reference lazy cleanup,
      misc/DefaultConfig.py:35).  Time-ordered and hash buffers expire
      eagerly/per-key regardless — interval only affects sorted buffers.
    * ``prioritize_sorting_by_timestamp`` — keep storage time-ordered
      unless an O(1) hash probe applies: disables value-sorted range
      buffers but keeps equality hash probes (hashing needs no sort
      order, so timestamp order is preserved anyway)."""

    __slots__ = ("sort_storage", "attributes_priorities",
                 "clean_up_interval", "prioritize_sorting_by_timestamp")

    def __init__(self, sort_storage: bool = True,
                 attributes_priorities: Optional[Dict[str, float]] = None,
                 clean_up_interval: int = 16,
                 prioritize_sorting_by_timestamp: bool = False):
        if clean_up_interval <= 0:
            raise ValueError("clean_up_interval must be positive")
        self.sort_storage = sort_storage
        self.attributes_priorities = dict(attributes_priorities or {})
        self.clean_up_interval = clean_up_interval
        self.prioritize_sorting_by_timestamp = prioritize_sorting_by_timestamp


_DEFAULT_STORAGE = StorageConfig()


class CompiledPattern:
    """Driver-side compilation artifact, shipped (pickled) to workers.

    ``tree_builder`` selects the evaluation order of top-level positive
    args from ``statistics`` (see :mod:`opencep_ray.plan`) — join order is
    a pure performance choice here because SEQ semantics live in the slot
    precedence relation, not the tree shape."""

    def __init__(self, pattern: Pattern, pattern_id: int = 0,
                 statistics: Optional[dict] = None,
                 tree_builder: str = "trivial",
                 storage: Optional[StorageConfig] = None):
        self.storage = storage or _DEFAULT_STORAGE
        self.pattern_id = pattern.pattern_id if pattern.pattern_id is not None \
            else pattern_id
        self.window_us = pattern.window_us
        self.confidence = pattern.confidence
        self.event_names = pattern.event_names()

        structure = pattern.structure
        if isinstance(structure, Or):
            raise ValueError("top-level OR must be split into multiple "
                             "patterns first (see opencep_ray.transformation)")
        if isinstance(structure, Neg):
            raise ValueError("pattern cannot be entirely negative")

        # ------------------------------------------------------------------
        # slot + leaf-id assignment.  One precedence slot per primitive leaf
        # or per Kleene closure (all leaves inside a KC share its slot);
        # declaration order over the FULL structure, negatives included.
        self.leaves: List[_LeafSpec] = []
        self._slot_count = 0
        self._kc_specs: List[Tuple[int, object]] = []  # (slot, Kleene ast)
        seq_groups: List[Tuple] = []
        kc_seq_groups: List[List[Tuple[int, int]]] = []  # leaf-id ranges

        def new_slot():
            s = self._slot_count
            self._slot_count += 1
            return s

        def assign(s, negative=False, kc_slot=None):
            """Assigns slots; returns [lo, hi) slot range covered by s."""
            if isinstance(s, Primitive):
                slot = kc_slot if kc_slot is not None else new_slot()
                self.leaves.append(_LeafSpec(s.event_type, s.name,
                                             len(self.leaves), slot, negative,
                                             kc_member=kc_slot is not None))
                return slot, slot + 1
            if isinstance(s, Kleene):
                if kc_slot is not None:
                    raise ValueError("nested Kleene closures are not "
                                     "supported (matches reference, "
                                     "base/Event.py:53)")
                slot = new_slot()
                self._kc_specs.append((slot, s))
                assign(s.arg, negative, kc_slot=slot)
                return slot, slot + 1
            if isinstance(s, Neg):
                if kc_slot is not None:
                    raise ValueError("negation inside Kleene closure is not "
                                     "supported")
                return assign(s.arg, negative=True, kc_slot=kc_slot)
            if isinstance(s, Composite):
                if kc_slot is None:
                    lo = self._slot_count
                    ranges = [assign(a, negative, kc_slot) for a in s.args]
                    seq_groups.append((s, ranges))
                    return lo, self._slot_count
                # composite inside a Kleene closure: all leaves share the KC
                # slot; SEQ ordering among them is tracked by leaf id
                leaf_ranges = []
                for a in s.args:
                    l0 = len(self.leaves)
                    assign(a, negative, kc_slot)
                    leaf_ranges.append((l0, len(self.leaves)))
                if isinstance(s, Seq):
                    kc_seq_groups.append(leaf_ranges)
                return kc_slot, kc_slot + 1
            raise ValueError(f"unsupported structure {s!r}")

        assign(structure)
        n_leaves = len(self.leaves)

        # precedence relation over slots: (i, j) ∈ prec ⇒ slot i's events
        # must precede slot j's ((min_ts, max_ts) ≤ component-wise).  A SEQ
        # imposes a TOTAL order over every slot in its subtree — not just
        # across its immediate arg groups — because the reference's SeqNode
        # validates is_sorted over the FULL leaf-index-ordered merged match
        # (tree/nodes/SeqNode.py:30-33): in SEQ(a, AND(b, c), d) the root
        # SeqNode covers all four leaves, so b must precede c even though
        # they sit inside an AND.  Slots are assigned in declaration order,
        # so each composite's subtree is the contiguous range
        # [ranges[0][0], ranges[-1][1]).
        prec = set()
        for comp, ranges in seq_groups:
            if isinstance(comp, Seq) and ranges:
                lo, hi = ranges[0][0], ranges[-1][1]
                for i in range(lo, hi):
                    for j in range(i + 1, hi):
                        prec.add((i, j))
        self.prec = frozenset(prec)

        # intra-KC SEQ ordering, keyed by leaf id (entry key) — same
        # total-order rule over the SEQ's contiguous leaf-id range
        prec_keys = set()
        for leaf_ranges in kc_seq_groups:
            if leaf_ranges:
                lo, hi = leaf_ranges[0][0], leaf_ranges[-1][1]
                for i in range(lo, hi):
                    for j in range(i + 1, hi):
                        prec_keys.add((i, j))
        self.prec_keys = frozenset(prec_keys)

        # entry-key bookkeeping: leaf entries use leaf_id (0..n_leaves-1);
        # each KC aggregate gets key n_leaves + ordinal.
        self.entry_slot: Dict[int, int] = {
            lf.leaf_id: lf.slot for lf in self.leaves}
        self.entry_names: Dict[int, Tuple[str, ...]] = {
            lf.leaf_id: (lf.name,) for lf in self.leaves}
        self._kc_keys: Dict[int, int] = {}  # kc slot -> entry key
        for ordinal, (slot, kc_ast) in enumerate(self._kc_specs):
            key = n_leaves + ordinal
            self._kc_keys[slot] = key
            self.entry_slot[key] = slot
            self.entry_names[key] = tuple(kc_ast.arg.event_names()) \
                if not isinstance(kc_ast.arg, Primitive) \
                else (kc_ast.arg.name,)
        # entries are stored key-sorted; when slots increase with keys
        # (every flat KC-free pattern) the emit path can skip re-sorting
        _ks = sorted(self.entry_slot)
        self.entries_slot_ordered = all(
            self.entry_slot[a] < self.entry_slot[b]
            for a, b in zip(_ks, _ks[1:]))

        # ------------------------------------------------------------------
        # split positive / negative top-level args (base/Pattern.py:65-88 —
        # negation is supported at the top nesting level, like the reference)
        if isinstance(structure, Composite):
            pos_args = [a for a in structure.args if not isinstance(a, Neg)]
            neg_args = [a for a in structure.args if isinstance(a, Neg)]
            if not pos_args:
                raise ValueError("pattern contains no positive events")
            for a in neg_args:
                if not isinstance(a.arg, Primitive):
                    raise ValueError("only primitive events may be negated")
            top_is_seq = isinstance(structure, Seq)
            arg_positions = {id(a): i for i, a in enumerate(structure.args)}
            pos_positions = [arg_positions[id(a)] for a in pos_args]
        else:
            pos_args, neg_args, top_is_seq = [structure], [], False
            arg_positions, pos_positions = {}, []

        # ------------------------------------------------------------------
        # condition distribution: each conjunct is attached to the lowest
        # node binding all of its names (condition/CompositeCondition.py:30-64)
        conjuncts: List[Condition] = []
        if not isinstance(pattern.condition, TrueCondition):
            flat = pattern.condition.flatten()
            conjuncts = flat if flat else [pattern.condition]

        cp = pattern.consumption_policy
        # NOTE: adjacency here is relative to the pattern's OWN event types
        # (the engine prunes irrelevant types before evaluation); the
        # reference's global counter also counts stream events of types the
        # pattern never references (base/Event.py:13-27) — a deliberate
        # divergence documented in COVERAGE.md.
        self.has_contiguity = bool(cp is not None and cp.contiguous_names)
        bound_names = {lf.name for lf in self.leaves}
        if cp is not None and cp.contiguous_names:
            seqs = cp.contiguous_names
            if seqs and isinstance(seqs[0], str):
                seqs = [seqs]
            for names_seq in seqs:
                for a, b in zip(names_seq, names_seq[1:]):
                    # an OR-split disjunct may lack some names — adjacency
                    # pairs only apply where both names exist
                    if a not in bound_names or b not in bound_names:
                        continue
                    conjuncts.append(SimpleCondition(
                        Variable(a, _IndexGetter()),
                        Variable(b, _IndexGetter()),
                        relation_op=_is_adjacent))
        for c in conjuncts:
            unknown = c.names() - bound_names
            if unknown:
                raise ValueError(
                    f"condition references unknown event names {unknown}; "
                    f"pattern binds {sorted(bound_names)}")

        # tag each conjunct for runtime selectivity instrumentation
        # (reference: condition/Condition.py:119-125 reports every atomic
        # evaluation to a statistics collector)
        self.conjunct_names: Dict[tuple, frozenset] = {}
        for ci, c in enumerate(conjuncts):
            key = (self.pattern_id, ci)
            try:
                c._stat_key = key
            except AttributeError:
                pass
            self.conjunct_names[key] = frozenset(c.names())

        remaining = list(conjuncts)

        def take_conditions(names: frozenset, kc_only: bool) -> List[Condition]:
            taken, keep = [], []
            for c in remaining:
                cn = c.names()
                if cn and cn <= names and c.is_kc_condition() == kc_only:
                    taken.append(c)
                else:
                    keep.append(c)
            remaining[:] = keep
            return taken

        # ------------------------------------------------------------------
        # build the node-spec tree (trivial left-deep plan in declaration
        # order, reference plan/LeftDeepTreeBuilders.py:59-65)
        self._node_count = 0

        def new_node(kind, children=(), leaf=None):
            n = _NodeSpec(kind, children, leaf)
            n.node_id = self._node_count
            self._node_count += 1
            return n

        used_leaves = set()

        def leaf_for(name: str, negative: bool) -> _LeafSpec:
            for lf in self.leaves:
                if lf.name == name and lf.negative == negative \
                        and lf.leaf_id not in used_leaves:
                    used_leaves.add(lf.leaf_id)
                    return lf
            raise ValueError(f"no leaf for event name {name!r}")

        def build(s) -> _NodeSpec:
            if isinstance(s, Primitive):
                lf = leaf_for(s.name, False)
                lf.conditions = take_conditions(frozenset([s.name]), False)
                lf.cond_fast = _compile_leaf_cond_fast(lf.conditions)
                node = new_node(_NodeSpec.KIND_LEAF, leaf=lf)
                node.names = frozenset([s.name])
                return node
            if isinstance(s, Kleene):
                child = build(s.arg)
                node = new_node(_NodeSpec.KIND_KC, (child,))
                node.names = child.names
                node.min_size = s.min_size
                node.max_size = s.max_size
                kc_slot = next(slot for slot, ast in self._kc_specs
                               if ast is s)
                node.kc_slot = kc_slot
                node.kc_key = self._kc_keys[kc_slot]
                node.conditions = take_conditions(node.names, True)
                return node
            if isinstance(s, Composite):
                children = [build(a) for a in s.args]
                node = children[0]
                for ch in children[1:]:
                    parent = new_node(_NodeSpec.KIND_JOIN, (node, ch))
                    parent.names = node.names | ch.names
                    parent.conditions = take_conditions(parent.names, False)
                    node = parent
                return node
            raise ValueError(f"unsupported structure {s!r}")

        stats = statistics if statistics is not None \
            else getattr(pattern, "statistics", None)
        self.statistics = stats  # retained for sharing cost models
        if tree_builder in ("bushy", "zstream", "zstream_ord") \
                and len(pos_args) > 2:
            from .plan import choose_shape
            shape = choose_shape(len(pos_args), stats, builder=tree_builder)

            def build_shape(sh) -> _NodeSpec:
                if isinstance(sh, int):
                    return build(pos_args[sh])
                left = build_shape(sh[0])
                right = build_shape(sh[1])
                parent = new_node(_NodeSpec.KIND_JOIN, (left, right))
                parent.names = left.names | right.names
                parent.conditions = take_conditions(parent.names, False)
                return parent

            root = build_shape(shape)
        else:
            if tree_builder not in ("trivial", "bushy") \
                    and len(pos_args) > 1:
                from .plan import choose_order
                order = choose_order(len(pos_args), stats, tree_builder)
                pos_args = [pos_args[i] for i in order]
            root = build(pos_args[0])
            for a in pos_args[1:]:
                ch = build(a)
                parent = new_node(_NodeSpec.KIND_JOIN, (root, ch))
                parent.names = root.names | ch.names
                parent.conditions = take_conditions(parent.names, False)
                root = parent

        # negation nodes stacked on top: bounded first, then unbounded
        # (naive negation algorithm, plan/negation/NaiveNegationAlgorithm.py).
        # With type-count statistics, negatives inside each class are
        # additionally sorted by DESCENDING arrival rate so the most
        # frequent negative prunes first — the reference's
        # StatisticNegationAlgorithm (plan/negation/
        # StatisticNegationAlgorithm.py:6-25); pure cost ordering, results
        # are invariant.
        type_counts = (stats or {}).get("type_counts") \
            if isinstance(stats, dict) else None
        neg_infos = []
        for a in neg_args:
            pos_after = any(p > arg_positions[id(a)] for p in pos_positions)
            unbounded = (not top_is_seq) or (not pos_after)
            rate = type_counts.get(a.arg.event_type, 0) \
                if type_counts else 0
            neg_infos.append((a, unbounded, rate))
        # stable sort: bounded (False) first, then rate descending
        neg_infos.sort(key=lambda t: (t[1], -t[2]))
        neg_infos = [(a, unbounded) for a, unbounded, _ in neg_infos]
        first_unbounded_set = False
        for a, unbounded in neg_infos:
            lf = leaf_for(a.arg.name, True)
            lf.conditions = take_conditions(frozenset([lf.name]), False)
            lf.cond_fast = _compile_leaf_cond_fast(lf.conditions)
            neg_leaf = new_node(_NodeSpec.KIND_LEAF, leaf=lf)
            neg_leaf.names = frozenset([lf.name])
            node = new_node(_NodeSpec.KIND_NEG, (root, neg_leaf))
            node.names = root.names | neg_leaf.names
            node.conditions = take_conditions(node.names, False)
            node.is_unbounded = unbounded
            if unbounded and not first_unbounded_set:
                node.is_first_unbounded = True
                first_unbounded_set = True
            root = node

        root.conditions.extend(remaining)
        remaining.clear()
        self.root = root
        self.has_unbounded_negation = first_unbounded_set

        # ------------------------------------------------------------------
        # consumption policy: single-type registration
        # (misc/ConsumptionPolicy.py:77-88, tree/Tree.py:35-37,116-118)
        self.single_at_root: frozenset = frozenset()
        self.match_next_types: frozenset = frozenset()
        if cp is not None and cp.single_types:
            if cp.secondary_selection_strategy == SelectionStrategy.MATCH_SINGLE:
                self.single_at_root = frozenset(cp.single_types)
            elif cp.secondary_selection_strategy == SelectionStrategy.MATCH_NEXT:
                self.match_next_types = frozenset(cp.single_types)

        # freeze policy: per flat sequence, a freezer name F blocks every
        # name up to and including F while a freezer event is active
        # (tree/evaluation/TreeBasedEvaluationMechanism.py:173-204)
        self.freeze_blocked_by_type: Dict[str, frozenset] = {}
        if cp is not None and getattr(cp, "freeze_names", None):
            sequences: List[List[str]] = []

            def collect_seqs(s):
                if isinstance(s, Seq):
                    sequences.append([n for a in s.args
                                      if not isinstance(a, Neg)
                                      for n in a.event_names()])
                if isinstance(s, Composite):
                    for a in s.args:
                        collect_seqs(a)
                elif isinstance(s, (Kleene, Neg)):
                    collect_seqs(s.arg)

            collect_seqs(structure)
            name_to_type = {lf.name: lf.event_type for lf in self.leaves}
            for freezer in cp.freeze_names:
                blocked = set()
                for seq_names in sequences:
                    if freezer not in seq_names:
                        continue
                    for name in seq_names:
                        blocked.add(name)
                        if name == freezer:
                            break
                if blocked and freezer in name_to_type:
                    ftype = name_to_type[freezer]
                    cur = set(self.freeze_blocked_by_type.get(ftype, ()))
                    self.freeze_blocked_by_type[ftype] = frozenset(
                        cur | blocked)
        self.freezer_names = frozenset(
            getattr(cp, "freeze_names", ()) or ()) if cp else frozenset()

        # event_type -> [leaf specs], for routing
        self.routes: Dict[str, List[_LeafSpec]] = {}
        for lf in self.leaves:
            self.routes.setdefault(lf.event_type, []).append(lf)

        # vectorized-pushdown specs: for each leaf, the list of
        # (attr, relop, const) forms when ALL its conditions are
        # declarative Col-vs-constant relops; None when any condition
        # needs Python evaluation (the engine then keeps all rows of the
        # type and lets the leaf decide)
        from .conditions import declarative_form
        self.leaf_vector_specs: Dict[int, Optional[list]] = {}
        for lf in self.leaves:
            forms = []
            ok = True
            for c in lf.conditions:
                f = declarative_form(c)
                if f is None:
                    ok = False
                    break
                forms.append(f)
            self.leaf_vector_specs[lf.leaf_id] = forms if ok else None

        # ------------------------------------------------------------------
        # node programs: every node's entry-key layout is fixed, so the
        # merge interleave, precedence comparisons, duplicate-check need,
        # and condition-binding slots compile to static index plans
        self._compile_node_programs()

        # multi-pattern sharing eligibility + structural signatures
        # (reference plan/multi/*TreePlanMerger.py; consumption policies
        # couple node state to one pattern's semantics, so patterns with
        # policies never share)
        self.shareable = not (self.single_at_root or self.match_next_types
                              or self.freeze_blocked_by_type
                              or self.freezer_names or self.has_contiguity)
        self._compute_share_sigs()

    def _compute_share_sigs(self):
        """Bottom-up structural signatures (leaf type/name/conditions, KC
        bounds, join conditions + positional precedence program).  Two
        specs with equal signatures evaluate identically on identical
        input EXCEPT for the pattern window/confidence, which shared
        nodes relax to the least restrictive value — upper nodes and the
        output re-validate per pattern, the reference's shared-node rule
        (tree/nodes/Node.py:330-345, tree/MultiPatternTree.py:46-54).
        Negation nodes are never shared (pending state is per-pattern)."""
        from .conditions import condition_signature

        def sig_of(spec: _NodeSpec):
            conds = tuple(condition_signature(c) for c in spec.conditions)
            for ch in spec.children:
                sig_of(ch)
            if spec.kind == _NodeSpec.KIND_LEAF:
                lf = spec.leaf
                spec.share_sig = (
                    "leaf", lf.event_type, lf.name, lf.negative,
                    lf.kc_member,
                    tuple(condition_signature(c) for c in lf.conditions))
            elif spec.kind == _NodeSpec.KIND_KC:
                spec.share_sig = ("kc", spec.children[0].share_sig,
                                  spec.min_size, spec.max_size, conds)
            elif spec.kind == _NodeSpec.KIND_JOIN:
                spec.share_sig = (
                    "join", spec.children[0].share_sig,
                    spec.children[1].share_sig, conds,
                    spec.prec_checks, spec.needs_dup)
            else:
                spec.share_sig = None
            return spec.share_sig

        sig_of(self.root)

    def structure_summary(self):
        """Nested-tuple summary of the compiled evaluation tree — the
        analog of the reference's ``get_structure_summary`` used by its
        structural plan tests (test/testUtils.py:356-367)."""
        def walk(spec: _NodeSpec):
            if spec.kind == _NodeSpec.KIND_LEAF:
                return spec.leaf.name
            if spec.kind == _NodeSpec.KIND_KC:
                return ("KC", walk(spec.children[0]))
            if spec.kind == _NodeSpec.KIND_NEG:
                tag = "NSeq" if self.prec else "NAnd"
                return (tag, walk(spec.children[0]),
                        walk(spec.children[1]))
            tag = "Seq" if self.prec else "And"
            return (tag, walk(spec.children[0]), walk(spec.children[1]))

        return walk(self.root)

    # -- node-program compilation ------------------------------------------
    def _subtree_keys(self, spec: _NodeSpec) -> tuple:
        if spec.kind == _NodeSpec.KIND_LEAF:
            return (spec.leaf.leaf_id,)
        if spec.kind == _NodeSpec.KIND_KC:
            return (spec.kc_key,)
        if spec.kind == _NodeSpec.KIND_NEG:
            return self._subtree_keys(spec.children[0])
        left = self._subtree_keys(spec.children[0])
        right = self._subtree_keys(spec.children[1])
        return tuple(sorted(left + right))

    def _leaf_types_under(self, spec: _NodeSpec) -> set:
        if spec.kind == _NodeSpec.KIND_LEAF:
            return {spec.leaf.event_type}
        out = set()
        for ch in spec.children:
            out |= self._leaf_types_under(ch)
        return out

    def _compile_node_programs(self):
        prec, prec_keys = self.prec, self.prec_keys
        slot_of = self.entry_slot

        def compile_node(spec: _NodeSpec):
            for ch in spec.children:
                compile_node(ch)
            if spec.kind not in (_NodeSpec.KIND_JOIN, _NodeSpec.KIND_NEG):
                return
            lkeys = self._subtree_keys(spec.children[0])
            rkeys = self._subtree_keys(spec.children[1])
            tagged = [(k, 0, i) for i, k in enumerate(lkeys)] + \
                     [(k, 1, i) for i, k in enumerate(rkeys)]
            tagged.sort()
            merged_keys = tuple(t[0] for t in tagged)
            spec.merge_plan = tuple((t[1], t[2]) for t in tagged)
            spec.merge_fn = _make_merge_fn(spec.merge_plan)
            # at negation nodes order is validated by min-ts only
            # (NegativeSeqNode._validate, tree/nodes/NegationNode.py:246-250)
            check_max = spec.kind == _NodeSpec.KIND_JOIN
            checks = []
            for i in range(len(merged_keys)):
                for j in range(i + 1, len(merged_keys)):
                    ki, kj = merged_keys[i], merged_keys[j]
                    si, sj = slot_of[ki], slot_of[kj]
                    if (si, sj) in prec or (ki, kj) in prec_keys:
                        checks.append((i, j, check_max))
                    elif (sj, si) in prec or (kj, ki) in prec_keys:
                        checks.append((j, i, check_max))
            spec.prec_checks = tuple(checks)
            spec.needs_dup = bool(
                self._leaf_types_under(spec.children[0])
                & self._leaf_types_under(spec.children[1]))
            spec.cond_plan = tuple(
                (idx, name) for idx, k in enumerate(merged_keys)
                for name in self.entry_names[k])
            spec.cond_fast = _compile_cond_fast(spec.conditions,
                                                spec.cond_plan)
            if spec.kind == _NodeSpec.KIND_JOIN:
                if self.storage.sort_storage:
                    spec.eq_probe = self._find_eq_probe(spec, lkeys, rkeys)
                    if spec.eq_probe is None and not \
                            self.storage.prioritize_sorting_by_timestamp:
                        spec.range_probe = self._find_range_probe(
                            spec, lkeys, rkeys)
                spec.pair_fast = _compile_pair_fast(spec)

        compile_node(self.root)

        # flat instantiation program (pre-order; parent before children)
        # for the no-sharing fast path: (spec, parent_position, side)
        prog: List[tuple] = []

        def flatten(spec: _NodeSpec, parent_pos: int, side: int):
            pos = len(prog)
            prog.append((spec, parent_pos, side))
            for i, ch in enumerate(spec.children):
                flatten(ch, pos, i)

        flatten(self.root, -1, -1)
        self.build_program = tuple(prog)

    def _find_eq_probe(self, spec: _NodeSpec, lkeys: tuple, rkeys: tuple):
        """Finds an equality condition Col(a, x) == Col(b, y) linking one
        primitive leaf on each side of the join — enables hash-probed
        buffers instead of linear scans."""
        from .conditions import Variable
        from .conditions import BaseRelationCondition, RelopTypes
        n_leaves = len(self.leaves)
        name_to_leafkey = {}
        for lf in self.leaves:
            name_to_leafkey[lf.name] = lf.leaf_id
        best = None
        for c in spec.conditions:
            if not isinstance(c, BaseRelationCondition) \
                    or c.relop != RelopTypes.Equal:
                continue
            left, right = c.left, c.right
            if not (isinstance(left, Variable) and isinstance(right, Variable)):
                continue
            la = getattr(left, "attr", None)
            ra = getattr(right, "attr", None)
            if la is None or ra is None:
                continue
            lk = name_to_leafkey.get(left.name)
            rk = name_to_leafkey.get(right.name)
            if lk is None or rk is None or lk >= n_leaves or rk >= n_leaves:
                continue
            cand = None
            if lk in lkeys and rk in rkeys:
                cand = (lkeys.index(lk), la, rkeys.index(rk), ra)
            elif rk in lkeys and lk in rkeys:
                cand = (lkeys.index(rk), ra, rkeys.index(lk), la)
            if cand is not None:
                # attributes_priorities picks WHICH probe-able condition
                # keys the buffer (TreeStorageParameters analog); first
                # found wins on ties, preserving the default behavior
                prio_map = self.storage.attributes_priorities
                p = prio_map.get(la, 0) + prio_map.get(ra, 0)
                if best is None or p > best[0]:
                    best = (p, cand)
        return best[1] if best else None

    def _find_range_probe(self, spec: _NodeSpec, lkeys: tuple, rkeys: tuple):
        """Finds an inequality condition relop(a.x, b.y) linking one
        primitive leaf on each side of the join — enables value-sorted
        buffers with bisect range probes instead of linear scans (the
        reference's SortedPatternMatchStorage ``get`` slices,
        tree/PatternMatchStorage.py:263-283).  Pure pruning: the probe
        returns a candidate superset w.r.t. every OTHER conjunct, and the
        full condition still runs per candidate, so results are identical
        to the linear path."""
        from .conditions import (_FLIP_RELOP, BaseRelationCondition,
                                 RelopTypes, Variable)
        ineq = (RelopTypes.Greater, RelopTypes.GreaterEqual,
                RelopTypes.Smaller, RelopTypes.SmallerEqual)
        n_leaves = len(self.leaves)
        name_to_leafkey = {}
        for lf in self.leaves:
            name_to_leafkey[lf.name] = lf.leaf_id
        best = None
        for c in spec.conditions:
            if not isinstance(c, BaseRelationCondition) \
                    or c.relop not in ineq:
                continue
            left, right = c.left, c.right
            if not (isinstance(left, Variable)
                    and isinstance(right, Variable)):
                continue
            lg, rg = left.getattr_func, right.getattr_func
            if lg is None or rg is None:
                continue
            lk = name_to_leafkey.get(left.name)
            rk = name_to_leafkey.get(right.name)
            # leaf-id membership in the child key tuples also guarantees
            # the entry is a primitive event (KC aggregates use entry keys
            # above every leaf id), so the getter sees a payload dict
            if lk is None or rk is None or lk >= n_leaves or rk >= n_leaves:
                continue
            cand = None
            if lk in lkeys and rk in rkeys:
                cand = (lkeys.index(lk), lg, rkeys.index(rk), rg, c.relop)
            elif rk in lkeys and lk in rkeys:
                cand = (lkeys.index(rk), rg, rkeys.index(lk), lg,
                        _FLIP_RELOP[c.relop])
            if cand is not None:
                prio_map = self.storage.attributes_priorities
                p = prio_map.get(getattr(left, "attr", None), 0) \
                    + prio_map.get(getattr(right, "attr", None), 0)
                if best is None or p > best[0]:
                    best = (p, cand)
        return best[1] if best else None


def compile_patterns(patterns, statistics: Optional[dict] = None,
                     tree_builder: str = "trivial",
                     storage: Optional[StorageConfig] = None
                     ) -> List[CompiledPattern]:
    """Applies the OR-splitting rewrites and compiles each pattern."""
    from .transformation import prepare_patterns
    if isinstance(patterns, Pattern):
        patterns = [patterns]
    out = []
    for i, p in enumerate(prepare_patterns(patterns)):
        out.append(CompiledPattern(p, pattern_id=p.pattern_id
                                   if p.pattern_id is not None else i,
                                   statistics=statistics,
                                   tree_builder=tree_builder,
                                   storage=storage))
    return out


# ---------------------------------------------------------------------------
# Runtime


class _RTNode:
    __slots__ = ("spec", "sinks", "fast", "buffers", "pending", "filtered")

    def __init__(self, spec: _NodeSpec):
        self.spec = spec
        # where this node's (partial) matches go: a list of
        # ("up", tree, parent_node, side, remap) links and/or
        # ("out", tree, remap, strict) output links — more than one when
        # the node is shared across patterns (multi-pattern sharing)
        self.sinks: list = []
        # (tree, parent, side) when there is exactly one plain interior
        # sink — the dominant case; set by the evaluator after wiring
        self.fast = None
        self.buffers = None      # join/neg: [left, right]; kc: [child pms]
        self.pending = None      # unbounded-negation pending positives
        self.filtered = None     # single-policy used-event idx set


class _SharedView:
    """Pattern-parameter view of a SHARED subtree: window = max and
    confidence = least restrictive over the sharing patterns (reference
    tree/nodes/Node.py:330-345); upper per-pattern nodes and the output
    sink re-validate against each pattern's own parameters."""

    __slots__ = ("window_us", "confidence", "storage")

    # sharing is disabled whenever a pattern carries consumption
    # policies, so shared nodes never see policy state
    match_next_types: frozenset = frozenset()
    single_at_root: frozenset = frozenset()

    def __init__(self, window_us: int, confidence,
                 storage: "StorageConfig" = None):
        self.window_us = window_us
        self.confidence = confidence
        # storage knobs follow the owning pattern (a shared node serves
        # several, but they were compiled with one StorageConfig)
        self.storage = storage or _DEFAULT_STORAGE


class SheddingConfig:
    """Optional load-shedding valve — OFF by default because it
    intentionally trades recall for bounded latency/memory, like the
    reference fork's CitiBike layer (engine/LoadSheddingCEP.py:39-110,
    tree/LoadSheddingPatternMatchStorage.py:39-184).  When the number of
    live partial matches in an evaluator exceeds ``max_partial_matches``,
    buffers are shed down to ``target`` by dropping the lowest-utility
    partials.  Utility mirrors the reference's heuristic
    (base/PatternMatch.py:45-84): longer chains and more remaining window
    time are worth keeping; ``"oldest"`` and ``"random"`` strategies match
    the fork's alternatives (minus its deliberate randomness, so runs stay
    deterministic)."""

    def __init__(self, max_partial_matches: int = 10_000,
                 target: int = 5_000, strategy: str = "utility",
                 seed: int = 17):
        assert strategy in ("utility", "oldest", "random")
        self.max_partial_matches = max_partial_matches
        self.target = target
        self.strategy = strategy
        self.seed = seed


class ConversationEvaluator:
    """Evaluates compiled patterns over one key's events, fed in arrival
    order.  Matches accumulate in ``self.matches`` as (pattern_id, PM).

    ``share`` enables multi-pattern plan sharing (reference
    plan/multi/ShareLeavesTreePlanMerger.py:5-14,
    SubTreeSharingTreePlanMerger.py:5-13): ``"leaves"`` shares equivalent
    leaves across patterns, ``"subtrees"`` shares arbitrary equivalent
    subtrees, ``"local_search"``/``"auto"`` run the tabu-search cost
    model (``local_search.py``) and share only the subtrees it predicts
    to pay — ``"auto"`` is the self-tuning spelling for users who don't
    want to pick a mode (it may legitimately select NO sharing, e.g.
    bare condition-less leaves where the remap outweighs the saving).
    A shared subtree is instantiated ONCE as a mini-tree with
    the least-restrictive window/confidence and fans its results out to
    every consuming pattern through per-pattern entry-key remaps; upper
    nodes re-validate per pattern.  Sharing is silently disabled when any
    pattern carries consumption policies (their state is per-pattern)."""

    __slots__ = ("compiled", "matches", "_counter", "_agg_counter", "_trees",
                 "_history", "_max_window_us", "cond_stats",
                 "shedding", "shed_count", "_shed_tick", "_last_ts",
                 "_shed_rng", "share", "_shared", "_minis", "_all_trees",
                 "_shared_sigs", "_routing")

    def __init__(self, compiled: List[CompiledPattern],
                 retain_events: bool = False,
                 cond_stats: Optional[Dict] = None,
                 shedding: Optional["SheddingConfig"] = None,
                 share: Optional[str] = None):
        self.compiled = compiled
        self.matches: List[Tuple[int, PM]] = []
        self._counter = 0
        self._agg_counter = 0
        # optional shared {(pattern_id, conjunct_idx): [successes, total]}
        self.cond_stats = cond_stats
        self.shedding = shedding
        self.shed_count = 0
        self._shed_tick = 0
        self._last_ts = 0
        self._shed_rng = None
        if shedding is not None and shedding.strategy == "random":
            import random as _random
            self._shed_rng = _random.Random(shedding.seed)
        self.share = share if (share in ("leaves", "subtrees",
                                         "local_search", "auto")
                               and len(compiled) > 1
                               and all(getattr(cp, "shareable", False)
                                       for cp in compiled)) else None
        self._shared_sigs = self._plan_sharing(compiled)
        self._shared: Dict[tuple, dict] = {}
        self._minis: List[dict] = []
        self._trees = [self._instantiate(cp) for cp in compiled]
        # freeze the single-plain-sink fast path (sinks are final now)
        for tree in self._minis + self._trees:
            for n in tree["nodes"]:
                if len(n.sinks) == 1 and n.sinks[0][0] == "up" \
                        and n.sinks[0][4] is None and not n.sinks[0][5]:
                    n.fast = (n.sinks[0][1], n.sinks[0][2], n.sinks[0][3])
        # per-event delivery order must match the reference's leaf order
        # (positive leaves before negative leaves — NegationNode stacks on
        # top of the positive tree and get_leaves is left-first): shared
        # NEGATIVE leaves process after every pattern tree, so a bounded
        # negative that shares an event with the completing positive is
        # not yet buffered at completion time
        def _is_negative_mini(m):
            spec = m["owner_spec"]
            return spec.kind == _NodeSpec.KIND_LEAF and spec.leaf.negative

        pos_minis = [m for m in self._minis if not _is_negative_mini(m)]
        neg_minis = [m for m in self._minis if _is_negative_mini(m)]
        self._all_trees = pos_minis + self._trees + neg_minis
        # flat routing table {event_type: [(tree, leafspec), ...]} in
        # delivery order — usable whenever no pattern has freeze
        # policies (freezers need per-tree bookkeeping per event)
        if any(t["freezers"] is not None for t in self._all_trees):
            self._routing = None
        else:
            routing: Dict[str, list] = {}
            for tree in self._all_trees:
                for typ, lfs in tree["routes"].items():
                    dst = routing.setdefault(typ, [])
                    dst.extend((tree, lf) for lf in lfs)
            self._routing = routing
        # optional in-window event history, enabling replan-with-replay
        # (the reference's tree-swap replay trick,
        # tree/evaluation/TrivialTreeBasedEvaluationMechnism.py:30-55)
        self._history = [] if retain_events else None
        self._max_window_us = max(cp.window_us for cp in compiled) \
            if compiled else 0

    def reset(self):
        """Clears all per-conversation state so the evaluator can be
        reused for another conversation (object pooling: the tree wiring
        is conversation-independent; rebuilding it per conversation is
        the dominant cost for short conversations at scale).  A reset
        evaluator behaves exactly like a freshly constructed one."""
        self.matches.clear()
        self._counter = 0
        self._agg_counter = 0
        self.shed_count = 0
        self._shed_tick = 0
        self._last_ts = 0
        if self._shed_rng is not None:
            # restart the shed RNG stream: identical decisions to fresh
            self._shed_rng.seed(self.shedding.seed)
        if self._history is not None:
            self._history.clear()
        for tree in self._all_trees:
            if tree["freezers"]:
                tree["freezers"].clear()
            for n in tree["nodes"]:
                if n.buffers:
                    for buf in n.buffers:
                        if isinstance(buf, dict):
                            if "d" in buf:
                                buf["d"].clear()
                            else:
                                buf["k"].clear()
                                buf["p"].clear()
                                buf["adds"] = 0
                            buf["min"] = None
                        else:
                            buf.clear()
                if n.pending is not None:
                    n.pending.clear()
                if n.filtered is not None:
                    n.filtered.clear()

    # -- instantiation ------------------------------------------------------
    def _plan_sharing(self, compiled) -> frozenset:
        """Signatures occurring in ≥ 2 patterns (respecting the share
        mode) — the candidates for shared mini-trees."""
        if not self.share:
            return frozenset()
        counts: Dict[tuple, int] = {}
        for cp in compiled:
            seen = set()
            stack = [cp.root]
            while stack:
                s = stack.pop()
                stack.extend(s.children)
                sig = s.share_sig
                if sig is None or sig in seen:
                    continue
                if self.share == "leaves" and sig[0] != "leaf":
                    continue
                seen.add(sig)
                counts[sig] = counts.get(sig, 0) + 1
        candidates = frozenset(sig for sig, c in counts.items() if c >= 2)
        if self.share in ("local_search", "auto") and candidates:
            # cost-driven merge selection (reference
            # plan/multi/local_search/LocalSearch.py:15-180); "auto" is
            # the self-tuning spelling: share only what the cost model
            # says pays (possibly nothing), no user tuning required
            from .local_search import choose_shared_sigs
            return choose_shared_sigs(compiled, candidates)
        return candidates

    def _instantiate(self, cp: CompiledPattern):
        tree = {"cp": cp, "root": None, "routes": {}, "leaf_nodes": {},
                "nodes": [], "first_unbounded": None,
                "freezers": [] if cp.freeze_blocked_by_type else None,
                "child_minis": []}
        if not self._shared_sigs:
            self._instantiate_flat(cp, tree)
            if cp.single_at_root or cp.match_next_types:
                for n in tree["nodes"]:
                    n.filtered = set()
            tree["first_unbounded"] = next(
                (n for n in tree["nodes"] if n.spec.is_first_unbounded),
                None)
            return tree
        ref = self._inst_spec(cp.root, cp, tree)
        if isinstance(ref, _RTNode):
            tree["root"] = ref
            ref.sinks.append(("out", tree, None, False))
        else:
            _, mini, remap, _spec = ref
            tree["root"] = mini["root"]
            # the WHOLE pattern is a shared subtree: re-check the
            # pattern's own window at output (strict)
            mini["root"].sinks.append(("out", tree, remap, True))
            self._attach_mini(tree, mini, cp.window_us, cp.confidence)
        if cp.single_at_root or cp.match_next_types:
            for n in tree["nodes"]:
                n.filtered = set()
        tree["first_unbounded"] = next(
            (n for n in tree["nodes"] if n.spec.is_first_unbounded), None)
        return tree

    def _instantiate_flat(self, cp: CompiledPattern, tree):
        """No-sharing fast path: replay the precompiled build program —
        one tight loop instead of recursive dispatch (evaluators are
        created once per conversation, so this is hot at scale)."""
        nodes_out = tree["nodes"]
        leaf_nodes = tree["leaf_nodes"]
        routes = tree["routes"]
        KIND_JOIN = _NodeSpec.KIND_JOIN
        KIND_NEG = _NodeSpec.KIND_NEG
        KIND_KC = _NodeSpec.KIND_KC
        KIND_LEAF = _NodeSpec.KIND_LEAF
        built: List[_RTNode] = []
        for spec, parent_pos, side in cp.build_program:
            node = _RTNode(spec)
            built.append(node)
            nodes_out.append(node)
            kind = spec.kind
            if kind == KIND_JOIN and spec.eq_probe is not None:
                node.buffers = [{"d": {}, "min": None},
                                {"d": {}, "min": None}]
            elif kind == KIND_JOIN and spec.range_probe is not None:
                node.buffers = [_rb_new(), _rb_new()]
            elif kind == KIND_JOIN or kind == KIND_NEG:
                node.buffers = [[], []]
            elif kind == KIND_KC:
                node.buffers = [[]]
            if spec.is_first_unbounded:
                node.pending = []
            if kind == KIND_LEAF:
                lf = spec.leaf
                leaf_nodes[lf.leaf_id] = node
                lst = routes.get(lf.event_type)
                if lst is None:
                    routes[lf.event_type] = [lf]
                else:
                    lst.append(lf)
            if parent_pos < 0:
                tree["root"] = node
                node.sinks.append(("out", tree, None, False))
            else:
                node.sinks.append(("up", tree, built[parent_pos], side,
                                   None, None))
        return tree["root"]

    def _inst_spec(self, spec: _NodeSpec, cp: CompiledPattern, tree):
        """Returns a fresh _RTNode in ``tree``, or a ("shared", mini,
        remap, spec) reference to a shared mini-tree."""
        if not self._shared_sigs:
            return self._inst_fresh(spec, cp, tree)
        sig = spec.share_sig
        if sig is not None and sig in self._shared_sigs:
            mini = self._shared.get(sig)
            if mini is None:
                mini = self._make_mini(spec, cp)
                self._shared[sig] = mini
                self._minis.append(mini)
            remap = _make_remap(mini["owner_spec"], spec)
            return ("shared", mini, remap, spec)
        return self._inst_fresh(spec, cp, tree)

    def _inst_fresh(self, spec: _NodeSpec, cp: CompiledPattern,
                    tree) -> _RTNode:
        node = _RTNode(spec)
        tree["nodes"].append(node)
        if spec.kind == _NodeSpec.KIND_JOIN and spec.eq_probe is not None:
            # hash-probed buffers keyed by the equality join value
            node.buffers = [{"d": {}, "min": None},
                            {"d": {}, "min": None}]
        elif spec.kind == _NodeSpec.KIND_JOIN \
                and spec.range_probe is not None:
            node.buffers = [_rb_new(), _rb_new()]
        elif spec.kind in (_NodeSpec.KIND_JOIN, _NodeSpec.KIND_NEG):
            node.buffers = [[], []]
        elif spec.kind == _NodeSpec.KIND_KC:
            node.buffers = [[]]
        if spec.is_first_unbounded:
            node.pending = []
        if spec.kind == _NodeSpec.KIND_LEAF:
            tree["leaf_nodes"][spec.leaf.leaf_id] = node
            tree["routes"].setdefault(spec.leaf.event_type,
                                      []).append(spec.leaf)
        for i, ch_spec in enumerate(spec.children):
            ref = self._inst_spec(ch_spec, cp, tree)
            if isinstance(ref, _RTNode):
                ref.sinks.append(("up", tree, node, i, None, None))
            else:
                _, mini, remap, _cs = ref
                mini["root"].sinks.append(
                    ("up", tree, node, i, remap, True))
                self._attach_mini(tree, mini, tree["cp"].window_us,
                                  tree["cp"].confidence)
        return node

    def _make_mini(self, spec: _NodeSpec, cp: CompiledPattern) -> dict:
        mini = {"cp": _SharedView(cp.window_us, cp.confidence, cp.storage),
                "root": None, "routes": {}, "leaf_nodes": {}, "nodes": [],
                "first_unbounded": None, "freezers": None,
                "child_minis": [], "owner_spec": spec}
        mini["root"] = self._inst_fresh(spec, cp, mini)
        return mini

    def _attach_mini(self, consumer_tree, mini, window_us, confidence):
        consumer_tree["child_minis"].append(mini)
        self._bump_view(mini, window_us, confidence)

    def _bump_view(self, mini, window_us, confidence):
        """Relax a mini-tree's window/confidence to cover a new consumer,
        propagating into nested minis (reference
        set_and_propagate_pattern_parameters, tree/nodes/Node.py:330-345)."""
        view = mini["cp"]
        changed = False
        if window_us > view.window_us:
            view.window_us = window_us
            changed = True
        if view.confidence is not None and \
                (confidence is None or confidence < view.confidence):
            view.confidence = confidence
            changed = True
        if changed:
            for child in mini["child_minis"]:
                self._bump_view(child, view.window_us, view.confidence)

    # -- ingestion ----------------------------------------------------------
    def process(self, payload: dict, ev_type: str, ts_us: int,
                prob: Optional[float] = None):
        """Feed one event in arrival order; injects the arrival index."""
        idx = self._counter
        self._counter += 1
        payload[INDEX_ATTR] = idx
        ev = Ev(payload, ev_type, ts_us, idx, prob)
        if self._history is not None:
            self._history.append((payload, ev_type, ts_us, prob))
            threshold = ts_us - self._max_window_us
            if self._history[0][2] < threshold:
                self._history = [h for h in self._history
                                 if h[2] >= threshold]
        routing = self._routing
        if routing is not None:  # no freeze policies: flat delivery
            deliveries = routing.get(ev_type)
            if deliveries:
                for tree, lf in deliveries:
                    self._leaf_accept(tree, lf, ev)
            if self.shedding is not None:
                self._last_ts = ts_us
                self._shed_tick += 1
                if self._shed_tick >= 32:
                    self._shed_tick = 0
                    self._maybe_shed()
            return
        for tree in self._all_trees:
            cp = tree["cp"]
            routes = tree["routes"].get(ev_type)
            freezers = tree["freezers"]
            if freezers:
                # expire stale freezers against the newest event
                # (TreeBasedEvaluationMechanism.__remove_expired_freezers)
                w = cp.window_us
                freezers[:] = [f for f in freezers if ts_us - f.min_ts <= w]
            if not routes:
                continue
            for lf in routes:
                if freezers:
                    blocked = False
                    for fr in freezers:
                        bn = cp.freeze_blocked_by_type.get(fr.type)
                        if bn is not None and lf.name in bn:
                            blocked = True
                            break
                    if blocked:
                        continue
                if freezers is not None and lf.name in cp.freezer_names:
                    freezers.append(ev)
                self._leaf_accept(tree, lf, ev)
        if self.shedding is not None:
            self._last_ts = ts_us
            self._shed_tick += 1
            if self._shed_tick >= 32:
                self._shed_tick = 0
                self._maybe_shed()

    def advance_watermark(self, ts_us: int):
        """Flush pending unbounded-negation matches whose window has fully
        passed (watermark analog of tree/nodes/NegationNode.py:70-87), then
        expire unbounded negative buffers (their only expiry point — see
        the accounting note at ``_neg_on_positive``; −2·W keeps every
        negative still compatible with some pending positive)."""
        for tree in self._all_trees:
            self._flush_pending(tree, ts_us)
            thr = ts_us - 2 * tree["cp"].window_us
            for node in tree["nodes"]:
                if node.spec.kind == _NodeSpec.KIND_NEG \
                        and node.spec.is_unbounded:
                    _expire(node.buffers[1], thr)

    def eos(self):
        """End of stream: flush all pending matches (tree/Tree.py:224-238)."""
        for tree in self._all_trees:
            self._flush_pending(tree, None)

    def flush_pending_before(self, ts_us: int):
        """Flush pending unbounded-negation positives with first_ts <
        ``ts_us`` exactly (independent of each pattern's window — unlike
        ``advance_watermark``).  Plan-swap handoff: only safe once every
        such pending's window has fully passed."""
        for tree in self._all_trees:
            self._flush_pending(tree, ts_us + tree["cp"].window_us)

    # -- load shedding ------------------------------------------------------
    def _iter_buffers(self, sheddable_only: bool = False):
        for tree in self._all_trees:
            for node in tree["nodes"]:
                if not node.buffers:
                    continue
                for side, buf in enumerate(node.buffers):
                    if sheddable_only and side == 1 \
                            and node.spec.kind == _NodeSpec.KIND_NEG:
                        # dropping buffered NEGATIVES would fabricate
                        # matches (precision loss); shedding is a recall
                        # tradeoff only
                        continue
                    yield buf

    def _live_pm_count(self) -> int:
        total = 0
        for buf in self._iter_buffers(sheddable_only=True):
            if isinstance(buf, dict):
                if "d" in buf:
                    for lst in buf["d"].values():
                        total += len(lst)
                else:
                    total += len(buf["p"])
            else:
                total += len(buf)
        return total

    def _utility(self, pm: PM) -> float:
        """Reference heuristic (base/PatternMatch.py:45-84): longer chains
        and more remaining window time score higher (the domain-specific
        target-station term is omitted)."""
        cfg = self.shedding
        if cfg.strategy == "oldest":
            return float(pm.first_ts)
        if cfg.strategy == "random":
            return self._shed_rng.random()
        time_remaining_min = (self._max_window_us
                              - (self._last_ts - pm.first_ts)) / 60e6
        return len(pm.entries) * 10.0 + time_remaining_min

    def _maybe_shed(self):
        cfg = self.shedding
        total = self._live_pm_count()
        if total <= cfg.max_partial_matches:
            return
        scored = []
        for buf in self._iter_buffers(sheddable_only=True):
            if isinstance(buf, dict):
                if "d" in buf:
                    for lst in buf["d"].values():
                        scored.extend((self._utility(p), id(p))
                                      for p in lst)
                else:
                    scored.extend((self._utility(p), id(p))
                                  for p in buf["p"])
            else:
                scored.extend((self._utility(p), id(p)) for p in buf)
        scored.sort(key=lambda t: t[0])
        n_drop = total - cfg.target
        drop = {pid for _, pid in scored[:n_drop]}
        for buf in self._iter_buffers(sheddable_only=True):
            if isinstance(buf, dict):
                if "d" in buf:
                    d = buf["d"]
                    new_min = None
                    for val in list(d):
                        lst = [p for p in d[val] if id(p) not in drop]
                        if lst:
                            d[val] = lst
                            for p in lst:
                                if new_min is None or p.first_ts < new_min:
                                    new_min = p.first_ts
                        else:
                            del d[val]
                    buf["min"] = new_min
                else:
                    keep = [i for i, p in enumerate(buf["p"])
                            if id(p) not in drop]
                    if len(keep) != len(buf["p"]):
                        buf["k"] = [buf["k"][i] for i in keep]
                        buf["p"] = [buf["p"][i] for i in keep]
                        buf["min"] = min((p.first_ts for p in buf["p"]),
                                         default=None)
            else:
                buf[:] = [p for p in buf if id(p) not in drop]
        self.shed_count += n_drop

    def rebuilt_with(self, new_compiled: List[CompiledPattern],
                     cond_stats: Optional[Dict] = None
                     ) -> "ConversationEvaluator":
        """Returns a fresh evaluator compiled with ``new_compiled``, its
        state reconstructed by replaying the retained in-window event
        history; matches regenerated during replay are discarded (they
        were already emitted) — the reference's replay-and-dedup tree
        swap (TrivialTreeBasedEvaluationMechnism.py:30-55).  Replayed
        evaluations do not pollute the selectivity counters."""
        if self._history is None:
            raise ValueError("evaluator was not created with "
                             "retain_events=True")
        fresh = ConversationEvaluator(new_compiled, retain_events=True,
                                      share=self.share)
        for payload, typ, ts, prob in self._history:
            fresh.process(dict(payload), typ, ts, prob)
        fresh.matches.clear()
        fresh.cond_stats = cond_stats
        return fresh

    def is_quiescent(self, watermark_us: int) -> bool:
        """True when no state can influence future results given the
        watermark: all buffers expire empty and nothing is pending.  Used
        for streaming state eviction (SURVEY.md §4 'memory pressure')."""
        for tree in self._all_trees:
            threshold = watermark_us - tree["cp"].window_us
            # unbounded negative buffers live to −2·W (see advance_watermark)
            neg_threshold = watermark_us - 2 * tree["cp"].window_us
            for node in tree["nodes"]:
                if node.pending:
                    return False
                unbounded_neg = node.spec.kind == _NodeSpec.KIND_NEG \
                    and node.spec.is_unbounded
                if node.buffers:
                    for side, buf in enumerate(node.buffers):
                        thr = neg_threshold if unbounded_neg and side == 1 \
                            else threshold
                        if isinstance(buf, dict):
                            if "d" in buf:
                                _hb_expire(buf, thr)
                                if buf["d"]:
                                    return False
                            else:
                                _rb_expire(buf, thr, force=True)
                                if buf["p"]:
                                    return False
                        else:
                            _expire(buf, thr)
                            if buf:
                                return False
        return not self.matches

    # -- leaves -------------------------------------------------------------
    def _leaf_accept(self, tree, lf: _LeafSpec, ev: Ev):
        if lf.conditions:
            stats = self.cond_stats
            if stats is None and lf.cond_fast is not None:
                if not lf.cond_fast(ev.payload):
                    return
                node = tree["leaf_nodes"][lf.leaf_id]
                pm = PM(((lf.leaf_id, ev),), ev.prob)
                self._emit(node, pm)
                return
            binding = {lf.name: ev.payload}
            for c in lf.conditions:
                ok = c.eval(binding)
                if stats is not None:
                    key = getattr(c, "_stat_key", None)
                    if key is not None:
                        st = stats.setdefault(key, [0, 0])
                        st[1] += 1
                        st[0] += bool(ok)
                if not ok:
                    return
        node = tree["leaf_nodes"][lf.leaf_id]
        pm = PM(((lf.leaf_id, ev),), ev.prob)
        self._emit(node, pm)

    def _emit(self, node: _RTNode, pm: PM):
        """Dispatch a node's (partial) match to every sink: the parent
        node of each consuming tree (entry keys remapped per pattern for
        shared nodes) and/or a pattern's output."""
        fast = node.fast
        if fast is not None:  # single plain interior sink (dominant case)
            tree, parent, side = fast
            kind = parent.spec.kind
            if kind == _NodeSpec.KIND_JOIN:
                self._join_on_child(tree, parent, pm, side)
            elif kind == _NodeSpec.KIND_KC:
                self._kc_on_child(tree, parent, pm)
            elif side == 0:
                self._neg_on_positive(tree, parent, pm)
            else:
                self._neg_on_negative(tree, parent, pm)
            return
        for sink in node.sinks:
            if sink[0] == "up":   # the hot path: interior propagation
                _, tree, parent, side, remap, check = sink
                up_pm = pm if remap is None else _remap_pm(pm, remap)
                if check and up_pm.last_ts - up_pm.first_ts \
                        > tree["cp"].window_us:
                    # a shared mini runs at the least-restrictive window;
                    # the consumer's own window must re-filter here
                    # because not every parent kind re-validates
                    # (negation nodes pass positives through).  Read the
                    # CURRENT window: a consumer mini's view may have
                    # been relaxed after this sink was wired
                    continue
                kind = parent.spec.kind
                if kind == _NodeSpec.KIND_JOIN:
                    self._join_on_child(tree, parent, up_pm, side)
                elif kind == _NodeSpec.KIND_KC:
                    self._kc_on_child(tree, parent, up_pm)
                elif side == 0:
                    self._neg_on_positive(tree, parent, up_pm)
                else:
                    self._neg_on_negative(tree, parent, up_pm)
                continue
            _, tree, remap, strict = sink
            out_pm = pm if remap is None else _remap_pm(pm, remap)
            if strict:
                # shared root: re-validate this pattern's own window
                # (tree/MultiPatternTree.py:46-54); confidence is
                # re-checked inside _accept_output
                if out_pm.last_ts - out_pm.first_ts \
                        > tree["cp"].window_us:
                    continue
            self._accept_output(tree, out_pm)

    # -- join ---------------------------------------------------------------
    def _join_on_child(self, tree, node: _RTNode, pm: PM, side: int):
        cp = tree["cp"]
        spec = node.spec
        threshold = pm.last_ts - cp.window_us
        probe = spec.eq_probe
        if probe is not None:
            lpos, lattr, rpos, rattr = probe
            my_buf = node.buffers[side]
            other_buf = node.buffers[1 - side]
            _hb_expire(other_buf, threshold)
            _hb_expire(my_buf, threshold)
            if side == 0:
                my_val = pm.entries[lpos][1].payload[lattr]
            else:
                my_val = pm.entries[rpos][1].payload[rattr]
            _hb_add(my_buf, my_val, pm)
            candidates = other_buf["d"].get(my_val, ())
        elif spec.range_probe is not None:
            lpos, lget, rpos, rget, relop = spec.range_probe
            my_buf = node.buffers[side]
            other_buf = node.buffers[1 - side]
            interval = cp.storage.clean_up_interval
            _rb_expire(other_buf, threshold, interval=interval)
            _rb_expire(my_buf, threshold, interval=interval)
            if side == 0:
                my_val = lget(pm.entries[lpos][1].payload)
            else:
                my_val = rget(pm.entries[rpos][1].payload)
            _rb_add(my_buf, my_val, pm)
            # arriving on side 0 probes the right buffer (probe_left False)
            candidates = _rb_candidates(other_buf, my_val, relop,
                                        probe_left=side == 1)
        else:
            other = node.buffers[1 - side]
            _expire(other, threshold)
            _expire(node.buffers[side], threshold)
            node.buffers[side].append(pm)
            candidates = other
        merge = spec.merge_fn
        w = cp.window_us
        pm_first, pm_last, pm_prob = pm.first_ts, pm.last_ts, pm.prob
        pm_entries = pm.entries
        pair = spec.pair_fast if self.cond_stats is None else None
        if pair is not None:
            # compiled pre-merge path: reject on prec/dup/conditions
            # BEFORE paying for the merged tuple + PM (the stats path
            # below needs per-conjunct outcomes, so it stays generic)
            for opm in candidates:
                lo = opm.first_ts if opm.first_ts < pm_first else pm_first
                hi = opm.last_ts if opm.last_ts > pm_last else pm_last
                if hi - lo > w:
                    continue
                if side == 0:
                    l, r = pm_entries, opm.entries
                else:
                    l, r = opm.entries, pm_entries
                if not pair(l, r):
                    continue
                new_pm = PM(merge(l, r), _joint_prob(pm_prob, opm.prob),
                            lo, hi)
                if self._pass_policy(tree, node, new_pm):
                    self._emit(node, new_pm)
            return
        for opm in candidates:
            # window precheck from the two PM spans (avoids per-entry scan)
            lo = opm.first_ts if opm.first_ts < pm_first else pm_first
            hi = opm.last_ts if opm.last_ts > pm_last else pm_last
            if hi - lo > w:
                continue
            merged = merge(pm_entries, opm.entries) if side == 0 \
                else merge(opm.entries, pm_entries)
            new_pm = self._validate(cp, spec, merged,
                                    _joint_prob(pm_prob, opm.prob),
                                    lo, hi)
            if new_pm is not None and self._pass_policy(tree, node, new_pm):
                self._emit(node, new_pm)

    # -- kleene closure -----------------------------------------------------
    def _kc_on_child(self, tree, node: _RTNode, pm: PM):
        cp = tree["cp"]
        spec = node.spec
        buf = node.buffers[0]
        _expire(buf, pm.last_ts - cp.window_us)
        buf.append(pm)
        max_size = spec.max_size if spec.max_size is not None else len(buf)
        # each buffered PM's primitive list + prob are combo-invariant:
        # extract them once per arrival, not once per subset
        cached = []
        for spm in buf:
            prims: List[Ev] = []
            for _, e in spm.entries:
                if e.primitives is None:
                    prims.append(e)
                else:
                    prims.extend(e.primitives)
            cached.append((prims, spm.prob))
        newest_prims, newest_prob = cached[-1]
        rest = cached[:-1]
        # subsets containing the newest, descending size
        # (tree/nodes/KleeneClosureNode.py:58-80, misc/Utils.py:234-244)
        for size in range(min(max_size - 1, len(rest)), -1, -1):
            if size + 1 < spec.min_size:
                break
            for combo in combinations(rest, size):
                prims = []
                prob = None
                for cprims, cprob in combo:
                    prims.extend(cprims)
                    prob = _joint_prob(prob, cprob)
                prims.extend(newest_prims)
                prob = _joint_prob(prob, newest_prob)
                agg = Ev(None, prims[0].type, prims[0].min_ts,
                         self._next_idx(), prob, primitives=prims)
                merged = ((spec.kc_key, agg),)
                new_pm = self._validate(cp, spec, merged, prob)
                if new_pm is not None and self._pass_policy(tree, node,
                                                            new_pm):
                    self._emit(node, new_pm)

    def _next_idx(self):
        # aggregated events get a distinct id space (negative) so primitive
        # arrival indices stay dense; uniqueness is all the no-dup check needs
        self._agg_counter -= 1
        return self._agg_counter

    # -- negation -----------------------------------------------------------
    #
    # Uncertain-negative accounting (tree/nodes/NegationNode.py:96-122,
    # applied exactly once per (pending positive, negative) pair):
    #
    # * FIRST unbounded node: negatives arriving before a positive are
    #   applied by the inline check below at the positive's arrival;
    #   negatives arriving later are applied retroactively in
    #   ``_neg_on_negative``.  Flush emits past this node's own check
    #   (``_flush_pending`` targets the parent), so nothing re-applies.
    # * HIGHER unbounded nodes: the pending positive only traverses the
    #   node at flush time, where the inline check applies every buffered
    #   window-compatible negative once.  ``_neg_on_negative`` therefore
    #   must NOT scale pending probabilities for these nodes (it used to —
    #   double-scaling); it still removes pendings invalidated by CERTAIN
    #   negatives early (safe: the flush-time check would drop them too).
    #
    # For this to be exact, unbounded nodes may not destructively expire
    # their negative buffers on event arrival (flush thresholds are not
    # monotone across pendings); they expire on watermark advance instead
    # (``advance_watermark``, threshold = watermark − 2·W, covering the
    # NegativeAnd case where the negative precedes the positive).
    def _neg_on_positive(self, tree, node: _RTNode, pm: PM):
        cp = tree["cp"]
        neg_buf = node.buffers[1]
        if not node.spec.is_unbounded:
            _expire(neg_buf, pm.last_ts - cp.window_us)
        prob = pm.prob
        spec = node.spec
        merge = spec.merge_fn
        for npm in neg_buf:
            merged = merge(pm.entries, npm.entries)
            if self._validate(cp, spec, merged,
                              _joint_prob(prob, npm.prob)) is not None:
                if npm.prob is not None:
                    # uncertain negative: scale the probability
                    prob = _joint_prob(prob, 1.0 - npm.prob)
                else:
                    return  # invalidated (tree/nodes/NegationNode.py:118-122)
        out = PM(pm.entries, prob, pm.first_ts, pm.last_ts)
        if not self._pass_policy(tree, node, out):
            return
        if node.spec.is_first_unbounded:
            node.pending.append(out)
        else:
            self._emit(node, out)

    def _neg_on_negative(self, tree, node: _RTNode, pm: PM):
        cp = tree["cp"]
        if not node.spec.is_unbounded:
            # bounded: buffer (with eager expiry); nothing else to do
            # (tree/nodes/NegationNode.py:145-147)
            _expire(node.buffers[1], pm.last_ts - cp.window_us)
            node.buffers[1].append(pm)
            return
        node.buffers[1].append(pm)
        first = tree["first_unbounded"]
        if first is None or first.pending is None:
            return
        keep = []
        spec = node.spec
        is_first = spec.is_first_unbounded
        merge = spec.merge_fn
        for ppm in first.pending:
            merged = merge(ppm.entries, pm.entries)
            invalid = False
            if self._validate(cp, spec, merged,
                              _joint_prob(ppm.prob, pm.prob)) is not None:
                if pm.prob is None:
                    invalid = True
                elif is_first:
                    # see the accounting note above: higher unbounded
                    # nodes apply uncertain scaling at flush time only
                    ppm.prob = _joint_prob(ppm.prob, 1.0 - pm.prob)
            if not invalid:
                keep.append(ppm)
        first.pending[:] = keep

    def _flush_pending(self, tree, watermark_us: Optional[int]):
        first = tree["first_unbounded"]
        if first is None or not first.pending:
            return
        cp = tree["cp"]
        if watermark_us is None:
            to_flush, keep = first.pending[:], []
        else:
            threshold = watermark_us - cp.window_us
            first.pending.sort(key=lambda p: p.first_ts)
            to_flush = [p for p in first.pending if p.first_ts < threshold]
            keep = [p for p in first.pending if p.first_ts >= threshold]
        first.pending[:] = keep
        for pm in to_flush:
            self._emit(first, pm)

    # -- validation ---------------------------------------------------------
    def _validate(self, cp: CompiledPattern, spec: _NodeSpec,
                  entries, prob, min_ts=None, max_ts=None) -> Optional[PM]:
        # window (tree/nodes/Node.py:187-193); bounds may be precomputed
        # from the two joined PM spans
        if min_ts is None:
            e0 = entries[0][1]
            min_ts = e0.min_ts
            max_ts = e0.max_ts
            for _, e in entries:
                if e.min_ts < min_ts:
                    min_ts = e.min_ts
                if e.max_ts > max_ts:
                    max_ts = e.max_ts
            if max_ts - min_ts > cp.window_us:
                return None
        # duplicate events — only when the same event type can bind on
        # both sides (tree/nodes/InternalNode.py:28-30)
        if spec.needs_dup:
            idxs = set()
            for _, e in entries:
                if e.idx in idxs:
                    return None
                idxs.add(e.idx)
        # SEQ precedence, precompiled per node (tree/nodes/SeqNode.py:30-33)
        for i, j, check_max in spec.prec_checks:
            ei = entries[i][1]
            ej = entries[j][1]
            if ei.min_ts > ej.min_ts:
                return None
            if check_max and ei.max_ts > ej.max_ts:
                return None
        # conditions
        if spec.conditions:
            stats0 = self.cond_stats
            if stats0 is None and spec.cond_fast is not None:
                if not spec.cond_fast(entries):
                    return None
                return PM(entries, prob, min_ts, max_ts)
            if spec.kind == _NodeSpec.KIND_KC:
                items = entries[0][1].content()
                binding = {name: items for name in spec.names}
            else:
                binding = {}
                for idx, name in spec.cond_plan:
                    binding[name] = entries[idx][1].content()
            stats = self.cond_stats
            if stats is None:
                for c in spec.conditions:
                    if not c.eval(binding):
                        return None
            else:
                for c in spec.conditions:
                    ok = c.eval(binding)
                    key = getattr(c, "_stat_key", None)
                    if key is not None:
                        st = stats.setdefault(key, [0, 0])
                        st[1] += 1
                        st[0] += bool(ok)
                    if not ok:
                        return None
        return PM(entries, prob, min_ts, max_ts)

    # -- policies & output ---------------------------------------------------
    def _pass_policy(self, tree, node: _RTNode, pm: PM) -> bool:
        cp = tree["cp"]
        if pm.prob is not None and cp.confidence is not None \
                and pm.prob < cp.confidence:
            return False  # confidence threshold (tree/nodes/Node.py:140-146)
        if cp.match_next_types and node.filtered is not None:
            return self._apply_single(node, pm, cp.match_next_types)
        return True

    def _apply_single(self, node: _RTNode, pm: PM, types: frozenset) -> bool:
        new = []
        for _, e in pm.entries:
            prims = e.primitives if e.primitives is not None else (e,)
            for p in prims:
                if p.type in types:
                    if p.idx in node.filtered:
                        return False
                    new.append(p.idx)
        node.filtered.update(new)
        return True

    def _accept_output(self, tree, pm: PM):
        cp = tree["cp"]
        if pm.prob is not None and cp.confidence is not None \
                and pm.prob < cp.confidence:
            return
        if cp.single_at_root:
            if not self._apply_single(tree["root"], pm, cp.single_at_root):
                return
        if tree["freezers"]:
            # matched freezers unfreeze (entry-level identity, like the
            # reference's `freezer not in match.events`)
            matched = {e.idx for _, e in pm.entries}
            tree["freezers"][:] = [f for f in tree["freezers"]
                                   if f.idx not in matched]
        # store the compiled pattern itself: OR-split disjuncts share the
        # source pattern_id, so an id-keyed lookup would resolve to the
        # wrong disjunct's entry layout
        self.matches.append((cp, pm))

    # -- output helpers ------------------------------------------------------
    def binding_of(self, pattern_index: int, pm: PM) -> Dict[str, object]:
        """Event name -> payload (list of payloads for KC names)."""
        cp = self.compiled[pattern_index]
        out = {}
        for key, e in pm.entries:
            content = e.content()
            for name in cp.entry_names[key]:
                out[name] = content
        return out

    @staticmethod
    def primitive_events(pm: PM, cp: Optional[CompiledPattern] = None) -> List[Ev]:
        """All primitive events of a match, in pattern-slot order (KC items
        in arrival order), matching the reference's match event list."""
        entries = pm.entries
        if cp is not None and not cp.entries_slot_ordered:
            slot_of = cp.entry_slot
            entries = sorted(entries, key=lambda t: slot_of[t[0]])
        out = []
        for _, e in entries:
            if e.primitives is None:
                out.append(e)
            else:
                out.extend(e.primitives)
        return out


def _remap_pm(pm: PM, remap: dict) -> PM:
    """Translate a shared subtree's PM entry keys into a consuming
    pattern's key space.  Key assignment within equivalent subtrees is
    order-preserving (leaves in declaration order, KC keys above all leaf
    ids in both patterns), so the sorted-entry invariant survives."""
    return PM(tuple((remap[k], e) for k, e in pm.entries),
              pm.prob, pm.first_ts, pm.last_ts)


def _make_remap(owner_spec: _NodeSpec, other_spec: _NodeSpec):
    """Entry-key map from a shared mini-tree's owner pattern to another
    consuming pattern (equivalent subtree structures walked in lockstep);
    None when the keys already coincide."""
    remap: Dict[int, int] = {}

    def walk(a: _NodeSpec, b: _NodeSpec):
        if a.kind == _NodeSpec.KIND_LEAF:
            remap[a.leaf.leaf_id] = b.leaf.leaf_id
            return
        if a.kind == _NodeSpec.KIND_KC:
            # only the aggregate key escapes a KC node
            remap[a.kc_key] = b.kc_key
            return
        for ca, cb in zip(a.children, b.children):
            walk(ca, cb)

    walk(owner_spec, other_spec)
    if all(k == v for k, v in remap.items()):
        return None
    return remap


def _expire(buf: List[PM], threshold: int):
    """Drop the expired prefix (first_ts < threshold) — storage cleanup,
    tree/PatternMatchStorage.py:70-89.  Buffers are append-ordered, so the
    oldest PMs cluster at the front; deleting only the contiguous expired
    prefix is O(expired) instead of a full-list rebuild.  Any expired PM
    stranded behind a fresh one is dropped once its predecessors expire
    (threshold is monotone), at most one extra window late — harmless,
    because the window is re-validated on every match creation."""
    if buf and buf[0].first_ts < threshold:
        n = 1
        ln = len(buf)
        while n < ln and buf[n].first_ts < threshold:
            n += 1
        del buf[:n]


def _compile_pair_fast(spec):
    """Compile a join node's full candidate check — precedence, cross-side
    duplicate events, and the condition conjunction — into one closure over
    the UNMERGED sides ``(l_entries, r_entries)``.  Lets ``_join_on_child``
    reject a candidate before paying for the merged tuple + PM (55 % of
    candidates on the flagship bench fail here).  Returns None when any
    condition falls outside the compilable SimpleCondition family; the
    generic merged-entries ``_validate`` path then runs instead.

    Within-side duplicates need no check: each side was validated at its
    own node with its own ``needs_dup``, so only cross-side overlaps can
    introduce one (tree/nodes/InternalNode.py:28-30)."""
    plan = spec.merge_plan
    prec_t = tuple((plan[i][0], plan[i][1], plan[j][0], plan[j][1], cmax)
                   for i, j, cmax in spec.prec_checks)
    name_to_idx = {}
    for idx, name in spec.cond_plan:
        name_to_idx.setdefault(name, idx)
    cond_fns = []
    for c in spec.conditions:
        if not isinstance(c, SimpleCondition) \
                or type(c).eval is not SimpleCondition.eval \
                or type(c)._values is not SimpleCondition._values:
            return None
        relop = c.relation_op
        getters = []
        for t in c.terms:
            if isinstance(t, Variable):
                idx = name_to_idx.get(t.name)
                if idx is None:
                    return None
                s, p = plan[idx]
                getters.append((s, p, t.getattr_func))
            else:
                getters.append((None, None, t))
        if len(getters) == 2:
            (s0, p0, g0), (s1, p1, g1) = getters

            def f(l, r, relop=relop, s0=s0, p0=p0, g0=g0,
                  s1=s1, p1=p1, g1=g1):
                v0 = g0((l if s0 == 0 else r)[p0][1].content()) \
                    if s0 is not None else g0
                v1 = g1((l if s1 == 0 else r)[p1][1].content()) \
                    if s1 is not None else g1
                return relop(v0, v1)
        else:
            def f(l, r, relop=relop, getters=tuple(getters)):
                return relop(*[g((l if s == 0 else r)[p][1].content())
                               if s is not None else g
                               for s, p, g in getters])
        cond_fns.append(f)
    cond_fns = tuple(cond_fns)
    needs_dup = spec.needs_dup

    def pair(l, r, prec_t=prec_t, cond_fns=cond_fns, needs_dup=needs_dup):
        for si, pi, sj, pj, cmax in prec_t:
            ei = (l if si == 0 else r)[pi][1]
            ej = (l if sj == 0 else r)[pj][1]
            if ei.min_ts > ej.min_ts:
                return False
            if cmax and ei.max_ts > ej.max_ts:
                return False
        if needs_dup:
            for a in l:
                ai = a[1].idx
                for b in r:
                    if b[1].idx == ai:
                        return False
        for fn in cond_fns:
            if not fn(l, r):
                return False
        return True
    return pair


def _compile_cond_fast(conditions, cond_plan):
    """Compile a node's conjunction into one entries-direct closure —
    no per-candidate binding dict, no Variable/eval dispatch.  Covers the
    SimpleCondition family (incl. the relop conditions) whose terms are
    Variables over this node's bound names or constants; returns None for
    anything else (KC / composite / unknown), which keeps the generic
    dict-binding path.  Used only when selectivity instrumentation is off
    (the stats path needs per-conjunct outcomes)."""
    if not conditions:
        return None
    name_to_idx = {}
    for idx, name in cond_plan:
        name_to_idx.setdefault(name, idx)
    fns = []
    for c in conditions:
        # only conditions whose semantics ARE SimpleCondition.eval (a user
        # subclass overriding eval/_values must keep the generic path)
        if not isinstance(c, SimpleCondition) \
                or type(c).eval is not SimpleCondition.eval \
                or type(c)._values is not SimpleCondition._values:
            return None
        relop = c.relation_op
        getters = []
        for t in c.terms:
            if isinstance(t, Variable):
                idx = name_to_idx.get(t.name)
                if idx is None:
                    return None
                getters.append((idx, t.getattr_func))
            else:
                getters.append((None, t))
        if len(getters) == 2 and getters[0][0] is not None \
                and getters[1][0] is not None:
            (i0, g0), (i1, g1) = getters

            def f(entries, relop=relop, i0=i0, g0=g0, i1=i1, g1=g1):
                return relop(g0(entries[i0][1].content()),
                             g1(entries[i1][1].content()))
        else:
            def f(entries, relop=relop, getters=tuple(getters)):
                return relop(*[g(entries[i][1].content())
                               if i is not None else g
                               for i, g in getters])
        fns.append(f)
    if len(fns) == 1:
        return fns[0]

    def conj(entries, fns=tuple(fns)):
        for fn in fns:
            if not fn(entries):
                return False
        return True
    return conj


def _compile_leaf_cond_fast(conditions):
    """Leaf analog of ``_compile_cond_fast``: payload-direct single-event
    conjunction (the leaf binding is always {name: payload})."""
    if not conditions:
        return None
    fns = []
    for c in conditions:
        if not isinstance(c, SimpleCondition) \
                or type(c).eval is not SimpleCondition.eval \
                or type(c)._values is not SimpleCondition._values:
            return None
        relop = c.relation_op
        getters = [(t.getattr_func if isinstance(t, Variable) else None, t)
                   for t in c.terms]
        if len(getters) == 2:
            (g0, t0), (g1, t1) = getters

            def f(payload, relop=relop, g0=g0, t0=t0, g1=g1, t1=t1):
                return relop(g0(payload) if g0 is not None else t0,
                             g1(payload) if g1 is not None else t1)
        else:
            def f(payload, relop=relop, getters=tuple(getters)):
                return relop(*[g(payload) if g is not None else t
                               for g, t in getters])
        fns.append(f)
    if len(fns) == 1:
        return fns[0]

    def conj(payload, fns=tuple(fns)):
        for fn in fns:
            if not fn(payload):
                return False
        return True
    return conj


def _make_merge_fn(plan):
    """Shape-specialized merge closures for the common small joins — avoids
    a generator expression per candidate pair in the hot loop."""
    if plan == ((0, 0), (1, 0)):
        return lambda l, r: (l[0], r[0])
    if plan == ((1, 0), (0, 0)):
        return lambda l, r: (r[0], l[0])
    if plan == ((0, 0), (0, 1), (1, 0)):
        return lambda l, r: (l[0], l[1], r[0])
    if plan == ((0, 0), (1, 0), (0, 1)):
        return lambda l, r: (l[0], r[0], l[1])
    if plan == ((1, 0), (0, 0), (0, 1)):
        return lambda l, r: (r[0], l[0], l[1])
    return lambda l, r, p=plan: tuple(l[i] if s == 0 else r[i]
                                      for s, i in p)


def _rb_new() -> dict:
    """A value-sorted buffer: parallel key/PM lists kept sorted by the
    probe key (SortedPatternMatchStorage analog,
    tree/PatternMatchStorage.py:144-283)."""
    return {"k": [], "p": [], "min": None, "adds": 0}


def _rb_add(buf: dict, val, pm: PM):
    """Insert by binary search on the probe key (stable for ties:
    bisect_right appends after equal keys, preserving arrival order)."""
    i = bisect_right(buf["k"], val)
    buf["k"].insert(i, val)
    buf["p"].insert(i, pm)
    if buf["min"] is None or pm.first_ts < buf["min"]:
        buf["min"] = pm.first_ts
    buf["adds"] += 1


def _rb_expire(buf: dict, threshold: int, force: bool = False,
               interval: int = 16):
    """Window expiry for a value-sorted buffer.  The sort key is the probe
    value, not time, so cleanup is a full O(n) rebuild — amortized by
    running only every ``interval`` insertions
    (``StorageConfig.clean_up_interval``; the reference's lazy cleanup,
    misc/DefaultConfig.py:35); correctness is unaffected because the
    window is re-validated per candidate."""
    m = buf["min"]
    if m is None or m >= threshold:
        return
    if not force and buf["adds"] < interval:
        return
    buf["adds"] = 0
    keys, pms = buf["k"], buf["p"]
    kk, pp = [], []
    new_min = None
    for i, pm in enumerate(pms):
        ft = pm.first_ts
        if ft >= threshold:
            kk.append(keys[i])
            pp.append(pm)
            if new_min is None or ft < new_min:
                new_min = ft
    buf["k"], buf["p"], buf["min"] = kk, pp, new_min


def _rb_candidates(buf: dict, val, relop: str, probe_left: bool) -> list:
    """The slice of the OTHER side's buffer compatible with ``relop``.
    ``probe_left`` False: find right-side values v with relop(val, v);
    True: find left-side values v with relop(v, val).  Exactly the
    reference's relop→slice mapping (PatternMatchStorage.py:263-283)."""
    keys = buf["k"]
    if relop == RelopTypes.Greater:
        if probe_left:
            lo, hi = bisect_right(keys, val), len(keys)
        else:
            lo, hi = 0, bisect_left(keys, val)
    elif relop == RelopTypes.GreaterEqual:
        if probe_left:
            lo, hi = bisect_left(keys, val), len(keys)
        else:
            lo, hi = 0, bisect_right(keys, val)
    elif relop == RelopTypes.Smaller:
        if probe_left:
            lo, hi = 0, bisect_left(keys, val)
        else:
            lo, hi = bisect_right(keys, val), len(keys)
    else:  # SmallerEqual
        if probe_left:
            lo, hi = 0, bisect_right(keys, val)
        else:
            lo, hi = bisect_left(keys, val), len(keys)
    if lo >= hi:
        return ()
    return buf["p"][lo:hi]


def _hb_add(buf: dict, val, pm: PM):
    """Insert into a hash-probed buffer keyed by the equality join value."""
    d = buf["d"]
    lst = d.get(val)
    if lst is None:
        d[val] = [pm]
    else:
        lst.append(pm)
    if buf["min"] is None or pm.first_ts < buf["min"]:
        buf["min"] = pm.first_ts


def _hb_expire(buf: dict, threshold: int):
    """Window expiry for a hash-probed buffer; skipped entirely while the
    oldest resident is still fresh."""
    m = buf["min"]
    if m is None or m >= threshold:
        return
    d = buf["d"]
    new_min = None
    for val in list(d):
        lst = [p for p in d[val] if p.first_ts >= threshold]
        if lst:
            d[val] = lst
            for p in lst:
                if new_min is None or p.first_ts < new_min:
                    new_min = p.first_ts
        else:
            del d[val]
    buf["min"] = new_min


