"""StorageConfig — the TreeStorageParameters analog
(/root/reference/tree/PatternMatchStorage.py:308-332): every knob
combination yields IDENTICAL match sets (storage is cost-only), the
probe gating actually takes effect, attributes_priorities selects the
probe key, and clean_up_interval is threaded into sorted-buffer expiry."""

import pytest

from opencep_ray import (AndCondition, Col, EqCondition,
                         GreaterThanCondition,
                         Pattern, Primitive, Seq, StorageConfig,
                         compile_patterns)
from opencep_ray.evaluator import ConversationEvaluator, _NodeSpec

from test_evaluator_vs_oracle import _canonical, gen_stream


def _run(patterns, events, storage=None):
    compiled = compile_patterns(patterns, storage=storage)
    ev = ConversationEvaluator(compiled)
    for payload, typ, ts in events:
        ev.process(dict(payload), typ, ts)
    ev.eos()
    return (sorted((cp.pattern_id, _canonical(cp, pm))
                   for cp, pm in ev.matches), compiled)


def _join_specs(compiled):
    return [spec for cp in compiled for spec, _, _ in cp.build_program
            if spec.kind == _NodeSpec.KIND_JOIN]


PATTERN_INEQ = Pattern(
    Seq(Primitive("user", "a"), Primitive("assistant", "b")),
    GreaterThanCondition(Col("b", "v"), Col("a", "v")), window=8)
PATTERN_EQ = Pattern(
    Seq(Primitive("user", "a"), Primitive("assistant", "b")),
    EqCondition(Col("a", "v"), Col("b", "v")), window=8)


CONFIGS = [
    None,
    StorageConfig(),
    StorageConfig(sort_storage=False),
    StorageConfig(prioritize_sorting_by_timestamp=True),
    StorageConfig(clean_up_interval=1),
    StorageConfig(clean_up_interval=1000),
]


@pytest.mark.parametrize("seed", [0, 3, 7])
def test_all_configs_identical_matches(seed):
    events = gen_stream(seed, n=80, val_range=5)
    for pattern in (PATTERN_INEQ, PATTERN_EQ):
        base, _ = _run(pattern, events)
        assert base, "empty match set makes a weak test"
        for st in CONFIGS:
            got, _ = _run(pattern, events, storage=st)
            assert got == base, st


def test_sort_storage_false_disables_all_probes():
    _, compiled = _run(PATTERN_EQ, gen_stream(1, n=10),
                       storage=StorageConfig(sort_storage=False))
    for spec in _join_specs(compiled):
        assert spec.eq_probe is None and spec.range_probe is None
    # default: the equality condition gets a hash probe
    _, compiled = _run(PATTERN_EQ, gen_stream(1, n=10))
    assert any(s.eq_probe is not None for s in _join_specs(compiled))


def test_prioritize_timestamp_keeps_hash_drops_sorted():
    st = StorageConfig(prioritize_sorting_by_timestamp=True)
    _, c_eq = _run(PATTERN_EQ, gen_stream(1, n=10), storage=st)
    assert any(s.eq_probe is not None for s in _join_specs(c_eq))
    _, c_ineq = _run(PATTERN_INEQ, gen_stream(1, n=10), storage=st)
    for spec in _join_specs(c_ineq):
        assert spec.range_probe is None     # stays time-ordered linear


def test_attributes_priorities_select_probe_key():
    """Two probe-able equality conditions on different attributes: the
    prioritized attribute must key the hash buffer."""
    pattern = Pattern(
        Seq(Primitive("user", "a"), Primitive("assistant", "b")),
        AndCondition(EqCondition(Col("a", "v"), Col("b", "v")),
                     EqCondition(Col("a", "turn"), Col("b", "turn"))),
        window=8)
    _, default = _run(pattern, gen_stream(2, n=10))
    chosen_default = [s.eq_probe[1] for s in _join_specs(default)
                      if s.eq_probe]
    assert chosen_default == ["v"]          # first declared wins
    _, prio = _run(pattern, gen_stream(2, n=10),
                   storage=StorageConfig(
                       attributes_priorities={"turn": 10}))
    chosen = [s.eq_probe[1] for s in _join_specs(prio) if s.eq_probe]
    assert chosen == ["turn"]
    # and results are unaffected by the probe-key choice
    base, _ = _run(pattern, gen_stream(5, n=60, val_range=3))
    got, _ = _run(pattern, gen_stream(5, n=60, val_range=3),
                  storage=StorageConfig(attributes_priorities={"turn": 10}))
    assert got == base


def test_clean_up_interval_validation():
    with pytest.raises(ValueError):
        StorageConfig(clean_up_interval=0)


def test_engine_config_threads_storage(ray_session):
    """EngineConfig(storage=...) reaches the compiled patterns in the
    batch engine."""
    from opencep_ray.engine import CEP, EngineConfig
    cep = CEP(PATTERN_INEQ,
              EngineConfig(key_col="conv", ts_col="ts", type_col="role",
                           order_cols=("turn",),
                           storage=StorageConfig(sort_storage=False)))
    for spec in _join_specs(cep.compiled):
        assert spec.eq_probe is None and spec.range_probe is None
    assert cep.compiled[0].storage.sort_storage is False
