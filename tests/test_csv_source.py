"""Metastock-style CSV source: normalized schema, ticker event types,
probability column through the engine (reference NASDAQ test-stream
shape, plugin/stocks/Stocks.py:23-61)."""

from opencep_ray import (Col, Pattern, Primitive, Seq,
                         SmallerThanCondition)
from opencep_ray.engine import CEP
from opencep_ray.sources.csv_source import stocks_config, stocks_table

LINES = [
    "AAPL,200802010900,130.0,131.0,129.0,130.5,1000",
    "GOOG,200802010905,500.0,505.0,499.0,502.0,2000",
    "AAPL,200802010910,131.0,132.0,130.0,131.5,1100",
    "GOOG,200802010915,503.0,506.0,500.0,501.0,1900",
    "AAPL,200802010930,129.0,130.0,128.0,129.5,900",
]


def test_stocks_seq_pattern():
    table = stocks_table(LINES)
    assert str(table.schema.field("ts").type) == "timestamp[us]"
    p = Pattern(Seq(Primitive("AAPL", "a"), Primitive("GOOG", "b")),
                SmallerThanCondition(Col("a", "close"), Col("b", "close")),
                window=3600)
    out = CEP(p, stocks_config()).run_table(table)
    pairs = sorted((r["match_events"][0]["arrival"],
                    r["match_events"][1]["arrival"])
                   for r in out.to_pylist())
    # every AAPL before a GOOG with a higher close
    assert pairs == [(0, 1), (0, 3), (2, 3)]


def test_stocks_probability_confidence():
    lines = [l + f",{p}" for l, p in zip(LINES, [0.9, 0.8, 0.5, 0.9, 0.1])]
    table = stocks_table(lines, has_probability=True)
    p = Pattern(Seq(Primitive("AAPL", "a"), Primitive("GOOG", "b")),
                window=3600, confidence=0.5)
    out = CEP(p, stocks_config(has_probability=True)).run_table(table)
    rows = out.to_pylist()
    # joint probability attached; sub-threshold combinations dropped
    assert all(r["probability"] >= 0.5 for r in rows)
    got = sorted((r["match_events"][0]["arrival"],
                  r["match_events"][1]["arrival"],
                  round(r["probability"], 4)) for r in rows)
    assert got == [(0, 1, 0.72), (0, 3, 0.81)]
