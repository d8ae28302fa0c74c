"""Randomized semantic fuzz for the round-15 pre-passes — the IN/NOT IN
operator rewrite and the bare-``/`` division rewrite are TEXT rewrites
that touch every translated query, so they get the same treatment the
r9/r10 rewriters got: seeded random expressions evaluated through
Spark and compared against an INDEPENDENT pure-Python evaluator of
ClickHouse's documented semantics (two-valued IN, IEEE ±inf/nan
division), plus string-literal payload protection.
"""

from __future__ import annotations

import math
import random

import pytest

from mcp_clickhouse_spark.dialect import translate


def _py_in(x, items, negate):
    """CH two-valued IN: NULL probe → 0; NULL elements never match."""
    if x is None:
        return False
    hit = any(it is not None and it == x for it in items)
    return (not hit) if negate else hit


def _py_div(x, y):
    """CH divide: Float64, zero denominator → ±inf/nan."""
    if x is None or y is None:
        return None
    if y == 0:
        if x > 0:
            return math.inf
        if x < 0:
            return -math.inf
        return math.nan
    return x / y


def _lit(v):
    return "NULL" if v is None else str(v)


def test_in_operator_randomized(spark):
    rng = random.Random(151515)
    exprs, expected = [], []
    for i in range(80):
        x = rng.choice([None] + list(range(-3, 7)))
        items = [rng.choice([None] + list(range(-3, 7)))
                 for _ in range(rng.randint(1, 5))]
        negate = rng.random() < 0.5
        op = "NOT IN" if negate else "IN"
        exprs.append(
            f"toInt64({_lit(x)} {op} ({', '.join(_lit(v) for v in items)}))"
            f" AS c{i}"
        )
        expected.append(int(_py_in(x, items, negate)))
    row = spark.sql(translate("SELECT " + ", ".join(exprs))).collect()[0]
    for i, exp in enumerate(expected):
        assert row[f"c{i}"] == exp, (i, exprs[i])


def test_in_operator_arithmetic_operands_randomized(spark):
    # operand extraction across arithmetic chains: a + b*c IN (...)
    rng = random.Random(161616)
    exprs, expected = [], []
    for i in range(40):
        a, b, c = (rng.randint(-4, 4) for _ in range(3))
        items = [rng.choice([None] + list(range(-10, 20)))
                 for _ in range(rng.randint(1, 4))]
        negate = rng.random() < 0.5
        op = "NOT IN" if negate else "IN"
        exprs.append(
            f"toInt64({a} + {b} * {c} {op}"
            f" ({', '.join(_lit(v) for v in items)})) AS c{i}"
        )
        expected.append(int(_py_in(a + b * c, items, negate)))
    row = spark.sql(translate("SELECT " + ", ".join(exprs))).collect()[0]
    for i, exp in enumerate(expected):
        assert row[f"c{i}"] == exp, (i, exprs[i])


def test_division_randomized(spark):
    rng = random.Random(171717)
    exprs, expected = [], []
    for i in range(80):
        x = rng.choice([None] + list(range(-5, 6)))
        y = rng.choice([None, 0, 0] + list(range(-4, 5)))
        form = rng.choice(["bare", "fn"])
        e = (f"divide({_lit(x)}, {_lit(y)})" if form == "fn"
             else f"{_lit(x)} / {_lit(y)}")
        exprs.append(f"{e} AS c{i}")
        expected.append(_py_div(x, y))
    row = spark.sql(translate("SELECT " + ", ".join(exprs))).collect()[0]
    for i, exp in enumerate(expected):
        got = row[f"c{i}"]
        if exp is None:
            assert got is None, (i, exprs[i], got)
        elif isinstance(exp, float) and math.isnan(exp):
            assert got != got, (i, exprs[i], got)
        else:
            assert got == pytest.approx(exp), (i, exprs[i], got)


def test_division_chain_order(spark):
    # a / b / c and a * b / c keep left-to-right evaluation exactly
    rng = random.Random(181818)
    for _ in range(25):
        a = rng.randint(-20, 20)
        b = rng.choice([rng.randint(-6, 6), 0])
        c = rng.choice([rng.randint(-6, 6), 0])
        got = spark.sql(
            translate(f"SELECT {a} / {b} / {c} AS v, {a} * {b} / {c} AS w")
        ).collect()[0]
        exp_v = _py_div(_py_div(a, b), c)
        exp_w = _py_div(a * b, c)
        for got_x, exp_x in ((got["v"], exp_v), (got["w"], exp_w)):
            if isinstance(exp_x, float) and math.isnan(exp_x):
                assert got_x != got_x, (a, b, c)
            else:
                assert got_x == pytest.approx(exp_x), (a, b, c)


def test_string_literals_survive_pre_passes():
    """Payloads that LOOK like IN/division inside string literals stay
    byte-identical through translate (the r9 fuzz contract)."""
    payloads = [
        "x NOT IN (1, NULL)",
        "a / 0",
        "1 / 0 IN (2)",
        "it''s IN (NULL) / 2",
        'he said "3 / 0"',
    ]
    for p in payloads:
        sql = f"SELECT '{p}' AS s, 1 / 2 AS d"
        out = translate(sql)
        assert f"'{p}'" in out, (p, out)


def test_py_div_matches_divide_chain_types(spark):
    # nested: division inside a mapped call's arguments (recursive
    # translate re-runs the pre-pass on the fragment — results stable)
    got = spark.sql(
        translate("SELECT round(if(1 / 0 = divide(2, 0), 1.0, 0.0), 3)")
    ).collect()[0][0]
    assert got == 1.0  # inf == inf
