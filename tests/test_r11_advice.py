"""Round-11 advisor regression tests.

1. (HIGH) any/anyLast/first_value/last_value — CH ignores NULLs by
   default; the Spark mappings must pass ignoreNulls=true explicitly,
   including through the generated -If / -OrNull combinator chains.
2. toStartOfInterval timezone form: sub-day non-UTC buckets are only
   zone-safe when the width divides 15 minutes.
3. extractKeyValuePairs: regex-escaped literal delimiters, no implicit
   space in explicit delimiter sets, guided error on the 4-arg form.
4. ch_tgamma: ±0 pole returns ±inf (C tgamma), negative integers NaN.
5. hasSubstr: UInt8 (INT) contract on both branches.
"""

from __future__ import annotations

import math

import pytest

from mcp_clickhouse_spark.dialect import DialectError, translate
from mcp_clickhouse_spark.tools import run_select_query


def rows(spark, ch_sql):
    return run_select_query(spark, ch_sql, dialect="clickhouse")["rows"]


@pytest.fixture(scope="module", autouse=True)
def nullable_view(spark):
    # ordered so first/last are deterministic: v = NULL, 10, 20, NULL
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW r11_nulls AS"
        " SELECT * FROM VALUES (1, CAST(NULL AS INT)), (2, 10),"
        " (3, 20), (4, CAST(NULL AS INT)) AS t(id, v)"
    )


def test_any_anylast_ignore_nulls(spark):
    row = rows(
        spark,
        "SELECT any(v) AS a, anyLast(v) AS al,"
        " first_value(v) AS fv, last_value(v) AS lv"
        " FROM (SELECT * FROM r11_nulls ORDER BY id)",
    )[0]
    # CH skips the NULL bookends: first non-NULL = 10, last non-NULL = 20
    assert tuple(row) == (10, 20, 10, 20)


def test_any_anylast_if_combinators(spark):
    row = rows(
        spark,
        "SELECT anyIf(v, id > 1) AS ai, anyLastIf(v, id < 4) AS ali,"
        " anyLastIf(v, id = 4) AS ali4, anyLastOrNullIf(v, id < 4) AS alo"
        " FROM (SELECT * FROM r11_nulls ORDER BY id)",
    )[0]
    # anyLastIf(v, id<4): last MATCHING non-NULL is 20 even though the
    # group's last matching row (id=1? no — id=3 v=20) — and id=4 matches
    # nothing non-NULL → NULL, not a wrong carried value
    assert tuple(row) == (10, 20, None, 20)


def test_respect_nulls_spellings_keep_spark_default(spark):
    row = rows(
        spark,
        "SELECT anyRespectNulls(v) AS a, anyLastRespectNulls(v) AS al"
        " FROM (SELECT * FROM r11_nulls ORDER BY id)",
    )[0]
    assert tuple(row) == (None, None)


def test_first_last_value_window_ignore_nulls(spark):
    out = rows(
        spark,
        "SELECT id, firstValue(v) OVER w AS fv, lastValue(v) OVER w AS lv"
        " FROM r11_nulls"
        " WINDOW w AS (ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING"
        " AND UNBOUNDED FOLLOWING) ORDER BY id",
    )
    assert [tuple(r) for r in out] == [
        (1, 10, 20), (2, 10, 20), (3, 10, 20), (4, 10, 20)
    ]


def test_tostartofinterval_timezone_widths():
    # widths dividing 15 min are zone-safe (every real offset is a
    # multiple of 900 s) — epoch floor accepted
    t = translate(
        "SELECT toStartOfInterval(ts, INTERVAL 15 MINUTE, 'Asia/Kolkata')"
    )
    assert "/ 900" in t
    t = translate(
        "SELECT toStartOfInterval(ts, INTERVAL 5 MINUTE, 'America/New_York')"
    )
    assert "/ 300" in t
    # multi-hour bucket in a whole-hour-offset zone: CH's zone-local
    # bucket start differs from the epoch floor → guided error
    with pytest.raises(DialectError, match="zone-dependent"):
        translate(
            "SELECT toStartOfInterval(ts, INTERVAL 2 HOUR, 'America/New_York')"
        )
    # any bucket > its divisor in a fractional-offset zone
    with pytest.raises(DialectError, match="zone-dependent"):
        translate(
            "SELECT toStartOfInterval(ts, INTERVAL 1 HOUR, 'Asia/Kolkata')"
        )
    # DAY stays guarded
    with pytest.raises(DialectError, match="zone-dependent"):
        translate(
            "SELECT toStartOfInterval(ts, INTERVAL 1 DAY, 'America/New_York')"
        )
    # UTC always fine
    t = translate("SELECT toStartOfInterval(ts, INTERVAL 2 HOUR, 'UTC')")
    assert "/ 7200" in t


def test_extract_key_value_pairs_escaping(spark):
    row = rows(
        spark,
        "SELECT extractKeyValuePairs('a:1|b:2|c:]3', ':', '|') AS m,"
        " extractKeyValuePairs('x=1, y=2', '=') AS m2,"
        " extractKeyValuePairs('name:neymar, age:31 team:psg') AS m3",
    )[0]
    # ']' in the pair-delimiter set must be escaped; space is NOT
    # implicitly added to an EXPLICIT delimiter set (row[0]'s values keep
    # nothing split on space because '|' is the only pair delimiter)
    assert row[0] == {"a": "1", "b": "2", "c": "]3"}
    # 2-arg form keeps CH's default pair delimiters {space , ;}
    assert row[1] == {"x": "1", "y": "2"}
    assert row[2] == {"name": "neymar", "age": "31", "team": "psg"}
    # explicit delimiter set without space: space must NOT split pairs
    row = rows(
        spark,
        "SELECT extractKeyValuePairs('a:1 b:2,c:3', ':', ',') AS m",
    )[0]
    assert row[0] == {"a": "1 b:2", "c": "3"}


def test_extract_key_value_pairs_guided_errors():
    with pytest.raises(DialectError, match="quoting_character"):
        translate("SELECT extractKeyValuePairs(s, ':', ',', '\"')")
    with pytest.raises(DialectError, match="string literal"):
        translate("SELECT extractKeyValuePairs(s, col)")


def test_tgamma_poles(spark):
    df = spark.createDataFrame(
        [(1, 0.0), (2, -0.0), (3, -2.0), (4, 5.0)], "id int, v double"
    )
    df.createOrReplaceTempView("r11_gamma")
    out = rows(spark, "SELECT id, tgamma(v) AS g FROM r11_gamma ORDER BY id")
    got = {r[0]: r[1] for r in out}
    assert got[1] == math.inf
    assert got[2] == -math.inf
    assert got[3] is None or math.isnan(got[3])  # domain error
    assert got[4] == 24.0


def test_hassubstr_int_contract(spark):
    row = rows(
        spark,
        "SELECT hasSubstr('hello world', 'o w') AS a,"
        " hasSubstr([1,2,3,4], [2,3]) AS b,"
        " hasSubstr([1,2,3,4], [2,4]) AS c",
    )[0]
    assert tuple(row) == (1, 1, 0)
    # literal branch now returns INT, same type as the array branch
    t = translate("SELECT hasSubstr('abc', x)")
    assert t.startswith("SELECT CAST(contains(")
