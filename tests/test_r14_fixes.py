"""Round-14 fixes: the r13-verdict list (toDayOfWeek mode swap is pinned
in test_r13_fixes with corrected vectors; here: xor(), tuple-literal
positional access, arrayResize 2-arg, formatReadableTimeDelta's " and "
separator) plus the r13-advice closures (escaped %%z with a timezone
argument, IN-family two-valued NULL logic, hasToken empty-needle).

Reference contract basis: verbatim SQL delegation in
/root/reference/mcp_clickhouse/mcp_server.py:425 — every construct here
is ClickHouse SELECT surface a reference user could send.
"""

import pytest

from mcp_clickhouse_spark.dialect import DialectError, translate


def rows(spark, sql):
    return spark.sql(translate(sql)).collect()


def test_xor_variadic(spark):
    """CH xor(): variadic logical XOR, chained left-to-right, NULL
    propagating (docs vector xor(0,1,1) = 0).  Was a raw
    UNRESOLVED_ROUTINE — the and/or/not spellings were mapped in r13
    but xor was missed."""
    r = rows(
        spark,
        "SELECT xor(0, 1, 1) AS a, xor(1, 0) AS b, xor(0, 0) AS c,"
        " xor(1, 1, 1) AS d, xor(2, 0) AS e,"
        " xor(1, CAST(NULL AS INT)) AS n",
    )[0]
    assert list(r) == [False, True, False, True, True, None]
    with pytest.raises(DialectError, match="two arguments"):
        translate("SELECT xor(1) FROM t")


def test_tuple_literal_positional_access(spark):
    """CH treats (1,'a') as a first-class tuple literal; both accessor
    spellings — tupleElement((…), N) and (…).N — previously leaked a raw
    FIELD_NOT_FOUND because Spark parses the literal as a struct with
    col1..colN field names while the dialect emits _N accessors."""
    r = rows(
        spark,
        "SELECT tupleElement((1, 'a'), 2) AS t1, (1, 'a').2 AS t2,"
        " (10, 20, 30).1 AS t3, tuple(1, 'b').2 AS t4,"
        " tupleElement((1, 'a'), 1) AS t5,"
        " ((1, 'x'), 2).1.2 AS chained",
    )[0]
    assert list(r) == ["a", "a", 10, "b", 1, "x"]
    # grouping parens and function calls must never be rewritten
    t = translate("SELECT (a + b) * 2 AS x, pow(2, 3) AS y FROM t")
    assert "named_struct" not in t
    # untuple of a literal stays a guided error (expands to multiple
    # select items)
    with pytest.raises(DialectError, match="untuple"):
        translate("SELECT untuple((1, 'a')) FROM t")


def test_array_resize_two_arg(spark):
    """CH arrayResize 2-arg pads the element TYPE DEFAULT on extension —
    unknowable at translation time, so shrink/keep is exact and an
    extension raises at runtime (round 13 silently padded NULL,
    inconsistent with arrayShiftLeft's guided-error policy)."""
    r = rows(
        spark,
        "SELECT arrayResize([1,2,3], 2) AS shrink,"
        " arrayResize([1,2,3], 3) AS keep,"
        " arrayResize([1,2,3], 5, 0) AS ext,"
        " arrayResize(CAST(NULL AS ARRAY<INT>), 2) AS nul",
    )[0]
    assert list(r) == [[1, 2], [1, 2, 3], [1, 2, 3, 0, 0], None]
    with pytest.raises(Exception, match="explicit pad value"):
        rows(spark, "SELECT arrayResize([1,2,3], 5) AS x")


def test_format_datetime_escaped_pct_z_with_tz(spark):
    """'%%z' tokenizes as a literal '%' + 'z', NOT a %z specifier — the
    timezone-argument guard must check tokens, not the raw body
    (r13-advice: substring search falsely raised on the escape)."""
    r = rows(
        spark,
        "SELECT formatDateTime(toDateTime('2024-01-02 03:04:05'),"
        " '%%z %H', 'UTC') AS f",
    )[0]
    assert r[0] == "%z 03"
    with pytest.raises(DialectError, match="%z"):
        translate(
            "SELECT formatDateTime(x, '%z', 'Asia/Tokyo') FROM t"
        )


def test_in_family_two_valued_null_logic(spark):
    """CH IN-family (transform_null_in=0 default) is two-valued: a NULL
    left operand returns 0 for BOTH in and notIn, and NULLs in the set
    never match (1 in (1,NULL)=1, 3 in (1,NULL)=0, 3 notIn (1,NULL)=1).
    Spark's three-valued NULL leaked through NOT before round 14."""
    spark.sql(
        "SELECT CAST(NULL AS INT) AS xn, 3 AS x3, 1 AS x1"
    ).createOrReplaceTempView("t_r14in")
    r = rows(
        spark,
        "SELECT notIn(xn, [1, 2]) AS a, nullIn(xn, [NULL, 1]) AS b,"
        " notNullIn(x3, [NULL, 1]) AS c, notIn(x3, [1, NULL]) AS d,"
        " notIn(x1, [1, NULL]) AS e, nullIn(x3, [1, 2]) AS f"
        " FROM t_r14in",
    )[0]
    assert list(r) == [False, True, True, True, False, False]


def test_hastoken_empty_needle(spark):
    """split() emits empty tokens at separator edges; an empty-string
    needle must return 0, not 1 (CH throws on needles without token
    characters — 0 is this dialect's documented delta, and the
    empty-needle case previously violated it when the haystack started
    or ended with a separator)."""
    r = rows(
        spark,
        "SELECT hasToken(' Hello World ', '') AS e1,"
        " hasToken('Hello World', '') AS e2,"
        " hasToken(' Hello World ', 'World') AS h,"
        " hasTokenCaseInsensitive(' Hello ', '') AS e3",
    )[0]
    assert list(r) == [0, 0, 1, 0]
