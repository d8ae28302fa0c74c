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
from mcp_clickhouse_spark.functions import register_lazy_udfs


def rows(spark, sql):
    t = translate(sql)
    register_lazy_udfs(spark, t)
    return spark.sql(t).collect()


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
        " ((1, 'x'), 2).1.2 AS chained,"
        " CASE WHEN 1 = 1 THEN (1, 'k').2 ELSE 'y' END AS kw,"
        " pow(2, (3, 4).1) AS fnarg",
    )[0]
    assert list(r) == ["a", "a", 10, "b", 1, "x", "k", 8.0]
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


def test_tuple_math_literal_expansion(spark):
    """Round-14 probe wave: the tuple-math family expands element-wise
    when the arity IS knowable (tuple literals / tuple() calls) — it was
    an unconditional guided error.  Non-literal tuple args keep the
    guided arity error (pinned in the r11/r13 suites)."""
    r = rows(
        spark,
        "SELECT tuplePlus((1, 2), (3, 4)) AS p,"
        " tupleDivide((4, 9), (2, 3)) AS d,"
        " tupleIntDiv((7, 9), (2, 3)) AS i,"
        " tupleNegate((1, -2)) AS n,"
        " tupleMultiplyByNumber((1, 2), 3) AS m,"
        " tupleModuloByNumber((7, 9), 4) AS mo,"
        " tupleConcat((1, 2), (3, 4)) AS c,"
        " tupleHammingDistance((1, 2, 3), (1, 9, 3)) AS h,"
        " dotProduct((1, 2), (3, 4)) AS dp,"
        " tupleSum((1, 2, 3)) AS s",
    )[0]
    assert list(r[0]) == [4, 6]
    assert list(r[1]) == [2.0, 3.0]
    assert list(r[2]) == [3, 3]
    assert list(r[3]) == [-1, 2]
    assert list(r[4]) == [3, 6]
    assert list(r[5]) == [3, 1]
    assert list(r[6]) == [1, 2, 3, 4]
    assert (r[7], r[8], r[9]) == (1, 11.0, 6)
    with pytest.raises(DialectError, match="tuple arity"):
        translate("SELECT tuplePlus(a, b) FROM t")
    with pytest.raises(DialectError, match="sizes differ"):
        translate("SELECT tuplePlus((1, 2), (1, 2, 3)) FROM t")


def test_lp_family_tuple_args_and_normalize(spark):
    """Lp norms/distances accept tuple literals (coerced to arrays);
    L1/L2/Lp-Normalize mapped (leaked raw UNRESOLVED_ROUTINE) — tuple in
    → tuple out, array in → array out, matching CH."""
    r = rows(
        spark,
        "SELECT L2Norm((3, 4)) AS a, L1Norm((1, -2)) AS b,"
        " L2SquaredNorm((3, 4)) AS c,"
        " round(LpNorm((1, 2), 3), 10) AS d,"
        " L2Distance((1, 2), (4, 6)) AS e,"
        " L2Normalize((3, 4)) AS nz, L1Normalize([1.0, 3.0]) AS nz1",
    )[0]
    assert (r[0], r[1], r[2]) == (5.0, 3.0, 25.0)
    assert r[3] == round(9 ** (1 / 3), 10)
    assert r[4] == 5.0
    assert list(r[5]) == [0.6, 0.8]
    assert list(r[6]) == [0.25, 0.75]


def test_bitmap_gap_closures(spark):
    """bitmapXorCardinality / bitmapAndnotCardinality / bitmapTransform
    (round-14 probe wave — the rest of the bitmap family was mapped)."""
    r = rows(
        spark,
        "SELECT bitmapXorCardinality(bitmapBuild([1,2]),"
        " bitmapBuild([2,3])) AS x,"
        " bitmapAndnotCardinality(bitmapBuild([1,2]),"
        " bitmapBuild([2])) AS an,"
        " array_sort(bitmapToArray(bitmapTransform(bitmapBuild([1,2,3]),"
        " [1,3], [10,30]))) AS tr",
    )[0]
    assert (r[0], r[1]) == (2, 1)
    assert list(r[2]) == [2, 10, 30]


def test_logical_fn_spellings(spark):
    """and()/or()/not() FUNCTION spellings rewrite to chained operators,
    but ONLY where an expression is expected — the operator keywords
    followed by a parenthesized operand must survive untouched."""
    r = rows(
        spark,
        "SELECT and(1, 1, 0) AS a, or(0, 1) AS b,"
        " and(1, or(0, 1)) AS c, not(0) AS d, not(and(1, 1)) AS e",
    )[0]
    assert list(r) == [False, True, True, True, False]
    t = translate("SELECT x FROM t WHERE a = 1 AND (b = 2) OR (c = 3)")
    assert "AND (b = 2)" in t and "OR (c = 3)" in t
    t = translate("SELECT x FROM t WHERE x BETWEEN 1 AND (3)")
    assert "BETWEEN 1 AND (3)" in t
    t = translate("SELECT x FROM t WHERE NOT (SELECT true)")
    assert "SELECT true" in t


def test_interval_microsecond_and_url_rfc(spark):
    r = rows(
        spark,
        "SELECT toDateTime('2024-01-01 00:00:00')"
        " + toIntervalMicrosecond(1500000) AS ts,"
        " domainWithoutWWWRFC('https://www.a.com/x') AS d",
    )[0]
    assert str(r[0]) == "2024-01-01 00:00:01.500000"
    assert r[1] == "a.com"
    with pytest.raises(DialectError, match="TLD"):
        translate(
            "SELECT cutToFirstSignificantSubdomainCustom(u, 'l') FROM t"
        )


def test_wave_d_array_string_closures(spark):
    """Round-14 probe wave D: weighted array Levenshtein + similarity
    (CH docs examples pinned), multiMatchAnyIndex, the UTF8 spellings
    that equal their base forms on Spark's Unicode-native strings, the
    splitByAlpha alias, and the JSONSharedDataPaths typo fix."""
    r = rows(
        spark,
        "SELECT arrayLevenshteinDistanceWeighted(['A','B','C'],"
        " ['A','K','L'], [1.0,2,3], [3.0,4,5]) AS lw,"
        " round(arraySimilarity(['A','B','C'], ['A','K','L'],"
        " [1.0,2,3], [3.0,4,5]), 6) AS sim,"
        " arraySimilarity(emptyArrayString(), emptyArrayString(),"
        " emptyArrayFloat64(), emptyArrayFloat64()) AS sime,"
        " multiMatchAnyIndex('hello', ['x.*', 'h.*o']) AS mi,"
        " multiMatchAnyIndex('hello', ['zz']) AS mi0,"
        " countSubstringsUTF8('ala', 'a') AS cs,"
        " hasSubsequenceUTF8('abcd', 'bd') AS hs,"
        " splitByAlpha('ab12cd') AS sa",
    )[0]
    assert r[0] == 14.0          # docs: (2+4) + (3+5)
    assert r[1] == 0.222222      # docs: 1 - 14/18
    assert r[2] == 1.0
    assert (r[3], r[4], r[5], r[6]) == (2, 0, 2, 1)
    assert list(r[7]) == ["ab", "cd"]
    for sql, frag in [
        ("SELECT arrayPRAUC([0.1],[1])", "arrayROCAUC"),
        ("SELECT arrayPartialShuffle([1,2], 1)", "arrayShuffle"),
        ("SELECT arrayEnumerateUniqRanked([1],1)", "arrayEnumerateUniq"),
        ("SELECT JSONSharedDataPaths('{}')", ""),
    ]:
        with pytest.raises(DialectError, match=frag):
            translate(sql)


def test_toweek_toyearweek_full_mode_table(spark):
    """The CH docs worked examples for toWeek/toYearWeek, pinned as
    literal expected values BEFORE the oracle was written (the round-13
    toDayOfWeek lesson): 2016-12-27 → week0=52, week1=52, week9=1;
    toYearWeek → 201652, 201652, 201701; toYearWeek('2022-01-01') =
    202152 (mode 0 year-rolls).  Round 14 implements the FULL mode
    table 0-9 (modes 2, 4-8 were guided errors); the prior round-5 pin
    toYearWeek('2024-12-30') = 202452 must keep holding."""
    r = rows(
        spark,
        "SELECT toWeek(toDate('2016-12-27')) AS w0,"
        " toWeek(toDate('2016-12-27'), 1) AS w1,"
        " toWeek(toDate('2016-12-27'), 9) AS w9,"
        " toYearWeek(toDate('2016-12-27')) AS yw0,"
        " toYearWeek(toDate('2016-12-27'), 1) AS yw1,"
        " toYearWeek(toDate('2016-12-27'), 9) AS yw9,"
        " toYearWeek(toDate('2022-01-01')) AS yw22,"
        " toYearWeek(toDate('2024-12-30')) AS yw24,"
        " toWeek(toDate('2024-01-01'), 3) AS iso24,"
        " toYearWeek(toDate('2024-12-30'), 3) AS isoyw",
    )[0]
    assert list(r) == [
        52, 52, 1, 201652, 201652, 201701, 202152, 202452,
        1, 202501,  # ISO: 2024-01-01 is W01; 2024-12-30 is 2025-W01
    ]
    # the MySQL docs' own WEEK()/YEARWEEK() examples (CH adopts the
    # behaviour table) — note WEEK('2008-12-31',1) = 53, NOT the ISO 1:
    # mode 1 has no year roll (bit 1 unset), unlike toYearWeek which
    # always rolls (YEARWEEK forces WEEK_YEAR → 200901)
    r = rows(
        spark,
        "SELECT toWeek(toDate('2008-02-20'), 0) AS a,"
        " toWeek(toDate('2008-02-20'), 1) AS b,"
        " toWeek(toDate('2008-12-31'), 1) AS c,"
        " toYearWeek(toDate('2008-12-31'), 1) AS cy,"
        " toYearWeek(toDate('1987-01-01')) AS d",
    )[0]
    assert list(r) == [7, 8, 53, 200901, 198652]
    with pytest.raises(DialectError, match="mode"):
        translate("SELECT toWeek(d, 10) FROM t")
    with pytest.raises(DialectError, match="mode"):
        translate("SELECT toYearWeek(d, m) FROM t")


def test_xxhash_and_string_bytes(spark):
    """Value-faithful XXH32/XXH64 seed-0 (public-spec implementation;
    Spark's builtin xxhash64 is seed 42 over the row encoding):
    xxHash32('Hello, world!') = 834093149 is the CH docs example,
    XXH32('')/XXH64('') are the spec's known answers.  xxHash64
    marshals the unsigned decimal string (UInt64 convention).
    stringBytesUniq/stringBytesEntropy checked against an independent
    Python computation."""
    import math
    from collections import Counter

    r = rows(
        spark,
        "SELECT xxHash32('Hello, world!') AS a, xxHash32('') AS b,"
        " xxHash64('') AS c,"
        " stringBytesUniq('Hello, world!') AS u,"
        " stringBytesEntropy('Hello, world!') AS e,"
        " stringBytesUniq('') AS u0, stringBytesEntropy('') AS e0",
    )[0]
    assert r[0] == 834093149
    assert r[1] == 0x02CC5D05
    assert r[2] == str(0xEF46DB3751D8E999)
    b = "Hello, world!".encode()
    cnt = Counter(b)
    ent = -sum((k / len(b)) * math.log2(k / len(b)) for k in cnt.values())
    assert r[3] == len(set(b))
    assert r[4] == pytest.approx(ent, abs=1e-12)
    assert (r[5], r[6]) == (0, 0.0)
    with pytest.raises(DialectError, match="xxHash64"):
        translate("SELECT xxh3('a')")
    with pytest.raises(DialectError, match="concat"):
        translate("SELECT xxHash64(a, b) FROM t")


def test_datetime64_arithmetic_tail(spark):
    """add/subtract Milli/Microseconds (Spark-native precision — were
    raw leaks while addNanoseconds' guided error pointed AT
    addMicroseconds), toDateTime64OrZero/OrNull with a scale argument,
    and the snake_case date_add/date_sub 3-arg CH form (the 2-arg form
    stays Spark-native)."""
    r = rows(
        spark,
        "SELECT addMilliseconds(toDateTime64('2024-01-01 00:00:00', 3),"
        " 1500) AS a,"
        " subtractMicroseconds(toDateTime64('2024-01-01 00:00:00', 6),"
        " 250) AS b,"
        " toString(toDateTime64OrZero('x', 3)) AS z,"
        " toDateTime64OrNull('x', 3) AS n,"
        " toString(date_add(HOUR, 2, toDateTime('2024-01-01 00:00:00')))"
        " AS da,"
        " toString(date_sub(DAY, 1, toDate('2024-01-02'))) AS ds",
    )[0]
    assert str(r[0]) == "2024-01-01 00:00:01.500000"
    assert str(r[1]) == "2023-12-31 23:59:59.999750"
    assert r[2] == "1970-01-01 00:00:00"
    assert r[3] is None
    assert r[4] == "2024-01-01 02:00:00"
    assert r[5] == "2024-01-01 00:00:00"
    with pytest.raises(DialectError, match="toTime"):
        translate("SELECT toTime64('12:00:00', 3) FROM t")


def test_order_by_default_nulls_last(spark):
    """CH's DEFAULT NULL placement in ORDER BY is NULLS LAST in BOTH
    directions (docs §ORDER BY: default ≡ NULLS LAST); Spark's ASC
    default is NULLS FIRST — every sort key without an explicit
    modifier gets NULLS LAST appended, including window ORDER BY.
    Documented delta: CH puts NaN between values and NULL in both
    directions; Spark's NaN stays the largest double."""
    spark.sql(
        "SELECT * FROM VALUES (1),(NULL),(2) AS t(x)"
    ).createOrReplaceTempView("t_obn")
    asc = [r.x for r in rows(spark, "SELECT x FROM t_obn ORDER BY x")]
    desc = [r.x for r in rows(
        spark, "SELECT x FROM t_obn ORDER BY x DESC")]
    assert asc == [1, 2, None]
    assert desc == [2, 1, None]
    rn = {r.x: r.r for r in rows(
        spark,
        "SELECT x, row_number() OVER (ORDER BY x) AS r FROM t_obn")}
    assert rn[None] == 3  # NULL ranks last in windows too
    # explicit modifiers survive untouched
    first = [r.x for r in rows(
        spark, "SELECT x FROM t_obn ORDER BY x NULLS FIRST")]
    assert first == [None, 1, 2]


def test_array_reverse_sort_nulls_last(spark):
    """CH keeps NULL LAST in arrayReverseSort too (docs:
    arrayReverseSort([1,nan,2,NULL,3,nan]) ends …nan,NULL) — the old
    reverse(array_sort(..)) put NULL first (round-14 audit)."""
    r = rows(
        spark,
        "SELECT arrayReverseSort([3, NULL, 1]) AS a,"
        " arrayReverseSort(['b', 'a', 'c']) AS b,"
        " arrayReverseSort(emptyArrayInt32()) AS c",
    )[0]
    assert list(r[0]) == [3, 1, None]
    assert list(r[1]) == ["c", "b", "a"]
    assert list(r[2]) == []
    # lambda-keyed arraySort: NULL keys pin last (the comparator used
    # to return 0 on NULL keys, so NULL elements never moved)
    r = rows(
        spark,
        "SELECT arraySort(x -> x, [2, NULL, 1]) AS a,"
        " arraySort(x -> -x, [1, 3, NULL, 2]) AS b",
    )[0]
    assert list(r[0]) == [1, 2, None]
    assert list(r[1]) == [3, 2, 1, None]


def test_has_indexof_null_as_value(spark):
    """CH compares NULL as a VALUE in array membership:
    has([1,NULL],NULL)=1, indexOf([1,NULL,2],NULL)=2, and a no-match
    NULL needle gives 0 — array_contains/array_position NULL-propagated
    (and rejected a bare NULL literal at analysis) before round 14."""
    r = rows(
        spark,
        "SELECT has([1, NULL], NULL) AS a, has([1, 2], NULL) AS b,"
        " has([1, NULL], 1) AS c,"
        " indexOf([1, NULL, 2], NULL) AS d, indexOf([1, 2], NULL) AS e,"
        " indexOf([5, 7, 7], 7) AS f, indexOf([1, NULL], 9) AS g",
    )[0]
    assert list(r) == [True, False, True, 2, 0, 2, 0]


def test_subscript_try_element_at(spark):
    """Subscripts rewrite to try_element_at (round 14): 1-based CH
    semantics for arrays INCLUDING expression indexes (previously a
    documented 0-based delta), key lookup for maps (integer-keyed maps
    were off by one), NULL out of range (ANSI element_at threw), and
    arrayElement's out-of-range/0 → NULL."""
    spark.sql(
        "SELECT array(10, 20, 30) AS arr, map(2, 'b', 0, 'z') AS m,"
        " 2 AS i"
    ).createOrReplaceTempView("t_sub")
    r = rows(
        spark,
        "SELECT arr[2] AS a, arr[i] AS b, arr[9] AS oob,"
        " m[2] AS mk, m[0] AS mz, m[7] AS mm,"
        " arrayElement(arr, 3) AS ae, arrayElement(arr, 9) AS aeo,"
        " arrayElement(arr, 0) AS ae0,"
        " splitByChar(',', 'x,y')[2] AS sp"
        " FROM t_sub",
    )[0]
    assert list(r) == [20, 20, None, "b", "z", None, 30, None, None, "y"]


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
