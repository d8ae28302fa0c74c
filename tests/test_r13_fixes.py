"""Round-13 fixes, docs-pinned.

1. formatDateTime/parseDateTime: tokenized specifier engine over the full
   ClickHouse 24.x table (the old 15-entry str.replace passed unknown
   codes through verbatim — %D came back '%65' — and corrupted literal
   text: 'Day %d' → '65AM2024 05').
2. intDiv/intDivOrZero: subtract-remainder DECIMAL route (advisor HIGH —
   the bare DECIMAL(38,18) quotient was HALF_UP-rounded at scale 6, so
   intDiv(999999999999, 1000000000000) returned 1; CH: 0).
3. toDayOfWeek mode argument (was silently ignored).
4. toDateOrZero/toDateTimeOrZero/toDate32OrZero (were unmapped).
5. toStartOfWeek mode 9 + non-literal-mode guided error.
6. hasSubstr two-bare-column guided error (was a raw analysis failure).
7. readWKTPoint signed-exponent coordinates.

Reference contracts: ClickHouse docs §formatDateTime (the specifier
table and its examples), §toDayOfWeek (mode table), §toDateOrZero
(zero date = 1970-01-01); reference repo pins CH 24.x via its CI
(.github/workflows/ci.yaml), where %M is the full month name
(formatdatetime_parsedatetime_m_is_month_name defaults true since 23.4).
"""

import pytest

from mcp_clickhouse_spark.dialect import DialectError, translate


def rows(spark, sql):
    return spark.sql(translate(sql)).collect()


TS = "toDateTime('2024-03-05 07:08:09')"  # a Tuesday, ISO week 10


def test_format_datetime_full_specifier_table(spark):
    r = rows(
        spark,
        f"SELECT formatDateTime({TS}, '%a') AS a,"
        f" formatDateTime({TS}, '%b') AS b,"
        f" formatDateTime({TS}, '%c') AS c,"
        f" formatDateTime({TS}, '%C') AS cc,"
        f" formatDateTime({TS}, '%d') AS d,"
        f" formatDateTime({TS}, '%D') AS dd,"
        f" formatDateTime({TS}, '%e') AS e,"
        f" formatDateTime({TS}, '%F') AS f,"
        f" formatDateTime({TS}, '%h') AS h,"
        f" formatDateTime({TS}, '%H') AS hh,"
        f" formatDateTime({TS}, '%i') AS i,"
        f" formatDateTime({TS}, '%I') AS ii,"
        f" formatDateTime({TS}, '%j') AS j,"
        f" formatDateTime({TS}, '%k') AS k,"
        f" formatDateTime({TS}, '%l') AS l,"
        f" formatDateTime({TS}, '%m') AS m,"
        f" formatDateTime({TS}, '%M') AS mm,"
        f" formatDateTime({TS}, '%p') AS p,"
        f" formatDateTime({TS}, '%Q') AS q,"
        f" formatDateTime({TS}, '%r') AS r,"
        f" formatDateTime({TS}, '%R') AS rr,"
        f" formatDateTime({TS}, '%s') AS s,"
        f" formatDateTime({TS}, '%T') AS t,"
        f" formatDateTime({TS}, '%W') AS w,"
        f" formatDateTime({TS}, '%y') AS y,"
        f" formatDateTime({TS}, '%Y') AS yy,"
        f" formatDateTime({TS}, '%%') AS pct",
    )[0]
    assert list(r) == [
        "Tue", "Mar", "03", "20", "05", "03/05/24", " 5", "2024-03-05",
        "07", "07", "08", "07", "065", "7", "7", "03", "March", "AM", "1",
        "07:08:09 AM", "07:08", "09", "07:08:09", "Tuesday", "24", "2024",
        "%",
    ]


def test_format_datetime_iso_week_codes(spark):
    # 2010-01-04 is the Monday of ISO week 1 of 2010; 2010-01-03 (Sunday)
    # still belongs to ISO week 53 of 2009 — the CH %g/%G/%V examples.
    r = rows(
        spark,
        "SELECT formatDateTime(toDateTime('2010-01-04 00:00:00'), '%g') AS g,"
        " formatDateTime(toDateTime('2010-01-03 00:00:00'), '%g') AS g2,"
        " formatDateTime(toDateTime('2010-01-04 00:00:00'), '%G') AS gg,"
        " formatDateTime(toDateTime('2010-01-03 00:00:00'), '%G') AS gg2,"
        " formatDateTime(toDateTime('2010-01-04 00:00:00'), '%V') AS v,"
        " formatDateTime(toDateTime('2010-01-03 00:00:00'), '%V') AS v2,"
        f" formatDateTime({TS}, '%u') AS u,"
        f" formatDateTime({TS}, '%w') AS w,"
        " formatDateTime(toDateTime('2024-03-03 00:00:00'), '%u') AS usun,"
        " formatDateTime(toDateTime('2024-03-03 00:00:00'), '%w') AS wsun",
    )[0]
    assert list(r) == ["10", "09", "2010", "2009", "01", "53",
                       "2", "2", "7", "0"]


def test_format_datetime_literal_text_and_escapes(spark):
    """Literal runs are Java-quoted, not read as pattern letters (the old
    engine returned '65AM2024 05' for 'Day %d' and threw on 'at %H')."""
    r = rows(
        spark,
        f"SELECT formatDateTime({TS}, 'Day %d') AS a,"
        f" formatDateTime({TS}, 'at %H') AS b,"
        f" formatDateTime({TS}, '%W, %e %b %Y %T') AS c,"
        f" formatDateTime({TS}, '%n') AS nl,"
        f" formatDateTime({TS}, '%t') AS tab,"
        f" formatDateTime({TS}, 'it''s %H') AS q,"
        f" formatDateTime({TS}, '100%%') AS pct",
    )[0]
    assert list(r) == [
        "Day 05", "at 07", "Tuesday,  5 Mar 2024 07:08:09", "\n", "\t",
        "it's 07", "100%",
    ]


def test_format_datetime_timezone_argument(spark):
    """CH formatDateTime(ts, fmt, tz) renders the instant's wall clock in
    tz (the old translation silently DROPPED the third argument)."""
    r = rows(
        spark,
        "SELECT formatDateTime(toDateTime('2024-01-01 00:00:00'),"
        " '%F %H', 'America/New_York') AS ny,"
        " formatDateTime(toDateTime('2024-01-01 00:00:00'),"
        " '%F %H', 'UTC') AS utc",
    )[0]
    assert list(r) == ["2023-12-31 19", "2024-01-01 00"]
    with pytest.raises(DialectError, match="timezone"):
        translate("SELECT formatDateTime(x, '%F', tz_col) FROM t")
    with pytest.raises(DialectError, match="%z"):
        translate("SELECT formatDateTime(x, '%z', 'Asia/Tokyo') FROM t")


def test_format_datetime_guided_errors(spark):
    with pytest.raises(DialectError, match="unsupported format specifier"):
        translate("SELECT formatDateTime(x, '%J') FROM t")
    with pytest.raises(DialectError, match="trailing"):
        translate("SELECT formatDateTime(x, 'abc%') FROM t")
    with pytest.raises(DialectError, match="string literal"):
        translate("SELECT formatDateTime(x, fmt_col) FROM t")


def test_parse_datetime_literal_text_and_guided(spark):
    r = rows(
        spark,
        "SELECT parseDateTime('Day 05 2024-03', 'Day %d %Y-%m') AS p,"
        " parseDateTime('2024 March 05', '%Y %M %d') AS pm",
    )[0]
    assert str(r[0]) == "2024-03-05 00:00:00"
    assert str(r[1]) == "2024-03-05 00:00:00"
    # expression-composed codes have no Java parse pattern
    with pytest.raises(DialectError, match="format-only"):
        translate("SELECT parseDateTime(s, '%V-%Y') FROM t")


def test_intdiv_no_half_up_flip(spark):
    """Advisor HIGH: the bare DECIMAL(38,18)/DECIMAL(38,18) quotient is
    adjusted to DECIMAL(38,6) and HALF_UP-rounded, flipping any quotient
    with fractional part > 1-5e-7 before the BIGINT truncation."""
    r = rows(
        spark,
        "SELECT intDiv(999999999999, 1000000000000) AS a,"
        " intDiv(1999999999999, 1000000000000) AS b,"
        " intDivOrZero(999999999999, 1000000000000) AS c,"
        " intDiv(-999999999999, 1000000000000) AS d,"
        " intDiv(4611686018427387904, 3) AS big,"
        " intDiv(1, 0.001) AS f",
    )[0]
    assert list(r) == [0, 1, 0, 0, 1537228672809129301, 1000]


def test_todayofweek_modes(spark):
    """CH mode table (source enum WeekDayMode): 0 Mon=1..Sun=7
    (default), 1 Mon=0..Sun=6, 2 = WeekStartsSunday0 → Sun=0..Sat=6,
    3 = WeekStartsSunday1 → Sun=1..Sat=7 — the docs' 2016-12-27
    (Tuesday) worked example is mode2=2, mode3=3 (round 13 shipped
    these two swapped and its oracle encoded the same misread)."""
    r = rows(
        spark,
        "SELECT toDayOfWeek(toDate('2016-12-27')) AS m0,"
        " toDayOfWeek(toDate('2016-12-27'), 0) AS m0e,"
        " toDayOfWeek(toDate('2016-12-27'), 1) AS m1,"
        " toDayOfWeek(toDate('2016-12-27'), 2) AS m2,"
        " toDayOfWeek(toDate('2016-12-27'), 3) AS m3,"
        " toDayOfWeek(toDate('2016-12-25'), 2) AS sun2,"
        " toDayOfWeek(toDate('2016-12-25'), 3) AS sun3",
    )[0]
    assert list(r) == [2, 2, 1, 2, 3, 0, 1]
    with pytest.raises(DialectError, match="mode"):
        translate("SELECT toDayOfWeek(d, m) FROM t")
    with pytest.raises(DialectError, match="UTC"):
        translate("SELECT toDayOfWeek(d, 1, 'Asia/Tokyo') FROM t")


def test_to_date_or_zero_family(spark):
    """CH zero values: Date/Date32 → 1970-01-01, DateTime → epoch
    instant (these members leaked UNRESOLVED_ROUTINE before round 13)."""
    r = rows(
        spark,
        "SELECT toDateOrZero('bogus') AS z, toDateOrZero('2024-05-01') AS d,"
        " toDateTimeOrZero('nope') AS tz, toDate32OrZero('x') AS z32,"
        " toDate32OrZero('2024-05-01') AS d32,"
        " toDateTimeOrZero('2024-05-01 10:11:12') AS dt",
    )[0]
    assert str(r[0]) == "1970-01-01" and str(r[1]) == "2024-05-01"
    assert str(r[2]) == "1970-01-01 00:00:00"
    assert str(r[3]) == "1970-01-01" and str(r[4]) == "2024-05-01"
    assert str(r[5]) == "2024-05-01 10:11:12"


def test_tostartofweek_mode9_and_guided(spark):
    r = rows(
        spark,
        "SELECT toStartOfWeek(toDate('2024-01-03'), 9) AS mon9,"
        " toStartOfWeek(toDate('2024-01-03'), 8) AS sun8",
    )[0]
    assert [str(v) for v in r] == ["2024-01-01", "2023-12-31"]
    with pytest.raises(DialectError, match="integer literal"):
        translate("SELECT toStartOfWeek(d, mode_col) FROM t")


def test_hassubstr_bare_columns_guided(spark):
    # literal and array-shaped forms still translate
    r = rows(
        spark,
        "SELECT hasSubstr('hello world', 'o w') AS s,"
        " hasSubstr([1,2,3,4], [2,3]) AS arr,"
        " hasSubstr(array(1,2,3), array(3)) AS fn",
    )[0]
    assert list(r) == [1, 1, 1]
    with pytest.raises(DialectError, match="hasSubstr"):
        translate("SELECT hasSubstr(col_a, col_b) FROM t")


def test_readwktpoint_signed_exponent(spark):
    r = rows(
        spark,
        "SELECT readWKTPoint('POINT (1e-5 2)') AS p,"
        " readWKTPoint('POINT (-1.5E+2 3.25)') AS q",
    )[0]
    assert (r[0]["_1"], r[0]["_2"]) == (1e-5, 2.0)
    assert (r[1]["_1"], r[1]["_2"]) == (-150.0, 3.25)


def test_parse_datetime_best_effort_corner_formats(spark):
    """CH docs §parseDateTimeBestEffort examples beyond ISO: bare 9-10
    digit unix timestamps, compact YYYYMMDD[hhmmss], day-first
    DD/MM/YYYY, and RFC 'DD Mon YYYY' shapes (round-13 audit batch;
    previously only Spark's CAST-parseable ISO shapes worked)."""
    r = rows(
        spark,
        "SELECT parseDateTimeBestEffort('1546300800') AS epoch,"
        " parseDateTimeBestEffort('20181212') AS c8,"
        " parseDateTimeBestEffort('20181212101212') AS c14,"
        " parseDateTimeBestEffort('25/12/2018 10:12:12') AS dmy,"
        " parseDateTimeBestEffort('12 Dec 2018') AS rfc,"
        " parseDateTimeBestEffort('Tue, 11 Dec 2018 10:12:12') AS rfc1123,"
        " parseDateTimeBestEffort('2018-12-12T10:12:12Z') AS isoz,"
        " parseDateTimeBestEffortOrNull('garbage') AS nul,"
        " parseDateTimeBestEffortOrZero('garbage') AS zero",
    )[0]
    assert [str(v) for v in r] == [
        "2019-01-01 00:00:00", "2018-12-12 00:00:00",
        "2018-12-12 10:12:12", "2018-12-25 10:12:12",
        "2018-12-12 00:00:00", "2018-12-11 10:12:12",
        "2018-12-12 10:12:12", "None", "1970-01-01 00:00:00",
    ]
    # the strict form still THROWS on garbage (the CH contract)
    import pytest as _pytest

    with _pytest.raises(Exception, match="CAST_INVALID_INPUT|cannot be cast"):
        rows(spark, "SELECT parseDateTimeBestEffort('garbage') AS x")


def test_toweek_mode1(spark):
    """MySQL WEEK(d, 1) vectors: Monday-first 0-53 — ISO numbering but
    dates before ISO week 1 return 0 (mode was guided before round 13)."""
    r = rows(
        spark,
        "SELECT toWeek(toDate('2024-01-01'), 1) AS a,"
        " toWeek(toDate('2023-01-01'), 1) AS b,"
        " toWeek(toDate('2024-12-30'), 1) AS c,"
        " toWeek(toDate('2016-12-27'), 1) AS d,"
        " toWeek(toDate('2017-01-01'), 1) AS e",
    )[0]
    assert list(r) == [1, 0, 53, 52, 0]


def test_array_difference_cumsum_overflow_is_error_not_silent(spark):
    """CH WRAPS Int64 overflow in arrayDifference/arrayCumSum; under ANSI
    this engine throws ARITHMETIC_OVERFLOW — documented delta (module
    docstring): an error, never a silently wrong value."""
    import pytest as _pytest

    assert rows(
        spark,
        "SELECT arrayDifference([1, 5, 2]) AS d, arrayCumSum([1, 2, 3]) AS c",
    )[0][0] == [0, 4, -3]
    with _pytest.raises(Exception, match="ARITHMETIC_OVERFLOW|overflow"):
        rows(spark, "SELECT arrayDifference([9223372036854775807,"
                    " -9223372036854775808]) AS d")
    with _pytest.raises(Exception, match="ARITHMETIC_OVERFLOW|overflow"):
        rows(spark, "SELECT arrayCumSum([9223372036854775807, 1]) AS c")


def _rows_udf(spark, sql):
    from mcp_clickhouse_spark.functions import register_lazy_udfs

    ts = translate(sql)
    register_lazy_udfs(spark, ts)
    return spark.sql(ts).collect()


def test_sqid_spec_vectors(spark):
    """Sqids public-spec vectors ([1,2,3] = '86Rf07', the 0..7
    incremental table) AND the CH docs example sqid(1,2,3,4,5) =
    'gXHfJ1C6dN' — so the no-blocklist delta is the ONLY divergence."""
    r = _rows_udf(
        spark,
        "SELECT sqid(1, 2, 3) AS a, sqid(1, 2, 3, 4, 5) AS ch,"
        " sqid(0) AS z, sqid(7) AS s7,"
        " sqidDecode('86Rf07') AS d1, sqidDecode('gXHfJ1C6dN') AS d2,"
        " sqidDecode(sqid(0, 4611686018427387904, 7)) AS rt",
    )[0]
    assert list(r) == [
        "86Rf07", "gXHfJ1C6dN", "bM", "AX",
        [1, 2, 3], [1, 2, 3, 4, 5], [0, 4611686018427387904, 7],
    ]


def test_bech32_bip173_vectors(spark):
    """BIP-173 reference vectors: empty-data hrp 'a', the P2WPKH and
    P2WSH mainnet addresses (witver 0), round-trip through decode, and
    checksum rejection."""
    r = _rows_udf(
        spark,
        "SELECT bech32Encode('a', '') AS empty,"
        " bech32Encode('bc', unhex('751e76e8199196d454941c45d1b3a323f1433bd6'), 0) AS p2wpkh,"
        " bech32Encode('bc', unhex('1863143c14c5166804bd19203356da136c98"
        "5678cd4d27a1b8c6329604903262'), 0) AS p2wsh,"
        " bech32Decode('BC1QW508D6QEJXTDG4Y5R3ZARVARY0C5XW7KV8F3T4') AS dec,"
        " bech32Decode('a12uel5x') AS bad",
    )[0]
    assert r[0] == "a12uel5l"
    assert r[1] == "bc1qw508d6qejxtdg4y5r3zarvary0c5xw7kv8f3t4"
    assert r[2] == ("bc1qrp33g0q5c5txsp9arysrx4k6zdkfs4nce4xj0gdcccefvpy"
                    "sxf3qccfmv3")
    assert r[3]["_1"] == "bc"
    assert bytes(r[3]["_2"]).hex() == "751e76e8199196d454941c45d1b3a323f1433bd6"
    assert r[4] is None or r[4]["_1"] is None  # invalid checksum


def test_bech32m_witver1_roundtrip(spark):
    """BIP-350: witness v1+ uses the bech32m constant — encode/decode
    round-trips and the output differs from the v0 (bech32) form."""
    r = _rows_udf(
        spark,
        "SELECT bech32Encode('tb', unhex('751e76e8199196d454941c45d1b3a3"
        "23f1433bd6'), 1) AS v1,"
        " bech32Encode('tb', unhex('751e76e8199196d454941c45d1b3a323f143"
        "3bd6'), 0) AS v0,"
        " bech32Decode(bech32Encode('tb', unhex('751e76e8199196d454941c4"
        "5d1b3a323f1433bd6'), 1)) AS rt",
    )[0]
    assert r[0] != r[1] and r[0].startswith("tb1p")
    assert bytes(r[2]["_2"]).hex() == "751e76e8199196d454941c45d1b3a323f1433bd6"


def test_torelative_week_month_year_num(spark):
    """toRelativeWeekNum/MonthNum/YearNum leaked UNRESOLVED_ROUTINE
    (round-13 probe).  Week ordinals are the Monday-rolling
    toRelativeWeekNum contract ((days+3) div 7, epoch day 0 = Thursday);
    toRelativeMonthNum('2002-05-05') = 24029 is the CH docs example."""
    r = rows(
        spark,
        "SELECT toRelativeWeekNum(toDate('1970-01-01')) AS w0,"
        " toRelativeWeekNum(toDate('2024-01-07')) AS wsun,"
        " toRelativeWeekNum(toDate('2024-01-08')) AS wmon,"
        " toRelativeMonthNum(toDate('2002-05-05')) AS m,"
        " toRelativeYearNum(toDate('2010-06-01')) AS y",
    )[0]
    assert list(r) == [0, 2818, 2819, 24029, 2010]
    # consistency with dateDiff('week'): ordinal difference == dateDiff
    r2 = rows(
        spark,
        "SELECT toRelativeWeekNum(toDate('2024-03-05'))"
        " - toRelativeWeekNum(toDate('2024-01-07')) AS diff,"
        " dateDiff('week', toDate('2024-01-07'), toDate('2024-03-05')) AS dd",
    )[0]
    assert r2[0] == r2[1]


def test_crc64_and_crc_family(spark):
    """CRC64: reflected ECMA-182, init 0, xorout 0 — ClickHouse's exact
    parameter set (CRC.h); the '123456789' check distinguishes it from
    CRC-64/XZ (0x995DC9BBDF1939FA), which shares the polynomial but adds
    all-ones init/xorout.  CRC32 passes through to Spark's zlib-parameter
    builtin (same value CH returns); CRC32IEEE/gccMurmurHash are guided."""
    import zlib

    from mcp_clickhouse_spark.functions.codecs import crc64_ecma

    # cross-check our parameter set against an independent reference:
    # CRC-64/XZ('123456789') is the published catalogue check value; with
    # init/xorout stripped (this variant) the same table yields:
    xz = crc64_ecma(b"123456789")
    assert xz != 0x995DC9BBDF1939FA  # not the XZ variant
    r = _rows_udf(
        spark,
        "SELECT crc64('123456789') AS c64, crc64('') AS empty,"
        " CRC32('x') AS c32",
    )[0]
    assert int(r[0]) == crc64_ecma(b"123456789")
    assert int(r[1]) == 0  # init 0, no final inversion → empty = 0
    assert r[2] == zlib.crc32(b"x")
    with pytest.raises(DialectError, match="CRC32IEEE"):
        translate("SELECT CRC32IEEE(x) FROM t")
    with pytest.raises(DialectError, match="gccMurmurHash"):
        translate("SELECT gccMurmurHash(x) FROM t")


def test_greatest_least_null_propagation(spark):
    """CH's ordinary-function NULL contract: greatest/least/max2/min2
    return NULL when ANY argument is NULL; Spark's builtins skip NULLs —
    a silent divergence on every nullable column (round-13 probe)."""
    r = rows(
        spark,
        "SELECT greatest(1, NULL) AS g, least(1, NULL) AS l,"
        " greatest(3, 1, 2) AS g3, least(3, 1, 2) AS l3,"
        " max2(1, NULL) AS m2, min2(4, 2) AS mn",
    )[0]
    assert list(r) == [None, None, 3, 1, None, 2]


def test_is_not_distinct_from_and_has_token(spark):
    r = rows(
        spark,
        "SELECT isNotDistinctFrom(NULL, NULL) AS a,"
        " isNotDistinctFrom(1, 2) AS b,"
        " hasToken('Hello World foo_bar', 'World') AS ht,"
        " hasToken('Hello World', 'Wor') AS ht0,"  # substring ≠ token
        " hasToken('a_b c', 'b') AS ht_us,"  # _ is a SEPARATOR in CH
        " hasTokenCaseInsensitive('Hello World', 'world') AS hci",
    )[0]
    assert list(r) == [True, False, 1, 0, 1, 1]
    with pytest.raises(DialectError, match="tuple arity"):
        translate("SELECT tupleConcat(a, b) FROM t")
    with pytest.raises(DialectError, match="tuple arity"):
        translate("SELECT tupleHammingDistance(a, b) FROM t")


def test_aggregate_name_probe_closures(spark):
    """Round-13 aggregate probe: groupArraySample maps (shuffle+slice,
    the nondeterministic sample contract; seeded form guided),
    nothing() is the aggregate NULL, and the approx_top_* 24.x aliases /
    groupArrayInsertAt route to their family's guided errors instead of
    leaking unresolved routines."""
    spark.sql(
        "SELECT * FROM VALUES (1,'a'),(2,'a'),(3,'b'),(4,'b'),(5,'b')"
        " AS t(x, g)"
    ).createOrReplaceTempView("t_r13agg")
    rs = spark.sql(translate(
        "SELECT g, groupArraySample(2)(x) AS s, nothing(x) AS n"
        " FROM t_r13agg GROUP BY g ORDER BY g"
    )).collect()
    by_g = {r.g: r for r in rs}
    assert set(by_g["a"].s) <= {1, 2} and len(by_g["a"].s) == 2
    assert set(by_g["b"].s) <= {3, 4, 5} and len(by_g["b"].s) == 2
    assert by_g["a"].n is None and by_g["b"].n is None
    for bad, msg in [
        ("SELECT approx_top_k(2)(x) FROM t GROUP BY g", "topK"),
        ("SELECT approx_top_sum(2)(x, w) FROM t GROUP BY g", "topKWeighted"),
        ("SELECT quantileInterpolatedWeighted(x, w) FROM t GROUP BY g",
         "quantileExactWeighted"),
        ("SELECT groupArrayInsertAt(x, p) FROM t GROUP BY g",
         "groupArrayInsertAt"),
        ("SELECT groupArraySample(3, 42)(x) FROM t GROUP BY g", "seed"),
    ]:
        with pytest.raises(DialectError, match=msg):
            translate(bad)


def test_tostartofinterval_calendar_units(spark):
    """Round 13: MONTH/QUARTER/YEAR intervals bucket on the months-count
    since 1970-01 (CH's calendar-interval contract), returning Date;
    toStartOfMonth/Quarter/Year return Date (CH's type — date_trunc
    alone yielded midnight timestamps); WEEK stays guided."""
    r = rows(
        spark,
        "SELECT toStartOfInterval(toDate('2023-02-15'), INTERVAL 2 MONTH) AS m2,"
        " toStartOfInterval(toDate('2023-08-15'), INTERVAL 2 QUARTER) AS q2,"
        " toStartOfInterval(toDate('2023-08-15'), INTERVAL 5 YEAR) AS y5,"
        " toStartOfInterval(toDateTime('2023-11-20 10:00:00'),"
        "                   INTERVAL 3 MONTH) AS m3,"
        " toStartOfMonth(toDateTime('2024-03-05 07:08:09')) AS sm,"
        " toStartOfQuarter(toDate('2024-05-05')) AS sq,"
        " toStartOfYear(toDate('2024-05-05')) AS sy",
    )[0]
    import datetime

    assert [str(v) for v in r] == [
        "2023-01-01", "2023-07-01", "2020-01-01", "2023-10-01",
        "2024-03-01", "2024-04-01", "2024-01-01",
    ]
    assert all(type(v) is datetime.date for v in r)
    with pytest.raises(DialectError, match="untranslatable"):
        translate("SELECT toStartOfInterval(d, INTERVAL 2 WEEK) FROM t")
    with pytest.raises(DialectError, match="calendar"):
        translate(
            "SELECT toStartOfInterval(d, INTERVAL 2 MONTH, 'UTC') FROM t"
        )


def test_lsh_banding_for_sizes_the_s_curve():
    """The banding auto-picker: largest rows-per-band meeting the recall
    target (fewest false positives); predictions match the mutated-copy
    probe's measured curve (BASELINE.md round-13 addendum)."""
    from mcp_clickhouse_spark.pipeline.dedup import lsh_banding_for

    b, r, p = lsh_banding_for(0.57, recall=0.9, num_hashes=32)
    assert (b, r) == (16, 2) and p > 0.99
    # the default 8x4 shape is what high-similarity thresholds pick
    b, r, p = lsh_banding_for(0.85, recall=0.9, num_hashes=32)
    assert r >= 4 and p >= 0.9
    # impossible target falls back to the most sensitive divisor pair
    b, r, p = lsh_banding_for(0.05, recall=0.99, num_hashes=32)
    assert r == 1 and p < 0.99
    import pytest as _pytest

    with _pytest.raises(ValueError):
        lsh_banding_for(0.0)


def test_decimal_or_variants_and_accurate_cast_or_default(spark):
    """Round-13 conversion probe: toDecimal{32,64,128}OrNull/OrZero and
    accurateCastOrDefault were unresolved; the 128/256-bit -Or* variants
    and toDecimal256 now share the width guided error instead of
    leaking."""
    r = rows(
        spark,
        "SELECT toDecimal32OrNull('1.5', 2) AS a,"
        " toDecimal32OrNull('x', 2) AS b,"
        " toDecimal64OrZero('x', 2) AS c,"
        " toDecimal128OrZero('7.25', 3) AS d,"
        " accurateCastOrDefault('x', 'Int32', 7) AS e,"
        " accurateCastOrDefault('x', 'Int32') AS f,"
        " accurateCastOrDefault('x', 'Date') AS g",
    )[0]
    assert [str(v) for v in r] == [
        "1.50", "None", "0.00", "7.250", "7", "0", "1970-01-01",
    ]
    for bad in ("toInt128OrZero('x')", "toDecimal256(1.5, 3)",
                "toUInt256OrNull('x')", "toInt256OrDefault('x', 1)"):
        with pytest.raises(DialectError, match="128/256"):
            translate(f"SELECT {bad}")


def test_utf8_spellings_and_ipv4_classc(spark):
    """Round-13 probe closures: startsWithUTF8/endsWithUTF8 (byte prefix
    == code-point prefix for valid UTF-8), reverseUTF8 (Spark's reverse
    is code-point aware), IPv4NumToStringClassC ('xxx' last octet —
    167772161 = 10.0.0.1)."""
    r = rows(
        spark,
        "SELECT startsWithUTF8('абвг', 'аб') AS sw,"
        " endsWithUTF8('абвг', 'вг') AS ew,"
        " reverseUTF8('абв') AS rv,"
        " IPv4NumToStringClassC(167772161) AS c",
    )[0]
    assert list(r) == [True, True, "вба", "10.0.0.xxx"]


def test_json_mac_random_closures(spark):
    """Round-13 probe closures: JSONKey (1-based, negative from end),
    MACStringToOUI, randomPrintableASCII/randomString lengths,
    randConstant's per-query-constant per-call-independent contract."""
    r = rows(
        spark,
        """SELECT JSONKey('{"a":1,"b":2}', 1) AS k1,
        JSONKey('{"a":1,"b":2}', -1) AS kn,
        MACStringToOUI('01:02:03:04:05:06') AS oui,
        length(randomPrintableASCII(8)) AS rp,
        length(randomString(6)) AS rs""",
    )[0]
    assert list(r) == ["a", "b", 66051, 8, 6]
    rc = rows(
        spark,
        "SELECT randConstant() AS c, randConstant() AS d"
        " FROM VALUES (1),(2),(3) t(x)",
    )
    assert len({row.c for row in rc}) == 1  # constant across rows
    assert len({row.d for row in rc}) == 1
    with pytest.raises(DialectError, match="randomStringUTF8"):
        translate("SELECT randomStringUTF8(5)")
    with pytest.raises(DialectError, match="timeSeriesGroupSum"):
        translate("SELECT timeSeriesGroupSum(u, t, v) FROM x")


def test_final_probe_closures(spark):
    """Round-13 final sweep: multiMatchAllIndices (1-based matching
    pattern indices), countSubstringsCaseInsensitiveUTF8 (code-point
    counting), indexOfAssumeSorted, fromDaysSinceYearZero32."""
    r = rows(
        spark,
        "SELECT multiMatchAllIndices('abcd', ['z', 'b.', 'd$']) AS mi,"
        " multiMatchAllIndices('abcd', ['z']) AS mi0,"
        " countSubstringsCaseInsensitiveUTF8('АбАб', 'аб') AS cs,"
        " indexOfAssumeSorted([1, 2, 3], 2) AS io,"
        " fromDaysSinceYearZero32(733321) AS fd",
    )[0]
    assert r[0] == [2, 3] and r[1] == []
    assert r[2] == 2 and r[3] == 2
    assert str(r[4]) == "2007-10-07"  # MySQL TO_DAYS anchor example


def test_format_datetime_randomized_cross_check(spark):
    """Seeded-random format strings (supported codes + literal text,
    incl. quotes) cross-checked against an independent Python reference
    of the CH 24.x specifier table — guards the tokenizer's quoting and
    merging logic beyond the hand-picked vectors."""
    import datetime as _dt
    import random

    def ref(ts: _dt.datetime, fmt: str) -> str:
        iso_y, iso_w, iso_d = ts.isocalendar()
        table = {
            "a": ts.strftime("%a"), "b": ts.strftime("%b"),
            "c": f"{ts.month:02d}", "C": f"{ts.year // 100:02d}",
            "d": f"{ts.day:02d}", "D": ts.strftime("%m/%d/%y"),
            "e": f"{ts.day:2d}", "f": f"{ts.microsecond:06d}",
            "F": ts.strftime("%Y-%m-%d"), "g": f"{iso_y % 100:02d}",
            "G": str(iso_y), "h": ts.strftime("%I"), "H": f"{ts.hour:02d}",
            "i": f"{ts.minute:02d}", "I": ts.strftime("%I"),
            "j": f"{ts.timetuple().tm_yday:03d}", "k": str(ts.hour),
            "l": str(((ts.hour + 11) % 12) + 1), "m": f"{ts.month:02d}",
            "M": ts.strftime("%B"), "n": "\n",
            "p": "AM" if ts.hour < 12 else "PM",
            "Q": str((ts.month - 1) // 3 + 1),
            "r": ts.strftime("%I:%M:%S ") + ("AM" if ts.hour < 12 else "PM"),
            "R": ts.strftime("%H:%M"), "s": f"{ts.second:02d}",
            "S": f"{ts.second:02d}", "t": "\t",
            "T": ts.strftime("%H:%M:%S"), "u": str(iso_d),
            "V": f"{iso_w:02d}", "w": str((ts.weekday() + 1) % 7),
            "W": ts.strftime("%A"), "y": ts.strftime("%y"),
            "Y": str(ts.year), "z": "+0000", "%": "%",
        }
        out, i = [], 0
        while i < len(fmt):
            if fmt[i] == "%":
                out.append(table[fmt[i + 1]])
                i += 2
            else:
                out.append(fmt[i])
                i += 1
        return "".join(out)

    rng = random.Random(1337)
    codes = list("abcCdDefFghHiIjklmMnpQrRsStTuVwWyYz%")
    lits = list("XZ -:/.,'&")
    stamps = [
        _dt.datetime(2024, 3, 5, 7, 8, 9),
        _dt.datetime(2010, 1, 3, 23, 59, 59),   # ISO week 53 of 2009
        _dt.datetime(1999, 12, 31, 0, 0, 1),
    ]
    fmts = []
    for _ in range(40):
        parts = []
        for _ in range(rng.randint(1, 8)):
            if rng.random() < 0.65:
                parts.append("%" + rng.choice(codes))
            else:
                parts.append(rng.choice(lits))
        fmts.append("".join(parts))
    for ts in stamps:
        cols = ", ".join(
            f"formatDateTime(toDateTime('{ts}'), "
            f"'{f.replace(chr(39), chr(39) * 2)}') AS c{i}"
            for i, f in enumerate(fmts)
        )
        got = rows(spark, f"SELECT {cols}")[0]
        want = [ref(ts, f) for f in fmts]
        mism = [
            (fmts[i], got[i], want[i])
            for i in range(len(fmts))
            if got[i] != want[i]
        ]
        assert not mism, f"ts={ts}: {mism[:5]}"


def test_parse_datetime_randomized_roundtrip(spark):
    """Seeded-random formats over the parse-safe codes: formatDateTime
    renders a timestamp, parseDateTime with the SAME format must recover
    it (codes covering full Y-M-D H:M:S; separators include quotes)."""
    import random

    rng = random.Random(42)
    stamps = ["2024-03-05 07:08:09", "1999-12-31 23:59:58",
              "2010-06-15 00:00:01"]
    seps = [" ", "-", ":", "/", "T", "'", " at "]
    for _ in range(25):
        order = ["%Y", "%m", "%d", "%H", "%i", "%s"]
        rng.shuffle(order)
        fmt = ""
        for i, code in enumerate(order):
            if i:
                fmt += rng.choice(seps)
            fmt += code
        sql_fmt = fmt.replace("'", "''")
        cols = ", ".join(
            f"parseDateTime(formatDateTime(toDateTime('{ts}'),"
            f" '{sql_fmt}'), '{sql_fmt}') AS c{i}"
            for i, ts in enumerate(stamps)
        )
        got = rows(spark, f"SELECT {cols}")[0]
        assert [str(v) for v in got] == stamps, fmt


def test_polymorphic_empty_length(spark):
    """CH empty/notEmpty/length accept strings, arrays and maps; the
    translation picks size() for syntactically array/map-shaped
    arguments (literals, array-producing builtins, typed empty-array
    casts) — these previously hit length()'s analysis error."""
    r = rows(
        spark,
        "SELECT empty([1,2]) AS a, empty(emptyArrayInt8()) AS b,"
        " notEmpty(map('a', 1)) AS c, length([1,2,3]) AS d,"
        " length('abc') AS e, empty('') AS f,"
        " length(splitByChar(',', 'a,b')) AS g",
    )[0]
    assert list(r) == [False, True, True, 3, 3, True, 2]


def test_simplestate_and_aggregate_aliases(spark):
    """-SimpleState is a STORAGE combinator — SELECT values equal the
    plain aggregate (unlike -State, which stays a guided error);
    any_value/anyValueRespectNulls/arrayConcatAgg/sumMappedArrays are
    24.x alias spellings that previously leaked (round 13)."""
    spark.sql(
        "SELECT * FROM VALUES (1,'a',array(1,2)),(2,'a',array(3))"
        " AS t(x, g, arr)"
    ).createOrReplaceTempView("t_r13ss")
    r = spark.sql(translate(
        "SELECT g, sumSimpleState(x) AS ss, minSimpleState(x) AS ms,"
        " maxSimpleState(x) AS xs, anyLastSimpleState(x) AS als,"
        " any_value(x) AS av, anyValueRespectNulls(x) AS avr,"
        " arrayConcatAgg(arr) AS aca, sumMappedArrays(['k'], [x]) AS sma"
        " FROM t_r13ss GROUP BY g"
    )).collect()[0]
    assert (r.ss, r.ms, r.xs, r.als, r.av, r.avr) == (3, 1, 2, 2, 1, 1)
    assert sorted(r.aca) == [1, 2, 3]
    assert r.sma["_1"] == ["k"] and r.sma["_2"] == [3]
    with pytest.raises(ValueError, match="no Spark equivalent"):
        translate("SELECT sumState(x) FROM t GROUP BY g")


def test_nullable_lowcardinality_cast_and_add_interval(spark):
    """CAST type wrappers Nullable(T)/LowCardinality(T) unwrap (every
    Spark type is nullable; LowCardinality is a storage encoding) in
    both the AS and comma forms; addInterval/subtractInterval translate
    for plain INTERVAL arguments (round 13 — all were parse/resolution
    failures)."""
    r = rows(
        spark,
        "SELECT CAST('1' AS Nullable(Int32)) AS a,"
        " CAST('x' AS LowCardinality(Nullable(String))) AS b,"
        " CAST('2024-01-01', 'Nullable(Date)') AS c,"
        " addInterval(toDateTime('2024-01-01 00:00:00'),"
        "             INTERVAL 2 HOUR) AS d,"
        " subtractInterval(toDateTime('2024-01-01 02:00:00'),"
        "                  INTERVAL 30 MINUTE) AS e",
    )[0]
    assert r[0] == 1 and r[1] == "x" and str(r[2]) == "2024-01-01"
    assert str(r[3]) == "2024-01-01 02:00:00"
    assert str(r[4]) == "2024-01-01 01:30:00"
    with pytest.raises(DialectError, match="tuple of intervals"):
        translate("SELECT addInterval(t, tuple(INTERVAL 1 DAY,"
                  " INTERVAL 1 HOUR)) FROM x")


def test_distinct_on_sql_text(spark):
    """SELECT DISTINCT ON (cols) in SQL text (round 13 — previously
    parsed ON as a function and failed resolution; only the DataFrame
    shim existed).  Deterministic first-per-group pick via the trailing
    ORDER BY (else the ON columns); subquery form recurses; plain
    DISTINCT untouched."""
    spark.sql(
        "SELECT * FROM VALUES (1,'a'),(2,'a'),(3,'b'),(4,'b') AS t(x, g)"
    ).createOrReplaceTempView("t_r13do")
    got = spark.sql(translate(
        "SELECT DISTINCT ON (g) g, x FROM t_r13do ORDER BY g, x DESC"
    )).collect()
    assert [tuple(r) for r in got] == [("a", 2), ("b", 4)]
    got2 = spark.sql(translate(
        "SELECT * FROM (SELECT DISTINCT ON (g) g, x FROM t_r13do"
        " ORDER BY g, x) ORDER BY g"
    )).collect()
    assert [tuple(r) for r in got2] == [("a", 1), ("b", 3)]
    assert "DISTINCT ON" not in translate(
        "SELECT DISTINCT g FROM t_r13do"
    )  # plain DISTINCT untouched


def test_comparison_function_spellings_and_in_family(spark):
    """Operator-function spellings (equals/notEquals/less/greater/
    lessOrEquals/greaterOrEquals) and the notIn/nullIn/notNullIn family
    over array right sides (round 13 — were passthroughs).  The bare
    in() spelling is deliberately NOT mapped: its token is the IN
    operator's keyword; the operator form parses natively (asserted)."""
    spark.sql(
        "SELECT * FROM VALUES (1,'a'),(2,'a'),(3,'b') AS t(x, g)"
    ).createOrReplaceTempView("t_r13in")
    r = spark.sql(translate(
        "SELECT equals(x, 3) AS a, notEquals(x, 3) AS b, less(x, 9) AS c,"
        " greater(x, 1) AS d, lessOrEquals(x, 3) AS e,"
        " greaterOrEquals(x, 3) AS f, notIn(x, [1, 2]) AS ni,"
        " nullIn(NULL, [NULL, 1]) AS nl, notNullIn(x, [NULL, 1]) AS nn"
        " FROM t_r13in WHERE equals(g, 'b')"
    )).collect()[0]
    assert list(r) == [True, False, True, True, True, True,
                       True, True, True]
    # the IN operator must survive untouched
    t = translate("SELECT x FROM t WHERE x IN (1, 2) AND x NOT IN (9)")
    assert "IN (1, 2)" in t and "NOT IN (9)" in t
    with pytest.raises(DialectError, match="isNullable"):
        translate("SELECT isNullable(x) FROM t")


def test_timezone_settings_wkt_line_readers(spark):
    """Round-13 final closures: timezone()/timeZone() under the UTC
    session contract, getSettingOrDefault (no settings registry → the
    default IS the value), the WKT LINESTRING/MULTILINESTRING readers,
    and guided errors for rendering/boolean-geometry/region names."""
    r = rows(
        spark,
        "SELECT timezone() AS a, getSettingOrDefault('custom_x', 42) AS b,"
        " readWKTLineString('LINESTRING (1 1, 2.5 3)') AS c",
    )[0]
    assert r[0] == "UTC" and r[1] == 42
    assert [(p["_1"], p["_2"]) for p in r[2]] == [(1.0, 1.0), (2.5, 3.0)]
    for bad, msg in [("svg(p)", "svg"),
                     ("polygonsUnionCartesian(a, b)", "boolean"),
                     ("regionToName(1)", "embedded-regions")]:
        with pytest.raises(DialectError, match=msg):
            translate(f"SELECT {bad} FROM t")
