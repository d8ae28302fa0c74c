"""Round-9 SECOND gap-scan wave: math/date/URL/bitmask/map/array/hash
names that fell through to Spark's unresolved-function error.  Values
pinned against ClickHouse docs examples."""

from __future__ import annotations

import pytest

from mcp_clickhouse_spark.dialect import DialectError, translate


def one(spark, sql):
    return spark.sql(translate(sql)).collect()[0]


def test_math_and_misc(spark):
    row = one(
        spark,
        "SELECT clamp(1, 2, 3) AS cl, positiveModulo(-1, 10) AS pm,"
        " round(degrees(pi()), 6) AS deg, round(log1p(0.0), 6) AS l1p,"
        " toBool(1) AS tb, toDecimalString(64.32, 5) AS tds",
    )
    assert row.cl == 2                       # CH docs clamp example
    assert row.pm == 9                       # CH docs positiveModulo(-1,10)
    assert row.deg == 180.0
    assert row.l1p == 0.0
    assert row.tb is True
    assert row.tds == "64.32000"             # CH docs toDecimalString


def test_bitmask_family(spark):
    row = one(
        spark,
        "SELECT bitmaskToList(50) AS bl,"
        " bitmaskToArray(50) AS ba, bitPositionsToArray(50) AS bp",
    )
    assert row.bl == "2,16,32"               # CH docs bitmaskToList(50)
    assert list(row.ba) == [2, 16, 32]
    assert list(row.bp) == [1, 4, 5]


def test_url_extensions(spark):
    row = one(
        spark,
        "SELECT port('http://paul@www.example.com:80/') AS p,"
        " port('http://example.com/') AS p0,"
        " queryStringAndFragment('http://x.com/?a=1&b=2#top') AS qf,"
        " extractURLParameterNames('http://x.com/?a=1&b=2') AS names,"
        " encodeURLFormComponent('a b') AS enc,"
        " decodeURLFormComponent('a+b') AS dec",
    )
    assert row.p == 80                       # CH docs port example
    assert row.p0 == 0
    assert row.qf == "a=1&b=2#top"
    assert list(row.names) == ["a", "b"]
    assert row.enc == "a+b"
    assert row.dec == "a b"


def test_map_predicates(spark):
    row = one(
        spark,
        "SELECT mapExists((k, v) -> v > 1, map('a', 1, 'b', 2)) AS me,"
        " mapExists((k, v) -> v > 9, map('a', 1)) AS me0,"
        " mapAll((k, v) -> v > 0, map('a', 1, 'b', 2)) AS ma,"
        " mapAll((k, v) -> v > 1, map('a', 1, 'b', 2)) AS ma0,"
        " map_keys(mapExtractKeyLike(map('abc', 1, 'xyz', 2), 'a%')) AS mk",
    )
    assert (row.me, row.me0, row.ma, row.ma0) == (1, 0, 1, 0)
    assert list(row.mk) == ["abc"]


def test_array_set_ops(spark):
    row = one(
        spark,
        "SELECT round(arrayJaccardIndex([1, 2], [2, 3]), 6) AS aj,"
        " array_sort(arraySymmetricDifference([1, 2, 3], [2, 3, 4])) AS sd,"
        " arrayEnumerateDense([10, 20, 10, 30]) AS ed,"
        " size(arrayRandomSample([1, 2, 3, 4, 5], 3)) AS rs,"
        " element_at(arrayZipUnaligned([1, 2], ['a']), 2) AS zu",
    )
    assert row.aj == pytest.approx(1 / 3, abs=1e-6)  # CH docs example
    assert list(row.sd) == [1, 4]
    assert list(row.ed) == [1, 2, 1, 3]      # CH docs arrayEnumerateDense
    assert row.rs == 3
    assert (row.zu[0], row.zu[1]) == (2, None)  # NULL-padded second slot


def test_java_hash_and_morton(spark):
    row = one(
        spark,
        "SELECT javaHash('Hello, world!') AS jh, javaHash('') AS jz,"
        " mortonEncode(1, 2, 3) AS me,"
        " tupleElement(mortonDecode(3, 53), 1) AS d1,"
        " tupleElement(mortonDecode(3, 53), 2) AS d2,"
        " tupleElement(mortonDecode(3, 53), 3) AS d3",
    )
    assert row.jh == -1880044555             # CH docs javaHash example
    assert row.jz == 0
    assert row.me == 53                      # CH docs mortonEncode(1,2,3)
    assert (row.d1, row.d2, row.d3) == (1, 2, 3)


def test_date_alias_and_tz(spark):
    row = one(
        spark,
        "SELECT date_diff('day', toDate('2024-01-01'),"
        " toDate('2024-01-11')) AS dd,"
        " timestampDiff('hour', toDateTime('2024-01-01 00:00:00'),"
        " toDateTime('2024-01-01 06:00:00')) AS td,"
        " timestampAdd('day', 3, toDate('2024-01-01')) AS ta,"
        " timezoneOf(now()) AS tz,"
        " toStartOfMicrosecond(toDateTime('2024-01-01 00:00:00')) AS ms",
    )
    assert row.dd == 10 and row.td == 6
    assert str(row.ta).startswith("2024-01-04")
    assert isinstance(row.tz, str) and row.tz
    assert str(row.ms).startswith("2024-01-01")


def test_readable_decimal_size(spark):
    row = one(
        spark,
        "SELECT formatReadableDecimalSize(1000000) AS mb,"
        " formatReadableDecimalSize(512) AS b",
    )
    assert row.mb == "1.00 MB"
    assert row.b == "512.00 B"


def test_wave2_guided_errors():
    for sql, frag in [
        ("SELECT runningDifference(x) FROM t", "block order"),
        ("SELECT neighbor(x, 1) FROM t", "block order"),
        ("SELECT wyHash64(s) FROM t", "xxhash64"),
        ("SELECT hiveHash(s) FROM t", "xxhash64"),
        ("SELECT hilbertEncode(1, 2) FROM t", "morton"),
        ("SELECT stochasticLinearRegression(a, b) FROM t", "MLlib"),
        ("SELECT seriesPeriodDetectFFT(a) FROM t", "pandas UDF"),
        ("SELECT sumWithOverflow(x) FROM t", "overflow"),
        # groupBitmapAnd/Or/Xor were implemented in round 15
    ]:
        with pytest.raises(DialectError, match=frag):
            translate(sql)


def test_quantile_exact_selection_variants(spark):
    # CH QuantileExact.h selection rules, pinned: exact = element at
    # floor(level·n); Low/High split the two middles at level 0.5
    # (python median_low/median_high); Exclusive/Inclusive are the Excel
    # PERCENTILE.EXC / PERCENTILE.INC interpolations
    row = one(
        spark,
        "SELECT quantileExact(0.5)(x) AS qe, quantileExactLow(0.5)(x) AS ql,"
        " quantileExactHigh(0.5)(x) AS qh,"
        " round(quantileExactExclusive(0.25)(x), 6) AS qx,"
        " round(quantileExactInclusive(0.25)(x), 6) AS qi"
        " FROM (SELECT explode(array(10, 20, 30, 40)) AS x)",
    )
    assert (row.qe, row.ql, row.qh) == (30, 20, 30)
    assert (row.qx, row.qi) == (12.5, 17.5)  # h=1.25 EXC / h=1.75 INC
    row = one(
        spark,
        "SELECT quantileExact(0.5)(x) AS qe, quantileExactLow(0.5)(x) AS ql,"
        " quantileExactHigh(0.5)(x) AS qh,"
        " quantilesExactExclusive(0.25, 0.5)(x) AS qsx,"
        " quantilesExactInclusive(0.25, 0.5)(x) AS qsi"
        " FROM (SELECT explode(array(1, 2)) AS x)",
    )
    assert (row.qe, row.ql, row.qh) == (2, 1, 2)
    assert list(row.qsx) == [1.0, 1.5] and list(row.qsi) == [1.25, 1.5]
    from mcp_clickhouse_spark.dialect import DialectError

    with pytest.raises(DialectError, match="strictly inside"):
        translate("SELECT quantileExactExclusive(0)(x) FROM t")
    with pytest.raises(DialectError, match="numeric literal"):
        translate("SELECT quantileExactLow(y)(x) FROM t")


def test_map_populate_series(spark):
    # CH docs pin: mapPopulateSeries([1,2,4],[11,22,44],5) =
    # ([1,2,3,4,5],[11,22,0,44,0]); map form fills to max key (or the
    # integer-literal max)
    row = one(
        spark,
        "SELECT tupleElement(mapPopulateSeries("
        "array(1,2,4), array(11,22,44), 5), 1) AS ks,"
        " tupleElement(mapPopulateSeries("
        "array(1,2,4), array(11,22,44), 5), 2) AS vs,"
        " mapPopulateSeries(map(1, 10, 5, 20)) AS m,"
        " mapPopulateSeries(map(1, 10, 3, 20), 4) AS m2",
    )
    assert list(row.ks) == [1, 2, 3, 4, 5]
    assert list(row.vs) == [11, 22, 0, 44, 0]
    assert dict(row.m) == {1: 10, 2: 0, 3: 0, 4: 0, 5: 20}
    assert dict(row.m2) == {1: 10, 2: 0, 3: 20, 4: 0}


def test_array_if_chain_and_map_form(spark):
    # -ArrayIf chained combinators + the 1-argument MAP form of
    # sumMap/minMap/maxMap (CH returns Map for Map input)
    row = one(
        spark,
        "SELECT sumArrayIf(a, c) AS s, avgArrayIf(a, c) AS av,"
        " minArrayIf(a, c) AS mn, maxArrayIf(a, c) AS mx,"
        " countArrayIf(a, c) AS ct, uniqArrayIf(a, c) AS uq,"
        " sumMap(m) AS sm, maxMap(m) AS mm"
        " FROM (SELECT * FROM VALUES"
        " (array(1, 2), true,  map('a', 10, 'b', 1)),"
        " (array(3, 4), false, map('a', 5)),"
        " (array(5, 6), true,  map('b', 2)) AS t(a, c, m))",
    )
    assert (row.s, row.av, row.mn, row.mx, row.ct, row.uq) == (
        14, 3.5, 1, 6, 4, 4
    )
    assert dict(row.sm) == {"a": 15, "b": 3}
    assert dict(row.mm) == {"a": 10, "b": 2}


def test_resample_combinator(spark):
    # CH docs shape: countResample(30, 75, 30)(name, age) — subranges
    # [30,60) and [60,75), the last clamped at end; out-of-range keys drop
    row = one(
        spark,
        "SELECT countResample(30, 75, 30)(name, age) AS c,"
        " sumResample(30, 75, 30)(wage, age) AS s,"
        " avgResample(30, 75, 30)(wage, age) AS av,"
        " minResample(30, 75, 30)(wage, age) AS mn,"
        " uniqResample(30, 75, 30)(name, age) AS u"
        " FROM (SELECT * FROM VALUES"
        " ('a', 35, 10.0D), ('b', 45, 20.0D), ('c', 62, 30.0D),"
        " ('d', 70, 40.0D), ('e', 80, 99.0D), ('a', 40, 5.0D)"
        " AS t(name, age, wage))",
    )
    assert list(row.c) == [3, 2]          # 35,45,40 | 62,70 (80 dropped)
    assert list(row.s) == [35.0, 70.0]
    assert list(row.av) == [pytest.approx(35 / 3), 35.0]
    assert list(row.mn) == [5.0, 30.0]
    assert list(row.u) == [2, 2]   # 'a' repeats in bucket 1


def test_resample_empty_buckets_return_defaults(spark):
    # r9 advisor: empty subranges return the aggregate's DEFAULT value the
    # way CH's empty-state insertResultInto does — count/uniq 0, sum the
    # typed zero, min/max 0, avg NaN — never NULL
    import math

    row = one(
        spark,
        "SELECT countResample(0, 30, 10)(wage, age) AS c,"
        " sumResample(0, 30, 10)(wage, age) AS s,"
        " avgResample(0, 30, 10)(wage, age) AS av,"
        " minResample(0, 30, 10)(wage, age) AS mn,"
        " maxResample(0, 30, 10)(wage, age) AS mx,"
        " uniqResample(0, 30, 10)(wage, age) AS u"
        " FROM (SELECT * FROM VALUES (5, 7.0D), (25, 9.0D)"
        " AS t(age, wage))",  # middle bucket [10,20) is empty
    )
    assert list(row.c) == [1, 0, 1]
    assert list(row.s) == [7.0, 0.0, 9.0]
    assert list(row.mn) == [7.0, 0.0, 9.0]
    assert list(row.mx) == [7.0, 0.0, 9.0]
    assert list(row.u) == [1, 0, 1]
    assert row.av[0] == 7.0 and row.av[2] == 9.0 and math.isnan(row.av[1])


def test_resample_guided_on_bad_params():
    with pytest.raises(DialectError, match="end > start"):
        translate("SELECT countResample(75, 30, 30)(n, k) FROM t")
    with pytest.raises(DialectError, match="parameters"):
        translate("SELECT sumResample(1)(n, k) FROM t")


def test_third_wave(spark):
    row = one(
        spark,
        "SELECT regexpExtract('abc123def', '([0-9]+)') AS re,"
        " regexpExtract('abc123def', '([a-z]+)([0-9]+)', 2) AS re2,"
        " LinfNorm([1, -7, 3]) AS ln,"
        " toYYYYMMDDhhmmss(toDateTime('2024-03-05 10:47:09')) AS ymd,"
        " chr(65) AS ch, leftUTF8('привет', 3) AS l3,"
        " printf('%s=%d', 'x', 7) AS pf,"
        " toLastDayOfWeek(toDate('2024-03-06')) AS sat,"
        " toLastDayOfWeek(toDate('2024-03-06'), 1) AS sun,"
        " arrayCumSumNonNegative([1, 1, -4, 1]) AS cs",
    )
    assert row.re == "123" and row.re2 == "123"
    assert row.ln == 7.0
    assert row.ymd == "20240305104709"
    assert row.ch == "A" and row.l3 == "при"
    assert row.pf == "x=7"
    # 2024-03-06 is a Wednesday → Saturday 03-09 (mode 0), Sunday 03-10
    assert str(row.sat) == "2024-03-09"
    assert str(row.sun) == "2024-03-10"
    assert list(row.cs) == [1, 2, 0, 1]      # CH docs example


def test_third_wave_guided():
    for sql, frag in [
        ("SELECT tuplePlus(a, b) FROM t", "zip_with"),
        ("SELECT rowNumberInAllBlocks() FROM t", "block structure"),
        ("SELECT queryID() FROM t", "query registry"),
        ("SELECT generateUUIDv7() FROM t", "generateUUIDv4"),
    ]:
        with pytest.raises(DialectError, match=frag):
            translate(sql)


def test_window_spellings_and_extract_groups(spark):
    rows = spark.sql(
        translate(
            "SELECT x, rowNumber() OVER (ORDER BY x) AS rn,"
            " denseRank() OVER (ORDER BY x) AS dr,"
            " nthValue(x, 2) OVER (ORDER BY x"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
            " AS nv FROM (SELECT explode(array(10, 20, 20)) AS x)"
        )
    ).collect()
    assert [(r.rn, r.dr, r.nv) for r in rows] == [
        (1, 1, 20), (2, 2, 20), (3, 2, 20)
    ]
    # CH docs: extractAllGroupsHorizontal('abc=111, def=222',
    # '("[^"]+"|\\w+)=("[^"]+"|\\w+)') → [['abc','def'],['111','222']];
    # Vertical → [['abc','111'],['def','222']]
    row = one(
        spark,
        r"SELECT extractAllGroupsHorizontal('abc=111, def=222',"
        r" '(\\w+)=(\\w+)') AS h,"
        r" extractAllGroupsVertical('abc=111, def=222',"
        r" '(\\w+)=(\\w+)') AS v,"
        r" indexHint(1 = 1) AS ih",
    )
    assert [list(g) for g in row.h] == [["abc", "def"], ["111", "222"]]
    assert [list(g) for g in row.v] == [["abc", "111"], ["def", "222"]]
    assert row.ih is True


def test_extract_groups_guided():
    with pytest.raises(DialectError, match="string literal"):
        translate("SELECT extractAllGroupsVertical(s, p) FROM t")
    with pytest.raises(DialectError, match="capture groups"):
        translate("SELECT extractAllGroupsVertical(s, 'nogroups') FROM t")


def test_ipv6_family(spark):
    # CH docs pins: the text roundtrip, cutIPv6's byte-zeroing,
    # IPv6CIDRToRange('2001:0db8:...:8001', 32), and
    # isIPAddressInRange('127.0.0.1', '127.0.0.0/8') = 1.  IPv4-mapped
    # addresses render with the dotted tail exactly like CH.
    from mcp_clickhouse_spark.tools import run_select_query

    res = run_select_query(
        spark,
        "SELECT IPv6NumToString(IPv6StringToNum('2a02:6b8::11')) AS rt,"
        " isIPv6String('::ffff:127.0.0.1') AS v6a, isIPv6String('x') AS v6b,"
        " cutIPv6(IPv6StringToNum("
        "'2001:0DB8:AC10:FE01:FEED:BABE:CAFE:F00D'), 2, 0) AS cut,"
        " tupleElement(IPv6CIDRToRange(IPv6StringToNum("
        "'2001:0db8:0000:85a3:0000:0000:ac1f:8001'), 32), 1) AS lo,"
        " tupleElement(IPv6CIDRToRange(IPv6StringToNum("
        "'2001:0db8:0000:85a3:0000:0000:ac1f:8001'), 32), 2) AS hi,"
        " isIPAddressInRange('127.0.0.1', '127.0.0.0/8') AS inr,"
        " isIPAddressInRange('127.0.0.1', 'ffff::/16') AS outr,"
        " IPv6NumToString(IPv4ToIPv6(IPv4StringToNum('192.168.0.1'))) AS v4,"
        " IPv6NumToString(IPv6StringToNum('127.0.0.1')) AS m4,"
        " IPv6NumToString(toIPv6('10.20.30.40')) AS m4b,"
        " toIPv6OrNull('not an ip') IS NULL AS bad",
        dialect="clickhouse",
    )
    row = dict(zip(res["columns"], res["rows"][0]))
    assert row["rt"] == "2a02:6b8::11"
    assert (row["v6a"], row["v6b"]) == (1, 0)
    assert row["cut"] == "2001:db8:ac10:fe01:feed:babe:cafe:0"
    assert row["lo"] == "2001:db8::"
    assert row["hi"] == "2001:db8:ffff:ffff:ffff:ffff:ffff:ffff"
    assert (row["inr"], row["outr"]) == (1, 0)
    assert row["v4"] == "::ffff:192.168.0.1"
    # CH docs: IPv6StringToNum/toIPv6 on a valid IPv4 string return its
    # IPv4-mapped IPv6 equivalent (r9 advisor fix)
    assert row["m4"] == "::ffff:127.0.0.1"
    assert row["m4b"] == "::ffff:10.20.30.40"
    assert row["bad"] is True


def test_fourth_wave(spark):
    row = one(
        spark,
        "SELECT arrayWithConstant(3, 'x') AS awc,"
        " subBitmap([5, 1, 3, 9], 1, 2) AS sb,"
        " bitmapSubsetInRange([5, 1, 3, 9], 3, 9) AS br,"
        " bitmapSubsetLimit([5, 1, 3, 9], 3, 2) AS bl,"
        " parseReadableSize('1 KiB') AS prs,"        # CH docs pin: 1024
        " parseReadableSize('5 MB') AS prs2,"
        " parseReadableSizeOrNull('oops') AS prsn,"
        " parseReadableSizeOrZero('oops') AS prsz,"
        " ULIDStringToDateTime('01GNB2S2FGN2P93QPXDNB4EN2R') AS ulid,"
        " extractTextFromHTML('<p>A <b>text</b><!-- c -->"
        "<script>x=1</script> here</p>') AS html,"
        " extractTextFromHTML('a<![CDATA[ kept <b> ]]>b') AS cdata,"
        " toRelativeQuarterNum(toDate('2024-05-05'))"
        " - toRelativeQuarterNum(toDate('2023-11-01')) AS qd",
    )
    assert list(row.awc) == ["x", "x", "x"]
    assert list(row.sb) == [3, 5]
    assert list(row.br) == [3, 5] and list(row.bl) == [3, 5]
    assert (row.prs, row.prs2, row.prsn, row.prsz) == (1024, 5000000, None, 0)
    # CH docs pin: 01GNB2S2FG... → 2022-12-28 00:40:37.616
    assert str(row.ulid).startswith("2022-12-28 00:40:37.616")
    assert row.html == "A text here"
    # CDATA is unwrapped; markup INSIDE it still strips (documented
    # delta vs CH, which keeps CDATA bytes fully verbatim)
    assert row.cdata == "a kept b"
    assert row.qd == 2


def test_fourth_wave_guided():
    for sql, frag in [
        # decodeXML/HTMLComponent translate since round 11
        # (functions/codecs.py pandas_udfs)
        ("SELECT ngramMinHash(s) FROM t", "minhash_signatures"),
        ("SELECT multiFuzzyMatchAny(s, 2, ['x']) FROM t", "multiSearchAny"),
        ("SELECT normalizeQuery(s) FROM t", "introspection"),
        ("SELECT getSetting('x') FROM t", "introspection"),
    ]:
        with pytest.raises(DialectError, match=frag):
            translate(sql)


def test_aggregate_wave(spark):
    row = one(
        spark,
        "SELECT groupArraySorted(3)(x) AS gs,"
        " quantileDD(0.01, 0.5)(x) AS qd,"
        " groupArrayIntersect(a) AS gi,"
        " singleValueOrNull(c) AS sv1, singleValueOrNull(x) AS svn,"
        " any_respect_nulls(n) AS arn,"
        " corrMatrix(x, y) AS cm"
        " FROM (SELECT * FROM VALUES"
        " (5.0D, 1.0D, array(1, 2, 3), 7, CAST(NULL AS INT)),"
        " (3.0D, 2.0D, array(2, 3, 4), 7, CAST(NULL AS INT)),"
        " (8.0D, 3.0D, array(3, 2, 9), 7, CAST(NULL AS INT))"
        " AS t(x, y, a, c, n))",
    )
    assert list(row.gs) == [3.0, 5.0, 8.0]
    assert row.qd == 5.0
    assert list(row.gi) == [2, 3]
    assert (row.sv1, row.svn, row.arn) == (7, None, None)
    assert len(row.cm) == 2 and row.cm[0][0] == pytest.approx(1.0)
    assert row.cm[0][1] == pytest.approx(row.cm[1][0])


def test_aggregate_wave_guided():
    for sql, frag in [
        ("SELECT exponentialTimeDecayedSum(5)(v, t) FROM x",
         "exponentialMovingAverage"),
        ("SELECT sparkbar(9)(x, y) FROM t", "width_bucket"),
        ("SELECT analysisOfVariance(v, g) FROM t", "F-distribution"),
        ("SELECT runningConcurrency(a, b) FROM t", "maxIntersections"),
    ]:
        with pytest.raises(DialectError, match=frag):
            translate(sql)
