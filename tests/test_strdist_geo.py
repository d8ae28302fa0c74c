"""Round-10 gap-scan wave: byte-exact string distances, gamma
functions, planar geometry and geohash — all previously guided errors
or unresolved names.  Values pinned against ClickHouse docs examples
(byteHammingDistance/damerauLevenshteinDistance/jaroSimilarity/
jaroWinklerSimilarity/arrayLevenshtein from
docs/sql-reference/functions/string-functions and array-functions;
geohash/greatCircleAngle/polygon* from geo functions docs)."""

from __future__ import annotations

import math

import pytest

from mcp_clickhouse_spark.dialect import DialectError, translate
from mcp_clickhouse_spark.functions import register_lazy_udfs


def one(spark, sql):
    ts = translate(sql)
    register_lazy_udfs(spark, ts)
    return spark.sql(ts).collect()[0]


def test_byte_distances(spark):
    row = one(
        spark,
        "SELECT byteHammingDistance('karolin', 'kathrin') AS bh,"
        " byteHammingDistance('abc', 'ab') AS bh2,"
        " damerauLevenshteinDistance('clickhouse', 'mouse') AS dl,"
        " damerauLevenshteinDistance('CA', 'ABC') AS dl2,"
        " round(jaroSimilarity('clickhouse', 'click'), 10) AS js,"
        " round(jaroWinklerSimilarity('clickhouse', 'click'), 10) AS jw",
    )
    assert row.bh == 3  # CH docs example
    assert row.bh2 == 1  # length difference counts
    assert row.dl == 6  # CH docs example
    # FULL Damerau-Levenshtein (not the restricted OSA, which gives 3):
    # CA → AC → ABC is legal because the transposition is unrestricted
    assert row.dl2 == 2
    assert row.js == round(0.8333333333333333, 10)  # CH docs example
    assert row.jw == 0.9  # CH docs example


def test_byte_distance_is_byte_exact(spark):
    # 'é' is 2 UTF-8 bytes — byte hamming vs 'ab' prefix differs from any
    # char-based result; DL over bytes: 'é' (c3 a9) vs 'e' (65) = 2 edits
    row = one(
        spark,
        "SELECT byteHammingDistance('é', 'e') AS bh,"
        " damerauLevenshteinDistance('é', 'e') AS dl",
    )
    assert row.bh == 2  # c3,a9 vs 65 → 1 mismatch + 1 length byte
    assert row.dl == 2


def test_array_levenshtein(spark):
    row = one(
        spark,
        "SELECT arrayLevenshtein([1, 2, 4], [1, 2, 3]) AS a,"
        " arrayLevenshtein(['a', 'b'], ['a']) AS b,"
        " arrayLevenshtein(CAST([] AS ARRAY<INT>), [1, 2]) AS c",
    )
    assert row.a == 1
    assert row.b == 1
    assert row.c == 2


def test_gamma_functions(spark):
    row = one(
        spark,
        "SELECT tgamma(5.0) AS tg, round(lgamma(5.0), 10) AS lg,"
        " lgamma(0.0) AS pole",
    )
    assert row.tg == 24.0
    assert row.lg == round(math.log(24.0), 10)
    assert math.isinf(row.pole)


def test_geohash(spark):
    row = one(
        spark,
        "SELECT geohashEncode(-5.60302734375, 42.593994140625, 0) AS e,"
        " geohashEncode(-5.60302734375, 42.593994140625, 5) AS e5,"
        " geohashDecode('ezs42') AS d",
    )
    assert row.e == "ezs42d000000"  # CH docs example (0 → default 12)
    assert row.e5 == "ezs42"
    assert row.d._1 == -5.60302734375  # CH docs example (cell center)
    assert row.d._2 == 42.60498046875


def test_great_circle_angle(spark):
    row = one(spark, "SELECT greatCircleAngle(0, 0, 45, 0) AS a")
    assert row.a == pytest.approx(45.0)  # CH docs example


def test_point_in_polygon(spark):
    row = one(
        spark,
        "SELECT pointInPolygon((3., 3.), [(6, 0), (8, 4), (5, 8), (0, 2)]) AS i,"
        " pointInPolygon((10., 10.), [(6, 0), (8, 4), (5, 8), (0, 2)]) AS o,"
        " pointInPolygon(tuple(2.5, 2.5), [(0, 0), (10, 0), (10, 10), (0, 10)],"
        "   [(2, 2), (2, 3), (3, 3), (3, 2)]) AS h,"
        " pointInPolygon((5., 5.), [(0, 0), (10, 0), (10, 10), (0, 10)],"
        "   [(2, 2), (2, 3), (3, 3), (3, 2)]) AS nh",
    )
    assert row.i == 1  # CH docs example (inside → 1)
    assert row.o == 0
    assert row.h == 0  # inside the hole ring → outside the polygon
    assert row.nh == 1  # outside the hole, inside the outer ring


def test_polygon_area_perimeter(spark):
    row = one(
        spark,
        "SELECT polygonAreaCartesian([[(0., 0.), (0., 5.), (5., 5.)]]) AS a,"
        " round(polygonPerimeterCartesian([[(0., 0.), (0., 5.), (5., 5.)]]), 6)"
        "   AS p,"
        " polygonAreaCartesian([[(0., 0.), (10., 0.), (10., 10.), (0., 10.)],"
        "   [(2., 2.), (2., 4.), (4., 4.), (4., 2.)]]) AS hole_area",
    )
    assert row.a == 12.5  # CH docs example; orientation-insensitive
    assert row.p == round(5 + 5 + math.hypot(5, 5), 6)  # closed ring
    assert row.hole_area == 100.0 - 4.0  # outer minus hole


def test_h3_stays_guided():
    with pytest.raises(DialectError, match="h3"):
        translate("SELECT geoToH3(37.79, 55.71, 15) FROM t")
    # ngramDistance/Search translate since round 11 (functions/strdist.py)
    assert "ch_ngram_dist" in translate("SELECT ngramDistance(a, b) FROM t")


def test_levenshtein_utf8_alias(spark):
    row = one(spark, "SELECT levenshteinDistanceUTF8('abc', 'axc') AS r")
    assert row.r == 1


def test_erf_sigmoid_yearzero(spark):
    # round-10 gap scan: erf/erfc (libm via pandas_udf), sigmoid (pure
    # SQL), fromDaysSinceYearZero (inverse of toDaysSinceYearZero)
    import math as _m

    row = one(
        spark,
        "SELECT round(erf(1.0), 10) AS e, round(erfc(1.0), 10) AS ec,"
        " sigmoid(0.0) AS s, round(sigmoid(2.0), 10) AS s2,"
        " fromDaysSinceYearZero(toDaysSinceYearZero(toDate('2023-09-08')))"
        "   AS rt,"
        " toDaysSinceYearZero(toDate('1970-01-01')) AS epoch_days",
    )
    assert row.e == round(_m.erf(1.0), 10)
    assert row.ec == round(_m.erfc(1.0), 10)
    assert row.s == 0.5
    assert row.s2 == round(1.0 / (1.0 + _m.exp(-2.0)), 10)
    assert str(row.rt) == "2023-09-08"  # round-trip identity
    assert row.epoch_days == 719528  # the documented epoch offset


def test_round10_guided_entries():
    for sql, frag in [
        ("SELECT tupleToNameValuePairs(t) FROM x", "tupleElement"),
        ("SELECT kostikConsistentHash(h, 2) FROM x", "jumpConsistentHash"),
    ]:
        with pytest.raises(DialectError, match=frag):
            translate(sql)


def test_round10_wave2(spark):
    # ISO-year family, cut-to-zero, bin/unbin byte padding, KV raw
    row = one(
        spark,
        "SELECT toISOYear(toDate('2021-01-01')) AS iy,"
        " toStartOfISOYear(toDate('2024-06-01')) AS sy,"
        " toStringCutToZero(concat('ab', char(0), 'cd')) AS cz,"
        " bin(14) AS b, bin(256) AS b2,"
        " unbin('0011000100110000') AS ub,"
        " leftPadUTF8('a', 3, 'bc') AS lp"
    )
    assert row.iy == 2020  # 2021-01-01 falls in ISO week 53 of 2020
    assert str(row.sy) == "2024-01-01"  # ISO 2024 starts Mon Jan 1
    assert row.cz == "ab"
    assert row.b == "00001110"  # CH docs bin(14), byte-padded
    assert row.b2 == "0000000100000000"
    assert row.ub == "10"  # CH docs unbin example
    assert row.lp == "bca"


def test_round10_wave2_kv_raw(spark):
    row = one(
        spark,
        """SELECT JSONExtractKeysAndValuesRaw('{"a": {"b": 1}, "c": 2}') AS kv""",
    )
    assert [(e.key, e.value) for e in row.kv] == [("a", '{"b":1}'), ("c", "2")]


def test_round10_wave2_guided():
    for sql, frag in [
        ("SELECT tupleSum(t) FROM x", "arity"),
        # dotProduct((1,2),(3,4)) is no longer guided — round 14 expands
        # literal tuples element-wise (pinned in test_r14_fixes)
        ("SELECT mapPartialSort((k, v) -> v, 2, m) FROM x", "map_entries"),
        ("SELECT bitSlice(s, 2, 8) FROM x", "bit-granular"),
        ("SELECT stringToH3(s) FROM x", "h3"),
        ("SELECT firstSignificantSubdomainCustom(u, 'l') FROM x", "TLD"),
    ]:
        with pytest.raises(DialectError, match=frag):
            translate(sql)


def test_generic_if_combinator(spark):
    """Round-10 generic -If composition: bases without a hand-written
    -If entry compose through the generator (value args NULLed on
    non-matching rows — the CH -If row filter)."""
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW _ifc AS"
        " SELECT id AS x, id % 3 AS k, CAST(id AS DOUBLE) AS v"
        " FROM range(10)"
    )
    row = one(
        spark,
        "SELECT groupArrayIf(x, k = 1) AS ga,"
        " groupUniqArrayIf(k, v > 3) AS gu,"
        " anyLastIf(v, k = 0) AS al,"
        " medianIf(v, k = 1) AS md,"
        " round(corrIf(v, x * 2, v > 1), 10) AS cr,"
        " quantileIf(0.5)(v, k = 1) AS q,"
        " grouparraylastIf(2)(x, k = 1) AS gl"
        " FROM _ifc",
    )
    assert sorted(row.ga) == [1, 4, 7]
    assert sorted(row.gu) == [0, 1, 2]
    assert row.al == 9.0
    assert row.md == 4.0
    assert row.cr == 1.0
    assert row.q == 4.0
    assert list(row.gl) == [4, 7]
    # scalar names ending in "if" resolve to their own templates, never
    # the aggregate wrap (multiIf = CH's own conditional, not "mult"-If)
    assert (
        translate("SELECT multiIf(x > 5, 1, 0) FROM t")
        == "SELECT CASE WHEN x > 5 THEN 1 ELSE 0 END FROM t"
    )


def test_round10_wave3(spark):
    # base32/base64URL codecs, typed intervals, rand fixes
    row = one(
        spark,
        "SELECT base32Encode('ivan') AS b32,"
        " base32Decode(base32Encode('ivan')) AS b32d,"
        " tryBase32Decode('!!') AS b32t,"
        " base64URLEncode('https://clickhouse.com') AS b64u,"
        " base64URLDecode('aHR0cHM6Ly9jbGlja2hvdXNlLmNvbQ') AS b64d,"
        " tryBase64URLDecode('%%%') AS b64t,"
        " toDate('2024-01-31') + toIntervalMonth(1) AS pm,"
        " toDate('2024-01-01') + toIntervalWeek(2) AS pw,"
        " toIntervalDay(3) AS iv",
    )
    import base64 as _b64

    assert row.b32 == _b64.b32encode(b"ivan").decode()  # RFC 4648 round trip
    assert row.b32d == "ivan"
    assert row.b32t == ""
    assert row.b64u == "aHR0cHM6Ly9jbGlja2hvdXNlLmNvbQ"  # CH docs example
    assert row.b64d == "https://clickhouse.com"
    assert row.b64t == ""
    assert str(row.pm) == "2024-02-29"  # month-end clamping
    # date + day-time interval promotes to TIMESTAMP in Spark (CH keeps
    # Date) — the instant is the same midnight
    assert str(row.pw).startswith("2024-01-15")
    assert row.iv is not None  # DayTimeIntervalType collects fine now


def test_round10_wave3_rand(spark):
    spark.sql("CREATE OR REPLACE TEMP VIEW _r10w3 AS SELECT id FROM range(2000)")
    rows = spark.sql(translate(
        "SELECT randBernoulli(0.5) AS b, randExponential(2.0) AS e,"
        " randNormal(10, 4) AS n, randLogNormal(0, 1) AS ln"
        " FROM _r10w3"
    )).collect()
    bs = [r.b for r in rows]
    assert set(bs) <= {0, 1}
    assert 800 < sum(bs) < 1200  # p=0.5 over 2000 draws
    es = [r.e for r in rows]
    assert all(v >= 0 for v in es)
    assert 0.4 < sum(es) / len(es) < 0.6  # mean 1/lambda = 0.5
    ns = [r.n for r in rows]
    m = sum(ns) / len(ns)
    var = sum((v - m) ** 2 for v in ns) / (len(ns) - 1)
    assert 9.5 < m < 10.5 and 3.0 < var < 5.2  # variance arg is VARIANCE
    assert all(v > 0 for v in [r.ln for r in rows])


def test_round10_wave3_guided():
    for sql, frag in [
        # randPoisson & friends translate since round 11 (numpy
        # pandas_udfs, functions/randdist.py)
        ("SELECT byteSwap(x) FROM t", "WIDTH"),
        ("SELECT toUInt128(x) FROM t", "DECIMAL"),
        ("SELECT JSONAllPaths(j) FROM t", "dynamic JSON"),
    ]:
        with pytest.raises(DialectError, match=frag):
            translate(sql)


def test_parse_datetime64_aliases(spark):
    row = one(
        spark,
        "SELECT parseDateTime64BestEffort('2024-01-01 10:00:00.123') AS a,"
        " parseDateTime64BestEffortOrNull('junk') AS b",
    )
    assert str(row.a).startswith("2024-01-01 10:00:00")
    assert row.b is None


def test_round10_wave4(spark):
    row = one(
        spark,
        "SELECT arrayShingles([1, 2, 3, 4], 3) AS sh,"
        " hasSubstr([1, 2, 3, 4], [2, 3]) AS hs,"
        " hasSubstr([1, 2, 3, 4], [2, 4]) AS hs2,"
        " YYYYMMDDToDate(20230911) AS yd,"
        " YYYYMMDDToDate(20240230) AS ydbad,"
        " YYYYMMDDhhmmssToDateTime(20230911131415) AS ydt,"
        " makeDate32(2024, 3, 15) AS md,"
        " addTupleOfIntervals(toDate('2018-01-01'),"
        "   (INTERVAL 1 DAY, INTERVAL 1 MONTH, INTERVAL 1 YEAR)) AS ati,"
        " URLPathHierarchy('https://example.com/browse/CONV-6788') AS uph",
    )
    assert [list(s) for s in row.sh] == [[1, 2, 3], [2, 3, 4]]  # CH docs
    assert (row.hs, row.hs2) == (1, 0)
    assert str(row.yd) == "2023-09-11"  # CH docs example
    assert str(row.ydbad) == "1970-01-01"  # zero date on invalid
    assert str(row.ydt) == "2023-09-11 13:14:15"
    assert str(row.md) == "2024-03-15"
    assert str(row.ati) == "2019-02-02"  # CH docs example
    assert list(row.uph) == ["/browse/", "/browse/CONV-6788"]  # CH docs


def test_round10_wave4_guided():
    for sql, frag in [
        ("SELECT isConstant(x) FROM t", "planner"),
        ("SELECT addTupleOfIntervals(d, ivs) FROM t", "literal"),
        ("SELECT displayName() FROM t", "server-instance"),
    ]:
        with pytest.raises(DialectError, match=frag):
            translate(sql)


def test_ornull_ordefault_chains(spark):
    """Round-10 generic -OrNull/-OrDefault (+ -If chains, both stack
    spellings): NULL only when zero rows reach the aggregate (the
    r7-pinned countOrNull contract); -OrDefault fills the numeric 0."""
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW _onc AS"
        " SELECT id AS x, CAST(id AS DOUBLE) AS v, id % 3 AS k"
        " FROM range(10)"
    )
    row = one(
        spark,
        "SELECT uniqExactOrNull(k) AS a,"
        " uniqExactOrNullIf(k, k > 99) AS b,"
        " uniqExactOrNull(CASE WHEN k = 9 THEN k END) AS c,"
        " sumOrNullIf(v, k = 1) AS d,"
        " sumIfOrNull(v, k = 9) AS e,"
        " maxOrDefaultIf(v, k > 99) AS f,"
        " medianOrNull(v) AS g"
        " FROM _onc",
    )
    assert row.a == 3
    assert row.b is None  # zero matching rows → NULL
    assert row.c == 0  # rows present, values all NULL → count-like 0
    assert row.d == 12.0
    assert row.e is None
    assert row.f == 0.0  # OrDefault fills the numeric type default
    assert row.g == 4.5


def test_grouparray_resample(spark):
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW _gar AS"
        " SELECT id AS x, id % 3 AS k FROM range(10)"
    )
    row = one(
        spark,
        "SELECT transform(groupArrayResample(0, 10, 5)(x, x),"
        "   a -> array_sort(a)) AS ga,"
        " transform(groupUniqArrayResample(0, 10, 5)(k, x),"
        "   a -> array_sort(a)) AS gu"
        " FROM _gar",
    )
    assert [list(a) for a in row.ga] == [[0, 1, 2, 3, 4], [5, 6, 7, 8, 9]]
    assert [list(a) for a in row.gu] == [[0, 1, 2], [0, 1, 2]]
    for bad in ["initializeAggregation('sumState', 1)",
                "finalizeAggregation(s)", "joinGet('t', 'c', x)"]:
        with pytest.raises(DialectError):
            translate(f"SELECT {bad} FROM t")


def test_polygon_perimeter_spherical(spark):
    # a 4-degree meridian segment out and back: perimeter = 2 * 4 deg in
    # radians (the parallel edges are zero-length in this degenerate ring)
    import math as _m

    row = one(
        spark,
        "SELECT round(polygonPerimeterSpherical([[(0., 0.), (0., 4.)]]), 10)"
        "   AS p,"
        " round(polygonPerimeterSpherical([[(0., 0.), (0., 4.), (4., 4.),"
        "   (4., 0.)]]), 6) AS sq",
    )
    assert row.p == round(2 * _m.radians(4.0), 10)
    # square: two meridian edges of 4 deg + two parallel-ish great-circle
    # chords — bounded by the planar estimate
    assert 0.27 < row.sq < 0.29
    # polygonAreaSpherical translates since round 11 (exact spherical
    # excess — analytic pins in tests/test_r11_wave.py), as do the
    # readWKT* readers (tests/test_r11_wave2.py); the type-dependent
    # inverse wkt() stays guided
    assert "atan2" in translate("SELECT polygonAreaSpherical(p) FROM t")
    assert "regexp_extract_all" in translate("SELECT readWKTPolygon(s) FROM t")
    with pytest.raises(DialectError, match="geometry type"):
        translate("SELECT wkt(p) FROM t")


def test_map_distinct_combinators(spark):
    """Round-10 -Map combinator over more bases + -Distinct/RESPECT NULLS
    spellings."""
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW _mdc AS"
        " SELECT id AS x, CAST(id AS DOUBLE) AS v, id % 3 AS k,"
        " map(CAST(id % 2 AS STRING), id) AS m FROM range(6)"
    )
    row = one(
        spark,
        "SELECT avgMap(m) AS am, countMap(m) AS cm,"
        " uniqExactMap([k], [x]) AS um,"
        " countDistinct(k) AS cd, maxDistinct(v) AS md,"
        " arrayStringConcat(arrayMap(q -> toString(q),"
        "   arraySort(groupArrayDistinct(k))), ',') AS gd"
        " FROM _mdc",
    )
    assert dict(row.am) == {"0": 2.0, "1": 3.0}
    assert dict(row.cm) == {"0": 3, "1": 3}
    assert (list(row.um._1), list(row.um._2)) == ([0, 1, 2], [2, 2, 2])
    assert row.cd == 3
    assert row.md == 5.0
    assert row.gd == "0,1,2"


def test_round10_datetime_wave(spark):
    row = one(
        spark,
        "SELECT changeYear(toDate('2024-02-29'), 2023) AS cy,"
        " changeMonth(toDate('2024-03-31'), 2) AS cm,"
        " changeHour(toDateTime('2024-03-15 10:20:30'), 5) AS ch,"
        " timeZoneOffset(toDateTime('2024-03-15 10:00:00')) AS tz,"
        " toModifiedJulianDayOrNull('junk') AS mj,"
        " fromModifiedJulianDayOrNull(60384) AS fj,"
        " toRelativeSecondNum(toDateTime('1970-01-01 00:01:00')) AS rs,"
        " snowflakeIDToDateTime64(7204436857747984384) AS sf,"
        " toStartOfInterval(toDateTime('2024-03-15 10:20:30'),"
        "   INTERVAL 10 MINUTE, toDateTime('2024-03-15 10:03:00')) AS si,"
        " extractKeyValuePairs('name:neymar, age:31 team:psg') AS kv",
    )
    assert str(row.cy) == "2023-02-28"  # day clamps to the target month
    assert str(row.cm) == "2024-02-29"
    assert str(row.ch) == "2024-03-15 05:20:30"
    assert row.tz == 0  # UTC session
    assert row.mj is None
    assert str(row.fj) == "2024-03-15"
    assert row.rs == 60
    # CH docs: snowflakeIDToDateTime(7204436857747984384) =
    # '2024-06-06 10:59:58' — the ID functions use epoch 0, NOT the
    # legacy Twitter epoch (round-10 fix)
    assert str(row.sf).startswith("2024-06-06 10:59:58")
    # origin-anchored buckets: :03, :13, :23 … (was silently epoch-aligned)
    assert str(row.si) == "2024-03-15 10:13:00"
    assert dict(row.kv) == {"name": "neymar", "age": "31", "team": "psg"}


def test_array_ornull_accessors(spark):
    row = one(
        spark,
        "SELECT arrayElementOrNull([1, 2], 10) AS a,"
        " arrayFirstOrNull(x -> x > 5, [1, 2, 3]) AS b,"
        " arrayLastOrNull(x -> x > 1, [1, 2, 3]) AS c,"
        " arraySort(arrayUnion([1, 2], [2, 3])) AS d",
    )
    assert row.a is None and row.b is None
    assert row.c == 3
    assert list(row.d) == [1, 2, 3]


def test_tumble_hop_and_ip_variants(spark):
    row = one(
        spark,
        "SELECT tumble(toDateTime('2024-01-01 10:24:30'),"
        "   INTERVAL 10 MINUTE) AS t,"
        " tumbleEnd(toDateTime('2024-01-01 10:24:30'),"
        "   INTERVAL 10 MINUTE) AS te,"
        " hopStart(toDateTime('2024-01-01 10:24:30'),"
        "   INTERVAL 5 MINUTE, INTERVAL 10 MINUTE) AS hs,"
        " toIPv4OrDefault('junk') AS ip4d,"
        " IPv4StringToNumOrNull('junk') AS ip4n,"
        " hex(IPv6StringToNumOrDefault('junk')) AS ip6d",
    )
    assert str(row.t._1) == "2024-01-01 10:20:00"
    assert str(row.te) == "2024-01-01 10:30:00"
    # the FIRST hopping window containing 10:24:30 (hop 5m, window 10m)
    assert str(row.hs) == "2024-01-01 10:15:00"
    assert row.ip4d == 0 and row.ip4n is None
    assert row.ip6d == "00000000000000000000000000000000"


def test_final_tail(spark):
    row = one(
        spark,
        "SELECT parseTimeDelta('1 hour 30 minutes') AS pt,"
        " parseTimeDelta('2d 3h 4ms') AS pt2,"
        " toUUIDOrNull('junk') AS un,"
        " toUUIDOrNull('61f0c404-5CB3-11e7-907b-a6006ad3dba0') AS uv,"
        " toUUIDOrZero('x') AS uz,"
        " CAST(UUIDv7ToDateTime('0190ad27-3c9f-7000-8000-000000000000')"
        "   AS STRING) AS u7,"
        " visibleWidth('abc') AS vw",
    )
    assert row.pt == 5400.0
    assert row.pt2 == 183600.004
    assert row.un is None
    assert row.uv == "61f0c404-5cb3-11e7-907b-a6006ad3dba0"
    assert row.uz == "00000000-0000-0000-0000-000000000000"
    # RFC 9562: the first 48 bits of a v7 UUID are unix milliseconds
    assert row.u7 == "2024-07-13 17:32:28.191"
    assert row.vw == 3
    for bad in ["formatQuery('x')", "revision()"]:
        with pytest.raises(DialectError, match="introspection"):
            translate(f"SELECT {bad}")


def test_trim_chars_and_search_tail(spark):
    """Round-10 fix: two-argument trimLeft/Right/Both — Spark's
    ltrim/rtrim take (trimStr, str), the reverse of CH's order; the plain
    rename silently trimmed the wrong string."""
    row = one(
        spark,
        "SELECT trimLeft('xxay', 'x') AS tl, trimRight('ayxx', 'x') AS tr,"
        " trimBoth('xaxy', 'x') AS tb, trimLeft('  a') AS tl1,"
        " multiSearchAllPositions('hello world', ['o', 'l', 'zz']) AS mp,"
        " multiSearchFirstIndex('hello', ['xx', 'll', 'he']) AS mf,"
        " splitByRegexp('[,;]', 'a,b;c') AS sr,"
        " alphaTokens('ab12cd') AS at",
    )
    assert (row.tl, row.tr, row.tb, row.tl1) == ("ay", "ay", "axy", "a")
    assert list(row.mp) == [5, 3, 0]
    assert row.mf == 3  # 'he' is the leftmost match (pos 1), needle #3
    assert list(row.sr) == ["a", "b", "c"]
    assert list(row.at) == ["ab", "cd"]


def test_namemap_audit_fixes(spark):
    """Round-10 NAME_MAP audit fixes: arrayCompact keeps non-consecutive
    duplicates, locate follows the CH >= 24.3 needle-first order (Spark's
    own locate), toWeek's default is CH mode 0 (week 0 before the first
    Sunday), and emptyArrayToSingle is guided (type default unknowable)."""
    row = one(
        spark,
        "SELECT arrayCompact([1, 1, 2, 1]) AS ac,"
        " locate('lo', 'hello world') AS lo,"
        " toWeek(toDate('2024-01-01')) AS w0,"
        " toWeek(toDate('2024-01-07')) AS w1,"
        " toWeek(toDate('2024-01-01'), 3) AS wiso",
    )
    assert list(row.ac) == [1, 2, 1]
    assert row.lo == 4
    assert (row.w0, row.w1, row.wiso) == (0, 1, 1)
    with pytest.raises(DialectError, match="type"):
        translate("SELECT emptyArrayToSingle(x) FROM t")
