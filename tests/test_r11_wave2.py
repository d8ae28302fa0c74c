"""Round-11 wave 2: WKT readers (pure regex/split column expressions over
the OGC grammar), decodeXML/HTMLComponent (Arrow pandas_udfs), and the six
no-closed-form random distributions (numpy-backed, asNondeterministic).

The driver oracle (scalar_round11b) proves the WKT/decode values against
independent reconstruction; these tests pin edge cases and the random
DISTRIBUTIONS (moment accuracy — the values are rows-only by design)."""

from __future__ import annotations

import math

import pytest

from mcp_clickhouse_spark.dialect import DialectError, translate
from mcp_clickhouse_spark.tools import run_select_query


def rows(spark, ch_sql):
    return run_select_query(spark, ch_sql, dialect="clickhouse")["rows"]


def test_wkt_point_and_ring(spark):
    r = rows(
        spark,
        "SELECT readWKTPoint('POINT (30.5 -10)') AS p,"
        " readWKTRing('POLYGON ((1 1, 2 2, 3 3, 1 1))') AS rg",
    )[0]
    assert (r[0]["_1"], r[0]["_2"]) == (30.5, -10.0)
    assert [(p["_1"], p["_2"]) for p in r[1]] == [
        (1.0, 1.0), (2.0, 2.0), (3.0, 3.0), (1.0, 1.0)]


def test_wkt_polygon_with_hole_feeds_geometry(spark):
    r = rows(
        spark,
        "SELECT round(polygonAreaCartesian(readWKTPolygon("
        "'POLYGON ((0 0, 10 0, 10 10, 0 10), (4 4, 5 4, 5 5, 4 5))')), 6)"
        " AS a,"
        # pointInPolygon takes RING arguments (arrays of points), so the
        # WKT composition goes through readWKTRing
        " pointInPolygon((1., 1.), readWKTRing("
        "'POLYGON ((0 0, 10 0, 10 10, 0 10))')) AS pin",
    )[0]
    assert r[0] == 99.0
    assert r[1] == 1


def test_wkt_multipolygon_structure(spark):
    r = rows(
        spark,
        "SELECT readWKTMultiPolygon('MULTIPOLYGON"
        " (((0 0, 1 0, 1 1, 0 1), (2 2, 3 3, 4 4)), ((9 9, 8 8, 7 7)))')"
        " AS m",
    )[0][0]
    assert len(m := r) == 2
    assert len(m[0]) == 2 and len(m[1]) == 1
    assert (m[1][0][0]["_1"], m[1][0][0]["_2"]) == (9.0, 9.0)


def test_wkt_render_stays_guided():
    with pytest.raises(DialectError, match="geometry type"):
        translate("SELECT wkt(p) FROM t")


def test_decode_xml_component(spark):
    r = rows(
        spark,
        "SELECT decodeXMLComponent("
        "'&lt;&gt;&amp;&quot;&apos; &#65;&#x42;&#x1F600; &unknown; &#;')"
        " AS x",
    )[0][0]
    assert r == "<>&\"' AB\U0001F600 &unknown; &#;"


def test_decode_html_component(spark):
    r = rows(
        spark,
        "SELECT decodeHTMLComponent('&copy;&hbar;&nbsp;&#70;&CounterClockwiseContourIntegral;') AS h",
    )[0][0]
    assert r == "©ℏ F∳"


def test_rand_distribution_moments(spark):
    """Moment-accuracy pins over 20k samples each: mean within 5 sigma of
    the distribution's standard error — flaky odds ~1e-6 per arm."""
    n = 20_000
    # nondeterministic exprs cannot sit INSIDE an aggregate (Spark's own
    # rand() restriction) — materialize the samples in a subquery first
    r = rows(
        spark,
        f"SELECT avg(p) AS pois, avg(b) AS binom, avg(nb) AS nbinom,"
        f" avg(c) AS chisq, avg(t) AS tdist, avg(f) AS fdist,"
        f" stddevSamp(CAST(p AS Float64)) AS pois_sd"
        f" FROM (SELECT randPoisson(10) AS p, randBinomial(40, 0.25) AS b,"
        f" randNegativeBinomial(5, 0.5) AS nb, randChiSquared(7) AS c,"
        f" randStudentT(9) AS t, randFisherF(8, 10) AS f"
        f" FROM numbers({n}))",
    )[0]
    se = lambda sd: 5 * sd / math.sqrt(n)
    assert r[0] == pytest.approx(10.0, abs=se(math.sqrt(10)))
    assert r[1] == pytest.approx(10.0, abs=se(math.sqrt(40 * 0.25 * 0.75)))
    # negative_binomial mean = r(1-p)/p = 5*0.5/0.5 = 5
    assert r[2] == pytest.approx(5.0, abs=se(math.sqrt(10)))
    assert r[3] == pytest.approx(7.0, abs=se(math.sqrt(14)))
    assert r[4] == pytest.approx(0.0, abs=se(math.sqrt(9 / 7)))
    # F(8,10) mean = 10/8 = 1.25
    assert r[5] == pytest.approx(1.25, abs=se(2.0))
    assert r[6] == pytest.approx(math.sqrt(10), rel=0.1)


def test_rand_udfs_are_nondeterministic(spark):
    # two references to the same call must NOT collapse to one sample:
    # over 200 rows at least one pair must differ
    r = rows(
        spark,
        "SELECT count(IF(a != b, 1, NULL)) AS diffs FROM"
        " (SELECT randChiSquared(3) AS a, randChiSquared(3) AS b"
        "  FROM numbers(200))",
    )[0][0]
    assert r > 0


def test_unix_timestamp64_second_roundtrip(spark):
    r = rows(
        spark,
        "SELECT toUnixTimestamp64Second(toDateTime('2024-01-02 03:04:05'))"
        "   AS s,"
        " toUnixTimestamp64Second(fromUnixTimestamp64Second(1704164645))"
        "   AS rt",
    )[0]
    assert r[0] == 1704164645 and r[1] == 1704164645


def test_auc_variants_guided():
    for sql, frag in [
        ("SELECT arrayAUCPR(p, l) FROM t", "arrayROCAUC"),
        ("SELECT arrayNormalizedGini(p, l) FROM t", "arrayROCAUC"),
    ]:
        with pytest.raises(DialectError, match=frag):
            translate(sql)


def test_cut_url_parameter(spark):
    # the CH docs example URL, plus mid/trailing/only/missing positions
    r = rows(
        spark,
        "SELECT cutURLParameter('http://bigmir.net/?a=b&c=d', 'a') AS u1,"
        " cutURLParameter('http://bigmir.net/?a=b&c=d', 'c') AS u2,"
        " cutURLParameter('http://bigmir.net/?a=b&c=d#frag', 'c') AS u3,"
        " cutURLParameter('http://x/?only=1', 'only') AS u4,"
        " cutURLParameter('http://x/?a=b', 'zzz') AS u5",
    )[0]
    assert list(r) == [
        "http://bigmir.net/?c=d", "http://bigmir.net/?a=b",
        "http://bigmir.net/?a=b#frag", "http://x/", "http://x/?a=b",
    ]
    with pytest.raises(DialectError, match="string literal"):
        translate("SELECT cutURLParameter(u, name_col) FROM t")


def test_totime_fixed_date_and_utf8_multisearch(spark):
    r = rows(
        spark,
        "SELECT toTimeWithFixedDate(toDateTime('2024-05-06 07:08:09')) AS t,"
        " multiSearchAnyUTF8('строение', ['оен', 'zzz']) AS m,"
        " multiSearchAnyCaseInsensitiveUTF8('СТРОЕНИЕ', ['оен']) AS mc,"
        " uniqExactDistinct(1) AS ue",
    )[0]
    assert str(r[0]) == "1970-01-02 07:08:09"
    assert (r[1], r[2], r[3]) == (True, True, 1)


def test_round_is_bankers_like_clickhouse(spark):
    """CH's plain round() on floats is banker's (docs: round(2.5)=2,
    round(3.5)=4, round(-2.5)=-2, round(314.15,-2)=300); Spark's round
    is HALF_UP — a silent tie divergence until the round-11 audit."""
    r = rows(
        spark,
        "SELECT round(2.5) AS a, round(3.5) AS b, round(-2.5) AS c,"
        " round(314.15, -2) AS e, roundBankers(2.5) AS f",
    )[0]
    assert [float(v) for v in r] == [2.0, 4.0, -2.0, 300.0, 2.0]


def test_intdiv_is_exact_past_double_precision(spark):
    """The former divide-in-DOUBLE route returned 1537228672809129216 for
    intDiv(2^62, 3) — 85 low.  The DECIMAL(38,18) route is exact for
    every int64 pair and still accepts CH's float form."""
    r = rows(
        spark,
        "SELECT intDiv(4611686018427387904, 3) AS big,"
        " intDivOrZero(9223372036854775807, 2) AS mx,"
        " intDiv(-7, 2) AS neg, intDiv(1, 0.001) AS f",
    )[0]
    assert list(r) == [1537228672809129301, 4611686018427387903, -3, 1000]


def test_lp_distance_norm_and_ornull_arithmetic(spark):
    r = rows(
        spark,
        "SELECT round(LpDistance([1., 2.], [2., 4.], 3), 10) AS lp,"
        " round(LpNorm([3., 4.], 2), 10) AS n2,"
        " divideOrNull(6, 0) AS dz, divideOrNull(6, 3) AS d,"
        " moduloOrNull(7, 0) AS mz, moduloOrNull(7, 3) AS m",
    )[0]
    assert r[0] == round(9 ** (1 / 3), 10)  # (|1-2|^3 + |2-4|^3)^(1/3)
    assert r[1] == 5.0
    assert (r[2], r[3], r[4], r[5]) == (None, 2.0, None, 1)
    with pytest.raises(DialectError, match="tuple arity"):
        translate("SELECT vectorSum(a, b) FROM t")


def test_json_merge_patch_rfc7386(spark):
    r = rows(
        spark,
        """SELECT jsonMergePatch('{"a":1,"b":{"c":2}}',"""
        """ '{"b":{"c":null,"d":3}}', '{"e":[1]}') AS m,"""
        """ jsonMergePatch('{"a":[1,2]}', '{"a":[3]}') AS arr""",
    )[0]
    # null DELETES b.c; objects merge recursively; arrays replace whole
    assert r[0] == '{"a":1,"b":{"d":3},"e":[1]}'
    assert r[1] == '{"a":[3]}'


def test_joda_utc_and_jaccard_utf8(spark):
    r = rows(
        spark,
        "SELECT fromUnixTimestampInJodaSyntax(1704164645,"
        "   'yyyy-MM-dd HH:mm:ss') AS jd,"
        " toUTCTimestamp(toDateTime('2024-01-02 03:04:05'),"
        "   'America/New_York') AS ut,"
        " fromUTCTimestamp(toDateTime('2024-01-02 08:04:05'),"
        "   'America/New_York') AS ft,"
        " stringJaccardIndexUTF8('clickhouse', 'mouse') AS j,"
        " timestamp('2024-01-02 03:04:05') AS ts",
    )[0]
    assert r[0] == "2024-01-02 03:04:05"
    assert str(r[1]) == "2024-01-02 08:04:05"
    assert str(r[2]) == "2024-01-02 03:04:05"
    assert r[3] == 0.4
    assert str(r[4]) == "2024-01-02 03:04:05"
    with pytest.raises(DialectError, match="INTERVAL"):
        translate("SELECT timestamp(d, t) FROM x")
    # sqid was a guided error through round 12; round 13 implements it
    # (spec vectors in test_r13_fixes.py) — the translation must emit the
    # pandas_udf call, not raise
    assert "ch_sqid_encode" in translate("SELECT sqid(1, 2) FROM x")


def test_point_in_ellipses_and_www_subdomain(spark):
    r = rows(
        spark,
        "SELECT pointInEllipses(6., 2., 0., 0., 5., 5., 10., 0., 5., 5.)"
        "   AS hit,"
        " pointInEllipses(20., 20., 0., 0., 5., 5.) AS miss,"
        " pointInEllipses(10., 10., 10., 9.5, 1., 1.) AS docs_ex,"
        " cutToFirstSignificantSubdomainWithWWW("
        "   'http://www.clickhouse.com.tr/p') AS w,"
        " cutToFirstSignificantSubdomain("
        "   'http://www.clickhouse.com.tr/p') AS nw",
    )[0]
    assert list(r) == [1, 0, 1, "www.clickhouse.com.tr", "clickhouse.com.tr"]


def test_aes_encrypt_decrypt_roundtrip(spark):
    """encrypt/decrypt map onto Spark's aes_encrypt/aes_decrypt —
    OpenSSL-compatible PKCS#7 for ECB/CBC, so a round trip is exact and
    tryDecrypt yields NULL on a wrong key (the CH contract)."""
    r = rows(
        spark,
        "SELECT decrypt('aes-128-ecb',"
        "   encrypt('aes-128-ecb', 'secret text', '0123456789abcdef'),"
        "   '0123456789abcdef') AS rt,"
        " decrypt('aes-256-ecb',"
        "   encrypt('aes-256-ecb', 'longer key mode',"
        "     'kkkkkkkkkkkkkkkkkkkkkkkkkkkkkkkk'),"
        "   'kkkkkkkkkkkkkkkkkkkkkkkkkkkkkkkk') AS k256,"
        " tryDecrypt('aes-128-ecb',"
        "   encrypt('aes-128-ecb', 'x', '0123456789abcdef'),"
        "   'wrongkey.1234567') AS bad",
    )[0]
    assert r[0] == "secret text"
    assert r[1] == "longer key mode"
    assert r[2] is None
    for sql, frag in [
        ("SELECT encrypt('aes-128-gcm', s, k) FROM t", "frames the IV"),
        ("SELECT encrypt('aes-128-cbc', s, k, i) FROM t", "frames the IV"),
        ("SELECT encrypt(m, s, k) FROM t", "string literal"),
        ("SELECT aes_encrypt_mysql('aes-128-ecb', s, k) FROM t",
         "key-folding"),
    ]:
        with pytest.raises(DialectError, match=frag):
            translate(sql)


def test_position_start_pos_and_array_slice_to_end(spark):
    """round 11: position's 3-arg start_pos form crashed (3-arg instr),
    and arraySlice's 2-arg slice-to-end form crashed (Spark slice
    requires a length)."""
    r = rows(
        spark,
        "SELECT position('Hello, world!', 'o', 6) AS p3,"
        " position('Hello, world!', 'o') AS p2,"
        " arraySlice([1, 2, 3, 4, 5], -3) AS neg,"
        " arraySlice([1, 2, 3, 4, 5], 2) AS tail,"
        " arraySlice([1, 2, 3, 4, 5], 2, 3) AS mid",
    )[0]
    assert r[0] == 9 and r[1] == 5
    assert r[2] == [3, 4, 5] and r[3] == [2, 3, 4, 5] and r[4] == [2, 3, 4]


def test_tostartofweek_mode0_is_sunday(spark):
    """CH toStartOfWeek default mode 0 starts weeks on SUNDAY (the r10
    toWeek audit's mode-0 default, now fixed here too — date_trunc WEEK
    was silently one day late six days out of seven)."""
    r = rows(
        spark,
        "SELECT toStartOfWeek(toDate('2024-01-03')) AS sun,"
        " toStartOfWeek(toDate('2024-01-03'), 1) AS mon,"
        " toStartOfWeek(toDate('2023-12-31')) AS on_sun",
    )[0]
    assert [str(v) for v in r] == ["2023-12-31", "2024-01-01", "2023-12-31"]


def test_json_extract_multikey_and_index_paths(spark):
    """JSONExtract*(json, k1, k2, …) chains keys/1-based indices into one
    JSONPath — extra path arguments were silently DROPPED before."""
    r = rows(
        spark,
        """SELECT JSONExtractInt('{"a": {"b": 5}}', 'a', 'b') AS nest,"""
        """ JSONExtractString('["x","y"]', 2) AS idx,"""
        """ JSONExtractString('{"a": [{"c": "deep"}]}', 'a', 1, 'c')"""
        """   AS chain,"""
        """ JSONExtractString('{"a": "v"}', 'a') AS plain""",
    )[0]
    assert list(r) == [5, "y", "deep", "v"]


def test_datediff_counts_boundary_crossings(spark):
    """CH dateDiff counts UNIT-BOUNDARY crossings (month: Jan 31 -> Feb 1
    is 1), not complete spans like Spark's timestampdiff (same call: 0).
    Weeks roll on MONDAY (toRelativeWeekNum = toDayNum(d + 8 -
    toDayOfWeek(d)) / 7 with Monday=1, algebraically (days + 3) div 7 —
    round-13 advisor fix; the old (days + 4) div 7 rolled on Sunday and
    was off by one whenever exactly one endpoint fell on a Sunday)."""
    r = rows(
        spark,
        "SELECT dateDiff('month', toDate('2023-01-31'),"
        "   toDate('2023-02-01')) AS m1,"
        " dateDiff('month', toDate('2023-01-01'), toDate('2023-01-31'))"
        "   AS m0,"
        " dateDiff('week', toDate('2024-01-06'), toDate('2024-01-07'))"
        "   AS w0,"  # Sat -> Sun stays inside the Monday-rolled week
        " dateDiff('week', toDate('2024-01-07'), toDate('2024-01-08'))"
        "   AS w1,"  # Sun -> Mon crosses the Monday boundary
        " dateDiff('year', toDate('2023-12-31'), toDate('2024-01-01'))"
        "   AS y1,"
        " dateDiff('hour', toDateTime('2024-01-01 02:59:00'),"
        "   toDateTime('2024-01-01 03:01:00')) AS h1,"
        " dateDiff('hour', toDateTime('2024-01-01 02:01:00'),"
        "   toDateTime('2024-01-01 02:59:00')) AS h0,"
        " dateDiff('quarter', toDate('2024-03-31'), toDate('2024-04-01'))"
        "   AS q1,"
        " dateDiff('day', toDate('2024-01-01'), toDate('2024-01-05'))"
        "   AS d4,"
        " dateDiff('minute', toDateTime('2024-01-01 00:00:59'),"
        "   toDateTime('2024-01-01 00:01:01')) AS mi1",
    )[0]
    assert list(r) == [1, 0, 0, 1, 1, 1, 0, 1, 4, 1]


def test_range_step_and_tomonday_date_type(spark):
    r = rows(
        spark,
        "SELECT range(1, 7, 2) AS rg, range(4) AS r4,"
        " toMonday(toDate('2024-01-03')) AS mon",
    )[0]
    assert r[0] == [1, 3, 5] and r[1] == [0, 1, 2, 3]
    assert str(r[2]) == "2024-01-01"
