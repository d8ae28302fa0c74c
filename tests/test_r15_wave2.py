"""Round-15 probe-wave closures + randomized value audits against
independent pure-Python reconstructions (never the dialect's own
expressions): bitmap function VALUES via set algebra, toStartOfInterval
3-arg ORIGIN anchoring via integer arithmetic, the 2-argument
dateAdd/timestampAdd INTERVAL signature, the to<T>OrDefault family, the
toIPv4/6OrZero spellings, groupBitmapAnd/Or/Xor, and URLHash's
trailing-symbol normalization (stability-only values).
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone

import pytest

from mcp_clickhouse_spark.dialect import DialectError, translate


def _val(spark, ch_sql):
    from mcp_clickhouse_spark.functions import register_lazy_udfs

    out = translate(ch_sql)
    register_lazy_udfs(spark, out)
    row = spark.sql(out).collect()
    return row[0][0] if row else None


class TestDateAdd2Arg:
    """dateAdd/dateSub/timestampAdd/timestampSub alternative signature
    (date, INTERVAL n unit) — CH docs §date-time-functions#date_add.
    Round 15: these emitted date_add(date, INTERVAL), a Spark type
    error."""

    def test_timestamp_add_month_clamps(self, spark):
        v = _val(spark, "SELECT timestampAdd(toDate('2022-01-31'), INTERVAL 1 MONTH)")
        assert str(v) == "2022-02-28"

    def test_timestamp_sub_alias_forms(self, spark):
        for fn in ("timestampSub", "timestamp_sub", "dateSub", "date_sub"):
            v = _val(spark, f"SELECT {fn}(toDate('2022-03-31'), INTERVAL 1 MONTH)")
            assert str(v) == "2022-02-28", fn

    def test_date_add_year(self, spark):
        v = _val(spark, "SELECT dateAdd(toDate('2022-01-01'), INTERVAL 2 YEAR)")
        assert str(v) == "2024-01-01"

    def test_three_arg_form_still_works(self, spark):
        v = _val(spark, "SELECT dateAdd(MONTH, 1, toDate('2022-01-31'))")
        assert str(v).startswith("2022-02-28")
        v = _val(spark, "SELECT timestampAdd('day', 3, toDate('2022-01-01'))")
        assert str(v).startswith("2022-01-04")


class TestOrDefaultFamily:
    """to<T>OrDefault(expr[, default]) — explicit default on conversion
    failure, the type's default (CH zero) when omitted.  Round 15: the
    whole family leaked UNRESOLVED_ROUTINE."""

    @pytest.mark.parametrize(
        "q,expected",
        [
            ("SELECT toInt32OrDefault('x', 7)", 7),
            ("SELECT toInt32OrDefault('5', 7)", 5),
            ("SELECT toInt64OrDefault('nope')", 0),
            ("SELECT toFloat64OrDefault('x', 1.5)", 1.5),
            ("SELECT toUInt32OrDefault('x')", 0),
        ],
    )
    def test_numeric(self, spark, q, expected):
        assert _val(spark, q) == expected

    def test_date_and_datetime(self, spark):
        assert str(_val(spark, "SELECT toDateOrDefault('x', toDate('2020-01-02'))")) == "2020-01-02"
        assert str(_val(spark, "SELECT toDateOrDefault('x')")) == "1970-01-01"
        assert str(_val(spark, "SELECT toDateTimeOrDefault('x')")) == "1970-01-01 00:00:00"
        assert str(_val(spark, "SELECT toDate32OrDefault('x')")) == "1970-01-01"

    def test_uuid(self, spark):
        u = "61f0c404-5cb3-11e7-907b-a6006ad3dba0"
        assert _val(spark, f"SELECT toUUIDOrDefault('x', '{u}')") == u
        assert _val(spark, "SELECT toUUIDOrDefault('x')") == "00000000-0000-0000-0000-000000000000"

    def test_ipv4_ipv6_orzero_and_default(self, spark):
        # this engine's IPv4 representation is the numeric form
        assert _val(spark, "SELECT toIPv4OrZero('bad')") == 0
        assert _val(spark, "SELECT toIPv4OrZero('1.2.3.4')") == 16909060
        assert _val(spark, "SELECT toIPv6OrZero('bad')") == b"\x00" * 16
        # round 15: a user-supplied default was silently DROPPED before
        assert _val(spark, "SELECT toIPv4OrDefault('bad', toIPv4('8.8.8.8'))") == 134744072
        assert _val(spark, "SELECT ipv4StringToNumOrDefault('bad', 42)") == 42


class TestURLHash:
    """URLHash(url): ONE trailing /, ? or # is trimmed before hashing
    (CH docs §url-functions#urlhash) — STABILITY-ONLY values (the
    upstream hash's constants aren't published; see dialect docstring)."""

    def test_trailing_slash_equivalence(self, spark):
        a = _val(spark, "SELECT URLHash('https://a.com/p/')")
        b = _val(spark, "SELECT URLHash('https://a.com/p')")
        c = _val(spark, "SELECT URLHash('https://a.com/q')")
        assert a == b and a != c

    def test_two_arg_guided(self):
        with pytest.raises(DialectError, match="URLHash"):
            translate("SELECT URLHash('https://a.com/p', 2)")


class TestBitmapRandomized:
    """Randomized bitmap VALUE audit vs Python set algebra (verdict r14
    item 5: the bitmap family had name-level coverage but no randomized
    value sweep)."""

    def _mk(self, rng):
        n = rng.randint(0, 8)
        return sorted(rng.sample(range(0, 20), n))

    def test_binary_ops(self, spark):
        rng = random.Random(1515)
        rows = []
        for i in range(60):
            a, b = self._mk(rng), self._mk(rng)
            rows.append((i, a, b))
        spark.createDataFrame(
            rows, "i int, a array<int>, b array<int>"
        ).createOrReplaceTempView("t_bm")
        q = translate("""
            SELECT i,
              arraySort(bitmapToArray(bitmapAnd(bitmapBuild(a), bitmapBuild(b)))) AS an,
              arraySort(bitmapToArray(bitmapOr(bitmapBuild(a), bitmapBuild(b)))) AS orr,
              arraySort(bitmapToArray(bitmapXor(bitmapBuild(a), bitmapBuild(b)))) AS xo,
              arraySort(bitmapToArray(bitmapAndnot(bitmapBuild(a), bitmapBuild(b)))) AS anot,
              bitmapCardinality(bitmapBuild(a)) AS card,
              toInt64(bitmapContains(bitmapBuild(a), 5)) AS cont,
              toInt64(bitmapHasAny(bitmapBuild(a), bitmapBuild(b))) AS hany,
              toInt64(bitmapHasAll(bitmapBuild(a), bitmapBuild(b))) AS hall
            FROM t_bm
        """)
        got = {r["i"]: r for r in spark.sql(q).collect()}
        for i, a, b in rows:
            sa, sb = set(a), set(b)
            r = got[i]
            assert sorted(r["an"]) == sorted(sa & sb), (a, b)
            assert sorted(r["orr"]) == sorted(sa | sb)
            assert sorted(r["xo"]) == sorted(sa ^ sb)
            assert sorted(r["anot"]) == sorted(sa - sb)
            assert r["card"] == len(sa)
            assert r["cont"] == int(5 in sa)
            assert r["hany"] == int(bool(sa & sb))
            # CH: bitmapHasAll with an EMPTY second bitmap returns 1
            assert r["hall"] == int(sb <= sa)

    def test_subset_ops(self, spark):
        rng = random.Random(2626)
        rows = []
        for i in range(40):
            a = self._mk(rng)
            lo = rng.randint(0, 15)
            hi = lo + rng.randint(0, 10)
            lim = rng.randint(0, 5)
            off = rng.randint(0, 6)
            rows.append((i, a, lo, hi, lim, off))
        spark.createDataFrame(
            rows, "i int, a array<int>, lo int, hi int, lim int, off int"
        ).createOrReplaceTempView("t_bs")
        q = translate("""
            SELECT i,
              arraySort(bitmapToArray(bitmapSubsetInRange(bitmapBuild(a), lo, hi))) AS rng,
              arraySort(bitmapToArray(bitmapSubsetLimit(bitmapBuild(a), lo, lim))) AS sl,
              arraySort(bitmapToArray(subBitmap(bitmapBuild(a), off, lim))) AS sb
            FROM t_bs
        """)
        got = {r["i"]: r for r in spark.sql(q).collect()}
        for i, a, lo, hi, lim, off in rows:
            s = sorted(set(a))
            r = got[i]
            # subsetInRange: [lo, hi)
            assert r["rng"] == [x for x in s if lo <= x < hi], (a, lo, hi)
            # subsetLimit: smallest `lim` values >= lo
            assert r["sl"] == [x for x in s if x >= lo][:lim], (a, lo, lim)
            # subBitmap: `lim` values from 0-based position `off`
            assert r["sb"] == s[off : off + lim], (a, off, lim)

    def test_transform_and_minmax(self, spark):
        rng = random.Random(3737)
        rows = [(i, self._mk(rng)) for i in range(30)]
        spark.createDataFrame(rows, "i int, a array<int>").createOrReplaceTempView("t_bt")
        q = translate("""
            SELECT i,
              arraySort(bitmapToArray(
                bitmapTransform(bitmapBuild(a), [3, 5, 7], [103, 105, 107]))) AS tr,
              bitmapMin(bitmapBuild(a)) AS mn,
              bitmapMax(bitmapBuild(a)) AS mx
            FROM t_bt
        """)
        got = {r["i"]: r for r in spark.sql(q).collect()}
        mapping = {3: 103, 5: 105, 7: 107}
        for i, a in rows:
            s = set(a)
            r = got[i]
            assert sorted(r["tr"]) == sorted({mapping.get(x, x) for x in s}), a
            if s:
                assert r["mn"] == min(s) and r["mx"] == max(s)

    def test_group_bitmap_aggregates(self, spark):
        rng = random.Random(4848)
        rows = []
        expect = {}
        for g in range(8):
            arrs = [self._mk(rng) or [0] for _ in range(rng.randint(1, 5))]
            for a in arrs:
                rows.append((g, a))
            sets = [set(a) for a in arrs]
            and_ = set.intersection(*sets)
            or_ = set.union(*sets)
            xor = set()
            for s in sets:
                xor ^= s
            expect[g] = (len(and_), len(or_), len(xor))
        spark.createDataFrame(rows, "g int, b array<int>").createOrReplaceTempView("t_gb")
        q = translate("""
            SELECT g, toInt64(groupBitmapAnd(b)) AS a,
                   toInt64(groupBitmapOr(b)) AS o,
                   toInt64(groupBitmapXor(b)) AS x
            FROM t_gb GROUP BY g
        """)
        for r in spark.sql(q).collect():
            assert (r["a"], r["o"], r["x"]) == expect[r["g"]], r["g"]


class TestRangeDirection:
    """CH range() is EMPTY when the bounds don't advance in the step's
    direction, and the exclusive end follows the step's SIGN (round-15
    probe: range(5, 1) silently returned Spark's descending [5..0], and
    range(10, 1, -3) included the excluded end)."""

    @pytest.mark.parametrize(
        "q,expected",
        [
            ("SELECT range(5, 1)", []),
            ("SELECT range(5, 5)", []),
            ("SELECT range(0)", []),
            ("SELECT range(5)", [0, 1, 2, 3, 4]),
            ("SELECT range(1, 10, 3)", [1, 4, 7]),
            ("SELECT range(10, 1, -3)", [10, 7, 4]),
            ("SELECT range(10, 10, -3)", []),
            ("SELECT range(1, 10, -1)", []),
        ],
    )
    def test_vectors(self, spark, q, expected):
        assert _val(spark, q) == expected


class TestArraySliceNegativeLength:
    """CH arraySlice(arr, offset, -n) slices to the end DROPPING the
    last n elements; Spark's slice ANSI-threw INVALID_PARAMETER_VALUE."""

    @pytest.mark.parametrize(
        "q,expected",
        [
            ("SELECT arraySlice([1,2,3,4,5], 2, -1)", [2, 3, 4]),
            ("SELECT arraySlice([1,2,3,4,5], -3, -1)", [3, 4]),
            ("SELECT arraySlice([1,2,3,4,5], 2, -10)", []),
            ("SELECT arraySlice([1,2,3,4,5], 2, 2)", [2, 3]),
            ("SELECT arraySlice([1,2,3,4,5], -3)", [3, 4, 5]),
        ],
    )
    def test_vectors(self, spark, q, expected):
        assert _val(spark, q) == expected


class TestLogFamilyEdges:
    """CH log family follows IEEE at the domain edge — ln(0) = -inf,
    ln(x<0) = nan (log1p pivots at -1) — where Spark's Log returned
    NULL (round-15 probe, same class as divide-by-zero)."""

    @pytest.mark.parametrize("fn", ["log", "ln", "log2", "log10"])
    def test_zero_is_neg_inf(self, spark, fn):
        assert _val(spark, f"SELECT {fn}(0)") == float("-inf")

    @pytest.mark.parametrize("fn", ["log", "ln", "log2", "log10"])
    def test_negative_is_nan(self, spark, fn):
        v = _val(spark, f"SELECT {fn}(-1)")
        assert v != v

    def test_log1p_pivot(self, spark):
        assert _val(spark, "SELECT log1p(-1)") == float("-inf")
        v = _val(spark, "SELECT log1p(-2)")
        assert v != v
        assert _val(spark, "SELECT log1p(0)") == 0.0

    def test_values_and_null(self, spark):
        assert _val(spark, "SELECT round(log2(8), 4)") == 3.0
        assert _val(spark, "SELECT log(NULL)") is None


class TestArrayEdgeBatch:
    """Round-15 batch-B NULL/edge finds over the array family."""

    def test_array_avg_empty_is_nan(self, spark):
        # was an ANSI DIVIDE_BY_ZERO crash; CH: arrayAvg([]) = nan
        v = _val(spark, "SELECT arrayAvg(emptyArrayInt32())")
        assert v != v
        assert _val(spark, "SELECT arrayAvg([1, 2, 6])") == 3.0

    def test_array_exists_all_two_valued(self, spark):
        # CH returns UInt8 0/1 — NULL predicate results count as false
        assert _val(spark, "SELECT arrayExists(x -> x > 1, [NULL, 1])") is False
        assert _val(spark, "SELECT arrayAll(x -> x > 0, [NULL, 1])") is False
        assert _val(spark, "SELECT arrayAll(x -> x > 0, [1, 2])") is True
        # a NULL ARRAY input still propagates
        assert _val(
            spark, "SELECT arrayExists(x -> x > 1, CAST(NULL AS ARRAY<INT>))"
        ) is None

    def test_array_zip_strict_and_unaligned(self, spark):
        rows = _val(spark, "SELECT arrayZip([1,2], ['a','b'])")
        assert [tuple(r) for r in rows] == [(1, "a"), (2, "b")]
        # CH contract: length mismatch THROWS (arrays_zip NULL-padded)
        with pytest.raises(Exception, match="equal sizes"):
            _val(spark, "SELECT arrayZip([1,2], ['a'])")
        rows = _val(spark, "SELECT arrayZipUnaligned([1,2], ['a'])")
        assert [tuple(r) for r in rows] == [(1, "a"), (2, None)]
        # _N tuple convention: positional access works on zip results
        assert _val(spark, "SELECT (arrayZip([1,2], ['a','b'])[1]).2") == "a"

    def test_position_empty_needle_with_pos(self, spark):
        # CH docs examples table: position('abc','',0..5) = 1,1,2,3,4,0
        for pos, exp in [(0, 1), (1, 1), (3, 3), (6, 6), (7, 0)]:
            assert _val(spark, f"SELECT position('hello', '', {pos})") == exp

    def test_count_equal_null_as_value(self, spark):
        assert _val(spark, "SELECT countEqual([1, NULL, 1], NULL)") == 1
        assert _val(spark, "SELECT countEqual([1, NULL, 1], 1)") == 2


class TestIntCastWrapping:
    """CH integer conversions WRAP on overflow (docs §type-conversion:
    out-of-range "is not considered an error"; toInt8(128) = -128) —
    the old plain CASTs ANSI-threw for signed targets and silently KEPT
    out-of-range values for widened unsigned ones (toUInt8(300) → 300).
    accurateCast keeps throwing, which is CH's accurateCast contract."""

    @pytest.mark.parametrize(
        "q,expected",
        [
            ("SELECT toInt8(200)", -56),
            ("SELECT toInt8(128)", -128),
            ("SELECT toInt8(-129)", 127),
            ("SELECT toInt8(127)", 127),
            ("SELECT toInt8(8.8)", 8),
            ("SELECT toInt8(-8.8)", -8),
            ("SELECT toUInt8(300)", 44),
            ("SELECT toUInt16(-1)", 65535),
            ("SELECT toInt16(40000)", -25536),
            ("SELECT toInt32(5000000000)", 705032704),
            ("SELECT toInt32(9223372036854775807)", -1),
            ("SELECT toUInt32(-1)", 4294967295),
            ("SELECT toUInt64(-1)", 18446744073709551615),
            ("SELECT toUInt64(8.8)", 8),
            ("SELECT toInt32('42')", 42),
            ("SELECT toUInt8(true)", 1),
        ],
    )
    def test_vectors(self, spark, q, expected):
        assert int(_val(spark, q)) == expected

    def test_accurate_cast_still_throws(self, spark):
        with pytest.raises(Exception):
            _val(spark, "SELECT accurateCast(200, 'Int8')")


class TestMapAndRoundEdges:
    """Round-15 batch-D finds: roundToExp2 below 1 (CH docs: "If the
    number is less than one, it returns 0" — floor(log2) gave NULL),
    mapAll's NULL predicate leak (map_filter drops NULL lambdas, so
    all-NULL maps passed as 1; CH two-valued says 0), and
    mapContains(m, NULL) folding to false instead of an analysis
    error.  roundAge/roundDuration/roundDown probed CORRECT (roundAge
    (32) = 25 per CH's 0/17/18/25/35/45/55 buckets)."""

    @pytest.mark.parametrize(
        "q,expected",
        [
            ("SELECT roundToExp2(0)", 0),
            ("SELECT roundToExp2(0.5)", 0),
            ("SELECT roundToExp2(-4)", 0),
            ("SELECT roundToExp2(100)", 64),
            ("SELECT roundToExp2(1)", 1),
            ("SELECT roundAge(32)", 25),
            ("SELECT roundDuration(45)", 30),
            ("SELECT roundDown(0, [1, 3, 7])", 1),
            ("SELECT mapAll((k, v) -> v > 1, map('a', NULL))", 0),
            ("SELECT mapAll((k, v) -> v > 0, map('a', 1))", 1),
            ("SELECT mapExists((k, v) -> v > 1, map('a', NULL))", 0),
            ("SELECT mapContains(map('a', 1), NULL)", False),
            ("SELECT mapContains(map('a', 1), 'a')", True),
        ],
    )
    def test_vectors(self, spark, q, expected):
        assert _val(spark, q) == expected


class TestWave5Closures:
    """Round-15 batch E/F probe closures: toBFloat16 (RNE bit
    conversion, checked against an independent Python bit-twiddle),
    JSONExtractUInt's UInt64 wrap, sipHash128/Keyed (stability-only,
    BINARY(16)), and the guided walls for byteSlice / the weighted
    quantile spellings / yandexConsistentHash."""

    def test_bfloat16_vectors(self, spark):
        import struct as st

        def bf16(x):
            b = st.unpack("<I", st.pack("<f", x))[0]
            r = (b + 0x7FFF + ((b >> 16) & 1)) & 0xFFFFFFFF
            return st.unpack("<f", st.pack("<I", (r >> 16) << 16))[0]

        for v in [1.0, 3.14159, 1000003.0, -2.71828, 0.0, 65504.0]:
            assert _val(spark, f"SELECT toBFloat16({v!r})") == bf16(v), v
        assert _val(spark, "SELECT toBFloat16OrNull('x')") is None
        assert _val(spark, "SELECT toBFloat16OrZero('x')") == 0.0

    def test_json_extract_uint_wraps(self, spark):
        assert int(_val(spark, "SELECT JSONExtractUInt('{\"a\": -5}', 'a')")) \
            == 18446744073709551611
        assert int(_val(spark, "SELECT JSONExtractUInt('{\"a\": 7}', 'a')")) == 7
        assert int(_val(spark, "SELECT JSONExtractUInt('{\"a\": 7}', 'b')")) == 0

    def test_siphash_stability_shapes(self, spark):
        h = _val(spark, "SELECT sipHash128('abc')")
        assert isinstance(h, (bytes, bytearray)) and len(h) == 16
        assert h == _val(spark, "SELECT sipHash128('abc')")
        assert h != _val(spark, "SELECT sipHash128('abd')")
        a = _val(spark, "SELECT sipHash64Keyed((1, 2), 'abc')")
        b = _val(spark, "SELECT sipHash64Keyed((1, 3), 'abc')")
        assert a != b
        assert len(_val(spark, "SELECT sipHash128Keyed((1, 2), 'abc')")) == 16

    def test_guided_walls(self):
        for q, frag in [
            ("SELECT byteSlice(s, 1, 2) FROM t", "byte-level"),
            ("SELECT quantileTDigestWeighted(0.5)(x, w) FROM t", "weighted"),
            ("SELECT yandexConsistentHash(1, 2)", "kostikConsistentHash"),
            ("SELECT lowCardinalityKeys(x) FROM t", ""),
            ("SELECT JSONRemoveDynamoDBAnnotations(x) FROM t", "DynamoDB"),
        ]:
            with pytest.raises(DialectError, match=frag):
                translate(q)

    def test_summap_overflow_aliases(self, spark):
        spark.createDataFrame(
            [([1, 2], [10, 20]), ([1], [5])], "k array<int>, v array<int>"
        ).createOrReplaceTempView("t_smo")
        row = spark.sql(translate(
            "SELECT sumMapWithOverflow(k, v) AS m FROM t_smo"
        )).collect()[0]["m"]
        assert list(row["_1"]) == [1, 2] and list(row["_2"]) == [15, 20]


class TestFromUnixTimestamp:
    """fromUnixTimestamp (round 15): the NAME_MAP rename silently fed
    CH's %-token format to from_unixtime's JAVA patterns ('%Y-%m-%d'
    came back literally), and the 1-arg form returned a STRING where
    CH returns DateTime."""

    def test_one_arg_is_timestamp(self, spark):
        v = _val(spark, "SELECT fromUnixTimestamp(1712345678)")
        from datetime import datetime

        assert v == datetime(2024, 4, 5, 19, 34, 38)

    def test_two_arg_percent_tokens(self, spark):
        assert _val(
            spark, "SELECT fromUnixTimestamp(1712345678, '%Y-%m-%d')"
        ) == "2024-04-05"
        assert _val(
            spark, "SELECT fromUnixTimestamp(1712345678, '%H:%i:%S')"
        ) == "19:34:38"


class TestAccurateCastUnsignedAndDigitStrings:
    """Round-15 wave 9: the widened unsigned Spark types hid
    accurateCast's range check (accurateCastOrNull(300, 'UInt8')
    returned 300 through the SMALLINT try_cast; CH says NULL), and
    toDateTime of a digit STRING must parse as a unix timestamp
    (CH docs §type-conversion — to_timestamp ANSI-threw)."""

    @pytest.mark.parametrize(
        "q,expected",
        [
            ("SELECT accurateCastOrNull(300, 'UInt8')", None),
            ("SELECT accurateCastOrNull(200, 'UInt8')", 200),
            ("SELECT accurateCastOrNull(-1, 'UInt64')", None),
            ("SELECT accurateCastOrDefault(300, 'UInt8')", 0),
            ("SELECT accurateCastOrDefault(300, 'UInt8', 7)", 7),
            ("SELECT accurateCastOrNull(300, 'Int8')", None),
        ],
    )
    def test_unsigned_range_guard(self, spark, q, expected):
        assert _val(spark, q) == expected

    def test_accurate_cast_raises_out_of_range(self, spark):
        with pytest.raises(Exception, match="out of range"):
            _val(spark, "SELECT accurateCast(300, 'UInt8')")

    def test_todatetime_digit_strings(self, spark):
        from datetime import datetime

        exp = datetime(2024, 4, 5, 19, 34, 38)
        assert _val(spark, "SELECT toDateTime('1712345678')") == exp
        assert _val(spark, "SELECT toDateTime(1712345678)") == exp
        assert _val(
            spark, "SELECT toDateTime(x) FROM (SELECT '1712345678' AS x)"
        ) == exp
        assert _val(
            spark,
            "SELECT toDateTime(x) FROM (SELECT '2024-05-15 10:00:00' AS x)",
        ) == datetime(2024, 5, 15, 10, 0)


class TestToStartOfIntervalOrigin:
    """Randomized 3-arg ORIGIN audit: CH anchors buckets at origin —
    result = origin + floor((ts - origin) / width) * width, including
    timestamps BEFORE the origin (floor toward -inf)."""

    def test_randomized_origin(self, spark):
        rng = random.Random(5959)
        widths = [(1, "SECOND"), (5, "SECOND"), (90, "SECOND"),
                  (15, "MINUTE"), (1, "HOUR"), (7, "HOUR"), (1, "DAY"),
                  (3, "DAY")]
        base = datetime(2024, 1, 1, tzinfo=timezone.utc)
        secs = {"SECOND": 1, "MINUTE": 60, "HOUR": 3600, "DAY": 86400}
        for _ in range(25):
            n, unit = rng.choice(widths)
            w = n * secs[unit]
            ts = base + timedelta(seconds=rng.randint(-10**7, 10**7))
            org = base + timedelta(seconds=rng.randint(-10**6, 10**6))
            expected = org + timedelta(
                seconds=((ts - org).total_seconds() // w) * w
            )
            q = (
                f"SELECT toStartOfInterval(toDateTime('{ts:%Y-%m-%d %H:%M:%S}'),"
                f" INTERVAL {n} {unit},"
                f" toDateTime('{org:%Y-%m-%d %H:%M:%S}'))"
            )
            got = _val(spark, q)
            assert got == expected.replace(tzinfo=None), (q, got, expected)
