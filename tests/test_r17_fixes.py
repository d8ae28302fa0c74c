"""Round-17 advisor fixes (ADVICE.md r16) + the case-conversion policy.

Contract basis: the reference delegates SQL verbatim to ClickHouse
(/root/reference/mcp_clickhouse/mcp_server.py:425).

1. ``_bind_once`` must never splice a SUBQUERY into a transform()
   lambda body — Spark rejects subqueries inside higher-order
   functions (UNSUPPORTED_SUBQUERY_EXPRESSION_CATEGORY), so
   ``long_expr / (SELECT avg(x) FROM t)`` fell over after the r16
   anti-expansion change.  Such operands fall back to direct
   expansion (the exponential hazard only applies to macro nesting,
   which never produces subqueries).
2. ``JSONExtract(json, key, 'Int64')`` of a float value must truncate
   like ClickHouse (200.0 → 200), mirroring the array-element branch's
   try_cast-via-DOUBLE fallback, not return the 0 default.
3. ``JSON_VALUE``/``JSON_QUERY``/``JSON_EXISTS`` classify via the
   VARIANT round-trip so the original JSON value KIND survives:
   numeric-looking strings stay quoted in JSON_QUERY output and scalar
   strings starting with '[' / '{' are returned (not dropped) by
   JSON_VALUE.
4. Case-conversion code-point policy (judge r16 adjudication):
   un-suffixed upper/lower/ucase/lcase == upperUTF8/lowerUTF8 here
   (full Unicode), the same stance as reverse == reverseUTF8 —
   ClickHouse's un-suffixed forms convert ASCII Latin only.  Pinned
   vectors document the delta; the CaseInsensitive search family folds
   full-Unicode for the same reason.
"""

from __future__ import annotations

from mcp_clickhouse_spark.dialect import translate


def _val(spark, ch_sql):
    rows = spark.sql(translate(ch_sql)).collect()
    return rows[0][0] if rows else None


LONG = " + ".join(["l"] * 80)  # > the 200-char _bind_once threshold


class TestBindOnceSubquery:
    def test_long_left_subquery_right(self, spark):
        spark.sql(
            "CREATE OR REPLACE TEMP VIEW __r17t AS"
            " SELECT * FROM VALUES (2.0), (4.0) AS __r17t(v)"
        )
        got = _val(
            spark,
            f"SELECT ({LONG}) / (SELECT avg(v) FROM __r17t) AS r"
            " FROM (SELECT 1 AS l) x",
        )
        assert abs(got - 80 / 3.0) < 1e-6

    def test_subquery_left_long_right(self, spark):
        spark.sql(
            "CREATE OR REPLACE TEMP VIEW __r17t AS"
            " SELECT * FROM VALUES (2.0), (4.0) AS __r17t(v)"
        )
        got = _val(
            spark,
            f"SELECT (SELECT avg(v) FROM __r17t) / ({LONG}) AS r"
            " FROM (SELECT 1 AS l) x",
        )
        assert abs(got - 3.0 / 80) < 1e-12

    def test_translated_text_keeps_lambda_binding_without_subquery(self):
        # the anti-expansion path must survive for plain long operands
        t = translate(f"SELECT ({LONG}) / ({LONG}) AS r FROM x")
        assert "transform(array(" in t

    def test_no_lambda_when_subquery_present(self):
        t = translate(
            f"SELECT ({LONG}) / (SELECT avg(v) FROM t) AS r FROM x"
        )
        assert "transform(array(" not in t

    def test_select_inside_string_literal_still_binds(self):
        long_str = f"concat('select one', {LONG})"
        t = translate(f"SELECT length({long_str} / ({LONG})) FROM x")
        # the word SELECT only appears inside a quoted literal → binding ok
        assert "transform(array(" in t


class TestJsonExtractTypedScalar:
    def test_int64_truncates_float(self, spark):
        assert (
            _val(spark, "SELECT JSONExtract('{\"a\":200.0}', 'a', 'Int64')")
            == 200
        )

    def test_int64_plain(self, spark):
        assert (
            _val(spark, "SELECT JSONExtract('{\"a\":7}', 'a', 'Int64')") == 7
        )

    def test_int64_default_on_nonnumeric(self, spark):
        assert (
            _val(spark, "SELECT JSONExtract('{\"a\":\"xyz\"}', 'a', 'Int64')")
            == 0
        )

    def test_int32_truncates_float(self, spark):
        assert (
            _val(spark, "SELECT JSONExtract('{\"a\":3.9}', 'a', 'Int32')")
            == 3
        )


class TestSqlJsonVariantClassification:
    def test_query_numeric_string_stays_quoted(self, spark):
        assert (
            _val(spark, "SELECT JSON_QUERY('{\"a\":\"123\"}', '$.a')")
            == '["123"]'
        )

    def test_query_number_unquoted(self, spark):
        assert (
            _val(spark, "SELECT JSON_QUERY('{\"a\":123}', '$.a')") == "[123]"
        )

    def test_query_array_nested(self, spark):
        assert (
            _val(spark, "SELECT JSON_QUERY('{\"a\":[1,2]}', '$.a')")
            == "[[1,2]]"
        )

    def test_query_object(self, spark):
        assert (
            _val(spark, "SELECT JSON_QUERY('{\"a\":{\"b\":1}}', '$.a')")
            == '[{"b":1}]'
        )

    def test_query_miss_empty(self, spark):
        assert _val(spark, "SELECT JSON_QUERY('{\"a\":1}', '$.b')") == ""

    def test_value_bracket_leading_string(self, spark):
        # old text-sniffing returned '' for scalar strings starting '['
        assert (
            _val(spark, "SELECT JSON_VALUE('{\"a\":\"[x]\"}', '$.a')")
            == "[x]"
        )

    def test_value_plain_string(self, spark):
        assert (
            _val(spark, "SELECT JSON_VALUE('{\"a\":\"hi\"}', '$.a')") == "hi"
        )

    def test_value_nonscalar_empty(self, spark):
        assert _val(spark, "SELECT JSON_VALUE('{\"a\":[1]}', '$.a')") == ""

    def test_value_number_and_bool(self, spark):
        assert (
            _val(spark, "SELECT JSON_VALUE('{\"a\":2.5}', '$.a')") == "2.5"
        )
        assert (
            _val(spark, "SELECT JSON_VALUE('{\"a\":true}', '$.a')") == "true"
        )

    def test_exists_null_value_counts(self, spark):
        # an explicit JSON null EXISTS (get_json_object conflated it
        # with a missing key)
        assert _val(spark, "SELECT JSON_EXISTS('{\"a\":null}', '$.a')") is True
        assert _val(spark, "SELECT JSON_EXISTS('{\"a\":1}', '$.b')") is False


class TestCaseConversionPolicy:
    """Pinned vectors for the code-point case-conversion policy
    (dialect.py module docstring): un-suffixed == UTF8 here, a
    documented delta vs ClickHouse's ASCII-only upper/lower
    (CH would give 'MüNCHEN' / 'Äbc')."""

    def test_upper_full_unicode(self, spark):
        assert _val(spark, "SELECT upper('münchen')") == "MÜNCHEN"

    def test_lower_full_unicode(self, spark):
        assert _val(spark, "SELECT lower('ÄBC')") == "äbc"

    def test_ucase_lcase_aliases(self, spark):
        assert _val(spark, "SELECT ucase('straße')") == "STRASSE" or _val(
            spark, "SELECT ucase('straße')"
        ) == "STRAßE"
        assert _val(spark, "SELECT lcase('ÑOÑO')") == "ñoño"

    def test_suffixed_equals_unsuffixed(self, spark):
        assert _val(
            spark, "SELECT upper('münchen') = upperUTF8('münchen')"
        ) is True
        assert _val(spark, "SELECT lower('ÄBC') = lowerUTF8('ÄBC')") is True

    def test_position_case_insensitive_non_ascii(self, spark):
        # the CaseInsensitive family folds full-Unicode too
        assert (
            _val(spark, "SELECT positionCaseInsensitive('xÄBCy', 'äbc')")
            == 2
        )

    def test_ilike_non_ascii(self, spark):
        assert (
            _val(spark, "SELECT 'MÜNCHEN' ILIKE 'mü%'") is True
        )

    def test_ascii_escape_hatch(self, spark):
        # documented ASCII-only form for users who need CH's exact bytes
        got = _val(
            spark,
            "SELECT translate('münchen',"
            " 'abcdefghijklmnopqrstuvwxyz',"
            " 'ABCDEFGHIJKLMNOPQRSTUVWXYZ')",
        )
        assert got == "MüNCHEN"


class TestParseSideDateAudit:
    """Round-17 randomized parse audit closures (scripts/parse_audit.py,
    139 cases green vs Python strptime + DuckDB strptime).

    The one REAL silent wrong it found: Java's 'yy' parses every
    2-digit year into 2000-2099, where MySQL/CH pivot 00-69 → 20xx and
    70-99 → 19xx ('98-03-06' came back as 2098).  parseDateTime and
    parseDateTimeOrNull now wrap %y / %D formats with the century
    shift; %Y formats are untouched."""

    def test_two_digit_year_pivot_low(self, spark):
        got = _val(spark, "SELECT parseDateTime('68-03-15', '%y-%m-%d')")
        assert got.year == 2068

    def test_two_digit_year_pivot_high(self, spark):
        got = _val(spark, "SELECT parseDateTime('98-03-06', '%y-%m-%d')")
        assert got.year == 1998

    def test_two_digit_year_pivot_69(self, spark):
        # MySQL's documented table: 69 → 2069 (POSIX strptime says 1969)
        got = _val(spark, "SELECT parseDateTime('69-01-02', '%y-%m-%d')")
        assert got.year == 2069

    def test_two_digit_year_pivot_70(self, spark):
        got = _val(spark, "SELECT parseDateTime('70-01-02', '%y-%m-%d')")
        assert got.year == 1970

    def test_composite_d_token_pivots(self, spark):
        got = _val(spark, "SELECT parseDateTime('12/31/95', '%D')")
        assert (got.year, got.month, got.day) == (1995, 12, 31)

    def test_four_digit_year_untouched(self, spark):
        got = _val(spark, "SELECT parseDateTime('2084-01-02', '%Y-%m-%d')")
        assert got.year == 2084

    def test_ornull_pivots_too(self, spark):
        got = _val(
            spark, "SELECT parseDateTimeOrNull('77-06-07', '%y-%m-%d')"
        )
        assert got.year == 1977

    def test_day_of_year_parse(self, spark):
        got = _val(spark, "SELECT parseDateTime('2024 366', '%Y %j')")
        assert (got.month, got.day) == (12, 31)

    def test_unpadded_hour_k(self, spark):
        got = _val(
            spark, "SELECT parseDateTime('2010-03-04 7:08', '%Y-%m-%d %k:%i')"
        )
        assert (got.hour, got.minute) == (7, 8)

    def test_twelve_hour_noon_midnight(self, spark):
        noon = _val(
            spark,
            "SELECT parseDateTime('04 Jul 2001 12:05 PM',"
            " '%d %b %Y %h:%i %p')",
        )
        midnight = _val(
            spark,
            "SELECT parseDateTime('04 Jul 2001 12:05 AM',"
            " '%d %b %Y %h:%i %p')",
        )
        assert noon.hour == 12 and midnight.hour == 0

    def test_fractional_seconds(self, spark):
        got = _val(
            spark,
            "SELECT parseDateTime('2015-06-07 08:09:10.123456',"
            " '%F %T.%f')",
        )
        assert got.microsecond == 123456


class TestRound17WaveE:
    """Round-17 probe-wave closures: chained -State/-Merge guided
    errors, window frame exclusion, compound interval strings."""

    def test_chained_state_combinator_guided(self):
        import pytest as _pytest

        with _pytest.raises(ValueError, match="sumStateIf"):
            translate("SELECT sumStateIf(v, k = 1) FROM t")
        with _pytest.raises(ValueError, match="avgMergeArray"):
            translate("SELECT avgMergeArray(v) FROM t")

    def test_exclude_no_others_stripped(self, spark):
        # the SQL-standard default — a no-op Spark's parser rejects
        q = (
            "SELECT sum(v) OVER (ORDER BY k ROWS BETWEEN 1 PRECEDING"
            " AND 1 FOLLOWING EXCLUDE NO OTHERS) AS s FROM"
            " (SELECT 1 AS k, 10.0 AS v UNION ALL SELECT 2, 20.0"
            "  UNION ALL SELECT 3, 30.0) ORDER BY k"
        )
        got = [float(r.s) for r in spark.sql(translate(q)).collect()]
        assert got == [30.0, 60.0, 50.0]

    def test_active_exclusion_guided(self):
        import pytest as _pytest
        from mcp_clickhouse_spark.dialect import DialectError

        for kind in ("CURRENT ROW", "GROUP", "TIES"):
            with _pytest.raises(DialectError, match="cannot exclude"):
                translate(
                    "SELECT sum(v) OVER (ORDER BY k ROWS BETWEEN 1"
                    f" PRECEDING AND 1 FOLLOWING EXCLUDE {kind}) FROM t"
                )

    def test_exclude_inside_string_untouched(self, spark):
        q = "SELECT 'EXCLUDE CURRENT ROW' AS s"
        assert _val(spark, q) == "EXCLUDE CURRENT ROW"

    def test_compound_interval_add(self, spark):
        # CH applies compound intervals left-to-right: +1 month clamps
        # Jan 31 → Feb 28, then +2 days → Mar 2
        got = _val(
            spark,
            "SELECT toDateTime('2023-01-31 10:00:00')"
            " + INTERVAL '1 MONTH 2 DAY'",
        )
        assert (got.month, got.day) == (3, 2)

    def test_compound_interval_subtract(self, spark):
        got = _val(
            spark,
            "SELECT toDate('2023-03-31') - INTERVAL '1 month 2 days'",
        )
        assert (got.month, got.day) == (2, 26)

    def test_compound_interval_week_unit(self, spark):
        got = _val(
            spark, "SELECT toDate('2023-01-01') + INTERVAL '1 week 1 day'"
        )
        assert (got.month, got.day) == (1, 9)

    def test_single_unit_string_native(self, spark):
        got = _val(spark, "SELECT toDate('2023-01-01') + INTERVAL '3 day'")
        assert (got.month, got.day) == (1, 4)


class TestRound17WaveF:
    """Round-17 DST probe closures: addDays/subtractDays must keep the
    time-of-day (date_add cast TIMESTAMP → DATE), and age() hour/minute/
    second are PHYSICAL in CH (epoch-seconds ordinals) where Spark's
    timestampdiff is wall-clock — divergent exactly across DST shifts.
    Probed under a named-DST session (conftest may be UTC; the string
    vectors are tz-independent, the DST ones build their own session)."""

    def test_adddays_keeps_time(self, spark):
        got = _val(
            spark,
            "SELECT toString(addDays(toDateTime('2024-03-09 12:34:56'), 1))",
        )
        assert got == "2024-03-10 12:34:56"

    def test_subtractdays_keeps_time(self, spark):
        got = _val(
            spark,
            "SELECT toString(subtractDays("
            "toDateTime('2024-03-11 12:00:00'), 1))",
        )
        assert got == "2024-03-10 12:00:00"

    def test_adddays_date_stays_date(self, spark):
        import datetime

        got = _val(spark, "SELECT addDays(toDate('2024-01-01'), 5)")
        assert got == datetime.date(2024, 1, 6)
        assert not isinstance(got, datetime.datetime)

    def test_age_docs_example(self, spark):
        # CH docs: age('hour', '2021-12-29 11:00:00', '2022-01-01
        # 10:30:00') = 71
        got = _val(
            spark,
            "SELECT age('hour', toDateTime('2021-12-29 11:00:00'),"
            " toDateTime('2022-01-01 10:30:00'))",
        )
        assert got == 71

    def test_age_month_no_clamp(self, spark):
        # complete months compare wall components WITHOUT month-end
        # clamping: Jan 31 → Feb 28 is an incomplete month in CH
        got = _val(
            spark,
            "SELECT age('month', toDate('2023-01-31'), toDate('2023-02-28'))",
        )
        assert got == 0

    def test_age_negative_truncates_toward_zero(self, spark):
        got = _val(
            spark,
            "SELECT age('hour', toDateTime('2024-06-01 11:10:00'),"
            " toDateTime('2024-06-01 10:30:00'))",
        )
        assert got == 0

    def test_age_and_adddays_dst(self):
        # physical hours across the America/New_York spring-forward:
        # midnight → midnight is 23 physical hours (CH age/dateDiff);
        # addDays preserves the wall clock like CH's tz-aware addDays
        from pyspark.sql import SparkSession

        # NOTE: no timezone in the builder — getOrCreate() would apply
        # it to the ALREADY-RUNNING shared session before old_tz is
        # read, making the finally-restore a no-op and leaking
        # America/New_York into every later datetime test
        s = (
            SparkSession.builder.master("local[2]")
            .appName("r17-dst")
            .getOrCreate()
        )
        old_tz = None
        try:
            old_tz = s.conf.get("spark.sql.session.timeZone")
            s.conf.set("spark.sql.session.timeZone", "America/New_York")
            assert _val(
                s,
                "SELECT age('hour', toDateTime('2024-03-10 00:00:00'),"
                " toDateTime('2024-03-11 00:00:00'))",
            ) == 23
            assert _val(
                s,
                "SELECT toString(addDays("
                "toDateTime('2024-03-09 12:00:00'), 1))",
            ) == "2024-03-10 12:00:00"
            assert _val(
                s,
                "SELECT age('hour', toDateTime('2024-11-03 00:00:00'),"
                " toDateTime('2024-11-04 00:00:00'))",
            ) == 25
        finally:
            if old_tz is not None:
                s.conf.set("spark.sql.session.timeZone", old_tz)


class TestRound17WaveH:
    """Round-17 wave H: fed-but-degenerate statistics.  ClickHouse
    computes the sample/ratio statistics as plain Float64 arithmetic, so
    n = 1 (sample forms) or zero variance (ratio forms) is exactly
    0/0 = nan — Cauchy–Schwarz ties the numerator to the variance
    denominator, so ±inf is unreachable for corr/skew/kurt/slope (only
    boundingRatio, whose rise is independent of its run, can hit ±inf).
    Spark's builtins return NULL there, and native corr ANSI-THROWS —
    corrStable/corrMatrix crashed outright on a constant column before
    this wave.  Empty inputs keep NULL (the documented Nullable(T)
    empty-set reading).  Contract basis: verbatim SQL delegation
    (/root/reference/mcp_clickhouse/mcp_server.py:425)."""

    def _nan(self, spark, ch_sql):
        import math

        v = _val(spark, ch_sql)
        assert isinstance(v, float) and math.isnan(v), f"{ch_sql}: {v!r}"

    def test_sample_stats_n1_nan(self, spark):
        for fn in ("varSamp", "stddevSamp", "varSampStable",
                   "stddevSampStable", "skewPop", "skewSamp", "kurtSamp"):
            self._nan(spark, f"SELECT {fn}(x) FROM (SELECT 5.0 AS x)")

    def test_covar_corr_degenerate_nan(self, spark):
        one = "(SELECT 5.0 AS x, 3.0 AS y)"
        cst = ("(SELECT * FROM VALUES (1.0, 2.0), (1.0, 5.0), (1.0, 9.0)"
               " AS t(x, y))")
        for fn in ("covarSamp", "covarSampStable", "corr", "corrStable",
                   "rankCorr"):
            self._nan(spark, f"SELECT {fn}(x, y) FROM {one}")
        for fn in ("corr", "corrStable", "rankCorr"):
            self._nan(spark, f"SELECT {fn}(x, y) FROM {cst}")

    def test_corr_matrix_constant_column_no_crash(self, spark):
        import math

        row = spark.sql(translate(
            "SELECT corrMatrix(x, y) AS cm, covarSampMatrix(x, y) AS vm"
            " FROM (SELECT * FROM VALUES (1.0, 2.0), (1.0, 5.0)"
            " AS t(x, y))"
        )).collect()[0]
        assert math.isnan(row.cm[0][0]) and math.isnan(row.cm[0][1])
        assert row.cm[1][1] == 1.0
        assert all(math.isnan(v) for r in row.vm for v in r) is False
        # covarSamp of 2 pairs is defined; the nan cells are the
        # zero-variance corr ones only
        assert row.vm[0][0] == 0.0

    def test_bounding_ratio_ieee(self, spark):
        import math

        # distinct x: plain slope; constant x with a nonzero rise: ±inf;
        # single row (rise exactly 0): nan
        assert _val(
            spark,
            "SELECT boundingRatio(x, y) FROM (SELECT * FROM VALUES"
            " (1.0, 2.0), (3.0, 8.0) AS t(x, y))",
        ) == 3.0
        v = _val(
            spark,
            "SELECT boundingRatio(x, y) FROM (SELECT * FROM VALUES"
            " (1.0, 2.0), (1.0, 8.0) AS t(x, y))",
        )
        assert math.isinf(v) or math.isnan(v)
        self._nan(spark, "SELECT boundingRatio(x, y)"
                         " FROM (SELECT 1.0 AS x, 2.0 AS y)")

    def test_simple_linear_regression_constant_x_nan(self, spark):
        import math

        row = spark.sql(translate(
            "SELECT simpleLinearRegression(x, y) AS lr FROM"
            " (SELECT * FROM VALUES (1.0, 2.0), (1.0, 5.0) AS t(x, y))"
        )).collect()[0]
        assert math.isnan(row.lr["k"]) and math.isnan(row.lr["b"])

    def test_empty_inputs_keep_null(self, spark):
        emp = ("(SELECT CAST(NULL AS DOUBLE) AS x, CAST(NULL AS DOUBLE)"
               " AS y WHERE false)")
        for expr in ("varSamp(x)", "stddevSamp(x)", "covarSamp(x, y)",
                     "corr(x, y)", "skewPop(x)", "kurtSamp(x)",
                     "rankCorr(x, y)", "boundingRatio(x, y)"):
            assert _val(spark, f"SELECT {expr} FROM {emp}") is None, expr

    def test_combinators_keep_contract(self, spark):
        import math

        # -OrDefault replaces only the empty-set NULL, never the
        # fed-degenerate nan; -If feeds one row → nan
        self._nan(spark, "SELECT varSampOrDefault(x)"
                         " FROM (SELECT 5.0 AS x)")
        self._nan(spark, "SELECT varSampIf(x, x > 4)"
                         " FROM (SELECT * FROM VALUES (5.0), (1.0)"
                         " AS t(x))")
        assert _val(
            spark,
            "SELECT varSampOrDefault(x)"
            " FROM (SELECT CAST(NULL AS DOUBLE) AS x WHERE false)",
        ) == 0.0
        # non-degenerate values unchanged
        assert _val(
            spark,
            "SELECT varSamp(x) FROM (SELECT * FROM VALUES (1.0), (3.0)"
            " AS t(x))",
        ) == 2.0


class TestRound17WaveI:
    """Round-17 wave I: array-family edges.  CH docs pin 'Null processed
    as a value' and 'an empty array is a subset of any array' for
    hasAll/hasAny — Spark's arrays_overlap three-valued-leaks the
    NULL-only overlap and the old forall/array_contains subset test
    crashed at analysis on ARRAY<VOID> (untyped empty / all-NULL)
    needles.  arrayJaccardIndex([], []) is |∩|/|∪| = 0/0 = nan (the
    wave-H Float64 contract)."""

    def test_hasall_null_as_value_and_void(self, spark):
        vecs = [
            ("hasAll(array(1,2,NULL), array(NULL))", True),
            ("hasAll(array(1,2), array())", True),
            ("hasAll(array(), array())", True),
            ("hasAll(array(1,2), array(NULL))", False),
            ("hasAll(array(1), array(1,1))", True),
            ("hasAll(CAST(NULL AS ARRAY<INT>), array(1))", None),
        ]
        for expr, want in vecs:
            assert _val(spark, f"SELECT {expr}") == want, expr

    def test_hasany_null_only_overlap(self, spark):
        vecs = [
            ("hasAny(array(3,NULL), array(NULL,9))", True),
            ("hasAny(array(1), array(2,NULL))", False),
            ("hasAny(array(1,NULL), array(1))", True),
            ("hasAny(array(1,2), array())", False),
            ("hasAny(array(1), CAST(NULL AS ARRAY<INT>))", None),
        ]
        for expr, want in vecs:
            assert _val(spark, f"SELECT {expr}") == want, expr

    def test_jaccard_empty_nan(self, spark):
        import math

        v = _val(spark, "SELECT arrayJaccardIndex(array(), array())")
        assert isinstance(v, float) and math.isnan(v)
        assert _val(
            spark,
            "SELECT round(arrayJaccardIndex(array(1,2), array(2,3)), 4)",
        ) == 0.3333
        assert _val(
            spark,
            "SELECT arrayJaccardIndex(CAST(NULL AS ARRAY<INT>), array(1))",
        ) is None


class TestRound17WaveJ:
    """Round-17 wave J: parametric-aggregate / map / bit edges.  The one
    fix: CH bitCount counts over the argument's STORED width
    (bitCount(toInt32(-1)) = 32, two's complement), while Spark's
    bit_count always evaluates in 64 bits — a width-forcing toIntN cast
    (translated CAST … AS TINYINT/SMALLINT/INT) now gets the matching
    mask.  Bare columns/literals keep the 64-bit reading (documented:
    only negative narrow values differ)."""

    def test_bitcount_width(self, spark):
        vecs = [
            ("bitCount(toInt8(-1))", 8),
            ("bitCount(toInt16(-1))", 16),
            ("bitCount(toInt32(-1))", 32),
            ("bitCount(toInt64(-1))", 64),
            ("bitCount(-1)", 64),
            ("bitCount(toInt32(333))", 5),
            ("bitCount(333)", 5),
            ("bitCount(toUInt8(255))", 8),
        ]
        for expr, want in vecs:
            assert _val(spark, f"SELECT {expr}") == want, expr

    def test_quantile_level_boundaries(self, spark):
        five = "(SELECT * FROM VALUES (1.0),(2.0),(3.0),(4.0),(10.0) t(x))"
        assert _val(spark, f"SELECT quantile(0)(x) FROM {five}") == 1.0
        assert _val(spark, f"SELECT quantile(1)(x) FROM {five}") == 10.0
        assert float(_val(
            spark, f"SELECT quantileExact(0)(x) FROM {five}")) == 1.0
        assert float(_val(
            spark, f"SELECT quantileExact(1)(x) FROM {five}")) == 10.0
        # duplicate levels kept, argument order preserved
        got = _val(
            spark,
            f"SELECT toString(quantilesExact(1, 0)(x)) FROM {five}")
        assert got == "[10.0, 1.0]" or got == "[10, 1]", got

    def test_uniq_upto_cap(self, spark):
        five = "(SELECT * FROM VALUES (1.0),(2.0),(3.0),(4.0),(10.0) t(x))"
        assert _val(spark, f"SELECT uniqUpTo(8)(x) FROM {five}") == 5
        # over the cap: CH returns N + 1
        assert _val(spark, f"SELECT uniqUpTo(3)(x) FROM {five}") == 4


class TestRound17WaveK:
    """Round-17 wave K: JSON introspection + accurate-cast edges.  The
    fix: JSONLength's path arguments were silently IGNORED (the length
    was always taken at the document root) and a scalar/absent/wrong-
    type value returned NULL where CH's docs pin 0 ("if the value does
    not exist or has a wrong type, 0 will be returned")."""

    def test_jsonlength_path_and_zero(self, spark):
        vecs = [
            ("""JSONLength('{"a":1,"b":2}')""", 2),
            ("""JSONLength('[1,2,3]')""", 3),
            ("""JSONLength('7')""", 0),
            ("""JSONLength('{"a":[1,2]}', 'a')""", 2),
            ("""JSONLength('{"a":{"x":1,"y":2,"z":3}}', 'a')""", 3),
            ("""JSONLength('{"a":[[5],[6,7]]}', 'a', 2)""", 2),
            ("""JSONLength('{"a":1}', 'missing')""", 0),
            ("""JSONLength('not json')""", 0),
            ("""JSONLength('{"a":"str"}', 'a')""", 0),
        ]
        for expr, want in vecs:
            assert _val(spark, f"SELECT {expr}") == want, expr

    def test_json_introspection_edges(self, spark):
        assert _val(spark, """SELECT JSONHas('[1,2]', 2)""") is True
        assert _val(spark, """SELECT JSONHas('[1,2]', 3)""") is False
        assert _val(spark, """SELECT JSONType('{"a":[1]}', 'a')""") == "Array"
        assert _val(
            spark,
            """SELECT JSONExtractRaw('{"a":[{"b":1}]}', 'a', 1, 'b')""",
        ) == "1"
        assert _val(
            spark, """SELECT simpleJSONExtractString('{"k":"v1","k":"v2"}', 'k')"""
        ) == "v1"

    def test_accurate_cast_range(self, spark):
        # out-of-range → NULL (docs-pinned); fractional truncation keeps
        # the plain-cast reading (VERIFY-CLASS, recorded in COVERAGE.md)
        assert _val(spark, "SELECT accurateCastOrNull(200, 'UInt8')") == 200
        assert _val(spark, "SELECT accurateCastOrNull(300, 'UInt8')") is None
        assert _val(spark, "SELECT toInt32OrNull('42.5')") is None
        assert _val(spark, "SELECT toUInt8(300)") == 44


class TestRound17WaveL:
    """Round-17 wave L: the -ArgMin/-ArgMax aggregate combinators
    (sumArgMin(x, k) = sum of x over ONLY the rows whose k equals the
    group minimum; ties all participate, unlike argMin/argMax which
    pick one row).  Previously a raw UNRESOLVED_ROUTINE leak — now
    implemented for count/sum/avg/min/max/uniq/uniqExact/groupArray/
    groupUniqArray/any/anyLast via the collected-pairs + bind-once
    shape (the best key cannot ride inside a higher-order-function
    lambda as an aggregate); other bases and chained spellings get a
    guided error."""

    @staticmethod
    def _setup(spark):
        spark.sql(
            "CREATE OR REPLACE TEMP VIEW __am AS"
            " SELECT g, CAST(x AS DOUBLE) AS x, k FROM VALUES"
            " ('a', 10.0, 1), ('a', 20.0, 1), ('a', 99.0, 5),"
            " ('b', 7.0, 2), ('b', NULL, 1), ('b', 3.0, 2) t(g, x, k)"
        )

    def test_tie_participation_and_null_skip(self, spark):
        self._setup(spark)
        rows = spark.sql(translate(
            "SELECT g, sumArgMin(x, k) AS s, sumArgMax(x, k) AS sx,"
            " countArgMin(x, k) AS c, avgArgMin(x, k) AS a,"
            " maxArgMin(x, k) AS m, uniqArgMin(x, k) AS u"
            " FROM __am GROUP BY g ORDER BY g"
        )).collect()
        # group a: min k=1 → x {10,20}; max k=5 → {99}
        assert (rows[0].s, rows[0].sx, rows[0].c, rows[0].a,
                rows[0].m, rows[0].u) == (30.0, 99.0, 2, 15.0, 20.0, 2)
        # group b: the NULL-x row is skipped (its k=1 must NOT win);
        # kept pairs (7,2),(3,2) → min k=2 → both rows
        assert (rows[1].s, rows[1].c) == (10.0, 2)

    def test_integer_type_kept(self, spark):
        got = _val(spark, "SELECT toString(sumArgMin(x, k)) FROM (SELECT"
                          " CAST(10 AS BIGINT) AS x, 1 AS k)")
        assert got == "10"

    def test_empty_group_contract(self, spark):
        self._setup(spark)
        assert _val(spark, "SELECT sumArgMin(x, k) FROM __am"
                           " WHERE g = 'zzz'") is None
        assert _val(spark, "SELECT countArgMin(x, k) FROM __am"
                           " WHERE g = 'zzz'") == 0
        assert _val(spark, "SELECT toString(groupArrayArgMin(x, k))"
                           " FROM __am WHERE g = 'zzz'") == "[]"

    def test_guided_for_other_bases_and_chains(self):
        import pytest

        for q in ("SELECT quantileArgMin(x, k) FROM t",
                  "SELECT sumArgMinIf(x, k, c) FROM t",
                  "SELECT medianArgMax(x, k) FROM t"):
            with pytest.raises(ValueError, match="ArgMin/-ArgMax"):
                translate(q)
        # bare argMin/argMax untouched by the guard
        assert "min_by" in translate("SELECT argMin(x, k) FROM t")


class TestRound17WaveM:
    """Round-17 wave M: RANGE frames over time-ordered windows.
    ClickHouse numeric RANGE offsets over a DateTime ORDER BY mean
    SECONDS (DateTime is unix-seconds); Spark demands an interval
    literal there — untranslatable at text level (the ORDER BY type is
    unknown until analysis), so the tool layer appends a dialect hint
    to RANGE_FRAME_INVALID_TYPE.  Numeric offsets over Date ORDER BY
    are DAYS in both engines and pass through unchanged."""

    def _view(self, spark):
        spark.sql(
            "CREATE OR REPLACE TEMP VIEW __wm AS SELECT * FROM VALUES"
            " (TIMESTAMP '2024-01-01 00:00:00', 10.0),"
            " (TIMESTAMP '2024-01-01 00:00:02', 20.0),"
            " (TIMESTAMP '2024-01-01 00:00:05', 40.0) t(ts, v)"
        )

    def test_interval_frame_spelling_works(self, spark):
        self._view(spark)
        rows = [r[0] for r in spark.sql(translate(
            "SELECT sum(v) OVER (ORDER BY ts RANGE BETWEEN INTERVAL 2"
            " SECOND PRECEDING AND CURRENT ROW) AS s FROM __wm"
            " ORDER BY ts"
        )).collect()]
        assert [float(x) for x in rows] == [10.0, 30.0, 40.0]

    def test_numeric_range_over_timestamp_gets_hint(self, spark):
        from mcp_clickhouse_spark.tools import ToolError, run_select_query

        self._view(spark)
        import pytest

        with pytest.raises(ToolError, match="INTERVAL n SECOND"):
            run_select_query(
                spark,
                "SELECT sum(v) OVER (ORDER BY ts RANGE BETWEEN 2"
                " PRECEDING AND CURRENT ROW) AS s FROM __wm",
                dialect="clickhouse",
            )

    def test_numeric_range_over_date_is_days(self, spark):
        got = spark.sql(translate(
            "SELECT sum(v) OVER (ORDER BY d RANGE BETWEEN 1 PRECEDING"
            " AND CURRENT ROW) AS s FROM (SELECT * FROM VALUES"
            " (DATE '2024-01-01', 1.0), (DATE '2024-01-02', 2.0),"
            " (DATE '2024-01-05', 4.0) t(d, v)) ORDER BY d"
        )).collect()
        assert [float(r.s) for r in got] == [1.0, 3.0, 4.0]


class TestRound17WaveN:
    """Round-17 wave N: join-spelling corners.  CH accepts the
    modifier-first SEMI LEFT / ANTI LEFT orderings (Spark parses only
    LEFT SEMI / LEFT ANTI); right-semi/right-anti have no Spark
    equivalent (guided: swap the sides); and `a PASTE JOIN b` parsed as
    table alias `a AS PASTE` inner-joined with NO condition — a SILENT
    CROSS JOIN — before the guided error."""

    @staticmethod
    def _views(spark):
        spark.sql("CREATE OR REPLACE TEMP VIEW __na AS SELECT * FROM"
                  " VALUES (1,'x'),(2,'y'),(3,'z') t(k, s)")
        spark.sql("CREATE OR REPLACE TEMP VIEW __nb AS SELECT * FROM"
                  " VALUES (1),(3),(3) t(k)")

    def test_modifier_first_orderings(self, spark):
        self._views(spark)
        semi = sorted(tuple(r) for r in spark.sql(translate(
            "SELECT * FROM __na SEMI LEFT JOIN __nb ON __na.k = __nb.k"
        )).collect())
        assert semi == [(1, "x"), (3, "z")]
        anti = sorted(tuple(r) for r in spark.sql(translate(
            "SELECT * FROM __na ANTI LEFT JOIN __nb ON __na.k = __nb.k"
        )).collect())
        assert anti == [(2, "y")]

    def test_right_semi_and_paste_guided(self):
        import pytest

        for q, frag in [
            ("SELECT * FROM a RIGHT SEMI JOIN b ON a.k = b.k",
             "swap the sides"),
            ("SELECT * FROM a ANTI RIGHT JOIN b ON a.k = b.k",
             "swap the sides"),
            ("SELECT * FROM a PASTE JOIN b", "positionally"),
        ]:
            with pytest.raises(ValueError, match=frag):
                translate(q)

    def test_join_words_in_literals_survive(self):
        t = translate("SELECT 'SEMI LEFT JOIN x PASTE JOIN' AS s FROM a")
        assert "'SEMI LEFT JOIN x PASTE JOIN'" in t


class TestRound17WaveO:
    """Round-17 wave O: the CH `EXISTS [TEMPORARY] [TABLE|DICTIONARY|
    DATABASE] name` introspection statement (delegated verbatim by the
    reference — /root/reference/mcp_clickhouse/mcp_server.py:425).
    Previously rejected by the readonly gate as "statement type
    'EXISTS' is not allowed" (misleading — it IS read-only); Spark has
    no EXISTS statement, so it is answered natively from the catalog
    as CH's one-row UInt8 `result` shape."""

    def test_exists_statement_shapes(self, spark):
        from mcp_clickhouse_spark.tools import run_select_query

        spark.sql("CREATE OR REPLACE TEMP VIEW __exo AS SELECT 1 AS a")
        for q, want in [
            ("EXISTS TABLE __exo", 1),
            ("EXISTS __exo", 1),
            ("EXISTS TEMPORARY TABLE __exo", 1),
            ("EXISTS TABLE __no_such_table", 0),
            ("EXISTS DATABASE default", 1),
            ("EXISTS DATABASE __no_such_db", 0),
            ("EXISTS DICTIONARY __d", 0),
            ("exists table __exo FORMAT TabSeparated", 1),
        ]:
            r = run_select_query(spark, q, dialect="clickhouse")
            assert r["columns"] == ["result"] and r["rows"][0][0] == want, q

    def test_exists_expression_untouched(self, spark):
        from mcp_clickhouse_spark.tools import run_select_query

        r = run_select_query(
            spark, "SELECT EXISTS(SELECT 1) AS e", dialect="clickhouse"
        )
        assert r["rows"] == [[True]]


class TestRound17WaveO2:
    """system.functions / system.settings / system.processes + SHOW
    PROCESSLIST (previously raw TABLE_OR_VIEW_NOT_FOUND / parse
    errors).  functions = the dialect registry (~1,700 names, lowercase
    + case_insensitive=1, is_aggregate heuristic over the known bases
    and chain suffixes) plus Spark's catalog; settings = SET -v;
    processes = the honest empty set (in-process engine)."""

    def test_system_functions(self, spark):
        from mcp_clickhouse_spark.tools import run_select_query

        r = run_select_query(
            spark,
            "SELECT count(1) FROM system.functions",
            dialect="clickhouse",
        )
        assert r["rows"][0][0] > 1700
        r2 = run_select_query(
            spark,
            "SELECT name FROM system.functions"
            " WHERE name LIKE 'sumargm%' ORDER BY name",
            dialect="clickhouse",
        )
        assert [x[0] for x in r2["rows"]] == ["sumargmax", "sumargmin"]
        r3 = run_select_query(
            spark,
            "SELECT is_aggregate FROM system.functions"
            " WHERE name = 'varsamp'",
            dialect="clickhouse",
        )
        assert r3["rows"][0][0] == 1

    def test_system_settings_and_processes(self, spark):
        from mcp_clickhouse_spark.tools import run_select_query

        r = run_select_query(
            spark,
            "SELECT count(1) FROM system.settings"
            " WHERE name LIKE 'spark.sql%'",
            dialect="clickhouse",
        )
        assert r["rows"][0][0] > 50
        r2 = run_select_query(spark, "SHOW PROCESSLIST", dialect="clickhouse")
        assert r2["columns"] == ["query_id", "user", "elapsed", "query"]
        assert r2["rows"] == []
