"""Round-16 probe-wave closures (evaluate-and-compare vs ClickHouse
docs worked examples; COVERAGE.md round-16 section).

Confirmed deltas fixed this round:

- ``left``/``right`` (and UTF8 forms) with NEGATIVE length: CH keeps
  all but |n| characters from the other end (docs worked examples
  ``left('Hello', -3)`` = 'He', ``right('Hello', -3)`` = 'lo');
  Spark's builtins return ''.
- ``initcap``/``initcapUTF8``: CH words are ALNUM RUNS separated by any
  non-alphanumeric character, rest-of-word lowercased; Spark's builtin
  splits on whitespace only and keeps inner case... no — Spark
  lowercases the rest too but only breaks words on whitespace
  ('foo_bar' → 'Foo_bar'; CH 'Foo_Bar').
- ``hex`` of integers: CH prints both digits of every byte (hex(1) =
  '01', hex(256) = '0100'); Spark hex is minimal-width.  Same
  minimal-byte caveat as bin (declared CH type width unknowable).
- ``arrayFlatten``/``flatten``: CH collapses EVERY nesting level
  (docs: flatten([[[1]],[[2],[3]]]) = [1,2,3]); Spark removes one.
  Literal depth is counted at translate time; non-literal arguments
  get one level + an explicit OneLevelFlattenWarning.

Families probed CLEAN this round (no fix needed, ~70 vectors): array
deep-semantics (arrayCompact/Shingles/Fold/CumSum[NonNegative]/
Difference/EnumerateUniq/Reduce/hasSubstr/Last[Index]/Rotate*),
date closures (YYYYMMDDToDate, YYYYMMDDhhmmssToDateTime,
fromDaysSinceYearZero, toISOWeek/Year, dateName, toStartOfFive/
FifteenMinutes, changeYear/Month/Day, countDigits, bitCount,
transform), strings (substring negative offset, substringIndex ±n,
countSubstrings, overlay, format positional, extract, trim BOTH,
tokens, splitByWhitespace, leftPad truncate, locate/position,
soundex), math (gcd/lcm, pow(0,-1)=inf, intExp2/10, sign(-0.0),
max2/min2, moduloOrZero, ifNotFinite, factorial, bitTest family,
positiveModulo, divideOrNull, erf/erfc/lgamma/tgamma,
formatReadableQuantity/Size).
"""

from __future__ import annotations

import warnings

import pytest

from mcp_clickhouse_spark.dialect import (
    OneLevelFlattenWarning,
    translate,
)


def _val(spark, ch_sql):
    from mcp_clickhouse_spark.functions import register_lazy_udfs

    out = translate("SELECT " + ch_sql + " AS r")
    register_lazy_udfs(spark, out)
    rows = spark.sql(out).collect()
    return rows[0][0] if rows else None


class TestLeftRightNegative:
    def test_left_negative_docs_example(self, spark):
        assert _val(spark, "left('Hello', -3)") == "He"

    def test_right_negative_docs_example(self, spark):
        assert _val(spark, "right('Hello', -3)") == "lo"

    def test_utf8_forms(self, spark):
        assert _val(spark, "leftUTF8('Hello', -3)") == "He"
        assert _val(spark, "rightUTF8('Hello', -3)") == "lo"

    def test_negative_exceeding_length(self, spark):
        assert _val(spark, "left('Hi', -5)") == ""
        assert _val(spark, "right('Hi', -5)") == ""

    def test_positive_regression(self, spark):
        assert _val(spark, "left('Hello', 2)") == "He"
        assert _val(spark, "right('Hello', 2)") == "lo"
        assert _val(spark, "left('Hello', 0)") == ""

    def test_null_propagates(self, spark):
        assert _val(spark, "left(NULL, 2)") is None
        assert _val(spark, "right('ab', NULL)") is None


class TestInitcapWordBoundaries:
    def test_docs_example(self, spark):
        assert _val(spark, "initcap('building for fast')") == (
            "Building For Fast"
        )

    def test_non_alnum_separators(self, spark):
        # CH: words are alphanumeric runs; '_' and '-' are separators
        assert _val(spark, "initcap('foo_bar')") == "Foo_Bar"
        assert _val(spark, "initcap('hELLO-wORLD')") == "Hello-World"

    def test_digit_leading_word(self, spark):
        assert _val(spark, "initcap('123abc DEF')") == "123abc Def"

    def test_utf8_form_unicode_words(self, spark):
        assert _val(spark, "initcapUTF8('été chaud')") == "Été Chaud"

    def test_ascii_form_treats_nonascii_as_separator(self, spark):
        # plain initcap is the ASCII-word form: 'é' separates
        assert _val(spark, "initcap('aéb')") == "AéB"

    def test_null(self, spark):
        assert _val(spark, "initcap(NULL)") is None


class TestHexEvenPadding:
    def test_docs_examples(self, spark):
        assert _val(spark, "hex(1)") == "01"
        assert _val(spark, "hex(255)") == "FF"
        assert _val(spark, "hex(256)") == "0100"

    def test_string_input_unchanged(self, spark):
        assert _val(spark, "hex('abc')") == "616263"

    def test_null(self, spark):
        assert _val(spark, "hex(NULL)") is None

    def test_unhex_roundtrip(self, spark):
        assert _val(spark, "unhex(hex('clickhouse'))") == b"clickhouse"


class TestArrayFlattenDepth:
    def test_docs_example_depth3(self, spark):
        assert _val(spark, "arrayFlatten([[[1]],[[2],[3]]])") == [1, 2, 3]

    def test_alias_flatten(self, spark):
        assert _val(spark, "flatten([[[1]],[[2],[3]]])") == [1, 2, 3]

    def test_depth2_literal(self, spark):
        assert _val(spark, "arrayFlatten([[1, 2], [3]])") == [1, 2, 3]

    def test_depth4_literal(self, spark):
        assert _val(spark, "arrayFlatten([[[[1]],[[2]]]])") == [1, 2]

    def test_non_literal_warns_and_flattens_one_level(self, spark):
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            out = translate(
                "SELECT arrayFlatten(x) AS r FROM"
                " (SELECT [[1], [2]] AS x)"
            )
            assert any(
                issubclass(x.category, OneLevelFlattenWarning) for x in w
            )
        assert spark.sql(out).collect()[0][0] == [1, 2]
