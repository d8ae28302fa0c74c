"""Round-16 probe-wave batch 2 (aggregate/encoding/URL edges).

Confirmed deltas fixed:

- ``avgWeighted`` with a ZERO total weight ANSI-threw DIVIDE_BY_ZERO
  where CH returns nan (Float64 contract, same family as divide());
  an empty/all-NULL input keeps NULL (nullable contract).
- ``base64Decode`` surfaced BINARY through the tool contract (bare
  unbase64 mapping); CH returns String.
- ``cutWWW`` only stripped a leading ``www.`` on SCHEMELESS urls —
  'http://www.example.com/p' passed through unchanged.

Probed clean in the same batch (~55 vectors, no fix needed): JSON
family (JSONType/Length/Has/ExtractString multi-key/ExtractKeys/
simpleJSON*/visitParam*/isValidJSON/toJSONString), base64 variants
(URL-safe encode/decode, tryBase64Decode ''-default), char(),
UUID roundtrip, empty/notEmpty on strings and arrays, emptyArray*,
arrayStringConcat, URL hierarchy (protocol/domain[WithoutWWW]/
topLevelDomain/path[Full]/queryString/fragment/extractURLParameter[s,
Names]/cutQueryString/cutFragment/firstSignificantSubdomain/
cutToFirstSignificantSubdomain/netloc/decodeURLComponent/
encodeURLFormComponent), IP family (IPv4NumToString roundtrip,
isIPv4String, isIPAddressInRange, IPv4CIDRToRange), tuple
(tupleElement positional), timezone (timeZoneOf/toTimezone/
timeZoneOffset/serverTimeZone), age/dateDiff/dateTrunc, aggregate
edges (argMax, boundingRatio, maxIntersections, sumKahan, median,
singleValueOrNull both branches, countIf).

Verify-class (recorded, not changed): whether CH's uniq/uniqExact
count NULL as a distinct value (the general "aggregates skip NULL"
rule vs uniq treating NULL as a key) — needs a docs/CH pin; this
engine follows Spark/SQL-standard distinct-excludes-NULL semantics.
"""

from __future__ import annotations

import math

import pytest

from mcp_clickhouse_spark.dialect import translate


def _val(spark, ch_sql):
    rows = spark.sql(translate(ch_sql)).collect()
    return rows[0][0] if rows else None


class TestAvgWeightedZeroWeight:
    def test_zero_total_weight_is_nan(self, spark):
        v = _val(
            spark,
            "SELECT avgWeighted(x, w) AS r FROM"
            " (SELECT 1 AS x, 0 AS w UNION ALL SELECT 2, 0)",
        )
        assert isinstance(v, float) and math.isnan(v)

    def test_weighted_value_regression(self, spark):
        # CH docs-style example: ((4*1) + (1*0) + (10*2)) / 3 = 8
        assert _val(
            spark,
            "SELECT avgWeighted(x, w) AS r FROM (SELECT 4 AS x, 1 AS w"
            " UNION ALL SELECT 1, 0 UNION ALL SELECT 10, 2)",
        ) == pytest.approx(8.0)

    def test_empty_input_keeps_null(self, spark):
        # nullable contract: empty set → NULL (not nan) — documented
        assert (
            _val(
                spark,
                "SELECT avgWeighted(x, w) AS r FROM"
                " (SELECT 1 AS x, 1 AS w) WHERE 1 = 0",
            )
            is None
        )

    def test_null_values_weights_skipped(self, spark):
        # NULL value rows drop out entirely (value AND weight)
        assert _val(
            spark,
            "SELECT avgWeighted(x, w) AS r FROM (SELECT 4 AS x, 1 AS w"
            " UNION ALL SELECT NULL, 100)",
        ) == pytest.approx(4.0)


class TestBase64DecodeString:
    def test_returns_string_not_binary(self, spark):
        v = _val(spark, "SELECT base64Decode('Y2xpY2tob3VzZQ==')")
        assert v == "clickhouse" and isinstance(v, str)

    def test_roundtrip(self, spark):
        assert _val(spark, "SELECT base64Decode(base64Encode('ab c'))") == (
            "ab c"
        )


class TestCutWWW:
    def test_with_scheme(self, spark):
        assert _val(spark, "SELECT cutWWW('http://www.example.com/p')") == (
            "http://example.com/p"
        )

    def test_without_scheme(self, spark):
        assert _val(spark, "SELECT cutWWW('www.example.com/p')") == (
            "example.com/p"
        )

    def test_no_www_unchanged(self, spark):
        assert _val(spark, "SELECT cutWWW('http://example.com/www.x')") == (
            "http://example.com/www.x"
        )
