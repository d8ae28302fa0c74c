"""Round-11 guided-tail closures: polygonAreaSpherical (exact spherical
excess), the ngramDistance/ngramSearch family (4-gram multiset measures,
Float32 like ClickHouse), and minSampleSizeConversion/Continous (the
closed-form power analysis the CH docs cite).

The driver oracle (scalar_round11) covers the data-driven paths; these
tests pin the ANALYTIC ground truth the oracle can't express: known
spherical areas (octant = π/2, polar triangle = Δλ, hole subtraction,
orientation invariance, the planar limit) and the ngram edge cases
(short strings, empty needle, case/UTF8 variants)."""

from __future__ import annotations

import math

import pytest

from mcp_clickhouse_spark.dialect import DialectError, translate
from mcp_clickhouse_spark.tools import run_select_query


def one(spark, ch_sql):
    return run_select_query(spark, ch_sql, dialect="clickhouse")["rows"][0]


def val(spark, expr):
    return one(spark, f"SELECT {expr} AS r")[0]


def test_spherical_area_octant_and_polar_triangles(spark):
    # equator + two meridians bound exactly 1/8 of the sphere
    assert val(
        spark, "polygonAreaSpherical([[(0., 0.), (90., 0.), (0., 90.)]])"
    ) == pytest.approx(math.pi / 2, abs=1e-12)
    # polar triangle: two meridians Δλ apart + the equator base → Δλ
    assert val(
        spark, "polygonAreaSpherical([[(10., 0.), (40., 0.), (0., 90.)]])"
    ) == pytest.approx(math.radians(30), abs=1e-12)
    # orientation-insensitive (corrected area, like the Cartesian twin)
    assert val(
        spark, "polygonAreaSpherical([[(0., 90.), (90., 0.), (0., 0.)]])"
    ) == pytest.approx(math.pi / 2, abs=1e-12)


def test_spherical_area_holes_and_closed_ring(spark):
    # octant minus a Δλ=10° polar-triangle hole
    got = val(
        spark,
        "polygonAreaSpherical([[(0., 0.), (90., 0.), (0., 90.)],"
        " [(20., 0.), (30., 0.), (0., 90.)]])",
    )
    assert got == pytest.approx(math.pi / 2 - math.radians(10), abs=1e-12)
    # explicitly closed ring (first vertex repeated) adds a zero edge
    assert val(
        spark,
        "polygonAreaSpherical([[(0., 0.), (90., 0.), (0., 90.), (0., 0.)]])",
    ) == pytest.approx(math.pi / 2, abs=1e-12)


def test_spherical_area_planar_limit(spark):
    # tiny equatorial square ≈ planar area scaled to radians²
    got = val(
        spark,
        "polygonAreaSpherical([[(0., 0.), (0.1, 0.), (0.1, 0.1), (0., 0.1)]])",
    )
    expect = (math.radians(0.1) ** 2) * math.cos(math.radians(0.05))
    assert got == pytest.approx(expect, rel=1e-6)


def _f32(x):
    import numpy as np

    return float(np.float32(x))


def test_ngram_distance_values(spark):
    row = one(
        spark,
        "SELECT ngramDistance('abcdef', 'bcdefg') AS d,"
        " ngramDistance('ClickHouse', 'ClickHouse') AS same,"
        " ngramDistance('abcde', '') AS one_empty,"
        " ngramDistance('ab', 'cd') AS both_short,"
        " ngramDistance('', '') AS both_empty",
    )
    # abcdef: {abcd,bcde,cdef}; bcdefg: {bcde,cdef,defg} → sym 2, total 6
    assert row[0] == pytest.approx(_f32(2 / 6))
    assert row[1] == 0.0
    assert row[2] == 1.0  # one-sided empty: sym = total
    assert row[3] == 0.0  # both gram-less → 0/max(0,1)
    assert row[4] == 0.0


def test_ngram_case_and_utf8_variants(spark):
    row = one(
        spark,
        "SELECT ngramDistance('ClickHouse', 'clickhouse') AS cs,"
        " ngramDistanceCaseInsensitive('ClickHouse', 'clickhouse') AS ci,"
        " ngramDistanceUTF8('строение', 'строение') AS u8_same,"
        " ngramDistanceCaseInsensitiveUTF8('СТРОЕНИЕ', 'строение') AS u8_ci,"
        " ngramDistance('строение', 'строение') AS bytes_same",
    )
    # shared grams of the case pair: 'lick','ouse' (×2 each) → 10/14
    assert row[0] == pytest.approx(_f32(10 / 14))
    assert row[1] == 0.0
    assert row[2] == 0.0
    assert row[3] == 0.0  # full Unicode lowering on codepoints
    assert row[4] == 0.0  # byte variant: same bytes → 0 too


def test_ngram_search_values(spark):
    row = one(
        spark,
        "SELECT ngramSearch('ClickHouse', 'House') AS hit,"
        " ngramSearch('ClickHouse', 'oust') AS miss,"
        " ngramSearch('ClickHouse', 'Hous,mous') AS half,"
        " ngramSearch('anything', 'ab') AS gramless_needle",
    )
    assert row[0] == 1.0  # both 'Hous','ouse' present
    assert row[1] == 0.0
    # needle grams {Hous, ous,, us,m, s,mo, ,mou, mous}: only Hous found
    assert row[2] == pytest.approx(_f32(1.0 - _f32(5) / _f32(6)))
    assert row[3] == 1.0  # needle shorter than 4 → trivially found


def test_min_sample_size_closed_forms(spark):
    row = one(
        spark,
        "SELECT minSampleSizeConversion(0.025, 0.01, 0.80, 0.05) AS c,"
        " minSampleSizeContinous(112.25, 21.1, 0.03, 0.80, 0.05) AS m,"
        " minSampleSizeContinuous(112.25, 21.1, 0.03, 0.80, 0.05) AS m2",
    )
    z = 1.9599639845400545 + 0.8416212335729143
    p1, p2 = 0.025, 0.035
    n = z * z * (p1 * (1 - p1) + p2 * (1 - p2)) / 0.01**2
    assert row[0]["_1"] == pytest.approx(n, rel=1e-12)
    assert row[0]["_2"] == pytest.approx(0.015)
    assert row[0]["_3"] == pytest.approx(0.035)
    nc = z * z * 2 * 21.1**2 / (0.03 * 112.25) ** 2
    assert row[1]["_1"] == pytest.approx(nc, rel=1e-12)
    assert row[1]["_2"] == pytest.approx(112.25 * 0.97)
    assert row[1]["_3"] == pytest.approx(112.25 * 1.03)
    assert row[2] == row[1]  # the docs' corrected spelling aliases CH's


def test_min_sample_size_guided_errors():
    with pytest.raises(DialectError, match="numeric literals"):
        translate("SELECT minSampleSizeConversion(0.025, 0.01, pw, 0.05)")
    with pytest.raises(DialectError, match="in \\(0, 1\\)"):
        translate("SELECT minSampleSizeConversion(0.025, 0.01, 1.80, 0.05)")
    with pytest.raises(DialectError, match="takes 5"):
        translate("SELECT minSampleSizeContinous(1.0, 2.0, 0.8, 0.05)")


def test_multisearch_first_index_ties(spark):
    """r10 verdict note #6: the struct-min encoding of
    multiSearchFirstIndex (leftmost position, tie → lowest needle index)
    deserves explicit tie pins."""
    row = one(
        spark,
        "SELECT multiSearchFirstIndex('Hello World', ['World', 'Hello'])"
        "   AS plain,"
        # both needles match at position 1 → lowest needle index wins
        " multiSearchFirstIndex('abcabc', ['abc', 'ab']) AS tie,"
        " multiSearchFirstIndex('abcabc', ['ab', 'abc']) AS tie2,"
        # a later-listed needle matching EARLIER wins on position first
        " multiSearchFirstIndex('xabcy', ['bcy', 'xab']) AS pos_first,"
        # not-found needles mix with found ones without disturbing the min
        " multiSearchFirstIndex('abc', ['zzz', 'bc', 'qqq']) AS mixed,"
        " multiSearchFirstIndex('abc', ['zzz', 'qqq']) AS none_found",
    )
    assert list(row) == [2, 1, 1, 2, 2, 0]


def test_multisearch_first_position_ties(spark):
    row = one(
        spark,
        "SELECT multiSearchFirstPosition('Hello World', ['or', 'Wor'])"
        "   AS p1,"
        " multiSearchFirstPosition('abc', ['zz', 'c', 'b']) AS p2,"
        " multiSearchFirstPosition('abc', ['zz']) AS p0",
    )
    # 'Wor' at 7 beats 'or' at 8 — leftmost across ALL needles
    assert list(row) == [7, 2, 0]
