"""Hypothesis-test aggregates and their special-function backbone.

The p-value math (functions/stats.py) is validated three independent
ways: closed forms of the Student-t CDF for small integer df, direct
Simpson integration of the beta density, and ClickHouse's own documented
mannWhitneyUTest example output (docs: sql-reference/aggregate-functions/
reference/mannwhitneyutest.md → (9, 0.04042779918503192)).
"""

import math

import pytest

from mcp_clickhouse_spark.functions import stats


# ---------- pure-math layer -------------------------------------------------


def _simpson_beta_cdf(a: float, b: float, x: float, steps: int = 4000) -> float:
    """I_x(a,b) by direct Simpson integration of the beta density."""
    ln_norm = math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)

    def pdf(t: float) -> float:
        if t <= 0.0 or t >= 1.0:
            return 0.0
        return math.exp(ln_norm + (a - 1) * math.log(t) + (b - 1) * math.log1p(-t))

    h = x / steps
    s = pdf(0.0) + pdf(x)
    for i in range(1, steps):
        s += pdf(i * h) * (4 if i % 2 else 2)
    return s * h / 3.0


def test_betainc_identities():
    # I_x(a,1) = x^a, I_x(1,b) = 1-(1-x)^b, symmetry I_x(a,b)=1-I_{1-x}(b,a)
    for x in (0.05, 0.3, 0.7, 0.95):
        assert stats.betainc_reg(2.5, 1.0, x) == pytest.approx(x**2.5, rel=1e-12)
        assert stats.betainc_reg(1.0, 3.5, x) == pytest.approx(
            1 - (1 - x) ** 3.5, rel=1e-12
        )
        for a, b in ((0.5, 0.5), (2.0, 7.0), (10.0, 3.0)):
            assert stats.betainc_reg(a, b, x) == pytest.approx(
                1.0 - stats.betainc_reg(b, a, 1.0 - x), abs=1e-13
            )
    assert stats.betainc_reg(3.0, 4.0, 0.0) == 0.0
    assert stats.betainc_reg(3.0, 4.0, 1.0) == 1.0


def test_betainc_against_integration():
    # Simpson needs a, b ≥ 1 (no endpoint singularity); the a = b = ½
    # arcsine-law closed form covers the singular case exactly
    for a, b, x in [(2.0, 5.0, 0.4), (7.5, 2.5, 0.8),
                    (1.5, 1.5, 0.5), (4.0, 4.0, 0.2)]:
        # Simpson's own convergence (not betainc) limits the tolerance:
        # non-integer a,b have fractional-power endpoint behaviour
        assert stats.betainc_reg(a, b, x) == pytest.approx(
            _simpson_beta_cdf(a, b, x), abs=5e-6
        )
    for x in (0.1, 0.3, 0.9):
        assert stats.betainc_reg(0.5, 0.5, x) == pytest.approx(
            2.0 / math.pi * math.asin(math.sqrt(x)), rel=1e-12
        )


def test_t_sf_closed_forms():
    # df=1 (Cauchy): sf(t) = 1/2 - atan(t)/pi; df=2: sf = (1 - t/sqrt(2+t^2))/2
    for t in (-3.0, -0.5, 0.0, 0.7, 2.5, 10.0):
        assert stats.t_sf(t, 1.0) == pytest.approx(
            0.5 - math.atan(t) / math.pi, abs=1e-13
        )
        assert stats.t_sf(t, 2.0) == pytest.approx(
            0.5 * (1 - t / math.sqrt(2 + t * t)), abs=1e-13
        )
    # symmetry and tails
    assert stats.t_sf(1.7, 11.0) + stats.t_sf(-1.7, 11.0) == pytest.approx(1.0)
    assert stats.t_sf(float("inf"), 5.0) == 0.0
    assert math.isnan(stats.t_sf(1.0, 0.0))


def test_norm_and_ppf_roundtrips():
    assert stats.norm_sf(0.0) == pytest.approx(0.5)
    assert stats.norm_sf(1.959963984540054) == pytest.approx(0.025, rel=1e-10)
    for p in (0.001, 0.025, 0.5, 0.8, 0.999):
        assert 1.0 - stats.norm_sf(stats.norm_ppf(p)) == pytest.approx(
            p, abs=1e-12
        )
    # the classic two-sided 95% critical value
    assert stats.norm_ppf(0.975) == pytest.approx(1.959963984540054, abs=1e-9)


def test_t_ppf_roundtrip_and_known_value():
    # t_crit(0.975, df=4) = 2.7764451051977987 (standard t-table value)
    assert stats.t_ppf(0.975, 4.0) == pytest.approx(2.776445105, abs=1e-6)
    for p, df in ((0.9, 3.0), (0.05, 7.0), (0.5, 2.0), (0.999, 30.0)):
        assert 1.0 - stats.t_sf(stats.t_ppf(p, df), df) == pytest.approx(
            p, abs=1e-10
        )
    assert stats.t_ppf(0.5, 9.0) == pytest.approx(0.0, abs=1e-9)


def test_ks_q_known_values():
    # Q(λ) survival: Q(1.3581) ≈ 0.05 (the classic 5% point)
    assert stats.ks_q(0.0) == 1.0
    assert stats.ks_q(1.3581015) == pytest.approx(0.05, abs=5e-4)
    assert stats.ks_q(10.0) == pytest.approx(0.0, abs=1e-12)
    assert 0.0 <= stats.ks_q(0.5) <= 1.0


# ---------- SQL layer -------------------------------------------------------


@pytest.fixture(scope="module")
def samples(spark):
    df = spark.createDataFrame(
        [(10.0, 0), (11.0, 0), (12.0, 0), (1.0, 1), (2.0, 1), (3.0, 1)],
        "sample_data double, sample_index int",
    )
    df.createOrReplaceTempView("stats_mt")
    yield
    spark.catalog.dropTempView("stats_mt")


def _one(spark, sql):
    from mcp_clickhouse_spark.tools import run_select_query

    return run_select_query(spark, sql, dialect="clickhouse")["rows"][0][0]


def test_mann_whitney_matches_clickhouse_docs(spark, samples):
    row = _one(
        spark,
        "SELECT mannWhitneyUTest('greater')(sample_data, sample_index)"
        " FROM stats_mt",
    )
    assert row[0] == pytest.approx(9.0)
    # ClickHouse's documented output for this exact dataset
    assert row[1] == pytest.approx(0.04042779918503192, abs=1e-9)
    two = _one(
        spark,
        "SELECT mannWhitneyUTest(sample_data, sample_index) FROM stats_mt",
    )
    assert two[1] == pytest.approx(2 * row[1], rel=1e-9)


def test_mann_whitney_ties_average_ranks(spark):
    spark.createDataFrame(
        [(1.0, 0), (2.0, 0), (2.0, 1), (3.0, 1)],
        "sample_data double, sample_index int",
    ).createOrReplaceTempView("stats_ties")
    row = _one(
        spark,
        "SELECT mannWhitneyUTest(sample_data, sample_index)"
        " FROM stats_ties",
    )
    # ranks: 1, 2.5 | 2.5, 4 → r1 = 3.5, u1 = 3.5 - 3 = 0.5
    assert row[0] == pytest.approx(0.5)
    spark.catalog.dropTempView("stats_ties")


def test_student_and_welch(spark, samples):
    st = _one(
        spark,
        "SELECT studentTTest(sample_data, sample_index) FROM stats_mt",
    )
    # diff = 9, pooled sd = 1, se = sqrt(2/3); df = 4
    t_expected = 9.0 / math.sqrt(2.0 / 3.0)
    assert st[0] == pytest.approx(t_expected, rel=1e-12)
    assert st[1] == pytest.approx(2 * stats.t_sf(t_expected, 4.0), rel=1e-9)
    ci = _one(
        spark,
        "SELECT studentTTest(0.95)(sample_data, sample_index) FROM stats_mt",
    )
    half = 2.7764451051977987 * math.sqrt(2.0 / 3.0)
    assert ci[2] == pytest.approx(9.0 - half, abs=1e-6)
    assert ci[3] == pytest.approx(9.0 + half, abs=1e-6)
    wt = _one(
        spark,
        "SELECT welchTTest(sample_data, sample_index) FROM stats_mt",
    )
    # equal variances and sizes → Welch == Student here
    assert wt[0] == pytest.approx(t_expected, rel=1e-12)


def test_ks_and_mean_z(spark, samples):
    ks = _one(
        spark,
        "SELECT kolmogorovSmirnovTest(sample_data, sample_index)"
        " FROM stats_mt",
    )
    assert ks[0] == pytest.approx(1.0)  # disjoint supports → D = 1
    assert ks[1] == pytest.approx(stats.ks_q(math.sqrt(1.5)), rel=1e-9)
    z = _one(
        spark,
        "SELECT meanZTest(1.0, 1.0, 0.95)(sample_data, sample_index)"
        " FROM stats_mt",
    )
    se = math.sqrt(2.0 / 3.0)
    assert z[0] == pytest.approx(9.0 / se, rel=1e-12)
    assert z[2] == pytest.approx(9.0 - 1.959963984540054 * se, abs=1e-8)


def test_degenerate_group_is_null_or_nan(spark):
    spark.createDataFrame(
        [(1.0, 0)], "sample_data double, sample_index int"
    ).createOrReplaceTempView("stats_one")
    st = _one(
        spark,
        "SELECT studentTTest(sample_data, sample_index) FROM stats_one",
    )
    assert st[0] is None or math.isnan(st[0])
    spark.catalog.dropTempView("stats_one")


def test_guided_errors(spark):
    from mcp_clickhouse_spark.dialect import DialectError, translate

    with pytest.raises(DialectError, match="alternative"):
        translate("SELECT mannWhitneyUTest('sideways')(x, g) FROM t")
    with pytest.raises(DialectError, match="meanZTest"):
        translate("SELECT meanZTest(x, g) FROM t")
    with pytest.raises(DialectError, match="computation_method"):
        translate(
            "SELECT kolmogorovSmirnovTest('two-sided', 'montecarlo')(x, g)"
            " FROM t"
        )


def test_proportions_z_test(spark):
    # independent closed-form reference (standard two-proportion z-test)
    sx, sy, tx, ty, cl = 10.0, 11.0, 100.0, 101.0, 0.95
    px, py = sx / tx, sy / ty
    diff = px - py
    crit = 1.959963984540054

    def ref(pooled):
        if pooled:
            pp = (sx + sy) / (tx + ty)
            se = math.sqrt(pp * (1 - pp) * (1 / tx + 1 / ty))
        else:
            se = math.sqrt(px * (1 - px) / tx + py * (1 - py) / ty)
        z = diff / se
        p = math.erfc(abs(z) / math.sqrt(2.0))
        return z, p, diff - crit * se, diff + crit * se

    for uv in ("unpooled", "pooled"):
        row = _one(
            spark,
            f"SELECT proportionsZTest(10, 11, 100, 101, 0.95, '{uv}')",
        )
        z, p, lo, hi = ref(uv == "pooled")
        assert row[0] == pytest.approx(z, rel=1e-12)
        assert row[1] == pytest.approx(p, rel=1e-9)
        assert row[2] == pytest.approx(lo, abs=1e-9)
        assert row[3] == pytest.approx(hi, abs=1e-9)

    # zero trials → NULL fields, not an ANSI division error
    row = _one(spark, "SELECT proportionsZTest(0, 1, 0, 10, 0.95, 'unpooled')")
    assert row[0] is None

    from mcp_clickhouse_spark.dialect import DialectError, translate

    with pytest.raises(DialectError, match="pooled"):
        translate("SELECT proportionsZTest(a, b, c, d, 0.95, mode) FROM t")
    with pytest.raises(DialectError, match="exactly"):
        translate("SELECT proportionsZTest(a, b, c) FROM t")
