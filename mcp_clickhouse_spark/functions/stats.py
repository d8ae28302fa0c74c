"""Statistical special functions backing the hypothesis-test aggregates.

ClickHouse ships studentTTest / welchTTest / mannWhitneyUTest /
kolmogorovSmirnovTest / meanZTest as aggregate functions returning
``(statistic, p_value)`` tuples (reference: the mcp-clickhouse server
exposes them verbatim through ClickHouse; the algorithms themselves are
the textbook ones — pooled/Welch t, rank-sum normal approximation with
tie + continuity corrections, the Kolmogorov asymptotic series).

Spark SQL has no regularized-incomplete-beta / erfc builtin, so the final
statistic→p-value map rides on Arrow-batched pandas UDFs backed by stdlib
``math`` (lgamma, erfc, log1p) — full double precision, no SciPy.  The
test statistic itself is computed JVM-side by the dialect templates
(conditional moment aggregates / rank folds); only ONE row PER GROUP
crosses into Python, so the Python cost is O(groups), not O(rows) —
negligible at any scale, including a 1000-executor cluster.

Numerical notes
---------------
* ``betainc_reg`` uses the modified-Lentz continued fraction
  (Numerical Recipes §6.4 formulation — public-domain mathematics),
  switching tails at x = (a+1)/(a+b+2) for convergence; verified in
  tests against closed forms (I_x(a,1), I_x(1,b), symmetry) and against
  direct Simpson integration of the beta density.
* ``t_sf(t, df)`` = P(T > t) = ½·I_{df/(df+t²)}(df/2, ½) for t ≥ 0.
* ``norm_ppf`` brackets with bisection then polishes with Newton steps
  on erfc — exact to double precision, no rational-approximation
  coefficient tables needed.
* ``ks_q(λ)`` is the two-sided asymptotic survival function
  Q(λ) = 2·Σ_{k≥1} (−1)^{k−1} e^{−2k²λ²} (Kolmogorov's series).
"""

from __future__ import annotations

import math

import pandas as pd  # module-level: pandas_udf resolves stringified hints

_NAN = float("nan")


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta (modified Lentz)."""
    max_it, eps, fpmin = 300, 3e-16, 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < fpmin:
        d = fpmin
    d = 1.0 / d
    h = d
    for m in range(1, max_it + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < fpmin:
            d = fpmin
        c = 1.0 + aa / c
        if abs(c) < fpmin:
            c = fpmin
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < fpmin:
            d = fpmin
        c = 1.0 + aa / c
        if abs(c) < fpmin:
            c = fpmin
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < eps:
            break
    return h


def betainc_reg(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b) for a, b > 0, x in [0, 1]."""
    if math.isnan(a) or math.isnan(b) or math.isnan(x):
        return _NAN
    if a <= 0.0 or b <= 0.0:
        return _NAN
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_bt = (
        math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
        + a * math.log(x)
        + b * math.log1p(-x)
    )
    bt = math.exp(ln_bt)
    if x < (a + 1.0) / (a + b + 2.0):
        return bt * _betacf(a, b, x) / a
    return 1.0 - bt * _betacf(b, a, 1.0 - x) / b


def t_sf(t: float, df: float) -> float:
    """Student-t survival function P(T > t) with ``df`` degrees of freedom."""
    if math.isnan(t) or math.isnan(df) or df <= 0.0:
        return _NAN
    if math.isinf(t):
        return 0.0 if t > 0 else 1.0
    t2 = t * t
    if t2 < df:
        # near the median x = df/(df+t²) → 1 loses precision; the
        # complementary identity I_x(a,b) = 1 − I_{1−x}(b,a) keeps the
        # argument small where the CDF changes fastest
        p = 0.5 * (1.0 - betainc_reg(0.5, df / 2.0, t2 / (df + t2)))
    else:
        p = 0.5 * betainc_reg(df / 2.0, 0.5, df / (df + t2))
    return p if t >= 0.0 else 1.0 - p


def norm_sf(z: float) -> float:
    """Standard normal survival function P(Z > z)."""
    if math.isnan(z):
        return _NAN
    return 0.5 * math.erfc(z / math.sqrt(2.0))


def norm_ppf(p: float) -> float:
    """Standard normal quantile (inverse CDF), double precision.

    Bisection bracket on [-40, 40] down to ~1e-8, then Newton polish on
    ``cdf(x) − p`` (derivative = the normal pdf) to machine precision.
    """
    if math.isnan(p) or p <= 0.0 or p >= 1.0:
        if p == 0.0:
            return float("-inf")
        if p == 1.0:
            return float("inf")
        return _NAN
    lo, hi = -40.0, 40.0
    for _ in range(60):
        mid = 0.5 * (lo + hi)
        if 1.0 - norm_sf(mid) < p:
            lo = mid
        else:
            hi = mid
    x = 0.5 * (lo + hi)
    for _ in range(4):
        err = (1.0 - norm_sf(x)) - p
        pdf = math.exp(-0.5 * x * x) / math.sqrt(2.0 * math.pi)
        if pdf <= 0.0:
            break
        x -= err / pdf
    return x


def t_ppf(p: float, df: float) -> float:
    """Student-t quantile (inverse CDF) via bisection on ``t_sf``.

    Used for the confidence-interval forms studentTTest(cl) /
    welchTTest(cl).  60 bisection steps on a wide bracket reach double
    precision for every df ≥ 1 the tests produce.
    """
    if math.isnan(p) or math.isnan(df) or df <= 0.0:
        return _NAN
    if p <= 0.0:
        return float("-inf")
    if p >= 1.0:
        return float("inf")
    lo, hi = -1e8, 1e8
    for _ in range(220):
        mid = 0.5 * (lo + hi)
        if 1.0 - t_sf(mid, df) < p:
            lo = mid
        else:
            hi = mid
        if hi - lo <= 1e-14 * max(1.0, abs(lo)):
            break
    return 0.5 * (lo + hi)


def ks_q(lam: float) -> float:
    """Kolmogorov distribution survival Q(λ) = 2Σ(−1)^{k−1}e^{−2k²λ²}."""
    if math.isnan(lam):
        return _NAN
    if lam <= 0.0:
        return 1.0
    s = 0.0
    for k in range(1, 101):
        term = ((-1.0) ** (k - 1)) * math.exp(-2.0 * k * k * lam * lam)
        s += term
        if abs(term) < 1e-18:
            break
    return min(1.0, max(0.0, 2.0 * s))


def _map2(xs: pd.Series, ys: pd.Series, fn) -> pd.Series:
    out = [
        _NAN
        if x is None or y is None
        else fn(float(x), float(y))
        for x, y in zip(xs, ys)
    ]
    return pd.Series(out, dtype="float64")


def ensure_registered(spark) -> None:
    """Register the ``ch_*`` statistical UDFs on this session.

    Unconditional overwrite like ``murmur.ensure_registered`` — cheap,
    idempotent, and immune to recycled-session-address staleness.
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def _t_sf(t: pd.Series, df: pd.Series) -> pd.Series:
        return _map2(t, df, t_sf)

    @pandas_udf(DoubleType())
    def _norm_sf(z: pd.Series) -> pd.Series:
        return z.astype("float64").map(norm_sf, na_action=None)

    @pandas_udf(DoubleType())
    def _norm_ppf(p: pd.Series) -> pd.Series:
        return p.astype("float64").map(norm_ppf, na_action=None)

    @pandas_udf(DoubleType())
    def _ks_q(lam: pd.Series) -> pd.Series:
        return lam.astype("float64").map(ks_q, na_action=None)

    @pandas_udf(DoubleType())
    def _t_ppf(p: pd.Series, df: pd.Series) -> pd.Series:
        return _map2(p, df, t_ppf)

    spark.udf.register("ch_t_sf", _t_sf)
    import math

    @pandas_udf(DoubleType())
    def _lgamma(x: pd.Series) -> pd.Series:
        def lg(v: float) -> float:
            try:
                return math.lgamma(v)
            except ValueError:  # poles at 0, -1, -2, … → +inf like C lgamma
                return math.inf
        # CH lgamma: log|Γ(x)|; math.lgamma matches C's lgamma exactly
        return x.astype("float64").map(lg, na_action="ignore")

    @pandas_udf(DoubleType())
    def _tgamma(x: pd.Series) -> pd.Series:
        def g(v: float) -> float:
            try:
                return math.gamma(v)
            except ValueError:
                # C tgamma (and CH) returns ±inf at the ±0 pole; the
                # negative-integer poles are domain errors → NaN
                # (round-11 advisor fix: ±0 previously fell into NaN)
                if v == 0.0:
                    return math.copysign(math.inf, v)
                return math.nan
            except OverflowError:
                return math.inf
        return x.astype("float64").map(g, na_action="ignore")

    spark.udf.register("ch_norm_sf", _norm_sf)
    spark.udf.register("ch_norm_ppf", _norm_ppf)
    spark.udf.register("ch_ks_q", _ks_q)
    spark.udf.register("ch_t_ppf", _t_ppf)
    @pandas_udf(DoubleType())
    def _erf(x: pd.Series) -> pd.Series:
        return x.astype("float64").map(math.erf, na_action="ignore")

    @pandas_udf(DoubleType())
    def _erfc(x: pd.Series) -> pd.Series:
        return x.astype("float64").map(math.erfc, na_action="ignore")

    spark.udf.register("ch_lgamma", _lgamma)
    spark.udf.register("ch_tgamma", _tgamma)
    spark.udf.register("ch_erf", _erf)
    spark.udf.register("ch_erfc", _erfc)
