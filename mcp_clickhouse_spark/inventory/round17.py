"""Round-17 oracle-checked closures (ADVICE.md r16 fixes + the
case-conversion policy adjudicated by the r16 judge).

``scalar_round17`` drives each through the delegated-SQL path against
an independent DuckDB reconstruction:

- NON-ASCII CASE CONVERSION: the code-point policy (dialect.py module
  docstring) makes un-suffixed upper/lower == upperUTF8/lowerUTF8
  (full Unicode), a documented delta vs ClickHouse's ASCII-only forms.
  DuckDB's upper/lower are an independent full-Unicode implementation,
  so they are a true twin for the policy's OUTPUT (not for CH's);
  'ß' is excluded (Java says 'SS', ICU says 'ẞ' — the one code point
  where the two Unicode implementations diverge);
- positionCaseInsensitive with a non-ASCII needle (oracle = literal
  length arithmetic, independent of any case folding);
- the ``_bind_once`` SUBQUERY fallback: a >200-char division operand
  against a scalar-subquery denominator must expand directly (Spark
  rejects subqueries inside higher-order functions) — this is the
  advisor-r16 regression repro, driven end-to-end;
- generic typed ``JSONExtract(json, key, 'Int64')`` of a float value
  truncates (200.0 → 200) instead of returning the 0 type default;
- ``JSON_QUERY``/``JSON_VALUE`` classify via the VARIANT round-trip:
  numeric-looking JSON strings stay QUOTED in JSON_QUERY output and
  unquoted scalars come back exactly from JSON_VALUE.

Reference contract basis: verbatim SQL delegation in
/root/reference/mcp_clickhouse/mcp_server.py:425.
"""

from __future__ import annotations

from mcp_clickhouse_spark.inventory.registry import query, t

# > 200 chars once rendered, so the division pre-pass reaches the
# _bind_once threshold and the subquery check is load-bearing.
_LONG_SUM = " + ".join(["o_orderkey"] * 24)

_SQL_R17_CH = f"""
SELECT o_orderkey,
  upper(concat('münchen-', lower(o_orderpriority))) AS ucp,
  lower(concat('ÄBC/', o_orderpriority)) AS lcp,
  toInt64(positionCaseInsensitive(concat(o_orderpriority, 'ÄBC'),
                                  'äb')) AS pci,
  round(({_LONG_SUM}) / (SELECT avg(toFloat64(o_orderkey)) FROM orders),
        6) AS dsq,
  JSONExtract(concat('{{"a":', toString(o_orderkey % 50), '.5}}'),
              'a', 'Int64') AS jei,
  JSON_QUERY(concat('{{"s":"', toString(o_orderkey % 10), '"}}'),
             '$.s') AS jq,
  JSON_VALUE(concat('{{"s":"', toString(o_orderkey % 10), '"}}'),
             '$.s') AS jv
FROM orders
"""

# Independent reconstruction: DuckDB's own full-Unicode upper/lower
# (independent twin for the policy output), literal length arithmetic
# for the case-insensitive position, DuckDB's native scalar subquery
# for the division, and literal string assembly for the JSON columns.
_SQL_R17_ORACLE = f"""
SELECT o_orderkey,
  upper('münchen-' || lower(o_orderpriority)) AS ucp,
  lower('ÄBC/' || o_orderpriority) AS lcp,
  CAST(length(o_orderpriority) + 1 AS BIGINT) AS pci,
  round(({_LONG_SUM}) / (SELECT avg(CAST(o_orderkey AS DOUBLE))
                           FROM orders), 6) AS dsq,
  CAST(o_orderkey % 50 AS BIGINT) AS jei,
  '["' || CAST(o_orderkey % 10 AS VARCHAR) || '"]' AS jq,
  CAST(o_orderkey % 10 AS VARCHAR) AS jv
FROM orders
"""


@query("scalar_round17", oracle=_SQL_R17_ORACLE, category="scalars")
def scalar_round17(spark, sf_dir):
    """Round-17 advisor + policy closures end-to-end (module docstring
    lists the contracts; value pins in tests/test_r17_fixes.py).  The
    division column renders past the _bind_once threshold WITH a
    scalar subquery denominator — exactly the advisor-r16 regression
    shape — and the JSON columns are data-driven so the variant
    classification runs per-row, not constant-folded."""
    from mcp_clickhouse_spark.dialect import translate
    from mcp_clickhouse_spark.functions import register_lazy_udfs

    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    out = translate(_SQL_R17_CH)
    register_lazy_udfs(spark, out)
    return spark.sql(out)


# Round-17 wave-2 closures: the parse-side %-token audit
# (scripts/parse_audit.py, 139 cases vs Python strptime + DuckDB
# strptime) and the frameless leadInFrame default-frame semantics.
#
# - %y century pivot (the audit's REAL find): MySQL/CH map 70-99 →
#   19xx where Java's 'yy' said 20xx.  DuckDB strptime pivots POSIX
#   (69 → 1969 vs MySQL 2069), so the driven domain EXCLUDES 69 —
#   everywhere else the two conventions agree and DuckDB is a true
#   independent twin.
# - %k (unpadded hour) parse + compact-format parseDateTimeBestEffort
#   round-trip over the real o_orderdate domain.
# - frameless leadInFrame under CH's default frame (RANGE UNBOUNDED
#   PRECEDING → CURRENT ROW) reaches only PEERS of the current row:
#   projecting the ORDER BY key itself keeps the result deterministic
#   under tie-order (each peer group yields cnt-1 dates + 1 NULL); the
#   oracle reconstructs that multiset from peer-group positions, not
#   from any lead().
_SQL_R17B_CH = """
SELECT o_custkey,
  toDate(parseDateTime(
    concat(leftPad(toString(if(o_orderkey % 100 = 69, 70,
                               o_orderkey % 100)), 2, '0'),
           '-03-15'), '%y-%m-%d')) AS ypiv,
  parseDateTime(concat('2010-03-04 ', toString(o_orderkey % 24), ':08'),
                '%Y-%m-%d %k:%i') AS khr,
  toDate(parseDateTimeBestEffort(
    formatDateTime(o_orderdate, '%Y%m%d'))) AS bed,
  leadInFrame(o_orderdate) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate) AS lif
FROM orders
"""

_SQL_R17B_ORACLE = """
SELECT o_custkey,
  CAST(strptime(lpad(CAST(CASE WHEN o_orderkey % 100 = 69 THEN 70
                          ELSE o_orderkey % 100 END AS VARCHAR), 2, '0')
                || '-03-15', '%y-%m-%d') AS DATE) AS ypiv,
  strptime('2010-03-04 ' || CAST(o_orderkey % 24 AS VARCHAR) || ':08',
           '%Y-%m-%d %-H:%M') AS khr,
  CAST(o_orderdate AS DATE) AS bed,
  CASE WHEN row_number() OVER (PARTITION BY o_custkey, o_orderdate
                               ORDER BY o_orderkey)
            < count(*) OVER (PARTITION BY o_custkey, o_orderdate)
       THEN o_orderdate ELSE NULL END AS lif
FROM orders
"""


@query("scalar_round17b", oracle=_SQL_R17B_ORACLE, category="scalars")
def scalar_round17b(spark, sf_dir):
    """Round-17 wave-2 closures end-to-end (see the _SQL_R17B_CH
    comment block; pins in tests/test_r17_fixes.py and the
    139-case scripts/parse_audit.py run).  o%100 sweeps both sides of
    the MySQL century pivot; o%24 sweeps single- and double-digit %k
    hours; the leadInFrame column has real peer groups (customers with
    several same-day orders) and real singletons."""
    from mcp_clickhouse_spark.dialect import translate

    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(translate(_SQL_R17B_CH))


# Round-17 waves E + F closures (DST/calendar-arithmetic probe):
#
# - addDays/subtractDays now keep the time-of-day on DateTime inputs
#   (the former date_add cast TIMESTAMP → DATE and silently dropped it);
# - age() hour/minute/second are PHYSICAL epoch-ordinal diffs with a
#   wall finer-component adjustment (CH's DateDiffImpl), replacing
#   Spark's wall-clock timestampdiff that drifted by the DST shift and
#   truncates toward zero differently;
# - compound interval strings (INTERVAL '1 month 3 day') distribute
#   left-associatively over +/- (Spark rejects mixed-field strings).
#
# The oracle reconstructs each from arithmetic primitives (interval
# adds, integer division), never from DuckDB's own age().
_SQL_R17C_CH = """
SELECT o_orderkey,
  toString(addDays(addSeconds(toDateTime(o_orderdate), 45296),
                   o_orderkey % 5)) AS adk,
  age('hour', toDateTime(o_orderdate),
      addMinutes(toDateTime(o_orderdate), o_orderkey % 200)) AS agh,
  age('second', addSeconds(toDateTime(o_orderdate), o_orderkey % 90),
      toDateTime(o_orderdate)) AS agn,
  toString(toDate(o_orderdate) + INTERVAL '1 month 3 day') AS cmi
FROM orders
"""

_SQL_R17C_ORACLE = """
SELECT o_orderkey,
  strftime(CAST(o_orderdate AS TIMESTAMP) + INTERVAL 45296 SECOND
           + to_days(CAST(o_orderkey % 5 AS INT)),
           '%Y-%m-%d %H:%M:%S') AS adk,
  CAST((o_orderkey % 200) // 60 AS BIGINT) AS agh,
  CAST(-(o_orderkey % 90) AS BIGINT) AS agn,
  strftime(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH + INTERVAL 3 DAY,
           '%Y-%m-%d') AS cmi
FROM orders
"""


@query("scalar_round17c", oracle=_SQL_R17C_ORACLE, category="scalars")
def scalar_round17c(spark, sf_dir):
    """Round-17 waves E+F end-to-end (see the _SQL_R17C_CH comment
    block; DST vectors pinned in tests/test_r17_fixes.py — the driver
    data is DST-free midnights, so the time-keeping/complete-unit
    semantics are what this query drives).  o%5 sweeps day offsets over
    month boundaries, o%200 sweeps 0-3 complete hours incl. exact-hour
    edges, o%90 sweeps the negative age direction."""
    from mcp_clickhouse_spark.dialect import translate

    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(translate(_SQL_R17C_CH))


# Round-17 wave H: fed-but-degenerate statistics are ClickHouse Float64
# 0/0 = nan, not NULL (and native Spark corr ANSI-THROWS — corrStable/
# corrMatrix crashed on zero variance before the wave).  The composite
# key plants all three branches: o%5 rows become singleton groups
# (n = 1 → nan for every sample statistic), the rest form ~200 groups of
# real data, and g%7 == 0 groups get a CONSTANT column (zero variance →
# corr/skew nan at n >= 2).  Values are scale-normalized (/1e5) so the
# round(…, 6) guard is far above both engines' accumulation-order ULPs.
# The oracle reconstructs the nan conditions structurally (COUNT = 1,
# MIN = MAX — exact comparisons, no float tolerance) because DuckDB's
# own sample aggregates return NULL on n = 1, and nan itself cannot
# cross the driver hash — each statistic ships as (flag, guarded value).
#
# Wave L (same round): the sam/cam columns drive the -ArgMin/-ArgMax
# combinators (sumArgMin = sum over only the rows holding the group's
# minimal key; ties ALL participate — okd = o%7 plants real ties).  The
# summed value is exact integer CENTS (toInt64(round(price*100))): a
# float sum rounded at 1e-6 flipped the driver hash on 3 of 3200 groups
# (engine summation order), integers cannot.  The oracle reconstructs
# via window MIN/MAX over the group (DuckDB has no such combinator).
_SQL_R17H_CH = """
SELECT g,
  toInt64(count(1)) AS n,
  toInt64(if(isNaN(varSamp(tp)), 1, 0)) AS vs_nan,
  round(if(isNaN(varSamp(tp)), 0, varSamp(tp)), 6) AS vs_val,
  round(if(isNaN(stddevSamp(tp)), 0, stddevSamp(tp)), 6) AS sd_val,
  toInt64(if(isNaN(covarSamp(tp, ok)), 1, 0)) AS cv_nan,
  round(if(isNaN(covarSamp(tp, ok)), 0, covarSamp(tp, ok)), 6) AS cv_val,
  toInt64(if(isNaN(corr(tpc, ok)), 1, 0)) AS cr_nan,
  round(if(isNaN(corr(tpc, ok)), 0, corr(tpc, ok)), 6) AS cr_val,
  toInt64(if(isNaN(skewSamp(tpc)), 1, 0)) AS sk_nan,
  toInt64(if(isNaN(boundingRatio(ok, tp)), 1, 0)) AS br_nan,
  round(if(isNaN(boundingRatio(ok, tp)), 0, boundingRatio(ok, tp)), 6) AS br_val,
  toInt64(sumArgMin(tpi, okd)) AS sam,
  toInt64(countArgMax(tp, okd)) AS cam
FROM (
  SELECT g, tp, ok, okd, tpi,
         CASE WHEN g % 7 = 0 THEN 3.25 ELSE tp END AS tpc
  FROM (
    SELECT CASE WHEN o_orderkey % 5 = 0 THEN 100000 + o_orderkey
                ELSE o_custkey % 200 END AS g,
           o_totalprice / 100000 AS tp,
           toInt64(round(o_totalprice * 100)) AS tpi,
           toFloat64(o_orderkey) / 100000 AS ok,
           o_orderkey % 7 AS okd
    FROM orders
  )
)
GROUP BY g
"""

_SQL_R17H_ORACLE = """
SELECT g,
  CAST(COUNT(1) AS BIGINT) AS n,
  CAST(CASE WHEN COUNT(1) = 1 THEN 1 ELSE 0 END AS BIGINT) AS vs_nan,
  ROUND(CASE WHEN COUNT(1) = 1 THEN 0 ELSE VAR_SAMP(tp) END, 6) AS vs_val,
  ROUND(CASE WHEN COUNT(1) = 1 THEN 0 ELSE STDDEV_SAMP(tp) END, 6) AS sd_val,
  CAST(CASE WHEN COUNT(1) = 1 THEN 1 ELSE 0 END AS BIGINT) AS cv_nan,
  ROUND(CASE WHEN COUNT(1) = 1 THEN 0 ELSE COVAR_SAMP(tp, ok) END, 6) AS cv_val,
  CAST(CASE WHEN COUNT(1) = 1 OR MIN(tpc) = MAX(tpc) THEN 1 ELSE 0 END
       AS BIGINT) AS cr_nan,
  ROUND(CASE WHEN COUNT(1) = 1 OR MIN(tpc) = MAX(tpc) THEN 0
        ELSE CORR(tpc, ok) END, 6) AS cr_val,
  CAST(CASE WHEN COUNT(1) = 1 OR MIN(tpc) = MAX(tpc) THEN 1 ELSE 0 END
       AS BIGINT) AS sk_nan,
  CAST(CASE WHEN COUNT(1) = 1 THEN 1 ELSE 0 END AS BIGINT) AS br_nan,
  ROUND(CASE WHEN COUNT(1) = 1 THEN 0
        ELSE (ARG_MAX(tp, ok) - ARG_MIN(tp, ok)) / (MAX(ok) - MIN(ok))
        END, 6) AS br_val,
  CAST(SUM(CASE WHEN okd = mn_okd THEN tpi END) AS BIGINT) AS sam,
  CAST(COUNT(CASE WHEN okd = mx_okd THEN 1 END) AS BIGINT) AS cam
FROM (
  SELECT g, tp, ok, okd, tpi,
         MIN(okd) OVER (PARTITION BY g) AS mn_okd,
         MAX(okd) OVER (PARTITION BY g) AS mx_okd,
         CASE WHEN g % 7 = 0 THEN 3.25 ELSE tp END AS tpc
  FROM (
    SELECT CASE WHEN o_orderkey % 5 = 0 THEN 100000 + o_orderkey
                ELSE o_custkey % 200 END AS g,
           o_totalprice / 100000 AS tp,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS tpi,
           CAST(o_orderkey AS DOUBLE) / 100000 AS ok,
           o_orderkey % 7 AS okd
    FROM orders
  ) s1
) s2
GROUP BY g
"""


@query("agg_stats_edges", oracle=_SQL_R17H_ORACLE, category="aggregates")
def agg_stats_edges(spark, sf_dir):
    """Round-17 wave H end-to-end (see the _SQL_R17H_CH comment block;
    the full family incl. corrStable/corrMatrix/simpleLinearRegression/
    rankCorr and the combinator interactions is pinned in
    tests/test_r17_fixes.py::TestRound17WaveH)."""
    from mcp_clickhouse_spark.dialect import translate

    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(translate(_SQL_R17H_CH))
