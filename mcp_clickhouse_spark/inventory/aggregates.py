"""Aggregation inventory — SURVEY.md §2.3.4 (B5-B8 plus delegated surface).

Global aggregates, GROUP BY + HAVING, COUNT DISTINCT, ROLLUP/CUBE/GROUPING
SETS, WITH TOTALS, conditional (-If) aggregates, argMax/argMin (max_by /
min_by), groupArray/groupUniqArray (collect_list/set, canonically sorted),
exact and approximate quantiles, approx distinct (HLL), statistical moments,
and the exact topK shim.

All money sums use exact integer-cents arithmetic (bit-identical to the
DECIMAL oracle formulation, ~2× faster than BigDecimal aggregation); ratio
results are double divisions of exact values.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcp_clickhouse_spark.inventory.registry import query, t
from mcp_clickhouse_spark.operators import top_k, top_k_weighted, with_totals


def _cents(col: str):
    """Exact integer cents — bit-identical to the DECIMAL(12,2) oracle
    formulation and ~2× faster (long vs BigDecimal aggregation)."""
    return F.round(F.col(col) * 100).cast("bigint")


@query(
    "agg_global",
    oracle="""
    SELECT
      COUNT(*) AS n_rows,
      COUNT(DISTINCT c_nationkey) AS n_nations,
      CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal,
      CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_bal,
      MIN(c_acctbal) AS min_bal,
      MAX(c_acctbal) AS max_bal
    FROM customer
    """,
    category="aggregates",
)
def agg_global(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    return c.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("c_nationkey").alias("n_nations"),
        (F.sum(_cents("c_acctbal")) / F.lit(100.0)).alias("sum_bal"),
        (F.sum(_cents("c_acctbal")) / F.lit(100.0) / F.count("*")).alias("avg_bal"),
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
    )


@query(
    "agg_group_having",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
    FROM customer
    GROUP BY c_mktsegment
    HAVING COUNT(*) > 100
    """,
    category="aggregates",
)
def agg_group_having(spark, sf_dir):
    return (
        t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            (F.sum(_cents("c_acctbal")) / F.lit(100.0)).alias("total_bal"),
        )
        .where(F.col("n") > 100)
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
    category="aggregates",
)
def agg_count_distinct(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
        )
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT r_name, n_name, COUNT(*) AS n, GROUPING(r_name) + 2*GROUPING(n_name) AS gid
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    category="aggregates",
)
def agg_rollup(spark, sf_dir):
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    j = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    return j.rollup("r_name", "n_name").agg(
        F.count("*").alias("n"),
        (F.grouping("r_name") + F.lit(2) * F.grouping("n_name")).alias("gid"),
    )


@query(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    category="aggregates",
)
def agg_cube(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT c_mktsegment, c_nationkey, COUNT(*) AS n
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
    """,
    category="aggregates",
)
def agg_grouping_sets(spark, sf_dir):
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_mktsegment, c_nationkey, COUNT(*) AS n
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        """
    )


@query(
    "agg_with_totals",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM orders GROUP BY o_orderpriority
    UNION ALL
    SELECT NULL, COUNT(*), CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
    FROM orders
    """,
    category="aggregates",
)
def agg_with_totals(spark, sf_dir):
    # ClickHouse `GROUP BY … WITH TOTALS` — one aggregation pass via rollup
    # (see operators/with_totals.py), vs the oracle's two-scan UNION ALL.
    return with_totals(
        t(spark, sf_dir, "orders"),
        ["o_orderpriority"],
        [
            F.count("*").alias("n"),
            (F.sum(_cents("o_totalprice")) / F.lit(100.0)).alias("total"),
        ],
    )


@query(
    "agg_conditional",
    oracle="""
    SELECT
      c_mktsegment,
      COUNT(*) FILTER (WHERE c_acctbal > 0) AS n_positive,
      COUNT(*) FILTER (WHERE c_acctbal < 0) AS n_negative,
      CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) FILTER (WHERE c_acctbal > 0) AS DOUBLE) AS sum_positive
    FROM customer GROUP BY c_mktsegment
    """,
    category="aggregates",
)
def agg_conditional(spark, sf_dir):
    # ClickHouse countIf/sumIf — the -If combinator family (§2.3.4).
    c = t(spark, sf_dir, "customer")
    pos = F.col("c_acctbal") > 0
    return c.groupBy("c_mktsegment").agg(
        F.count_if(pos).alias("n_positive"),
        F.count_if(F.col("c_acctbal") < 0).alias("n_negative"),
        (F.sum(F.when(pos, _cents("c_acctbal"))) / F.lit(100.0)).alias("sum_positive"),
    )


@query(
    "agg_minmax_by",
    oracle="""
    SELECT o_orderstatus,
           MAX_BY(o_custkey, o_orderkey) AS last_custkey,
           MIN_BY(o_custkey, o_orderkey) AS first_custkey,
           MAX(o_orderkey) AS max_orderkey
    FROM orders GROUP BY o_orderstatus
    """,
    category="aggregates",
)
def agg_minmax_by(spark, sf_dir):
    # ClickHouse argMax/argMin; ordering key o_orderkey is unique → deterministic.
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.max_by("o_custkey", "o_orderkey").alias("last_custkey"),
            F.min_by("o_custkey", "o_orderkey").alias("first_custkey"),
            F.max("o_orderkey").alias("max_orderkey"),
        )
    )


@query(
    "agg_collect",
    oracle="""
    SELECT r_name,
           array_to_string(list_sort(list(n_name)), ',') AS nations,
           array_to_string(list_sort(list(DISTINCT n_regionkey)), ',') AS region_keys
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    category="aggregates",
)
def agg_collect(spark, sf_dir):
    # groupArray/groupUniqArray → collect_list/collect_set, canonically
    # sorted on both sides (collection order is nondeterministic by design).
    # Serialized with concat_ws: the driver's pandas canonicalizer cannot
    # hash list-valued cells (round-1 RED row), so both engines emit the
    # comma-joined string form instead of a native array.
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_list("n_name"))).alias("nations"),
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_set("n_regionkey")),
                    lambda x: x.cast("string"),
                ),
            ).alias("region_keys"),
        )
    )


@query(
    "agg_quantiles_exact",
    oracle="""
    SELECT o_orderstatus,
           ROUND(QUANTILE_CONT(o_totalprice, 0.5), 4) AS median_price,
           ROUND(QUANTILE_CONT(o_totalprice, 0.9), 4) AS p90_price
    FROM orders GROUP BY o_orderstatus
    """,
    category="aggregates",
)
def agg_quantiles_exact(spark, sf_dir):
    # quantile/median — Spark `percentile` (exact) and DuckDB QUANTILE_CONT
    # share the linear-interpolation definition; rounded to absorb the final
    # interpolation ULP.
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("median_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90_price"),
    )


@query("agg_quantile_approx", category="aggregates")  # rows-only: impl-specific sketch
def agg_quantile_approx(spark, sf_dir):
    # ClickHouse quantileTDigest ≈ Spark percentile_approx (GK sketch) —
    # approximate by contract, so no cross-engine oracle exists.
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(10000)).alias("median_approx")
    )


@query("agg_approx_count_distinct", category="aggregates")  # rows-only: HLL impl-specific
def agg_approx_count_distinct(spark, sf_dir):
    # ClickHouse uniq/uniqHLL12 → approx_count_distinct (HyperLogLog++).
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.approx_count_distinct("o_custkey").alias("approx_customers"))
    )


@query(
    "agg_stats",
    oracle="""
    SELECT c_mktsegment,
           ROUND(STDDEV_SAMP(c_acctbal), 4) AS std_bal,
           ROUND(VAR_SAMP(c_acctbal), 4) AS var_bal,
           ROUND(CORR(c_acctbal, CAST(c_custkey AS DOUBLE)), 6) AS corr_bal_key,
           ROUND(COVAR_POP(c_acctbal, CAST(c_custkey AS DOUBLE)), 4) AS covar_bal_key
    FROM customer GROUP BY c_mktsegment
    """,
    category="aggregates",
)
def agg_stats(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    key_d = F.col("c_custkey").cast("double")
    return c.groupBy("c_mktsegment").agg(
        F.round(F.stddev_samp("c_acctbal"), 4).alias("std_bal"),
        F.round(F.var_samp("c_acctbal"), 4).alias("var_bal"),
        F.round(F.corr(F.col("c_acctbal"), key_d), 6).alias("corr_bal_key"),
        F.round(F.covar_pop(F.col("c_acctbal"), key_d), 4).alias("covar_bal_key"),
    )


@query(
    "agg_topk",
    oracle="""
    SELECT * FROM (
      SELECT l_returnflag, l_suppkey, COUNT(*) AS cnt,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY COUNT(*) DESC, l_suppkey) AS rk
      FROM lineitem GROUP BY l_returnflag, l_suppkey
    ) WHERE rk <= 5
    """,
    category="aggregates",
)
def agg_topk(spark, sf_dir):
    # ClickHouse topK(5)(l_suppkey): 5 most frequent suppliers per returnflag,
    # exact + deterministic (see operators/topk.py).
    return top_k(t(spark, sf_dir, "lineitem"), ["l_returnflag"], "l_suppkey", 5)


@query(
    "agg_topk_weighted",
    oracle="""
    SELECT * FROM (
      SELECT l_returnflag, l_suppkey,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_weight,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY SUM(CAST(l_quantity AS BIGINT)) DESC,
                                         l_suppkey) AS rk
      FROM lineitem GROUP BY l_returnflag, l_suppkey
    ) WHERE rk <= 5
    """,
    category="aggregates",
)
def agg_topk_weighted(spark, sf_dir):
    # ClickHouse topKWeighted(5)(l_suppkey, l_quantity): suppliers carrying
    # the most quantity per returnflag — exact + deterministic
    # (operators/topk.py:top_k_weighted). Quantity is an integral double;
    # the bigint cast makes the weighted sum order-independent on both sides.
    li = t(spark, sf_dir, "lineitem").withColumn(
        "qty_w", F.col("l_quantity").cast("bigint")
    )
    return top_k_weighted(li, ["l_returnflag"], "l_suppkey", "qty_w", 5)


@query(
    "agg_histogram",
    oracle="""
    SELECT LEAST(CAST(trunc(o_totalprice / 50000) AS BIGINT), 9) AS bucket,
           COUNT(*) AS n,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi
    FROM orders GROUP BY bucket
    """,
    category="aggregates",
)
def agg_histogram(spark, sf_dir):
    # ClickHouse histogram()-style binning, realized as deterministic
    # fixed-width buckets (CH's adaptive bins are impl-specific) — one
    # hash aggregation, bucket id computed in the scan stage.
    o = t(spark, sf_dir, "orders")
    bucket = F.least((F.col("o_totalprice") / 50000).cast("bigint"), F.lit(9))
    return o.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )


@query(
    "agg_any_first_last",
    oracle="""
    SELECT o_orderstatus,
           MIN_BY(o_orderpriority, o_orderkey) AS any_priority,
           MAX_BY(o_orderpriority, o_orderkey) AS last_priority
    FROM orders GROUP BY o_orderstatus
    """,
    category="aggregates",
)
def agg_any_first_last(spark, sf_dir):
    # ClickHouse any()/anyLast(): nondeterministic by contract; realized
    # deterministically as first/last in o_orderkey order.
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.min_by("o_orderpriority", "o_orderkey").alias("any_priority"),
            F.max_by("o_orderpriority", "o_orderkey").alias("last_priority"),
        )
    )


@query(
    "agg_weighted_quantile",
    oracle="""
    SELECT l_returnflag,
           MIN(l_extendedprice) AS wq
    FROM (
      SELECT l_returnflag, l_extendedprice,
             SUM(CAST(l_quantity AS BIGINT)) OVER (
               PARTITION BY l_returnflag ORDER BY l_extendedprice
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
             SUM(CAST(l_quantity AS BIGINT)) OVER (
               PARTITION BY l_returnflag) AS tw
      FROM lineitem
    )
    WHERE cw >= 0.5 * tw
    GROUP BY l_returnflag
    """,
    category="aggregates",
)
def agg_weighted_quantile(spark, sf_dir):
    """ClickHouse quantileExactWeighted(0.5)(l_extendedprice, l_quantity)
    per returnflag (round 7, operators/weighted_quantile.py): the median
    price with each row weighted by its quantity — exact, lower
    interpolation, so the result is an actual data value and the
    cross-engine hash compares exactly.  Oracle: the definitional
    cumulative-weight window in DuckDB (integer weights make the
    0.5*total boundary binary-exact on both engines)."""
    from mcp_clickhouse_spark.operators.weighted_quantile import weighted_quantile

    li = t(spark, sf_dir, "lineitem")
    return weighted_quantile(
        li, "l_extendedprice", F.col("l_quantity").cast("bigint"),
        0.5, by=["l_returnflag"],
    )


_SQL_MAP_ENTROPY_CH = """
SELECT l_returnflag AS rf,
       arrayStringConcat(tupleElement(sumMap(array(l_linestatus, 'ALL'),
           array(toInt64(l_quantity), toInt64(l_quantity))), 1), ',')
         AS sm_keys,
       arrayStringConcat(arrayMap(v -> toString(v),
           tupleElement(sumMap(array(l_linestatus, 'ALL'),
               array(toInt64(l_quantity), toInt64(l_quantity))), 2)), ',')
         AS sm_vals,
       arrayStringConcat(arrayMap(v -> toString(v),
           tupleElement(minMap(array(l_linestatus),
               array(toInt64(l_quantity))), 2)), ',') AS mn_vals,
       arrayStringConcat(arrayMap(v -> toString(v),
           tupleElement(maxMap(array(l_linestatus),
               array(toInt64(l_quantity))), 2)), ',') AS mx_vals,
       round(entropy(l_quantity), 9) AS ent
FROM lineitem GROUP BY l_returnflag ORDER BY rf
"""


@query(
    "agg_map_entropy",
    oracle="""
    WITH kv AS (
      SELECT l_returnflag AS rf, u.k AS k,
             SUM(CAST(l_quantity AS BIGINT)) AS sv,
             MIN(CAST(l_quantity AS BIGINT)) AS mnv,
             MAX(CAST(l_quantity AS BIGINT)) AS mxv
      FROM lineitem, UNNEST([l_linestatus, 'ALL']) AS u(k)
      GROUP BY rf, k
    ),
    maps AS (
      SELECT rf,
             string_agg(k, ',' ORDER BY k) AS sm_keys,
             string_agg(CAST(sv AS VARCHAR), ',' ORDER BY k) AS sm_vals,
             string_agg(CAST(mnv AS VARCHAR), ',' ORDER BY k)
               FILTER (WHERE k <> 'ALL') AS mn_vals,
             string_agg(CAST(mxv AS VARCHAR), ',' ORDER BY k)
               FILTER (WHERE k <> 'ALL') AS mx_vals
      FROM kv GROUP BY rf
    ),
    ecounts AS (
      SELECT l_returnflag AS rf, COUNT(*) AS c
      FROM lineitem GROUP BY rf, l_quantity
    ),
    ent AS (
      SELECT rf, ROUND(0.0 - SUM((c / n) * LOG2(c / n)), 9) AS ent
      FROM (SELECT rf, c, SUM(c) OVER (PARTITION BY rf) AS n FROM ecounts)
      GROUP BY rf
    )
    SELECT maps.rf AS rf, sm_keys, sm_vals, mn_vals, mx_vals, ent
    FROM maps JOIN ent ON ent.rf = maps.rf
    ORDER BY rf
    """,
    category="aggregates",
)
def agg_map_entropy(spark, sf_dir):
    """ClickHouse sumMap/minMap/maxMap + entropy as verbatim SQL text
    (round 8 — all four were unresolved-function errors before): the Map
    aggregates return the CH tuple-of-arrays shape (sorted distinct keys,
    per-key aggregated values) built by one expression over a collected
    pair list; entropy is the Shannon entropy of the value distribution
    with a sorted-count fold so the float sum is order-stable.  BIGINT
    map values keep the sums binary-exact cross-engine; entropy rounds to
    9 decimals on both sides (the fold orders differ between engines).
    Oracle: UNNEST + per-key aggregation + ordered list(), and the
    definitional -SUM(p*log2 p) over per-value counts."""
    from mcp_clickhouse_spark.dialect import translate

    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(translate(_SQL_MAP_ENTROPY_CH))


_SQL_MAX_INTERSECTIONS_CH = """
SELECT o_orderpriority AS pri,
       maxIntersections(o_orderdate, o_orderdate + INTERVAL 30 DAY) AS mi,
       maxIntersectionsPosition(o_orderdate, o_orderdate + INTERVAL 30 DAY)
         AS mip
FROM orders GROUP BY o_orderpriority ORDER BY pri
"""


@query(
    "agg_max_intersections",
    oracle="""
    WITH ev AS (
      SELECT o_orderpriority AS pri, o_orderdate AS p, 1 AS d FROM orders
      UNION ALL
      SELECT o_orderpriority, o_orderdate + INTERVAL 30 DAY, -1 FROM orders
    ),
    run AS (
      SELECT pri, p, d,
             SUM(d) OVER (PARTITION BY pri ORDER BY p, d
                          ROWS UNBOUNDED PRECEDING) AS c
      FROM ev
    ),
    mx AS (SELECT pri, CAST(MAX(c) AS BIGINT) AS mi FROM run GROUP BY pri)
    SELECT mx.pri AS pri, mx.mi AS mi, MIN(run.p) AS mip
    FROM mx JOIN run ON run.pri = mx.pri AND run.c = mx.mi
    GROUP BY mx.pri, mx.mi
    ORDER BY pri
    """,
    category="aggregates",
)
def agg_max_intersections(spark, sf_dir):
    """ClickHouse maxIntersections / maxIntersectionsPosition as verbatim
    SQL text (round 8): how many 30-day order windows overlap at one
    point, per priority, and the start date where that maximum is first
    reached.  One aggregate expression: sweep-line fold over sorted
    (point, ±1) structs — an END sorts before a START at the same point
    (-1 < 1), ClickHouse's half-open pair sort.  Oracle: the same sweep
    as a running-sum window; every row where the running count equals the
    max is a START event (the count only reaches its max by increasing),
    so MIN(p) over them is exactly the first-attainment position."""
    from mcp_clickhouse_spark.dialect import translate

    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(translate(_SQL_MAX_INTERSECTIONS_CH))


_SQL_FOREACH_CH = """
SELECT label,
       round(arrayElement(sumForEach(
         arrayMap(x -> toFloat64(x), embedding)), 1), 5) AS s1,
       round(arrayElement(sumForEach(
         arrayMap(x -> toFloat64(x), embedding)), 17), 5) AS s17,
       arrayElement(minForEach(embedding), 32) AS mn32,
       arrayElement(maxForEach(embedding), 1) AS mx1,
       arrayElement(countForEach(embedding), 17) AS c17,
       round(arrayElement(avgForEach(
         arrayMap(x -> toFloat64(x), embedding)), 32), 5) AS av32
FROM embeddings GROUP BY label ORDER BY label
"""


@query(
    "agg_foreach",
    oracle="""
    SELECT label,
           ROUND(SUM(CAST(embedding[1] AS DOUBLE)), 5) AS s1,
           ROUND(SUM(CAST(embedding[17] AS DOUBLE)), 5) AS s17,
           MIN(embedding[32]) AS mn32,
           MAX(embedding[1]) AS mx1,
           COUNT(embedding[17]) AS c17,
           ROUND(AVG(CAST(embedding[32] AS DOUBLE)), 5) AS av32
    FROM embeddings GROUP BY label ORDER BY label
    """,
    category="aggregates",
)
def agg_foreach(spark, sf_dir):
    """The -ForEach combinator family as verbatim SQL text (round 8 —
    was a guided error): element-wise sum/min/max/count/avg across the
    rows' embedding arrays per label, realized as ONE zip_with fold over
    the collected arrays.  Selected elements are projected out (the
    driver canonicalizer takes scalars only); the float32 sums go
    through toFloat64 first so both engines accumulate in double, then
    round to 5 decimals (fold order differs).  min/max/count are exact.
    Oracle: per-position aggregates via direct 1-based list indexing."""
    from mcp_clickhouse_spark.dialect import translate

    t(spark, sf_dir, "embeddings").createOrReplaceTempView("embeddings")
    return spark.sql(translate(_SQL_FOREACH_CH))


_SQL_CROSSTAB_CH = """
SELECT round(cramersV(o_orderstatus, o_orderpriority), 9) AS v,
       round(cramersVBiasCorrected(o_orderstatus, o_orderpriority), 9) AS vc,
       round(theilsU(o_orderstatus, o_orderpriority), 9) AS u,
       round(contingency(o_orderstatus, o_orderpriority), 9) AS ct
FROM orders
"""


@query(
    "agg_crosstab",
    oracle="""
    WITH pc AS (
      SELECT o_orderstatus AS a, o_orderpriority AS b, COUNT(*) AS o
      FROM orders GROUP BY 1, 2
    ),
    m AS (SELECT CAST(SUM(o) AS DOUBLE) AS n FROM pc),
    ra AS (SELECT a, CAST(SUM(o) AS DOUBLE) AS ra FROM pc GROUP BY a),
    cb AS (SELECT b, CAST(SUM(o) AS DOUBLE) AS cb FROM pc GROUP BY b),
    cells AS (
      SELECT COALESCE(pc.o, 0) AS o, ra.ra * cb.cb / m.n AS e
      FROM ra CROSS JOIN cb CROSS JOIN m
      LEFT JOIN pc ON pc.a = ra.a AND pc.b = cb.b
    ),
    stats AS (
      SELECT SUM(POWER(o - e, 2) / e) AS chi2,
             (SELECT n FROM m) AS n,
             (SELECT CAST(COUNT(*) AS DOUBLE) FROM ra) AS r,
             (SELECT CAST(COUNT(*) AS DOUBLE) FROM cb) AS c
      FROM cells
    ),
    ent AS (
      SELECT
        (SELECT -SUM((ra / m.n) * LN(ra / m.n)) FROM ra, m) AS h_a,
        (SELECT -SUM((cb / m.n) * LN(cb / m.n)) FROM cb, m) AS h_b,
        (SELECT -SUM((o / m.n) * LN(o / m.n)) FROM pc, m) AS h_ab
    )
    SELECT ROUND(SQRT(chi2 / (n * LEAST(r - 1, c - 1))), 9) AS v,
           ROUND(SQRT(GREATEST(0, chi2 / n - (r - 1) * (c - 1) / (n - 1))
             / (LEAST(r - POWER(r - 1, 2) / (n - 1),
                      c - POWER(c - 1, 2) / (n - 1)) - 1)), 9) AS vc,
           ROUND((h_a + h_b - h_ab) / h_a, 9) AS u,
           ROUND(SQRT(chi2 / (chi2 + n)), 9) AS ct
    FROM stats, ent
    """,
    category="aggregates",
)
def agg_crosstab(spark, sf_dir):
    """ClickHouse's cross-tab association family — cramersV,
    cramersVBiasCorrected (Bergsma), theilsU (uncertainty coefficient
    U(a|b) = (H(a)+H(b)−H(a,b))/H(a)), and Pearson's contingency
    coefficient — as verbatim SQL text over the order status × priority
    table (round 8; all four were unresolved-function errors).  One
    aggregate expression each: χ² over the FULL r×c cross product (zero
    cells contribute (0−e)²/e), entropies fold sorted counts.  Rounded
    to 9 decimals on both sides (float fold orders differ).  Oracle: the
    definitional contingency-table CTE chain in DuckDB."""
    from mcp_clickhouse_spark.dialect import translate

    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(translate(_SQL_CROSSTAB_CH))


_SQL_RANK_CORR_CH = """
SELECT round(rankCorr(n_chars, length(text)), 9) AS rc,
       round(rankCorr(n_chars, 0 - doc_id), 9) AS rc_id
FROM documents
"""


@query(
    "agg_rank_corr",
    oracle="""
    WITH r AS (
      SELECT (RANK() OVER (ORDER BY n_chars)
              + (COUNT(*) OVER (PARTITION BY n_chars) - 1) / 2.0) AS rx,
             (RANK() OVER (ORDER BY len(text))
              + (COUNT(*) OVER (PARTITION BY len(text)) - 1) / 2.0) AS ry,
             (RANK() OVER (ORDER BY 0 - doc_id)
              + (COUNT(*) OVER (PARTITION BY doc_id) - 1) / 2.0) AS rz
      FROM documents
    )
    SELECT ROUND(CORR(rx, ry), 9) AS rc, ROUND(CORR(rx, rz), 9) AS rc_id
    FROM r
    """,
    category="aggregates",
)
def agg_rank_corr(spark, sf_dir):
    """ClickHouse rankCorr — Spearman's ρ with average ranks for ties —
    as verbatim SQL text (round 8; was an unresolved-function error).
    n_chars vs length(text) is a near-perfect monotone pair WITH
    heavily-tied ranks (many docs share a length), so the average-rank
    tie handling is load-bearing, not decorative.  The one-expression
    form is O(n²) per group (documents = 500 rows → 250k comparisons);
    the oracle uses the equivalent window-rank + Pearson plan — which is
    also the recommended large-group formulation the guided docstring
    names.  Rounded to 9 (fold orders differ)."""
    from mcp_clickhouse_spark.dialect import translate

    t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(translate(_SQL_RANK_CORR_CH))


_SQL_HYPOTHESIS_CH = """
SELECT o_orderpriority AS pri,
  round(tupleElement(studentTTest(o_totalprice, o_orderkey % 2),
        't_statistic'), 6) AS st_t,
  round(tupleElement(welchTTest(o_totalprice, o_orderkey % 2),
        't_statistic'), 6) AS wt_t,
  round(tupleElement(mannWhitneyUTest(o_totalprice, o_orderkey % 2),
        'u_statistic'), 4) AS mw_u,
  round(tupleElement(kolmogorovSmirnovTest(o_totalprice, o_orderkey % 2),
        'd_statistic'), 9) AS ks_d,
  round(tupleElement(
        kolmogorovSmirnovTest('greater')(o_totalprice, o_orderkey % 2),
        'p_value'), 9) AS ks_pg,
  round(tupleElement(meanZTest(1000000.0, 1000000.0, 0.95)(
        o_totalprice, o_orderkey % 2), 'z_statistic'), 6) AS z_stat
FROM orders
GROUP BY o_orderpriority
ORDER BY pri
"""


@query(
    "agg_hypothesis_tests",
    oracle="""
    WITH s AS (
      SELECT o_orderpriority AS pri, CAST(o_totalprice AS DOUBLE) AS v,
             CASE WHEN o_orderkey % 2 = 0 THEN 0 ELSE 1 END AS g
      FROM orders
    ), m AS (
      SELECT pri,
             CAST(COUNT(*) FILTER (WHERE g = 0) AS DOUBLE) AS n0,
             CAST(COUNT(*) FILTER (WHERE g = 1) AS DOUBLE) AS n1,
             AVG(v) FILTER (WHERE g = 0) AS m0,
             AVG(v) FILTER (WHERE g = 1) AS m1,
             VAR_SAMP(v) FILTER (WHERE g = 0) AS v0,
             VAR_SAMP(v) FILTER (WHERE g = 1) AS v1
      FROM s GROUP BY pri
    ), ranks AS (
      SELECT pri, g,
             RANK() OVER (PARTITION BY pri ORDER BY v)
               + (COUNT(*) OVER (PARTITION BY pri, v) - 1) / 2.0 AS ar
      FROM s
    ), mw AS (
      SELECT pri, SUM(CASE WHEN g = 0 THEN ar ELSE 0 END) AS r1
      FROM ranks GROUP BY pri
    ), ecdf AS (
      SELECT pri,
             CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) OVER w
                  AS DOUBLE) AS c0,
             CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) OVER w
                  AS DOUBLE) AS c1
      FROM s
      WINDOW w AS (PARTITION BY pri ORDER BY v
                   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), ksd AS (
      SELECT e.pri,
             MAX(ABS(e.c0 / m.n0 - e.c1 / m.n1)) AS d,
             GREATEST(MAX(e.c0 / m.n0 - e.c1 / m.n1), 0.0) AS dplus
      FROM ecdf e JOIN m USING (pri) GROUP BY e.pri
    )
    SELECT m.pri,
      ROUND((m.m0 - m.m1) / SQRT(
        (((m.n0 - 1) * m.v0 + (m.n1 - 1) * m.v1) / (m.n0 + m.n1 - 2))
        * (1.0 / m.n0 + 1.0 / m.n1)), 6) AS st_t,
      ROUND((m.m0 - m.m1) / SQRT(m.v0 / m.n0 + m.v1 / m.n1), 6) AS wt_t,
      ROUND(mw.r1 - m.n0 * (m.n0 + 1) / 2.0, 4) AS mw_u,
      ROUND(ksd.d, 9) AS ks_d,
      ROUND(EXP(-2.0 * (m.n0 * m.n1 / (m.n0 + m.n1))
                * ksd.dplus * ksd.dplus), 9) AS ks_pg,
      ROUND((m.m0 - m.m1)
            / SQRT(1000000.0 / m.n0 + 1000000.0 / m.n1), 6) AS z_stat
    FROM m JOIN mw USING (pri) JOIN ksd ON ksd.pri = m.pri
    ORDER BY m.pri
    """,
    category="aggregates",
)
def agg_hypothesis_tests(spark, sf_dir):
    """ClickHouse's hypothesis-test aggregates — studentTTest, welchTTest,
    mannWhitneyUTest, kolmogorovSmirnovTest, meanZTest — as verbatim SQL
    text (round 8; p-values were guided errors before).  The STATISTICS
    are oracle-checked here (t, U with average-rank ties, exact two-sample
    D, z, and the elementary one-sided KS p = exp(−2·en·D²)); the
    incomplete-beta / erfc-backed two-sided p-values ride on the
    functions/stats.py pandas UDFs and are pinned in tests/test_stats.py
    against closed forms and ClickHouse's own documented example output
    (mannWhitneyUTest docs → (9, 0.04042779918503192)).  The U/D folds
    are O(n log n) tied-run sweeps over one sorted collect_list per
    group — per-group memory, the same contract CH's own implementations
    have.  Rounded: float moment folds differ across engines."""
    from mcp_clickhouse_spark.dialect import translate
    from mcp_clickhouse_spark.functions.stats import ensure_registered

    ensure_registered(spark)
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(translate(_SQL_HYPOTHESIS_CH))


_SQL_COMBINATORS_R9_CH = """
SELECT l_returnflag,
       arrayStringConcat(arrayMap(x -> toString(x),
         countResample(1, 49, 24)(l_orderkey, toInt32(l_quantity))),
         ',') AS cr,
       arrayStringConcat(arrayMap(x -> toString(x),
         groupArraySorted(3)(toInt32(l_quantity))), ',') AS gs,
       sumArrayIf(array(toInt32(l_quantity), 1),
                  l_linestatus = 'F') AS saif
FROM lineitem GROUP BY l_returnflag
"""


@query(
    "agg_combinators_r9",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) FILTER (WHERE CAST(l_quantity AS INTEGER)
                BETWEEN 1 AND 24) AS VARCHAR)
           || ',' ||
           CAST(COUNT(*) FILTER (WHERE CAST(l_quantity AS INTEGER)
                BETWEEN 25 AND 48) AS VARCHAR) AS cr,
           array_to_string(
             (list_sort(list(CAST(l_quantity AS INTEGER))))[1:3],
             ',') AS gs,
           CAST(SUM(CASE WHEN l_linestatus = 'F'
               THEN CAST(l_quantity AS INTEGER) + 1 END) AS BIGINT) AS saif
    FROM lineitem GROUP BY l_returnflag
    """,
    category="aggregates",
)
def agg_combinators_r9(spark, sf_dir):
    """The round-9 combinator family as verbatim SQL text, driver-
    oracle-checked: ``countResample(1, 49, 24)`` (two 24-wide key
    subranges — the oracle recomputes them as FILTER counts),
    ``groupArraySorted(3)`` (the 3 smallest quantities, fully
    deterministic — DuckDB list_sort + slice), and ``sumArrayIf``
    (row-condition + element fold — the oracle folds the two-element
    array algebraically as value+1).  Array outputs flatten through
    arrayStringConcat for the scalar-only driver canonicalizer."""
    from mcp_clickhouse_spark.dialect import translate

    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(translate(_SQL_COMBINATORS_R9_CH))


_SQL_IF_GENERIC_CH = """
SELECT l_returnflag AS g,
       arrayStringConcat(arrayMap(x -> toString(x),
           arraySort(groupArrayIf(l_linenumber, l_quantity > 49))), ',') AS ga,
       arrayStringConcat(arrayMap(x -> toString(x),
           arraySort(groupUniqArrayIf(l_linenumber, l_quantity > 45))), ',') AS gu,
       medianIf(l_quantity, l_linenumber = 1) AS md,
       round(corrIf(l_quantity, l_extendedprice, l_discount > 0.05), 8) AS cr,
       round(stddevSampIf(l_quantity, l_tax < 0.04), 8) AS sd,
       quantileExactIf(0.25)(l_quantity, l_linenumber > 2) AS qe,
       sumOrNullIf(l_quantity, l_linenumber = 99) AS son,
       arrayStringConcat(arrayMap(q -> toString(q), tupleElement(
           uniqExactMap([l_linenumber % 3], [l_orderkey % 50]), '_2')),
           ',') AS uem
FROM lineitem GROUP BY l_returnflag
"""


@query(
    "agg_if_generic",
    oracle="""
    WITH s AS (
      SELECT l_returnflag AS g, l_linenumber AS ln,
             CAST(l_quantity AS DOUBLE) AS q,
             CAST(l_extendedprice AS DOUBLE) AS ep,
             l_discount AS d, l_tax AS tx
      FROM lineitem
    ),
    s2 AS (
      SELECT l_returnflag AS g, l_linenumber AS ln, l_orderkey AS ok
      FROM lineitem
    ),
    qs AS (
      SELECT g, list_sort(list(q) FILTER (WHERE ln > 2)) AS a,
             COUNT(*) FILTER (WHERE ln > 2) AS n
      FROM s GROUP BY g
    )
    SELECT s.g,
           COALESCE(string_agg(CAST(ln AS VARCHAR), ',' ORDER BY ln)
             FILTER (WHERE q > 49), '') AS ga,
           COALESCE((SELECT string_agg(CAST(u.u AS VARCHAR), ',' ORDER BY u.u)
             FROM (SELECT DISTINCT s2.ln AS u FROM s s2
                   WHERE s2.g = s.g AND s2.q > 45) u), '') AS gu,
           quantile_cont(q, 0.5) FILTER (WHERE ln = 1) AS md,
           round(corr(q, ep) FILTER (WHERE d > 0.05), 8) AS cr,
           round(stddev_samp(q) FILTER (WHERE tx < 0.04), 8) AS sd,
           (SELECT a[CAST(0.25 * n AS INTEGER) + 1] FROM qs
            WHERE qs.g = s.g) AS qe,
           CAST(NULL AS DOUBLE) AS son,
           (SELECT string_agg(CAST(z.cnt AS VARCHAR), ',' ORDER BY z.kk)
            FROM (SELECT s2.ln % 3 AS kk,
                         COUNT(DISTINCT s2.ok % 50) AS cnt
                  FROM s2 WHERE s2.g = s.g GROUP BY kk) z) AS uem
    FROM s GROUP BY s.g
    """,
    category="aggregates",
)
def agg_if_generic(spark, sf_dir):
    """The round-10 GENERIC -If combinator surface (dialect.py
    _if_handler): bases with no hand-written -If entry — groupArrayIf,
    groupUniqArrayIf, medianIf, corrIf, stddevSampIf, and the parametric
    quantileExactIf — composed by NULLing value arguments on
    non-matching rows.  Oracle: DuckDB's native FILTER clause per
    aggregate (a different row-filtering mechanism entirely), the
    distinct-set CSV via a correlated DISTINCT subquery, and
    quantileExact's floor(level·n) selection over the FILTERed sorted
    list.  Round-10 additions: sumOrNullIf against a never-matching
    condition (NULL, the -OrNull contract) and uniqExactMap per-key
    distinct counts (oracle: COUNT(DISTINCT) per key in a correlated
    subquery).  Arrays flatten to sorted CSV for the scalar-only driver
    canonicalizer."""
    from mcp_clickhouse_spark.dialect import translate

    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(translate(_SQL_IF_GENERIC_CH))
