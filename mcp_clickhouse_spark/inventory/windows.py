"""Window-function inventory — SURVEY.md §2.3.5.

Ranking (row_number/rank/dense_rank/ntile/percent_rank/cume_dist),
analytic (lag/lead/first_value/last_value/nth_value), running aggregates
over ROWS frames, and RANGE frames with numeric offsets.

Determinism: every window ORDER BY ends in a unique key so row_number and
frame contents are reproducible across engines. Running sums are
decimal-exact before the final double cast.

Scale: each query is a single shuffle on its PARTITION BY keys followed by a
per-partition sort. Partition keys are chosen with cardinality ≫ executor
count (custkey, user_id) — no single-partition global windows.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mcp_clickhouse_spark.functions import cents
from mcp_clickhouse_spark.inventory.registry import query, t


@query(
    "win_ranking",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER() OVER w AS rn,
           RANK()       OVER w2 AS rnk,
           DENSE_RANK() OVER w2 AS drnk
    FROM orders
    WINDOW w  AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey),
           w2 AS (PARTITION BY o_custkey ORDER BY o_orderpriority)
    """,
    category="windows",
)
def win_ranking(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    w2 = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w2).alias("rnk"),
        F.dense_rank().over(w2).alias("drnk"),
    )


@query(
    "win_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS window3_total
    FROM orders
    """,
    category="windows",
)
def win_running_sum(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    dec = cents("o_totalprice")  # exact cents
    w_run = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_3 = Window.partitionBy("o_custkey").orderBy("o_orderkey").rowsBetween(-2, 0)
    return o.select(
        "o_custkey",
        "o_orderkey",
        (F.sum(dec).over(w_run) / F.lit(100.0)).alias("running_total"),
        (F.sum(dec).over(w_3) / F.lit(100.0)).alias("window3_total"),
    )


@query(
    "win_lag_lead",
    oracle="""
    SELECT user_id, event_id,
           LAG(event_type)     OVER w AS prev_type,
           LEAD(event_type)    OVER w AS next_type,
           LAG(event_type, 2, 'none') OVER w AS prev2_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    """,
    category="windows",
)
def win_lag_lead(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.lag("event_type", 2, "none").over(w).alias("prev2_type"),
    )


@query(
    "win_value_functions",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_key,
           LAST_VALUE(o_orderkey)  OVER w AS last_key,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_key
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    category="windows",
)
def win_value_functions(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_key"),
        F.last("o_orderkey").over(w).alias("last_key"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_key"),
    )


@query(
    "win_range_frame",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)))
                OVER (PARTITION BY l_suppkey ORDER BY l_quantity
                      RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS DOUBLE) AS qty_range_sum
    FROM lineitem WHERE l_suppkey <= 50
    """,
    category="windows",
)
def win_range_frame(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").where(F.col("l_suppkey") <= 50)
    w = Window.partitionBy("l_suppkey").orderBy("l_quantity").rangeBetween(-5, 0)
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        (F.sum(cents("l_quantity")).over(w) / F.lit(100.0)).alias(
            "qty_range_sum"
        ),
    )


@query(
    "win_distribution",
    oracle="""
    SELECT c_custkey, c_nationkey,
           NTILE(4)       OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 8) AS pct_rank,
           ROUND(CUME_DIST()    OVER w, 8) AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
    category="windows",
)
def win_distribution(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 8).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 8).alias("cume"),
    )
