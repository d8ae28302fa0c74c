"""Core scan / projection / predicate / flagship queries.

Covers SURVEY.md §2.2 B1-B5, B10-B12 and §2.3.1-2.3.2: table scan,
projection, WHERE predicates (IN / BETWEEN / LIKE / boolean composition),
conditional expressions, ORDER BY + LIMIT, constant select.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcp_clickhouse_spark.inventory.registry import query, t


# --- flagship: TPC-H Q1-style pricing summary ------------------------------
# Exercises scan → filter → projection → partial/final hash aggregation →
# sort in one statement; Catalyst pushes the l_shipdate filter into the
# parquet scan, and HashAggregateExec does map-side partial aggregation so
# the shuffle carries only (group, partial-state) rows — the plan that holds
# at 100 TB.

_Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


from mcp_clickhouse_spark.functions import cents_sql  # noqa: E402 — exact money arithmetic


@query("q1_pricing_summary", oracle=_Q1_ORACLE, category="core")
def q1_pricing_summary(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    # scaled-integer arithmetic: cents × (100 - disc_c) × (100 + tax_c).
    # Parsed-expression form (one F.expr parse per aggregate): the nested
    # Column tree cost ~0.23 s of py4j round-trips per construction —
    # a third of this query's total wall time at sf0.1.
    qty, ep, disc, tax = (
        cents_sql(c) for c in ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    )
    disc_price = f"({ep} * (100 - {disc}))"
    charge = f"({disc_price} * (100 + {tax}))"
    return (
        li.where("l_shipdate <= TIMESTAMP_NTZ '1998-09-02 00:00:00'")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr(f"sum({qty}) / 100.0D").alias("sum_qty"),
            F.expr(f"sum({ep}) / 100.0D").alias("sum_base_price"),
            F.expr(f"sum({disc_price}) / 10000.0D").alias("sum_disc_price"),
            F.expr(f"sum({charge}) / 1000000.0D").alias("sum_charge"),
            F.expr(f"sum({qty}) / 100.0D / count(*)").alias("avg_qty"),
            F.expr(f"sum({ep}) / 100.0D / count(*)").alias("avg_price"),
            F.expr(f"sum({disc}) / 100.0D / count(*)").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        # r17 optimization (guide §2.4, remove shuffles outright): the output
        # is one row per (l_returnflag, l_linestatus) — bounded at ~6 rows at
        # ANY scale — so a global orderBy (range Exchange + a separate
        # range-boundary SAMPLING job that re-runs the final aggregate) is
        # pure overhead.  coalesce(1) + sortWithinPartitions yields the
        # identical total order with one task and NO extra exchange or job:
        # plan 2 Exchange + 2 jobs → 1 Exchange + 1 job (plans/r17/).
        .coalesce(1)
        .sortWithinPartitions("l_returnflag", "l_linestatus")
    )


# --- B1/B2: scan + projection ----------------------------------------------


@query(
    "scan_projection",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderstatus = 'F'
    """,
    category="core",
)
def scan_projection(spark, sf_dir):
    # Column pruning + predicate pushdown: the parquet scan reads exactly the
    # four referenced columns and skips row groups failing the filter.
    return (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# --- B3/B14/B15/B16/§2.3.2: predicate battery -------------------------------


@query(
    "filter_predicates",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_size
    FROM part
    WHERE p_size BETWEEN 10 AND 30
      AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
      AND p_name LIKE '%ow%'
      AND NOT (p_type LIKE 'SMALL%' OR p_size = 15)
    """,
    category="core",
)
def filter_predicates(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    return p.where(
        F.col("p_size").between(10, 30)
        & F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
        & F.col("p_name").like("%ow%")
        & ~(F.col("p_type").like("SMALL%") | (F.col("p_size") == 15))
    ).select("p_partkey", "p_name", "p_brand", "p_size")


@query(
    "filter_const_false",
    oracle="SELECT o_orderkey FROM orders WHERE 1 = 0",
    category="core",
)
def filter_const_false(spark, sf_dir):
    # Reference guarantees empty-result handling (tests/test_chdb_tool.py:40-46).
    # Catalyst folds 1=0 to an empty LocalRelation — no scan at all.
    return t(spark, sf_dir, "orders").where(F.lit(1) == F.lit(0)).select("o_orderkey")


# --- §2.3.2: conditional if/multiIf/CASE ------------------------------------


@query(
    "case_when",
    oracle="""
    SELECT
      o_orderkey,
      CASE
        WHEN o_totalprice < 50000 THEN 'small'
        WHEN o_totalprice < 150000 THEN 'medium'
        ELSE 'large'
      END AS price_band,
      CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS is_final
    FROM orders
    """,
    category="core",
)
def case_when(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
        .alias("price_band"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("is_final"),
    )


# --- B4/B10, §2.3.6: ORDER BY + LIMIT (top-k) -------------------------------


@query(
    "order_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    category="core",
)
def order_limit(spark, sf_dir):
    # Spark plans TakeOrderedAndProject: each partition keeps a 25-row heap,
    # the driver merges — no global sort even at 100 TB.
    return (
        t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(25)
    )


@query(
    "order_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 10
    """,
    category="core",
)
def order_limit_offset(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .offset(10)
        .limit(20)
    )


# --- B12: constant select ----------------------------------------------------


@query("constant_select", oracle="SELECT 1 AS one, 'x' AS s", category="core")
def constant_select(spark, sf_dir):
    return spark.range(1).select(F.lit(1).alias("one"), F.lit("x").alias("s"))
