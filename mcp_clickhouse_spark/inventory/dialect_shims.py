"""Dialect-shim inventory — the ClickHouse constructs with no native Spark
operator (SURVEY.md §2.3.6, "known-hard list" #4).

LIMIT n BY, ORDER BY … WITH FILL, DISTINCT ON — each realized by the
operators/ shims and oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mcp_clickhouse_spark.inventory.registry import query, t
from mcp_clickhouse_spark.operators import limit_by, with_fill


@query(
    "shim_limit_by",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ) WHERE rn <= 3
    """,
    category="dialect",
)
def shim_limit_by(spark, sf_dir):
    # ClickHouse: SELECT … ORDER BY c_acctbal DESC LIMIT 3 BY c_nationkey —
    # top-3 richest customers per nation.
    c = t(spark, sf_dir, "customer")
    return limit_by(
        c,
        by=["c_nationkey"],
        n=3,
        order=[F.col("c_acctbal").desc(), F.col("c_custkey")],
    ).select("c_nationkey", "c_custkey", "c_acctbal")


@query(
    "shim_with_fill",
    oracle="""
    WITH sized AS (
      SELECT p_size, COUNT(*) AS n FROM part WHERE p_size <= 25 GROUP BY p_size
    ),
    axis AS (SELECT UNNEST(generate_series(1, 25)) AS p_size)
    SELECT CAST(axis.p_size AS INTEGER) AS p_size, COALESCE(sized.n, 0) AS n
    FROM axis LEFT JOIN sized ON CAST(axis.p_size AS INTEGER) = sized.p_size
    ORDER BY p_size
    """,
    category="dialect",
)
def shim_with_fill(spark, sf_dir):
    # ClickHouse: GROUP BY p_size ORDER BY p_size WITH FILL FROM 1 TO 26 —
    # gap-filled histogram (missing sizes appear with n=0).
    sized = (
        t(spark, sf_dir, "part")
        .where(F.col("p_size") <= 25)
        .groupBy("p_size")
        .agg(F.count("*").alias("n"))
    )
    return with_fill(sized, "p_size", 1, 25, 1, fill_values={"n": 0})


@query(
    "shim_distinct_on",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
    category="dialect",
)
def shim_distinct_on(spark, sf_dir):
    # ClickHouse DISTINCT ON (o_custkey) — first order per customer. Spark's
    # dropDuplicates picks an ARBITRARY row; the deterministic realization is
    # the row_number shim (same shuffle count, reproducible result).
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
    )


@query(
    "shim_distinct",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    category="dialect",
)
def shim_distinct(spark, sf_dir):
    return t(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()
