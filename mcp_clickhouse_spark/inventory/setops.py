"""Set-operation inventory — SURVEY.md §2.3.7.

UNION ALL / UNION DISTINCT / INTERSECT [ALL] / EXCEPT [ALL] with proper
multiset semantics (the ALL variants preserve duplicate counts).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcp_clickhouse_spark.inventory.registry import query, t


def _cust_nations(spark, sf_dir):
    return t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))


def _supp_nations(spark, sf_dir):
    return t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))


@query(
    "setop_union_all",
    oracle="""
    SELECT nk, COUNT(*) AS n FROM (
      SELECT c_nationkey AS nk FROM customer
      UNION ALL
      SELECT s_nationkey AS nk FROM supplier
    ) GROUP BY nk
    """,
    category="setops",
)
def setop_union_all(spark, sf_dir):
    u = _cust_nations(spark, sf_dir).unionAll(_supp_nations(spark, sf_dir))
    return u.groupBy("nk").agg(F.count("*").alias("n"))


@query(
    "setop_union_distinct",
    oracle="""
    SELECT c_nationkey AS nk FROM customer
    UNION
    SELECT s_nationkey AS nk FROM supplier
    """,
    category="setops",
)
def setop_union_distinct(spark, sf_dir):
    return _cust_nations(spark, sf_dir).union(_supp_nations(spark, sf_dir)).distinct()


@query(
    "setop_union_by_name",
    oracle="""
    SELECT n_name AS name, 'nation' AS kind FROM nation
    UNION ALL
    SELECT r_name AS name, 'region' AS kind FROM region
    """,
    category="setops",
)
def setop_union_by_name(spark, sf_dir):
    # unionByName: schema aligned by column name, not position (B26 analog of
    # ClickHouse UNION with named columns).
    n = t(spark, sf_dir, "nation").select(
        F.col("n_name").alias("name"), F.lit("nation").alias("kind")
    )
    r = t(spark, sf_dir, "region").select(
        F.lit("region").alias("kind"), F.col("r_name").alias("name")
    )
    return n.unionByName(r)


@query(
    "setop_intersect",
    oracle="""
    SELECT c_nationkey AS nk FROM customer
    INTERSECT
    SELECT s_nationkey AS nk FROM supplier
    """,
    category="setops",
)
def setop_intersect(spark, sf_dir):
    return _cust_nations(spark, sf_dir).intersect(_supp_nations(spark, sf_dir))


@query(
    "setop_intersect_all",
    oracle="""
    SELECT nk, COUNT(*) AS n FROM (
      SELECT c_nationkey AS nk FROM customer
      INTERSECT ALL
      SELECT s_nationkey AS nk FROM supplier
    ) GROUP BY nk
    """,
    category="setops",
)
def setop_intersect_all(spark, sf_dir):
    u = _cust_nations(spark, sf_dir).intersectAll(_supp_nations(spark, sf_dir))
    return u.groupBy("nk").agg(F.count("*").alias("n"))


@query(
    "setop_except",
    oracle="""
    SELECT o_custkey AS ck FROM orders
    EXCEPT
    SELECT c_custkey AS ck FROM customer WHERE c_acctbal < 0
    """,
    category="setops",
)
def setop_except(spark, sf_dir):
    o = t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("ck"))
    c = (
        t(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") < 0)
        .select(F.col("c_custkey").alias("ck"))
    )
    return o.subtract(c)


@query(
    "setop_except_all",
    oracle="""
    SELECT ck, COUNT(*) AS n FROM (
      SELECT o_custkey AS ck FROM orders
      EXCEPT ALL
      SELECT c_custkey AS ck FROM customer
    ) GROUP BY ck
    """,
    category="setops",
)
def setop_except_all(spark, sf_dir):
    o = t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("ck"))
    c = t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("ck"))
    return o.exceptAll(c).groupBy("ck").agg(F.count("*").alias("n"))
