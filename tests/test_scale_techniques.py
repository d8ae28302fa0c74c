"""Scale-technique tests: salted aggregation/join equivalence, and bucketed
tables giving shuffle-free co-located joins (the plan property, not just
the right rows)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mcp_clickhouse_spark.operators.salting import salted_agg, salted_join
from mcp_clickhouse_spark.plans import count_nodes, explain_formatted


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows on one key — the classic hot-key distribution.
    return spark.range(10000).select(
        F.when(F.col("id") % 10 < 9, "hot").otherwise(F.concat(F.lit("k"), F.col("id") % 7))
        .alias("k"),
        (F.col("id") % 100).alias("x"),
    )


def test_salted_agg_equivalence(spark, skewed):
    plain = {
        (r.k): (r.c, r.s)
        for r in skewed.groupBy("k")
        .agg(F.count("*").alias("c"), F.sum("x").alias("s"))
        .collect()
    }
    salted = {
        (r.k): (r.c, r.s)
        for r in salted_agg(
            skewed,
            ["k"],
            [F.count("*").alias("c"), F.sum("x").alias("s")],
            [F.sum("c").alias("c"), F.sum("s").alias("s")],
        ).collect()
    }
    assert salted == plain


def test_salted_join_equivalence(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"D{i}") for i in range(7)], "k string, label string"
    )
    plain = sorted((r.k, r.x, r.label) for r in skewed.join(dim, on="k").collect())
    salted = sorted((r.k, r.x, r.label) for r in salted_join(skewed, dim, on=["k"]).collect())
    assert salted == plain


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    from mcp_clickhouse_spark.session import read_table

    for name, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS b_{name}")
        (
            read_table(spark, sf_dir, name)
            .write.bucketBy(8, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(f"b_{name}")
        )
    yield ("b_orders", "b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_table_catalog_metadata(spark, bucketed_tables):
    """sorting_key/primary_key surface the bucket/sort spec — the MergeTree
    metadata analog (reference Table dataclass fields)."""
    from mcp_clickhouse_spark.catalog import describe_table

    tb = describe_table(spark, "default", "b_orders")
    assert "o_orderkey" in tb.sorting_key
    assert "o_orderkey" in tb.primary_key
    assert tb.parts and tb.parts >= 8  # one file per bucket at minimum


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    """Co-located join: both sides bucketed on the join key → sort-merge
    join with ZERO exchanges (the 100 TB fact-fact join strategy)."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")  # stable plan text
    try:
        o = spark.table("b_orders")
        li = spark.table("b_lineitem")
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").count()
        plan = explain_formatted(j)
        assert "SortMergeJoin" in plan
        # the JOIN itself is exchange-free; the groupBy adds exactly one
        assert count_nodes(plan, "Exchange") == 1
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
