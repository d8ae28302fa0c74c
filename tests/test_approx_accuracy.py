"""Accuracy bounds for the approximate aggregates (rows-only in the oracle
gate by design — verified here against exact computations instead)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mcp_clickhouse_spark.session import read_table


def test_approx_count_distinct_within_bounds(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders")
    exact = o.select(F.countDistinct("o_custkey")).first()[0]
    approx = o.select(F.approx_count_distinct("o_custkey", rsd=0.02)).first()[0]
    assert abs(approx - exact) / exact < 0.05  # HLL++ at 2% rsd


def test_percentile_approx_within_bounds(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders")
    exact = o.select(F.percentile("o_totalprice", F.lit(0.5))).first()[0]
    approx = o.select(
        F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(10000))
    ).first()[0]
    assert abs(approx - exact) / exact < 0.01


def test_lsh_recall_vs_bruteforce(spark, sf_dir):
    """The LSH ANN's top-10 must substantially overlap the exact top-10 on
    the real embeddings (recall floor — the accuracy/scan-fraction trade)."""
    from mcp_clickhouse_spark.pipeline.similarity import brute_force_topk, lsh_bucketed_topk

    e = read_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5)
    bf = brute_force_topk(q, e, k=10)
    lsh = lsh_bucketed_topk(q, e, k=10, n_planes=2, dim=64)  # 2 planes → ~1/4 scan
    bf_pairs = {(r.query_id, r.neighbor_id) for r in bf.collect()}
    lsh_pairs = {(r.query_id, r.neighbor_id) for r in lsh.collect()}
    recall = len(bf_pairs & lsh_pairs) / len(bf_pairs)
    assert recall >= 0.3, f"LSH recall collapsed: {recall}"
