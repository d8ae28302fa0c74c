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
        # a previous run killed mid-write leaves the LOCATION directory
        # behind with no catalog entry (fresh in-memory metastore), and
        # saveAsTable then fails LOCATION_ALREADY_EXISTS — clear it
        import shutil
        from urllib.parse import urlparse

        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        shutil.rmtree(f"{wh}/b_{name}", ignore_errors=True)
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


def test_split_layout_rewrites_single_row_group(spark, tmp_path, monkeypatch):
    """Storage-layout ingest (r5): a big single-row-group parquet is
    rewritten once into an N-file copy so the scan stage parallelizes;
    content is identical; the rewrite is cached and small tables are left
    alone."""
    import os

    from mcp_clickhouse_spark import session as S

    monkeypatch.setattr(S, "_WAREHOUSE_ROOT", str(tmp_path / "wh"))
    src_dir = str(tmp_path / "sf")
    os.makedirs(src_dir)
    # 160k rows in ONE file / ONE row group → splits to 2+ files
    big = spark.range(160_000).selectExpr("id AS o_orderkey", "id % 7 AS v")
    big.coalesce(1).write.parquet(str(tmp_path / "stage"))
    import glob as _g
    import shutil

    one = _g.glob(str(tmp_path / "stage" / "part-*.parquet"))[0]
    shutil.copy(one, os.path.join(src_dir, "orders.parquet"))
    # small single-row-group file stays untouched
    small = spark.range(100).selectExpr("id AS n_nationkey")
    small.coalesce(1).write.parquet(str(tmp_path / "stage2"))
    shutil.copy(
        _g.glob(str(tmp_path / "stage2" / "part-*.parquet"))[0],
        os.path.join(src_dir, "nation.parquet"),
    )

    S._TABLE_CACHE.clear()
    df = S.read_table(spark, src_dir, "orders")
    assert df.rdd.getNumPartitions() >= 2  # scan parallelism restored
    assert df.count() == 160_000
    assert df.agg({"v": "sum"}).first()[0] == big.agg({"v": "sum"}).first()[0]
    wh_dirs = os.listdir(str(tmp_path / "wh"))
    assert len(wh_dirs) == 1 and wh_dirs[0].startswith("orders-")
    # second read: cache hit, no new rewrite dirs
    S._TABLE_CACHE.clear()
    S.read_table(spark, src_dir, "orders").count()
    assert os.listdir(str(tmp_path / "wh")) == wh_dirs
    # small table: read from the original path, nothing written
    small_df = S.read_table(spark, src_dir, "nation")
    assert small_df.count() == 100
    assert os.listdir(str(tmp_path / "wh")) == wh_dirs

    S._TABLE_CACHE.clear()


def test_prepared_plan_replay_fresh_execution(spark):
    """run_prepared memoizes the analyzed plan but each call must yield a NEW
    Dataset (fresh QueryExecution → fresh shuffles), identical results."""
    import __spark_entry__ as entry

    qs = entry.queries()
    sf = "/root/testdata/sf0.001"
    a = qs["agg_rollup"](spark, sf)
    b = qs["agg_rollup"](spark, sf)
    assert a._jdf is not b._jdf  # replay builds a distinct JVM Dataset
    rows_a = sorted(map(tuple, a.collect()), key=repr)
    rows_b = sorted(map(tuple, b.collect()), key=repr)
    assert rows_a == rows_b and len(rows_a) > 0


def test_prepared_plan_cache_kill_switch(spark, monkeypatch):
    from mcp_clickhouse_spark.inventory import registry

    monkeypatch.setenv("SPARK_GRAFT_NO_PLAN_CACHE", "1")
    registry._PLAN_CACHE.clear()
    import __spark_entry__ as entry

    qs = entry.queries()
    qs["agg_rollup"](spark, "/root/testdata/sf0.001").collect()
    assert not registry._PLAN_CACHE  # nothing memoized when disabled


def test_lsh_pipeline_scale_smoke_with_degenerate_slice(spark):
    """30k docs, 40% of them IDENTICAL boilerplate (the mega-bucket that
    sinks uncapped LSH at scale): the full signatures -> banding -> capped
    pair generation -> verify pipeline must complete with pair counts
    bounded by the cap, never O(n_dup^2) = 7.2e7."""
    from pyspark.sql import functions as F

    from mcp_clickhouse_spark.pipeline.dedup import (
        jaccard_verify,
        minhash_lsh_candidates,
        minhash_signatures,
        release_persisted,
    )

    n, dup_frac = 30_000, 0.4
    docs = spark.range(n).selectExpr(
        "id AS doc_id",
        f"""CASE WHEN id < {int(n * dup_frac)}
             THEN 'common crawl boilerplate navigation menu footer copyright'
             ELSE concat_ws(' ', transform(sequence(0, 19),
                  i -> concat('w', CAST(xxhash64(id, i) % 5000 AS STRING))))
           END AS text""",
    )
    sigs = minhash_signatures(docs, num_hashes=16)
    cand = minhash_lsh_candidates(sigs, bands=4, rows_per_band=4, max_bucket_size=20)
    pairs = jaccard_verify(cand, docs, threshold=0.5)
    n_cand = cand.count()
    n_pairs = pairs.count()
    release_persisted()
    # cap=20 -> <=C(20,2)=190 pairs per (band,bucket); 4 bands of the one
    # round 11 (identical-signature collapse): the 12,000-doc boilerplate
    # cluster surfaces as 11,999 star pairs (LINEAR in cluster size — the
    # uncollapsed all-pairs form would be C(12000,2) = 7.2e7) plus
    # rep-level banding collisions bounded by the cap (<=C(20,2)=190 per
    # band) and random-text noise
    n_dup = int(n * dup_frac)
    assert n_dup - 1 <= n_cand <= n_dup - 1 + 4 * 190 + 500
    assert n_pairs <= n_cand
    # all verified pairs are within the duplicate slice
    bad = pairs.where(
        (F.col("id_a") >= int(n * dup_frac)) | (F.col("id_b") >= int(n * dup_frac))
    ).count()
    assert bad == 0
