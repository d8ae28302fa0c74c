"""Round-18 optimization round: equivalence pins for the operator internals
that changed.

The headline change is pipe_minhash_lsh's candidate generator: the star/
banding two-branch union became ONE generator (members ride synthetic
band=-1 buckets).  Candidate PAIR SETS are the rows-only contract surface,
so the pin is exact set equality against a faithful reconstruction of the
pre-r18 shape, on adversarial synthetic corpora AND the real testdata.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from mcp_clickhouse_spark.session import get_spark

    return get_spark(app_name="test-r18-opt")


def _legacy_candidates(sigs, id_col="doc_id", bands=8, rows_per_band=4,
                       max_bucket_size=500):
    """Byte-faithful reconstruction of the pre-r18 collapse_identical=True
    shape: star pairs from a window-min filter, banding over reps only,
    union, distinct."""
    from pyspark.sql import Window

    from mcp_clickhouse_spark.pipeline.dedup import (
        band_bucket_posexplode,
        bucket_pairs,
    )

    rep_w = Window.partitionBy("signature")
    with_rep = sigs.withColumn("_rep", F.min(id_col).over(rep_w))
    star = with_rep.where(F.col(id_col) != F.col("_rep")).select(
        F.col("_rep").alias("id_a"), F.col(id_col).alias("id_b")
    )
    banded = with_rep.where(F.col(id_col) == F.col("_rep")).selectExpr(
        id_col, band_bucket_posexplode(bands, rows_per_band)
    )
    return bucket_pairs(banded, id_col, max_bucket_size).unionByName(star).distinct()


def _pairs(df):
    return sorted((r["id_a"], r["id_b"]) for r in df.collect())


CORPUS = [
    # exact-dup cluster of 4 (star pairs must attach to min id 10)
    (10, "the quick brown fox jumps over the lazy dog again and again"),
    (11, "the quick brown fox jumps over the lazy dog again and again"),
    (12, "the quick brown fox jumps over the lazy dog again and again"),
    (13, "the quick brown fox jumps over the lazy dog again and again"),
    # near-dup pair (one word changed) — must come from banding
    (20, "pack my box with five dozen liquor jugs before noon today ok"),
    (21, "pack my box with five dozen liquor jugs before noon tomorrow ok"),
    # unique docs
    (30, "completely unrelated content about distributed query planning"),
    (31, "yet another document mentioning shuffle partitions and skew"),
    # short docs (shingle padding path) — identical pair
    (40, "tiny"),
    (41, "tiny"),
    # empty-ish doc
    (50, " "),
    # a second exact-dup cluster interleaved with the near-dups
    (60, "pack my box with five dozen liquor jugs before noon today ok"),
]


def test_minhash_candidates_unified_generator_matches_legacy(spark):
    from mcp_clickhouse_spark.pipeline.dedup import (
        minhash_lsh_candidates,
        minhash_signatures,
        release_persisted,
    )

    df = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    sigs = minhash_signatures(df, num_hashes=32)
    got = _pairs(minhash_lsh_candidates(sigs, bands=8, rows_per_band=4))
    want = _pairs(_legacy_candidates(sigs))
    assert got == want and len(got) > 0
    # structure sanity: doc 60 dups doc 20's text, so (20, 60) is a star
    # pair; the exact-dup cluster stars on 10
    assert (10, 11) in got and (10, 12) in got and (10, 13) in got
    assert (20, 60) in got
    release_persisted()
    spark.catalog.clearCache()


def test_minhash_candidates_null_ids_dropped_like_legacy(spark):
    from mcp_clickhouse_spark.pipeline.dedup import (
        minhash_lsh_candidates,
        minhash_signatures,
        release_persisted,
    )

    rows = CORPUS + [
        (None, "the quick brown fox jumps over the lazy dog again and again"),
        (None, "null cluster only text that matches nothing else at all"),
        (None, "null cluster only text that matches nothing else at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    sigs = minhash_signatures(df, num_hashes=32)
    got = _pairs(minhash_lsh_candidates(sigs, bands=8, rows_per_band=4))
    want = _pairs(_legacy_candidates(sigs))
    # legacy branch predicates (id =/!= rep) silently dropped NULL ids;
    # the unified generator filters them explicitly — sets must agree and
    # contain no NULLs
    assert got == want
    assert all(a is not None and b is not None for a, b in got)
    release_persisted()
    spark.catalog.clearCache()


def test_minhash_candidates_match_legacy_on_testdata(spark):
    """Full-corpus pin at sf0.001 (real near-dup structure from the driver
    generator) and bucket-cap stress via a tiny max_bucket_size."""
    from mcp_clickhouse_spark.pipeline.dedup import (
        minhash_lsh_candidates,
        minhash_signatures,
        release_persisted,
    )
    from mcp_clickhouse_spark.session import read_table

    d = read_table(spark, "/root/testdata/sf0.001", "documents")
    sigs = minhash_signatures(d, num_hashes=32)
    for cap in (500, 2):  # default, and a cap small enough to truncate
        got = _pairs(
            minhash_lsh_candidates(
                sigs, bands=8, rows_per_band=4, max_bucket_size=cap
            )
        )
        want = _pairs(
            _legacy_candidates(sigs, max_bucket_size=cap)
        )
        assert got == want and len(got) > 0, cap
        release_persisted()
        spark.catalog.clearCache()


def test_minhash_lsh_full_query_rows_unchanged(spark):
    """End-to-end: the declared pipe_minhash_lsh output (id_a, id_b,
    jaccard) through the new candidate generator equals the legacy shape
    fed through the same verify."""
    from mcp_clickhouse_spark.pipeline.dedup import (
        jaccard_verify,
        minhash_lsh_candidates,
        minhash_signatures,
        release_persisted,
    )
    from mcp_clickhouse_spark.session import read_table

    d = read_table(spark, "/root/testdata/sf0.001", "documents")
    sigs = minhash_signatures(d, num_hashes=32)
    new = sorted(
        map(tuple, jaccard_verify(
            minhash_lsh_candidates(sigs, bands=8, rows_per_band=4), d,
            threshold=0.5,
        ).collect())
    )
    legacy = sorted(
        map(tuple, jaccard_verify(
            _legacy_candidates(sigs), d, threshold=0.5, precompute_sets=False
        ).collect())
    )
    assert new == legacy and len(new) > 0
    release_persisted()
    spark.catalog.clearCache()


def test_connected_components_one_action_per_round(spark):
    """r18: lazy localCheckpoints — the convergence signature is the ONLY
    job a CC round launches (it materializes the round's checkpoint as a
    side effect).  The eager form cost 2 jobs/round plus 2 upfront
    materializations: this graph took 8 jobs before, 4 after."""
    from mcp_clickhouse_spark.pipeline.clustering import dedup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 20)], ["id_a", "id_b"]
    )
    sc = spark.sparkContext

    def jobs() -> int:
        return int(sc._jsc.sc().dagScheduler().nextJobId())

    # count under AQE-off (the bench regime): AQE adds a scheduler job per
    # exchange stage, which would drown the action count being pinned
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        got = sorted(map(tuple, dedup_clusters(pairs).collect()))  # warm
        j0 = jobs()
        assert sorted(map(tuple, dedup_clusters(pairs).collect())) == got
        n_jobs = jobs() - j0
        # initial signature + <=2 round signatures + final collect
        assert n_jobs <= 4, n_jobs
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
    # labels correct: {1,2,3} -> 1, {10,11} -> 10, {20} -> 20
    assert got == [(1, 1, 3, True), (2, 1, 3, False), (3, 1, 3, False),
                   (10, 10, 2, True), (11, 10, 2, False), (20, 20, 1, True)]


def test_asof_prefilter_gated_on_selectivity(spark):
    """r18 asof probe-side prune (guide §3.2): fires only when the left is
    broadcast-small AND ≫smaller than the right; the bench shape (two
    comparable filters of the same table) must keep its plan unchanged."""
    from mcp_clickhouse_spark.operators.asof_join import asof_join
    from mcp_clickhouse_spark.plans import explain_formatted
    from mcp_clickhouse_spark.session import read_table

    sf = "/root/testdata/sf0.01"
    ev = read_table(spark, sf, "events")
    # bench shape: comparable sides -> NO semi-join in the plan
    left_big = ev.where(F.col("event_type") != "signup").select(
        "event_id", "user_id", "ts"
    )
    right = ev.where(F.col("event_type") == "signup").select(
        "user_id", "ts", "value"
    )
    plain = asof_join(left_big, right, on=["user_id"], left_ts="ts",
                      right_ts="ts", right_cols=["value"])
    assert "LeftSemi" not in explain_formatted(plain)

    # selective probe: a parquet-backed tiny left (real size statistics —
    # a createDataFrame local frame reads as unknown/Long.Max and correctly
    # takes the conservative branch) against a 100x bigger right history
    left_small = read_table(spark, "/root/testdata/sf0.001", "events").where(
        F.col("event_type") != "signup"
    ).select("event_id", "user_id", "ts")
    right_big = read_table(spark, "/root/testdata/sf0.1", "events").where(
        F.col("event_type") == "signup"
    ).select("user_id", "ts", "value")
    pruned = asof_join(left_small, right_big, on=["user_id"], left_ts="ts",
                       right_ts="ts", right_cols=["value"])
    assert "LeftSemi" in explain_formatted(pruned)
    # rows identical to the ungated formulation (prune only removes right
    # rows that join to nothing): rebuild with the estimator disabled
    import unittest.mock as mock

    with mock.patch(
        "mcp_clickhouse_spark.plans.inspect.estimated_size_bytes",
        return_value=None,
    ):
        ref = asof_join(left_small, right_big, on=["user_id"], left_ts="ts",
                        right_ts="ts", right_cols=["value"])
        assert "LeftSemi" not in explain_formatted(ref)
        ref_rows = ref.collect()
    got = pruned.collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, ref_rows))
    assert len(got) > 0
