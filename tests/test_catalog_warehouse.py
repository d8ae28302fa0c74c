"""Catalog tools against a REAL database (warehouse tables, not temp views):
multi-database listing, cross-database list_tables, DDL/provider metadata."""

from __future__ import annotations

import pytest

from mcp_clickhouse_spark.tools import list_databases, list_tables, run_select_query


@pytest.fixture(scope="module")
def warehouse_db(spark):
    spark.sql("CREATE DATABASE IF NOT EXISTS analytics_test")
    spark.sql(
        """
        CREATE TABLE IF NOT EXISTS analytics_test.metrics
        USING PARQUET
        COMMENT 'engine metrics table'
        AS SELECT id AS metric_id, CAST(id * 1.5 AS DOUBLE) AS metric_value FROM range(100)
        """
    )
    yield "analytics_test"
    spark.sql("DROP TABLE IF EXISTS analytics_test.metrics")
    spark.sql("DROP DATABASE IF EXISTS analytics_test")


def test_database_appears(spark, warehouse_db):
    assert warehouse_db in list_databases(spark)
    assert list_databases(spark, like="analytics%") == [warehouse_db]


def test_list_tables_in_real_db(spark, warehouse_db):
    resp = list_tables(spark, warehouse_db)
    assert resp["total_tables"] == 1
    tb = resp["tables"][0]
    assert tb["name"] == "metrics"
    # engine = storage provider (MergeTree analog slot); engine_full keeps
    # the managed/external type (round-6: was the bare tableType)
    assert tb["engine"].lower() == "parquet"
    assert "MANAGED" in tb["engine_full"] and "parquet" in tb["engine_full"].lower()
    assert "CREATE TABLE" in tb["create_table_query"]
    assert "metrics" in tb["create_table_query"]
    cols = {c["name"]: c["column_type"] for c in tb["columns"]}
    assert cols == {"metric_id": "bigint", "metric_value": "double"}


def test_query_qualified_table(spark, warehouse_db):
    res = run_select_query(
        spark, f"SELECT COUNT(*) AS n, MAX(metric_id) AS mx FROM {warehouse_db}.metrics"
    )
    assert res["rows"] == [[100, 99]]


def test_statistics_after_analyze(spark, warehouse_db):
    """total_rows/total_bytes (system.tables analog) populate from ANALYZE;
    parts = backing file count."""
    spark.sql(f"ANALYZE TABLE {warehouse_db}.metrics COMPUTE STATISTICS")
    resp = list_tables(spark, warehouse_db)
    tb = resp["tables"][0]
    assert tb["total_rows"] == 100
    assert tb["total_bytes"] and tb["total_bytes"] > 0
    assert tb["parts"] and tb["parts"] >= 1
    assert tb["active_parts"] == tb["parts"]


def test_table_comment_surfaces(spark, warehouse_db):
    resp = list_tables(spark, warehouse_db)
    # comment lives in DDL (catalog comment surfacing varies by provider)
    assert "engine metrics table" in resp["tables"][0]["create_table_query"] or (
        resp["tables"][0]["comment"] == "engine metrics table"
    )


def test_bucketed_table_engine_metadata(spark, warehouse_db):
    """Round-6 (r5 verdict next #9): a bucketed warehouse table surfaces its
    provider, bucket-sort layout (engine_full), sorting_key/primary_key,
    and backing file count — the Table dataclass fidelity note (SURVEY
    §1.1)."""
    spark.sql(
        """
        CREATE TABLE IF NOT EXISTS analytics_test.bucketed
        USING PARQUET
        CLUSTERED BY (k) SORTED BY (s) INTO 4 BUCKETS
        AS SELECT id % 10 AS k, id AS s, id * 2 AS v FROM range(1000)
        """
    )
    try:
        resp = list_tables(spark, warehouse_db)
        tb = {t_["name"]: t_ for t_ in resp["tables"]}["bucketed"]
        assert tb["engine"].lower() == "parquet"
        assert "CLUSTERED BY (k)" in tb["engine_full"]
        assert "SORTED BY (s)" in tb["engine_full"]
        assert "4 BUCKETS" in tb["engine_full"]
        assert tb["sorting_key"] == "s"
        assert tb["primary_key"] == "k"
        assert tb["parts"] and tb["parts"] >= 4  # one file per bucket minimum
    finally:
        spark.sql("DROP TABLE IF EXISTS analytics_test.bucketed")
