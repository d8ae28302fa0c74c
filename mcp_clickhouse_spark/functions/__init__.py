"""Reusable column-expression builders shared across the engine."""

from mcp_clickhouse_spark.functions.exact import (  # noqa: F401
    cents,
    cents_sql,
    exact_avg,
    exact_sum,
)
