"""Reusable column-expression builders shared across the engine."""

from mcp_clickhouse_spark.functions.exact import cents, exact_avg, exact_sum  # noqa: F401
