"""Physical-plan inspection utilities (used by the plan-quality gates)."""

from mcp_clickhouse_spark.plans.inspect import (  # noqa: F401
    count_nodes,
    explain_formatted,
    pushed_filters,
    read_schema_columns,
)
