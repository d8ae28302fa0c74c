"""Semantic shims for ClickHouse operators Spark lacks natively.

Each is an API-level DataFrame transformation (no Catalyst extension
needed — SURVEY.md §4.2): ASOF JOIN, ANY JOIN, LIMIT n BY, ORDER BY WITH
FILL, WITH TOTALS, topK.
"""

from mcp_clickhouse_spark.operators.asof_join import asof_join  # noqa: F401
from mcp_clickhouse_spark.operators.any_join import any_join  # noqa: F401
from mcp_clickhouse_spark.operators.limit_by import limit_by  # noqa: F401
from mcp_clickhouse_spark.operators.with_fill import with_fill  # noqa: F401
from mcp_clickhouse_spark.operators.with_totals import with_totals  # noqa: F401
from mcp_clickhouse_spark.operators.map_agg import max_map, min_map, sum_map  # noqa: F401
from mcp_clickhouse_spark.operators.topk import top_k, top_k_weighted  # noqa: F401
from mcp_clickhouse_spark.operators.funnel import (  # noqa: F401
    retention,
    sequence_match,
    window_funnel,
)
from mcp_clickhouse_spark.operators.salting import salted_agg, salted_join  # noqa: F401
