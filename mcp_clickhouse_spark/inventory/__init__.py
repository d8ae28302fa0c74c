"""The SURVEY.md §2 operator inventory, wired to the driver contract.

Each module registers named queries via :mod:`registry`; ``__spark_entry__``
exposes them through ``queries()`` / ``oracle_sql()``.
"""

from mcp_clickhouse_spark.inventory.registry import QUERIES, QuerySpec, query  # noqa: F401


def load_all() -> None:
    """Import every inventory module so its @query decorators run."""
    from mcp_clickhouse_spark.inventory import (  # noqa: F401
        aggregates,
        behavioral,
        core,
        dialect_shims,
        extras,
        joins,
        more_ops,
        pipeline_ops,
        round13,
        round14,
        round15,
        round16,
        round17,
        scalars,
        setops,
        timeseries,
        windows,
    )
    from mcp_clickhouse_spark.inventory.ordering import apply_priority

    apply_priority()
