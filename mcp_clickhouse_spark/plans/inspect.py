"""Helpers for asserting plan SHAPES — the properties that make queries
scale (pushdown, pruning, broadcast, bounded exchanges) rather than just
produce correct rows. tests/test_plans.py builds its gates on these."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def count_nodes(plan: str, node: str) -> int:
    """Operator occurrences in the plan TREE only (formatted mode repeats
    every node in the details section)."""
    tree = plan.split("\n\n(")[0]
    return sum(1 for ln in tree.splitlines() if node in ln)


def pushed_filters(plan: str) -> list[str]:
    """All PushedFilters entries, flattened."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        out += [p.strip() for p in m.group(1).split(",") if p.strip()]
    return out


def read_schema_columns(plan: str) -> list[str]:
    """Column names from the first ReadSchema entry (scan projection)."""
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    if not m:
        return []
    return [f.split(":")[0].strip() for f in m.group(1).split(",") if f.strip()]
