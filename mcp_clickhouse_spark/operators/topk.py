"""topK(k) — ClickHouse's approximate most-frequent-values aggregate
(SURVEY.md §2.3.4).

Exact, scale-correct realization: count per (group, value) with a map-side
partial aggregation, then keep the k most frequent values per group with a
rank window. Two shuffles total — (group,value) then group — both on
aggregated (small) data, so this beats collecting frequency maps to the
driver at any scale. Ties broken by value for determinism (ClickHouse topK
is approximate and unordered; deterministic exact output is strictly
stronger and lets the result be oracle-checked).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, group: Sequence[str], value: str, k: int) -> DataFrame:
    """Return (group, value, cnt, rk) — the k most frequent values per group."""
    group = list(group)
    counted = df.groupBy(*group, value).agg(F.count("*").alias("cnt"))
    w = Window.partitionBy(*group).orderBy(F.col("cnt").desc(), F.col(value).asc())
    return (
        counted.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
    )


def top_k_weighted(
    df: DataFrame, group: Sequence[str], value: str, weight: str, k: int
) -> DataFrame:
    """ClickHouse topKWeighted(k)(value, weight): the k values with the
    largest total weight per group — same exact two-shuffle shape as
    :func:`top_k` with SUM(weight) replacing COUNT(*).

    Returns (group, value, total_weight, rk); ties break by value.
    """
    group = list(group)
    summed = df.groupBy(*group, value).agg(F.sum(weight).alias("total_weight"))
    w = Window.partitionBy(*group).orderBy(
        F.col("total_weight").desc(), F.col(value).asc()
    )
    return summed.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k)
