"""LIMIT n BY cols — ClickHouse per-group limit (SURVEY.md §2.3.6).

`SELECT … LIMIT n BY k1, k2` keeps the first n rows of each (k1,k2) group.
Spark shim: row_number over a window partitioned by the BY columns. The
ordering must be explicit for determinism (ClickHouse relies on ORDER BY
before LIMIT BY the same way).

Scale: single shuffle on the BY keys; per-partition sort + early filter.
For small n Spark's WindowGroupLimit physical optimization (rank-limit
pushdown) keeps only n rows per group per partition before the final sort.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def limit_by(df: DataFrame, by: Sequence[str], n: int, order: Sequence[Column]) -> DataFrame:
    w = Window.partitionBy(*list(by)).orderBy(*list(order))
    return df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") <= n).drop("__rn")
