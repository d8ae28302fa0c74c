"""WITH TOTALS — ClickHouse GROUP BY modifier appending a grand-total row
(SURVEY.md §2.3.4).

Realized with `rollup` + a filter keeping only depth-0 and depth-max rows:
Spark computes the grand total in the same aggregation pass (no second scan
of the input), which is the plan ClickHouse uses too. The totals row carries
NULL group keys, like ClickHouse's JSON `totals` section rendered inline.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_totals(df: DataFrame, group: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    group = list(group)
    gid = F.grouping_id(*[F.col(c) for c in group])
    all_marked = (1 << len(group)) - 1
    return (
        df.rollup(*group)
        .agg(*aggs, gid.alias("__gid"))
        .where((F.col("__gid") == 0) | (F.col("__gid") == all_marked))
        .drop("__gid")
    )
