"""ANY JOIN — ClickHouse's first-match-only join (SURVEY.md §2.3.3).

`LEFT ANY JOIN` yields at most one right match per left row. ClickHouse picks
an arbitrary match; here the match is made DETERMINISTIC: the right side is
reduced to one row per key — the minimum by ``pick_order`` — with a
row_number window, then a plain equi-join runs. Determinism is what lets the
result hash-match an oracle, and it costs nothing extra: the dedup is one
shuffle that the join would have needed anyway (same key), so Catalyst reuses
the partitioning.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def any_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    pick_order: Sequence[Column] | None = None,
    how: str = "left",
) -> DataFrame:
    """Join with at most one right row per key.

    ``pick_order`` — ordering that selects the surviving right row (default:
    ascending by all non-key right columns, which is deterministic but
    arbitrary; pass an explicit order for meaningful picks).
    """
    on = list(on)
    if pick_order is None:
        pick_order = [F.col(c).asc() for c in right.columns if c not in on]
    w = Window.partitionBy(*on).orderBy(*pick_order)
    right_one = (
        right.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")
    )
    return left.join(right_one, on=on, how=how)
