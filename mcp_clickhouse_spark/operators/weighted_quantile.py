"""Exact weighted quantile — ClickHouse ``quantileExactWeighted`` (round 7).

CH semantics (public docs, Functions/quantileexactweighted): treat each
value as repeated ``weight`` times, take the exact quantile of that
expanded multiset — the smallest value whose cumulative weight reaches
``level × total_weight``.  No expansion is materialized here: a running
cumulative-weight window over the values sorted ascending within each
group finds the same element.

Scale: ONE shuffle (the window partition by the group keys doubles as the
aggregation partition); the cumulative sum runs inside the sorted window,
and the final ``min`` per group is a map-side-combinable aggregate over
the already-partitioned frame.  No collect, no explode — weight-expanding
(the guided-error fallback the dialect used to suggest) would multiply
rows by the mean weight; this is weight-oblivious in row count.

The result is always an ACTUAL data value (lower interpolation, exactly
CH), so cross-engine comparisons are hash-exact — no float interpolation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def weighted_quantile(
    df: DataFrame,
    value_col: str,
    weight_col: str | Column,
    level: float,
    by: list[str] | None = None,
    out_col: str = "wq",
) -> DataFrame:
    """Per-group exact weighted quantile of ``value_col``.

    ``level`` in (0, 1]; ``by`` empty → one global row.  Ties in value are
    merged by the cumulative sum naturally (equal values share rank
    order); zero/negative weights are the caller's responsibility, as in
    ClickHouse.

    Groups whose values are ALL NULL keep their row with a NULL quantile
    (ClickHouse keeps the group and returns nan — NULL is this engine's
    rendering of that, consistent with the -OrNull combinators; round-7
    advisor: previously the group row disappeared entirely).
    """
    if not 0 < level <= 1:
        raise ValueError(f"weighted_quantile: level must be in (0, 1], got {level}")
    keys = by or []
    src = df
    # NULL values are ignored, as in every ClickHouse aggregate — a
    # NULL-valued row's weight must not inflate the cumulative/total sums
    # (round-7 review finding: NULLs sort first under asc and shifted the
    # threshold onto the wrong element)
    df = df.where(F.col(value_col).isNotNull())
    w = (
        F.col(weight_col) if isinstance(weight_col, str) else weight_col
    ).cast("double")
    cum = (
        Window.partitionBy(*keys)
        .orderBy(F.col(value_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = Window.partitionBy(*keys)
    hit = df.withColumn("__wq_cum", F.sum(w).over(cum)).withColumn(
        "__wq_tot", F.sum(w).over(tot)
    ).where(F.col("__wq_cum") >= F.lit(level) * F.col("__wq_tot"))
    agg = hit.groupBy(*keys).agg(F.min(value_col).alias(out_col))
    if keys:
        # Re-attach all-NULL groups with a NULL quantile.  The distinct +
        # left join shuffle on the same group keys as the window — AQE
        # broadcasts the (group-cardinality-sized) agg side in practice.
        # eqNullSafe: GROUP BY treats NULL as a normal key (CH too), so a
        # NULL-keyed group that HAS values must still match its agg row —
        # join(on=keys) is null-unsafe equality and silently dropped its
        # quantile (round-8 review finding, confirmed live).
        right = agg.select(
            *[F.col(k).alias(f"__wq_{k}") for k in keys], out_col
        )
        cond = None
        for k in keys:
            c = F.col(k).eqNullSafe(F.col(f"__wq_{k}"))
            cond = c if cond is None else (cond & c)
        agg = (
            src.select(*keys).distinct()
            .join(right, on=cond, how="left")
            .select(*keys, out_col)
        )
    # global (no keys): groupBy().agg already yields one row with NULL min
    # on empty input, so the all-NULL case needs no special path
    return agg
