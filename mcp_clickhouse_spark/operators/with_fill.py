"""ORDER BY … WITH FILL — ClickHouse gap-filling (SURVEY.md §2.3.6).

`ORDER BY x WITH FILL FROM a TO b STEP s` materializes missing x values in
the output. Spark shim: generate the dense axis with `sequence()` + explode
(distributed — `sequence` builds per-row arrays on executors, no driver
loop), then LEFT JOIN the real rows onto it. With INTERPOLATE-like behavior
left to the caller (fill columns default to NULL, or a constant).

Scale: the generated axis is tiny relative to data (one row per step); the
join broadcasts the axis when small, and the real data arrives already
aggregated by x.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_fill(
    df: DataFrame,
    col: str,
    start,
    stop,
    step,
    fill_values: dict[str, object] | None = None,
    interpolate: dict[str, str] | None = None,
) -> DataFrame:
    """Densify integer/date axis ``col`` over [start, stop] by ``step``.

    ``fill_values``: constant per column for generated rows (plain WITH FILL).
    ``interpolate``: per-column mode for generated rows — ``"prev"`` carries
    the last real value forward (ClickHouse INTERPOLATE (c) default),
    ``"linear"`` linearly interpolates between the surrounding real values
    (numeric axis only). Both are window passes over the densified frame —
    one extra sort, no extra shuffle beyond the axis partitioning.
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    axis = spark.range(1).select(
        F.explode(F.sequence(F.lit(start), F.lit(stop), F.lit(step))).alias(col)
    )
    axis = axis.withColumn(col, F.col(col).cast(dict(df.dtypes)[col]))
    # WITH FILL is applied to already-aggregated frames; AQE sees the small
    # post-agg size at runtime and converts this to a broadcast join.
    out = axis.join(df.withColumn("__real", F.lit(1)), on=col, how="left")
    for c, v in (fill_values or {}).items():
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(v)))
    if interpolate:
        w_prev = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, 0)
        w_next = Window.orderBy(col).rowsBetween(0, Window.unboundedFollowing)
        for c, mode in interpolate.items():
            prev_v = F.last(F.col(c), ignorenulls=True).over(w_prev)
            if mode == "prev":
                out = out.withColumn(c, F.coalesce(F.col(c), prev_v))
            elif mode == "linear":
                prev_x = F.last(
                    F.when(F.col(c).isNotNull(), F.col(col)), ignorenulls=True
                ).over(w_prev)
                next_v = F.first(F.col(c), ignorenulls=True).over(w_next)
                next_x = F.first(
                    F.when(F.col(c).isNotNull(), F.col(col)), ignorenulls=True
                ).over(w_next)
                frac = (F.col(col) - prev_x) / (next_x - prev_x)
                lerp = prev_v + (next_v - prev_v) * frac
                out = out.withColumn(
                    c,
                    F.coalesce(
                        F.col(c),
                        F.when(next_x.isNotNull() & prev_x.isNotNull(), lerp).otherwise(
                            prev_v
                        ),
                    ),
                )
            else:
                raise ValueError(f"with_fill: unknown interpolate mode {mode!r}")
    return out.drop("__real").orderBy(col)
