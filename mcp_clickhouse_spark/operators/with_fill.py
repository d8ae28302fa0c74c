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
) -> DataFrame:
    """Densify integer/date axis ``col`` over [start, stop] by ``step``."""
    spark = df.sparkSession
    axis = spark.range(1).select(
        F.explode(F.sequence(F.lit(start), F.lit(stop), F.lit(step))).alias(col)
    )
    axis = axis.withColumn(col, F.col(col).cast(dict(df.dtypes)[col]))
    # WITH FILL is applied to already-aggregated frames; AQE sees the small
    # post-agg size at runtime and converts this to a broadcast join.
    out = axis.join(df, on=col, how="left")
    for c, v in (fill_values or {}).items():
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(v)))
    return out.orderBy(col)
