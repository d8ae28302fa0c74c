"""sumMap / minMap / maxMap — ClickHouse's map-valued aggregates
(reference surface: the parametric-aggregate family of SURVEY.md §2.3.4).

ClickHouse ``sumMap(keys, values)`` takes parallel key/value arrays per row
and returns one sorted map of key → aggregated value per group.  The
Spark-first realization: zip the arrays in the scan projection, explode ONCE
into (group, key, value) rows, aggregate with map-side partial combine, and
re-assemble the map with ``map_from_entries(array_sort(collect_list(...)))``
— key-sorted exactly like ClickHouse's output, so results are deterministic.

Scale shape: the explode multiplies rows by the (bounded) per-row map size
and the single (group, key) aggregation carries partial sums; the final
per-group collect_list holds one entry per DISTINCT key — bounded by the
key-domain, not the row count.  No driver-side work.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_AGGS = {"sum": F.sum, "min": F.min, "max": F.max}


def _map_agg(
    df: DataFrame,
    group: Sequence[str],
    keys_col: str,
    vals_col: str,
    how: str,
    out_col: str,
) -> DataFrame:
    if how not in _AGGS:
        raise ValueError(f"map agg must be one of {sorted(_AGGS)}, got {how!r}")
    group = list(group)
    kv = df.select(
        *group,
        F.explode(F.arrays_zip(F.col(keys_col).alias("k"), F.col(vals_col).alias("v"))).alias(
            "e"
        ),
    ).select(*group, F.col("e.k").alias("k"), F.col("e.v").alias("v"))
    per_key = kv.groupBy(*group, "k").agg(_AGGS[how]("v").alias("v"))
    return (
        per_key.groupBy(*group)
        .agg(F.map_from_entries(F.array_sort(F.collect_list(F.struct("k", "v")))).alias(out_col))
    )


def sum_map(df, group, keys_col, vals_col, out_col: str = "sum_map") -> DataFrame:
    """ClickHouse sumMap: per-group key-sorted map of key → SUM(value)."""
    return _map_agg(df, group, keys_col, vals_col, "sum", out_col)


def min_map(df, group, keys_col, vals_col, out_col: str = "min_map") -> DataFrame:
    """ClickHouse minMap: per-group key-sorted map of key → MIN(value)."""
    return _map_agg(df, group, keys_col, vals_col, "min", out_col)


def max_map(df, group, keys_col, vals_col, out_col: str = "max_map") -> DataFrame:
    """ClickHouse maxMap: per-group key-sorted map of key → MAX(value)."""
    return _map_agg(df, group, keys_col, vals_col, "max", out_col)
