"""Skew mitigation: salted two-phase aggregation and salted joins.

AQE's skew-join splitting handles most runtime skew, but two patterns still
need explicit salting at 100 TB:

  - a groupBy where one key holds a huge share of rows (hot partition in
    the FINAL aggregation — partial aggregation upstream doesn't help when
    the partial results themselves are huge, e.g. collect_list);
  - a shuffle join against a skewed key distribution where the skewed side
    can't be broadcast.

`salted_agg` spreads each group over `n_salts` sub-groups (random salt),
aggregates partially per (key, salt), then merges sub-aggregates per key —
two small shuffles instead of one hot one. Works for any algebraic
aggregate (one with a merge function).

`salted_join` replicates the small side `n_salts`× and salts the big side's
key randomly, turning one hot hash bucket into n_salts cooler ones.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    merge_aggs: Sequence[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``partial_aggs`` aggregate raw rows per (keys, salt); ``merge_aggs``
    combine the partials per keys (referencing the partial output columns).
    Example::

        salted_agg(df, ["k"],
                   [F.count("*").alias("c"), F.sum("x").alias("s")],
                   [F.sum("c").alias("c"),  F.sum("s").alias("s")])
    """
    keys = list(keys)
    salted = df.withColumn("__salt", (F.rand(seed=7) * n_salts).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*merge_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    Use when `small` is too large to broadcast and `big` is skewed on the
    join key. Output columns match a plain ``big.join(small, on, how)``.
    """
    on = list(on)
    big_s = big.withColumn("__salt", (F.rand(seed=7) * n_salts).cast("int"))
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return big_s.join(small_s, on=on + ["__salt"], how=how).drop("__salt")
