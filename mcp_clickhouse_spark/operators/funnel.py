"""Behavioral-analytics aggregates: ClickHouse retention / windowFunnel /
sequenceMatch realized on DataFrames (SURVEY.md §2.3.4 — parametric
aggregate family; ClickHouse docs are the behavioral spec).

All three are per-entity aggregations over an event stream:

  retention(c1, c2, …)   → [has(c1), has(c1)&has(c2), has(c1)&has(c3), …]
  windowFunnel(w)(ts, s1, s2, …) → deepest prefix of steps s1→s2→… where
                           each step occurs after the previous and within
                           w of step 1 (strictly-increasing timestamps)
  sequenceMatch(pat)     → regex over the entity's time-ordered event string

Scale: retention is ONE hash aggregation (bool_or per condition).
windowFunnel is k-1 self-aggregation rounds (k = #steps, small constant):
each round is a groupBy over already-aggregated (entity, step_time) rows.
sequenceMatch sorts per-entity events inside an aggregation
(sort_array(collect_list(struct))) — bounded by per-entity event counts,
the same contract ClickHouse has.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def retention(
    df: DataFrame, entity: str, conditions: Sequence[Column]
) -> DataFrame:
    """(entity, r1..rN): r1 = saw cond1; rI = saw cond1 AND condI (I>1)."""
    aggs = [
        F.bool_or(c).alias(f"_saw{i}") for i, c in enumerate(conditions, start=1)
    ]
    saw = df.groupBy(entity).agg(*aggs)
    out_cols = [F.col(entity)]
    first = F.col("_saw1")
    for i in range(1, len(conditions) + 1):
        col = first if i == 1 else (first & F.col(f"_saw{i}"))
        out_cols.append(col.alias(f"r{i}"))
    return saw.select(*out_cols)


def window_funnel(
    df: DataFrame,
    entity: str,
    ts_col: str,
    steps: Sequence[Column],
    window_seconds: int,
) -> DataFrame:
    """(entity, funnel_level): deepest step chain s1 < s2 < … < sK with
    ts(sK) - ts(s1) <= window, each step strictly after the previous.

    Greedy earliest-start semantics: step 1 anchors at its EARLIEST
    occurrence, each later step at its earliest occurrence after the
    previous step (matches ClickHouse's default mode closely enough to
    oracle with the same SQL logic).
    """
    # Integer microseconds on both engines (DuckDB epoch_us) — exact compare.
    ts = F.unix_micros(F.col(ts_col).cast("timestamp"))
    window_us = int(window_seconds) * 1_000_000
    base = df.select(F.col(entity), ts.alias("_ts"), *[
        s.alias(f"_is{i}") for i, s in enumerate(steps, start=1)
    ])
    # t1 = earliest step-1 time per entity
    cur = base.groupBy(entity).agg(
        F.min(F.when(F.col("_is1"), F.col("_ts"))).alias("t1")
    )
    prev_t = "t1"
    for i in range(2, len(steps) + 1):
        nxt = (
            base.join(cur, on=entity, how="inner")
            .where(
                F.col(f"_is{i}")
                & F.col(prev_t).isNotNull()
                & (F.col("_ts") > F.col(prev_t))
                & (F.col("_ts") <= F.col("t1") + F.lit(window_us))
            )
            .groupBy(entity)
            .agg(F.min("_ts").alias(f"t{i}"))
        )
        cur = cur.join(nxt, on=entity, how="left")
        prev_t = f"t{i}"
    level = F.lit(0)
    for i in range(1, len(steps) + 1):
        level = F.when(F.col(f"t{i}").isNotNull(), i).otherwise(level)
    # build level by deepest non-null t_i (t_i non-null implies t_{i-1} non-null)
    return cur.select(F.col(entity), level.alias("funnel_level"))


def sequence_match(
    df: DataFrame,
    entity: str,
    ts_col: str,
    order_col: str,
    event_char: Column,
    pattern: str,
) -> DataFrame:
    """(entity, matched): regex `pattern` over the entity's time-ordered
    event-character string (each event contributes one character from
    `event_char`). The portable core of ClickHouse sequenceMatch: CH
    patterns like (?1)(?2) compile to character-class regexes here."""
    ordered = F.transform(
        F.sort_array(
            F.collect_list(F.struct(F.col(ts_col), F.col(order_col), event_char.alias("c")))
        ),
        lambda s: s["c"],
    )
    return (
        df.groupBy(entity)
        .agg(F.concat_ws("", ordered).alias("_seq"))
        .select(F.col(entity), F.col("_seq").rlike(pattern).alias("matched"))
    )
