"""Behavioral-analytics aggregates: ClickHouse retention / windowFunnel /
sequenceMatch realized on DataFrames (SURVEY.md §2.3.4 — parametric
aggregate family; ClickHouse docs are the behavioral spec).

All three are per-entity aggregations over an event stream:

  retention(c1, c2, …)   → [has(c1), has(c1)&has(c2), has(c1)&has(c3), …]
  windowFunnel(w)(ts, s1, s2, …) → deepest chain s1→s2→… within w of the
                           chain's first event, with CH default-mode
                           RE-ANCHORING (each new s1 overwrites the level-1
                           anchor; equal timestamps chain)
  sequenceMatch(pat)     → regex over the entity's time-ordered event string

Scale: retention is ONE hash aggregation (bool_or per condition).
windowFunnel is ONE hash aggregation folding per-entity (t, idx) entries.
sequenceMatch sorts per-entity events inside an aggregation
(sort_array(collect_list(struct))).  MEMORY-BOUND: both buffer one
entity's kept events in a single aggregate buffer — the same
events-per-entity contract ClickHouse has; for entities with unbounded
event streams, pre-filter to the relevant conditions and/or pre-window
(group by (entity, time_bucket)) before aggregating.
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
    modes: Sequence[str] = (),
) -> DataFrame:
    """(entity, funnel_level): ClickHouse windowFunnel DEFAULT mode,
    value-faithful (round 9 — was greedy-earliest-anchor via k-1 join
    rounds; now ONE hash aggregation).

    Semantics (AggregateFunctionWindowFunnel::getEventLevel): one (t, idx)
    entry per matched condition, sorted by time; a per-level anchor array
    where cond-1 RE-ANCHORS level 1 on every occurrence (so c1@0, c1@50,
    c2@100 with window 60 reaches level 2 via the @50 anchor), level i
    chains when t <= anchor[i-1] + window (equal timestamps chain), and
    the propagated anchor is the chain's first timestamp.  funnel_level =
    deepest level whose anchor is set.

    Scale: one shuffle; the per-entity fold buffer is the same
    events-per-entity contract ClickHouse has — pre-filter or pre-window
    entities with unbounded event counts.

    ``modes`` (round 10 — the full CH mode set, combinable):
    ``strict_increase`` (each step strictly after the previous step's own
    event), ``strict_order`` (a non-condition event after the anchor
    freezes the fold; an out-of-order condition returns the filled-prefix
    level), ``strict_deduplication`` (a condition whose slot is already
    set returns its 1-based index mid-fold — CH's getEventLevel quirk,
    even below an already-reached level).  The strict_order/_dedup fold
    mirrors dialect._funnel_general_fold exactly.
    """
    modes = set(modes)
    unknown = modes - {"strict_increase", "strict_order", "strict_deduplication"}
    if unknown:
        raise ValueError(f"window_funnel: unknown modes {sorted(unknown)}")
    strict_increase = "strict_increase" in modes
    strict_order = "strict_order" in modes
    strict_dedup = "strict_deduplication" in modes
    # Integer microseconds on both engines (DuckDB epoch_us) — exact compare.
    ts = F.unix_micros(F.col(ts_col).cast("timestamp"))
    window_us = int(window_seconds) * 1_000_000
    k = len(steps)
    per_row = F.filter(
        F.array(*[
            F.when(s, F.struct(ts.alias("t"), F.lit(i).alias("i")))
            for i, s in enumerate(steps, start=1)
        ]),
        lambda e: e.isNotNull(),
    )
    if strict_order:
        # events matching NO condition become (t, 0) sentinels (CH add())
        per_row = F.when(
            F.size(per_row) == 0,
            F.array(F.struct(ts.alias("t"), F.lit(0).alias("i"))),
        ).otherwise(per_row)
    base = df.select(F.col(entity), per_row.alias("_ev"))
    ev = F.array_sort(F.flatten(F.collect_list("_ev")))

    if strict_order or strict_dedup:
        agg = _general_fold_col(
            ev, k, window_us, strict_increase, strict_order, strict_dedup
        )
        return base.groupBy(entity).agg(agg.alias("funnel_level"))

    if strict_increase:
        # per-level (anchor, own-event time); a step chains only STRICTLY
        # after the previous step's own event
        init = F.struct(*[
            c
            for i in range(1, k + 1)
            for c in (
                F.lit(None).cast("bigint").alias(f"a{i}"),
                F.lit(None).cast("bigint").alias(f"l{i}"),
            )
        ])

        def step_inc(acc: Column, e: Column) -> Column:
            is1 = e["i"] == 1
            fields = [
                F.when(is1, e["t"]).otherwise(acc["a1"]).alias("a1"),
                F.when(is1, e["t"]).otherwise(acc["l1"]).alias("l1"),
            ]
            for i in range(2, k + 1):
                prev = acc[f"a{i - 1}"]
                cond = (
                    (e["i"] == i)
                    & (e["t"] <= prev + F.lit(window_us))
                    & (e["t"] > acc[f"l{i - 1}"])
                )
                fields.append(F.when(cond, prev).otherwise(acc[f"a{i}"]).alias(f"a{i}"))
                fields.append(F.when(cond, e["t"]).otherwise(acc[f"l{i}"]).alias(f"l{i}"))
            return F.struct(*fields)

        def finish_any(acc: Column) -> Column:
            level = F.lit(0)
            for i in range(1, k + 1):
                level = F.when(acc[f"a{i}"].isNotNull(), i).otherwise(level)
            return level

        return base.groupBy(entity).agg(
            F.aggregate(ev, init, step_inc, finish_any).alias("funnel_level")
        )

    init = F.struct(*[
        F.lit(None).cast("bigint").alias(f"a{i}") for i in range(1, k + 1)
    ])

    def step(acc: Column, e: Column) -> Column:
        fields = [F.when(e["i"] == 1, e["t"]).otherwise(acc["a1"]).alias("a1")]
        for i in range(2, k + 1):
            prev = acc[f"a{i - 1}"]
            fields.append(
                F.when(
                    (e["i"] == i) & (e["t"] <= prev + F.lit(window_us)), prev
                ).otherwise(acc[f"a{i}"]).alias(f"a{i}")
            )
        return F.struct(*fields)

    def finish(acc: Column) -> Column:
        level = F.lit(0)
        for i in range(1, k + 1):
            level = F.when(acc[f"a{i}"].isNotNull(), i).otherwise(level)
        return level

    return base.groupBy(entity).agg(
        F.aggregate(ev, init, step, finish).alias("funnel_level")
    )


def _general_fold_col(
    ev: Column,
    k: int,
    window_us: int,
    strict_increase: bool,
    strict_order: bool,
    strict_dedup: bool,
) -> Column:
    """Column-API twin of dialect._funnel_general_fold: ClickHouse
    getEventLevel's else-if chain with mid-fold early returns carried in
    a ``d`` (done) field — see the dialect docstring for the branch
    order."""
    init_fields = [
        F.lit(None).cast("int").alias("d"),
        F.lit(False).alias("fe"),
    ]
    for i in range(1, k + 1):
        init_fields.append(F.lit(None).cast("bigint").alias(f"a{i}"))
        init_fields.append(F.lit(None).cast("bigint").alias(f"l{i}"))
    init = F.struct(*init_fields)

    def deepest(acc: Column) -> Column:
        level = F.lit(0)
        for i in range(1, k + 1):
            level = F.when(acc[f"a{i}"].isNotNull(), i).otherwise(level)
        return level

    def step(acc: Column, e: Column) -> Column:
        not_done = acc["d"].isNull()
        newd = F.when(~not_done, acc["d"])
        if strict_order:
            newd = newd.when(
                e["i"] == 0,
                F.when(acc["fe"], deepest(acc)).otherwise(
                    F.lit(None).cast("int")
                ),
            )
        if strict_dedup:
            for i in range(2, k + 1):
                newd = newd.when(
                    (e["i"] == i) & acc[f"a{i}"].isNotNull(), F.lit(i)
                )
        if strict_order:
            for i in range(2, k + 1):
                newd = newd.when(
                    (e["i"] == i) & acc["fe"] & acc[f"a{i - 1}"].isNull(),
                    deepest(acc),
                )
        if k >= 2:
            complete = (
                (e["i"] == k)
                & acc[f"a{k - 1}"].isNotNull()
                & (e["t"] <= acc[f"a{k - 1}"] + F.lit(window_us))
            )
            if strict_increase:
                complete = complete & (e["t"] > acc[f"l{k - 1}"])
            newd = newd.when(complete, F.lit(k))
        newd = newd.otherwise(F.lit(None).cast("int"))
        is1 = not_done & (e["i"] == 1)
        fields = [
            newd.alias("d"),
            (acc["fe"] | is1).alias("fe"),
            F.when(is1, e["t"]).otherwise(acc["a1"]).alias("a1"),
            F.when(is1, e["t"]).otherwise(acc["l1"]).alias("l1"),
        ]
        for i in range(2, k + 1):
            chain = (
                not_done
                & (e["i"] == i)
                & acc[f"a{i - 1}"].isNotNull()
                & (e["t"] <= acc[f"a{i - 1}"] + F.lit(window_us))
            )
            if strict_increase:
                chain = chain & (e["t"] > acc[f"l{i - 1}"])
            fields.append(
                F.when(chain, acc[f"a{i - 1}"]).otherwise(acc[f"a{i}"]).alias(f"a{i}")
            )
            fields.append(
                F.when(chain, e["t"]).otherwise(acc[f"l{i}"]).alias(f"l{i}")
            )
        return F.struct(*fields)

    def finish(acc: Column) -> Column:
        return F.coalesce(acc["d"], deepest(acc))

    return F.aggregate(ev, init, step, finish)


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
