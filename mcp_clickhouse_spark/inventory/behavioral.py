"""Behavioral-analytics inventory: retention / windowFunnel / sequenceMatch
(ClickHouse's signature event-analytics aggregates) on the events table."""

from __future__ import annotations

from pyspark.sql import functions as F

from mcp_clickhouse_spark.inventory.registry import query, t
from mcp_clickhouse_spark.operators.funnel import retention, sequence_match, window_funnel


@query(
    "behav_retention",
    oracle="""
    SELECT user_id,
           BOOL_OR(event_type = 'signup') AS r1,
           BOOL_OR(event_type = 'signup') AND BOOL_OR(event_type = 'click') AS r2,
           BOOL_OR(event_type = 'signup') AND BOOL_OR(event_type = 'purchase') AS r3
    FROM events GROUP BY user_id
    """,
    category="behavioral",
)
def behav_retention(spark, sf_dir):
    # ClickHouse retention(cond1, cond2, cond3).
    e = t(spark, sf_dir, "events")
    return retention(
        e,
        "user_id",
        [
            F.col("event_type") == "signup",
            F.col("event_type") == "click",
            F.col("event_type") == "purchase",
        ],
    )


# ClickHouse windowFunnel default mode as a DuckDB RECURSIVE CTE: one
# (t, idx) entry per matched condition, time-ordered; the fold keeps a
# per-level anchor array where cond-1 re-anchors level 1 on every
# occurrence and level i chains when t <= anchor[i-1] + window (equal
# timestamps chain).  Recursive lockstep-per-user, NOT list_reduce:
# DuckDB 1.0's list_reduce returns wrong values under grouped vectorized
# execution (verified: struct fields bleed across groups).
_ORACLE_FUNNEL_FOLD = """
    base AS (
      SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t, event_type FROM events
    ),
    entries AS (
      SELECT user_id, t, 1 AS i FROM base WHERE event_type = 'signup'
      UNION ALL SELECT user_id, t, 2 FROM base WHERE event_type = 'click'
      UNION ALL SELECT user_id, t, 3 FROM base WHERE event_type = 'purchase'
    ),
    ordered AS (
      SELECT user_id, t, i,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY t, i) AS rn
      FROM entries
    ),
    counts AS (SELECT user_id, MAX(rn) AS n FROM ordered GROUP BY user_id),
    fold AS (
      SELECT user_id, 0::BIGINT AS rn, CAST(NULL AS BIGINT) AS a1,
             CAST(NULL AS BIGINT) AS a2, CAST(NULL AS BIGINT) AS a3
      FROM counts
      UNION ALL
      SELECT f.user_id, f.rn + 1,
        CASE WHEN o.i = 1 THEN o.t ELSE f.a1 END,
        CASE WHEN o.i = 2 AND o.t <= f.a1 + 86400000000 THEN f.a1 ELSE f.a2 END,
        CASE WHEN o.i = 3 AND o.t <= f.a2 + 86400000000 THEN f.a2 ELSE f.a3 END
      FROM fold f JOIN ordered o ON o.user_id = f.user_id AND o.rn = f.rn + 1
    ),
    lvl AS (
      SELECT u.user_id,
             coalesce(CASE WHEN f.a3 IS NOT NULL THEN 3
                           WHEN f.a2 IS NOT NULL THEN 2
                           WHEN f.a1 IS NOT NULL THEN 1
                           ELSE 0 END, 0) AS funnel_level
      FROM (SELECT DISTINCT user_id FROM base) u
      LEFT JOIN (
        SELECT f.user_id, f.a1, f.a2, f.a3
        FROM fold f JOIN counts c ON f.user_id = c.user_id AND f.rn = c.n
      ) f ON u.user_id = f.user_id
    )
"""


@query(
    "behav_window_funnel",
    oracle="WITH RECURSIVE " + _ORACLE_FUNNEL_FOLD + """
    SELECT user_id, funnel_level FROM lvl
    """,
    category="behavioral",
)
def behav_window_funnel(spark, sf_dir):
    # ClickHouse windowFunnel(86400)(ts, signup, click, purchase): deepest
    # signup→click→purchase chain within 24h of the chain's first event,
    # CH default-mode semantics (re-anchoring on each new signup, equal
    # timestamps chain).  Oracle: the same per-level-anchor fold in DuckDB
    # as a recursive CTE over time-sorted (t, idx) entries.
    e = t(spark, sf_dir, "events")
    return window_funnel(
        e,
        "user_id",
        "ts",
        [
            F.col("event_type") == "signup",
            F.col("event_type") == "click",
            F.col("event_type") == "purchase",
        ],
        window_seconds=86400,
    )


@query(
    "behav_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', MIN(CAST(ts AS TIMESTAMP))) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', CAST(ts AS TIMESTAMP)) AS act_week
      FROM events
    )
    SELECT CAST(f.cohort_week AS TIMESTAMP) AS cohort_week,
           CAST(datediff('day', f.cohort_week, a.act_week) // 7 AS BIGINT) AS week_offset,
           COUNT(DISTINCT a.user_id) AS n_users
    FROM firsts f JOIN activity a USING (user_id)
    GROUP BY 1, 2
    """,
    category="behavioral",
)
def behav_cohort_retention(spark, sf_dir):
    # Weekly cohort-retention matrix: users bucketed by first-seen week,
    # counted in each subsequent active week. Two aggregations + one join on
    # user_id — the join reuses the aggregation's hash partitioning.
    e = t(spark, sf_dir, "events")
    week = lambda c: F.date_trunc("week", F.col(c).cast("timestamp")).cast("timestamp_ntz")  # noqa: E731
    firsts = e.groupBy("user_id").agg(F.min("ts").alias("first_ts")).select(
        "user_id", week("first_ts").alias("cohort_week")
    )
    activity = e.select("user_id", week("ts").alias("act_week")).distinct()
    return (
        firsts.join(activity, on="user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("act_week"), F.col("cohort_week")) / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@query(
    "behav_sequence_match",
    oracle="""
    WITH seqs AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS s
      FROM events GROUP BY user_id
    )
    SELECT user_id, regexp_matches(s, 's.*p') AS matched FROM seqs
    """,
    category="behavioral",
)
def behav_sequence_match(spark, sf_dir):
    # ClickHouse sequenceMatch('(?1)(?t>..)(?2)')-family: the portable core —
    # regex over the time-ordered event-initial string ('s.*p' = signup
    # eventually followed by purchase).
    e = t(spark, sf_dir, "events")
    return sequence_match(
        e,
        "user_id",
        "ts",
        "event_id",
        F.substring(F.col("event_type"), 1, 1),
        "s.*p",
    )


_SQL_RETENTION_CH = """
SELECT user_id, r[1] AS r1, r[2] AS r2, r[3] AS r3 FROM (
  SELECT user_id,
         retention(event_type = 'signup', event_type = 'click',
                   event_type = 'purchase') AS r
  FROM events GROUP BY user_id
) ret
"""


@query(
    "behav_retention_sql",
    oracle="""
    SELECT user_id,
           CAST(BOOL_OR(event_type = 'signup') AS SMALLINT) AS r1,
           CAST(BOOL_OR(event_type = 'signup')
                AND BOOL_OR(event_type = 'click') AS SMALLINT) AS r2,
           CAST(BOOL_OR(event_type = 'signup')
                AND BOOL_OR(event_type = 'purchase') AS SMALLINT) AS r3
    FROM events GROUP BY user_id
    """,
    category="behavioral",
)
def behav_retention_sql(spark, sf_dir):
    """Verbatim ClickHouse ``retention(...)`` SQL text (round 7 — the
    guided error became a faithful single-expression mapping:
    r1 = ∃row cond1; rI = r1 AND ∃row condI, 0/1 values exactly like
    CH's UInt8 array, subscripted out to scalar columns for the driver
    canonicalizer)."""
    from mcp_clickhouse_spark.dialect import translate

    t(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(translate(_SQL_RETENTION_CH))


_SQL_FUNNEL_CH = """
SELECT user_id,
       windowFunnel(86400)(ts, event_type = 'signup', event_type = 'click',
                           event_type = 'purchase') AS funnel_level,
       sequenceMatch('(?1).*(?3)')(ts, event_type = 'signup',
                                   event_type = 'click',
                                   event_type = 'purchase') AS sm,
       sequenceCount('(?1)(?2)')(ts, event_type = 'signup',
                                 event_type = 'click') AS sc
FROM events GROUP BY user_id
"""


@query(
    "behav_funnel_sql",
    oracle="WITH RECURSIVE " + _ORACLE_FUNNEL_FOLD + """,
    enc AS (
      SELECT user_id,
             string_agg(
               '<' || CASE WHEN event_type = 'signup' THEN '1' ELSE '0' END
                   || CASE WHEN event_type = 'click' THEN '1' ELSE '0' END
                   || CASE WHEN event_type = 'purchase' THEN '1' ELSE '0' END
                   || '>',
               '' ORDER BY t,
               CASE WHEN event_type = 'signup' THEN '1' ELSE '0' END
                 || CASE WHEN event_type = 'click' THEN '1' ELSE '0' END
                 || CASE WHEN event_type = 'purchase' THEN '1' ELSE '0' END
             ) AS s,
             string_agg(
               CASE WHEN event_type IN ('signup', 'click')
                 THEN '<' || CASE WHEN event_type = 'signup' THEN '1' ELSE '0' END
                          || CASE WHEN event_type = 'click' THEN '1' ELSE '0' END
                          || '>' END,
               '' ORDER BY t,
               CASE WHEN event_type = 'signup' THEN '1' ELSE '0' END
                 || CASE WHEN event_type = 'click' THEN '1' ELSE '0' END
             ) AS s2
      FROM base
      WHERE event_type IN ('signup', 'click', 'purchase')
      GROUP BY user_id
    )
    SELECT lvl.user_id,
           lvl.funnel_level,
           CASE WHEN regexp_matches(coalesce(enc.s, ''),
                '<1[01][01]>(?:<[01]{3}>)*<[01][01]1>') THEN 1 ELSE 0 END AS sm,
           CAST(coalesce(len(regexp_extract_all(coalesce(enc.s2, ''),
                '<1[01]><[01]1>')), 0) AS INTEGER) AS sc
    FROM lvl LEFT JOIN enc ON enc.user_id = lvl.user_id
    """,
    category="behavioral",
)
def behav_funnel_sql(spark, sf_dir):
    """Verbatim ``windowFunnel(w)(…)`` / ``sequenceMatch('(?1).*(?3)')(…)``
    / ``sequenceCount`` SQL text: windowFunnel folds time-sorted per-
    condition (t, idx) entries through a per-level anchor array —
    ClickHouse default-mode semantics exactly, including re-anchoring on
    each new cond-1 event (round 9, per the r8 advisor) — mirrored in the
    DuckDB oracle by the shared recursive-CTE fold (_ORACLE_FUNNEL_FOLD;
    NOT list_reduce, which DuckDB 1.0 evaluates wrongly under grouped
    vectorized execution — see the note at the top of this module);
    sequenceMatch encodes each kept event
    as a condition BITMASK token and compiles the CH pattern to a Java
    regex over that string, so one event matching several conditions
    stays faithful.  Oracle: the shared _ORACLE_FUNNEL_FOLD CTE block plus
    the same bitmask encoding via string_agg + RE2 in DuckDB."""
    from mcp_clickhouse_spark.dialect import translate

    t(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(translate(_SQL_FUNNEL_CH))


_SQL_FUNNEL_STRICT_CH = """
SELECT user_id,
       windowFunnel(86400, 'strict_order')(ts, event_type = 'signup',
                    event_type = 'click', event_type = 'purchase')
         AS lvl_order,
       windowFunnel(86400, 'strict_deduplication')(ts,
                    event_type = 'signup', event_type = 'click',
                    event_type = 'purchase') AS lvl_dedup
FROM events GROUP BY user_id
"""

# Both strict folds in ONE recursive scan per user (the dedup fold skips
# the i=0 sentinel rows the order fold needs).  Mid-fold early returns are
# carried as do_/dd columns, exactly like the Spark fold's `d` field.
_ORACLE_FUNNEL_STRICT = """
    base AS (
      SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t, event_type FROM events
    ),
    entries AS (
      SELECT user_id, t, 1 AS i FROM base WHERE event_type = 'signup'
      UNION ALL SELECT user_id, t, 2 FROM base WHERE event_type = 'click'
      UNION ALL SELECT user_id, t, 3 FROM base WHERE event_type = 'purchase'
      UNION ALL SELECT user_id, t, 0 FROM base
        WHERE event_type NOT IN ('signup', 'click', 'purchase')
    ),
    ordered AS (
      SELECT user_id, t, i,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY t, i) AS rn
      FROM entries
    ),
    counts AS (SELECT user_id, MAX(rn) AS n FROM ordered GROUP BY user_id),
    fold AS (
      SELECT user_id, 0::BIGINT AS rn,
             CAST(NULL AS INTEGER) AS do_, FALSE AS fe,
             CAST(NULL AS BIGINT) AS a1, CAST(NULL AS BIGINT) AS a2,
             CAST(NULL AS BIGINT) AS a3,
             CAST(NULL AS INTEGER) AS dd,
             CAST(NULL AS BIGINT) AS b1, CAST(NULL AS BIGINT) AS b2,
             CAST(NULL AS BIGINT) AS b3
      FROM counts
      UNION ALL
      SELECT f.user_id, f.rn + 1,
        CASE WHEN f.do_ IS NOT NULL THEN f.do_
             WHEN o.i = 0 THEN CASE WHEN f.fe THEN
               (CASE WHEN f.a3 IS NOT NULL THEN 3
                     WHEN f.a2 IS NOT NULL THEN 2
                     WHEN f.a1 IS NOT NULL THEN 1 ELSE 0 END) END
             WHEN o.i = 2 AND f.fe AND f.a1 IS NULL THEN
               (CASE WHEN f.a3 IS NOT NULL THEN 3
                     WHEN f.a2 IS NOT NULL THEN 2
                     WHEN f.a1 IS NOT NULL THEN 1 ELSE 0 END)
             WHEN o.i = 3 AND f.fe AND f.a2 IS NULL THEN
               (CASE WHEN f.a3 IS NOT NULL THEN 3
                     WHEN f.a2 IS NOT NULL THEN 2
                     WHEN f.a1 IS NOT NULL THEN 1 ELSE 0 END)
             WHEN o.i = 3 AND f.a2 IS NOT NULL
                  AND o.t <= f.a2 + 86400000000 THEN 3
             END,
        f.fe OR (f.do_ IS NULL AND o.i = 1),
        CASE WHEN f.do_ IS NULL AND o.i = 1 THEN o.t ELSE f.a1 END,
        CASE WHEN f.do_ IS NULL AND o.i = 2 AND f.a1 IS NOT NULL
                  AND o.t <= f.a1 + 86400000000 THEN f.a1 ELSE f.a2 END,
        CASE WHEN f.do_ IS NULL AND o.i = 3 AND f.a2 IS NOT NULL
                  AND o.t <= f.a2 + 86400000000 THEN f.a2 ELSE f.a3 END,
        CASE WHEN f.dd IS NOT NULL THEN f.dd
             WHEN o.i = 0 THEN NULL
             WHEN o.i = 2 AND f.b2 IS NOT NULL THEN 2
             WHEN o.i = 3 AND f.b3 IS NOT NULL THEN 3
             WHEN o.i = 3 AND f.b2 IS NOT NULL
                  AND o.t <= f.b2 + 86400000000 THEN 3
             END,
        CASE WHEN f.dd IS NULL AND o.i = 1 THEN o.t ELSE f.b1 END,
        CASE WHEN f.dd IS NULL AND o.i = 2 AND f.b1 IS NOT NULL
                  AND o.t <= f.b1 + 86400000000 THEN f.b1 ELSE f.b2 END,
        CASE WHEN f.dd IS NULL AND o.i = 3 AND f.b2 IS NOT NULL
                  AND o.t <= f.b2 + 86400000000 THEN f.b2 ELSE f.b3 END
      FROM fold f JOIN ordered o ON o.user_id = f.user_id AND o.rn = f.rn + 1
    ),
    final AS (
      SELECT f.user_id,
             coalesce(f.do_, CASE WHEN f.a3 IS NOT NULL THEN 3
                                  WHEN f.a2 IS NOT NULL THEN 2
                                  WHEN f.a1 IS NOT NULL THEN 1
                                  ELSE 0 END) AS lvl_order,
             coalesce(f.dd, CASE WHEN f.b3 IS NOT NULL THEN 3
                                 WHEN f.b2 IS NOT NULL THEN 2
                                 WHEN f.b1 IS NOT NULL THEN 1
                                 ELSE 0 END) AS lvl_dedup
      FROM fold f JOIN counts c ON f.user_id = c.user_id AND f.rn = c.n
    )
"""


@query(
    "behav_funnel_strict",
    oracle="WITH RECURSIVE " + _ORACLE_FUNNEL_STRICT + """
    SELECT user_id, lvl_order, lvl_dedup FROM final
    """,
    category="behavioral",
)
def behav_funnel_strict(spark, sf_dir):
    """``windowFunnel(w, 'strict_order')`` and ``windowFunnel(w,
    'strict_deduplication')`` as verbatim SQL text (round 10 — previously
    guided errors): ClickHouse getEventLevel's else-if chain with its
    MID-FOLD early returns carried in a done field (strict_order freezes
    at the first non-condition event after the anchor and returns the
    filled-prefix level on out-of-order conditions; strict_deduplication
    returns the duplicate condition's 1-based index, even below an
    already-reached level).  Oracle: ONE recursive-CTE scan per user
    carrying BOTH folds' states (the shared-recursion twin of
    _ORACLE_FUNNEL_FOLD; sentinel i=0 rows feed only the order fold)."""
    from mcp_clickhouse_spark.dialect import translate

    t(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(translate(_SQL_FUNNEL_STRICT_CH))


_SQL_SEQ_NEXT_CH = """
SELECT user_id,
       sequenceNextNode('forward', 'head')(ts, event_type,
           event_type = 'signup', event_type = 'signup',
           event_type = 'click') AS n_head,
       sequenceNextNode('forward', 'first_match')(ts, event_type,
           event_type = 'click', event_type = 'click') AS n_first,
       sequenceNextNode('backward', 'last_match')(ts, event_type,
           event_type = 'purchase', event_type = 'purchase') AS n_last
FROM events GROUP BY user_id
"""


@query(
    "behav_sequence_next_node",
    oracle="""
    WITH ord AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_type) AS rn
      FROM events
    ),
    heads AS (
      SELECT user_id,
             MAX(CASE WHEN rn = 1 THEN event_type END) AS e1,
             MAX(CASE WHEN rn = 2 THEN event_type END) AS e2,
             MAX(CASE WHEN rn = 3 THEN event_type END) AS e3
      FROM ord GROUP BY user_id
    ),
    firsts AS (
      SELECT user_id, MIN(rn) AS frn FROM ord
      WHERE event_type = 'click' GROUP BY user_id
    ),
    lasts AS (
      SELECT user_id, MAX(rn) AS lrn FROM ord
      WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT h.user_id,
           CASE WHEN h.e1 = 'signup' AND h.e2 = 'click' THEN h.e3 END
             AS n_head,
           nf.event_type AS n_first,
           nl.event_type AS n_last
    FROM heads h
    LEFT JOIN firsts f ON f.user_id = h.user_id
    LEFT JOIN ord nf ON nf.user_id = f.user_id AND nf.rn = f.frn + 1
    LEFT JOIN lasts l ON l.user_id = h.user_id
    LEFT JOIN ord nl ON nl.user_id = l.user_id AND nl.rn = l.lrn - 1
    """,
    category="behavioral",
)
def behav_sequence_next_node(spark, sf_dir):
    """``sequenceNextNode(direction, base)(ts, value, base_cond,
    event1, …)`` (round 10 — was a guided pointer): the event-column
    value one step past a consecutive event chain, for the three
    docs-pinned base modes exercised here (head / first_match /
    last_match; backward traverses the reversed timeline).  Equal
    timestamps tie-break by the event value on both engines.  Oracle:
    ROW_NUMBER over the same (t, value) order; head = positions 1-3,
    first_match/last_match = MIN/MAX matching position joined to its
    neighbor."""
    from mcp_clickhouse_spark.dialect import translate

    t(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(translate(_SQL_SEQ_NEXT_CH))
