"""Event-time analytics on the `events` table — batch-first (SURVEY.md §2.3.10:
the reference has NO streaming; `window()`/`session_window()` on a static
frame are the Spark-idiomatic analog, and streaming/ holds the readStream
variants of the same pipelines).

Tumbling / sliding / session windows, pivot, JSON-props analytics, and
latest-event-per-user dedup.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mcp_clickhouse_spark.inventory.registry import query, t


@query(
    "events_tumbling_window",
    oracle="""
    SELECT
      date_trunc('hour', CAST(ts AS TIMESTAMP)) AS w_start,
      event_type,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    category="timeseries",
)
def events_tumbling_window(spark, sf_dir):
    # Tumbling 1h window — same window() construct works unchanged under
    # Structured Streaming with a watermark (streaming/ops.py).
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(F.round(F.col("value") * 100).cast("bigint")) / F.lit(100.0)).alias("total_value"),
        )
        .select(F.col("w.start").alias("w_start"), "event_type", "n_events", "total_value")
    )


@query(
    "events_sliding_window",
    oracle="""
    WITH buckets AS (
      SELECT e.*, date_trunc('hour', CAST(ts AS TIMESTAMP))
                  + to_minutes(30 * (CAST(minute(CAST(ts AS TIMESTAMP)) >= 30 AS INTEGER))) AS half
      FROM events e
    ),
    expanded AS (
      SELECT event_id, value,
             UNNEST([half, half - INTERVAL 30 MINUTE]) AS w_start
      FROM buckets
    )
    SELECT w_start, COUNT(*) AS n_events
    FROM expanded GROUP BY w_start
    """,
    category="timeseries",
)
def events_sliding_window(spark, sf_dir):
    # Sliding window: 1h wide, 30min slide — every event lands in 2 windows.
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("w_start"), "n_events")
    )


@query(
    "events_session_window",
    oracle="""
    WITH ordered AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN CAST(ts AS TIMESTAMP)
                       - LAG(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM ordered
    )
    SELECT user_id, MIN(ts) AS session_start, MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
    category="timeseries",
)
def events_session_window(spark, sf_dir):
    # session_window(gap=30m): Spark's native session windows; the oracle
    # derives the identical sessions with the gaps-and-islands idiom. Spark
    # defines session end = last event + gap, mirrored in the oracle.
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "events_pivot",
    oracle="""
    SELECT user_id,
      COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
      COUNT(*) FILTER (WHERE event_type = 'view')     AS view,
      COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
      COUNT(*) FILTER (WHERE event_type = 'error')    AS error
    FROM events GROUP BY user_id
    """,
    category="timeseries",
)
def events_pivot(spark, sf_dir):
    # Pivot with an EXPLICIT value list: no extra distinct-values job, fixed
    # output schema (required for streaming and for 100 TB: the implicit form
    # scans once just to learn the columns).
    e = t(spark, sf_dir, "events")
    kinds = ["click", "view", "purchase", "signup", "error"]
    out = e.groupBy("user_id").pivot("event_type", kinds).agg(F.count(F.lit(1)))
    for k in kinds:
        out = out.withColumn(k, F.coalesce(F.col(k), F.lit(0)))
    return out


@query(
    "events_props_analytics",
    oracle="""
    SELECT
      CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
      COUNT(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1
    """,
    category="timeseries",
)
def events_props_analytics(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    return (
        e.withColumn(
            "k_bucket", F.get_json_object("props", "$.k").cast("bigint") % 10
        )
        .groupBy("k_bucket")
        .agg(
            F.count("*").alias("n"),
            (F.sum(F.round(F.col("value") * 100).cast("bigint")) / F.lit(100.0)).alias("total_value"),
        )
    )


@query(
    "events_latest_per_user",
    oracle="""
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    category="timeseries",
)
def events_latest_per_user(spark, sf_dir):
    # The classic "current state from an event log" query (CH argMax idiom).
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type")
    )
