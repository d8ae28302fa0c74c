"""Remaining dialect/operator coverage: LEFT ARRAY JOIN (explode_outer),
GROUP BY ALL, time-interval RANGE frames, arrays_zip/zip_with, sequences,
sampling."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mcp_clickhouse_spark.inventory.registry import query, t


@query(
    "array_join_left_outer",
    oracle="""
    WITH src AS (
      SELECT n_nationkey,
             CASE WHEN n_nationkey % 5 = 0 THEN [] ELSE [n_nationkey, n_nationkey * 10] END AS xs
      FROM nation
    )
    SELECT n_nationkey,
           unnest(CASE WHEN len(xs) = 0 THEN [CAST(NULL AS INTEGER)] ELSE xs END) AS x
    FROM src
    """,
    category="joins",
)
def array_join_left_outer(spark, sf_dir):
    # ClickHouse LEFT ARRAY JOIN: empty arrays keep their row with NULL —
    # Spark explode_outer. (DuckDB unnest([]) drops rows, so the oracle
    # re-adds them via the CASE-with-NULL trick on empty arrays.)
    n = t(spark, sf_dir, "nation")
    xs = F.when(F.col("n_nationkey") % 5 == 0, F.array().cast("array<int>")).otherwise(
        F.array(F.col("n_nationkey"), F.col("n_nationkey") * 10)
    )
    return n.select("n_nationkey", F.explode_outer(xs).alias("x"))


@query(
    "agg_group_by_all",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM orders GROUP BY ALL
    """,
    category="aggregates",
)
def agg_group_by_all(spark, sf_dir):
    # GROUP BY ALL — supported verbatim by both Spark 3.4+ and DuckDB.
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        FROM orders GROUP BY ALL
        """
    )


@query(
    "win_range_time_interval",
    oracle="""
    SELECT user_id, event_id,
           COUNT(*) OVER (
             PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) AS events_last_hour
    FROM events
    """,
    category="windows",
)
def win_range_time_interval(spark, sf_dir):
    # RANGE BETWEEN INTERVAL 1 HOUR PRECEDING — realized over INTEGER epoch
    # microseconds (Spark's rangeBetween takes numeric offsets; whole-second
    # epochs would truncate and flip events sitting exactly on a frame
    # boundary — caught by the sf0.1 parity run).
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select("user_id", "event_id", F.count("*").over(w).alias("events_last_hour"))


@query(
    "scalar_zip_sequence",
    oracle="""
    SELECT n_nationkey,
           array_to_string(list_transform(generate_series(1, n_nationkey % 4 + 1), x -> x + (x + 10)), ',') AS zipped_sum,
           array_to_string(generate_series(1, n_nationkey % 4 + 1), ',') AS seq
    FROM nation WHERE n_nationkey < 8
    """,
    category="scalars",
)
def scalar_zip_sequence(spark, sf_dir):
    # zip_with + sequence (ClickHouse arrayZip/arrayMap + range). Outputs
    # serialized to CSV — the driver canonicalizer rejects array cells.
    n = t(spark, sf_dir, "nation").where(F.col("n_nationkey") < 8)
    seq_a = F.sequence(F.lit(1), F.col("n_nationkey") % 4 + 1)
    seq_b = F.sequence(F.lit(11), F.col("n_nationkey") % 4 + 11)

    def _csv(arr):
        return F.concat_ws(",", F.transform(arr, lambda x: x.cast("string")))

    return n.select(
        "n_nationkey",
        _csv(F.zip_with(seq_a, seq_b, lambda x, y: x + y)).alias("zipped_sum"),
        _csv(seq_a).alias("seq"),
    )


@query("sample_fraction", category="core")  # rows-only: sampling is engine-specific
def sample_fraction(spark, sf_dir):
    # ClickHouse SAMPLE 0.1 → df.sample (seeded: deterministic within Spark,
    # but sample selection differs across engines by design).
    return t(spark, sf_dir, "orders").sample(fraction=0.1, seed=42).select(
        "o_orderkey", "o_totalprice"
    )


@query(
    "scalar_date_series",
    oracle="""
    SELECT CAST(d AS DATE) AS day, dayname(CAST(d AS DATE)) AS day_name
    FROM (SELECT UNNEST(generate_series(DATE '2024-01-01', DATE '2024-01-14', INTERVAL 1 DAY)) AS d)
    """,
    category="scalars",
)
def scalar_date_series(spark, sf_dir):
    # Distributed date-axis generation: sequence() + explode (the WITH FILL
    # building block; ClickHouse uses numbers() + toDate arithmetic).
    return (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.lit("2024-01-01").cast("date"),
                    F.lit("2024-01-14").cast("date"),
                    F.expr("INTERVAL 1 DAY"),
                )
            ).alias("day")
        )
        .select("day", F.date_format("day", "EEEE").alias("day_name"))
    )


def profile_columns(df, columns=None):
    """Per-column data profile: null count, exact distinct count, min/max
    (stringified for a uniform row shape) — the table-profiling pass run
    before any pipeline touches a new dataset.

    One aggregation job: all per-column aggregates evaluate in a single
    agg (Spark expands multi-DISTINCT into one union-style plan with
    map-side partials), then a stack() unpivots the single row into one
    row per column.  At 100 TB swap countDistinct for
    approx_count_distinct — exact kept here for oracle parity.
    """
    cols = columns or df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    one = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', `{c}__nulls`, `{c}__distinct`, `{c}__min`, `{c}__max`" for c in cols
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack})"
        " AS (column_name, n_nulls, n_distinct, min_value, max_value)"
    )


@query(
    "profile_documents",
    oracle="""
    SELECT 'doc_id' AS column_name,
           CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_distinct,
           CAST(MIN(doc_id) AS VARCHAR) AS min_value,
           CAST(MAX(doc_id) AS VARCHAR) AS max_value
    FROM documents
    UNION ALL
    SELECT 'text', CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT text) AS BIGINT),
           CAST(MIN(text) AS VARCHAR), CAST(MAX(text) AS VARCHAR)
    FROM documents
    UNION ALL
    SELECT 'lang', CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT lang) AS BIGINT),
           CAST(MIN(lang) AS VARCHAR), CAST(MAX(lang) AS VARCHAR)
    FROM documents
    UNION ALL
    SELECT 'source', CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT source) AS BIGINT),
           CAST(MIN(source) AS VARCHAR), CAST(MAX(source) AS VARCHAR)
    FROM documents
    UNION ALL
    SELECT 'n_chars', CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT n_chars) AS BIGINT),
           CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR)
    FROM documents
    """,
    category="inventory",
)
def profile_documents(spark, sf_dir):
    # Table profiling (DESCRIBE-with-stats shape): one agg job, stacked to
    # a row per column; min/max stringified so every column fits one schema.
    return profile_columns(t(spark, sf_dir, "documents"))
