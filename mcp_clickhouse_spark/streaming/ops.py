"""Streaming event analytics: the `events` pipelines as readStream graphs.

Each transformation here is the SAME logical plan as its batch twin in
inventory/timeseries.py — Structured Streaming's contract — plus the
streaming-only concerns: watermarks for late data, stateful dedup, and an
applyInPandasWithState custom operator.

Scale notes: state stores shard by the grouping key across executors;
watermarks bound state size (without one, a 100 TB stream accretes state
forever). availableNow triggers give reproducible batch-equivalent runs for
tests and backfills.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

def _events_schema(ts_type) -> StructType:
    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", ts_type),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


def stream_events(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """readStream over the events parquet, ts normalized to TimestampType.

    The file source replays existing files in order — the standard way to
    develop/backfill the same pipeline that later points at Kafka.
    ``max_files_per_trigger`` bounds files admitted per micro-batch (the
    rate-limited backfill knob; see :func:`backfill_events_stream`).

    readStream requires an explicit schema, so the ts physical type is
    sniffed from the parquet footer: µs/ms-precision files read as
    TimestampNTZType (the batch read_table type) and cast to TimestampType,
    so stream≡batch values hold in ANY session timezone, not just UTC;
    ns-precision files (which Spark can only surface as raw longs via the
    nanosAsLong legacy conf) read as LongType and convert.  When no footer
    is readable (empty/late-arriving source dir, remote URI) we fall back to
    the ns/LongType path, which is what the driver-generated testdata uses.
    """
    import glob
    import os

    ts_unit = "ns"
    try:
        import pyarrow.parquet as pq
        import pyarrow.types as patypes

        candidates = sorted(glob.glob(os.path.join(sf_dir, "events*.parquet")))
        if candidates:
            ts_arrow = pq.read_schema(candidates[0]).field("ts").type
            if patypes.is_timestamp(ts_arrow):
                ts_unit = ts_arrow.unit
    except Exception:  # noqa: BLE001 — unreadable footer → ns fallback
        pass

    def _with_rate(reader):
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
        return reader

    if ts_unit != "ns":
        from pyspark.sql.types import TimestampNTZType

        # NTZ carries the same wall-clock as batch read_table; the cast to
        # TimestampType (needed for watermark semantics) then goes through
        # the session tz symmetrically on both paths.
        return (
            _with_rate(
                spark.readStream.schema(_events_schema(TimestampNTZType())).option(
                    "pathGlobFilter", "events*.parquet"
                )
            )
            .parquet(sf_dir)
            .withColumn("ts", F.col("ts").cast(TimestampType()))
        )
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = _with_rate(
        spark.readStream.schema(_events_schema(LongType())).option(
            "pathGlobFilter", "events*.parquet"
        )
    ).parquet(sf_dir)
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def tumbling_counts(events: DataFrame, width: str = "1 hour", watermark: str = "2 hours"):
    """Tumbling window counts with late-data tolerance = `watermark`."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n_events", "total_value")
    )


def sliding_counts(events: DataFrame, width: str = "1 hour", slide: str = "30 minutes",
                   watermark: str = "2 hours"):
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("w_start"), "n_events")
    )


def session_counts(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"):
    """Session windows per user — state closes `gap` after the last event."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_dedup(events: DataFrame, keys: list[str] | None = None,
                    watermark: str = "2 hours") -> DataFrame:
    """Exactly-once-per-key stream: dropDuplicates with watermark-bounded
    state (the streaming twin of exact dedup)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def streaming_incremental_dedup(
    stream: DataFrame,
    corpus_keys: DataFrame,
    key_col: str = "dedup_key",
    ts_col: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin of ``pipeline.dedup.incremental_dedup``: rows arriving
    on the stream are deduped within the stream (first arrival wins) and
    against a STATIC corpus key set via a stream-static LEFT ANTI join —
    the continuous-ingest shape where yesterday's corpus keys are a fixed
    side input and only genuinely new content flows through.

    With ``ts_col`` the within-stream state is watermark-bounded
    (``dropDuplicatesWithinWatermark``); without one it falls back to plain
    ``dropDuplicates`` — unbounded state, only appropriate for bounded
    backfill replays.  The anti-join itself is stateless per micro-batch.
    """
    if ts_col is not None:
        within = stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            [key_col]
        )
    else:
        within = stream.dropDuplicates([key_col])
    return within.join(corpus_keys.select(key_col), key_col, "left_anti")


_RUNNING_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)


def user_running_totals(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user running
    (count, sum(value), last ts) — the canonical shape for bespoke state
    machines that window()/session_window() can't express."""

    def update(
        key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total, last = state.get if state.exists else (0, 0.0, None)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            mx = pdf["ts"].max()
            last = mx if last is None or mx > last else last
        state.update((n, total, last))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total], "last_ts": [last]}
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=_RUNNING_SCHEMA,
            stateStructType="n LONG, total DOUBLE, last TIMESTAMP",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_SESSIONIZE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)


def sessionize_with_timeout(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Custom sessionization via applyInPandasWithState + EventTimeTimeout.

    The built-in ``session_window`` covers gap-close aggregation;
    this operator is the template for session logic it CANNOT express
    (e.g. emitting extra fields from the fold, conditional session rules):
    per user, events fold into an open (start, end, count) state; a session
    closed WITHIN a batch emits immediately, and the trailing open session
    emits when the event-time timeout fires — i.e. when the watermark passes
    last_event + gap, so state is bounded exactly like the built-in.

    Scale: state shards by user across executors; timeouts fire on
    watermark advancement, so a quiet user's state cannot outlive
    gap + watermark delay.
    """
    gap_us = int(pd.Timedelta(gap).total_seconds() * 1_000_000)

    def fold(
        key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        def emit(start_us: int, end_us: int, n: int) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "n_events": [n],
                }
            )

        if state.hasTimedOut:
            start_us, end_us, n = state.get
            state.remove()
            yield emit(start_us, end_us, n)
            return
        ts_us = sorted(
            int(t)
            for pdf in pdfs
            for t in pd.to_datetime(pdf["ts"]).astype("int64") // 1000
        )
        if not ts_us:
            return
        cur = state.get if state.exists else None
        for t in ts_us:
            if cur is None:
                cur = (t, t, 0)
            elif t - cur[1] > gap_us:
                yield emit(cur[0], cur[1], cur[2])
                cur = (t, t, 0)
            cur = (cur[0], t, cur[2] + 1)
        state.update(cur)
        # fire when the watermark passes the open session's close point
        state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fold,
            outputStructType=_SESSIONIZE_SCHEMA,
            stateStructType="start LONG, end LONG, n LONG",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: pair each left event with right events for
    the same user that happen AFTER it but within `within`. Both sides carry
    watermarks so the join state is bounded (the unbounded-state trap is the
    #1 way stream-stream joins die at scale)."""
    l_ = left.withWatermark("ts", watermark).select(
        F.col("user_id"),
        F.col("ts").alias("l_ts"),
        F.col("event_id").alias("l_event_id"),
    )
    r_ = right.withWatermark("ts", watermark).select(
        F.col("user_id").alias("r_user_id"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
    )
    return l_.join(
        r_,
        (F.col("user_id") == F.col("r_user_id"))
        & (F.col("r_ts") > F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within}")),
        "inner",
    ).select("user_id", "l_event_id", "l_ts", "r_event_id", "r_ts")


def kafka_stream(
    spark: SparkSession, bootstrap_servers: str, topic: str, starting_offsets: str = "latest"
) -> DataFrame:
    """Kafka source surface (gated): same downstream pipeline as the file
    source — swap `stream_events` for this in production. Raises a clear
    error when the kafka connector jar isn't on the classpath (it isn't in
    this container)."""
    try:
        return (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
            .load()
        )
    except Exception as e:  # noqa: BLE001
        raise RuntimeError(
            "kafka source unavailable (needs spark-sql-kafka on the classpath): "
            f"{e}"
        ) from e


def run_foreach_batch_to_parquet(stream_df: DataFrame, out_dir: str):
    """foreachBatch sink: per-microbatch custom write (the escape hatch for
    sinks with no native streaming writer — JDBC upserts, multi-table
    writes). Here each batch lands as parquet partitioned by batch id."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("_batch_id", F.lit(batch_id)).write.mode("append").parquet(
            out_dir
        )

    q = stream_df.writeStream.foreachBatch(write_batch).trigger(availableNow=True).start()
    q.awaitTermination()
    return q


def backfill_events_stream(
    spark: SparkSession, backfill_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Rate-limited historical replay: the same events stream, but the file
    source admits at most ``max_files_per_trigger`` files per micro-batch.

    This is the standard backfill pattern: point the streaming pipeline at a
    directory of historical files and let availableNow + maxFilesPerTrigger
    drain it INCREMENTALLY — bounded state growth and shuffle size per
    micro-batch instead of one giant batch, same final answer.  At 100 TB
    the trigger bound is what keeps a year-long replay from materializing a
    year of input in one go."""
    return stream_events(spark, backfill_dir, max_files_per_trigger=max_files_per_trigger)


def run_available_now(stream_df: DataFrame, sink_table: str, output_mode: str = "complete"):
    """Drain everything currently available into an in-memory sink and stop —
    reproducible test/backfill runs of the streaming graph."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


_DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

_NEARDUP_SCHEMA = StructType(
    [
        StructField("band", LongType()),
        StructField("bucket", LongType()),
        StructField("id_a", LongType()),
        StructField("id_b", LongType()),
        StructField("est_jaccard", DoubleType()),
    ]
)


def stream_documents(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """readStream over a documents parquet directory (the continuous-crawl
    ingest shape; file source for backfill/tests, Kafka in production).

    A single-FILE path (e.g. ``<sf_dir>/documents.parquet``) streams via
    its parent directory + a pathGlobFilter — the file source only accepts
    directories."""
    import os

    reader = spark.readStream.schema(_DOCS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    if os.path.isfile(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    return reader.parquet(path)


def streaming_minhash_neardup(
    docs: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket_size: int = 16,
) -> DataFrame:
    """Streaming MinHash-LSH near-dup detection: as documents arrive, emit
    candidate pairs against everything previously seen in the same LSH
    bucket — the continuous twin of the batch
    ``minhash_signatures → minhash_lsh_candidates`` pipeline, producing the
    SAME pairs on a bounded replay (pinned by test).

    Stages:
    1. Per-row OPH signature (``dedup.with_minhash_signature``) — stateless,
       identical values to the batch aggregation.
    2. Banding: per band, xxhash64 of the band's signature rows → (band,
       bucket) keys, exploded per doc.  Same expression as the batch LSH.
    3. State store keyed by (band, bucket) via applyInPandasWithState:
       each bucket remembers the (id, signature) of up to
       ``max_bucket_size`` docs with the LOWEST ids (the batch cap
       policy); a newly retained doc emits one pair per retained
       co-occupant with the signature-agreement Jaccard estimate.

    Scale/state notes: state shards by (band, bucket) across executors and
    is bounded at max_bucket_size entries per bucket — the same degenerate-
    corpus cap as the batch pipeline, so a boilerplate mega-bucket cannot
    accrete unbounded state.  Bucket state has no natural event-time bound
    (a dup may arrive years later); production would add a TTL
    (ProcessingTimeTimeout) to trade recall for state size — kept
    timeout-free here so bounded replays match batch exactly.  The one
    semantic difference from batch: an under-min-id doc arriving AFTER the
    bucket emitted pairs cannot retro-emit pairs for evicted members;
    batch (which sees all docs at once) can.  Pairs may repeat across
    bands (and across retries); consumers dedup on (id_a, id_b) —
    same ``.distinct()`` contract as the batch candidate generator.
    """
    from mcp_clickhouse_spark.pipeline.dedup import with_minhash_signature

    from mcp_clickhouse_spark.pipeline.dedup import band_bucket_posexplode

    sig = with_minhash_signature(docs, num_hashes=num_hashes).selectExpr(
        "doc_id",
        "signature",
        band_bucket_posexplode(bands, num_hashes // bands),
    ).select(
        F.col("band").cast("long"),
        "bucket",
        "doc_id",
        F.concat_ws(",", F.expr("transform(signature, x -> CAST(x AS STRING))")).alias(
            "sig_csv"
        ),
    )

    def emit(
        key: Tuple[int, int], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        band, bucket = key
        ids: list[int]
        sigs: list[str]
        if state.exists:
            stored_ids, stored_sigs = state.get
            ids, sigs = list(stored_ids), list(stored_sigs)
        else:
            ids, sigs = [], []
        rows = sorted(
            (int(i), s)
            for pdf in pdfs
            for i, s in zip(pdf["doc_id"], pdf["sig_csv"])
        )
        out_a, out_b, out_j = [], [], []
        for i, s in rows:
            if i in ids:
                continue  # replay/duplicate delivery of a known doc
            if len(ids) >= max_bucket_size:
                if i > max(ids):
                    continue  # bucket full of lower ids: batch cap drops it
                # evict BEFORE pairing: the batch cap pairs only among the
                # retained (lowest-id) members, never with the evictee
                drop = ids.index(max(ids))
                ids.pop(drop)
                sigs.pop(drop)
            vec = s.split(",")
            for j, sj in zip(ids, sigs):
                agree = sum(a == b for a, b in zip(vec, sj.split(",")))
                lo, hi = (j, i) if j < i else (i, j)
                out_a.append(lo)
                out_b.append(hi)
                out_j.append(agree / float(num_hashes))
            ids.append(i)
            sigs.append(s)
        state.update((ids, sigs))
        if out_a:
            yield pd.DataFrame(
                {
                    "band": band,
                    "bucket": bucket,
                    "id_a": out_a,
                    "id_b": out_b,
                    "est_jaccard": out_j,
                }
            )

    return sig.groupBy("band", "bucket").applyInPandasWithState(
        emit,
        outputStructType=_NEARDUP_SCHEMA,
        stateStructType="ids ARRAY<BIGINT>, sigs ARRAY<STRING>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def span_filter_apply(
    docs: DataFrame,
    boilerplate_keys: DataFrame,
    chunk_tokens: int = 20,
) -> DataFrame:
    """APPLY side of ``pipeline.dedup.span_dedup``: cut documents' spans
    whose md5 appears in ``boilerplate_keys`` (one column ``chunk_key`` —
    e.g. span_dedup's frequency stage filtered to nd > 1), reassemble the
    remainder in order.  Pure batch transformation, shared by the batch
    path and the per-micro-batch streaming runner below.

    Returns the same ``(doc_id, kept_chunks, dropped_chunks, cleaned_text)``
    shape as the batch operator (equality pinned by test).
    """
    from mcp_clickhouse_spark.pipeline.dedup import doc_spans, regroup_spans

    spans = doc_spans(docs, chunk_tokens=chunk_tokens)
    flagged = spans.join(
        # distinct: a key table with repeated chunk_key rows (e.g. a union
        # of per-snapshot key sets) would otherwise multiply flagged rows
        # and corrupt the dropped_chunks count
        boilerplate_keys.select("chunk_key").distinct().withColumn("_bad", F.lit(True)),
        "chunk_key",
        "left",
    ).withColumn("_keep", F.col("_bad").isNull())
    return regroup_spans(flagged)


def run_streaming_span_filter(
    stream_docs: DataFrame,
    boilerplate_keys: DataFrame,
    out_dir: str,
    chunk_tokens: int = 20,
):
    """Streaming boilerplate-span removal via foreachBatch.

    A document arrives WHOLE inside one micro-batch, so the per-doc
    explode → static-join → regroup is plain batch code applied per
    trigger — no streaming-aggregation state, no watermark requirement,
    and any trigger/rate policy composes.  (A groupBy on the unbounded
    doc_id stream would instead hold every doc in the state store
    forever — the wrong shape when rows never span batches.)  The
    boilerplate key table is the small persisted artifact of the batch
    span_dedup frequency stage, exactly like incremental dedup's corpus
    key set.  Runs availableNow and blocks until the replay completes.
    """

    def _apply(batch_df: DataFrame, _batch_id: int) -> None:
        span_filter_apply(batch_df, boilerplate_keys, chunk_tokens).write.mode(
            "append"
        ).parquet(out_dir)

    q = (
        stream_docs.writeStream.foreachBatch(_apply)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


_EMBED_NEARDUP_SCHEMA = StructType(
    [
        StructField("band", LongType()),
        StructField("bucket", LongType()),
        StructField("id_a", LongType()),
        StructField("id_b", LongType()),
        StructField("cosine", DoubleType()),
    ]
)


def stream_embeddings(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """readStream over an embeddings parquet path (schema peeked from the
    files — the file source needs it statically; single files stream via
    parent dir + pathGlobFilter like stream_documents)."""
    import os

    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    if os.path.isfile(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    return reader.parquet(path)


def streaming_embedding_neardup(
    vecs: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = 2,
    planes_per_band: int = 6,
    dim: int = 64,
    max_bucket_size: int = 16,
) -> DataFrame:
    """Streaming embedding-cosine near-dup detection — the continuous twin
    of ``pipeline.similarity.embedding_neardup_pairs`` (round 13; the
    replay-pin item carried from r11 #8).  As vectors arrive, each is
    random-hyperplane-banded with the SAME seeded plane expressions as the
    batch op (``similarity.band_plane_exprs``), and a state store keyed by
    (band, bucket) emits exact-cosine pairs against the bucket's retained
    co-occupants, keeping ``cosine >= threshold``.

    Cap/evict policy mirrors the batch ``bucket_pairs`` exactly (retain
    the ``max_bucket_size`` LOWEST ids), so an ID-ORDERED bounded replay
    yields the same pair set as the batch run with
    ``collapse_identical=False`` (pinned by test; the stream cannot know
    the global min-id representative, same caveat as
    streaming_minhash_neardup).  With OUT-OF-ORDER arrival the stream
    emits a SUPERSET of the batch pairs: a late lower id can evict a
    higher id whose already-emitted pairs cannot be retracted in append
    mode.  State is
    bounded per bucket; production adds a TTL to trade recall for state —
    kept timeout-free here so replays match batch."""
    from mcp_clickhouse_spark.pipeline.similarity import band_plane_exprs

    plane_cols, bucket_exprs = band_plane_exprs(
        vec_col, bands, planes_per_band, dim
    )
    banded = (
        vecs.select(
            F.col(id_col).alias("vec_id"),
            F.concat_ws(
                ",", F.expr(f"transform({vec_col}, x -> CAST(x AS STRING))")
            ).alias("vec_csv"),
            *plane_cols,
        )
        .select(
            "vec_id",
            "vec_csv",
            F.posexplode(F.array(*[F.expr(e) for e in bucket_exprs])).alias(
                "band", "bucket"
            ),
        )
        .select(F.col("band").cast("long"), F.col("bucket").cast("long"),
                "vec_id", "vec_csv")
    )

    def emit(
        key: Tuple[int, int], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        band, bucket = key
        if state.exists:
            stored_ids, stored_vecs = state.get
            ids, vcsvs = list(stored_ids), list(stored_vecs)
        else:
            ids, vcsvs = [], []
        rows = sorted(
            (int(i), v)
            for pdf in pdfs
            for i, v in zip(pdf["vec_id"], pdf["vec_csv"])
        )
        out_a, out_b, out_c = [], [], []
        for i, v in rows:
            if i in ids:
                continue  # replay/duplicate delivery
            if len(ids) >= max_bucket_size:
                if i > max(ids):
                    continue  # bucket full of lower ids: batch cap drops it
                drop = ids.index(max(ids))
                ids.pop(drop)
                vcsvs.pop(drop)
            vec = [float(x) for x in v.split(",")]
            ni = sum(x * x for x in vec) ** 0.5
            for j, vj_csv in zip(ids, vcsvs):
                vj = [float(x) for x in vj_csv.split(",")]
                nj = sum(x * x for x in vj) ** 0.5
                if ni == 0.0 or nj == 0.0:
                    continue
                cos = round(
                    sum(a * b for a, b in zip(vec, vj)) / (ni * nj), 6
                )
                if cos >= threshold:
                    lo, hi = (j, i) if j < i else (i, j)
                    out_a.append(lo)
                    out_b.append(hi)
                    out_c.append(cos)
            ids.append(i)
            vcsvs.append(v)
        state.update((ids, vcsvs))
        if out_a:
            yield pd.DataFrame(
                {
                    "band": band,
                    "bucket": bucket,
                    "id_a": out_a,
                    "id_b": out_b,
                    "cosine": out_c,
                }
            )

    return banded.groupBy("band", "bucket").applyInPandasWithState(
        emit,
        outputStructType=_EMBED_NEARDUP_SCHEMA,
        stateStructType="ids ARRAY<BIGINT>, vecs ARRAY<STRING>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_corpus_stats(docs: DataFrame) -> DataFrame:
    """Running per-(source, lang) corpus statistics over a document ingest
    stream: doc count, total chars, total whitespace tokens — the live
    dashboard every continuous-crawl pipeline keeps.

    A plain streaming aggregation in update/complete mode: state is one row
    per (source, lang) — bounded by source×lang CARDINALITY, not stream
    length, so no watermark is needed (there is no per-doc state).  The
    aggregate itself is the exact batch expression, so an availableNow
    replay equals the batch groupBy (pinned by test).
    """
    return docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.size(F.split(F.col("text"), "\\s+"))).alias("total_tokens"),
    )
