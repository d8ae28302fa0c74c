"""SparkSession factory and testdata registration.

The reference keeps ONE global embedded-engine session for its whole process
lifetime (mcp_clickhouse/mcp_server.py:578-605: ``_chdb_client`` created once,
closed atexit). A local-mode SparkSession is the exact analog; this module
owns it.

Scale notes (100 TB design): every knob here is chosen so the same code runs
unchanged on a real cluster — AQE handles skew/coalescing at runtime, shuffle
partitions default to the parallelism of the cluster rather than a magic
constant, and timestamps are normalized at scan time (distributed, no driver
materialization).
"""

from __future__ import annotations

import os
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The driver-generated testdata tables (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = "mcp-clickhouse-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the long-lived session — the chDB-session analog.

    Config stance:
      - AQE on: runtime coalescing of shuffle partitions, skew-join splitting
        and broadcast-join conversion replace hand-tuned plans at scale.
      - Arrow on: every Pandas-UDF boundary is Arrow-batched.
      - UTC session timezone: deterministic timestamp semantics vs the
        DuckDB oracle (naive timestamps on both sides).
      - ``nanosAsLong``: the driver's events table carries parquet
        TIMESTAMP(NANOS) which Spark's vectorized reader rejects; we read the
        raw int64 and normalize to µs in :func:`read_table` — distributed,
        no driver round-trip.
    """
    cpus = default_parallelism()
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 4)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Explicit ANSI pin (round 15): the dialect's error-vs-NULL
        # contract is audited under Spark 4's default ANSI=on; pinning
        # keeps it deterministic if a deployment flips the default.
        # ANSI-sensitive spots emit neutral forms (try_element_at,
        # CASE-guarded division, two-valued IN) — see
        # tests/test_r15_wave.py::TestAnsiNeutrality.
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Python Data Source filter pushdown (sqlite source): off by default
        # in Spark 4.1, required for DataSourceReader.pushFilters to run.
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # Generated-class cache (static conf, default 100 entries): a serving
        # session that alternates over ~14+ distinct query shapes generates
        # far more than 100 whole-stage-codegen fragments, so the default
        # cache thrashes and EVERY execution pays janino+JIT recompilation
        # (~0.3-0.7 s per query). Measured at sf0.1, interleaved min-of-3:
        # headline total 5.5-6.6 s → 2.8 s with the cache sized to hold the
        # whole working set. On a long-lived cluster serving many tenants the
        # same reasoning holds — codegen sources are small (KBs), so 5000
        # entries is megabytes of driver memory for a 2× latency win.
        .config("spark.sql.codegen.cache.maxEntries", "5000")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


# Lazy-DataFrame memo: re-calling spark.read.parquet re-lists files and
# re-reads footers on the driver (~100 ms per call) — wasted when the same
# table is referenced by every query in a session. Keyed per session so a
# restarted session never sees stale plans.
_TABLE_CACHE: dict[tuple[int, str, str], DataFrame] = {}

# --- storage-layout ingest: split single-row-group tables -------------------
# The driver testdata ships as ONE parquet file with ONE row group per table,
# which caps every scan stage at one task no matter how many cores the
# session has (row group = minimum split unit).  A warehouse owns its storage
# layout, so on first access we rewrite such tables once into an N-file copy
# under a content-keyed cache dir and read that from then on.  Interleaved
# A/B at sf0.1 (scripts/mrg_probe.py): headline total 6.90 s → 4.53 s.
# At 100 TB this code self-disables: real tables arrive as many files /
# many row groups and take the `return path` below.
_WAREHOUSE_ROOT = os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark_graft_warehouse")
# Round-17 optimization (guide §6.1/§2.2): each rewritten file is one row
# group = one scan task, so the file count IS the scan parallelism.  The
# r16 defaults (75k rows/file, cap 8) left orders at 2 tasks and events at
# 4 on a 32-core box — job-profile showed scan stages as the bottleneck of
# the map-heavy queries (pipe_text_stats: 1.0 s of task time on 4 tasks).
# Env-overridable so a deployment can retune without code changes; the
# 100 TB case is unaffected (multi-row-group inputs skip the rewrite).
# Defaults re-measured r17 (interleaved A/B, min-of-3×3): 18,750 rows/file
# brings orders (150k rows) from 2 scan tasks to 8 and events (300k) from 4
# to 8 — every orders/events-scanning headline query improved (events
# windows −0.02 s, scan_projection/agg_count_distinct −0.01 s each, total
# −0.17 s) with no regression.
#
# Round-18 (VERDICT items 2/8 — make scan parallelism follow the session's
# cores when the data warrants it): the flat cap of 8 left sf1's 6M-row
# lineitem at 8 scan tasks on 32 cores.  The cap is now core-aware for BIG
# tables only: rows >= _SPLIT_BIG_ROWS get max(8, cpus // 2) files, smaller
# tables keep 8.  Measured at sf1/32 cores (interleaved ab_bench,
# min-of-3): cap 8 → 7.250 s, cap 16 → 6.558 s, cap 32 → 7.005 s — 16
# (= 32 cores // 2) is the sweet spot; at 8 cores the formula yields 8,
# byte-identical to the r17 layout.  The 1M-row gate keeps the WHOLE
# sf0.1 layout unchanged (in-tree env A/B: a 500k gate let lineitem cross
# and cost ~+0.01 s each on q1/join_star; a flat 16 cap also cost +0.013 s
# on join_asof) — sf0.1 stays parallelism-capped by design, which bench.py
# now documents in its output; the scaling signal lives at sf1 and above.
# SPARK_GRAFT_SPLIT_MAX_FILES remains the hard ceiling.
_SPLIT_ROWS = int(os.environ.get("SPARK_GRAFT_SPLIT_ROWS", 18_750))
_SPLIT_MAX_FILES = int(os.environ.get("SPARK_GRAFT_SPLIT_MAX_FILES", 32))
_SPLIT_BIG_ROWS = int(os.environ.get("SPARK_GRAFT_SPLIT_BIG_ROWS", 1_000_000))


def _split_file_cap(rows: int) -> int:
    cap = 8 if rows < _SPLIT_BIG_ROWS else max(8, default_parallelism() // 2)
    return min(cap, _SPLIT_MAX_FILES)
# CPU-heavy per-row consumers (shingling, vector math) want scan parallelism
# even at small row counts
_SPLIT_CPU_TABLES = {
    "documents": int(os.environ.get("SPARK_GRAFT_SPLIT_DOCS", 4)),
    "embeddings": int(os.environ.get("SPARK_GRAFT_SPLIT_EMB", 4)),
}
_SPLIT_CPU_MIN_ROWS = 2_000


def _split_layout(spark: SparkSession, path: str, name: str) -> str:
    """Return the path read_table should scan: the original file, or a
    multi-file rewritten copy when the original is a single row group big
    enough that one scan task would bottleneck."""
    try:
        import pyarrow.parquet as pq

        meta = pq.ParquetFile(path).metadata
    except Exception:
        return path
    if meta.num_row_groups != 1:
        return path
    rows = meta.num_rows
    n = min((rows + _SPLIT_ROWS - 1) // _SPLIT_ROWS, _split_file_cap(rows))
    if name in _SPLIT_CPU_TABLES and rows >= _SPLIT_CPU_MIN_ROWS:
        n = max(n, _SPLIT_CPU_TABLES[name])
    if n < 2:
        return path
    st = os.stat(path)
    digest = f"{name}-{st.st_size}-{int(st.st_mtime)}-{n}"
    dst = os.path.join(_WAREHOUSE_ROOT, digest)
    if os.path.isdir(dst):
        return dst
    try:
        os.makedirs(_WAREHOUSE_ROOT, exist_ok=True)
        tmp = f"{dst}.tmp-{os.getpid()}"
        spark.read.parquet(path).repartition(int(n)).write.mode("overwrite").parquet(tmp)
        try:
            os.rename(tmp, dst)  # atomic: concurrent processes race safely
        except OSError:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)  # lost the race — reuse winner's
        return dst if os.path.isdir(dst) else path
    except Exception:
        return path  # read-only tmp, disk full, … — the original always works


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame, normalizing types.

    ``events.ts`` arrives as raw nanoseconds (via ``nanosAsLong``); we
    truncate to microseconds exactly like ``CAST(ts AS TIMESTAMP)`` does in
    DuckDB (floor division), entirely inside whole-stage codegen.
    """
    key = (id(spark), sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    if name == "events":
        # Runtime-settable; needed even when the caller built its own session.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(
        _split_layout(spark, os.path.join(sf_dir, f"{name}.parquet"), name)
    )
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ns → µs floor-truncation as TIMESTAMP_NTZ: timezone-independent and
        # identical to DuckDB's CAST(ts AS TIMESTAMP).
        df = df.withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts div 1000,"  # integer div: ns epoch > 2^53 breaks double math
                " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ),
        )
    _TABLE_CACHE[key] = df
    return df


def register_testdata(
    spark: SparkSession, sf_dir: str, tables: Iterable[str] = TESTDATA_TABLES
) -> None:
    """Register the testdata parquet files as temp views (the 'catalog')."""
    for name in tables:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)
