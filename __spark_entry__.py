"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` exposes
one callable per implemented operator from SURVEY.md §2; ``oracle_sql()``
gives the DuckDB-equivalent SQL for each (omitted for non-SQL-expressible
operators → driver records a rows-only check).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from mcp_clickhouse_spark import inventory  # noqa: E402
from mcp_clickhouse_spark.inventory.registry import (  # noqa: E402
    QUERIES,
    QueryFn,
    run_prepared,
)

inventory.load_all()


def _prep(spark: SparkSession) -> None:
    """Normalize runtime confs on a caller-provided session.

    The driver may hand us a session built with defaults; these are all
    runtime-settable and make results deterministic vs the DuckDB oracle.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Pin ANSI mode explicitly (round 15): every translated expression is
    # audited under Spark 4's default ANSI=on (the driver's plain-session
    # shape) and the ANSI-sensitive rewrites emit neutral forms
    # (try_element_at subscripts, CASE-guarded division, two-valued IN) —
    # pinning makes error-vs-NULL behavior identical for callers whose
    # sessions flipped the default (tests/test_r15_wave.py runs the
    # sensitive vector set under BOTH modes).
    spark.conf.set("spark.sql.ansi.enabled", "true")
    # NOTE: adaptive execution is deliberately NOT touched here — results are
    # AQE-independent, and forcing it on silently overrode the harness's
    # data-size-driven AQE policy (bench.py) on every call.


def _wrap(spec) -> QueryFn:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _prep(spark)
        # Prepared-statement behavior: repeated calls replay the memoized
        # analyzed plan (fresh execution every time — see registry.run_prepared).
        return run_prepared(spark, sf_dir, spec)

    run.__name__ = getattr(spec.fn, "__name__", "query")
    run.__doc__ = spec.fn.__doc__
    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    _prep(spark)
    return QUERIES["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(spec) for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}
