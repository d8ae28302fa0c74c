#!/usr/bin/env python
"""r18 probe: driver actions (Spark jobs) per connected_components run.

Counts jobs via the DAGScheduler's job-id counter around the call, and
times the call; result identity checked against a reference label set.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/cc_probe.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    from mcp_clickhouse_spark.pipeline.clustering import dedup_clusters
    from mcp_clickhouse_spark.pipeline.dedup import (
        minhash_lsh_candidates,
        minhash_signatures,
    )
    from mcp_clickhouse_spark.session import get_spark, read_table

    spark = get_spark(app_name="cc-probe", shuffle_partitions=8)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    sc = spark.sparkContext

    d = read_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_candidates(minhash_signatures(d, num_hashes=32))
    # materialize the pair list once so the CC probe measures CC only
    pairs = spark.createDataFrame(pairs.collect(), pairs.schema)

    def jobs() -> int:
        return int(sc._jsc.sc().dagScheduler().nextJobId())

    # warm
    ref = sorted(map(tuple, dedup_clusters(pairs).collect()))
    for i in range(3):
        spark.catalog.clearCache()
        j0 = jobs()
        t0 = time.perf_counter()
        got = sorted(map(tuple, dedup_clusters(pairs).collect()))
        dt = time.perf_counter() - t0
        print(f"run {i}: jobs={jobs() - j0} wall={dt:.3f}s rows={len(got)}")
        assert got == ref


if __name__ == "__main__":
    main()
