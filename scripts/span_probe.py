#!/usr/bin/env python
"""r18 probe: span_dedup alternatives at sf0.1 (and sf1 with env).

Shapes:
  current : spans -> groupBy(chunk_key).agg(min,max) -> join back -> regroup.
            Chunk+md5 work runs TWICE (agg side + join side re-read the
            spread exchange and re-chunk; job_profile r18: S56+S59).
  window  : spans -> Window.partitionBy(chunk_key) min/max -> regroup.
            Chunking runs ONCE; pays a full-chunk-row exchange on chunk_key
            and a regroup exchange on id (partitioning lost).

In-process protocol: 6 warm passes, min-of-5 timed, identity check first.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import Window
from pyspark.sql import functions as F


def window_span_dedup(df, text_col="text", id_col="doc_id", chunk_tokens=20):
    from mcp_clickhouse_spark.pipeline.dedup import _spread, doc_spans, regroup_spans

    spans = doc_spans(_spread(df, by=id_col), text_col, id_col, chunk_tokens)
    w = Window.partitionBy("chunk_key")
    flagged = spans.withColumn(
        "_keep", F.min(id_col).over(w).eqNullSafe(F.max(id_col).over(w))
    )
    return regroup_spans(flagged, id_col)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from mcp_clickhouse_spark.pipeline.dedup import span_dedup
    from mcp_clickhouse_spark.session import get_spark, read_table

    total_bytes = sum(
        os.path.getsize(os.path.join(sf_dir, f))
        for f in os.listdir(sf_dir)
        if f.endswith(".parquet")
    )
    partitions = max(8, min(total_bytes // (32 << 20), 4 * 32))
    spark = get_spark(app_name="span-probe", shuffle_partitions=int(partitions))
    if total_bytes < (1 << 30):
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    d = read_table(spark, sf_dir, "documents")

    # identity first
    a = sorted(map(tuple, span_dedup(d).collect()))
    b = sorted(map(tuple, window_span_dedup(d).collect()))
    assert a == b, f"shapes diverge: {len(a)} vs {len(b)} rows"
    print(f"identity OK ({len(a)} rows)")

    def bench(build, label):
        # REBUILD the DataFrame every iteration: re-executing the same object
        # reuses its computed shuffle stages (registry.py's warning) and
        # fakes a speedup the bench protocol (fresh ofRows per call) never
        # sees.
        for _ in range(6):
            build(d).toArrow()
            spark.catalog.clearCache()
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            build(d).toArrow()
            ts.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        print(f"{label:10s} min={min(ts):.3f} all={[round(t,3) for t in ts]}")
        return min(ts)

    # interleave the two shapes
    for _ in range(2):
        bench(span_dedup, "current")
        bench(window_span_dedup, "window")


if __name__ == "__main__":
    main()
