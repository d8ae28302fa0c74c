#!/usr/bin/env python
"""Per-stage wall-clock of the near-dup pipeline family at a given scale
(round 9, r8 verdict next #6): the LSH CANDIDATES stage is the one an
adopter sizes clusters by, so measure each stage in isolation rather than
only the end-to-end query.

Stages (each persisted + counted so downstream stages don't recompute it):
  minhash: signatures → banded candidates → jaccard verify
  simhash: 60-bit signatures → pigeonhole hamming pairs
  line-dedup: end-to-end (explode → corpus-frequency agg → rebuild)

Usage: SPARK_GRAFT_SF_DIR=/tmp/sf1 python scripts/stage_probe.py
Prints one JSON line {stage: seconds} + row counts; results go into the
BASELINE.md round-9 addendum.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from mcp_clickhouse_spark.pipeline.dedup import (
        jaccard_verify,
        line_dedup,
        minhash_lsh_candidates,
        minhash_signatures,
        simhash_64,
        simhash_near_dups,
    )
    from mcp_clickhouse_spark.session import get_spark

    # the bench protocol's session shape: partitions sized to input volume
    total_bytes = sum(
        os.path.getsize(os.path.join(sf_dir, f))
        for f in os.listdir(sf_dir)
        if f.endswith(".parquet")
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    partitions = max(8, min(total_bytes // (32 << 20), 4 * cpus))
    spark = get_spark(app_name="stage-probe", shuffle_partitions=int(partitions))
    if total_bytes < (1 << 30):
        spark.conf.set("spark.sql.adaptive.enabled", "false")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs = docs.persist()
    n_docs = docs.count()  # warm the input cache outside the timings

    times: dict[str, float] = {}
    counts: dict[str, int] = {"documents": n_docs}

    def stage(name: str, df, persist: bool = True):
        if persist:
            df = df.persist()
        t0 = time.perf_counter()
        counts[name] = df.count()
        times[name] = round(time.perf_counter() - t0, 3)
        return df

    # --- minhash family (the bench pipeline's parameters) ---
    sigs = stage("minhash_signatures", minhash_signatures(docs))
    cands = stage("lsh_candidates", minhash_lsh_candidates(sigs))
    stage(
        "jaccard_verify",
        jaccard_verify(cands, docs, threshold=0.5),
        persist=False,
    )

    # --- simhash family ---
    sh = stage("simhash_signatures", simhash_64(docs))
    stage("simhash_pairs", simhash_near_dups(sh), persist=False)

    # --- line dedup end-to-end ---
    stage("line_dedup", line_dedup(docs), persist=False)

    print(json.dumps({
        "sf_dir": sf_dir,
        "input_bytes": total_bytes,
        "counts": counts,
        "seconds": times,
        "total_sec": round(sum(times.values()), 3),
    }))


if __name__ == "__main__":
    main()
