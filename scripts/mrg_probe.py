#!/usr/bin/env python
"""A/B probe: single-row-group testdata vs a multi-file rewritten copy.

Variant-interleaved (A,B,A,B,... within each round) so load drift hits both
variants equally; min-of-4; AQE off (the floor_probe winner).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import HEADLINE  # noqa: E402

MRG = "/tmp/mrg_probe_sf01"
# target rows per output file — enough rows that per-task overhead amortizes
ROWS_PER_FILE = 75_000
MAX_FILES = 8


def rewrite(spark, sf_dir: str) -> None:
    from mcp_clickhouse_spark.session import TESTDATA_TABLES

    shutil.rmtree(MRG, ignore_errors=True)
    os.makedirs(MRG)
    for name in TESTDATA_TABLES:
        src = os.path.join(sf_dir, f"{name}.parquet")
        df = spark.read.parquet(src)
        rows = df.count()
        n = max(1, min((rows + ROWS_PER_FILE - 1) // ROWS_PER_FILE, MAX_FILES))
        if name in ("documents", "embeddings"):
            n = 4  # CPU-heavy per-row consumers: split despite small rows
        out = os.path.join(MRG, f"{name}.parquet")
        if n <= 1:
            shutil.copy(src, out)
        else:
            df.repartition(int(n)).write.mode("overwrite").parquet(out)
        print(name, rows, "->", n, "files", flush=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # session._split_layout now rewrites single-row-group tables into a
    # multi-file warehouse copy TRANSPARENTLY — which would turn the
    # "single" variant of this A/B into multi-vs-multi noise. Disable the
    # rewrite for this process by pointing the warehouse at an unwritable
    # path (the split helper falls back to the original file).
    os.environ["SPARK_GRAFT_WAREHOUSE"] = "/proc/spark-graft-disabled"
    import mcp_clickhouse_spark.session as session_mod

    session_mod._WAREHOUSE_ROOT = os.environ["SPARK_GRAFT_WAREHOUSE"]
    import __spark_entry__ as entrymod
    from mcp_clickhouse_spark.session import get_spark

    spark = get_spark(app_name="mrg-probe", shuffle_partitions=8)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    qs = entrymod.queries()
    names = list(HEADLINE)

    rewrite(spark, sf_dir)

    def mat(df):
        df.toArrow()

    variants = {"single": sf_dir, "multi": MRG}
    for v, d in variants.items():  # warm both
        for n in names:
            mat(qs[n](spark, d))
            spark.catalog.clearCache()
    samples = {v: {n: [] for n in names} for v in variants}
    for _ in range(4):
        for n in names:
            for v, d in variants.items():
                t0 = time.perf_counter()
                mat(qs[n](spark, d))
                samples[v][n].append(time.perf_counter() - t0)
                spark.catalog.clearCache()
    out = {
        v: {n: round(min(s), 3) for n, s in per.items()} for v, per in samples.items()
    }
    for v in out:
        out[v]["TOTAL"] = round(sum(out[v].values()), 3)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
