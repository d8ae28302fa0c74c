#!/usr/bin/env python
"""One-off measurement probe for the local-mode per-query floor.

For each headline query: split DataFrame CONSTRUCTION time (Python/py4j plan
building) from EXECUTION time (toArrow), and A/B adaptive execution on/off —
interleaved rounds, min-of-3, same protocol as bench.py.  Not part of the
driver contract; informs where the ~0.2 s/query constant actually lives.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import HEADLINE  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from mcp_clickhouse_spark.session import get_spark

    spark = get_spark(app_name="floor-probe", shuffle_partitions=8)
    qs = entrymod.queries()
    names = [n for n in HEADLINE if n != "pipe_minhash_lsh"]  # heavy outlier

    def mat(df):
        df.toArrow()

    # warm
    for n in names:
        mat(qs[n](spark, sf_dir))
        spark.catalog.clearCache()

    ROUNDS = 3
    cons: dict[str, list[float]] = {n: [] for n in names}
    ex_on: dict[str, list[float]] = {n: [] for n in names}
    ex_off: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(ROUNDS):
        for n in names:
            t0 = time.perf_counter()
            df = qs[n](spark, sf_dir)
            t1 = time.perf_counter()
            cons[n].append(t1 - t0)
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            t1 = time.perf_counter()
            mat(df)
            ex_on[n].append(time.perf_counter() - t1)
            spark.catalog.clearCache()
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            df2 = qs[n](spark, sf_dir)
            t2 = time.perf_counter()
            mat(df2)
            ex_off[n].append(time.perf_counter() - t2)
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            spark.catalog.clearCache()

    out = {}
    for n in names:
        out[n] = {
            "construct": round(min(cons[n]), 3),
            "exec_aqe_on": round(min(ex_on[n]), 3),
            "exec_aqe_off": round(min(ex_off[n]), 3),
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
