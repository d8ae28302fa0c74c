"""Round-15 scale probe: measure the two pre-pass design decisions at a
compute-bearing size (sf1, ~6 M lineitem rows).

A) Division CASE guard: the translated ``x / y`` emits
   ``CASE WHEN y = 0 THEN ±inf/nan ELSE x / y END``.  Time a
   division-heavy aggregate under the raw Spark shape vs the guarded
   shape — the guard must be branch-predictable noise, not a tax.

B) IN rewrite shape: literal NULL elements are STRIPPED so the In +
   IsNotNull filters reach the parquet scan.  Time the pushdown-keeping
   shape against the coalesce-wrapped alternative (what a naive
   two-valued fix would emit), which loses data-source pushdown.

Usage: python scripts/in_div_probe.py [sf_dir]   (derives sf1 into
/tmp/sf1_probe via scripts/make_sf1.py when no dir is given)
"""

from __future__ import annotations

import statistics
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from mcp_clickhouse_spark.dialect import translate  # noqa: E402
from mcp_clickhouse_spark.session import get_spark, read_table  # noqa: E402


def _time(spark, sql, rounds=5):
    times = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        spark.sql(sql).collect()
        times.append(time.perf_counter() - t0)
    return min(times), statistics.median(times)


def main() -> None:
    if len(sys.argv) > 1:
        sf_dir = sys.argv[1]
    else:
        sf_dir = "/tmp/sf1_probe"
        if not Path(sf_dir, "lineitem.parquet").exists():
            subprocess.run(
                [sys.executable, "scripts/make_sf1.py", sf_dir, "10"],
                check=True,
            )
    spark = get_spark(app_name="in-div-probe")
    spark.sparkContext.setLogLevel("ERROR")
    read_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")

    # A) division guard
    raw_div = (
        "SELECT sum(l_extendedprice / (1 + l_tax)) AS s,"
        " sum(l_extendedprice / l_quantity) AS t FROM lineitem"
    )
    guarded_div = translate(
        "SELECT sum(l_extendedprice / (1 + l_tax)) AS s,"
        " sum(l_extendedprice / l_quantity) AS t FROM lineitem"
    )
    for sql in (raw_div, guarded_div):  # warm IO cache + codegen
        spark.sql(sql).collect()
    a_raw = _time(spark, raw_div)
    a_guard = _time(spark, guarded_div)

    # B) IN pushdown shape — against a KEY-SORTED copy: row-group
    # min/max stats can only skip when the key is clustered (the raw
    # sf1 derivation repeats the full key range in every row group, so
    # both shapes read everything there and time within noise).  At
    # 100 TB the sorted/clustered layout is the realistic one for a
    # key-filtered scan.
    sorted_dir = str(Path(sf_dir) / "lineitem_sorted.parquet")
    if not Path(sorted_dir).exists():
        (read_table(spark, sf_dir, "lineitem")
         .repartitionByRange(8, "l_orderkey")
         .sortWithinPartitions("l_orderkey")
         .write.mode("overwrite").parquet(sorted_dir))
    spark.read.parquet(sorted_dir).createOrReplaceTempView("lineitem_s")
    pushdown_in = translate(
        "SELECT count(*) AS c FROM lineitem_s"
        " WHERE l_orderkey IN (42, 4242, 424242, NULL)"
    )
    wrapped_in = (
        "SELECT count(*) AS c FROM lineitem_s"
        " WHERE l_orderkey IS NOT NULL AND"
        " coalesce(l_orderkey IN (42, 4242, 424242, NULL), false)"
    )
    for sql in (pushdown_in, wrapped_in):
        spark.sql(sql).collect()
    b_push = _time(spark, pushdown_in)
    b_wrap = _time(spark, wrapped_in)

    plan = (
        spark.sql(pushdown_in)._jdf.queryExecution().executedPlan().toString()
    )
    pushed = next(
        (ln.strip() for ln in plan.splitlines() if "PushedFilters" in ln), ""
    )

    print(f"sf_dir = {sf_dir}")
    print(
        f"A) division: raw min {a_raw[0]:.3f}s / med {a_raw[1]:.3f}s | "
        f"guarded min {a_guard[0]:.3f}s / med {a_guard[1]:.3f}s | "
        f"overhead {100 * (a_guard[0] / a_raw[0] - 1):+.1f}%"
    )
    print(
        f"B) IN filter: pushdown min {b_push[0]:.3f}s / med {b_push[1]:.3f}s"
        f" | coalesce-wrapped min {b_wrap[0]:.3f}s / med {b_wrap[1]:.3f}s | "
        f"wrap penalty {100 * (b_wrap[0] / b_push[0] - 1):+.1f}%"
    )
    print(f"B) pushed filters line: {pushed[:200]}")


if __name__ == "__main__":
    main()
