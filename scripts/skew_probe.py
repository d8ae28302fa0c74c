#!/usr/bin/env python
"""Skew probe: measure what each mitigation actually buys on a hot key
(round 14 — the one 100 TB failure mode no earlier probe measured).

Synthetic workload derived from sf0.1 lineitem replicated ``copies``×
(default 5 → ~3 M rows): a key column where HALF the rows share one hot
key and the rest spread uniformly over 1,000 cold keys — the classic
zipf-head shape that turns one shuffle partition into a straggler at
cluster scale.

Measured (median of 3 fresh executions each):

  join_smj_plain     sort-merge join, broadcast OFF, AQE OFF — the
                     straggler baseline (one task owns 50% of the fact)
  join_smj_aqe       broadcast OFF, AQE ON + skew-join splitting with
                     thresholds scaled to the probe size (defaults are
                     sized for real-cluster 256 MB partitions; the
                     PROPORTIONS carry, the absolute numbers don't)
  join_salted        the salted_join operator (16 salts), AQE OFF —
                     the no-AQE fallback the 100 TB plan keeps
  join_broadcast     broadcast the 1,001-row dim — the RIGHT answer
                     whenever the dim fits; measured to show the gap
  agg_plain/salted   sum/count groupBy on the same skewed key: expected
                     ≈ equal BECAUSE map-side partial aggregation
                     collapses the hot key per input partition before
                     the shuffle — documents why salted_agg is reserved
                     for non-collapsing aggregates (collect_list-like)

Usage: [SPARK_GRAFT_SF_DIR=...] python scripts/skew_probe.py [copies]
Prints one JSON line; paste the table into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from mcp_clickhouse_spark.operators.salting import (  # noqa: E402
    salted_agg,
    salted_join,
)
from mcp_clickhouse_spark.session import get_spark, read_table  # noqa: E402

N_COLD = 1000


def build(spark, sf_dir: str, copies: int):
    base = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    fact = base.withColumn(
        "__c", F.explode(F.sequence(F.lit(1), F.lit(copies)))
    )
    # half the rows hot, half uniform over N_COLD cold keys
    fact = fact.withColumn(
        "k",
        F.when(
            (F.xxhash64("l_orderkey", "__c") % 2) == 0, F.lit("hot")
        ).otherwise(
            F.concat(
                F.lit("k"),
                (F.abs(F.xxhash64("__c", "l_orderkey")) % N_COLD).cast(
                    "string"
                ),
            )
        ),
    ).drop("__c")
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"D{i}") for i in range(N_COLD)],
        "k string, label string",
    )
    return fact, dim


def timed(fn, rounds: int = 3) -> float:
    vals = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        fn()
        vals.append(time.perf_counter() - t0)
    return round(statistics.median(vals), 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(app_name="skew-probe", shuffle_partitions=32)
    conf = spark.conf

    fact, dim = build(spark, sf_dir, copies)
    fact = fact.localCheckpoint()  # freeze inputs so every config reads
    dim = dim.localCheckpoint()    # the same materialized rows
    n = fact.count()
    hot = fact.filter(F.col("k") == "hot").count()

    def set_join_mode(broadcast: bool, aqe: bool, skew: bool) -> None:
        conf.set(
            "spark.sql.autoBroadcastJoinThreshold",
            "10485760" if broadcast else "-1",
        )
        conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
        conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew).lower())
        if skew:
            # scale the skew detector to probe size: hot partition here
            # is ~tens of MB, not the 256 MB default
            conf.set(
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"
            )
            conf.set(
                "spark.sql.adaptive.skewJoin."
                "skewedPartitionThresholdInBytes",
                "4194304",
            )
            conf.set(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes",
                "1048576",
            )

    def run_join(joined) -> None:
        joined.agg(
            F.sum("l_quantity"), F.count("label")
        ).collect()

    results: dict[str, float] = {"rows": n, "hot_rows": hot}

    set_join_mode(broadcast=False, aqe=False, skew=False)
    results["join_smj_plain_sec"] = timed(
        lambda: run_join(fact.join(dim, on="k"))
    )
    results["join_salted_sec"] = timed(
        lambda: run_join(salted_join(fact, dim, on=["k"]))
    )
    set_join_mode(broadcast=False, aqe=True, skew=True)
    results["join_smj_aqe_sec"] = timed(
        lambda: run_join(fact.join(dim, on="k"))
    )
    set_join_mode(broadcast=True, aqe=True, skew=True)
    results["join_broadcast_sec"] = timed(
        lambda: run_join(fact.join(F.broadcast(dim), on="k"))
    )

    # aggregation: map-side combine already collapses sum/count skew
    set_join_mode(broadcast=True, aqe=True, skew=False)
    results["agg_plain_sec"] = timed(
        lambda: fact.groupBy("k")
        .agg(F.count("*").alias("c"), F.sum("l_quantity").alias("s"))
        .agg(F.sum("c"), F.sum("s"))
        .collect()
    )
    results["agg_salted_sec"] = timed(
        lambda: salted_agg(
            fact,
            ["k"],
            [F.count("*").alias("c"), F.sum("l_quantity").alias("s")],
            [F.sum("c").alias("c"), F.sum("s").alias("s")],
        )
        .agg(F.sum("c"), F.sum("s"))
        .collect()
    )

    print(json.dumps({"metric": "skew_probe", "copies": copies, **results}))
    spark.stop()


if __name__ == "__main__":
    main()
