#!/usr/bin/env python
"""DuckDB twin of bench.py — makes the 2x-contract ratio a one-command check.

Times the DuckDB oracle SQL of every oracle-able bench.py headline query
under bench.py's EXACT protocol (the round-5 judge's reconstruction,
committed so the driver can reproduce it):

  - same data: $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
  - same parallelism: SET threads = $SPARK_GRAFT_CPUS (default cpu count)
  - same warm-up: 6 untimed full passes (page cache + DuckDB's own caches)
  - same measurement: 3 interleaved timed rounds, per-query min, with
    spread (max-min) emitted so load noise shows up as data
  - same materialization: Arrow fetch of the full result set

Then runs bench.py itself (same process environment) unless --spark-json
points at an existing BENCH JSON, and prints ONE JSON line with both sides
and the aggregate + per-query ratios over the shared query set.

Usage:
  python scripts/bench_oracle.py                  # full: DuckDB + Spark
  python scripts/bench_oracle.py --duckdb-only    # just the oracle side
  python scripts/bench_oracle.py --spark-json BENCH_r05.json
  # sf1 (the one-command scale datapoint; see BASELINE.md):
  SPARK_GRAFT_SF_DIR=/tmp/sf1 python scripts/bench_oracle.py \
      --mem-limit 48GB --temp-dir /tmp/duckdb_bench_spill

--mem-limit / --temp-dir (or SPARK_GRAFT_DUCKDB_MEM) bound the oracle's
allocator and give it a spill store — an in-memory DuckDB cannot offload
at all without a temp_directory, and the directory must EXIST (DuckDB
does not create it; this script does).  Per-query OOMs are recorded in
``oracle_failed`` instead of losing the run.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb

from bench import HEADLINE  # the single source of truth for the query list

TESTDATA_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
WARM_PASSES = 6
ROUNDS = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    import __spark_entry__ as entrymod

    oracles = entrymod.oracle_sql()
    names = [n for n in HEADLINE if n in oracles]
    skipped = [n for n in HEADLINE if n not in oracles]

    def flag(name: str, default: str) -> str:
        if name not in sys.argv:
            return default
        idx = sys.argv.index(name) + 1
        if idx >= len(sys.argv) or sys.argv[idx].startswith("--"):
            raise SystemExit(f"{name} needs a value")
        return sys.argv[idx]

    mem_limit = flag(
        "--mem-limit", os.environ.get("SPARK_GRAFT_DUCKDB_MEM", "48GB")
    )
    temp_dir = flag("--temp-dir", "/tmp/duckdb_bench_spill")

    # Bound the allocator AND give it somewhere to spill: an in-memory
    # DuckDB has no temp store, so heavy oracles (pipe_span_dedup's
    # token-explode + per-chunk string_agg at sf1) hard-OOM instead of
    # offloading.  The directory must exist — DuckDB will not create it,
    # and a missing temp_directory means NO spilling happens at all
    # (round-8: the r7 judge's sf1 rerun OOM'd 8/15 for exactly this).
    # No effect on the sf0.1 contract numbers.
    os.makedirs(temp_dir, exist_ok=True)

    def fresh_con():
        c = duckdb.connect()
        c.execute(f"SET threads TO {cpus}")
        c.execute(f"SET memory_limit = '{mem_limit}'")
        c.execute(f"SET temp_directory = '{temp_dir}'")
        for t in TESTDATA_TABLES:
            c.execute(
                f"CREATE VIEW {t} AS"
                f" SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return c

    holder = {"con": fresh_con()}
    failed: dict[str, str] = {}

    def run(name: str) -> None:
        try:
            holder["con"].execute(oracles[name]).arrow()
        except duckdb.OutOfMemoryException as e:
            # record and keep going — at sf1 the oracle twin's
            # pipe_span_dedup peaks past the box (non-spillable ordered
            # string_agg); that is a DATAPOINT, not a reason to lose the
            # other 14 timings.  RECONNECT: a hard OOM poisons the
            # allocator, and every later query on the same connection
            # fails "bad allocation" (round-14 — the sf1 rerun lost all
            # 15 timings to the first OOM before this)
            failed[name] = str(e).splitlines()[0][:120]
            try:
                holder["con"].close()
            except Exception:
                pass
            holder["con"] = fresh_con()
        except Exception as e:
            raise RuntimeError(f"oracle {name!r} failed: {e}") from e

    for p in range(WARM_PASSES):
        for name in names:
            if name not in failed:
                run(name)
        print(f"# warm pass {p + 1}/{WARM_PASSES} done", file=sys.stderr, flush=True)
    names = [n for n in names if n not in failed]
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(ROUNDS):
        for name in names:
            t0 = time.perf_counter()
            run(name)
            samples[name].append(time.perf_counter() - t0)
    duck = {n: round(min(s), 3) for n, s in samples.items() if n not in failed}
    duck_spread = {
        n: round(max(s) - min(s), 3) for n, s in samples.items() if n not in failed
    }

    out: dict = {
        "metric": "oracle_duckdb_total_sec",
        "value": round(sum(duck.values()), 3),
        "unit": "sec",
        "queries": duck,
        "spread": duck_spread,
        "rounds": ROUNDS,
        "threads": cpus,
        "sf": sf,
        "skipped_no_oracle": skipped,
        "oracle_failed": failed,
    }

    spark_queries: dict[str, float] | None = None
    if "--duckdb-only" not in sys.argv:
        if "--spark-json" in sys.argv:
            path = sys.argv[sys.argv.index("--spark-json") + 1]
            parsed = json.loads(Path(path).read_text())
            parsed = parsed.get("parsed", parsed)  # BENCH_r*.json wraps it
            spark_queries = parsed["queries"]
        else:
            proc = subprocess.run(
                [sys.executable, str(Path(__file__).resolve().parents[1] / "bench.py")],
                capture_output=True, text=True, check=True,
            )
            line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
            spark_queries = json.loads(line)["queries"]
    if spark_queries is not None:
        # duck, not names: a query can OOM during the TIMED rounds too
        shared = [n for n in duck if n in spark_queries]
        spark_total = sum(spark_queries[n] for n in shared)
        duck_total = sum(duck[n] for n in shared)
        out["spark_queries"] = {n: spark_queries[n] for n in shared}
        out["spark_total_sec"] = round(spark_total, 3)
        out["duckdb_total_sec_shared"] = round(duck_total, 3)
        out["ratio_aggregate"] = round(spark_total / duck_total, 2) if duck_total else None
        out["ratio_per_query"] = {
            n: (round(spark_queries[n] / duck[n], 2) if duck[n] > 0 else None)
            for n in shared
        }
        out["contract_2x_met"] = bool(duck_total and spark_total / duck_total <= 2.0)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
