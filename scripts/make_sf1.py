#!/usr/bin/env python
"""Derive an sf1-scale dataset from the provided sf0.1 parquet (r6 verdict
next #7: one measured scale datapoint, so the "sub-0.1 s ratios amortize at
scale" floor argument becomes a measurement).

Method: 10 key-shifted copies of every scaling table, referential integrity
preserved — each copy shifts ALL entity keys (custkey/orderkey/partkey/
suppkey/event_id/user_id/doc_id/vec_id) by ``copy * OFFSET``, so joins
land exactly as in the original and every aggregate's group structure
repeats 10x.  region/nation stay fixed (fixed-size dimensions in TPC-H).
Value distributions are untouched.  DuckDB does the generation (columnar,
out-of-core); output is plain parquet readable by both engines.

Usage: python scripts/make_sf1.py [/tmp/sf1] [copies]

Round 11 (r10 verdict next #3): ``copies`` defaults to 10 (sf1); pass 50
for the sf5 probe (`python scripts/make_sf1.py /tmp/sf5 50`) — the second
scale datapoint that pins the per-stage scaling curve.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

SRC = "/root/testdata/sf0.1"
COPIES = 10
OFFSET = 1_000_000_000  # far above any sf0.1 key

# key columns to shift per table (all BIGINT-safe)
SHIFT = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED = ["region", "nation"]


def main() -> None:
    global COPIES
    out_dir = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1")
    if len(sys.argv) > 2:
        COPIES = int(sys.argv[2])
    out_dir.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads = 16")
    for t in FIXED:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
            f"'{out_dir}/{t}.parquet' (FORMAT parquet)"
        )
        print(t, "copied (fixed dimension)")
    for t, keys in SHIFT.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'"
            ).fetchall()
        ]
        sel = ", ".join(
            f"({c} + c.i * {OFFSET}) AS {c}" if c in keys else c for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM '{SRC}/{t}.parquet', "
            f"(SELECT unnest(range({COPIES})) AS i) c) TO "
            f"'{out_dir}/{t}.parquet' (FORMAT parquet)"
        )
        n = con.execute(
            f"SELECT count(*) FROM '{out_dir}/{t}.parquet'"
        ).fetchone()[0]
        print(t, n, "rows")


if __name__ == "__main__":
    main()
