#!/usr/bin/env python
"""Mutated-copy scale probe for the near-dup pipeline (round 13; r11
verdict next #6, carried through r12): both earlier scale probes
(make_sf1.py) used VERBATIM key-shifted copies, which the
identical-signature collapse absorbs before banding — so the
banding + Jaccard-verify path had never been measured under realistic
NEAR-duplicates.  This probe token-mutates each copy so no two documents
are byte-identical and the collapse cannot help.

Method: ``copies`` mutated copies of sf0.1's 5,000 documents (doc_id
shifted by copy*1e9). Copy c substitutes tokens at RATES[c % 3] percent
(5/10/15), deterministically per (doc, copy, token index) via md5 — no
randomness, reruns are identical.  With k=3 word shingles, a token
substitution kills ≤3 shingles, so expected Jaccard vs the original is
s/(2-s) with s = (1-m)^3:

  m=5%  → J ≈ 0.75   (above the 0.5 verify threshold; banding
                       P(candidate) = 1-(1-J^4)^8 ≈ 0.95)
  m=10% → J ≈ 0.57   (above threshold; banding recall ≈ 0.59 — the
                       8x4 s-curve's soft zone, worth MEASURING)
  m=15% → J ≈ 0.44   (below threshold: verify must REJECT these)

Outputs one JSON line: per-stage seconds, candidate/verified pair
counts, and a recall table — found vs potential orig↔copy pairs per
mutation rate (potential = 5,000 families × copies at that rate).

Usage: python scripts/mutated_probe.py [out_dir] [copies]
Results go into the BASELINE.md round-13 addendum.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SRC = "/root/testdata/sf0.1/documents.parquet"
OFFSET = 1_000_000_000
RATES = (5, 10, 15)  # percent, cycled per copy


def mutated_expr(copy: int, rate_pct: int) -> str:
    """Token-substitution SQL: deterministic md5 coin per (doc, copy,
    index); substituted tokens become fresh 'mz<hash>' tokens that shingle
    into brand-new space (worst case for overlap)."""
    coin = (
        f"pmod(xxhash64(CAST(doc_id AS STRING), '{copy}',"
        f" CAST(i AS STRING)), 100)"
    )
    sub = (
        f"concat('mz', substring(md5(concat(t, ':', '{copy}', ':',"
        f" CAST(i AS STRING))), 1, 8))"
    )
    return (
        f"array_join(zip_with(split(text, ' '),"
        f" sequence(1, size(split(text, ' '))),"
        f" (t, i) -> CASE WHEN {coin} < {rate_pct} THEN {sub} ELSE t END),"
        f" ' ')"
    )


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mutdocs"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 9

    from pyspark.sql import functions as F

    from mcp_clickhouse_spark.pipeline.dedup import (
        jaccard_verify,
        minhash_lsh_candidates,
        minhash_signatures,
        simhash_64,
        simhash_near_dups,
    )
    from mcp_clickhouse_spark.session import get_spark

    spark = get_spark(app_name="mutated-probe", shuffle_partitions=32)
    base = spark.read.parquet(SRC)

    out = os.path.join(out_dir, "documents.parquet")
    if not os.path.exists(out):
        parts = [base]
        for c in range(1, copies + 1):
            rate = RATES[(c - 1) % len(RATES)]
            parts.append(
                base.select(
                    (F.col("doc_id") + F.lit(c * OFFSET)).alias("doc_id"),
                    F.expr(mutated_expr(c, rate)).alias("text"),
                    *[col for col in base.columns if col not in ("doc_id", "text")],
                ).select(*base.columns)
            )
        all_docs = parts[0]
        for p in parts[1:]:
            all_docs = all_docs.unionByName(p)
        all_docs.write.mode("overwrite").parquet(out)

    docs = spark.read.parquet(out).persist()
    n_docs = docs.count()

    times: dict[str, float] = {}
    counts: dict[str, int] = {"documents": n_docs}

    def stage(name, df, persist=True):
        if persist:
            df = df.persist()
        t0 = time.perf_counter()
        counts[name] = df.count()
        times[name] = round(time.perf_counter() - t0, 3)
        return df

    sigs = stage("minhash_signatures", minhash_signatures(docs))
    cands = stage("lsh_candidates", minhash_lsh_candidates(sigs))
    verified = stage("jaccard_verify", jaccard_verify(cands, docs, threshold=0.5))

    sh = stage("simhash_signatures", simhash_64(docs))
    stage("simhash_pairs", simhash_near_dups(sh), persist=False)

    # Recall table: orig↔copy verified pairs per mutation rate.
    def rate_of(copy_col):
        # copy 0 = original (rate NULL); copies cycle 5/10/15
        return F.when(copy_col == 0, F.lit(0)).otherwise(
            F.element_at(
                F.array(*[F.lit(r) for r in RATES]),
                ((copy_col - 1) % len(RATES) + 1).cast("int"),
            )
        )

    v = verified.select(
        (F.col("id_a") % OFFSET).alias("family"),
        (F.col("id_a") / OFFSET).cast("bigint").alias("ca"),
        (F.col("id_b") / OFFSET).cast("bigint").alias("cb"),
    )
    pair_table = (
        v.select(
            F.sort_array(F.array(rate_of(F.col("ca")), rate_of(F.col("cb"))))
            .cast("array<int>")
            .alias("rates"),
        )
        .groupBy("rates")
        .count()
        .collect()
    )
    recall = {}
    n_fam = base.count()
    per_rate_copies = {r: 0 for r in RATES}
    for c in range(1, copies + 1):
        per_rate_copies[RATES[(c - 1) % len(RATES)]] += 1
    for row in pair_table:
        lo, hi = row["rates"][0], row["rates"][1]
        key = f"{lo}-{hi}"
        if lo == 0:  # orig ↔ mutated copy: potential = families × copies@rate
            pot = n_fam * per_rate_copies.get(hi, 0)
            recall[key] = {
                "found": row["count"],
                "potential": pot,
                "recall": round(row["count"] / pot, 4) if pot else None,
            }
        else:
            recall[key] = {"found": row["count"]}

    print(
        json.dumps(
            {
                "out_dir": out_dir,
                "copies": copies,
                "rates_pct": RATES,
                "counts": counts,
                "seconds": times,
                "total_sec": round(sum(times.values()), 3),
                "orig_copy_recall": recall,
            }
        )
    )


if __name__ == "__main__":
    main()
