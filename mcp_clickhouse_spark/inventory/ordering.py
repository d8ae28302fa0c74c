"""Driver-facing registration order for the query inventory.

The driver oracle-checks only the FIRST 50 entries of ``queries()`` (in
registration order), rotating coverage round by round.  After round 3 every
oracle-backed query has had a driver row and 111/113 were green.

Round 5 priority, summing to exactly 50: the TWENTY-FIVE brand-new round-5
queries (dup-cluster CC, span dedup, vocab OOV, dedup funnel, table
profiling, LSH eval, epoch shards, compression ratio, streaming minhash
pairs, streaming corpus stats, snapshot diff, clean corpus, repetition
filters, incremental dedup, PII scrub, topKWeighted, train/val split,
unigram log-prob, chunking, packing, decontamination, BM25, C4 filters,
stratified sample, source mix — never driver-checked) + the one query whose ORACLE changed this round
(subquery_scalar — the mean now goes through order-independent bigint-cents
because the multi-file storage layout unpinned double-sum order) + the 14
bench-headline canaries (AQE policy + storage-layout rewrite changed their
execution this round) + 5 of the 11 round-4-new shapes holding a single
green (q9/q11/q13/q15/q16/q17 rolled to r6 for slot budget) + 5 of the 6 single-green
r4-only TPC-H (q18 rolled to r6)  (25 + 1 + 14 + 5 + 5 = 50).  Rolled to
round 6: q9/q11/q13/q15/q16/q17/q18, the r3-refresh pool (join_inner/left/any/cross/theta,
setops, scalar_string/json/map, agg_any_first_last/cube/histogram,
q19, and the q2/q4/q8/q12-adjacent singles).
"""

from __future__ import annotations

from mcp_clickhouse_spark.inventory.registry import QUERIES

# Exactly 50 names.
PRIORITY: list[str] = [
    # brand-new this round — never driver-checked
    "pipe_dup_clusters",
    "pipe_span_dedup",
    "pipe_vocab_oov",
    "profile_documents",
    "pipe_lsh_eval",
    "pipe_epoch_shards",
    "pipe_compression_ratio",
    "streaming_minhash_pairs",
    "streaming_corpus_stats",
    "pipe_snapshot_diff",
    "pipe_clean_corpus",
    "pipe_dedup_funnel",
    "pipe_repetition_filters",
    "pipe_dedup_incremental",
    "pipe_pii_scrub",
    "agg_topk_weighted",
    "pipe_train_val_split",
    "pipe_unigram_logprob",
    "pipe_chunk_documents",
    "pipe_pack_sequences",
    "pipe_decontaminate",
    "pipe_bm25",
    "pipe_c4_filters",
    "pipe_stratified_sample",
    "pipe_source_mix",
    # oracle changed this round — must re-verify first
    "subquery_scalar",
    # bench-headline canaries (execution changed: AQE policy + file layout)
    "q1_pricing_summary",
    "scan_projection",
    "join_star_revenue",
    "join_asof",
    "agg_count_distinct",
    "agg_rollup",
    "win_running_sum",
    "events_session_window",
    "events_tumbling_window",
    "shim_limit_by",
    "pipe_dedup_exact",
    "pipe_minhash_lsh",
    "pipe_embed_topk",
    "pipe_text_stats",
    # round-4-new shapes: earn the second green
    "pipe_embed_neardup",
    "q5_local_supplier_volume",
    "q20_part_promotion",
    "q21_waiting_supplier",
    "q22_global_sales_opportunity",
    # single-green r4-only TPC-H (q18 rolled to r6 for slot budget)
    "q3_shipping_priority",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q10_returned_items",
    "q14_promo_revenue",
]
# (agg_any_first_last/q19 and the other rolled slots are accounted in the
# docstring's round-6 carry-over list.)


def apply_priority() -> None:
    """Reorder the global QUERIES dict so PRIORITY names come first.

    Names not in PRIORITY keep their relative (module-import) order after
    the prioritized block.  Unknown names in PRIORITY raise — the list must
    track the registry.
    """
    missing = [n for n in PRIORITY if n not in QUERIES]
    if missing:
        raise ValueError(f"PRIORITY names not registered: {missing}")
    ordered = {n: QUERIES[n] for n in PRIORITY}
    for name, spec in QUERIES.items():
        if name not in ordered:
            ordered[name] = spec
    QUERIES.clear()
    QUERIES.update(ordered)
