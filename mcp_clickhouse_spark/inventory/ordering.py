"""Driver-facing registration order for the query inventory.

The driver oracle-checks only the FIRST 50 entries of ``queries()`` (in
registration order), rotating coverage round by round.  After round 7,
all 168 then-registered queries had a driver row, 158/158 oracle-backed
ones green at least once, zero ever-failed-and-unfixed.

Round 9 priority, summing to exactly 50 (r8 verdict next #2: lead with
the 14 never/oldest-checked queries, then drain the r5-stale pool):

- 13 round-8 additions never driver-checked (the post-freeze block that
  sat at positions 51+ of the r8 rotation, plus scalar_lttb and
  scalar_time_delta which landed after even that);
- win_range_time_interval — last green in round 3 (oldest in the
  registry);
- behav_window_funnel / behav_funnel_sql — r8-green but their SEMANTICS
  changed this round (windowFunnel re-anchors level 1 on every cond-1
  event per the r8 advisor; both Spark folds and both DuckDB oracles
  rewritten), so they must re-earn a driver row;
- all 28 queries last driver-checked in round 5;
- 6 from the round-6 pool, picked for blast radius (the flagship TPC-H
  q1, the three headline pipeline/bench queries, the 4-broadcast star
  join, and join_asof whose rewrite path churned in r8).

After this round the oldest last-green check in the registry is r6.
"""

from __future__ import annotations

from mcp_clickhouse_spark.inventory.registry import QUERIES

# First 50 = the round-9 driver rotation; the tail (51+) is the
# documented post-freeze block that leads round 10.
PRIORITY: list[str] = [
    # never driver-checked (round-8 post-freeze additions)
    "agg_map_entropy",
    "agg_max_intersections",
    "agg_foreach",
    "scalar_array_auc",
    "scalar_url_fss",
    "agg_crosstab",
    "pipe_line_dedup",
    "agg_rank_corr",
    "scalar_url_hierarchy",
    "scalar_vector_math",
    "agg_hypothesis_tests",
    "scalar_lttb",
    "scalar_time_delta",
    # oldest in the registry (last green r3)
    "win_range_time_interval",
    # semantics changed round 9 (windowFunnel re-anchoring, r8 advisor)
    "behav_window_funnel",
    "behav_funnel_sql",
    # last driver-checked in round 5 (28 — the full stale pool)
    "agg_topk_weighted",
    "pipe_chunk_documents",
    "pipe_clean_corpus",
    "pipe_compression_ratio",
    "pipe_dedup_funnel",
    "pipe_dedup_incremental",
    "pipe_dup_clusters",
    "pipe_embed_neardup",
    "pipe_epoch_shards",
    "pipe_lsh_eval",
    "pipe_pii_scrub",
    "pipe_repetition_filters",
    "pipe_snapshot_diff",
    "pipe_train_val_split",
    "pipe_unigram_logprob",
    "profile_documents",
    "q10_returned_items",
    "q14_promo_revenue",
    "q20_part_promotion",
    "q21_waiting_supplier",
    "q22_global_sales_opportunity",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "streaming_corpus_stats",
    "streaming_minhash_pairs",
    "subquery_scalar",
    # round-6 pool, by blast radius
    "q1_pricing_summary",
    "pipe_span_dedup",
    "pipe_minhash_lsh",
    "pipe_text_stats",
    "join_star_revenue",
    "join_asof",
    # positions 51+ — added after the round-9 rotation was frozen at 50
    # (reinterpretAs* byte-exact folds, normalizeUTF8* via pandas_udf,
    # the gap-scan string functions, intervalLengthSum + skewSamp/
    # kurtSamp); each parity-verified locally at sf0.001 AND sf0.01,
    # lead round 10
    "scalar_reinterpret",
    "scalar_normalize_utf8",
    "scalar_string_fns_r9",
    "agg_interval_stats",
    "pipe_embed_quantize",
    "scalar_gap_wave2",
    "pipe_html_extract",
    "scalar_ip_functions",
    "agg_combinators_r9",
]


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
