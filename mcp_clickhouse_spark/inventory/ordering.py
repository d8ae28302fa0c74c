"""Driver-facing registration order for the query inventory.

The driver oracle-checks only the FIRST 50 entries of ``queries()`` (in
registration order), rotating coverage round by round.  Cumulative state
after round 13: 210 registered (213 with the round-14 additions), zero
value mismatches ever left unfixed, zero never-driver-checked
registrations; going into round 14 the stale pool was 10 queries last
green r8 + 50 last green r9.

Round 14 priority, summing to exactly 50 (r13 verdict next #2: lead with
the 10 r8-stale deferrals — all 10 PASS the r13 judge's independent
check_parity run — then the corrected/changed oracles, then drain the
r9 pool):

- the 10 queries deferred since round 8;
- ``scalar_round13`` (its toDayOfWeek dw2/dw3 oracle lines encoded the
  same modes-2/3 misread as the translation — both sides corrected this
  round, so this green is now a real check, not a tautology);
- ``scalar_time_delta`` (formatReadableTimeDelta now joins with " and "
  before the last unit per the CH docs examples; the DuckDB oracle
  reconstruction was updated to match);
- ``scalar_round14`` / ``scalar_round14b`` (new: xor(), tuple-literal
  positional access, IN-family two-valued NULL logic, arrayResize
  2-arg shrink, hasToken empty-needle; literal tuple math, Lp family
  over tuples, bitmap cardinalities, and()/or()/not() spellings,
  multiMatchAnyIndex);
- ``scalar_toweek`` (new: the full toWeek/toYearWeek mode table
  0-9 — modes 2 and 4-9 were guided errors);
- 35 of the 49 remaining queries last driver-checked in round 9.

Deferred to the round-15 lead (stay at r9 — oldest last-green ≥ r9
holds at the r14 freeze; each deferral has a rotating twin or a
stronger per-round check exercising the same engine path):

- ``q1_pricing_summary`` (the entry() flagship — smoke-checked AND
  benched every round),
- ``join_asof`` (benches every round; sql_asof_join_star and
  sql_asof_forward were r13-green on the same as-of operator),
- ``join_star_revenue`` (benches every round; its broadcast-dim plan is
  drift-tested in PLANS.md),
- ``pipe_minhash_lsh`` (benches every round; pipe_minhash_lsh_verified
  was r13-green; pipe_minhash_signatures rotates this round),
- ``pipe_text_stats`` (benches every round; pipe_quality_score and
  pipe_token_count were r13-green over the same text expressions),
- ``pipe_span_dedup`` (benches every round; pipe_line_dedup rotates the
  same md5-keyed fixed-width shuffle family),
- ``streaming_corpus_stats`` (streaming_embedding_pairs was r13-green;
  streaming_minhash_pairs rotates the same stateful streaming path),
- ``pipe_dedup_funnel`` (a composition of pipe_dedup_incremental and
  pipe_dup_clusters — both rotate this round),
- ``agg_crosstab`` (events_pivot rotates the same pivot path;
  agg_grouping_sets was r13-green),
- ``scalar_lttb`` (value-pinned against an independent pure-Python LTTB
  in tests/test_lttb.py; scalar_array_auc rotates the same
  array-fold family),
- ``pipe_clean_corpus`` (pipe_pii_scrub rotates the same
  regexp-replace normalization family),
- ``subquery_scalar`` (subquery_correlated_exists was r13-green and
  subquery_in rotates — the strictly harder decorrelation shapes),
- ``win_range_time_interval`` (win_range_frame — the same
  RANGE-frame-over-time shape — rotates this round),
- ``pipe_snapshot_diff`` (pipe_dedup_incremental — the same
  state-join family — rotates this round).
"""

from __future__ import annotations

from mcp_clickhouse_spark.inventory.registry import QUERIES

# First 50 = the round-14 driver rotation.
PRIORITY: list[str] = [
    # deferred-since-r8 block
    "sql_right_any_join",
    "pipe_minhash_signatures",
    "pipe_embed_lsh_topk",
    "agg_quantiles_exact",
    "subquery_in",
    "join_semi",
    "sample_fraction",
    "events_pivot",
    "win_range_frame",
    "behav_retention",
    # corrected / changed oracles + the round-14 additions
    "scalar_round13",
    "scalar_time_delta",
    "scalar_round14",
    "scalar_round14b",
    "scalar_toweek",
    # last driver-checked in round 9 (35 of the 49-query pool)
    "agg_foreach",
    "agg_hypothesis_tests",
    "agg_map_entropy",
    "agg_max_intersections",
    "agg_rank_corr",
    "agg_topk_weighted",
    "behav_funnel_sql",
    "behav_window_funnel",
    "pipe_chunk_documents",
    "pipe_compression_ratio",
    "pipe_dedup_incremental",
    "pipe_dup_clusters",
    "pipe_embed_neardup",
    "pipe_epoch_shards",
    "pipe_line_dedup",
    "pipe_lsh_eval",
    "pipe_pii_scrub",
    "pipe_repetition_filters",
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
    "scalar_array_auc",
    "scalar_url_fss",
    "scalar_url_hierarchy",
    "scalar_vector_math",
    "streaming_minhash_pairs",
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
