"""Driver-facing registration order for the query inventory.

The driver oracle-checks only the FIRST 50 entries of ``queries()`` (in
registration order), rotating coverage round by round.  Cumulative state
after round 12: 205 registered (208 with the round-13 additions), zero
value mismatches ever left unfixed; the r12 driver re-ran the r11 set
(no rotation advance shipped that round), so going into round 13 the
stale pool was 7 queries last green r7 + 48 last green r8.

Round 13 priority, summing to exactly 50 (r12 verdict next #2: lead with
the 7 r7-stale queries, then drain the r8 pool, plus this round's new
oracle-backed closures):

- the 7 queries deferred since round 7 (all 7 re-verified PASS by both
  the r11 and r12 judges' independent check_parity runs);
- the 5 round-13 additions (scalar_format_datetime, scalar_round13,
  scalar_round13b, scalar_uint64, streaming_embedding_pairs — the
  specifier-engine rewrite, the intDiv/dateDiff/toDayOfWeek/to*OrZero
  audit fixes, the wave-2 closures (greatest/least NULL propagation,
  toRelative*, hasToken, calendar toStartOfInterval, toWeek mode 1),
  the UInt64 past-2^63 query, and the rows-only streaming embedding-LSH
  twin), so the freeze carries zero never-driver-checked registrations;
- 38 of the 48 queries last driver-checked in round 8.

Deferred to the round-14 lead (stay at r8 — oldest last-green ≥ r8
holds at the r13 freeze; each deferral has a rotating twin exercising
the same engine path):

- ``sql_right_any_join`` (sql_any_join was r12-green; the ANY-join
  operator re-benches every round),
- ``pipe_minhash_signatures`` (pipe_minhash_lsh_verified rotates and
  consumes the signatures; pipe_minhash_lsh benches every round),
- ``pipe_embed_lsh_topk`` (pipe_embed_ivf_topk rotates; brute-force
  embed top-k benches every round),
- ``agg_quantiles_exact`` (agg_multi_quantiles was r12-green;
  agg_weighted_quantile rotates),
- ``subquery_in`` (subquery_correlated_exists rotates — the strictly
  harder decorrelation shape),
- ``join_semi`` (join_anti rotates; both lower to the same
  broadcast/shuffle hash-join semi path),
- ``sample_fraction`` (pipe_training_filter rotates the same
  hash-threshold sampling expression),
- ``events_pivot`` (events_props_analytics was r12-green; same
  map-extraction path over events.props),
- ``win_range_frame`` (events_sliding_window — the RANGE-frame-over-time
  shape — was r12-green; win_distribution and win_lag_lead rotate the
  other window paths),
- ``behav_retention`` (behav_retention_sql — the same retention
  semantics through the SQL surface — was r12-green;
  behav_cohort_retention rotates the windowed-cohort path).
"""

from __future__ import annotations

from mcp_clickhouse_spark.inventory.registry import QUERIES

# First 50 = the round-13 driver rotation.
PRIORITY: list[str] = [
    # deferred-since-r7 block
    "order_limit_offset",
    "sql_qualify_subquery",
    "sql_asof_join_star",
    "setop_except_all",
    "array_join_left_outer",
    "shim_with_fill_interpolate",
    "constant_select",
    # round-13 additions (specifier engine + audit closures + UInt64)
    "scalar_format_datetime",
    "scalar_round13",
    "scalar_round13b",
    "scalar_uint64",
    "streaming_embedding_pairs",  # rows-only by design
    # last driver-checked in round 8 (38 of the 48-query pool)
    "agg_conditional",
    "agg_grouping_sets",
    "agg_minmax_by",
    "agg_topk",
    "agg_weighted_quantile",
    "agg_with_totals",
    "cte_multi",
    "filter_predicates",
    "join_anti",
    "join_full_outer",
    "join_right",
    "pipe_dedup_fingerprint",
    "pipe_embed_ivf_topk",
    "pipe_embed_label_centroids",
    "pipe_lang_id",
    "pipe_minhash_lsh_verified",
    "pipe_multimodal_meta",
    "pipe_ngram_jaccard",
    "pipe_quality_score",
    "pipe_simhash",
    "pipe_token_count",
    "pipe_training_filter",
    "q12_priority_by_flag",
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q8_market_share",
    "scalar_datetime_tz",
    "scalar_zip_sequence",
    "scale_salted_agg",
    "select_star_except",
    "shim_distinct_on",
    "source_numbers",
    "sql_array_join_bare",
    "sql_asof_forward",
    "sql_star_apply",
    "subquery_correlated_exists",
    "win_distribution",
    "win_lag_lead",
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
