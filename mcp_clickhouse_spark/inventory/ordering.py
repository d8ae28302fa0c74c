"""Driver-facing registration order for the query inventory.

The driver oracle-checks only the FIRST 50 entries of ``queries()`` (in
registration order), rotating coverage round by round.  Cumulative state
after round 15: 217 registered (218 with round 16's ``scalar_round16``),
zero value mismatches ever left unfixed, zero never-driver-checked
registrations; going into round 16 the stale pool was 18 queries last
green r10 (the r15 deferrals) + 50 last green r12 (r11 and r13 pools
drained in earlier rotations).

Round 16 priority, summing to exactly 50:

- the 18 queries deferred since round 10 (each spent r15 covered by a
  rotating twin or a stronger per-round check — see the r15 docstring
  in git history for the per-query rationale);
- ``scalar_round16`` (new: advisor-r15 fixes — comment stripping,
  scientific-notation division operands, the nonzero-literal-
  denominator native path, mapContains runtime-NULL key,
  groupBitmapAnd over zero rows, values() with parameterized
  Decimal/Map column types);
- 31 of the 50 queries last driver-checked in round 12.

Deferred to the round-17 lead (stay at r12 — oldest last-green ≥ r10
still holds this round via the 18-query lead; each deferral has a
rotating twin or a stronger per-round check exercising the same engine
path):

- ``scan_projection`` (benches every round as the scan headline),
- ``agg_global`` (``q1_pricing_summary`` benches every round and was
  r15-green — the same global-aggregate path),
- ``agg_any_first_last`` (``agg_collect`` rotates — the same
  collect-fold machinery; any/anyLast carry exact-value pytest),
- ``behav_cohort_retention`` (``behav_funnel_strict`` leads this
  rotation; ``behav_retention`` was r14-green — same retention fold),
- ``behav_sequence_match`` (``behav_funnel_strict`` leads;
  ``behav_sequence_next_node`` was r15-green — same sequence-regex
  aggregate family),
- ``win_ranking`` (``win_running_sum`` leads this rotation;
  ``win_range_frame`` was r14-green — same window machinery),
- ``win_value_functions`` (``win_running_sum`` leads; ``win_lag_lead``
  rotates — the same offset-function family),
- ``setop_union_distinct`` / ``setop_union_by_name``
  (``setop_union_all`` leads this rotation — the same Union node;
  by-name alignment is also pinned by the merge() pytest),
- ``setop_intersect`` (``setop_intersect_all`` rotates — the same
  Intersect node; ``setop_except`` was r15-green),
- ``events_sliding_window`` / ``events_latest_per_user`` /
  ``events_props_analytics`` (``events_session_window`` leads this
  rotation and ``events_tumbling_window`` was r15-green + benches —
  the same time-bucket/window expressions),
- ``sql_asof_join`` (``join_asof`` was r15-green — the same ASOF
  rewrite and operator; both directions carry pytest),
- ``sql_any_join`` (``join_any`` was r15-green — the same ANY-join
  rewrite; ``sql_right_any_join`` was r14-green),
- ``sql_qualify`` (the QUALIFY rewrite carries its own pytest suite
  and ``win_running_sum``/``win_distribution`` exercise the same
  window-filter plan shape),
- ``pipe_dup_clusters_minhash`` (``pipe_minhash_lsh`` was r15-green
  and benches every round — the same signature/banding core;
  ``pipe_dedup_funnel`` was r15-green for the CC stage),
- ``shim_distinct`` (``agg_count_distinct`` leads this rotation and
  ``pipe_dedup_exact`` leads too — the same distinct machinery;
  ``shim_distinct_on`` was r15-green),
- ``filter_const_false`` (constant-fold pruning is plan-tested in
  tests/test_plans.py; ``case_when`` rotates with the same
  literal-predicate path),
- ``sql_array_join_multi`` (displaced by ``scalar_round16b``;
  ``array_join_explode`` rotates this round — the same ARRAY JOIN →
  explode path, and the multi-array zip form carries its own pytest),
- ``behav_retention_sql`` (displaced by ``scalar_round16c``;
  ``behav_funnel_strict`` leads this rotation and ``behav_retention``
  was r14-green — the same retention-conditions fold).
"""

from __future__ import annotations

from mcp_clickhouse_spark.inventory.registry import QUERIES

# First 50 = the round-16 driver rotation.
PRIORITY: list[str] = [
    # deferred-since-r10 block (18 queries)
    "agg_rollup",
    "shim_limit_by",
    "pipe_dedup_exact",
    "pipe_embed_topk",
    "pipe_vocab_oov",
    "join_inner",
    "agg_count_distinct",
    "events_session_window",
    "win_running_sum",
    "scalar_string",
    "setop_union_all",
    "pipe_stratified_sample",
    "behav_funnel_strict",
    "agg_if_generic",
    "pipe_pack_sequences",
    "scalar_geo",
    "scalar_string_distance",
    "pipe_html_extract",
    # round-16 additions (advisor fixes: comments, sci-notation
    # division, literal-denominator native path, mapContains NULL key,
    # empty-group bitmap folds, parameterized values() types)
    "scalar_round16",
    "scalar_round16b",
    "scalar_round16c",
    # last driver-checked in round 12 (29 of the 50-query pool)
    "scalar_round11b",
    "agg_group_having",
    "agg_quantile_approx",
    "agg_approx_count_distinct",
    "agg_stats",
    "agg_histogram",
    "case_when",
    "order_limit",
    "shim_with_fill",
    "source_values_table",
    "source_generate_random",
    "select_columns_regex",
    "filter_ilike_regex",
    "agg_collect",
    "agg_multi_quantiles",
    "join_cross",
    "array_join_explode",
    "scalar_regex",
    "scalar_datetime",
    "scalar_math",
    "scalar_cast",
    "scalar_hash",
    "scalar_date_series",
    "agg_group_by_all",
    "scalar_null_handling",
    "setop_intersect_all",
    "scalar_array",
    "shim_with_fill_interpolate_expr",
    "scalar_round11",
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
