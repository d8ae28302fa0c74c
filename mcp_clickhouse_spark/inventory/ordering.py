"""Driver-facing registration order for the query inventory.

The driver oracle-checks only the FIRST 50 entries of ``queries()`` (in
registration order), rotating coverage round by round.  After round 6,
all 162 then-registered queries had a driver row, 152/152 oracle-backed
ones green at least once, zero ever-failed-and-unfixed.

Round 7 priority, summing to exactly 50 (r6 verdict next #6: lead with
the queries last driver-checked in rounds 1-2 — the dialect/registry
churned ~2,400 lines since):

- 3 brand-new round-7 queries, never driver-checked (sql_asof_join_star
  — SELECT * helper hiding, verdict #2; sql_qualify_subquery — recursed
  QUALIFY, verdict #4; shim_with_fill_interpolate_expr — the AS-expr
  fold, verdict #5);
- 5 queries whose translation path changed this round (sql_asof_join,
  sql_any_join, sql_qualify — shared _skip_quoted scanner +
  _COND_BOUNDARY QUALIFY stop; shim_with_fill_interpolate,
  shim_with_fill — generated-rows-only interpolation in the operator);
- all 23 queries last driver-checked in r1/r2 (agg_global, agg_stats,
  agg_histogram, agg_approx_count_distinct, agg_quantile_approx,
  behav_cohort_retention, behav_sequence_match, case_when,
  constant_select, events_props_analytics, events_sliding_window,
  filter_const_false, filter_ilike_regex, order_limit,
  order_limit_offset, scalar_date_series, scalar_hash, scalar_math,
  scalar_regex, select_columns_regex, shim_distinct,
  source_generate_random, source_values_table);
- 16 of the 30 queries last checked in r3, oldest-first with the
  dialect-adjacent ones preferred (scalars/setops/windows/joins are
  downstream of the scanner refactor);
- 3 late round-7 additions, never driver-checked (sql_array_join_multi —
  multi-column ARRAY JOIN via inline(arrays_zip); agg_weighted_quantile —
  the quantileExactWeighted operator; behav_retention_sql — the verbatim
  retention() SQL mapping).

Rolled to round 8 (the r3 remainder): pipe_embed_lsh_topk,
pipe_minhash_lsh_verified, pipe_minhash_signatures, pipe_ngram_jaccard,
pipe_quality_score, pipe_training_filter, join_right, q4_order_priority,
q8_market_share, scalar_zip_sequence, scale_salted_agg,
win_distribution, win_range_time_interval.
"""

from __future__ import annotations

from mcp_clickhouse_spark.inventory.registry import QUERIES

# Exactly 50 names.
PRIORITY: list[str] = [
    # brand-new round-7 queries — never driver-checked
    "sql_asof_join_star",
    "sql_qualify_subquery",
    "shim_with_fill_interpolate_expr",
    # translation/operator path changed this round — re-verify first
    "sql_asof_join",
    "sql_any_join",
    "sql_qualify",
    "shim_with_fill_interpolate",
    "shim_with_fill",
    # last driver-checked in round 1 or 2 (23)
    "agg_approx_count_distinct",
    "agg_global",
    "agg_histogram",
    "agg_quantile_approx",
    "agg_stats",
    "behav_cohort_retention",
    "behav_sequence_match",
    "case_when",
    "constant_select",
    "events_props_analytics",
    "events_sliding_window",
    "filter_const_false",
    "filter_ilike_regex",
    "order_limit",
    "order_limit_offset",
    "scalar_date_series",
    "scalar_hash",
    "scalar_math",
    "scalar_regex",
    "select_columns_regex",
    "shim_distinct",
    "source_generate_random",
    "source_values_table",
    # r3-refresh pool, dialect-adjacent first (16)
    "scalar_array",
    "scalar_cast",
    "scalar_datetime",
    "scalar_null_handling",
    "setop_except_all",
    "setop_intersect_all",
    "setop_union_by_name",
    "win_ranking",
    "win_value_functions",
    "agg_collect",
    "agg_group_by_all",
    "agg_group_having",
    "agg_multi_quantiles",
    "array_join_explode",
    "array_join_left_outer",
    "events_latest_per_user",
    # late round-7 additions, never checked — take the q2/q4/join_right
    # slots (those roll to r8 with the r3 pool)
    "sql_array_join_multi",
    "agg_weighted_quantile",
    "behav_retention_sql",
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
