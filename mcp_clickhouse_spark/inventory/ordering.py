"""Driver-facing registration order for the query inventory.

The driver oracle-checks only the FIRST 50 entries of ``queries()`` (in
registration order), rotating coverage round by round.  Cumulative state
after round 10: 203 registered, 203 ever driver-checked (zero
never-checked debt), zero value mismatches ever left unfixed, oldest
last-green pool r6 (6 deliberately deferred queries).

Round 11 priority, summing to exactly 50 (r10 verdict next #1: lead with
the 6 r6-deferred queries, then drain the 49-query r7-stale pool):

- the 6 queries deferred from the r10 rotation (last driver-green r6;
  all 5 oracle-able ones re-verified PASS by the r10 judge's independent
  check_parity run): join_cross, scan_projection, setop_union_distinct,
  setop_intersect, agg_any_first_last, and the rows-only
  pipe_dup_clusters_minhash;
- scalar_round11 — the round-11 guided-tail closure wave
  (polygonAreaSpherical, ngramDistance/Search, minSampleSize*), so the
  freeze carries zero never-driver-checked registrations;
- scalar_round11b — the round-11 wave-2 closures (readWKT* parsing,
  decodeXML/HTMLComponent; the rand-distribution closures are rows-only
  by nature and carry moment-accuracy pytest instead);
- 42 of the 49 queries last driver-checked in round 7 (the whole pool
  minus the seven deferred below).

Deferred to the round-12 lead (stay at r7 — "oldest last-green ≥ r7"
still holds at the r11 freeze): ``order_limit_offset`` (order_limit
rotates and exercises the same TakeOrdered path), ``sql_qualify_subquery``
(sql_qualify rotates), ``sql_asof_join_star`` (sql_asof_join + sql_any_join
rotate; join_asof re-benches every round), ``setop_except_all``
(setop_intersect_all rotates; setop_except was r10-green),
``array_join_left_outer`` (array_join_explode + sql_array_join_multi
rotate), ``shim_with_fill_interpolate`` (the strictly-more-general
shim_with_fill_interpolate_expr rotates, plus shim_with_fill), and
``constant_select`` (the SELECT-1 shape is re-proven every round by the
driver smoke check and the MCP e2e harness).
"""

from __future__ import annotations

from mcp_clickhouse_spark.inventory.registry import QUERIES

# First 50 = the round-11 driver rotation.
PRIORITY: list[str] = [
    # deferred-from-r10 block (last green r6)
    "join_cross",
    "scan_projection",
    "setop_union_distinct",
    "setop_intersect",
    "agg_any_first_last",
    "pipe_dup_clusters_minhash",  # rows-only by design
    # round-11 additions (guided-tail closures, waves 1 + 2)
    "scalar_round11",
    "scalar_round11b",
    # last driver-checked in round 7 (43 of the 49-query pool)
    "agg_global",
    "agg_group_having",
    "agg_collect",
    "agg_quantile_approx",
    "agg_approx_count_distinct",
    "agg_stats",
    "agg_histogram",
    "agg_multi_quantiles",
    "agg_group_by_all",
    "behav_cohort_retention",
    "behav_sequence_match",
    "behav_retention_sql",
    "filter_const_false",
    "filter_ilike_regex",
    "case_when",
    "order_limit",
    "shim_with_fill",
    "shim_with_fill_interpolate_expr",
    "shim_distinct",
    "sql_asof_join",
    "sql_any_join",
    "sql_array_join_multi",
    "sql_qualify",
    "source_values_table",
    "source_generate_random",
    "select_columns_regex",
    "array_join_explode",
    "scalar_date_series",
    "scalar_regex",
    "scalar_datetime",
    "scalar_math",
    "scalar_cast",
    "scalar_array",
    "scalar_hash",
    "scalar_null_handling",
    "setop_union_by_name",
    "setop_intersect_all",
    "events_sliding_window",
    "events_props_analytics",
    "events_latest_per_user",
    "win_ranking",
    "win_value_functions",
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
