"""Driver-facing registration order for the query inventory.

The driver oracle-checks only the FIRST 50 entries of ``queries()`` (in
registration order), rotating coverage round by round.  After round 3 every
oracle-backed query has had a driver row and 111/113 were green.

Round 4 priority = the 2 round-3 hash-RED rows re-fixed this round (both were
DuckDB HUGEINT output-type drift, now CAST AS BIGINT in the oracles:
pipe_token_count, q12_priority_by_flag) + the 4 rows-only queries that have
never had ANY driver row (judge round-3 item 6: pipe_minhash_lsh,
pipe_simhash, pipe_embed_ivf_topk, sample_fraction) + the 6 queries NEW in
round 4 (pipe_embed_neardup and the Q5/Q13/Q15/Q17/Q22 TPC-H shapes) + 38
queries last checked in r1/r2 so their green rows get refreshed under the
current codebase.
"""

from __future__ import annotations

from mcp_clickhouse_spark.inventory.registry import QUERIES

# Exactly 50 names: 2 re-fixed REDs + 4 never-driver-checked rows-only
# + 44 r1/r2-green refresh slots spanning every SURVEY §2 family.
PRIORITY: list[str] = [
    # round-3 hash-RED (HUGEINT oracle output drift), oracles re-cast this round
    "pipe_token_count",
    "q12_priority_by_flag",
    # rows-only queries that have never been inside the driver's 50
    "pipe_minhash_lsh",
    "pipe_simhash",
    "pipe_embed_ivf_topk",
    "sample_fraction",
    # r1/r2-green refresh: aggregates
    "agg_grouping_sets",
    "agg_with_totals",
    "agg_conditional",
    "agg_minmax_by",
    "agg_quantiles_exact",
    "agg_topk",
    # behavioral analytics
    "behav_retention",
    "behav_window_funnel",
    # core scans/filters
    "filter_predicates",
    # new in round 4: oracle-backed embedding-cosine near-dup
    "pipe_embed_neardup",
    # dialect shims
    "shim_with_fill",
    "shim_distinct_on",
    # sources / projection extras
    "source_numbers",
    "select_star_except",
    # subqueries / CTEs
    "subquery_in",
    "subquery_correlated_exists",
    "cte_multi",
    # TPC-H depth (incl. the 5 new round-4 shapes)
    "q5_local_supplier_volume",
    "q21_waiting_supplier",
    "q9_product_profit",
    "q11_important_stock",
    "q16_supplier_part_count",
    "q20_part_promotion",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q22_global_sales_opportunity",
    "q3_shipping_priority",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q10_returned_items",
    "q14_promo_revenue",
    "q18_large_volume_customers",
    # join family
    "join_full_outer",
    "join_semi",
    "join_anti",
    # events / windows
    "events_pivot",
    "win_lag_lead",
    "win_range_frame",
    # pipeline
    "pipe_dedup_fingerprint",
    "pipe_text_stats",
    "pipe_lang_id",
    "pipe_embed_label_centroids",
    "pipe_multimodal_meta",
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
