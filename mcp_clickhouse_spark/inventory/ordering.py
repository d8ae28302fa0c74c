"""Driver-facing registration order for the query inventory.

The driver oracle-checks only the FIRST 50 entries of ``queries()`` (in
registration order), rotating coverage round by round.  Cumulative state
after round 9: 199 then-registered, 187 ever driver-checked, zero value
mismatches ever left unfixed, oldest last-green pool r6.

Round 10 priority, summing to exactly 50 (r9 verdict next #2: lead with
the never-driver-checked queries, then drain the r6-stale pool):

- the 9 round-9 post-freeze additions that sat at positions 51+ of the
  r9 rotation (parity-verified locally at two SFs in r9 AND re-verified
  this round — three of them also CHANGED semantics this round via the
  r9 advisor fixes: agg_interval_stats now divides the recovered
  3rd/4th central moments by n per ClickHouse Moments.h,
  scalar_ip_functions gained IPv4-mapped-IPv6 parsing, and
  agg_combinators_r9's -Resample empty buckets now fill with the
  aggregate default);
- the 7 round-10 additions: behav_funnel_strict (windowFunnel
  strict_order/strict_deduplication), behav_sequence_next_node,
  agg_quantile_exact_variants (+ mapPopulateSeries), and the three
  round-10 gap-scan waves scalar_string_distance (byte-exact
  Damerau-Levenshtein/Jaro/Jaro-Winkler/byteHamming + arrayLevenshtein
  + lgamma/tgamma), scalar_geo (greatCircle*, pointInPolygon,
  polygon*Cartesian, geohashEncode) and scalar_round10_wave2
  (toISOYear/toStartOfISOYear, sigmoid, byte-padded bin/unbin,
  toStringCutToZero, studentTTestOneSample) plus agg_if_generic (the
  generic -If combinator surface);
- 34 of the 40 queries last driver-checked in round 6 (the whole pool
  minus the six deferred below).

Deferred to the round-11 lead (the only r6-stale remainder):
``join_cross``, ``scan_projection``, ``setop_union_distinct``,
``setop_intersect``, ``agg_any_first_last`` — each the
lowest-marginal-value member of a family whose siblings rotate this
round (join_inner/left/theta/any; the scan shapes the bench re-measures
every round; union_all/except; any/anyLast appear inside many other
green queries) — and the rows-only ``pipe_dup_clusters_minhash`` (its
driver row carries no value hash by design).
"""

from __future__ import annotations

from mcp_clickhouse_spark.inventory.registry import QUERIES

# First 50 = the round-10 driver rotation.
PRIORITY: list[str] = [
    # round-9 post-freeze block, never driver-checked (3 with changed
    # semantics this round, marked ^)
    "scalar_reinterpret",
    "scalar_normalize_utf8",
    "scalar_string_fns_r9",
    "agg_interval_stats",  # ^ skewSamp/kurtSamp /n moments
    "pipe_embed_quantize",
    "scalar_gap_wave2",
    "pipe_html_extract",
    "scalar_ip_functions",  # ^ IPv4-mapped IPv6
    "agg_combinators_r9",  # ^ -Resample default fill
    # round-10 additions
    "behav_funnel_strict",
    "behav_sequence_next_node",
    "agg_quantile_exact_variants",
    "scalar_string_distance",
    "scalar_geo",
    "scalar_round10_wave2",
    "agg_if_generic",
    # last driver-checked in round 6 (34 of the 40-query pool)
    "agg_count_distinct",
    "agg_cube",
    "agg_rollup",
    "events_session_window",
    "events_tumbling_window",
    "join_any",
    "join_inner",
    "join_left",
    "join_theta",
    "pipe_bm25",
    "pipe_c4_filters",
    "pipe_decontaminate",
    "pipe_dedup_exact",
    "pipe_embed_topk",
    "pipe_pack_sequences",
    "pipe_source_mix",
    "pipe_stratified_sample",
    "pipe_vocab_oov",
    "q11_important_stock",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_supplier_part_count",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_discounted_revenue",
    "q9_product_profit",
    "scalar_json",
    "scalar_map",
    "scalar_string",
    "setop_except",
    "setop_union_all",
    "shim_limit_by",
    "streaming_clean_corpus",
    "win_running_sum",
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
