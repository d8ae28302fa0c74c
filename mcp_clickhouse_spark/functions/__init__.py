"""Reusable column-expression builders shared across the engine."""

from mcp_clickhouse_spark.functions.exact import (  # noqa: F401
    cents,
    cents_sql,
    exact_avg,
    exact_sum,
)


def _register_murmur(spark) -> None:
    from mcp_clickhouse_spark.functions.murmur import ensure_registered

    ensure_registered(spark)


def _register_xxh(spark) -> None:
    from mcp_clickhouse_spark.functions.xxh import register

    register(spark)


def _register_stats(spark) -> None:
    from mcp_clickhouse_spark.functions.stats import ensure_registered

    ensure_registered(spark)


def _register_seqmatch(spark) -> None:
    from mcp_clickhouse_spark.functions.seqmatch import ensure_registered

    ensure_registered(spark)


def _register_unicode_norm(spark) -> None:
    from mcp_clickhouse_spark.functions.unicode_norm import ensure_registered

    ensure_registered(spark)


def _register_jumphash(spark) -> None:
    from mcp_clickhouse_spark.functions.jumphash import ensure_registered

    ensure_registered(spark)


def _register_codecs(spark) -> None:
    from mcp_clickhouse_spark.functions.codecs import ensure_registered

    ensure_registered(spark)


def _register_ipaddr(spark) -> None:
    from mcp_clickhouse_spark.functions.ipaddr import ensure_registered

    ensure_registered(spark)


def _register_strdist(spark) -> None:
    from mcp_clickhouse_spark.functions.strdist import ensure_registered

    ensure_registered(spark)


def _register_geo(spark) -> None:
    from mcp_clickhouse_spark.functions.geo import ensure_registered

    ensure_registered(spark)


def _register_sqids_bech32(spark) -> None:
    from mcp_clickhouse_spark.functions.sqids_bech32 import ensure_registered

    ensure_registered(spark)


def _register_randdist(spark) -> None:
    from mcp_clickhouse_spark.functions.randdist import ensure_registered

    ensure_registered(spark)


# Python-UDF-backed helper functions the dialect layer may emit, keyed by
# the (lowercased) name as it appears in translated SQL.  The tool layer
# scans translated queries for these names and registers lazily — only
# queries that actually use one pay the registration cost.
LAZY_UDFS = {
    "ch_murmurhash3_64": _register_murmur,
    "ch_t_sf": _register_stats,
    "ch_norm_sf": _register_stats,
    "ch_norm_ppf": _register_stats,
    "ch_ks_q": _register_stats,
    "ch_t_ppf": _register_stats,
    "ch_seq_match": _register_seqmatch,
    "ch_seq_count": _register_seqmatch,
    "ch_normalize_utf8": _register_unicode_norm,
    "ch_jump_hash": _register_jumphash,
    "ch_punycode_encode": _register_codecs,
    "ch_punycode_decode": _register_codecs,
    "ch_try_punycode_decode": _register_codecs,
    "ch_idna_encode": _register_codecs,
    "ch_try_idna_encode": _register_codecs,
    "ch_idna_decode": _register_codecs,
    "ch_base58_encode": _register_codecs,
    "ch_base58_decode": _register_codecs,
    "ch_try_base58_decode": _register_codecs,
    "ch_base32_encode": _register_codecs,
    "ch_base32_decode": _register_codecs,
    "ch_try_base32_decode": _register_codecs,
    "ch_json_merge_patch": _register_codecs,
    "ch_decode_xml": _register_codecs,
    "ch_decode_html": _register_codecs,
    "ch_crc64": _register_codecs,
    "ch_bfloat16": _register_codecs,
    "ch_initcap": _register_codecs,
    "ch_initcap_utf8": _register_codecs,
    "ch_sqid_encode": _register_sqids_bech32,
    "ch_sqid_decode": _register_sqids_bech32,
    "ch_bech32_encode": _register_sqids_bech32,
    "ch_bech32_decode": _register_sqids_bech32,
    "ch_rand_poisson": _register_randdist,
    "ch_rand_binomial": _register_randdist,
    "ch_rand_negbinomial": _register_randdist,
    "ch_rand_chisq": _register_randdist,
    "ch_rand_student_t": _register_randdist,
    "ch_rand_fisher_f": _register_randdist,
    "ch_ipv6_aton": _register_ipaddr,
    "ch_ipv6_ntoa": _register_ipaddr,
    "ch_is_ipv6": _register_ipaddr,
    "ch_cut_ipv6": _register_ipaddr,
    "ch_ipv6_cidr_lo": _register_ipaddr,
    "ch_ipv6_cidr_hi": _register_ipaddr,
    "ch_ip_in_range": _register_ipaddr,
    "ch_ngram_dist": _register_strdist,
    "ch_ngram_dist_ci": _register_strdist,
    "ch_ngram_dist_utf8": _register_strdist,
    "ch_ngram_dist_ci_utf8": _register_strdist,
    "ch_ngram_search": _register_strdist,
    "ch_ngram_search_ci": _register_strdist,
    "ch_ngram_search_utf8": _register_strdist,
    "ch_ngram_search_ci_utf8": _register_strdist,
    "ch_byte_hamming": _register_strdist,
    "ch_damerau_lev": _register_strdist,
    "ch_jaro": _register_strdist,
    "ch_jaro_winkler": _register_strdist,
    "ch_array_levenshtein": _register_strdist,
    "ch_array_lev_weighted": _register_strdist,
    "ch_xxhash32": _register_xxh,
    "ch_xxhash64": _register_xxh,
    "ch_geohash_encode": _register_geo,
    "ch_geohash_decode": _register_geo,
    "ch_lgamma": _register_stats,
    "ch_tgamma": _register_stats,
    "ch_erf": _register_stats,
    "ch_erfc": _register_stats,
}


def register_lazy_udfs(spark, translated_sql: str) -> None:
    """Register any ``ch_*`` helper UDFs the translated SQL references."""
    low = translated_sql.lower()
    seen = set()
    for name, reg in LAZY_UDFS.items():
        if reg not in seen and f"{name}(" in low:
            reg(spark)
            seen.add(reg)
