"""Deterministic sampling and data-mixing operators for training corpora.

A training-data pipeline rarely wants Bernoulli sampling (irreproducible
across runs and engines): it wants CONTENT-STABLE decisions — the same
document is in or out of the sample no matter the partitioning, executor
count, or engine. Both operators here key every decision on a hash of the
row's identity, so they are exactly reproducible and DuckDB-oracle-able.

Scale shape: both are single-projection / single-aggregation plans —
no joins, no windows, nothing O(n²). At 100 TB the stratified sample is a
pushdown-friendly filter over the scan; the mix table is one partial-agg
shuffle of |sources| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mcp_clickhouse_spark.pipeline.text import _words

# The first 8 hex chars of md5 are a uniform uint32. Lowercase fixed-width
# hex sorts lexicographically in numeric order ('0'-'9' < 'a'-'f'), so the
# keep predicate compares STRINGS — `hex_prefix < hex(rate * 2^32)` — which
# every md5-capable engine evaluates identically, with no base-16 integer
# parsing (DuckDB has none built in).
_HASH_SPACE = 1 << 32


def _hex_threshold(rate: float) -> str:
    """8-char lowercase-hex keep threshold for a sampling rate in [0, 1]."""
    if rate >= 1.0:
        return "g" * 8  # lexicographically above every hex string: keep all
    return format(max(int(rate * _HASH_SPACE), 0), "08x")


def _hash_prefix(*cols) -> "F.Column":
    """First 8 md5 hex chars of the '|'-joined key columns ('|' keeps
    ('a','bc') and ('ab','c') in different buckets)."""
    return F.substring(F.md5(F.concat_ws("|", *cols)), 1, 8)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    key_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Deterministic per-stratum sample: keep a row iff its content-hash
    bucket falls below the stratum's rate.

    Unlike ``df.sampleBy`` (seeded Bernoulli on the partition iterator —
    the sample changes with partitioning), the decision is a pure function
    of the row key, so reruns, engine ports, and incremental loads all
    agree on membership. The predicate is a scan-level filter: at 100 TB
    it is one codegen'd md5+compare per row, embarrassingly parallel, and
    column-pruned to the key columns plus the stratum.
    """
    prefix = _hash_prefix(*(F.col(c).cast("string") for c in key_cols))
    threshold = F.lit(_hex_threshold(default_rate))
    for value, rate in sorted(rates.items()):
        threshold = F.when(
            F.col(strata_col) == value, F.lit(_hex_threshold(rate))
        ).otherwise(threshold)
    return df.where(prefix < threshold)


def source_mix_weights(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    target_shares: dict[str, float] | None = None,
) -> DataFrame:
    """Data-mixing table: per-group document/token counts, the corpus-
    natural token share, and the resampling factor (epochs) that reweights
    the natural mix to the target mix.

    ``target_shares`` maps group → desired token share; groups not listed
    share the remaining mass equally (the common "uniform over the rest"
    recipe). ``mix_factor`` > 1 means upsample (repeat epochs), < 1 means
    downsample — exactly the number a sampling stage or a data loader
    consumes. Shares are quantized to 1e-6 on both engines so the division
    stays hash-identical.
    """
    toks = F.size(_words(F.col(text_col)))
    agg = df.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(toks).alias("n_tokens"),
    )
    total = agg.agg(
        F.sum("n_tokens").alias("_total"), F.count("*").alias("_groups")
    )
    out = agg.crossJoin(F.broadcast(total))
    natural = F.round(F.col("n_tokens") / F.col("_total").cast("double"), 6)
    if target_shares:
        fixed = sum(target_shares.values())
        n_fixed = len(target_shares)
        target = F.lit(None).cast("double")
        for value, share in sorted(target_shares.items()):
            target = F.when(F.col(group_col) == value, F.lit(share)).otherwise(target)
        # unlisted groups split the leftover mass equally
        target = F.coalesce(
            target,
            F.round(
                F.lit(1.0 - fixed) / (F.col("_groups") - F.lit(n_fixed)).cast("double"),
                6,
            ),
        )
    else:
        target = F.round(F.lit(1.0) / F.col("_groups").cast("double"), 6)
    return out.select(
        F.col(group_col),
        F.col("n_docs"),
        F.col("n_tokens"),
        natural.alias("natural_share"),
        F.round(target, 6).alias("target_share"),
        F.round(target / natural, 6).alias("mix_factor"),
    )


def epoch_shuffle_shards(
    df,
    id_col: str = "doc_id",
    n_shards: int = 8,
    seed: int = 0,
):
    """Deterministic epoch shuffle + shard assignment for training-data
    writes: every row gets a content-stable pseudo-random sort key
    (md5 of seed||id — reproducible in any engine, no RNG state), a shard
    (key mod n_shards), and its position within the shard.

    Returns ``(id_col, shard, pos)``.  Re-running with the same seed gives
    byte-identical shard files; bumping the seed is a fresh epoch
    permutation.  Scale shape: one shuffle on the shard key; the in-shard
    ordering is a window ORDER BY the hash key riding that same exchange —
    at 100 TB each shard sorts independently (no global sort), which is
    exactly the property a per-shard training-file writer needs.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    key = F.md5(F.concat_ws("|", F.lit(int(seed)), F.col(id_col).cast("string")))
    keyed = df.select(F.col(id_col), key.alias("_k"))
    shard = F.pmod(F.conv(F.substring("_k", 1, 15), 16, 10).cast("bigint"),
                   F.lit(int(n_shards)))
    w = Window.partitionBy("shard").orderBy("_k", id_col)
    return (
        keyed.withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select(id_col, "shard", "pos")
    )
