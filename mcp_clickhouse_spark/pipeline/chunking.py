"""Context-window preparation for training corpora: chunking, packing,
benchmark decontamination.

All three are scan-shaped or single-shuffle DataFrame programs built from
JVM builtins — no Python workers, no driver-side loops — so they run at
parquet-scan speed over 100 TB:

- :func:`chunk_documents` — split each document into fixed-size word windows
  with overlap (the retrieval/pretraining chunking staple). Pure array
  expressions + one posexplode; embarrassingly parallel, no shuffle.
- :func:`pack_sequences` — assign documents to contiguous fixed-token-budget
  packs by cumulative token count (the "concatenate then split" packing
  convention GPT-style pretraining uses). One global-order window; at scale
  you'd run it per shard/partition key, which the ``order_within`` argument
  exposes.
- :func:`decontaminate` — flag corpus documents sharing any word k-gram with
  a benchmark set (the n-gram decontamination step every eval-hygienic
  pipeline runs; k=8 here since the synthetic docs are ~40 words — public
  practice uses k=13 on web text). Shingle explode + LEFT SEMI join against
  the benchmark's distinct k-grams: the pair space is never materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mcp_clickhouse_spark.pipeline.text import _ngram_col, _words


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """(id, chunk_idx, chunk_text, n_tokens) — sliding word windows of
    ``chunk_size`` with ``overlap`` words shared between neighbors
    (stride = chunk_size − overlap). The final chunk may be short.
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    stride = chunk_size - overlap
    words = _words(F.col(text_col))
    n = F.size(words)
    n_chunks = F.ceil(n / F.lit(stride)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        # slice() is 1-based; a start past the end yields an empty array,
        # but sequence above never generates one.
        lambda i: F.concat_ws(" ", F.slice(words, i * stride + 1, chunk_size)),
    )
    ex = df.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "chunk_text")
    )
    return ex.withColumn(
        "n_tokens", F.size(F.split(F.col("chunk_text"), r"\s+"))
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    budget: int = 256,
    order_within: str | None = None,
) -> DataFrame:
    """Assign each row a ``pack_id`` so that consecutive rows (ordered by
    ``id_col``) accumulate into packs of ~``budget`` tokens: pack_id =
    floor(running-token-count-before-this-row / budget). A document
    straddling a boundary belongs to the pack it started in, so packs can
    exceed the budget by at most one document — the standard
    concatenate-then-split convention, chosen over true bin packing because
    it is deterministic, order-preserving, and one window pass.

    ``order_within``: partition key for the window (e.g. a shard column) —
    REQUIRED at real scale; the default single global window is fine for
    corpus-sized tests but serializes through one task's sort at 100 TB.
    """
    if order_within:
        w = Window.partitionBy(order_within).orderBy(id_col)
    else:
        w = Window.orderBy(id_col)
    cum_before = F.coalesce(
        F.sum(token_col).over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    )
    return df.withColumn("pack_id", F.floor(cum_before / F.lit(budget)).cast("long"))


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Corpus rows that share at least one word ``k``-gram with any
    benchmark document — the rows a decontamination pass would DROP.

    Returns (id_col,) distinct. The benchmark side reduces to its distinct
    k-gram set before the LEFT SEMI join; corpus k-grams explode once and
    never pair up quadratically.
    """
    bench_grams = (
        benchmark.select(F.explode(_ngram_col(_words(F.col(text_col)), k)).alias("g"))
        .distinct()
    )
    corpus_grams = corpus.select(
        F.col(id_col), F.explode(_ngram_col(_words(F.col(text_col)), k)).alias("g")
    )
    return corpus_grams.join(bench_grams, "g", "left_semi").select(id_col).distinct()
