"""Text analysis for document corpora: token stats, quality scoring,
language identification, fingerprinting.

Everything is built from JVM-side string/regex/array builtins — these run in
whole-stage codegen over 100 TB without a Python worker in sight. The
heuristics are deliberately simple and deterministic (SQL-expressible, so
each has a DuckDB oracle in the inventory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword marker lists for the stopword lang-id heuristic.
# Dict order is the deterministic tie-break (first language wins).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "que", "y", "en"],
}


def _words(text_col):
    return F.split(F.lower(F.trim(text_col)), r"\s+")


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append n_tokens, n_chars_measured, avg_token_len, punct_ratio,
    digit_ratio, upper_ratio — the standard quality-filter features.

    Ratios are integer-count divisions → bit-identical across engines.
    """
    text = F.col(text_col)
    words = _words(text)
    n_chars = F.length(text)

    def stripped(pat):
        return n_chars - F.length(F.regexp_replace(text, pat, ""))

    return (
        df.withColumn("n_tokens", F.size(words))
        .withColumn("n_chars_measured", n_chars)
        .withColumn(
            "avg_token_len",
            F.round((n_chars - F.size(words) + 1) / F.size(words).cast("double"), 6),
        )
        .withColumn("punct_ratio", F.round(stripped(r"[^\w\s]") / n_chars.cast("double"), 6))
        .withColumn("digit_ratio", F.round(stripped(r"[^0-9]") / n_chars.cast("double"), 6))
        .withColumn("upper_ratio", F.round(stripped(r"[^A-Z]") / n_chars.cast("double"), 6))
    )


def quality_score_col(text_col="text"):
    """Composite quality score in [0,1]: length band (0.4) + punctuation
    sanity (0.3) + stopword presence (0.3). Mirrors the oracle formula."""
    text = F.col(text_col) if isinstance(text_col, str) else text_col
    words = _words(text)
    n_tok = F.size(words)
    n_chars = F.length(text)
    punct = (n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))) / n_chars.cast(
        "double"
    )
    has_stop = (
        F.size(F.array_intersect(words, F.array(*[F.lit(w) for w in LANG_MARKERS["en"]]))) > 0
    )
    len_ok = (n_tok >= 10) & (n_tok <= 100000)
    return F.round(
        F.when(len_ok, 0.4).otherwise(0.0)
        + F.when(punct < 0.2, 0.3).otherwise(0.0)
        + F.when(has_stop, 0.3).otherwise(0.0),
        2,
    )


def language_id_col(text_col="text"):
    """Stopword-marker language ID: argmax of per-language distinct marker
    hits; 'und' when no marker matches; first language (dict order) wins ties."""
    text = F.col(text_col) if isinstance(text_col, str) else text_col
    words = _words(text)
    scores = [
        (lang, F.size(F.array_intersect(words, F.array(*[F.lit(w) for w in ms]))))
        for lang, ms in LANG_MARKERS.items()
    ]
    max_score = F.greatest(*[s for _, s in scores])
    expr = F.lit("und")
    for lang, s in reversed(scores):  # build inside-out so the FIRST lang wins ties
        expr = F.when((max_score > 0) & (s == max_score), F.lit(lang)).otherwise(expr)
    return expr


def fingerprint_col(text_col="text"):
    """OpenRefine-style fingerprint: md5 of the sorted distinct lowercase
    words — robust to word order and duplication."""
    text = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(_words(text)))))


def token_count_bpe_ish(text_col="text"):
    """Token count with a BPE-ish regex split (word pieces + punctuation as
    separate tokens) — the cheap proxy for tokenizer-based counting."""
    text = F.col(text_col) if isinstance(text_col, str) else text_col
    # Split into word / number / punctuation runs like a byte-level BPE
    # pre-tokenizer would.
    toks = F.regexp_extract_all(text, F.lit(r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"), 1)
    return F.size(toks)
