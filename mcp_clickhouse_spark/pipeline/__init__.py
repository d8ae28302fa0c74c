"""LLM-training-data pipeline operators (beyond the reference surface).

The reference exposes none of these; they are the north-star extensions
(BASELINE.json): deduplication (exact, MinHash-LSH, SimHash, n-gram
Jaccard, embedding cosine), similarity search (brute-force + LSH-bucketed
ANN), text analysis (lang-id, quality, tokens, fingerprints), and multimodal
binary-column plumbing. All designed partition-parallel: no driver-side
collect anywhere.
"""

from mcp_clickhouse_spark.pipeline.chunking import (  # noqa: F401
    chunk_documents,
    decontaminate,
    pack_sequences,
)
from mcp_clickhouse_spark.pipeline.dedup import (  # noqa: F401
    exact_dedup,
    incremental_dedup,
    minhash_signatures,
    minhash_lsh_candidates,
    simhash_64,
    simhash_near_dups,
    jaccard_verify,
    release_persisted,
)
from mcp_clickhouse_spark.pipeline.similarity import (  # noqa: F401
    cosine_similarity_col,
    embedding_neardup_pairs,
    brute_force_topk,
    lsh_bucketed_topk,
)
from mcp_clickhouse_spark.pipeline.text import (  # noqa: F401
    with_text_stats,
    quality_score_col,
    language_id_col,
    fingerprint_col,
    repetition_filters,
    scrub_pii,
)
