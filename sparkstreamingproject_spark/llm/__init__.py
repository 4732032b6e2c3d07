"""LLM-data-pipeline operators (the extension surface, SURVEY.md §7.5).

Deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding-cosine), similarity search (brute-force + LSH-bucketed ANN),
text analysis (token stats, quality, language-ID, fingerprinting), and
multimodal column plumbing. All hot paths are JVM-side built-ins
(higher-order array functions); Python appears only in the multimodal
decode stub (Arrow-batched ``mapInPandas``).
"""

from .dedup import (
    exact_dedup,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash,
    word_shingles,
)
from .similarity import brute_force_topk, embedding_near_dup_pairs, lsh_bucket
from .textstats import language_id, quality_score, token_stats

__all__ = [
    "word_shingles", "exact_dedup", "minhash_signatures",
    "lsh_candidate_pairs", "jaccard_pairs", "simhash",
    "brute_force_topk", "embedding_near_dup_pairs", "lsh_bucket",
    "token_stats", "quality_score", "language_id",
]
