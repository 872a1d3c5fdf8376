"""Large-scale training-data operators over document tables.

Beyond the reference's own operator set (SURVEY.md §2): deduplication
(exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding-cosine),
similarity search (brute-force + LSH-bucketed ANN), and text analysis
(language-ID, quality scores, token counts, fingerprints). All built
from JVM-side pyspark.sql.functions — no Python in the hot path.
"""

from clp_spark.textops.dedup import (
    embedding_near_dup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dup_pairs,
    word_shingles,
)
from clp_spark.textops.similarity import brute_force_topk, lsh_bucketed_topk, quantized_dot
from clp_spark.textops.stats import (
    fingerprint,
    lang_id,
    quality_scores,
    token_counts,
)

__all__ = [
    "brute_force_topk",
    "embedding_near_dup_pairs",
    "exact_dedup",
    "fingerprint",
    "lang_id",
    "lsh_bucketed_topk",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "quality_scores",
    "quantized_dot",
    "simhash",
    "simhash_near_dup_pairs",
    "token_counts",
    "word_shingles",
]
