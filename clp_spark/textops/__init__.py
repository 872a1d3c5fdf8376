"""Large-scale training-data operators over document tables.

Beyond the reference's own operator set (SURVEY.md §2): deduplication
(exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding-cosine),
similarity search (brute-force + LSH-bucketed ANN), and text analysis
(language-ID, quality scores, token counts, fingerprints), plus the
curation steps around them: ExactSubstr span/paragraph dedup,
connected-components clustering, deterministic sampling (Bernoulli /
stratified quotas / per-domain caps), and PII redaction. All built
from JVM-side pyspark.sql.functions — no Python in the hot path.
"""

from clp_spark.textops.dedup import (
    connected_components,
    embedding_near_dup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dup_pairs,
    strip_duplicated_paragraphs,
    strip_duplicated_spans,
    word_shingles,
)
from clp_spark.textops.sampling import (
    cap_per_stratum,
    deterministic_sample,
    stratified_sample,
)
from clp_spark.textops.curate import curate_corpus
from clp_spark.textops.scrub import redact_pii
from clp_spark.textops.similarity import (
    brute_force_topk,
    ivf_read_topk,
    ivf_topk,
    ivf_write,
    lsh_bucketed_topk,
    quantized_dot,
)
from clp_spark.textops.stats import (
    fingerprint,
    lang_id,
    quality_scores,
    token_counts,
)

__all__ = [
    "brute_force_topk",
    "cap_per_stratum",
    "connected_components",
    "curate_corpus",
    "deterministic_sample",
    "redact_pii",
    "strip_duplicated_paragraphs",
    "strip_duplicated_spans",
    "stratified_sample",
    "embedding_near_dup_pairs",
    "exact_dedup",
    "fingerprint",
    "lang_id",
    "ivf_read_topk",
    "ivf_topk",
    "ivf_write",
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
