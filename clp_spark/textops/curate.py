"""End-to-end corpus curation: the composed training-data pipeline.

One call chains the curation stages a web corpus actually ships
through before pre-training — near-duplicate collapse to canonical
representatives, language-quota sampling, and per-domain caps — each
stage the already-tested operator (textops/dedup.py, sampling.py), so
the composition inherits their determinism: the output set is a pure
function of the input rows, identical at any parallelism, re-run, or
cluster size. Scale shape: the dedup stage is the only heavy part
(pair discovery + components); sampling is a narrow scan-pushed
filter and the cap two bounded windows.

Dedup methods:
- "jaccard": exact n-gram-Jaccard pairs via the shingle self-join.
  Exact, but the self-join fans out O(df²) per shingle — the
  max_shingle_df cap (default 1024, enforced by anti-joining the tiny
  over-cap complement) bounds that on web corpora where stop-shingles
  ("of the …") occur in millions of documents. Passing
  max_shingle_df=None is an explicit opt-out for small corpora only.
- "minhash": banded MinHash-LSH candidates + exact-Jaccard verify
  (dedup.minhash_lsh_pairs) — the 100 TB-scale path: candidate count
  is bounded by the banding, oversized buckets take a distributed
  self-join, and the verify keeps the output exact over the recalled
  candidates.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from clp_spark.textops.dedup import (
    connected_components,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from clp_spark.textops.sampling import cap_per_stratum, stratified_sample

__all__ = ["curate_corpus"]


def curate_corpus(
    docs: DataFrame,
    *,
    quotas: dict[str, tuple[int, int]],
    default_rate: tuple[int, int] = (0, 1),
    cap_k: int = 1000,
    ngram: int = 3,
    jaccard: tuple[int, int] = (1, 2),
    method: str = "jaccard",
    max_shingle_df: int | None = 1024,
    num_hashes: int = 16,
    bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    source_col: str = "source",
    salt: int = 0,
) -> DataFrame:
    """documents → deduped, language-balanced, domain-capped corpus.

    1. near-dup collapse: candidate pairs (exact Jaccard under a
       shingle-df cap, or MinHash-LSH + verify — see module docstring)
       → connected components → keep only each component's canonical
       (minimum-id) representative;
    2. stratified sampling: per-language keep rates (exact integer
       thresholds over the doc-id hash);
    3. per-domain cap: at most cap_k surviving docs per source.
    """
    if method == "jaccard":
        pairs = ngram_jaccard_pairs(
            docs, n=ngram, threshold=jaccard, id_col=id_col,
            text_col=text_col, max_shingle_df=max_shingle_df,
        )
    elif method == "minhash":
        pairs = minhash_lsh_pairs(
            docs, num_hashes=num_hashes, bands=bands, n=ngram,
            threshold=jaccard, id_col=id_col, text_col=text_col,
        )
    else:
        raise ValueError(f"unknown dedup method {method!r}")
    reps = connected_components(pairs, docs.select(id_col), id_col=id_col)
    keepers = reps.filter(F.col("rep") == F.col("id")).select(
        F.col("id").alias(id_col)
    )
    kept = docs.join(keepers, id_col, "left_semi")
    sampled = stratified_sample(
        kept, quotas, strata_col=lang_col, default=default_rate,
        id_col=id_col, salt=salt,
    )
    return cap_per_stratum(sampled, cap_k, strata_col=source_col, id_col=id_col)
