"""Text analysis: token counts, quality scores, language-ID, fingerprints.

All pure pyspark.sql.functions column expressions (whole-stage codegen;
zero Python). Metrics are integers wherever a ratio would do — integer
outputs hash identically across engines, and a downstream filter can
cross-multiply (see dedup.py) instead of dividing.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# BPE-ish pre-tokenization: letter runs, single digits, single
# non-alphanumeric marks (GPT-2-style digit splitting, simplified).
# NOTE: embedded in a Spark SQL string literal, so backslashes are doubled
# ('\\s' in the literal → regex \s).
BPE_SPLIT_REGEX = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

# tiny deterministic marker sets for heuristic language-ID
LANG_MARKERS = {
    "en": ("the", "of", "and", "a", "is"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "est"),
    "es": ("el", "los", "y", "es", "las"),
}


def _sql_list(words) -> str:
    return ", ".join("'" + w + "'" for w in words)


def token_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_ws_tokens, n_bpe_tokens) — whitespace + BPE-ish counts."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.expr(f"size(split(trim({text_col}), '\\\\s+'))").alias("n_ws_tokens"),
        F.expr(
            f"size(regexp_extract_all({text_col}, '{BPE_SPLIT_REGEX}', 0))"
        ).alias("n_bpe_tokens"),
    )


def quality_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_chars, n_tokens, n_stopwords, n_punct, n_distinct_tokens).

    The classic quality heuristics (length, stopword density, punct
    density, vocabulary diversity) as exact integers; consumers derive
    ratios or filter by cross-multiplication.
    """
    toks = f"split(trim({text_col}), '\\\\s+')"
    return docs.select(
        F.col(id_col).alias("id"),
        F.length(text_col).alias("n_chars"),
        F.expr(f"size({toks})").alias("n_tokens"),
        F.expr(
            f"size(filter({toks}, t -> t IN ({_sql_list(STOPWORDS)})))"
        ).alias("n_stopwords"),
        F.expr(
            f"size(regexp_extract_all({text_col}, '[^A-Za-z0-9\\\\s]', 0))"
        ).alias("n_punct"),
        F.expr(f"size(array_distinct({toks}))").alias("n_distinct_tokens"),
    )


def lang_id(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, pred_lang) — marker-word language-ID with a fixed tie-break
    order (en > de > fr > es > und)."""
    toks = f"split(trim({text_col}), '\\\\s+')"
    scores = {
        lang: f"size(filter({toks}, t -> t IN ({_sql_list(ms)})))"
        for lang, ms in LANG_MARKERS.items()
    }
    s_en, s_de, s_fr, s_es = (scores[x] for x in ("en", "de", "fr", "es"))
    pred = (
        f"CASE WHEN ({s_en}) = 0 AND ({s_de}) = 0 AND ({s_fr}) = 0 AND ({s_es}) = 0 THEN 'und' "
        f"WHEN ({s_en}) >= ({s_de}) AND ({s_en}) >= ({s_fr}) AND ({s_en}) >= ({s_es}) THEN 'en' "
        f"WHEN ({s_de}) >= ({s_fr}) AND ({s_de}) >= ({s_es}) THEN 'de' "
        f"WHEN ({s_fr}) >= ({s_es}) THEN 'fr' ELSE 'es' END"
    )
    return docs.select(F.col(id_col).alias("id"), F.expr(pred).alias("pred_lang"))


def top_term(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, term, tf, df) — each document's most frequent token with its
    corpus document frequency (the integer core of TF-IDF: consumers
    rank by tf·log(N/df) or filter by cross-multiplication; keeping
    raw tf/df integers makes results engine-exact).

    Ties break by (higher tf, lower df, lexicographically smaller term).
    Two hash aggregates + one window rank; the per-term df join is a
    shuffle join on the term (broadcast when the vocabulary is small —
    AQE decides).
    """
    from pyspark.sql import Window

    toks = f"split(trim({text_col}), '\\\\s+')"
    words = docs.select(
        F.col(id_col).alias("id"), F.explode(F.expr(toks)).alias("term")
    )
    tf = words.groupBy("id", "term").agg(F.count("*").alias("tf"))
    df_ = words.select("id", "term").distinct().groupBy("term").agg(
        F.count("*").alias("df")
    )
    ranked = tf.join(df_, "term").withColumn(
        "_rk",
        F.row_number().over(
            Window.partitionBy("id").orderBy(
                F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
            )
        ),
    )
    return ranked.filter(F.col("_rk") == 1).select("id", "term", "tf", "df")


def fingerprint(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, fp) — rolling polynomial hash of the token sequence, mod a
    61-bit-safe prime. Order-sensitive (unlike a bag-of-words hash) so
    token swaps change the fingerprint."""
    toks = f"split(trim({text_col}), '\\\\s+')"
    per_tok = f"transform({toks}, t -> length(t)*131L + ascii(t))"
    fold = f"aggregate({per_tok}, 0L, (acc, x) -> (acc*1000003L + x) % 1000000007L)"
    return docs.select(F.col(id_col).alias("id"), F.expr(fold).alias("fp"))
