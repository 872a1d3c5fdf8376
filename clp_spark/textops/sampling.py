"""Deterministic corpus sampling for training-data mixes.

Spark's own `df.sample` draws from a per-partition RNG stream, so
membership depends on partition count and row order — re-runs, retries,
and different cluster sizes pick DIFFERENT rows, which breaks resumable
pipelines and exact oracle checks. Here membership is a pure function
of the row id: keep iff h60(salt:id) < p/q · 2⁶⁰, with the 60-bit md5
hash the dedup operators already use (textops/dedup.py _h60 — identical
in Spark and DuckDB SQL, so samples are exactly reproducible anywhere).
The threshold is computed exactly in Python integers (no float rate),
so the sample is bit-stable at any parallelism — the same property the
pipeline's value-sorted dictionary IDs guarantee (north-rule exactness
across cluster sizes).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from clp_spark.textops.dedup import _h60

__all__ = [
    "cap_per_stratum",
    "deterministic_sample",
    "sample_threshold",
    "stratified_sample",
]

_H60_MAX = 1 << 60


def sample_threshold(rate: tuple[int, int]) -> int:
    """Exact integer keep-threshold for rate p/q: keep iff h < ⌊p·2⁶⁰/q⌋.
    (h is uniform on [0, 2⁶⁰), so the kept fraction is p/q up to 2⁻⁶⁰.)"""
    p, q = rate
    if not (0 <= p <= q and q > 0):
        raise ValueError(f"rate must be 0 <= p/q <= 1, got {p}/{q}")
    return (p * _H60_MAX) // q


def deterministic_sample(
    df: DataFrame,
    rate: tuple[int, int],
    id_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Keep a deterministic Bernoulli(p/q) sample keyed on the row id.
    Pure narrow filter — no shuffle, pushed to the scan."""
    h = _h60(f"cast({id_col} as string)", salt)
    return df.filter(F.expr(h) < F.lit(sample_threshold(rate)))


def stratified_sample(
    df: DataFrame,
    quotas: dict[str, tuple[int, int]],
    strata_col: str = "lang",
    default: tuple[int, int] = (0, 1),
    id_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Per-stratum deterministic rates — the language-balancing step of
    a training-data mix (e.g. keep 1/2 of en, 1/4 of de, drop the rest).
    One narrow filter: CASE over the stratum picks the threshold, the
    id hash decides membership. No shuffle, no RNG state. The per-
    stratum branches are built as Column ops (F.when + F.lit), not SQL
    text, so stratum keys containing quotes or other SQL metacharacters
    are handled verbatim."""
    h = _h60(f"cast({id_col} as string)", salt)
    thr = None
    for k, v in sorted(quotas.items()):
        cond = F.col(strata_col) == F.lit(k)
        t = F.lit(sample_threshold(v))
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    default_t = F.lit(sample_threshold(default))
    thr = default_t if thr is None else thr.otherwise(default_t)
    return df.filter(F.expr(h) < thr)


def cap_per_stratum(
    df: DataFrame,
    k: int,
    strata_col: str = "source",
    id_col: str = "doc_id",
    presalt_buckets: int = 32,
) -> DataFrame:
    """Keep at most k rows per stratum — the per-domain cap of web-corpus
    curation (bounds any single site's share of the training mix).
    Deterministic: survivors are the k smallest ids per stratum, so the
    result is identical at any parallelism.

    A single window over the stratum key puts a hot domain's entire row
    set on ONE task — the same balls-in-bins straggler the route phase
    hit at high parallelism (BENCH.md). So the cap runs in two phases:
    a pre-cap windowed over (stratum, hash(id) % B) spreads any hot
    stratum across B tasks and emits ≤ k rows per bucket, then the
    exact window runs over ≤ k·B rows per stratum. Correct because the
    global k smallest ids are each among the k smallest of their own
    bucket. presalt_buckets=1 degenerates to the single-window plan."""
    from pyspark.sql import Window

    cur = df
    if presalt_buckets > 1:
        pre = Window.partitionBy(
            strata_col, F.pmod(F.xxhash64(F.col(id_col)), F.lit(presalt_buckets))
        ).orderBy(F.col(id_col).asc())
        cur = (
            cur.withColumn("_prn", F.row_number().over(pre))
            .filter(F.col("_prn") <= k)
            .drop("_prn")
        )
    w = Window.partitionBy(strata_col).orderBy(F.col(id_col).asc())
    return (
        cur.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
