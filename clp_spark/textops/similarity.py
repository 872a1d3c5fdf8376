"""Similarity search over an embedding column (`array<float>`).

Baseline: brute-force top-k by quantized integer dot product (exact,
engine-portable — see dedup.py on why integers). Scale path: LSH
bucketing with deterministic md5-derived hyperplanes: each vector maps
to a signature bucket; the query probes only its bucket (and optional
neighbor probes), turning a full scan into a bucket-pruned scan. On a
cluster the bucket column would be a partition/sort key so the probe is
a partition-pruned read.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def quantized_dot(vec_a_expr: str, vec_b_expr: str, scale: int = 1000) -> str:
    """SQL expr: integer dot product of two float vectors after
    floor(x·scale+0.5) quantization. Bit-identical in any engine."""
    qa = f"transform({vec_a_expr}, x -> cast(floor(cast(x as double)*{scale}+0.5) as bigint))"
    qb = f"transform({vec_b_expr}, x -> cast(floor(cast(x as double)*{scale}+0.5) as bigint))"
    return f"aggregate(zip_with({qa}, {qb}, (x, y) -> x*y), 0L, (acc, v) -> acc + v)"


def brute_force_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """(vec_id, dot) — top-k by quantized dot product vs a literal query
    vector. orderBy+limit compiles to TakeOrderedAndProject (bounded
    heap per partition + driver merge — no global sort)."""
    qlit = "array(" + ",".join(f"cast({float(x)} as float)" for x in query_vec) + ")"
    return (
        emb.select(
            F.col(id_col).alias("vec_id"),
            F.expr(quantized_dot(vec_col, qlit, scale)).alias("dot"),
        )
        .orderBy(F.col("dot").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def _hyperplane_sign_expr(vec_col: str, plane: int, dim: int, scale: int) -> str:
    """Deterministic ±1 hyperplane from md5(plane:dim_index): sign bit of
    the 60-bit hash decides the weight. Returns the sign of <v, h_p>."""
    # weight for dim i: +1 if bit0 of md5 hash of (plane, i) else -1
    w = (
        f"transform(sequence(0, {dim - 1}), i -> "
        f"CASE WHEN (cast(conv(substr(md5(concat('{plane}:', i)),1,15),16,10) as bigint) & 1) = 1 "
        f"THEN 1L ELSE -1L END)"
    )
    qv = f"transform({vec_col}, x -> cast(floor(cast(x as double)*{scale}+0.5) as bigint))"
    dot = f"aggregate(zip_with({qv}, {w}, (x, y) -> x*y), 0L, (acc, v) -> acc + v)"
    return f"CASE WHEN ({dot}) >= 0 THEN 1L ELSE 0L END"


def lsh_bucket_expr(vec_col: str, num_planes: int, dim: int, scale: int = 1000) -> str:
    """SQL expr: LSH bucket id = sign-bit signature over `num_planes`
    deterministic hyperplanes (random-hyperplane LSH for cosine)."""
    parts = [
        f"(({_hyperplane_sign_expr(vec_col, p, dim, scale)}) * {1 << p})"
        for p in range(num_planes)
    ]
    return " + ".join(parts)


def lsh_bucketed_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
    multiprobe_hamming: int = 1,
) -> DataFrame:
    """ANN top-k: probe only buckets within `multiprobe_hamming` sign
    flips of the query's bucket, then exact dot product inside them.

    With B = 2^num_planes buckets this scans ~(1 + planes)/B of the
    data; recall is tunable via num_planes / multiprobe_hamming. The
    bucket filter is a pushable integer predicate — on a bucketed/
    partitioned table it prunes files before any row is read.
    """
    dim = len(query_vec)
    bucket = lsh_bucket_expr(vec_col, num_planes, dim, scale)
    with_bucket = emb.withColumn("_bucket", F.expr(bucket))

    qlit = "array(" + ",".join(f"cast({float(x)} as float)" for x in query_vec) + ")"
    # compute the query's own bucket with the same expression, via a 1-row df
    one = emb.sparkSession.range(1).select(F.expr(qlit).alias("qv"))
    qbucket = one.select(
        F.expr(lsh_bucket_expr("qv", num_planes, dim, scale)).alias("b")
    ).collect()[0]["b"]

    probes = [qbucket]
    if multiprobe_hamming >= 1:
        probes += [qbucket ^ (1 << p) for p in range(num_planes)]

    return (
        with_bucket.filter(F.col("_bucket").isin(probes))
        .select(
            F.col(id_col).alias("vec_id"),
            F.expr(quantized_dot(vec_col, qlit, scale)).alias("dot"),
        )
        .orderBy(F.col("dot").desc(), F.col("vec_id").asc())
        .limit(k)
    )
