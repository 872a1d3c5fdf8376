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


def _lit_float_array(vec) -> str:
    return "array(" + ",".join(f"cast({float(x)} as float)" for x in vec) + ")"


def ivf_centroids(
    emb: DataFrame,
    n_cells: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Deterministic IVF coarse quantizer: the `n_cells` dataset vectors
    ranked first by md5(id-as-string) — a seedless pseudo-random sample
    that any engine reproduces bit-exactly (no RNG, no kmeans iterations,
    so the index build stays a single pass and the oracle stays pure
    SQL). Returned sorted by id so argmax tie-breaks are well-defined.

    Centroids are a broadcast-sized object by construction (n_cells is
    an index parameter, not data-dependent): collecting them to the
    driver is the standard IVF shape at any data scale."""
    rows = (
        emb.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
        .orderBy(F.md5(F.col("cid").cast("string")), F.col("cid"))
        .limit(n_cells)
        .collect()
    )
    return sorted((int(r["cid"]), list(r["cv"])) for r in rows)


def ivf_cell_expr(
    vec_col: str,
    centroids: list[tuple[int, list[float]]],
    scale: int = 1000,
) -> str:
    """SQL expr: the centroid id whose quantized dot product with
    `vec_col` is largest (ties → smallest centroid id, since the array
    is ordered by id and array_position takes the first max). A pure
    map-side expression — assignment shuffles nothing; written as a
    partition/bucket column at ingest it makes every probe a
    partition-pruned read (the IVF analog of lsh_bucket_expr)."""
    dots = ",".join(quantized_dot(vec_col, _lit_float_array(v), scale) for _, v in centroids)
    cids = ",".join(str(c) for c, _ in centroids)
    # bind the dots array ONCE via a single-element transform lambda
    # (each centroid dot is itself an aggregate over the vector) instead
    # of interpolating it into both array_position and array_max —
    # halves the per-row assignment cost
    return (
        f"element_at(transform(array(array({dots})), d -> "
        f"element_at(array({cids}), "
        f"cast(array_position(d, array_max(d)) as int))), 1)"
    )


def ivf_write(
    emb: DataFrame,
    out_dir: str,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> list[tuple[int, list[float]]]:
    """Materialize the IVF index: the embedding table written
    cell-partitioned (`cell=<centroid id>/` directories) with the
    centroid list saved alongside, so a probe is a PARTITION-PRUNED
    read — Spark lists only the nprobe surviving directories and never
    opens the rest. This is the ingest-time step `ivf_cell_expr`'s
    docstring promises; at 100 TB the probe cost is
    ~nprobe/n_cells · data, paid in skipped IO rather than a filter.

    Cell assignment is the same map-side expression the query path
    uses, so write and probe agree bit-exactly. Returns the centroids.
    """
    import json as _json
    import os as _os

    cents = ivf_centroids(emb, n_cells, id_col, vec_col)
    cell = ivf_cell_expr(vec_col, cents, scale)
    (
        emb.withColumn("cell", F.expr(cell))
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(out_dir)
    )
    meta = {
        "scale": scale,
        "vec_col": vec_col,
        "id_col": id_col,
        "centroids": [[c, [float(x) for x in v]] for c, v in cents],
    }
    with open(_os.path.join(out_dir, "_ivf_centroids.json"), "w") as fh:
        _json.dump(meta, fh)
    return cents


def _probe_cells(centroids, query_vec, scale: int, nprobe: int) -> list:
    """The `nprobe` centroid ids nearest the query, computed exactly
    like the SQL side: same floor(x*scale+0.5) quantization, exact
    integer dots, ties to the smaller centroid id. Shared by the
    in-memory and materialized-index paths so they cannot drift."""
    import math

    qq = [math.floor(float(x) * scale + 0.5) for x in query_vec]
    scored = []
    for cid, cv in centroids:
        cq = [math.floor(float(x) * scale + 0.5) for x in cv]
        scored.append((-sum(a * b for a, b in zip(qq, cq)), cid))
    return [cid for _, cid in sorted(scored)[:nprobe]]


def ivf_read_topk(
    spark,
    index_dir: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """ANN top-k over an `ivf_write` index: pick the `nprobe` centroids
    nearest the query on the driver (centroid list is index metadata,
    not data), then scan ONLY those cell partitions — the isin filter
    lands in the scan's PartitionFilters, so unprobed cells cost
    nothing, not even a file listing. Exact quantized dot product and
    TakeOrderedAndProject inside the survivors."""
    import json as _json
    import os as _os

    with open(_os.path.join(index_dir, "_ivf_centroids.json")) as fh:
        meta = _json.load(fh)
    scale = meta["scale"]
    probe = _probe_cells(meta["centroids"], query_vec, scale, nprobe)

    qlit = _lit_float_array(query_vec)
    return (
        spark.read.parquet(index_dir)
        .filter(F.col("cell").isin(probe))
        .select(
            F.col(meta["id_col"]).alias("vec_id"),
            F.expr(quantized_dot(meta["vec_col"], qlit, scale)).alias("dot"),
        )
        .orderBy(F.col("dot").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def ivf_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """IVF-flat ANN top-k: assign every vector to its nearest of
    `n_cells` deterministic centroids, scan only the `nprobe` cells
    nearest the query, exact quantized dot product inside them
    (scans ~nprobe/n_cells of the data; recall tunable via nprobe)."""
    cents = ivf_centroids(emb, n_cells, id_col, vec_col)
    probe = _probe_cells(cents, query_vec, scale, nprobe)
    cell = ivf_cell_expr(vec_col, cents, scale)
    qlit = _lit_float_array(query_vec)
    return (
        emb.withColumn("_cell", F.expr(cell))
        .filter(F.col("_cell").isin(probe))
        .select(
            F.col(id_col).alias("vec_id"),
            F.expr(quantized_dot(vec_col, qlit, scale)).alias("dot"),
        )
        .orderBy(F.col("dot").desc(), F.col("vec_id").asc())
        .limit(k)
    )
