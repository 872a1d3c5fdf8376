"""Small shared utilities.

`spread` fixes Spark's small-file parallelism trap: a table that is one
0.5 MB parquet file reads as ONE input split, so every narrow per-row
stage downstream (tokenize, shingle, hash) runs on one core no matter
how many the cluster has. At production scale (TBs → thousands of
splits) the guard is a no-op; it only repartitions when the scan
delivers fewer splits than the cluster has cores, so it never adds a
shuffle to a job that is already parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition `df` up to the cluster's default parallelism iff the
    current plan yields fewer partitions; identity otherwise.

    Round-robin repartition is safe here because every caller is
    order-independent (hash aggregates, keyed joins, per-row maps with
    explicit keys); dictionary IDs stay deterministic because they are
    value-sorted ranks, not partition-dependent (dicts/build.py).
    """
    spark = df.sparkSession
    if min_partitions is None:
        min_partitions = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= min_partitions:
        return df
    return df.repartition(min_partitions)
