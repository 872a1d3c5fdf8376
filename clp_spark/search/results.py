"""Persisted results cache for search jobs.

The reference streams matches into a MongoDB results-cache collection
keyed by the search job
(/root/reference/components/core/src/clp/clo/OutputHandler.hpp:121
ResultsCacheClient; result fields at
clp_s/archive_constants.hpp:55-62 — original path, message, timestamp).
Spark analog: a partitioned parquet results table — one partition per
query id — written atomically per query (overwrite of that partition),
so re-running a search job is idempotent and the UI/API layer reads a
plain table.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def query_id(query: str, ignore_case: bool = False) -> str:
    """Stable id for a query string (the job key)."""
    return hashlib.md5(f"{int(ignore_case)}:{query}".encode()).hexdigest()[:16]


def write_results(
    matches: DataFrame,
    results_dir: str,
    query: str,
    ignore_case: bool = False,
) -> str:
    """Append/refresh one query's matches in the results table.

    Returns the query id. The write targets only this query's partition
    (dynamic overwrite) — retries replace, never duplicate."""
    qid = query_id(query, ignore_case)
    (
        matches.withColumn("query_id", F.lit(qid))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("query_id")
        .parquet(results_dir)
    )
    return qid


def read_results(
    spark: SparkSession, results_dir: str, query: str | None = None,
    ignore_case: bool = False,
) -> DataFrame:
    """All cached results, or one query's (partition-pruned read)."""
    df = spark.read.parquet(results_dir)
    if query is not None:
        df = df.filter(F.col("query_id") == query_id(query, ignore_case))
    return df


def has_results(results_dir: str, query: str, ignore_case: bool = False) -> bool:
    return os.path.isdir(
        os.path.join(results_dir, f"query_id={query_id(query, ignore_case)}")
    )
