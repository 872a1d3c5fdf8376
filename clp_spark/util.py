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

import os
import sys
import time
from collections import OrderedDict
from contextlib import contextmanager

from pyspark.sql import DataFrame

_TIMING = os.environ.get("CLP_TIMING", "") not in ("", "0")


@contextmanager
def step_timer(label: str):
    """Env-gated (CLP_TIMING=1) wall-clock probe around a driver-side
    step. Prints to stderr so the paired scaling runs capture it in
    their per-run stderr files; no-op (and no overhead) when unset.
    Used to attribute the serial residue that Amdahl charges to every
    cluster size — the N→4N efficiency killer."""
    if not _TIMING:
        yield
        return
    t0 = time.time()
    try:
        yield
    finally:
        print(
            f"[clp-timing] {label}: {time.time() - t0:.2f}s",
            file=sys.stderr,
            flush=True,
        )


class LruCache(OrderedDict):
    """Tiny bounded cache for per-session query-time state (collected
    dictionaries, broadcast handles). Keys include id(DataFrame); the
    cached tuple pins the DataFrame so the id stays valid. Eviction just
    drops the reference — Spark's ContextCleaner reclaims any broadcast
    once the driver-side handle (and the plans that captured it) are
    GC'd, so nothing is pinned forever (round-2 leak fix)."""

    def __init__(self, maxsize: int = 8):
        super().__init__()
        self.maxsize = maxsize

    def get(self, key, default=None):
        if key in self:
            self.move_to_end(key)
            return self[key]
        return default

    def put(self, key, value) -> None:
        self[key] = value
        self.move_to_end(key)
        while len(self) > self.maxsize:
            self.popitem(last=False)


def df_cache_key(df: DataFrame):
    """Stable cache key for a dictionary DataFrame.

    File-backed frames key on their resolved input-file list (stable
    across re-reads of the same path AND changed when the files are
    rewritten — a recompress into the same dir must not serve stale
    broadcasts). In-memory frames fall back to id(df); that is safe
    ONLY because every cache stores the DataFrame in its value, pinning
    the object so its id cannot be reused while the entry lives."""
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if files:
        return ("files", hash(tuple(sorted(files))))
    return ("id", id(df))


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


def write_driver_table(tbl, dirpath: str, compression: str = "zstd") -> None:
    """Single-file parquet dataset written driver-side with pyarrow —
    the shared bottom half of every driver-side bookkeeping write
    (dictionaries, manifests, metrics). The data is already on the
    driver and tiny; a Spark write job costs multi-stage scheduling
    seconds that Amdahl charges to every cluster size. The filesystem
    is resolved from the URI so s3://, hdfs://, gs:// paths go to the
    remote store; Spark reads the directory back exactly like its own
    output."""
    import pyarrow.fs as pafs
    import pyarrow.parquet as pq

    fs, resolved = pafs.FileSystem.from_uri(dirpath)
    try:
        fs.delete_dir(resolved)
    except (FileNotFoundError, OSError):
        pass
    fs.create_dir(resolved, recursive=True)
    with fs.open_output_stream(f"{resolved}/part-00000.zstd.parquet") as out:
        pq.write_table(tbl, out, compression=compression)
