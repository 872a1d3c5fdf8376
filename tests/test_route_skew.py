"""Hot-template skew handling in the route fan-out (north-rule item).

The reference's analog concern: one Zipf-heavy logtype dominating a
sink would serialize the whole sink write behind one task. The route
shuffle defuses this with a row-hash tiebreaker inside a range
partition (route/fanout.py route_to_sinks): rows equal on every range
key — i.e. one hot (sink, seg, logtype) group — are split across
contiguous partitions by the tiebreaker, so write tasks stay row-
balanced at ANY parallelism. These tests pin that property.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from clp_spark.config import PipelineConfig
from clp_spark.route.fanout import route_to_sinks


def _skewed_encoded(spark, n=40_000, hot_share=0.8, hot_id=7):
    """Minimal encoded-shaped frame: one logtype carries `hot_share` of
    all rows, everything lands in one (sink, seg) — the worst case for
    a key-hash shuffle (single key → single write task)."""
    cut = int(n * hot_share)
    return spark.range(n).select(
        F.concat(F.lit("http://h/"), F.col("id")).alias("url"),
        F.when(F.col("id") < cut, F.lit(hot_id))
        .otherwise(F.pmod(F.col("id"), F.lit(40)) + 100)
        .alias("logtype_id"),
        F.lit(0).alias("sink_id"),
        F.lit(0).alias("seg_id"),
        F.array(F.col("id")).alias("encoded_vars"),
        F.array().cast("array<long>").alias("dict_var_ids"),
    )


def _file_row_counts(sink_dir):
    counts = {}
    for root, _dirs, files in os.walk(sink_dir):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                counts[p] = pq.ParquetFile(p).metadata.num_rows
    return counts


def test_hot_logtype_spreads_across_write_tasks(spark, tmp_path):
    out = str(tmp_path / "sinks")
    cfg = PipelineConfig(shuffle_partitions=8)
    df = _skewed_encoded(spark)
    route_to_sinks(df, out, cfg, presinked=True)

    counts = _file_row_counts(out)
    total = sum(counts.values())
    assert total == 40_000
    # the single hot (sink, seg, logtype) group must NOT serialize into
    # one task: with 8 range partitions over 40k rows the write comes
    # out as multiple files, and no file holds a straggler share
    assert len(counts) >= 4, counts
    mean = total / len(counts)
    assert max(counts.values()) <= 2 * mean, counts

    # the hot logtype itself is split across several files (the salt
    # tiebreaker inside the range partition), not clustered into one
    hot_files = [
        p
        for p in counts
        if pq.read_table(p, columns=["logtype_id"])
        .column("logtype_id")
        .to_pylist()
        .count(7)
        > 0
    ]
    assert len(hot_files) >= 4, hot_files


def test_routed_rows_identical_at_two_parallelism_levels(spark, tmp_path):
    """Routed-row equality: the same input routed with different
    shuffle_partitions lands the same (url → sink_id, seg_id) mapping
    and the same per-sink row multiset — file layout is the only thing
    allowed to differ (the north rule's routed-row equality contract)."""
    df = _skewed_encoded(spark, n=10_000)
    outs = []
    for parts in (4, 16):
        out = str(tmp_path / f"s{parts}")
        route_to_sinks(df, out, PipelineConfig(shuffle_partitions=parts), presinked=True)
        back = (
            spark.read.parquet(out)
            .select("url", "sink_id", "seg_id", "logtype_id")
            .orderBy("url")
            .collect()
        )
        outs.append([tuple(r) for r in back])
    assert outs[0] == outs[1]
