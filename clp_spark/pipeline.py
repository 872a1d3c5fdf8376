"""End-to-end compress job: pages → parse → dicts → encode → route → metrics.

Spark shape (SURVEY.md §3.1): one logical job —
  read pages → mapInPandas(tokenize+encode)            [narrow, no shuffle]
  → build logtype/var dicts (2 distinct aggs + stable-ID rank)
  → enrich (broadcast dict join / broadcast-map patch)  [no shuffle]
  → fan-out to per-sink parquet partitions (1 salted shuffle)
  → per-sink aggregates → metrics table

Checkpointing: the parse phase commits per url-hash bucket; dict/encode/
route phases commit as whole phases (their inputs are the committed
parse outputs, and dictionary IDs are deterministic, so a re-run
reproduces identical sinks — exactly-once counts under retry).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from clp_spark.checkpoint import RunManifest
from clp_spark.config import PipelineConfig
from clp_spark.dicts.build import build_logtype_dict, build_var_dict, encode_with_dicts
from clp_spark.parse.tokenizer import tokenize_df
from clp_spark.route.fanout import (
    add_sink_id,
    detect_hot_logtypes,
    route_to_sinks,
    sink_metrics,
    sink_var_cardinality,
)


def compress_df(
    pages: DataFrame,
    cfg: PipelineConfig | None = None,
    text_col: str = "text",
    passthrough: list[str] | None = None,
    sink_cols: tuple = ("logtype_id", "lang"),
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """In-memory compress: (encoded_with_sink, logtype_dict, var_dict).

    Same dataflow as `compress` minus checkpointing/persisted sinks —
    for search pipelines, tests, and the driver entry queries where the
    corpus is read, encoded, queried, and discarded in one job.
    """
    cfg = cfg or PipelineConfig()
    parsed = tokenize_df(pages, text_col=text_col, passthrough=passthrough).persist()
    lt_dict = build_logtype_dict(parsed, cfg.dict_id_partitions)
    v_dict = build_var_dict(parsed, cfg.dict_id_partitions)
    encoded = encode_with_dicts(parsed, lt_dict, v_dict)
    sink_cols = tuple(c for c in sink_cols if c in encoded.columns)
    encoded = add_sink_id(encoded, cfg.num_sinks, cols=sink_cols)
    return encoded, lt_dict, v_dict


def compress(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    cfg: PipelineConfig | None = None,
) -> dict:
    """Run (or resume) the full compress pipeline. Returns paths + stats."""
    cfg = cfg or PipelineConfig()
    manifest = RunManifest(out_dir)
    run_id = RunManifest.new_run_id()

    parsed_dir = os.path.join(out_dir, "parsed")
    sinks_dir = os.path.join(out_dir, "sinks")
    dicts_dir = os.path.join(out_dir, "dicts")
    metrics_dir = os.path.join(out_dir, "metrics")

    # schemas pinned up front so empty buckets / empty inputs read back fine
    parsed_schema = tokenize_df(pages.limit(0)).schema

    # ---- phase 1: parse (bucket-checkpointed) ----
    done = manifest.committed("parse")
    bucketed = pages.withColumn(
        "_bucket", F.pmod(F.xxhash64("url"), F.lit(cfg.num_checkpoint_buckets))
    )
    for b in range(cfg.num_checkpoint_buckets):
        if b in done:
            continue
        t0 = time.time()
        subset = bucketed.filter(F.col("_bucket") == b).drop("_bucket")
        parsed = tokenize_df(subset)
        path = os.path.join(parsed_dir, f"bucket={b}")
        parsed.write.mode("overwrite").option(
            "compression", cfg.compression_codec
        ).parquet(path)
        rows = spark.read.schema(parsed_schema).parquet(path).count()
        manifest.commit(
            "parse", b, run_id, rows_out=rows, wall_ms=int(1000 * (time.time() - t0))
        )

    parsed_all = spark.read.schema(parsed_schema).parquet(parsed_dir)

    # ---- phase 2: dictionaries (deterministic IDs at any parallelism) ----
    if "dicts" not in manifest.committed("dicts"):
        t0 = time.time()
        lt_dict = build_logtype_dict(parsed_all, cfg.dict_id_partitions)
        lt_dict.write.mode("overwrite").parquet(os.path.join(dicts_dir, "logtype"))
        v_dict = build_var_dict(parsed_all, cfg.dict_id_partitions)
        v_dict.write.mode("overwrite").parquet(os.path.join(dicts_dir, "var"))
        manifest.commit(
            "dicts",
            "dicts",
            run_id,
            logtype_cardinality=spark.read.parquet(os.path.join(dicts_dir, "logtype")).count(),
            var_cardinality=spark.read.parquet(os.path.join(dicts_dir, "var")).count(),
            wall_ms=int(1000 * (time.time() - t0)),
        )
    lt_dict = spark.read.parquet(os.path.join(dicts_dir, "logtype"))
    v_dict = spark.read.parquet(os.path.join(dicts_dir, "var"))

    # ---- phase 3: encode + route (salted fan-out, atomic overwrite) ----
    encoded_schema = None
    if "route" not in manifest.committed("route"):
        t0 = time.time()
        encoded = encode_with_dicts(parsed_all, lt_dict, v_dict)
        route_to_sinks(encoded, sinks_dir, cfg)
        encoded_schema = add_sink_id(encoded, cfg.num_sinks).schema
        manifest.commit("route", "route", run_id, wall_ms=int(1000 * (time.time() - t0)))
    if encoded_schema is None:
        encoded_schema = add_sink_id(
            encode_with_dicts(parsed_all.limit(0), lt_dict.limit(0), v_dict.limit(0)),
            cfg.num_sinks,
        ).schema

    encoded_sinks = spark.read.schema(encoded_schema).parquet(sinks_dir)

    # ---- phase 4: per-sink aggregates (the aggregate contract) ----
    if "metrics" not in manifest.committed("metrics"):
        t0 = time.time()
        m = sink_metrics(encoded_sinks).join(
            sink_var_cardinality(encoded_sinks), "sink_id", "left"
        ).na.fill({"var_cardinality": 0})
        m.write.mode("overwrite").parquet(metrics_dir)
        manifest.commit("metrics", "metrics", run_id, wall_ms=int(1000 * (time.time() - t0)))

    return {
        "run_id": run_id,
        "parsed": parsed_dir,
        "dicts": dicts_dir,
        "sinks": sinks_dir,
        "metrics": metrics_dir,
        "manifest": manifest.path,
    }
