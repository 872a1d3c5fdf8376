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
from clp_spark.dicts.build import (
    LOGTYPE_DICT_ARROW_SCHEMA,
    VAR_DICT_ARROW_SCHEMA,
    build_dicts_small,
    build_dicts_small_pandas,
    build_logtype_dict,
    build_var_dict,
    encode_with_dicts,
    encode_with_maps,
    write_dict_parquet,
)
from clp_spark.parse.tokenizer import tokenize_df
from clp_spark.util import spread
from clp_spark.route.fanout import (
    add_seg_id,
    add_sink_id,
    hot_logtypes_from_dict,
    route_to_sinks,
    segment_summary,
    sink_metrics,
    sink_var_cardinality,
)


def _parse_phase(
    pages: DataFrame,
    cfg: PipelineConfig,
    text_col: str,
    passthrough: list[str] | None,
) -> DataFrame:
    """Parse stage: optionally split off the leading timestamp
    (TimestampPattern.cpp / MessageParser.cpp:95+ analog — pattern id,
    epoch-ms, and prefix ride with the row; the tokenizer then sees only
    the message body), then tokenize. Both maps are narrow — no
    shuffle."""
    if not cfg.parse_timestamps:
        return tokenize_df(spread(pages), text_col=text_col, passthrough=passthrough)
    from clp_spark.functions.timestamps import extract_timestamp_df

    keep = (
        list(passthrough)
        if passthrough is not None
        else [c for c in ("url", "warc_ts", "lang") if c in pages.columns]
    )
    with_ts = extract_timestamp_df(spread(pages), text_col=text_col, keep=keep)
    return tokenize_df(
        with_ts,
        text_col="rest",
        passthrough=keep + ["ts_pattern_id", "ts_ms", "ts_prefix", "ts_tz"],
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
    parsed = _parse_phase(pages, cfg, text_col, passthrough).persist()
    small = build_dicts_small(parsed, cfg.driver_dict_cap)
    if small is not None:
        lt_dict, v_dict, lt_map, v_map = small
        encoded = encode_with_maps(parsed, lt_map, v_map)
    else:
        lt_dict = build_logtype_dict(parsed, cfg.dict_id_partitions)
        v_dict = build_var_dict(parsed, cfg.dict_id_partitions)
        encoded = encode_with_dicts(parsed, lt_dict, v_dict, cfg.driver_dict_cap)
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
    parsed_schema = _parse_phase(pages.limit(0), cfg, "text", None).schema

    # ---- phase 1: parse (bucket-checkpointed, ONE input pass) ----
    # All uncommitted buckets are written in a single scan via
    # partitionBy + dynamic partition overwrite (committed bucket dirs
    # are untouched; uncommitted garbage from a crashed run is
    # overwritten). Bucket commits are recorded only after the write
    # succeeds, so a mid-write crash re-runs exactly the uncommitted set.
    done = manifest.committed("parse")
    todo = [b for b in range(cfg.num_checkpoint_buckets) if b not in done]
    if todo:
        t0 = time.time()
        bucketed = spread(pages).withColumn(
            "bucket", F.pmod(F.xxhash64("url"), F.lit(cfg.num_checkpoint_buckets))
        )
        if len(todo) < cfg.num_checkpoint_buckets:
            bucketed = bucketed.filter(F.col("bucket").isin(todo))
        passthrough = [
            c for c in ("url", "warc_ts", "lang") if c in pages.columns
        ] + ["bucket"]
        parsed = _parse_phase(bucketed, cfg, "text", passthrough)
        # per-bucket row counts ride along with the write as observed
        # metrics — no second scan of the written output (the read-back
        # count job was a fixed serial cost charged to every cluster size)
        from pyspark.sql import Observation

        obs = Observation(f"parse_counts_{run_id}")
        parsed = parsed.observe(
            obs, *[F.count_if(F.col("bucket") == b).alias(f"b{b}") for b in todo]
        )
        (
            parsed.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .option("compression", cfg.compression_codec)
            .partitionBy("bucket")
            .parquet(parsed_dir)
        )
        wall_ms = int(1000 * (time.time() - t0))
        counts = obs.get
        for b in todo:
            manifest.commit(
                "parse", b, run_id, rows_out=int(counts.get(f"b{b}", 0)), wall_ms=wall_ms
            )

    parsed_all = spark.read.schema(parsed_schema).parquet(parsed_dir)

    # ---- phase 2: dictionaries (deterministic IDs at any parallelism) ----
    # Fast path: dictionaries are CLP-small → one collect per dict,
    # driver-side value-sort. Fallback: fully distributed range-ranked
    # IDs. Both produce the same value-sorted-rank dictionaries.
    lt_map = v_map = lt_pdf = None
    if "dicts" not in manifest.committed("dicts"):
        t0 = time.time()
        small = build_dicts_small_pandas(parsed_all, cfg.driver_dict_cap)
        if small is not None:
            lt_pdf, v_pdf, lt_map, v_map = small
            write_dict_parquet(
                lt_pdf,
                os.path.join(dicts_dir, "logtype"),
                LOGTYPE_DICT_ARROW_SCHEMA,
                cfg.compression_codec,
            )
            write_dict_parquet(
                v_pdf,
                os.path.join(dicts_dir, "var"),
                VAR_DICT_ARROW_SCHEMA,
                cfg.compression_codec,
            )
            lt_card, v_card = len(lt_map), len(v_map)
        else:
            build_logtype_dict(parsed_all, cfg.dict_id_partitions).write.mode(
                "overwrite"
            ).parquet(os.path.join(dicts_dir, "logtype"))
            build_var_dict(parsed_all, cfg.dict_id_partitions).write.mode(
                "overwrite"
            ).parquet(os.path.join(dicts_dir, "var"))
            lt_card = spark.read.parquet(os.path.join(dicts_dir, "logtype")).count()
            v_card = spark.read.parquet(os.path.join(dicts_dir, "var")).count()
        manifest.commit(
            "dicts",
            "dicts",
            run_id,
            logtype_cardinality=lt_card,
            var_cardinality=v_card,
            wall_ms=int(1000 * (time.time() - t0)),
        )
    lt_dict = spark.read.parquet(os.path.join(dicts_dir, "logtype"))
    v_dict = spark.read.parquet(os.path.join(dicts_dir, "var"))

    # ---- phase 3: encode + route (salted fan-out, atomic overwrite) ----
    encoded_schema = None
    if "route" not in manifest.committed("route"):
        t0 = time.time()
        if lt_map is None:
            # resume path: reload dictionaries as driver maps only when
            # BOTH fit (a large logtype dict must not be collected just
            # because the var dict happens to be small)
            if (
                v_dict.count() <= cfg.driver_dict_cap
                and lt_dict.count() <= cfg.driver_dict_cap
            ):
                lt_map = {
                    r["logtype"]: r["logtype_id"] for r in lt_dict.collect()
                }
                v_map = {r["value"]: r["var_id"] for r in v_dict.collect()}
        if lt_map is not None:
            encoded = encode_with_maps(parsed_all, lt_map, v_map)
        else:
            encoded = encode_with_dicts(
                parsed_all, lt_dict, v_dict, cfg.driver_dict_cap
            )
        if lt_pdf is not None:
            # fresh fast path: the logtype dict (with n_rows) is already
            # on the driver — no extra Spark jobs for hot-template detection
            total = int(lt_pdf["n_rows"].sum()) or 0
            hot = [
                int(i)
                for i in lt_pdf.loc[
                    lt_pdf["n_rows"] >= cfg.hot_logtype_threshold * total,
                    "logtype_id",
                ]
            ]
        else:
            hot = hot_logtypes_from_dict(lt_dict, cfg.hot_logtype_threshold)
        # persist the sinked rows: the metrics/manifest aggregations reuse
        # them directly instead of re-opening the many small sink files
        enc_sinked = add_seg_id(
            add_sink_id(encoded, cfg.num_sinks),
            cfg.num_segments,
            window_days=cfg.segment_window_days,
        ).persist()
        encoded_schema = enc_sinked.schema
        # The route write and ALL post-route bookkeeping (segment
        # summary → manifests + zone map + per-sink metrics, plus the
        # var-dict manifest's distinct-pair scan) run as CONCURRENT
        # driver-thread jobs over the same persisted frame. Spark's
        # per-block cache locks mean enc_sinked partitions are computed
        # once no matter which job gets there first, and the bookkeeping
        # aggregates overlap the route write's shuffle/IO tail instead
        # of queueing serially behind it (the fixed small-job cost
        # behind round 2's 29% local[32] pipeline-wall regression).
        from concurrent.futures import ThreadPoolExecutor

        need_metrics = "metrics" not in manifest.committed("metrics")
        t_m = time.time()
        summary = segment_summary(enc_sinked).persist()
        ts_cols = [c for c in ("ts_min", "ts_max") if c in summary.columns]
        seg_cols = ts_cols + (["ts_src"] if "ts_src" in summary.columns else [])

        def _w_route():
            route_to_sinks(
                enc_sinked, sinks_dir, cfg, hot_logtypes=hot, presinked=True
            )

        def _w_lt():
            # range-partitioned + sorted by logtype_id: a query probing
            # few ids reads few manifest FILES (min/max prune), not all
            summary.select(
                "sink_id", "seg_id", F.explode("lt_set").alias("logtype_id")
            ).repartitionByRange("logtype_id").sortWithinPartitions(
                "logtype_id"
            ).write.mode("overwrite").option(
                "parquet.bloom.filter.enabled#logtype_id", "true"
            ).parquet(
                os.path.join(out_dir, "manifest", "logtype")
            )
            # segment zone map: rows + ts range (+ source column) per
            # (sink, seg)
            summary.select(
                "sink_id", "seg_id", "rows", *seg_cols
            ).write.mode("overwrite").parquet(
                os.path.join(out_dir, "manifest", "segments")
            )

        var_man = (
            enc_sinked.select(
                "sink_id", "seg_id", F.explode("dict_var_ids").alias("var_id")
            )
            .distinct()
            .persist()
        )

        def _w_var():
            # var-dict bloom analog (clp_s/filter/BloomFilter.hpp:18-29):
            # the manifest is the var-side index searched with
            # `var_id IN (...)` — range-partitioning + sorting by var_id
            # gives each file/row group a tight disjoint id range (stats
            # prune) and the parquet bloom catches the residue, so a
            # dict-var-selective query touches few manifest files even
            # above the driver-collect cap
            var_man.repartitionByRange("var_id").sortWithinPartitions(
                "var_id"
            ).write.mode("overwrite").option(
                "parquet.bloom.filter.enabled#var_id", "true"
            ).parquet(os.path.join(out_dir, "manifest", "var"))

        def _w_metrics():
            var_card = (
                var_man.select("sink_id", "var_id")
                .distinct()
                .groupBy("sink_id")
                .agg(F.count("*").alias("var_cardinality"))
            )
            sink_aggs = [
                F.sum("rows").alias("rows"),
                F.expr(
                    "size(array_distinct(flatten(collect_list(lt_set))))"
                ).alias("logtype_cardinality"),
                F.sum("n_encoded_vars").alias("n_encoded_vars"),
                F.sum("encoded_bytes").alias("encoded_bytes"),
                F.sum("raw_bytes").alias("raw_bytes"),
            ]
            if ts_cols:
                sink_aggs += [
                    F.min("ts_min").alias("ts_min"),
                    F.max("ts_max").alias("ts_max"),
                ]
            m = (
                summary.groupBy("sink_id")
                .agg(*sink_aggs)
                .join(var_card, "sink_id", "left")
                .na.fill({"var_cardinality": 0})
                .select(
                    "sink_id",
                    "rows",
                    "logtype_cardinality",
                    "n_encoded_vars",
                    "encoded_bytes",
                    "raw_bytes",
                    *ts_cols,
                    "var_cardinality",
                )
                .orderBy("sink_id")
            )
            m.write.mode("overwrite").parquet(metrics_dir)

        with ThreadPoolExecutor(max_workers=4) as pool:
            f_route = pool.submit(_w_route)
            f_lt, f_var = pool.submit(_w_lt), pool.submit(_w_var)
            f_metrics = pool.submit(_w_metrics) if need_metrics else None
            for f in (f_route, f_lt, f_var):
                f.result()
            manifest.commit(
                "route", "route", run_id, wall_ms=int(1000 * (time.time() - t0))
            )
            if f_metrics is not None:
                f_metrics.result()
                manifest.commit(
                    "metrics",
                    "metrics",
                    run_id,
                    wall_ms=int(1000 * (time.time() - t_m)),
                )
        summary.unpersist()
        var_man.unpersist()
        enc_sinked.unpersist()
    if encoded_schema is None:
        encoded_schema = add_seg_id(
            add_sink_id(
                encode_with_dicts(
                    parsed_all.limit(0), lt_dict.limit(0), v_dict.limit(0)
                ),
                cfg.num_sinks,
            ),
            cfg.num_segments,
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
        "sink_manifest": os.path.join(out_dir, "manifest"),
        "manifest": manifest.path,
    }
