"""Diagnostic: per-substage scaling of the compress pipeline's route
phase (NOT the north-rule harness — scaling_bench.py is that). Runs the
same dataflow as pipeline.compress but with phase 3 broken into
sequential, individually timed substages, so a poor N->4N ratio can be
attributed to a specific substage instead of the fused concurrent wall.

Usage: python scripts/diag_route.py            # paired 2 vs 8 cores
       python scripts/diag_route.py --run C PAGES N   # single pinned run
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_once(cores: int, pages_path: str, n_docs: int) -> dict:
    from pyspark.sql import functions as F

    from clp_spark.config import PipelineConfig
    from clp_spark.dicts.build import build_dicts_small_pandas, encode_with_maps
    from clp_spark.pipeline import _parse_phase
    from clp_spark.route.fanout import (
        add_seg_id,
        add_sink_id,
        route_to_sinks,
        segment_summary,
    )
    from clp_spark.session import get_spark

    cfg = PipelineConfig(num_checkpoint_buckets=1, shuffle_partitions=32)
    spark = get_spark(
        f"diag_route_{cores}",
        cores=cores,
        shuffle_partitions=32,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(512 * 1024),
        },
    )
    spark.range(100_000).selectExpr("cast(id as string) s").mapInPandas(
        lambda it: it, "s string"
    ).write.format("noop").mode("overwrite").save()

    t = {}
    out = tempfile.mkdtemp(prefix=f"diag_route_{cores}_")
    pages = spark.read.parquet(pages_path)

    t0 = time.time()
    parsed_dir = os.path.join(out, "parsed")
    _parse_phase(pages, cfg, "text", None).write.mode("overwrite").option(
        "compression", "zstd"
    ).parquet(parsed_dir)
    t["parse_write"] = time.time() - t0

    parsed_all = spark.read.parquet(parsed_dir)
    t0 = time.time()
    small = build_dicts_small_pandas(parsed_all, cfg.driver_dict_cap)
    lt_pdf, v_pdf, lt_map, v_map = small
    t["dict_build"] = time.time() - t0

    t0 = time.time()
    enc = add_seg_id(
        add_sink_id(encode_with_maps(parsed_all, lt_map, v_map), cfg.num_sinks),
        cfg.num_segments,
        window_days=cfg.segment_window_days,
    ).persist()
    enc.count()
    t["encode_persist"] = time.time() - t0

    t0 = time.time()
    route_to_sinks(enc, os.path.join(out, "sinks"), cfg, presinked=True)
    t["route_write"] = time.time() - t0

    t0 = time.time()
    summary = segment_summary(enc).persist()
    summary.count()
    t["summary"] = time.time() - t0

    t0 = time.time()
    summary.select(
        "sink_id", "seg_id", F.explode("lt_set").alias("logtype_id")
    ).repartitionByRange("logtype_id").sortWithinPartitions("logtype_id").write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "manifest", "logtype"))
    t["lt_manifest"] = time.time() - t0

    t0 = time.time()
    var_man = (
        enc.select("sink_id", "seg_id", F.explode("dict_var_ids").alias("var_id"))
        .distinct()
        .persist()
    )
    var_man.count()
    t["var_distinct"] = time.time() - t0

    t0 = time.time()
    var_man.repartitionByRange("var_id").sortWithinPartitions("var_id").write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "manifest", "var"))
    t["var_manifest"] = time.time() - t0

    t0 = time.time()
    var_card = (
        var_man.select("sink_id", "var_id")
        .distinct()
        .groupBy("sink_id")
        .agg(F.count("*").alias("var_cardinality"))
    )
    summary.groupBy("sink_id").agg(
        F.sum("rows").alias("rows"),
        F.expr("size(array_distinct(flatten(collect_list(lt_set))))").alias(
            "logtype_cardinality"
        ),
        F.sum("n_encoded_vars").alias("n_encoded_vars"),
        F.sum("encoded_bytes").alias("encoded_bytes"),
        F.sum("raw_bytes").alias("raw_bytes"),
    ).join(var_card, "sink_id", "left").na.fill({"var_cardinality": 0}).orderBy(
        "sink_id"
    ).write.mode("overwrite").parquet(os.path.join(out, "metrics"))
    t["metrics"] = time.time() - t0

    shutil.rmtree(out, ignore_errors=True)
    spark.stop()
    return {"cores": cores, "n_docs": n_docs, "t": {k: round(v, 2) for k, v in t.items()}}


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--run":
        print(json.dumps(run_once(int(sys.argv[2]), sys.argv[3], int(sys.argv[4]))))
        return

    import subprocess

    from clp_spark.fixtures.pages import generate_pages_df
    from clp_spark.session import get_spark

    n_docs = int(os.environ.get("CLP_SCALE_PAGES", "3000000"))
    pages_path = tempfile.mkdtemp(prefix="diag_pages_")
    gen = get_spark("diag_gen", cores=8)
    generate_pages_df(gen, n_docs, partitions=128).write.mode("overwrite").parquet(
        pages_path
    )
    gen.stop()

    def cmd_for(cores, cpu_list):
        c = [sys.executable, os.path.abspath(__file__), "--run", str(cores),
             pages_path, str(n_docs)]
        if shutil.which("taskset"):
            c = ["taskset", "-c", cpu_list] + c
        return c

    e1 = open("/tmp/diag_err_small.log", "w")
    e2 = open("/tmp/diag_err_big.log", "w")
    p1 = subprocess.Popen(cmd_for(2, "0-1"), stdout=subprocess.PIPE, stderr=e1, text=True)
    p2 = subprocess.Popen(cmd_for(8, "2-9"), stdout=subprocess.PIPE, stderr=e2, text=True)
    o1, _ = p1.communicate()
    o2, _ = p2.communicate()
    shutil.rmtree(pages_path, ignore_errors=True)
    small = json.loads(o1.strip().splitlines()[-1])
    big = json.loads(o2.strip().splitlines()[-1])
    print(json.dumps({"small": small, "big": big}))
    for k in small["t"]:
        s, b = small["t"][k], big["t"][k]
        print(f"{k:16s} 2c={s:8.2f}  8c={b:8.2f}  speedup={s / max(b, 1e-9):5.2f}x")


if __name__ == "__main__":
    main()
