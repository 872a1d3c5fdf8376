"""Diagnostic: per-stage scaling from Spark event logs.

Runs compress() once at each core count with spark.eventLog enabled,
then reports per stage: wall, task count, sum/max task runtime, GC,
shuffle bytes — and pairs the 2c/8c stages by order so the non-scaling
stages (fixed wall, straggler-bound, or contention-inflated CPU) are
attributable.

Usage: python scripts/diag_events.py [n_docs]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVDIR = "/tmp/diag_spark_events"


def run_once(cores: int, pages_path: str) -> tuple[float, str]:
    from clp_spark.config import PipelineConfig
    from clp_spark.pipeline import compress
    from clp_spark.session import get_spark

    os.makedirs(EVDIR, exist_ok=True)
    spark = get_spark(
        f"diag_ev_{cores}",
        cores=cores,
        shuffle_partitions=32,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(512 * 1024),
            "spark.eventLog.enabled": "true",
            "spark.eventLog.compress": "false",
            "spark.eventLog.dir": EVDIR,
        },
    )
    app_id = spark.sparkContext.applicationId
    spark.range(100_000).selectExpr("cast(id as string) s").mapInPandas(
        lambda it: it, "s string"
    ).write.format("noop").mode("overwrite").save()
    pages = spark.read.parquet(pages_path)
    out = tempfile.mkdtemp(prefix=f"diag_ev_{cores}_")
    t0 = time.time()
    compress(
        spark,
        pages,
        out,
        PipelineConfig(num_checkpoint_buckets=1, shuffle_partitions=32),
    )
    wall = time.time() - t0
    shutil.rmtree(out, ignore_errors=True)
    spark.stop()
    return wall, app_id


def _log_lines(app_id: str):
    # Spark 4 rolling event log: a directory eventlog_v2_<appId>/ with
    # one or more events_N_<appId> files inside; older Spark: one file
    hits = glob.glob(os.path.join(EVDIR, f"*{app_id}*"))
    for h in hits:
        files = (
            sorted(glob.glob(os.path.join(h, "events_*")))
            if os.path.isdir(h)
            else [h]
        )
        for fp in files:
            if fp.endswith(".zstd"):
                import io

                import pyarrow as pa

                with pa.input_stream(fp, compression="zstd") as raw:
                    yield from io.TextIOWrapper(raw, encoding="utf-8")
            else:
                with open(fp) as f:
                    yield from f


def parse_log(app_id: str) -> list[dict]:
    stages = {}
    tasks = {}
    if True:
        for line in _log_lines(app_id):
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                stages[sid] = {
                    "stage": sid,
                    "name": si["Stage Name"].split(" at ")[0][:40],
                    "detail": (si.get("Details") or "").split("\n")[0][:0],
                    "wall_s": round(
                        (si["Completion Time"] - si["Submission Time"]) / 1000, 2
                    )
                    if si.get("Completion Time") and si.get("Submission Time")
                    else None,
                    "n_tasks": si["Number of Tasks"],
                }
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                tm = ev.get("Task Metrics") or {}
                t = tasks.setdefault(
                    sid,
                    {
                        "sum_run_s": 0.0,
                        "max_run_s": 0.0,
                        "gc_s": 0.0,
                        "shuf_w_mb": 0.0,
                        "shuf_r_mb": 0.0,
                        "out_mb": 0.0,
                    },
                )
                run = (tm.get("Executor Run Time") or 0) / 1000
                t["sum_run_s"] += run
                t["max_run_s"] = max(t["max_run_s"], run)
                t["gc_s"] += (tm.get("JVM GC Time") or 0) / 1000
                sw = tm.get("Shuffle Write Metrics") or {}
                t["shuf_w_mb"] += (sw.get("Shuffle Bytes Written") or 0) / 1e6
                sr = tm.get("Shuffle Read Metrics") or {}
                t["shuf_r_mb"] += (
                    (sr.get("Local Bytes Read") or 0)
                    + (sr.get("Remote Bytes Read") or 0)
                ) / 1e6
                om = tm.get("Output Metrics") or {}
                t["out_mb"] += (om.get("Bytes Written") or 0) / 1e6
    rows = []
    for sid in sorted(stages):
        r = {**stages[sid], **tasks.get(sid, {})}
        for k in ("sum_run_s", "max_run_s", "gc_s", "shuf_w_mb", "shuf_r_mb", "out_mb"):
            if k in r:
                r[k] = round(r[k], 2)
        rows.append(r)
    return rows


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 6_000_000

    from clp_spark.fixtures.pages import generate_pages_df
    from clp_spark.session import get_spark

    pages_path = os.environ.get("DIAG_PAGES_PATH") or tempfile.mkdtemp(
        prefix="diag_ev_pages_"
    )
    if not os.path.exists(os.path.join(pages_path, "_SUCCESS")):
        gen = get_spark("diag_gen", cores=8)
        generate_pages_df(gen, n_docs, partitions=128).write.mode(
            "overwrite"
        ).parquet(pages_path)
        gen.stop()

    shutil.rmtree(EVDIR, ignore_errors=True)
    results = {}
    for cores in (8, 2):
        wall, app_id = run_once(cores, pages_path)
        results[cores] = {"wall": wall, "stages": parse_log(app_id)}
        print(f"== cores={cores} wall={wall:.1f}s")

    for cores, r in results.items():
        print(f"\n===== cores={cores} wall={r['wall']:.1f} =====")
        print(
            f"{'sid':>4} {'name':40} {'wall':>7} {'ntask':>5} {'sum':>8} "
            f"{'max':>7} {'gc':>6} {'sw_mb':>8} {'sr_mb':>8} {'out_mb':>8}"
        )
        for s in r["stages"]:
            if (s.get("wall_s") or 0) < 0.15:
                continue
            print(
                f"{s['stage']:>4} {s['name']:40} {s.get('wall_s', 0):>7} "
                f"{s['n_tasks']:>5} {s.get('sum_run_s', 0):>8} "
                f"{s.get('max_run_s', 0):>7} {s.get('gc_s', 0):>6} "
                f"{s.get('shuf_w_mb', 0):>8} {s.get('shuf_r_mb', 0):>8} "
                f"{s.get('out_mb', 0):>8}"
            )


if __name__ == "__main__":
    main()
