"""The range-sorted var manifest's min/max stats must actually bite.

pyarrow 16 cannot read parquet bloom metadata, so the bloom's presence
is asserted indirectly: (a) the production write (pipeline.py
write_var_manifest) yields files whose var_id ranges are DISJOINT and
sorted — the precondition for both stats- and bloom-skipping — and
(b) a dict-var-selective `var_id IN (...)` probe's parquet scan emits
only the one covering file's rows (row-group stats pruned the rest),
measured from the executed plan's scan metrics.
"""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F

from clp_spark.pipeline import write_var_manifest


def _scan_metrics(df) -> dict:
    """{metric name: value} of the (single) parquet scan leaf after
    execution."""
    ep = df._jdf.queryExecution().executedPlan()

    def leaves(node):
        n = node.children().size()
        if n == 0:
            yield node
        for i in range(n):
            yield from leaves(node.children().apply(i))

    for leaf in leaves(ep):
        if "parquet" in leaf.nodeName().lower() or "Scan" in leaf.nodeName():
            m = leaf.metrics()
            keys = m.keys().toList()
            out = {}
            for i in range(keys.size()):
                k = keys.apply(i)
                out[k] = m.apply(k).value()
            return out
    return {}


def test_var_manifest_pruning(spark, tmp_path):
    n, parts = 400_000, 8
    df = spark.range(n).select(
        (F.col("id") % 64).alias("sink_id"),
        F.lit(0).cast("long").alias("seg_id"),
        F.col("id").alias("var_id"),
    )
    path = str(tmp_path / "var")
    # AQE coalesces this test-sized shuffle to one partition; at bench/
    # production scale the range write yields many files. Pin the
    # partition count so the layout property is observable here.
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    old = spark.conf.get(coalesce_key, "true")
    spark.conf.set(coalesce_key, "false")
    try:
        write_var_manifest(df.repartitionByRange(parts, "var_id"), path)
    finally:
        spark.conf.set(coalesce_key, old)

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    assert len(files) > 1, "fixture must produce a multi-file manifest"

    # (a) per-file var_id ranges are disjoint and sorted
    import pyarrow.parquet as pq

    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().names.index("var_id")
        los, his = [], []
        for i in range(md.num_row_groups):
            st = md.row_group(i).column(idx).statistics
            assert st is not None and st.has_min_max
            los.append(st.min)
            his.append(st.max)
        ranges.append((min(los), max(his)))
    ranges.sort()
    for (lo_a, hi_a), (lo_b, _hi_b) in zip(ranges, ranges[1:]):
        assert hi_a < lo_b, "file ranges must be disjoint"

    # (b) a selective IN probe's scan emits only the covering file's
    # rows — the other files' row groups are stats-pruned
    vm = spark.read.parquet(path)
    probe_id = n // 2 + 7
    pr = vm.filter(f"var_id IN ({probe_id})")
    assert pr.count() == 1
    got = _scan_metrics(pr)
    rows_out = got.get("number of output rows", got.get("numOutputRows"))
    assert rows_out is not None
    per_file = n / len(files)
    assert rows_out <= per_file * 1.5, (
        f"scan emitted {rows_out} of {n} rows — min/max pruning not biting"
    )
