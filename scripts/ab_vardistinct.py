"""A/B: JVM explode+distinct vs Arrow per-batch pre-unique for the
dict-var distinct (the dict phase's dominant CPU at 6M docs).

Usage: DIAG_PAGES_PATH=... python scripts/ab_vardistinct.py [cores]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from pyspark.sql import functions as F

    from clp_spark.config import PipelineConfig
    from clp_spark.parse.tokenizer import VT_DICT
    from clp_spark.pipeline import _parse_phase
    from clp_spark.session import get_spark

    spark = get_spark(
        f"ab_vd_{cores}",
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

    pages = spark.read.parquet(os.environ["DIAG_PAGES_PATH"])
    parsed_dir = os.environ.get("AB_PARSED_DIR")
    if not parsed_dir:
        parsed_dir = tempfile.mkdtemp(prefix="ab_vd_parsed_")
        _parse_phase(pages, PipelineConfig(), "text", None).write.mode(
            "overwrite"
        ).option("compression", "zstd").parquet(parsed_dir)
        print("parsed written to", parsed_dir)
    parsed = spark.read.parquet(parsed_dir)

    def jvm():
        return (
            parsed.select(F.explode(F.arrays_zip("var_strs", "var_types")).alias("z"))
            .filter(F.col("z.var_types") == VT_DICT)
            .select(F.col("z.var_strs").alias("value"))
            .distinct()
        )

    def arrow():
        import pyarrow as pa
        import pyarrow.compute as pc

        def run(batches):
            for rb in batches:
                flat_s = rb.column(0).flatten()
                flat_t = rb.column(1).flatten()
                u = pc.unique(flat_s.filter(pc.equal(flat_t, VT_DICT)))
                yield pa.RecordBatch.from_arrays([u], names=["value"])

        return (
            parsed.select("var_strs", "var_types")
            .mapInArrow(run, "value string")
            .distinct()
        )

    for name, fn in (("jvm", jvm), ("arrow", arrow), ("jvm2", jvm), ("arrow2", arrow)):
        t0 = time.time()
        n = fn().count()
        print(f"{name}: {time.time() - t0:.2f}s n={n}")


if __name__ == "__main__":
    main()
