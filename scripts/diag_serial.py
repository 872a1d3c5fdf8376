"""Diagnostic: where do the DRIVER-serial seconds of compress() go?

Runs the full compress pipeline once at a given core count under
cProfile and prints the top driver-side functions by cumulative time,
excluding the py4j socket wait (that's executor time, not serial
residue). Amdahl: at 6M docs the 2c/8c pair solves to ~20s of fixed
serial time; this attributes it.

Usage: python scripts/diag_serial.py [cores] [n_docs]
"""

from __future__ import annotations

import cProfile
import os
import pstats
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 6_000_000

    from clp_spark.config import PipelineConfig
    from clp_spark.fixtures.pages import generate_pages_df
    from clp_spark.pipeline import compress
    from clp_spark.session import get_spark

    pages_path = os.environ.get("DIAG_PAGES_PATH") or tempfile.mkdtemp(
        prefix="diag_serial_pages_"
    )
    if not os.path.exists(os.path.join(pages_path, "_SUCCESS")):
        gen = get_spark("diag_gen", cores=8)
        generate_pages_df(gen, n_docs, partitions=128).write.mode(
            "overwrite"
        ).parquet(pages_path)
        gen.stop()

    spark = get_spark(
        f"diag_serial_{cores}",
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

    pages = spark.read.parquet(pages_path)
    out = tempfile.mkdtemp(prefix=f"diag_serial_{cores}_")

    prof = cProfile.Profile()
    t0 = time.time()
    prof.enable()
    compress(
        spark,
        pages,
        out,
        PipelineConfig(num_checkpoint_buckets=1, shuffle_partitions=32),
    )
    prof.disable()
    wall = time.time() - t0
    print(f"wall={wall:.2f}s cores={cores} n_docs={n_docs}")

    st = pstats.Stats(prof)
    st.sort_stats("cumulative")
    # top functions; the py4j recv/send entries approximate executor wait
    st.print_stats(60)

    shutil.rmtree(out, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
