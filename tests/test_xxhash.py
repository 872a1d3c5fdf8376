"""Oracle XXH64 must match Spark's xxhash64 exactly (routing parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from clp_spark.oracle.xxhash import pmod, spark_xxhash64


def test_xxhash64_parity(spark):
    rows = [
        (0, ""),
        (1, "en"),
        (-1, "de"),
        (2**62, "x" * 31),
        (-(2**62), "y" * 32),
        (123456789, "z" * 100),
        (42, "ünïcødé-日本語"),
        (7, "short"),
    ]
    df = spark.createDataFrame(rows, "a long, b string")
    got = df.select(
        F.xxhash64("a").alias("hl"),
        F.xxhash64("b").alias("hs"),
        F.xxhash64("a", "b").alias("hc"),
        F.pmod(F.xxhash64("a", "b"), F.lit(8)).alias("sink"),
    ).collect()
    for (a, b), r in zip(rows, got):
        assert spark_xxhash64(a) == r["hl"]
        assert spark_xxhash64(b) == r["hs"]
        assert spark_xxhash64(a, b) == r["hc"]
        assert pmod(spark_xxhash64(a, b), 8) == r["sink"]


def test_xxhash64_null_arg_parity(spark):
    """Spark's xxhash64 skips NULL arguments (the running hash passes
    through); the oracle must agree, or a null-lang row routes to a
    different sink driver-side than it does in add_sink_id."""
    rows = [(5, None), (0, None), (-3, "en"), (7, None)]
    df = spark.createDataFrame(rows, "a long, b string")
    got = df.select(
        F.xxhash64("a", "b").alias("hc"),
        F.pmod(F.xxhash64("a", "b"), F.lit(8)).alias("sink"),
    ).collect()
    for (a, b), r in zip(rows, got):
        assert spark_xxhash64(a, b) == r["hc"]
        assert pmod(spark_xxhash64(a, b), 8) == r["sink"]
