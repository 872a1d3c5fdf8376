"""Log-file sources: plain / compressed text and JSON-lines inputs.

The reference ingests files through libarchive (tar/gz/bz2/...) and
ranged network readers (/root/reference/components/core/src/clp/
LibarchiveReader.*, NetworkReader.*; S3 via aws/). Spark's data sources
already decode the standard codecs (.gz/.bz2/.zst/...) and read any
Hadoop-compatible filesystem (s3a://, hdfs://, file://) — so the Spark
re-expression is a thin wrapper that standardizes the output shape:

  read_text_log_files → (path, line_no, line) — per line, ready for
    parse.assemble.assemble_messages (multi-line grouping) or direct
    tokenization when 1 line = 1 message;
  read_json_log_files → (path, line_no, json) — JSON-lines, ready for
    clps.encode_json_df.

Note .gz is not splittable — one task per gzip file, which is also the
reference's per-file ingest granularity; splittable codecs (zstd on
parquet, bz2) parallelize within a file.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window


def read_text_log_files(spark: SparkSession, path: str) -> DataFrame:
    """(path, line_no, line) for every line of every matched file.

    `path` accepts globs and any supported scheme; compressed files
    (.gz, .bz2, ...) are decoded by the source automatically."""
    return (
        spark.read.text(path)
        .select(
            F.input_file_name().alias("path"),
            F.col("value").alias("line"),
        )
        .withColumn(
            "line_no",
            F.row_number().over(
                Window.partitionBy("path").orderBy(
                    F.monotonically_increasing_id()
                )
            ),
        )
        .select("path", "line_no", "line")
    )


def read_json_log_files(spark: SparkSession, path: str) -> DataFrame:
    """(path, line_no, json) for JSON-lines inputs (clp_s's input shape)."""
    df = read_text_log_files(spark, path)
    return df.select("path", "line_no", F.col("line").alias("json"))
