"""Line → message assembly: timestamp-less lines join the previous message.

Re-expression of the reference's message parser
(/root/reference/components/core/src/clp/MessageParser.cpp:48-95): a
line beginning with a recognized timestamp starts a new message; lines
without one (stack traces, wrapped output) append to the message being
buffered; leading timestamp-less lines form a message of their own.

Spark shape — entirely JVM-side, no Python in the path:
  lines → `has_ts` flag (one anchored rlike over the full 36-pattern
  alternation from functions.timestamps) → running count of flags per
  file (window: sum over rows unbounded preceding) = message index →
  groupBy(file, msg_idx) + ordered concat_ws. The window partitions by
  file, which is the natural parallel unit (the reference also assembles
  per input file); no cross-file shuffle coupling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from clp_spark.functions.timestamps import java_line_start_regex


def split_lines(
    df: DataFrame, file_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """One row per line: (file, line_no, line). Narrow map."""
    return df.select(
        F.col(file_col).alias("file"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("line_no", "line"),
    )


def assemble_messages(
    lines: DataFrame,
    file_col: str = "file",
    line_no_col: str = "line_no",
    line_col: str = "line",
    ts_regex: str | None = None,
) -> DataFrame:
    """(file, msg_idx, message, n_lines) — assembled messages.

    msg_idx is 0-based per file; a leading run of timestamp-less lines
    gets msg_idx 0 (a message with no timestamp, as in the reference).
    """
    rx = ts_regex if ts_regex is not None else java_line_start_regex()
    flagged = lines.withColumn(
        "_has_ts", F.col(line_col).rlike(rx).cast("long")
    )
    w = (
        Window.partitionBy(file_col)
        .orderBy(line_no_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_idx = flagged.withColumn("_msg_idx", F.sum("_has_ts").over(w))
    return (
        with_idx.groupBy(F.col(file_col).alias("file"), F.col("_msg_idx"))
        .agg(
            F.concat_ws(
                "\n",
                F.expr(
                    f"transform(array_sort(collect_list(struct({line_no_col}, "
                    f"{line_col}))), x -> x.{line_col})"
                ),
            ).alias("message"),
            F.count("*").alias("n_lines"),
        )
        .select(
            "file",
            # 0-based: leading ts-less lines have running sum 0 already;
            # files starting with a ts line begin at 1 → shift to 0
            (
                F.col("_msg_idx")
                - F.min("_msg_idx").over(Window.partitionBy("file"))
            ).alias("msg_idx"),
            "message",
            "n_lines",
        )
    )


def split_and_assemble(
    df: DataFrame, file_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """Documents of multi-line text → assembled messages."""
    return assemble_messages(split_lines(df, file_col, text_col))
