"""Streaming ingest: incremental compress parity vs batch, exactly-once
across restarts, live timeline counts."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from clp_spark.config import PipelineConfig
from clp_spark.fixtures.pages import generate_pages_pdf
from clp_spark.pipeline import compress_df
from clp_spark.search.decode import decode_messages
from clp_spark.streaming.ingest import (
    LOGTYPE_DICT_SCHEMA,
    VAR_DICT_SCHEMA,
    stream_compress,
    stream_count_by_time,
)

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


@pytest.fixture()
def stream_dirs(spark):
    src = tempfile.mkdtemp(prefix="stream_src_")
    out = tempfile.mkdtemp(prefix="stream_out_")
    yield src, out
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)


def _write_chunk(spark, src, lo, hi, name):
    pdf = generate_pages_pdf(lo, hi)
    spark.createDataFrame(pdf, PAGES_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(src, name))


def test_stream_compress_incremental_parity(spark, stream_dirs):
    src, out = stream_dirs
    cfg = PipelineConfig(num_sinks=4)

    # chunk 1 arrives, drain
    _write_chunk(spark, src, 0, 400, "chunk1")
    q = stream_compress(spark, src + "/*", out, PAGES_SCHEMA, cfg)
    q.awaitTermination(120)
    n1 = spark.read.parquet(os.path.join(out, "sinks")).count()
    assert n1 == 400

    # chunk 2 arrives, resume from checkpoint — only the delta processes
    _write_chunk(spark, src, 400, 700, "chunk2")
    q = stream_compress(spark, src + "/*", out, PAGES_SCHEMA, cfg)
    q.awaitTermination(120)
    sinks = spark.read.parquet(os.path.join(out, "sinks"))
    assert sinks.count() == 700

    # re-run with no new data: exactly-once, nothing appended
    q = stream_compress(spark, src + "/*", out, PAGES_SCHEMA, cfg)
    q.awaitTermination(120)
    assert spark.read.parquet(os.path.join(out, "sinks")).count() == 700

    # parity vs the batch pipeline on the same 700 rows:
    pages = spark.createDataFrame(generate_pages_pdf(0, 700), PAGES_SCHEMA)
    batch_enc, batch_lt, batch_vd = compress_df(pages, cfg)

    # per-sink counts identical (sink_id depends only on logtype+lang via
    # the dictionary *value*, so insertion-order IDs must be mapped
    # through the template string)
    lt_stream = spark.read.schema(LOGTYPE_DICT_SCHEMA).parquet(
        os.path.join(out, "dicts", "logtype")
    )
    vd_stream = spark.read.schema(VAR_DICT_SCHEMA).parquet(
        os.path.join(out, "dicts", "var")
    )
    assert lt_stream.count() == batch_lt.count()
    assert vd_stream.count() == batch_vd.count()
    assert (
        lt_stream.select("logtype").distinct().join(
            batch_lt.select("logtype").distinct(), "logtype"
        ).count()
        == batch_lt.count()
    )

    # decode round trip: streaming-encoded rows reproduce original text
    decoded = decode_messages(sinks, lt_stream, vd_stream, "rt")
    got = {r["url"]: r["rt"] for r in decoded.select("url", "rt").collect()}
    want_pdf = generate_pages_pdf(0, 700)
    for u, t in zip(want_pdf["url"], want_pdf["text"]):
        assert got[u] == t


def test_stream_count_by_time(spark, stream_dirs):
    src, _ = stream_dirs
    _write_chunk(spark, src, 0, 500, "c1")
    q = stream_count_by_time(
        spark, src + "/*", PAGES_SCHEMA, bucket="7 days", query_name="tl_test"
    )
    q.awaitTermination(120)
    got = {
        r["bucket_start"]: r["n"]
        for r in spark.sql("SELECT * FROM tl_test").collect()
    }
    pdf = generate_pages_pdf(0, 500)
    df = spark.createDataFrame(pdf, PAGES_SCHEMA)
    want = {
        r["b"]: r["n"]
        for r in df.groupBy(F.window("warc_ts", "7 days").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("b"), "n")
        .collect()
    }
    assert got == want and len(want) > 1


def test_stream_assemble_messages(spark, stream_dirs):
    """Custom stateful operator (applyInPandasWithState): multi-line
    assembly across micro-batch boundaries. A message completed by a
    ts line in a LATER batch must emit then, with the same content and
    numbering as the batch assembler; trailing partials stay in state."""
    from clp_spark.parse.assemble import assemble_messages, split_lines
    from clp_spark.streaming.assemble import OUT_SCHEMA, stream_assemble_messages

    src, out = stream_dirs
    ckpt = os.path.join(out, "_ckpt_asm")

    # synthetic multi-line logs: every 3rd line is a ts-less continuation
    files = []
    for f in range(6):
        lines = []
        for i in range(30):
            if i % 3 == 2:
                lines.append(f"  at frame_{f}_{i} (stack.py:{i})")
            else:
                lines.append(f"2024-01-0{(i % 9) + 1} 10:0{i % 10}:00 f{f} event {i}")
        files.append((f"file_{f}", lines))

    LINES_SCHEMA = "file string, line_no long, line string"
    all_rows = [
        (f, i, ln) for f, lines in files for i, ln in enumerate(lines)
    ]
    half = {f: len(lines) // 2 for f, lines in files}
    chunk1 = [(f, i, ln) for f, i, ln in all_rows if i < half[f]]
    chunk2 = [(f, i, ln) for f, i, ln in all_rows if i >= half[f]]

    sink = os.path.join(out, "assembled")

    def run_once():
        before = (
            set()
            if not os.path.isdir(sink)
            else {
                (r["file"], r["msg_idx"])
                for r in spark.read.schema(OUT_SCHEMA).parquet(sink).collect()
            }
        )
        stream = spark.readStream.schema(LINES_SCHEMA).parquet(src + "/*")
        q = (
            stream_assemble_messages(stream)
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return [
            r
            for r in spark.read.schema(OUT_SCHEMA).parquet(sink).collect()
            if (r["file"], r["msg_idx"]) not in before
        ]

    spark.createDataFrame(chunk1, LINES_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(src, "c1"))
    got1 = run_once()

    spark.createDataFrame(chunk2, LINES_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(src, "c2"))
    got2 = run_once()

    got = {(r["file"], r["msg_idx"]): (r["message"], r["n_lines"]) for r in got1}
    for r in got2:
        key = (r["file"], r["msg_idx"])
        assert key not in got, f"duplicate emission {key}"
        got[key] = (r["message"], r["n_lines"])

    # batch oracle over the SAME lines; streaming can't know the last
    # message of each file is complete, so exclude it per file
    lines_df = spark.createDataFrame(all_rows, LINES_SCHEMA)
    batch = assemble_messages(lines_df).collect()
    last_idx = {}
    for r in batch:
        last_idx[r["file"]] = max(last_idx.get(r["file"], -1), r["msg_idx"])
    want = {
        (r["file"], r["msg_idx"]): (r["message"], r["n_lines"])
        for r in batch
        if r["msg_idx"] < last_idx[r["file"]]
    }
    assert got == want
    # cross-batch case really happened: messages straddling the chunk
    # boundary were emitted by the second run
    assert len(got1) > 0 and len(got2) > 0
