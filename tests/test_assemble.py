"""Multi-line message assembly vs a line-at-a-time oracle
(MessageParser.cpp:48-95 semantics)."""

from __future__ import annotations

from clp_spark.functions.timestamps import match_leading_timestamp
from clp_spark.parse.assemble import split_and_assemble


def _oracle_assemble(text: str) -> list[str]:
    msgs: list[list[str]] = []
    for line in text.split("\n"):
        pid = match_leading_timestamp(line)[0]
        if pid is None and msgs:
            msgs[-1].append(line)
        else:
            msgs.append([line])
    return ["\n".join(m) for m in msgs]


FILES = {
    "f1": (
        "2015-01-31T15:50:45.392 ERROR stack overflow at frame 7\n"
        "    at module alpha line 12\n"
        "    caused by: timeout after 3.5 sec\n"
        "2015-01-31T15:50:46.000 INFO recovered"
    ),
    "f2": (
        "preamble without timestamp\n"
        "still preamble\n"
        "Jan 21 11:56:42 syslog style message\n"
        "  continuation"
    ),
    "f3": "single message no timestamp",
    "f4": (
        "INFO [main] 2015-01-31 15:50:45,085 prefixed pattern\n"
        "192.168.4.5 - - [01/Jan/2016:15:50:17 access line\n"
        "    trailing detail"
    ),
}


def test_assembly_matches_oracle(spark):
    df = spark.createDataFrame(
        [(k, v) for k, v in FILES.items()], "url string, text string"
    )
    out = split_and_assemble(df).collect()
    got: dict = {}
    for r in out:
        got.setdefault(r["file"], {})[r["msg_idx"]] = (r["message"], r["n_lines"])
    for f, text in FILES.items():
        want = _oracle_assemble(text)
        assert len(got[f]) == len(want), (f, got[f], want)
        for i, msg in enumerate(want):
            assert got[f][i][0] == msg, (f, i)
            assert got[f][i][1] == msg.count("\n") + 1


def test_assembled_messages_compress_roundtrip(spark):
    """Assembled messages feed the normal compress path and decode back
    byte-identically (multi-line messages survive the pipeline)."""
    from clp_spark.config import PipelineConfig
    from clp_spark.pipeline import compress_df
    from clp_spark.search.decode import decode_messages

    df = spark.createDataFrame(
        [(k, v) for k, v in FILES.items()], "url string, text string"
    )
    msgs = split_and_assemble(df).withColumn(
        "mid", __import__("pyspark.sql.functions", fromlist=["F"]).concat_ws(
            ":", "file", "msg_idx"
        )
    )
    enc, lt, vd = compress_df(
        msgs, PipelineConfig(), text_col="message", passthrough=["mid"]
    )
    decoded = {
        r["mid"]: r["rt"]
        for r in decode_messages(enc, lt, vd, "rt").select("mid", "rt").collect()
    }
    for r in msgs.select("mid", "message").collect():
        assert decoded[r["mid"]] == r["message"]
