"""Grok pattern extraction: compile, mapInPandas path, JVM pushdown path."""

from __future__ import annotations

import pytest

from clp_spark.parse.grok import grok_extract_df, grok_extract_exprs, grok_to_regex


def test_grok_to_regex_fields():
    rx, fields = grok_to_regex("status=%{INT:code} ip=%{IP:client} %{WORD}")
    assert fields == ["code", "client"]
    import re

    m = re.search(rx, "status=404 ip=10.0.0.7 done")
    assert m.group("code") == "404" and m.group("client") == "10.0.0.7"
    with pytest.raises(KeyError):
        grok_to_regex("%{NOPE:x}")


def test_grok_extract_df(spark):
    df = spark.createDataFrame(
        [
            (1, "2025-01-03T10:00:01 INFO status=200 latency_ms=17 path=/api/v1/items/9"),
            (2, "2025-01-03T10:00:02 ERROR status=500 latency_ms=999 path=/api/v1/items/3"),
            (3, "no match here"),
        ],
        "id long, text string",
    )
    out = grok_extract_df(
        df,
        "%{TIMESTAMP_ISO8601:ts} %{LOGLEVEL:level} status=%{INT:status} "
        "latency_ms=%{INT:lat} path=%{PATH:path}",
        keep=["id"],
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["level"] == "INFO" and rows[1]["status"] == "200"
    assert rows[2]["lat"] == "999" and rows[2]["path"] == "/api/v1/items/3"
    assert rows[3]["level"] is None


def test_grok_jvm_pushdown_matches_python(spark):
    df = spark.createDataFrame(
        [(1, "a=1 b=xyz"), (2, "a=42 b=q")], "id long, text string"
    )
    pat = "a=%{INT:a} b=%{WORD:b}"
    py = {r["id"]: (r["a"], r["b"]) for r in grok_extract_df(df, pat, keep=["id"]).collect()}
    jvm = {
        r["id"]: (r["a"], r["b"])
        for r in df.select("id", *grok_extract_exprs(pat)).collect()
    }
    assert py == jvm == {1: ("1", "xyz"), 2: ("42", "q")}
