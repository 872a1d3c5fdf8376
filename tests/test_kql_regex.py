"""KQL front-end + regex→wildcard translation."""

from __future__ import annotations

import json

import pytest

from clp_spark.clps import encode_json_df
from clp_spark.clps.kql import kql_query
from clp_spark.search.regex_translate import (
    RegexTranslationError,
    regex_to_wildcard,
)

RECORDS = [
    {"id": 0, "level": "INFO", "k": 42, "msg": "request handled fast"},
    {"id": 1, "level": "ERROR", "k": 7},
    {"id": 2, "level": "INFO", "k": 99, "ok": True},
    {"id": 3, "level": "WARN", "k": 7, "msg": "request handled fast"},
    {"id": 4, "level": "ERRORISH", "k": 200},
]


@pytest.fixture(scope="module")
def archive(spark):
    df = spark.createDataFrame(
        [(r["id"], json.dumps(r)) for r in RECORDS], "rid long, json string"
    )
    a = encode_json_df(df, "json", passthrough=["rid"])
    a.encoded = a.encoded.persist()
    a.encoded.count()
    return a


def _ids(df):
    return sorted(r["rid"] for r in df.select("rid").collect())


@pytest.mark.parametrize(
    "q,want",
    [
        ('level: "ERROR"', [1]),
        ("level: ERROR", [1]),
        ("k > 40 AND level: INFO", [0, 2]),
        ("k: 7 OR k: 99", [1, 2, 3]),
        ("NOT level: INFO", [1, 3, 4]),
        ("(k < 50 AND level: WARN) OR ok: true", [2, 3]),
        ("msg: *", [0, 3]),
        ('msg: "request handled fast"', [0, 3]),
        ("level: ERROR*", [1, 4]),  # wildcard value → dict scan
        ("k >= 200", [4]),
        ("nope: 5", []),
    ],
)
def test_kql_queries(archive, q, want):
    assert _ids(kql_query(archive, q)) == want, q


def test_kql_rejects_garbage(archive):
    with pytest.raises(ValueError):
        kql_query(archive, "level:")
    with pytest.raises(ValueError):
        kql_query(archive, "(level: A")


@pytest.mark.parametrize(
    "rx,kwargs,want",
    [
        ("abc", {}, "abc"),
        ("a.c", {}, "a?c"),
        ("a.*c", {}, "a*c"),
        ("a.+c", {}, "a?*c"),
        (r"a\.b", {}, "a.b"),
        (r"a\*b", {}, "a\\*b"),
        ("[x]yz", {}, "xyz"),
        ("[aA]bc", {"case_insensitive": True}, "abc"),
        ("^abc$", {"add_prefix_suffix_wildcards": True}, "abc"),
        ("abc", {"add_prefix_suffix_wildcards": True}, "*abc*"),
        ("^ab", {"add_prefix_suffix_wildcards": True}, "ab*"),
    ],
)
def test_regex_to_wildcard(rx, kwargs, want):
    assert regex_to_wildcard(rx, **kwargs) == want


@pytest.mark.parametrize(
    "rx", ["a|b", "a+", "(ab)c", "a{2}", "[abc]", r"\d+", "ab^c"]
)
def test_regex_to_wildcard_rejects(rx):
    with pytest.raises(RegexTranslationError):
        regex_to_wildcard(rx)
