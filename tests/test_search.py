"""Search parity: golden wildcard queries vs oracle (FIXTURES.md §4).

The oracle for search is simple: a query's exact result set is the rows
whose original text wildcard-matches the (substring-wrapped) pattern —
the reference's own contract (compress+search == grep on the raw logs,
mirroring test-clp_s-search.cpp's golden-query style).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from clp_spark.config import PipelineConfig
from clp_spark.pipeline import compress_df
from clp_spark.search import compile_query, decode_messages, search
from clp_spark.search.executor import count_by_time, count_matches, topk_latest
from clp_spark.search.wildcard import wildcard_match


@pytest.fixture(scope="module")
def corpus(spark, pages_pdf, pages_df):
    encoded, lt_dict, v_dict = compress_df(pages_df, PipelineConfig())
    encoded = encoded.persist()
    lt_dict = lt_dict.persist()
    v_dict = v_dict.persist()
    encoded.count()
    return encoded, lt_dict, v_dict


def oracle_urls(pages_pdf, query, ignore_case=False):
    pat = "*" + query + "*"
    return {
        u
        for u, t in zip(pages_pdf["url"], pages_pdf["text"])
        if wildcard_match(pat, t, ignore_case)
    }


GOLDEN_QUERIES = [
    # exact phrase, no wildcards (dictionary-precise path)
    "request handled",
    # substring with wildcards forcing dict scan + confirm
    "*latency_ms=*",
    # integer-valued token (int-var path; bounded by delimiters)
    " 500 ",
    # float var with trailing zeros (packed-float path)
    "cpu=0.500",
    # dict var: hex token
    "*deadbeef*",
    # dict var: k=v alpha token
    "user=alice",
    # zero matches: dictionary miss prunes everything
    "no_such_token_zzz=qqq77xyz",
    # match-all
    "*",
    # '?' single-char wildcard
    "heartbeat acknowledge?",
    # static text with wildcard chars escaped
    "glob match \\*.parquet",
    # multi-line message content (continuation line)
    "*caused by: timeout*",
    # eq-prefixed numeric (int var via '=' context)
    "threshold=*",
    # negative integer var
    "*delta -*",
]


@pytest.mark.parametrize("query", GOLDEN_QUERIES)
def test_golden_query_parity(corpus, pages_pdf, query):
    encoded, lt_dict, v_dict = corpus
    got = {
        r["url"]
        for r in search(encoded, lt_dict, v_dict, query).select("url").collect()
    }
    assert got == oracle_urls(pages_pdf, query), query


def test_ignore_case(corpus, pages_pdf):
    encoded, lt_dict, v_dict = corpus
    q = "REQUEST Handled"
    got = {
        r["url"]
        for r in search(encoded, lt_dict, v_dict, q, ignore_case=True)
        .select("url")
        .collect()
    }
    want = oracle_urls(pages_pdf, q, ignore_case=True)
    assert got == want and len(want) > 0


def test_zero_match_skips_scan(corpus):
    """A dictionary miss must prune to an empty plan without scanning."""
    encoded, lt_dict, v_dict = corpus
    res = search(encoded, lt_dict, v_dict, "qz9x8w7_no_such=zzvarqq1")
    assert res.count() == 0


def test_prefilter_is_superset(corpus, pages_pdf):
    """decode=False returns the pushdown superset; confirm shrinks it."""
    encoded, lt_dict, v_dict = corpus
    q = "user=alice"
    pre = search(encoded, lt_dict, v_dict, q, decode=False).count()
    post = search(encoded, lt_dict, v_dict, q).count()
    assert pre >= post == len(oracle_urls(pages_pdf, q))


def test_ts_range_inclusive(corpus, pages_pdf):
    encoded, lt_dict, v_dict = corpus
    lo = dt.datetime(2025, 1, 8)
    hi = dt.datetime(2025, 1, 22)
    got = {
        r["url"]
        for r in search(
            encoded, lt_dict, v_dict, "request handled", ts_range=(lo, hi)
        )
        .select("url")
        .collect()
    }
    want = {
        u
        for u, t, ts in zip(
            pages_pdf["url"], pages_pdf["text"], pages_pdf["warc_ts"]
        )
        if wildcard_match("*request handled*", t) and lo <= ts <= hi
    }
    assert got == want and 0 < len(want)


def test_path_filter(corpus, pages_pdf):
    encoded, lt_dict, v_dict = corpus
    target = pages_pdf["url"].iloc[0]
    rows = search(
        encoded, lt_dict, v_dict, "*", path_filter=target
    ).collect()
    assert len(rows) == 1 and rows[0]["url"] == target


def test_count_and_count_by_time(corpus, pages_pdf):
    encoded, lt_dict, v_dict = corpus
    q = "request handled"
    m = search(encoded, lt_dict, v_dict, q)
    n = count_matches(m).collect()[0]["n"]
    assert n == len(oracle_urls(pages_pdf, q))

    bucket_ms = 7 * 24 * 3600 * 1000
    got = {
        r["bucket"]: r["n"] for r in count_by_time(m, bucket_ms).collect()
    }
    want: dict[int, int] = {}
    for u, t, ts in zip(pages_pdf["url"], pages_pdf["text"], pages_pdf["warc_ts"]):
        if wildcard_match("*request handled*", t):
            ms = int(ts.value // 10**6)
            b = ms // bucket_ms * bucket_ms
            want[b] = want.get(b, 0) + 1
    assert got == want


def test_topk_latest(corpus, pages_pdf):
    encoded, lt_dict, v_dict = corpus
    m = search(encoded, lt_dict, v_dict, "request handled")
    got = [r["url"] for r in topk_latest(m, 10, tiebreak="url").collect()]
    matches = [
        (ts, u)
        for u, t, ts in zip(
            pages_pdf["url"], pages_pdf["text"], pages_pdf["warc_ts"]
        )
        if wildcard_match("*request handled*", t)
    ]
    want = [u for ts, u in sorted(matches, key=lambda x: (x[0], x[1]), reverse=True)[:10]]
    assert got == want


def test_decode_joined_fallback_roundtrip(corpus, pages_pdf):
    """Forcing driver_dict_cap=1 exercises the explode→join→regroup
    decode path; text must still be byte-identical per url."""
    encoded, lt_dict, v_dict = corpus
    decoded = decode_messages(encoded, lt_dict, v_dict, "rt_text", driver_dict_cap=1)
    joined = {r["url"]: r["rt_text"] for r in decoded.select("url", "rt_text").collect()}
    for u, t in zip(pages_pdf["url"], pages_pdf["text"]):
        assert joined[u] == t


def test_decode_roundtrip_full_table(corpus, pages_pdf):
    """Decompressor parity: decode(encode(x)) byte-identical for every row
    (reference identity-transformation test:
    integration-tests/.../test_identity_transformation.py:22-60)."""
    encoded, lt_dict, v_dict = corpus
    decoded = decode_messages(encoded, lt_dict, v_dict, "rt_text")
    joined = {r["url"]: r["rt_text"] for r in decoded.select("url", "rt_text").collect()}
    for u, t in zip(pages_pdf["url"], pages_pdf["text"]):
        assert joined[u] == t


def _branch_kinds(cq):
    return [{b.kind for b in tp.branches} for tp in cq.tokens]


def test_compiler_classifies_tokens():
    cq = compile_query("status=500 latency cpu=0.500 deadbeef user=alice ")
    assert ("int", 500) in cq.ordered_vars
    assert any(k == "float" for k, _ in cq.ordered_vars)
    ordered_dicts = [v for k, v in cq.ordered_vars if k == "dict"]
    assert "deadbeef" in ordered_dicts and "alice" in ordered_dicts
    assert not cq.match_all

    assert compile_query("*").match_all
    assert compile_query("").match_all


def test_wildcard_token_gets_interpretations():
    """A wildcard-touched token must still produce dictionary-prefilter
    branches (the round-1 gap: it used to contribute no constraint)."""
    cq = compile_query("*value*fast*")
    kinds = _branch_kinds(cq)
    assert len(kinds) == 2  # tokens 'value' and 'fast', split at '*'
    for ks in kinds:
        assert "dictvar" in ks and "logtype" in ks
        # letters ⇒ numeric interpretations infeasible
        assert "enc_int" not in ks and "enc_float" not in ks

    # a digit-bearing wildcard token can never be static text
    cq2 = compile_query("*qz9token*")
    ks2 = _branch_kinds(cq2)[0]
    assert "logtype" not in ks2 and "dictvar" in ks2

    # '='-anchored alpha token: variable-only (GrepCore var rule)
    cq3 = compile_query("user=alice ")
    ks3 = _branch_kinds(cq3)[-1]
    assert ks3 == {"dictvar"}


def test_qmark_split_branches():
    """A '?' may stand for a delimiter: the token carries a 'split'
    interpretation alongside the in-token ones."""
    cq = compile_query("va?ue table")
    ks = _branch_kinds(cq)[0]
    assert "split" in ks and "dictvar" in ks and "logtype" in ks
