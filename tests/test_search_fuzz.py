"""Fuzz the query compiler's prefilter soundness.

Random wildcard queries are derived from real corpus substrings (so they
actually hit) plus adversarial mutations (inserted `*`/`?`, boundary
cuts, case flips). For every query the full search result must equal the
brute-force wildcard oracle over the raw text — i.e. the compiled
per-token interpretation branches (compiler.py) never drop a matching
row, no matter where a wildcard lands relative to token boundaries.
Mirrors the reference's query-compilation tests (test-GrepCore.cpp)
but randomized.
"""

from __future__ import annotations

import random

import pytest

from clp_spark.config import PipelineConfig
from clp_spark.pipeline import compress_df
from clp_spark.search import search
from clp_spark.search.wildcard import wildcard_match


@pytest.fixture(scope="module")
def corpus(spark, pages_pdf, pages_df):
    encoded, lt_dict, v_dict = compress_df(pages_df.limit(600), PipelineConfig())
    encoded = encoded.persist()
    lt_dict = lt_dict.persist()
    v_dict = v_dict.persist()
    encoded.count()
    texts = {r["url"]: r["text"] for r in pages_df.limit(600).select("url", "text").collect()}
    return encoded, lt_dict, v_dict, texts


def _mutate(rng: random.Random, s: str) -> str:
    ops = rng.randint(1, 3)
    s = list(s)
    for _ in range(ops):
        if not s:
            break
        op = rng.randrange(4)
        i = rng.randrange(len(s) + 1)
        if op == 0:
            s.insert(i, "*")
        elif op == 1 and i < len(s):
            s[i] = "?"
        elif op == 2 and i < len(s):
            del s[i]  # dangling cut mid-token
            s.insert(i, "*")
        elif op == 3 and i < len(s) and s[i].isalpha():
            s[i] = s[i].swapcase()  # exercises case-sensitivity
    return "".join(s)


def _gen_queries(texts, n=60, seed=1234):
    rng = random.Random(seed)
    rows = sorted(texts.values())
    out = []
    for _ in range(n):
        t = rows[rng.randrange(len(rows))]
        a = rng.randrange(len(t))
        b = min(len(t), a + rng.randint(3, 24))
        frag = t[a:b].replace("\\", "\\\\").replace("*", "\\*").replace("?", "\\?")
        if rng.random() < 0.7:
            frag = _mutate(rng, frag)
        out.append(frag)
    return out


def test_fuzz_query_parity(corpus):
    encoded, lt_dict, v_dict, texts = corpus
    queries = _gen_queries(texts)
    bad = []
    for q in queries:
        got = {
            r["url"]
            for r in search(encoded, lt_dict, v_dict, q).select("url").collect()
        }
        want = {u for u, t in texts.items() if wildcard_match("*" + q + "*", t)}
        if got != want:
            bad.append((q, len(got), len(want), sorted(want - got)[:3]))
    assert not bad, bad
