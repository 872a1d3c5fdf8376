"""Subsequence var-order refinement: prunes without changing results."""

from __future__ import annotations

import pytest

from clp_spark.config import PipelineConfig
from clp_spark.pipeline import compress_df
from clp_spark.search import search


@pytest.fixture(scope="module")
def corpus(spark):
    df = spark.createDataFrame(
        [
            (1, "job 11 then 22 done"),
            (2, "job 22 then 11 done"),  # same vars, reversed order
            (3, "job 11 then 33 done"),
        ],
        "doc_id long, text string",
    )
    enc, lt, vd = compress_df(df, PipelineConfig(), passthrough=["doc_id"])
    return enc.persist(), lt.persist(), vd.persist()


def test_order_refinement_prunes_reversed(corpus):
    enc, lt, vd = corpus
    q = "job 11 then 22 done"
    # unordered prefilter keeps 1 and 2 (same var multiset)
    loose = {r["doc_id"] for r in search(enc, lt, vd, q, decode=False).collect()}
    assert loose == {1, 2}
    # ordered refinement prunes the reversed doc before decode
    tight = {
        r["doc_id"]
        for r in search(
            enc, lt, vd, q, decode=False, require_var_order=True
        ).collect()
    }
    assert tight == {1}
    # final results identical with or without the refinement
    final_a = {r["doc_id"] for r in search(enc, lt, vd, q).collect()}
    final_b = {
        r["doc_id"]
        for r in search(enc, lt, vd, q, require_var_order=True).collect()
    }
    assert final_a == final_b == {1}
