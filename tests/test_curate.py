"""Composed curation pipeline: each stage's contract holds through the
composition (reps only, quota rates, domain caps, determinism), under
both dedup methods, and the shingle-df cap's plan is scale-shaped
(tiny over-cap complement broadcast, never the near-total keep set)."""

from __future__ import annotations

import pytest

from clp_spark.textops.curate import curate_corpus
from clp_spark.textops.dedup import ngram_jaccard_pairs


def _docs(spark):
    rows = []
    for i in range(300):
        lang = ["en", "de", "fr"][i % 3]
        src = f"site{i % 6}"
        # groups of 3 identical texts -> near-dup components
        text = f"alpha beta gamma delta {i // 3} epsilon zeta eta theta"
        rows.append((i, text, lang, src))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


def test_curate_contracts(spark):
    docs = _docs(spark)
    out = curate_corpus(
        docs,
        quotas={"en": (1, 1), "de": (1, 1)},
        default_rate=(0, 1),
        cap_k=8,
        jaccard=(9, 10),
    ).collect()
    ids = sorted(r["doc_id"] for r in out)
    # near-dup collapse: each identical-text triple keeps its min id only
    assert all(i % 3 == 0 for i in ids)
    # default rate 0 drops fr entirely
    assert {r["lang"] for r in out} <= {"en", "de"}
    # per-source cap
    by_src: dict[str, int] = {}
    for r in out:
        by_src[r["source"]] = by_src.get(r["source"], 0) + 1
    assert all(v <= 8 for v in by_src.values())
    # deterministic under repartitioning
    again = sorted(
        r["doc_id"]
        for r in curate_corpus(
            docs.repartition(17),
            quotas={"en": (1, 1), "de": (1, 1)},
            default_rate=(0, 1),
            cap_k=8,
            jaccard=(9, 10),
        ).collect()
    )
    assert again == ids


def test_curate_minhash_matches_jaccard_here(spark):
    # at this fixture's scale LSH recalls every identical-text pair, so
    # the two methods agree end-to-end (the general contract is
    # minhash-output ⊆ jaccard-output, equal on recalled pairs)
    docs = _docs(spark)
    kw = dict(
        quotas={"en": (1, 1), "de": (1, 1)},
        default_rate=(0, 1),
        cap_k=8,
        jaccard=(9, 10),
    )
    a = sorted(r["doc_id"] for r in curate_corpus(docs, **kw).collect())
    b = sorted(
        r["doc_id"]
        for r in curate_corpus(docs, method="minhash", **kw).collect()
    )
    assert a == b


def test_curate_unknown_method_raises(spark):
    with pytest.raises(ValueError, match="unknown dedup method"):
        curate_corpus(_docs(spark), quotas={}, method="simhash")


def test_shingle_cap_plan_anti_joins_complement(spark):
    """The df cap must broadcast the OVER-cap complement (tiny by
    construction) as a LeftAnti build side — broadcasting the keep set
    (≈ every distinct shingle) OOMs at corpus scale."""
    docs = _docs(spark)
    plan = ngram_jaccard_pairs(
        docs, max_shingle_df=2
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftAnti" in plan
    assert "LeftSemi" not in plan


def test_shingle_cap_semantics(spark):
    # cap binds: every text here is one of two 5-word strings repeated
    # across many docs, so ALL shingles exceed df=2 and no pairs survive;
    # with the cap above the max df the full pair set returns
    rows = [(i, "a b c d e" if i % 2 else "v w x y z") for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    capped = ngram_jaccard_pairs(docs, max_shingle_df=2).collect()
    assert capped == []
    full = ngram_jaccard_pairs(docs, max_shingle_df=1000).collect()
    # 4 docs per text -> C(4,2)=6 pairs per group
    assert len(full) == 12
