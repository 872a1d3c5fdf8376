"""Composed curation pipeline: each stage's contract holds through the
composition (reps only, quota rates, domain caps, determinism)."""

from __future__ import annotations

from clp_spark.textops.curate import curate_corpus


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
