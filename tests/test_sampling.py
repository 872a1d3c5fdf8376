"""Deterministic sampling: exact membership function of the row id —
stable across parallelism, re-runs, and engines (md5-h60 both sides)."""

from __future__ import annotations

from clp_spark.textops.sampling import (
    deterministic_sample,
    sample_threshold,
    stratified_sample,
)


def test_threshold_exact():
    assert sample_threshold((1, 2)) == (1 << 60) // 2
    assert sample_threshold((0, 1)) == 0
    assert sample_threshold((1, 1)) == 1 << 60


def test_sample_rate_and_determinism(spark):
    df = spark.range(0, 4000).withColumnRenamed("id", "doc_id")
    kept = deterministic_sample(df, (1, 4), id_col="doc_id")
    ids1 = {r["doc_id"] for r in kept.collect()}
    # same rows at a different partitioning
    ids2 = {
        r["doc_id"]
        for r in deterministic_sample(df.repartition(13), (1, 4)).collect()
    }
    assert ids1 == ids2
    assert abs(len(ids1) / 4000 - 0.25) < 0.03
    # disjoint salts give (near-)independent samples
    ids3 = {r["doc_id"] for r in deterministic_sample(df, (1, 4), salt=1).collect()}
    assert ids3 != ids1


def test_stratified_quotas(spark):
    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(6000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = stratified_sample(
        df, {"en": (1, 2), "de": (1, 4)}, strata_col="lang", default=(0, 1)
    ).groupBy("lang").count().collect()
    by = {r["lang"]: r["count"] for r in got}
    assert "fr" not in by  # default rate 0 drops the stratum
    assert abs(by["en"] / 2000 - 0.5) < 0.06
    assert abs(by["de"] / 2000 - 0.25) < 0.06


def test_cap_per_stratum(spark):
    from clp_spark.textops.sampling import cap_per_stratum

    rows = [(i, f"s{i % 4}") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = cap_per_stratum(df, 3, strata_col="source").collect()
    by: dict[str, list[int]] = {}
    for r in got:
        by.setdefault(r["source"], []).append(r["doc_id"])
    assert all(len(v) == 3 for v in by.values())
    # deterministic: the k SMALLEST ids per stratum
    assert sorted(by["s0"]) == [0, 4, 8]
    assert sorted(by["s3"]) == [3, 7, 11]


def test_cap_two_phase_matches_single_window(spark):
    """The skew-spreading pre-cap must not change results."""
    from clp_spark.textops.sampling import cap_per_stratum

    rows = [(i, f"s{i % 3}") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    a = {
        (r["source"], r["doc_id"])
        for r in cap_per_stratum(df, 7, strata_col="source").collect()
    }
    b = {
        (r["source"], r["doc_id"])
        for r in cap_per_stratum(
            df, 7, strata_col="source", presalt_buckets=1
        ).collect()
    }
    assert a == b and len(a) == 21
