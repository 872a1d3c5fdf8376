"""Connected-components dedup clustering (min-label propagation)."""

from __future__ import annotations

from clp_spark.textops.dedup import connected_components


def test_connected_components_known_graph(spark):
    # components: {0,1,2,3} (chain), {10,11}, {20} (singleton), {30,31,32}
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (10, 11), (31, 30), (31, 32)],
        "doc_a long, doc_b long",
    )
    ids = spark.createDataFrame(
        [(i,) for i in [0, 1, 2, 3, 10, 11, 20, 30, 31, 32]], "id long"
    )
    got = {r["id"]: r["rep"] for r in connected_components(pairs, ids).collect()}
    assert got == {
        0: 0, 1: 0, 2: 0, 3: 0,
        10: 10, 11: 10,
        20: 20,
        30: 30, 31: 30, 32: 30,
    }


def test_connected_components_long_chain(spark):
    # an 8-node path needs several propagation rounds to converge
    n = 8
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    ids = spark.createDataFrame([(i,) for i in range(n)], "id long")
    got = {r["id"]: r["rep"] for r in connected_components(pairs, ids).collect()}
    assert got == {i: 0 for i in range(n)}

def test_connected_components_string_ids(spark):
    # doc ids are URLs in the primary pipeline — no numeric cast allowed
    pairs = spark.createDataFrame(
        [("u/a", "u/b"), ("u/b", "u/c"), ("u/x", "u/y")],
        "doc_a string, doc_b string",
    )
    ids = spark.createDataFrame(
        [(u,) for u in ["u/a", "u/b", "u/c", "u/x", "u/y", "u/z"]], "id string"
    )
    got = {r["id"]: r["rep"] for r in connected_components(pairs, ids).collect()}
    assert got == {
        "u/a": "u/a", "u/b": "u/a", "u/c": "u/a",
        "u/x": "u/x", "u/y": "u/x",
        "u/z": "u/z",
    }
