"""SQL-over-archives surface (Presto-connector analog,
guides-using-presto.md:1-16 + IndexManager.hpp:14-27): schema derived
from the archive's schema tree, typed Spark SQL over reconstructed
records, column-index archive pruning, cross-archive schema union."""

from __future__ import annotations

import json

import pytest
from pyspark.sql.types import (
    BooleanType,
    DecimalType,
    DoubleType,
    LongType,
    StringType,
    StructType,
)

from clp_spark.clps import encode_json_df
from clp_spark.clps.encoder import JsonArchive
from clp_spark.clps.sqlview import (
    archive_sql_schema,
    archive_table,
    register_archive_sql,
    sql_over_archives,
)

DOCS = [
    {"svc": "auth", "code": 200, "lat": 3.5, "ok": True,
     "msg": "user alice logged in", "tags": [1, 2], "ctx": {"r": 7}},
    {"svc": "auth", "code": 500, "lat": 1.25, "ok": False,
     "msg": "user bob rejected", "tags": ["x", {"d": 1}], "ctx": {"r": 9},
     "big": 99999999999999999999999999},
    {"svc": "cart", "code": 0, "lat": None, "ok": True,
     "msg": "cart emptied now", "mixed": 5},
    {"svc": "cart", "code": 7, "lat": 2.0, "ok": False,
     "msg": "cart add sku9", "mixed": "five"},
]


def _archive(spark, docs):
    df = spark.createDataFrame(
        [(i, json.dumps(d)) for i, d in enumerate(docs)], "id long, j string"
    )
    return encode_json_df(df, "j", passthrough=["id"])


@pytest.fixture(scope="module")
def arch(spark):
    return _archive(spark, DOCS)


def test_schema_from_tree(arch):
    sch = archive_sql_schema(arch)
    t = {f.name: f.dataType for f in sch.fields}
    assert t["svc"] == StringType()  # varstr
    assert t["code"] == LongType()
    assert t["lat"] == DoubleType()  # float, with a null occurrence
    assert t["ok"] == BooleanType()
    assert t["msg"] == StringType()  # clpstr
    assert t["tags"] == StringType()  # array -> raw JSON text
    assert t["big"] == DecimalType(38, 0)  # bignum-only path
    assert t["mixed"] == StringType()  # int+str mix -> string
    assert isinstance(t["ctx"], StructType)
    assert t["ctx"]["r"].dataType == LongType()


def test_typed_values_roundtrip(spark, arch):
    rows = {
        r["id"]: r
        for r in archive_table(spark, arch).collect()
    }
    assert rows[0]["code"] == 200 and rows[0]["lat"] == 3.5
    assert rows[0]["ok"] is True and rows[0]["ctx"]["r"] == 7
    assert rows[0]["msg"] == "user alice logged in"
    assert json.loads(rows[0]["tags"]) == [1, 2]
    assert json.loads(rows[1]["tags"]) == ["x", {"d": 1}]
    assert int(rows[1]["big"]) == 99999999999999999999999999
    assert rows[2]["lat"] is None and rows[2]["big"] is None
    assert rows[2]["mixed"] == "5" and rows[3]["mixed"] == "five"


def test_spark_sql_agg(spark, arch, tmp_path):
    d = str(tmp_path / "arch")
    arch.save(d)
    df, searched = sql_over_archives(
        spark,
        [d],
        "SELECT svc, count(*) AS n, sum(code) AS sum_code, max(lat) AS mx "
        "FROM clp WHERE ok OR code >= 500 GROUP BY svc ORDER BY svc",
    )
    assert searched == [d]
    out = [tuple(r) for r in df.collect()]
    assert out == [("auth", 2, 700, 3.5), ("cart", 1, 0, None)]


def test_struct_prefix_wins_over_scalar(spark):
    arch = _archive(
        spark, [{"a": 5, "s": "x"}, {"a": {"b": 1}, "s": "y"}]
    )
    sch = archive_sql_schema(arch)
    t = {f.name: f.dataType for f in sch.fields}
    assert isinstance(t["a"], StructType)
    rows = {r["s"]: r for r in archive_table(spark, arch).collect()}
    assert rows["y"]["a"]["b"] == 1
    assert rows["x"]["a"] is None  # scalar occurrence relaxes to null


def test_structurized_array_reads_as_raw_text(spark):
    df = spark.createDataFrame(
        [(0, json.dumps({"objs": [{"n": 1}, {"n": 2}], "k": 3}))],
        "id long, j string",
    )
    arch = encode_json_df(df, "j", passthrough=["id"], structurize_arrays=True)
    sch = archive_sql_schema(arch)
    t = {f.name: f.dataType for f in sch.fields}
    assert t["objs"] == StringType() and t["k"] == LongType()
    row = archive_table(spark, arch).collect()[0]
    assert json.loads(row["objs"]) == [{"n": 1}, {"n": 2}]


def test_index_prunes_archives_and_unions_schemas(spark, tmp_path):
    a = _archive(spark, [{"svc": "auth", "uid": 4}, {"svc": "auth", "uid": 6}])
    b = _archive(spark, [{"svc": "cart", "amount": 11}])
    da, db = str(tmp_path / "a"), str(tmp_path / "b")
    a.save(da)
    b.save(db)

    # metadata pruning: only archive a hosts 'uid'
    df, searched = sql_over_archives(
        spark,
        [da, db],
        "SELECT sum(uid) AS s FROM clp WHERE uid IS NOT NULL",
        where_fields=["uid"],
    )
    assert searched == [da]
    assert df.collect()[0]["s"] == 10

    # no pruning hint: union by name, missing columns read null
    df2, searched2 = sql_over_archives(
        spark,
        [da, db],
        "SELECT count(*) AS n, sum(amount) AS amt FROM clp",
    )
    assert searched2 == [da, db]
    assert tuple(df2.collect()[0]) == (3, 11)

    with pytest.raises(ValueError, match="pruned"):
        register_archive_sql(spark, [da, db], where_fields=["no_such_field"])


def test_projection_pushdown_matches_full_view(spark, arch):
    full = {
        r["id"]: (r["svc"], r["code"])
        for r in archive_table(spark, arch).collect()
    }
    proj_df = archive_table(spark, arch, columns=["svc", "code"])
    assert sorted(proj_df.columns) == ["code", "id", "svc"]
    proj = {r["id"]: (r["svc"], r["code"]) for r in proj_df.collect()}
    assert proj == full


def test_projection_prunes_leaves_before_decode(spark, arch):
    from pyspark.sql import functions as F

    from clp_spark.clps.sqlview import _project_encoded

    pruned = _project_encoded(arch, {"code"})
    n_full = arch.encoded.select(
        F.sum(F.size("jvals")).alias("s")
    ).collect()[0]["s"]
    n_kept = pruned.encoded.select(
        F.sum(F.size("jvals")).alias("s")
    ).collect()[0]["s"]
    assert n_kept == len(DOCS)  # exactly one 'code' leaf per record
    assert n_kept < n_full
    # no shuffle introduced: the filter is column algebra + a broadcast
    plan = pruned.encoded._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan


def test_projection_keeps_rows_with_no_surviving_fields(spark):
    arch = _archive(spark, [{"a": 1, "b": 2}, {"b": 3}])
    df = archive_table(spark, arch, columns=["a"])
    rows = {r["id"]: r["a"] for r in df.collect()}
    assert rows == {0: 1, 1: None}  # row 1 survives with null


def test_projection_structurized_array_stays_balanced(spark):
    df = spark.createDataFrame(
        [(0, json.dumps({"objs": [{"n": 1}, {"n": 2}], "k": 3, "z": "s"}))],
        "id long, j string",
    )
    arch = encode_json_df(df, "j", passthrough=["id"], structurize_arrays=True)
    row = archive_table(spark, arch, columns=["objs"]).collect()[0]
    assert json.loads(row["objs"]) == [{"n": 1}, {"n": 2}]


def test_view_plan_has_no_cartesian_or_collect(spark, arch, tmp_path):
    d = str(tmp_path / "arch")
    arch.save(d)
    register_archive_sql(spark, [d], view="clp_plan")
    plan = (
        spark.sql("SELECT svc, count(*) n FROM clp_plan GROUP BY svc")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    # partial+final agg chain over the reconstruct projection
    assert "HashAggregate" in plan
