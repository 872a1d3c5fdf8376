"""Mimic the driver's correctness gate: run every __spark_entry__
queries() entry and its oracle_sql() side-by-side on the same parquet
tables, compare row count + column names + order-insensitive values.

Runs at sf0.001 for speed (the driver runs sf0.01; scripts/check_oracles.py
covers that scale manually).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("CLP_SPARK_ORACLE_SF", "/root/testdata/sf0.001")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_norm_cell(r[i]) for i in order))
    return sorted(out, key=repr)


def _norm_cell(v):
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        return round(v, 9)
    if hasattr(v, "item"):  # numpy scalar
        return _norm_cell(v.item())
    return v


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


def test_every_oracle_has_a_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracle_sql keys without queries(): {missing}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, ddb, name):
    qdf = QUERIES[name](spark, SF_DIR)
    spark_rows = qdf.collect()
    spark_cols = qdf.columns

    if name not in ORACLES:
        # rows-only contract: must run and have a stable schema
        assert len(spark_cols) > 0
        return

    cur = ddb.execute(ORACLES[name])
    duck_cols = [d[0] for d in cur.description]
    duck_rows = cur.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: columns {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: rows {len(spark_rows)} vs {len(duck_rows)}"
    )
    got = _normalize([tuple(r) for r in spark_rows], spark_cols)
    want = _normalize(duck_rows, duck_cols)
    assert got == want, f"{name}: value mismatch\n first got={got[:3]}\n first want={want[:3]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and len(df.columns) > 0
