"""Pre-validate the driver's correctness gate locally.

Runs every `__spark_entry__.queries()` entry on Spark at sf0.01 and its
`oracle_sql()` twin on DuckDB over the same parquet tables, then
compares the driver's way: row count, schema (sorted column names), and
a value hash over rows with columns sorted by name and every value
stringified. Prints one line per query and a final summary.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _vhash(rows: list[tuple]) -> str:
    h = hashlib.sha256()
    for r in sorted(str(r) for r in rows):
        h.update(r.encode())
    return h.hexdigest()[:16]


def _norm(v) -> str:
    # mirror the driver: stringify; floats via repr of rounding
    if isinstance(v, float):
        return f"{v:.6g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def main() -> None:
    import duckdb

    import __spark_entry__ as entrymod
    from clp_spark.session import get_spark

    spark = get_spark("correctness_check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    bad = []
    for name, fn in queries.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            s_cols = sorted(sdf.columns)
            s_rows = [
                tuple(_norm(r[c]) for c in s_cols) for r in sdf.collect()
            ]
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: spark error {ex}")
            bad.append(name)
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"skip {name}: no oracle ({len(s_rows)} spark rows)")
            continue
        try:
            cur = con.execute(sql)
            o_cols_raw = [d[0] for d in cur.description]
            o_all = cur.fetchall()
            order = sorted(range(len(o_cols_raw)), key=lambda i: o_cols_raw[i])
            o_cols = [o_cols_raw[i] for i in order]
            o_rows = [tuple(_norm(r[i]) for i in order) for r in o_all]
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: oracle error {ex}")
            bad.append(name)
            continue
        ok_rows = len(s_rows) == len(o_rows)
        ok_schema = s_cols == o_cols
        ok_hash = _vhash(s_rows) == _vhash(o_rows)
        status = "ok  " if (ok_rows and ok_schema and ok_hash) else "FAIL"
        if status == "FAIL":
            bad.append(name)
        print(
            f"{status} {name}: rows {len(s_rows)}/{len(o_rows)} "
            f"schema={ok_schema} hash={ok_hash} ({time.time() - t0:.1f}s)"
        )
        if not ok_schema:
            print(f"     spark cols:  {s_cols}")
            print(f"     oracle cols: {o_cols}")
        if ok_rows and ok_schema and not ok_hash:
            sset, oset = set(s_rows), set(o_rows)
            for r in list(sset - oset)[:3]:
                print(f"     spark-only:  {r}")
            for r in list(oset - sset)[:3]:
                print(f"     oracle-only: {r}")
    print(f"\n{'ALL GREEN' if not bad else 'FAILURES: ' + ', '.join(bad)}")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
