"""clp_s-style semi-structured JSON encoding, Spark-first.

Re-expression of the reference's second engine
(/root/reference/components/core/src/clp_s/):
  - Merged Parse Tree: every distinct (key-path, type) is a node
    (SchemaTree.hpp:33-50); per-record type inference at
    JsonParser.cpp:253-311 — a JSON string containing a space is a
    ClpString (tokenized into logtype + vars exactly like the
    unstructured engine), otherwise a VarString (whole-string dictionary
    entry); numbers split into Integer / Float.
  - Schema: the set of node IDs present in a record; identical schemas
    share a schema id (SchemaMap.cpp) — our analog of the per-schema
    tables, used for schema pruning at query time (SchemaMatch.hpp).
  - Typed columns (ColumnWriter.hpp:57-225) become per-record typed
    arrays: jvals = array<struct<node, enc, vars>> in document order,
    where `enc` is the int64 value (Integer), the bit-cast double
    (Float), 0/1 (Boolean), the var-dict ID (VarString / Array), or the
    logtype-dict ID with `vars` holding the encoded variables
    (ClpString — ClpString packs (logtype id, offset into a shared var
    stream) in the reference: ColumnWriter.hpp:185-194).

Spark shape: one Arrow pass parses + tokenizes, two distinct
aggregations build the node / logtype / var dictionaries with
deterministic value-sorted IDs (shared machinery with dicts.build), and
a second Arrow pass encodes. Dictionaries are driver-collected (CLP's
own model; MPTs are small) — above `driver_dict_cap` the encode raises
rather than silently degrade.

Key paths join nested keys with '.' — records whose keys contain '.'
would alias (documented v1 limitation; the reference uses structured
path vectors).
"""

from __future__ import annotations

import json
import struct as _struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from clp_spark.config import VT_DICT
from clp_spark.parse.tokenizer import parse_one

NODE_INT = 0
NODE_FLOAT = 1
NODE_BOOL = 2
NODE_NULL = 3
NODE_VARSTR = 4
NODE_CLPSTR = 5
NODE_ARRAY = 6
NODE_BIGNUM = 7  # integer outside int64 — value kept as decimal string

_INT64_MIN, _INT64_MAX = -(2**63), 2**63 - 1

_LEAF_SCHEMA = (
    "key string, tag int, ival long, sval string, logtype string, "
    "var_strs array<string>, var_types array<int>, enc_prelim array<long>"
)

JVALS_TYPE = "array<struct<node:long,enc:long,vars:array<long>>>"


def _f2bits(v: float) -> int:
    return _struct.unpack("<q", _struct.pack("<d", v))[0]


def _bits2f(b: int) -> float:
    return _struct.unpack("<d", _struct.pack("<q", b))[0]


def _walk(obj, path: str, out: list) -> None:
    """Flatten one parsed JSON record into typed leaves, document order.

    Type split per JsonParser.cpp:253-311; arrays are kept whole
    (UnstructuredArray) as their canonical JSON text."""
    if isinstance(obj, dict):
        for k, v in obj.items():
            _walk(v, f"{path}.{k}" if path else k, out)
        return
    if isinstance(obj, bool):
        out.append((path, NODE_BOOL, 1 if obj else 0, None, None))
    elif isinstance(obj, int):
        if _INT64_MIN <= obj <= _INT64_MAX:
            out.append((path, NODE_INT, obj, None, None))
        else:
            out.append((path, NODE_BIGNUM, 0, str(obj), None))
    elif isinstance(obj, float):
        out.append((path, NODE_FLOAT, _f2bits(obj), None, None))
    elif isinstance(obj, str):
        if " " in obj:
            lt, vs, vt, ev = parse_one(obj)
            out.append((path, NODE_CLPSTR, 0, None, (lt, vs, vt, ev)))
        else:
            out.append((path, NODE_VARSTR, 0, obj, None))
    elif obj is None:
        out.append((path, NODE_NULL, 0, None, None))
    elif isinstance(obj, list):
        out.append(
            (path, NODE_ARRAY, 0, json.dumps(obj, separators=(",", ":")), None)
        )
    else:  # pragma: no cover
        raise TypeError(f"unsupported JSON value: {type(obj)}")


def _parse_records(df: DataFrame, json_col: str, passthrough: list[str]) -> DataFrame:
    """Arrow pass 1: JSON text → typed leaves (+ ClpString tokenization)."""
    fields = []
    for part in _LEAF_SCHEMA.split(", "):
        name, typ = part.split(" ", 1)
        fields.append(f"{name}:{typ}")
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema
        if f.name in passthrough
    ) + f", leaves array<struct<{','.join(fields)}>>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            leaves_col = []
            for s in pdf[json_col]:
                rec: list = []
                _walk(json.loads(s), "", rec)
                rows = []
                for path, tag, ival, sval, clp in rec:
                    if clp is None:
                        rows.append((path, tag, ival, sval, None, None, None, None))
                    else:
                        lt, vs, vt, ev = clp
                        rows.append((path, tag, 0, None, lt, vs, vt, ev))
                leaves_col.append(rows)
            out = pdf[passthrough].copy()
            out["leaves"] = leaves_col
            yield out

    from clp_spark.util import spread

    return spread(df.select(*dict.fromkeys(passthrough + [json_col]))).mapInPandas(
        run, schema=out_schema
    )


class JsonArchive:
    """Encoded JSON table + its dictionaries (the clp_s archive analog:
    archive_constants.hpp:12-25 — schema tree, schema map, var/log
    dicts, typed tables)."""

    def __init__(self, encoded, tree, schema_map, logtype_dict, var_dict,
                 node_map, schema_ids):
        self.encoded = encoded            # DF: passthrough + schema_id + node_ids + jvals
        self.tree = tree                  # DF: node_id, path, tag
        self.schema_map = schema_map      # DF: schema_id, node_ids
        self.logtype_dict = logtype_dict  # DF: logtype_id, logtype
        self.var_dict = var_dict          # DF: var_id, value
        self.node_map = node_map          # {(path, tag): node_id}
        self.schema_ids = schema_ids      # {tuple(node_ids): schema_id}

    def save(self, out_dir: str) -> None:
        """Persist the archive (ArchiveWriter analog: schema_tree,
        schema_ids map, dicts, encoded tables — archive_constants.hpp:
        12-25). Encoded rows partition by schema_id — the per-schema
        table layout, so schema pruning becomes partition pruning."""
        import os

        (
            self.encoded.write.mode("overwrite")
            .partitionBy("schema_id")
            .parquet(os.path.join(out_dir, "tables"))
        )
        self.tree.write.mode("overwrite").parquet(os.path.join(out_dir, "schema_tree"))
        self.schema_map.write.mode("overwrite").parquet(
            os.path.join(out_dir, "schema_map")
        )
        self.logtype_dict.write.mode("overwrite").parquet(
            os.path.join(out_dir, "log_dict")
        )
        self.var_dict.write.mode("overwrite").parquet(os.path.join(out_dir, "var_dict"))

    @classmethod
    def load(cls, spark, out_dir: str) -> "JsonArchive":
        import os

        tree = spark.read.parquet(os.path.join(out_dir, "schema_tree"))
        schema_map = spark.read.parquet(os.path.join(out_dir, "schema_map"))
        node_map = {
            (r["path"], r["tag"]): r["node_id"] for r in tree.collect()
        }
        schema_ids = {
            tuple(r["node_ids"]): r["schema_id"] for r in schema_map.collect()
        }
        return cls(
            spark.read.parquet(os.path.join(out_dir, "tables")),
            tree,
            schema_map,
            spark.read.parquet(os.path.join(out_dir, "log_dict")),
            spark.read.parquet(os.path.join(out_dir, "var_dict")),
            node_map,
            schema_ids,
        )


def encode_json_df(
    df: DataFrame,
    json_col: str = "json",
    passthrough: list[str] | None = None,
    driver_dict_cap: int = 300_000,
) -> JsonArchive:
    """Compress a JSON-string column clp_s-style. Returns a JsonArchive."""
    spark = df.sparkSession
    if passthrough is None:
        passthrough = [c for c in df.columns if c != json_col]
    parsed = _parse_records(df, json_col, passthrough).persist()

    ex = parsed.select(F.explode("leaves").alias("l"))

    # ---- merged parse tree: distinct (path, tag) → value-sorted node ids
    node_rows = (
        ex.select("l.key", "l.tag").distinct().limit(driver_dict_cap + 1).collect()
    )
    if len(node_rows) > driver_dict_cap:
        raise NotImplementedError(
            "schema tree exceeds driver_dict_cap; distributed MPT build "
            "not implemented"
        )
    node_map = {
        (r["key"], r["tag"]): i
        for i, r in enumerate(
            sorted(node_rows, key=lambda r: (r["key"], r["tag"]))
        )
    }
    tree = spark.createDataFrame(
        [(v, k[0], k[1]) for k, v in node_map.items()],
        "node_id long, path string, tag int",
    )

    # ---- logtype dict (ClpString templates) + var dict (VarString/Array
    # whole values ∪ ClpString dictionary variables)
    lt_rows = (
        ex.filter(F.col("l.tag") == NODE_CLPSTR)
        .select(F.col("l.logtype").alias("logtype"))
        .distinct()
        .limit(driver_dict_cap + 1)
        .collect()
    )
    var_whole = ex.filter(
        F.col("l.tag").isin([NODE_VARSTR, NODE_ARRAY, NODE_BIGNUM])
    ).select(F.col("l.sval").alias("value"))
    var_clp = (
        ex.filter(F.col("l.tag") == NODE_CLPSTR)
        .select(F.explode(F.arrays_zip("l.var_strs", "l.var_types")).alias("z"))
        .filter(F.col("z.var_types") == VT_DICT)
        .select(F.col("z.var_strs").alias("value"))
    )
    var_rows = (
        var_whole.union(var_clp).distinct().limit(driver_dict_cap + 1).collect()
    )
    if len(lt_rows) > driver_dict_cap or len(var_rows) > driver_dict_cap:
        raise NotImplementedError("dictionary exceeds driver_dict_cap")
    lt_map = {v: i for i, v in enumerate(sorted(r["logtype"] for r in lt_rows))}
    v_map = {v: i for i, v in enumerate(sorted(r["value"] for r in var_rows))}
    logtype_dict = spark.createDataFrame(
        [(v, k) for k, v in lt_map.items()], "logtype_id long, logtype string"
    )
    var_dict = spark.createDataFrame(
        [(v, k) for k, v in v_map.items()], "var_id long, value string"
    )

    # ---- schema map: distinct present-node sets → stable schema ids
    b_nodes = spark.sparkContext.broadcast(node_map)

    def keysets(batches):
        nm = b_nodes.value
        for pdf in batches:
            out = []
            for leaves in pdf["leaves"]:
                ids = sorted({nm[(lf["key"], lf["tag"])] for lf in leaves})
                out.append(",".join(map(str, ids)))
            yield pd.DataFrame({"sk": out})

    sk_rows = (
        parsed.mapInPandas(keysets, schema="sk string")
        .distinct()
        .limit(driver_dict_cap + 1)
        .collect()
    )
    if len(sk_rows) > driver_dict_cap:
        raise NotImplementedError("schema count exceeds driver_dict_cap")
    schema_ids = {
        tuple(int(x) for x in sk.split(",") if x): i
        for i, sk in enumerate(sorted(r["sk"] for r in sk_rows))
    }
    schema_map = spark.createDataFrame(
        [(v, list(k)) for k, v in schema_ids.items()],
        "schema_id long, node_ids array<long>",
    )

    # ---- encode pass: leaves → jvals, schema_id
    b_lt = spark.sparkContext.broadcast(lt_map)
    b_v = spark.sparkContext.broadcast(v_map)
    b_sch = spark.sparkContext.broadcast(schema_ids)

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in parsed.schema
        if f.name != "leaves"
    ) + f", schema_id long, node_ids array<long>, jvals {JVALS_TYPE}"

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        nm = b_nodes.value
        ltm = b_lt.value
        vm = b_v.value
        sm = b_sch.value
        for pdf in batches:
            nid_col, jv_col, sid_col = [], [], []
            for leaves in pdf["leaves"]:
                jv = []
                present = set()
                for lf in leaves:
                    node = nm[(lf["key"], lf["tag"])]
                    present.add(node)
                    tag = lf["tag"]
                    if tag == NODE_CLPSTR:
                        enc_vars = []
                        for j, t in enumerate(lf["var_types"]):
                            if t == VT_DICT:
                                enc_vars.append(vm[lf["var_strs"][j]])
                            else:
                                enc_vars.append(int(lf["enc_prelim"][j]))
                        jv.append((node, ltm[lf["logtype"]], enc_vars))
                    elif tag in (NODE_VARSTR, NODE_ARRAY, NODE_BIGNUM):
                        jv.append((node, vm[lf["sval"]], None))
                    else:
                        jv.append((node, int(lf["ival"]), None))
                ids = tuple(sorted(present))
                nid_col.append(list(ids))
                jv_col.append(jv)
                sid_col.append(sm[ids])
            out = pdf.drop(columns=["leaves"])
            out["schema_id"] = sid_col
            out["node_ids"] = nid_col
            out["jvals"] = jv_col
            yield out

    encoded = parsed.mapInPandas(encode, schema=out_schema)
    return JsonArchive(
        encoded, tree, schema_map, logtype_dict, var_dict, node_map, schema_ids
    )


def reconstruct_json_df(
    archive: JsonArchive, out_col: str = "json"
) -> DataFrame:
    """Rebuild each record's JSON text (ordered extract analog:
    JsonConstructor.hpp:28-34). Output is canonical serialization —
    structurally equal to the input (the reference's integration tests
    compare JSON structurally too)."""
    spark = archive.encoded.sparkSession
    inv_nodes = {v: k for k, v in archive.node_map.items()}
    lt_rows = {r["logtype_id"]: r["logtype"] for r in archive.logtype_dict.collect()}
    v_rows = {r["var_id"]: r["value"] for r in archive.var_dict.collect()}
    b_nodes = spark.sparkContext.broadcast(inv_nodes)
    b_lt = spark.sparkContext.broadcast(lt_rows)
    b_v = spark.sparkContext.broadcast(v_rows)

    from clp_spark.search.decode import _fill_template, parse_template

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in archive.encoded.schema
    ) + f", {out_col} string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        nodes = b_nodes.value
        lts = b_lt.value
        vs = b_v.value
        tcache: dict = {}
        for pdf in batches:
            texts = []
            for jv in pdf["jvals"]:
                root: dict = {}
                for x in jv:
                    path, tag = nodes[x["node"]]
                    enc = int(x["enc"])
                    if tag == NODE_INT:
                        val = enc
                    elif tag == NODE_FLOAT:
                        val = _bits2f(enc)
                    elif tag == NODE_BOOL:
                        val = bool(enc)
                    elif tag == NODE_NULL:
                        val = None
                    elif tag == NODE_VARSTR:
                        val = vs[enc]
                    elif tag == NODE_BIGNUM:
                        val = int(vs[enc])
                    elif tag == NODE_ARRAY:
                        val = json.loads(vs[enc])
                    else:  # CLPSTR
                        tpl = tcache.get(enc)
                        if tpl is None:
                            tpl = tcache[enc] = parse_template(lts[enc])
                        val = _fill_template(tpl[0], tpl[1], list(x["vars"]), vs)
                    cur = root
                    parts = path.split(".")
                    for p in parts[:-1]:
                        cur = cur.setdefault(p, {})
                    cur[parts[-1]] = val
                texts.append(json.dumps(root, separators=(",", ":")))
            pdf = pdf.copy()
            pdf[out_col] = texts
            yield pdf

    return archive.encoded.mapInPandas(run, schema=out_schema)
