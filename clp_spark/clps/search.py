"""KQL-style filters over an encoded JSON archive.

The reference parses KQL → AST → normalization → schema match → typed
per-column evaluation (clp_s/search/: kql.cpp, OrOfAndForm, SchemaMatch,
QueryRunner.cpp:321-460 with FilterOperation.hpp:8-17 ops). Spark-first:
the AST/normalization layer IS Catalyst — this module only compiles one
(path, op, value) condition into (a) a schema-id prune (SchemaMatch
analog: only schemas containing the path's nodes can satisfy EXISTS /
comparisons) and (b) an `exists()` predicate over the typed jvals array.
Conditions compose with plain `&`/`|` DataFrame logic.

Ops: EQ NEQ LT GT LTE GTE EXISTS NEXISTS (FilterOperation.hpp:8-17).
Numeric comparisons apply to Integer nodes (and exact-EQ to Boolean);
Float ranges would need order-preserving decode of the bit-cast double
and are out of scope v1 (EQ on an exact double works via bit equality).
String EQ resolves VarStrings through the var dictionary and ClpStrings
through logtype+vars equality — encoding is injective, so no
decode-confirm stage is needed for exact matches.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

from clp_spark.clps.encoder import (
    NODE_BOOL,
    NODE_CLPSTR,
    NODE_FLOAT,
    NODE_INT,
    NODE_NULL,
    NODE_VARSTR,
    JsonArchive,
    _f2bits,
)
from clp_spark.config import VT_DICT
from clp_spark.parse.tokenizer import parse_one

_CMP = {"lt": "<", "gt": ">", "lte": "<=", "gte": ">=", "eq": "=", "neq": "!="}


def _nodes_for_path(archive: JsonArchive, path: str, tags=None) -> list[int]:
    return sorted(
        nid
        for (p, t), nid in archive.node_map.items()
        if p == path and (tags is None or t in tags)
    )


def schema_candidates(archive: JsonArchive, node_ids: list[int]) -> list[int]:
    """Schema ids whose node set intersects node_ids (SchemaMatch
    analog — archives/tables for other schemas are skipped entirely:
    Output.cpp:66-72)."""
    nodes = set(node_ids)
    return sorted(
        sid for ids, sid in archive.schema_ids.items() if nodes & set(ids)
    )


def _exists_pred(nodes: list[int], value_pred: str | None) -> Column:
    ns = ",".join(map(str, nodes)) or "-1"
    cond = f"array_contains(array({ns}), x.node)"
    if value_pred is not None:
        cond += f" AND ({value_pred})"
    return F.expr(f"exists(jvals, x -> {cond})")


def json_filter(
    archive: JsonArchive,
    path: str,
    op: str,
    value=None,
    prune_schemas: bool = True,
):
    """encoded-rows filter for one condition; returns the filtered DF."""
    op = op.lower()
    df = archive.encoded

    if op in ("exists", "nexists"):
        nodes = _nodes_for_path(archive, path)
        pred = F.arrays_overlap(
            "node_ids", F.array(*[F.lit(int(n)) for n in nodes] or [F.lit(-1)])
        )
        return df.filter(~pred if op == "nexists" else pred)

    if op not in _CMP:
        raise ValueError(f"unknown op: {op}")

    preds: list[Column] = []
    all_nodes: list[int] = []
    # NEQ = "path exists with a value != literal"; build the EQ predicate
    # and negate it against path-presence below
    cmp_op = "eq" if op == "neq" else op
    if isinstance(value, bool):
        nodes = _nodes_for_path(archive, path, {NODE_BOOL})
        if nodes and op in ("eq", "neq"):
            preds.append(_exists_pred(nodes, f"x.enc {_CMP[cmp_op]} {1 if value else 0}"))
            all_nodes += nodes
    elif isinstance(value, int):
        nodes = _nodes_for_path(archive, path, {NODE_INT})
        if nodes:
            preds.append(_exists_pred(nodes, f"x.enc {_CMP[cmp_op]} {int(value)}L"))
            all_nodes += nodes
    elif isinstance(value, float):
        nodes = _nodes_for_path(archive, path, {NODE_FLOAT})
        if nodes and op in ("eq", "neq"):
            preds.append(_exists_pred(nodes, f"x.enc {_CMP[cmp_op]} {_f2bits(value)}L"))
            all_nodes += nodes
    elif value is None:
        nodes = _nodes_for_path(archive, path, {NODE_NULL})
        if nodes and op in ("eq", "neq"):
            preds.append(_exists_pred(nodes, None))
            all_nodes += nodes
    elif isinstance(value, str):
        if op in ("eq", "neq"):
            if " " in value:
                lt, vs, vt, ev = parse_one(value)
                lt_rows = {
                    r["logtype"]: r["logtype_id"]
                    for r in archive.logtype_dict.filter(
                        F.col("logtype") == lt
                    ).collect()
                }
                if lt in lt_rows:
                    enc = list(ev)
                    ok = True
                    v_map = {
                        r["value"]: r["var_id"]
                        for r in archive.var_dict.filter(
                            F.col("value").isin([s for s, t in zip(vs, vt) if t == VT_DICT])
                        ).collect()
                    }
                    for j, t in enumerate(vt):
                        if t == VT_DICT:
                            if vs[j] not in v_map:
                                ok = False
                                break
                            enc[j] = v_map[vs[j]]
                    if ok:
                        nodes = _nodes_for_path(archive, path, {NODE_CLPSTR})
                        arr = ",".join(f"{int(x)}L" for x in enc)
                        preds.append(
                            _exists_pred(
                                nodes,
                                f"x.enc = {lt_rows[lt]}L AND x.vars = array({arr})",
                            )
                        )
                        all_nodes += nodes
            else:
                vrow = archive.var_dict.filter(F.col("value") == value).collect()
                if vrow:
                    nodes = _nodes_for_path(archive, path, {NODE_VARSTR})
                    preds.append(
                        _exists_pred(nodes, f"x.enc = {vrow[0]['var_id']}L")
                    )
                    all_nodes += nodes
        else:
            raise NotImplementedError("string range comparisons: v1 scope")

    if op == "neq":
        # NEQ semantics: the path exists with a value ≠ literal — i.e. the
        # record has one of the path's nodes and NOT(value == literal)
        nodes_any = _nodes_for_path(archive, path)
        has = F.arrays_overlap(
            "node_ids", F.array(*[F.lit(int(n)) for n in nodes_any] or [F.lit(-1)])
        )
        eq_pred = preds[0] if preds else F.lit(False)
        out = df.filter(has & ~eq_pred)
        return out

    if not preds:
        return df.limit(0)  # dictionary/tree miss ⇒ provably empty
    pred = preds[0]
    for p in preds[1:]:
        pred = pred | p

    if prune_schemas and all_nodes:
        sids = schema_candidates(archive, all_nodes)
        df = df.filter(F.col("schema_id").isin(sids))
    return df.filter(pred)
