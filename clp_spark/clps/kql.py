"""Minimal KQL front-end for the JSON engine.

Covers the core of the reference's grammar
(/root/reference/components/core/src/clp_s/search/kql/Kql.g4:1-80):

    expr     := or_expr
    or_expr  := and_expr (OR and_expr)*
    and_expr := unary (AND unary)*
    unary    := NOT unary | '(' expr ')' | condition
    condition:= path ':' value          — equality (or wildcard match)
              | path ':' '*'            — EXISTS
              | path (> >= < <=) number — range
    value    := "quoted string" | bare token (int / float / true /
                false / null / string; may contain * ? wildcards)

De Morgan / normalization passes (OrOfAndForm.*, ConstantProp.*) are
unnecessary here: conditions compile to Catalyst boolean Columns and
Catalyst's BooleanSimplification does the rest (SURVEY §2.6).

Not covered (v1): nested-object subqueries `a: {b: c}`, date ranges,
value lists — the reference's long tail.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from clp_spark.clps.encoder import JsonArchive
from clp_spark.clps.search import json_predicate, schema_candidates

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lpar>\()|(?P<rpar>\))
      | (?P<op>>=|<=|>|<|:)
      | (?P<quoted>"(?:[^"\\]|\\.)*")
      | (?P<word>[^\s():<>"]+)
    )""",
    re.X,
)


def _tokenize(q: str) -> list[tuple[str, str]]:
    out = []
    i = 0
    while i < len(q):
        m = _TOKEN_RE.match(q, i)
        if m is None:
            if q[i:].strip() == "":
                break
            raise ValueError(f"KQL tokenize error at: {q[i:]!r}")
        i = m.end()
        for kind in ("lpar", "rpar", "op", "quoted", "word"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                break
    return out


def _parse_value(tok_kind: str, tok: str):
    if tok_kind == "quoted":
        return tok[1:-1].replace('\\"', '"').replace("\\\\", "\\")
    low = tok.lower()
    if low == "true":
        return True
    if low == "false":
        return False
    if low == "null":
        return None
    try:
        return int(tok)
    except ValueError:
        pass
    try:
        return float(tok)
    except ValueError:
        pass
    return tok


class _Parser:
    def __init__(self, tokens, archive: JsonArchive):
        self.toks = tokens
        self.i = 0
        self.archive = archive
        self.prune_nodes: list[int] = []
        self.prunable = True  # only pure positive AND/atom trees prune

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def parse(self) -> Column:
        c = self.or_expr()
        if self.i != len(self.toks):
            raise ValueError(f"trailing tokens: {self.toks[self.i:]}")
        return c

    def or_expr(self) -> Column:
        c = self.and_expr()
        while self.peek() == ("word", "OR") or self.peek() == ("word", "or"):
            self.next()
            self.prunable = False
            c = c | self.and_expr()
        return c

    def and_expr(self) -> Column:
        c = self.unary()
        while self.peek() == ("word", "AND") or self.peek() == ("word", "and"):
            self.next()
            c = c & self.unary()
        return c

    def unary(self) -> Column:
        kind, tok = self.peek()
        if kind == "word" and tok in ("NOT", "not"):
            self.next()
            self.prunable = False
            return ~self.unary()
        if kind == "lpar":
            self.next()
            c = self.or_expr()
            k, _ = self.next()
            if k != "rpar":
                raise ValueError("expected ')'")
            return c
        return self.condition()

    def condition(self) -> Column:
        kind, path = self.next()
        if kind not in ("word", "quoted"):
            raise ValueError(f"expected a field name, got {path!r}")
        if kind == "quoted":
            path = path[1:-1]
        okind, op = self.next()
        if okind != "op":
            raise ValueError(f"expected an operator after {path!r}")
        vkind, vtok = self.next()
        if vkind not in ("word", "quoted"):
            raise ValueError(f"expected a value for {path!r}")
        if op == ":":
            if vkind == "word" and vtok == "*":
                pred, nodes = json_predicate(self.archive, path, "exists")
            else:
                pred, nodes = json_predicate(
                    self.archive, path, "eq", _parse_value(vkind, vtok)
                )
        else:
            cmp_op = {">": "gt", ">=": "gte", "<": "lt", "<=": "lte"}[op]
            val = _parse_value(vkind, vtok)
            if not isinstance(val, (int, float)) or isinstance(val, bool):
                raise ValueError("range comparison needs a numeric literal")
            pred, nodes = json_predicate(self.archive, path, cmp_op, val)
        self.prune_nodes += nodes
        return pred


def kql_query(archive: JsonArchive, query: str) -> DataFrame:
    """Filter the archive's encoded rows with a KQL expression."""
    p = _Parser(_tokenize(query), archive)
    pred = p.parse()
    df = archive.encoded
    if p.prunable and p.prune_nodes:
        # SchemaMatch: a pure AND-of-positive-conditions query can only
        # match records whose schema contains the referenced nodes
        sids = schema_candidates(archive, p.prune_nodes)
        if sids is not None:
            df = df.filter(F.col("schema_id").isin(sids))
    return df.filter(pred)
