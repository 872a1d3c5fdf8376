"""Search execution: staged pruning, then decode+confirm survivors.

Mirrors the reference's staged search
(/root/reference/components/core/src/clp/Grep.cpp:81-139 and
Query.hpp:103-121,168-241):
  (1) timestamp-range predicate → parquet/Iceberg scan pruning (free);
  (2+3) the compiled per-token interpretation branches
      (compiler.py, GrepCore.hpp:139-403) become ONE Catalyst filter over
      the encoded columns: logtype-ID sets from wildcard matches against
      the logtype dictionary (DictionaryReader.hpp:274-290), var-ID sets
      from exact/wildcard var-dict scans → arrays_overlap, exact int/float
      encodings → array_contains. An infeasible token (dictionary miss)
      ⇒ empty result with no data scan;
  (4) decode only surviving rows and wildcard-confirm (Grep.cpp:115-132).

All prefilters are supersets; the confirm is exact ⇒ results are exact.
Dictionary matching runs driver-side on the collected dicts (CLP loads
dictionaries in memory too — DictionaryReader.hpp:241-290). Any ID set
larger than `_MAX_ISIN_IDS`, or a dictionary larger than
`_MAX_DRIVER_DICT_ROWS`, degrades that branch to *unconstrained* (never
truncated) so pruning weakens gracefully while staying a superset.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from clp_spark.config import PLACEHOLDER_FLOAT, PLACEHOLDER_INT
from clp_spark.search.compiler import CompiledQuery, TokenPred, compile_query
from clp_spark.search.decode import decode_messages
from clp_spark.search.wildcard import wildcard_to_java_regex, wildcard_to_regex

# above this many candidate IDs a branch stops constraining (supersets
# only — never a truncated ID list, which would drop matching rows)
_MAX_ISIN_IDS = 4096
# above this many dict rows, don't collect to the driver: search falls
# back to decode-everything + confirm (still exact), and decode_messages
# takes its join-based path
_MAX_DRIVER_DICT_ROWS = 2_000_000


class _DictIndex:
    """Driver-side dictionaries with memoized pattern matching."""

    def __init__(self, lt_rows, var_rows):
        self.lt_rows = lt_rows      # list[(logtype_id, logtype)]
        self.var_rows = var_rows    # list[(var_id, value)]
        self._cache: dict = {}

    def logtype_ids(self, pattern: str, ignore_case: bool):
        """IDs of templates fullmatching the wildcard pattern; None ⇒
        too many (degrade to unconstrained)."""
        key = ("lt", pattern, ignore_case)
        if key not in self._cache:
            rx = wildcard_to_regex(pattern, ignore_case)
            ids = {i for i, t in self.lt_rows if rx.fullmatch(t) is not None}
            self._cache[key] = None if len(ids) > _MAX_ISIN_IDS else ids
        return self._cache[key]

    def var_ids_exact(self, text: str, ignore_case: bool):
        key = ("vx", text, ignore_case)
        if key not in self._cache:
            if ignore_case:
                t = text.lower()
                ids = {i for i, v in self.var_rows if v.lower() == t}
            else:
                ids = {i for i, v in self.var_rows if v == text}
            self._cache[key] = None if len(ids) > _MAX_ISIN_IDS else ids
        return self._cache[key]

    def var_ids(self, pattern: str, ignore_case: bool):
        key = ("vw", pattern, ignore_case)
        if key not in self._cache:
            rx = wildcard_to_regex(pattern, ignore_case)
            ids = {i for i, v in self.var_rows if rx.fullmatch(v) is not None}
            self._cache[key] = None if len(ids) > _MAX_ISIN_IDS else ids
        return self._cache[key]

    def lt_with_placeholder(self, ph: str):
        """IDs of templates containing the placeholder byte (superset:
        escaped occurrences included — they are vanishingly rare)."""
        key = ("ph", ph)
        if key not in self._cache:
            self._cache[key] = {i for i, t in self.lt_rows if ph in t}
        return self._cache[key]


class _SparkDictIndex:
    """Distributed candidate-ID discovery for dictionaries too large to
    collect to the driver.

    The reference streams its dictionaries rather than requiring one
    process to hold them (DictionaryReader.hpp:241-290), and SURVEY
    §2.3 prescribes the fallback shape: filter the dict FRAME
    (`var_dict.filter(value rlike ...)`) and prune on the surviving
    IDs. Each pattern here becomes exactly that — a column-pruned scan
    over the dict parquet executed once and memoized; the bounded
    matching-ID set (≤ _MAX_ISIN_IDS, else unconstrained — the same
    degrade rule as the driver index) then feeds the same
    IN/arrays_overlap predicates, so stages 2–3 keep pruning above
    _MAX_DRIVER_DICT_ROWS instead of silently falling back to
    decode-everything + confirm. Duck-type-compatible with _DictIndex.
    """

    def __init__(self, lt_df: DataFrame, var_df: DataFrame):
        self.lt_df = lt_df
        self.var_df = var_df
        self._cache: dict = {}

    def _ids(self, key, df, id_col: str, cond: Column):
        if key not in self._cache:
            rows = (
                df.filter(cond).select(id_col).limit(_MAX_ISIN_IDS + 1).collect()
            )
            ids = {r[id_col] for r in rows}
            self._cache[key] = None if len(ids) > _MAX_ISIN_IDS else ids
        return self._cache[key]

    def _rlike(self, col: str, pattern: str, ignore_case: bool) -> Column:
        jrx = wildcard_to_java_regex(pattern, ignore_case)
        return F.col(col).rlike("\\A(?:" + jrx + ")\\z")

    def logtype_ids(self, pattern: str, ignore_case: bool):
        return self._ids(
            ("lt", pattern, ignore_case),
            self.lt_df,
            "logtype_id",
            self._rlike("logtype", pattern, ignore_case),
        )

    def var_ids_exact(self, text: str, ignore_case: bool):
        cond = (
            F.lower(F.col("value")) == F.lit(text.lower())
            if ignore_case
            else F.col("value") == F.lit(text)
        )
        return self._ids(("vx", text, ignore_case), self.var_df, "var_id", cond)

    def var_ids(self, pattern: str, ignore_case: bool):
        return self._ids(
            ("vw", pattern, ignore_case),
            self.var_df,
            "var_id",
            self._rlike("value", pattern, ignore_case),
        )

    def lt_with_placeholder(self, ph: str):
        """None when over the ID cap (the caller degrades that branch to
        unconstrained) — a truncated set would let the segment pruner
        drop units that match via an uncollected template."""
        return self._ids(
            ("ph", ph), self.lt_df, "logtype_id", F.col("logtype").contains(ph)
        )


# df_cache_key(dict frames) → (lt_df, v_df, _DictIndex | None); file-
# backed dicts key on their input-file lists (stable across re-reads,
# invalidated by rewrites); in-memory dicts key on id(), pinned by the
# cached DataFrame refs. One collect per corpus per session, not per
# query; bounded LRU so old corpora aren't pinned forever.
from clp_spark.util import LruCache, df_cache_key

_INDEX_CACHE: LruCache = LruCache(maxsize=8)


def _load_index(logtype_dict: DataFrame, var_dict: DataFrame):
    """Driver-side _DictIndex under _MAX_DRIVER_DICT_ROWS (one collect
    per corpus per session, memoized matching); above it, a
    _SparkDictIndex that answers the same candidate-set queries with
    distributed dict-frame filters — dictionary pushdown never silently
    turns off."""
    key = (df_cache_key(logtype_dict), df_cache_key(var_dict))
    hit = _INDEX_CACHE.get(key)
    if hit is not None:
        return hit[2]
    cap = _MAX_DRIVER_DICT_ROWS
    lt_rows = [
        (r["logtype_id"], r["logtype"])
        for r in logtype_dict.select("logtype_id", "logtype").limit(cap + 1).collect()
    ]
    idx = None
    if len(lt_rows) <= cap:
        v_rows = [
            (r["var_id"], r["value"])
            for r in var_dict.select("var_id", "value").limit(cap + 1).collect()
        ]
        if len(v_rows) <= cap:
            idx = _DictIndex(lt_rows, v_rows)
    if idx is None:
        idx = _SparkDictIndex(logtype_dict, var_dict)
    _INDEX_CACHE.put(key, (logtype_dict, var_dict, idx))
    return idx


def _has_meta(pattern: str) -> bool:
    i, n = 0, len(pattern)
    while i < n:
        c = pattern[i]
        if c == "\\" and i + 1 < n:
            i += 2
            continue
        if c in ("*", "?"):
            return True
        i += 1
    return False


def _id_set_pred(col: str, ids, overlap: bool) -> Column:
    """Membership predicate for an int ID set, built as ONE SQL string.

    Column.isin(ids) / F.array(*lits) marshal one py4j Literal per ID —
    ~1 ms each, so a 4000-ID set costs seconds of driver time per query.
    A single F.expr string is one py4j call and one parse (measured
    ~10× faster at 4k IDs); execution plans are identical (In/InSet).
    """
    body = ",".join(str(int(i)) for i in sorted(ids))
    if overlap:
        return F.expr(f"arrays_overlap({col}, array({body}))")
    return F.expr(f"{col} IN ({body})")


def _token_pred(tp: TokenPred, idx: _DictIndex, ignore_case: bool):
    """One token's OR-of-branches → Column | None (unconstrained) |
    False (infeasible ⇒ whole query is empty)."""
    lt_ids: set = set()
    conds: list[Column] = []
    for br in tp.branches:
        k = br.kind
        if k == "any":
            return None
        if k == "logtype":
            ids = idx.logtype_ids(br.pattern, ignore_case)
            if ids is None:
                return None
            lt_ids |= ids
        elif k in ("enc_int", "enc_float"):
            ids = idx.lt_with_placeholder(
                PLACEHOLDER_INT if k == "enc_int" else PLACEHOLDER_FLOAT
            )
            if ids is None:  # _SparkDictIndex over the ID cap
                return None
            lt_ids |= ids
        elif k == "enc":
            conds.append(F.array_contains("encoded_vars", F.lit(int(br.value))))
        elif k == "dictvar":
            if _has_meta(br.pattern):
                ids = idx.var_ids(br.pattern, ignore_case)
            else:
                ids = idx.var_ids_exact(br.pattern, ignore_case)
            if ids is None:
                return None
            if ids:
                conds.append(_id_set_pred("dict_var_ids", ids, overlap=True))
        elif k == "split":
            sub: list[Column] = []
            dead = False
            for part in br.parts:
                p = _token_pred(part, idx, ignore_case)
                if p is False:
                    dead = True
                    break
                if p is not None:
                    sub.append(p)
            if dead:
                continue  # this split interpretation is impossible
            if not sub:
                return None  # split interpretation is unconstrained
            c = sub[0]
            for s in sub[1:]:
                c = c & s
            conds.append(c)
    if lt_ids:
        if len(lt_ids) > _MAX_ISIN_IDS:
            return None
        conds.append(_id_set_pred("logtype_id", lt_ids, overlap=False))
    if not conds:
        return False
    out = conds[0]
    for c in conds[1:]:
        out = out | c
    return out


def search(
    encoded: DataFrame,
    logtype_dict: DataFrame,
    var_dict: DataFrame,
    query: str,
    ignore_case: bool = False,
    substring: bool = True,
    ts_range: tuple | None = None,
    ts_col: str = "warc_ts",
    path_filter: str | None = None,
    path_col: str = "url",
    decode: bool = True,
    text_col: str = "text",
    require_var_order: bool = False,
    precompiled=None,
) -> DataFrame:
    """Run a wildcard search over an encoded table. Returns matched rows
    (decoded text appended unless decode=False, in which case the caller
    gets the superset prefilter — useful for count-only pipelines that
    still confirm later). `precompiled` lets an alternate front-end (the
    schema/DFA compiler, schema_search.py) supply the CompiledQuery
    while the staged execution stays shared."""
    cq = precompiled or compile_query(
        query, ignore_case=ignore_case, substring=substring
    )
    df = encoded

    # (1) timestamp range — inclusive bounds, pushed to the scan
    if ts_range is not None:
        lo, hi = ts_range
        if lo is not None:
            df = df.filter(F.col(ts_col) >= lo)
        if hi is not None:
            df = df.filter(F.col(ts_col) <= hi)
    if path_filter is not None:
        df = df.filter(F.col(path_col) == path_filter)

    if cq.match_all:
        return decode_messages(df, logtype_dict, var_dict, text_col) if decode else df

    # (2+3) dictionary pushdown: one Catalyst predicate per token
    idx = _load_index(logtype_dict, var_dict)
    if idx is not None:
        for tp in cq.tokens:
            p = _token_pred(tp, idx, cq.ignore_case)
            if p is False:
                return _empty_like(df, logtype_dict, var_dict, decode, text_col)
            if p is not None:
                df = df.filter(p)

        # (3b) optional refinement: query vars must appear IN ORDER as a
        # subsequence of the message's encoded vars (Query.hpp:245-270).
        # Pure pruning — the confirm stage stays exact either way.
        if require_var_order and cq.ordered_vars:
            df = _filter_var_subsequence(df, cq, idx)
            if df is None:
                return _empty_like(
                    encoded.limit(0), logtype_dict, var_dict, decode, text_col
                )

    if not decode:
        return df

    # (4) decode + confirm only survivors
    decoded = decode_messages(df, logtype_dict, var_dict, text_col)
    jrx = wildcard_to_java_regex(cq.confirm_pattern, cq.ignore_case)
    return decoded.filter(F.col(text_col).rlike("\\A(?:" + jrx + ")\\z"))


def _filter_var_subsequence(df, cq: CompiledQuery, idx: _DictIndex):
    """Keep rows whose encoded_vars contain the query's variable
    encodings in query order (non-contiguous subsequence). Each query
    var is a set of acceptable int64s (dict vars may map to several IDs
    under ignore-case). Arrow-batched pandas pass. Returns None when a
    dictionary miss makes the query unsatisfiable."""
    import pandas as pd

    needles: list[frozenset] = []
    for kind, v in cq.ordered_vars:
        if kind in ("int", "float"):
            needles.append(frozenset((int(v),)))
        else:
            ids = idx.var_ids_exact(v, cq.ignore_case)
            if ids is None:
                continue  # oversized set: skip this needle (stay superset)
            if not ids:
                return None
            needles.append(frozenset(int(i) for i in ids))
    if not needles:
        return df

    spark = df.sparkSession
    b_needles = spark.sparkContext.broadcast(needles)
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema
    )

    def run(batches):
        nd = b_needles.value
        k = len(nd)
        for pdf in batches:
            mask = []
            for ev in pdf["encoded_vars"]:
                j = 0
                for x in ev:
                    if j < k and int(x) in nd[j]:
                        j += 1
                mask.append(j == k)
            yield pdf[pd.Series(mask, index=pdf.index)]

    return df.mapInPandas(run, schema=out_schema)


def _empty_like(df, logtype_dict, var_dict, decode, text_col):
    empty = df.limit(0)
    if decode:
        return decode_messages(empty, logtype_dict, var_dict, text_col)
    return empty


# ---- output modes (reference: clo/OutputHandler.hpp) ----


def count_matches(matches: DataFrame) -> DataFrame:
    """--count: single-row total (CountOperator.hpp:14-31 — partial+final
    merge is Catalyst's HashAggregate)."""
    return matches.agg(F.count("*").alias("n"))


def count_by_time(
    matches: DataFrame, bucket_ms: int, ts_col: str = "warc_ts"
) -> DataFrame:
    """--count-by-time B: bucket = floor(ts_ms / B) * B
    (clo/OutputHandler.hpp:271-273)."""
    ts_ms = (F.unix_timestamp(F.col(ts_col)) * 1000 +
             (F.date_format(F.col(ts_col), "SSS")).cast("long"))
    bucket = (F.floor(ts_ms / F.lit(bucket_ms)) * F.lit(bucket_ms)).alias("bucket")
    return matches.groupBy(bucket).agg(F.count("*").alias("n")).orderBy("bucket")


def topk_latest(
    matches: DataFrame, k: int, ts_col: str = "warc_ts", tiebreak: str | None = None
) -> DataFrame:
    """Bounded top-k latest results (clo/OutputHandler.hpp:190-223's
    min-heap → Catalyst TakeOrderedAndProject, no full sort)."""
    order = [F.col(ts_col).desc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).desc())
    return matches.orderBy(*order).limit(k)
