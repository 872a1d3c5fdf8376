"""Search execution: 3-stage pruning, then decode+confirm survivors.

Mirrors the reference's staged search
(/root/reference/components/core/src/clp/Grep.cpp:81-139 and
Query.hpp:103-121,168-241):
  (1) timestamp-range predicate → parquet/Iceberg scan pruning (free);
  (2) logtype-dictionary wildcard match → candidate logtype-ID set
      (DictionaryReader.hpp:274-290); empty set ⇒ return empty, no scan;
  (3) variable conditions on encoded columns: int/float encodings via
      array_contains, dictionary vars resolved against the var dict
      (miss ⇒ empty) then arrays_overlap on dict_var_ids;
  (4) decode only surviving rows and wildcard-confirm (Grep.cpp:115-132).

All prefilters are supersets; the confirm is exact ⇒ results are exact.
Dictionary matching runs driver-side on the collected dict (CLP loads
dictionaries in memory too — DictionaryReader.hpp:241-290); above
`max_driver_dict_rows` it switches to an `rlike` filter + semi-join so
nothing ever requires the dict to fit on the driver.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from clp_spark.search.compiler import CompiledQuery, compile_query
from clp_spark.search.decode import decode_messages
from clp_spark.search.wildcard import wildcard_to_java_regex, wildcard_to_regex

# above this many candidate IDs, prefilter via broadcast semi-join
# instead of an isin literal list
_MAX_ISIN_IDS = 4096
# above this many dict rows, don't collect to the driver
_MAX_DRIVER_DICT_ROWS = 2_000_000


def _candidate_logtype_ids(
    logtype_dict: DataFrame, cq: CompiledQuery
) -> list[int] | DataFrame | None:
    """Logtype IDs whose template wildcard-matches the compiled pattern.

    Returns None for "no constraint", a list when small enough to
    collect, else a DataFrame of ids for a semi-join.
    """
    if cq.logtype_pattern is None:
        return None
    n = logtype_dict.count()
    if n <= _MAX_DRIVER_DICT_ROWS:
        rx = wildcard_to_regex(cq.logtype_pattern, cq.ignore_case)
        return [
            r["logtype_id"]
            for r in logtype_dict.select("logtype_id", "logtype").collect()
            if rx.fullmatch(r["logtype"]) is not None
        ]
    jrx = wildcard_to_java_regex(cq.logtype_pattern, cq.ignore_case)
    return logtype_dict.filter(
        F.col("logtype").rlike("\\A(?:" + jrx + ")\\z")
    ).select("logtype_id")


def _dict_var_ids(var_dict: DataFrame, tok: str, ignore_case: bool) -> list[int]:
    """Exact (or case-folded) variable-dictionary lookup → ID set.

    Reference: DictionaryReader.hpp:241-272 (exact) / :274-290 (set).
    """
    if ignore_case:
        hits = var_dict.filter(F.lower(F.col("value")) == tok.lower())
    else:
        hits = var_dict.filter(F.col("value") == tok)
    return [r["var_id"] for r in hits.select("var_id").limit(_MAX_ISIN_IDS).collect()]


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
) -> DataFrame:
    """Run a wildcard search over an encoded table. Returns matched rows
    (decoded text appended unless decode=False, in which case the caller
    gets the superset prefilter — useful for count-only pipelines that
    still confirm later)."""
    cq = compile_query(query, ignore_case=ignore_case, substring=substring)
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

    # (2) logtype-dictionary pushdown
    cand = _candidate_logtype_ids(logtype_dict, cq)
    if isinstance(cand, list):
        if not cand:
            return _empty_like(df, logtype_dict, var_dict, decode, text_col)
        if len(cand) <= _MAX_ISIN_IDS:
            df = df.filter(F.col("logtype_id").isin(cand))
        else:
            spark = df.sparkSession
            ids_df = spark.createDataFrame(
                [(int(i),) for i in cand], "logtype_id long"
            )
            df = df.join(F.broadcast(ids_df), "logtype_id", "left_semi")
    elif cand is not None:
        df = df.join(F.broadcast(cand), "logtype_id", "left_semi")

    # (3) variable conditions on encoded columns — no decode needed
    for v in cq.int_vars + cq.float_vars:
        df = df.filter(F.array_contains("encoded_vars", F.lit(int(v))))
    for tok in cq.dict_vars:
        ids = _dict_var_ids(var_dict, tok, cq.ignore_case)
        if not ids:
            return _empty_like(df, logtype_dict, var_dict, decode, text_col)
        df = df.filter(
            F.arrays_overlap(
                "dict_var_ids", F.array(*[F.lit(int(i)) for i in ids])
            )
        )

    # (3b) optional refinement: query vars must appear IN ORDER as a
    # subsequence of the message's encoded vars (Query.hpp:245-270).
    # Pure pruning — the confirm stage stays exact either way.
    if require_var_order and cq.ordered_vars:
        df = _filter_var_subsequence(df, cq, var_dict)

    if not decode:
        return df

    # (4) decode + confirm only survivors
    decoded = decode_messages(df, logtype_dict, var_dict, text_col)
    jrx = wildcard_to_java_regex(cq.confirm_pattern, cq.ignore_case)
    return decoded.filter(F.col(text_col).rlike("\\A(?:" + jrx + ")\\z"))


def _filter_var_subsequence(df, cq: CompiledQuery, var_dict):
    """Keep rows whose encoded_vars contain the query's variable
    encodings in query order (non-contiguous subsequence). Each query
    var is a set of acceptable int64s (dict vars may map to several IDs
    under ignore-case). Arrow-batched pandas pass."""
    import pandas as pd

    needles: list[frozenset] = []
    for kind, v in cq.ordered_vars:
        if kind in ("int", "float"):
            needles.append(frozenset((int(v),)))
        else:
            ids = _dict_var_ids(var_dict, v, cq.ignore_case)
            if not ids:
                return df.limit(0)
            needles.append(frozenset(int(i) for i in ids))

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
