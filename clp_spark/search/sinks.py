"""Search over persisted sink tables with segment-index pruning.

Re-expression of CLP's segment-level pruning
(/root/reference/components/core/src/clp/Query.hpp:103-121
calculate_ids_of_matching_segments: a segment is searched only if it
contains a candidate logtype ID / dictionary-var ID for the query;
indexes written per dictionary at DictionaryWriter.hpp:72).

Spark shape: compress writes two inverted-index tables
(sink_id, logtype_id) and (sink_id, var_id). At query time the compiled
token branches are evaluated at *sink* granularity first: a sink
survives a token iff some branch could hold there — its candidate
logtype IDs or var IDs appear in the sink's manifest, or the branch is
un-indexable (exact int/float encodings, 'any'). Sinks failing any
token are dropped with `sink_id.isin(...)`, which prunes whole
partition directories from the parquet scan before a single data row
is read. Pruning is a superset (never drops a matching sink); the
row-level prefilter + decode-confirm stages then run as usual.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from clp_spark.search.compiler import CompiledQuery, TokenPred, compile_query
from clp_spark.search.executor import _DictIndex, _has_meta, _load_index, search

# manifests above this many pairs are not collected; pruning degrades to
# "no sink pruning" (still exact — row-level stages remain)
_MAX_DRIVER_MANIFEST_PAIRS = 4_000_000


def _collect_pairs(df: DataFrame, key: str) -> dict | None:
    rows = df.limit(_MAX_DRIVER_MANIFEST_PAIRS + 1).collect()
    if len(rows) > _MAX_DRIVER_MANIFEST_PAIRS:
        return None
    out: dict = {}
    for r in rows:
        out.setdefault(r[key], set()).add(r["sink_id"])
    return out


def _token_sinks(
    tp: TokenPred, idx: _DictIndex, ignore_case: bool,
    lt_sinks: dict, var_sinks: dict | None,
) -> set | None:
    """Sinks where this token could possibly match; None = all sinks."""
    out: set = set()
    for br in tp.branches:
        k = br.kind
        if k in ("any", "enc"):
            return None  # encoded int/float values are not sink-indexed
        if k in ("logtype", "enc_int", "enc_float"):
            if k == "logtype":
                ids = idx.logtype_ids(br.pattern, ignore_case)
            else:
                from clp_spark.config import PLACEHOLDER_FLOAT, PLACEHOLDER_INT

                ids = idx.lt_with_placeholder(
                    PLACEHOLDER_INT if k == "enc_int" else PLACEHOLDER_FLOAT
                )
            if ids is None:
                return None
            for i in ids:
                out |= lt_sinks.get(i, set())
        elif k == "dictvar":
            if var_sinks is None:
                return None
            if _has_meta(br.pattern):
                ids = idx.var_ids(br.pattern, ignore_case)
            else:
                ids = idx.var_ids_exact(br.pattern, ignore_case)
            if ids is None:
                return None
            for i in ids:
                out |= var_sinks.get(i, set())
        elif k == "split":
            # split = AND of parts → intersection; part None ⇒ no info
            acc: set | None = None
            for part in br.parts:
                s = _token_sinks(part, idx, ignore_case, lt_sinks, var_sinks)
                if s is None:
                    continue
                acc = s if acc is None else (acc & s)
            if acc is None:
                return None
            out |= acc
    return out


def prune_sink_ids(
    cq: CompiledQuery,
    idx: _DictIndex,
    lt_manifest: DataFrame,
    var_manifest: DataFrame | None,
) -> list | None:
    """Sink ids that could contain matches; None = cannot prune."""
    if cq.match_all or idx is None:
        return None
    lt_sinks = _collect_pairs(lt_manifest, "logtype_id")
    if lt_sinks is None:
        return None
    var_sinks = (
        _collect_pairs(var_manifest, "var_id") if var_manifest is not None else None
    )
    surviving: set | None = None
    for tp in cq.tokens:
        s = _token_sinks(tp, idx, cq.ignore_case, lt_sinks, var_sinks)
        if s is None:
            continue
        surviving = s if surviving is None else (surviving & s)
    return None if surviving is None else sorted(surviving)


def search_sinks(
    spark: SparkSession,
    out_dir: str,
    query: str,
    **kwargs,
) -> DataFrame:
    """Search a persisted compress() output directory: sink-manifest
    pruning (stage 2) + the regular staged search. Accepts the same
    keyword arguments as executor.search."""
    sinks = spark.read.parquet(os.path.join(out_dir, "sinks"))
    lt_dict = spark.read.parquet(os.path.join(out_dir, "dicts", "logtype"))
    v_dict = spark.read.parquet(os.path.join(out_dir, "dicts", "var"))

    cq = compile_query(
        query,
        ignore_case=kwargs.get("ignore_case", False),
        substring=kwargs.get("substring", True),
    )
    man_dir = os.path.join(out_dir, "manifest")
    if not cq.match_all and os.path.isdir(man_dir):
        idx = _load_index(lt_dict, v_dict)
        if idx is not None:
            lt_man = spark.read.parquet(os.path.join(man_dir, "logtype"))
            var_man = spark.read.parquet(os.path.join(man_dir, "var"))
            keep = prune_sink_ids(cq, idx, lt_man, var_man)
            if keep is not None:
                sinks = sinks.filter(F.col("sink_id").isin(keep))
    return search(sinks, lt_dict, v_dict, query, **kwargs)
