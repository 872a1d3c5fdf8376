"""Search over persisted sink tables with segment-index pruning.

Re-expression of CLP's segment-level pruning
(/root/reference/components/core/src/clp/Query.hpp:103-121
calculate_ids_of_matching_segments: a segment is searched only if it
contains a candidate logtype ID / dictionary-var ID for the query;
indexes written per dictionary at DictionaryWriter.hpp:72).

Spark shape: compress writes two inverted-index tables at SEGMENT
granularity — (sink_id, seg_id, logtype_id) and (sink_id, seg_id,
var_id) — plus a segment zone map (sink_id, seg_id, rows
[, ts_min, ts_max]). At query time the compiled token branches are
evaluated per segment: a segment survives a token iff some branch
could hold there — its candidate logtype IDs or var IDs appear in the
segment's manifest, or the branch is un-indexable (exact int/float
encodings, 'any'). A timestamp range additionally drops segments whose
zone-map [ts_min, ts_max] doesn't overlap it. Segments failing any
stage are dropped with a partition predicate over (sink_id, seg_id),
which prunes whole partition directories from the parquet scan before
a single data row is read. Pruning is a superset (never drops a
matching segment); the row-level prefilter + decode-confirm stages
then run as usual. Manifests from older archives without seg_id
degrade gracefully to sink-level pruning.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from clp_spark.search.compiler import CompiledQuery, TokenPred, compile_query
from clp_spark.search.executor import _DictIndex, _has_meta, _load_index, search

# manifests above this many pairs are not collected; pruning switches to
# the DISTRIBUTED path: surviving (sink, seg) units are computed as a
# manifest semi-join (Query.hpp:103-121's calculate_ids_of_matching_
# segments, which the reference also never materializes in one process —
# DictionaryWriter.hpp:72 streams per-dictionary indexes)
_MAX_DRIVER_MANIFEST_PAIRS = 4_000_000

# a distributed-pruning result this small collects back into a literal
# partition predicate (whole directories pruned from the scan); larger
# survivor sets stay as a semi-join against the sinks scan
_MAX_UNIT_LITERALS = 10_000

# collected manifest maps, keyed by (manifest DIRECTORY, freshness
# token) — stable across queries, unlike DataFrame ids, and invalidated
# when compress() rewrites the same out_dir (the parquet overwrite bumps
# the files' mtimes). CLP likewise keeps segment indexes in memory
# across queries; bounded LRU so old archives drop out.
from clp_spark.util import LruCache

_MANIFEST_CACHE: LruCache = LruCache(maxsize=8)


def _dir_token(path: str) -> int:
    """Freshness token for a manifest directory: max mtime_ns across its
    entries and one level of subdirectory entries. One scandir pass —
    cheap relative to a query — and any parquet overwrite rewrites the
    part files, bumping it."""
    tok = 0
    try:
        with os.scandir(path) as it:
            for e in it:
                try:
                    tok = max(tok, e.stat().st_mtime_ns)
                    if e.is_dir():
                        with os.scandir(e.path) as it2:
                            for e2 in it2:
                                tok = max(tok, e2.stat().st_mtime_ns)
                except OSError:
                    continue
    except OSError:
        pass
    return tok


def _manifest_cached(spark: SparkSession, man_dir: str):
    """(lt_pairs, var_pairs, unit_cols, lt_man_df, var_man_df) for an
    archive's token manifests; the collected pair maps are None above
    the driver cap (the DataFrames then drive the distributed path)."""
    from clp_spark.route.gc import _heal_dir

    _heal_dir(os.path.join(man_dir, "logtype"))
    _heal_dir(os.path.join(man_dir, "var"))
    key = (man_dir, _dir_token(man_dir))
    cached = _MANIFEST_CACHE.get(key)
    if cached is None:
        lt_man = spark.read.parquet(os.path.join(man_dir, "logtype"))
        var_man = spark.read.parquet(os.path.join(man_dir, "var"))
        cached = (
            _collect_pairs(lt_man, "logtype_id"),
            _collect_pairs(var_man, "var_id"),
            _unit_cols(lt_man),
            lt_man,
            var_man,
        )
        _MANIFEST_CACHE.put(key, cached)
    return cached


def _unit_cols(df: DataFrame) -> list[str]:
    """Prune-unit key: (sink_id, seg_id) when segments exist, else
    (sink_id,) for pre-segment archives."""
    return ["sink_id", "seg_id"] if "seg_id" in df.columns else ["sink_id"]


def _collect_pairs(df: DataFrame, key: str) -> tuple[dict, set] | None:
    """key value -> set of prune units; also returns the full unit set.
    None when the manifest exceeds the driver cap (degrade, don't
    truncate — a truncated map would under-prune unsoundly the other
    way: it would *drop* segments whose pairs fell past the cap)."""
    unit_cols = _unit_cols(df)
    rows = df.limit(_MAX_DRIVER_MANIFEST_PAIRS + 1).collect()
    if len(rows) > _MAX_DRIVER_MANIFEST_PAIRS:
        return None
    out: dict = {}
    all_units: set = set()
    for r in rows:
        u = tuple(r[c] for c in unit_cols)
        out.setdefault(r[key], set()).add(u)
        all_units.add(u)
    return out, all_units


def _token_units(
    tp: TokenPred, idx: _DictIndex, ignore_case: bool,
    lt_units: dict, var_units: dict | None,
) -> set | None:
    """Prune units where this token could match; None = all units."""
    out: set = set()
    for br in tp.branches:
        k = br.kind
        if k in ("any", "enc"):
            return None  # encoded int/float values are not segment-indexed
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
                out |= lt_units.get(i, set())
        elif k == "dictvar":
            if var_units is None:
                return None
            if _has_meta(br.pattern):
                ids = idx.var_ids(br.pattern, ignore_case)
            else:
                ids = idx.var_ids_exact(br.pattern, ignore_case)
            if ids is None:
                return None
            for i in ids:
                out |= var_units.get(i, set())
        elif k == "split":
            # split = AND of parts → intersection; part None ⇒ no info
            acc: set | None = None
            for part in br.parts:
                s = _token_units(part, idx, ignore_case, lt_units, var_units)
                if s is None:
                    continue
                acc = s if acc is None else (acc & s)
            if acc is None:
                return None
            out |= acc
    return out


def _prune_from_pairs(
    cq: CompiledQuery,
    idx: _DictIndex,
    lt: tuple | None,
    var: tuple | None,
    unit_cols: list[str],
) -> tuple[list, list[str]] | None:
    """(surviving prune units, unit column names) from already-collected
    manifest maps; None = cannot prune."""
    if cq.match_all or idx is None or lt is None:
        return None
    lt_units, _ = lt
    var_units = var[0] if var is not None else None
    surviving: set | None = None
    for tp in cq.tokens:
        s = _token_units(tp, idx, cq.ignore_case, lt_units, var_units)
        if s is None:
            continue
        surviving = s if surviving is None else (surviving & s)
    return None if surviving is None else (sorted(surviving), unit_cols)


def _ids_filter(df: DataFrame, col: str, ids) -> DataFrame:
    """df rows whose `col` is in the (driver-side, capped at
    _MAX_ISIN_IDS by the dict index) candidate ID set — one SQL IN."""
    if not ids:
        return df.limit(0)
    body = ",".join(str(int(i)) for i in sorted(ids))
    return df.filter(F.expr(f"{col} IN ({body})"))


def _token_units_df(
    tp: TokenPred,
    idx: _DictIndex,
    ignore_case: bool,
    lt_man: DataFrame,
    var_man: DataFrame | None,
    unit_cols: list[str],
) -> DataFrame | None:
    """Distributed twin of _token_units: a DataFrame of prune units where
    this token could match; None = unconstrained. Candidate dictionary
    IDs still come from the driver-side dict index (CLP's model — dicts
    are small by design), but the manifest membership runs as filters +
    semi-joins, so the manifests never have to fit on the driver."""
    parts: list[DataFrame] = []
    for br in tp.branches:
        k = br.kind
        if k in ("any", "enc"):
            return None
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
            parts.append(_ids_filter(lt_man, "logtype_id", ids).select(*unit_cols))
        elif k == "dictvar":
            if var_man is None:
                return None
            if _has_meta(br.pattern):
                ids = idx.var_ids(br.pattern, ignore_case)
            else:
                ids = idx.var_ids_exact(br.pattern, ignore_case)
            if ids is None:
                return None
            parts.append(_ids_filter(var_man, "var_id", ids).select(*unit_cols))
        elif k == "split":
            acc: DataFrame | None = None
            for part in br.parts:
                s = _token_units_df(part, idx, ignore_case, lt_man, var_man, unit_cols)
                if s is None:
                    continue
                acc = s if acc is None else acc.join(s, unit_cols, "left_semi")
            if acc is None:
                return None
            parts.append(acc)
    if not parts:
        return lt_man.select(*unit_cols).limit(0)  # token infeasible
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()


def _prune_units_distributed(
    cq: CompiledQuery,
    idx: _DictIndex,
    lt_man: DataFrame,
    var_man: DataFrame | None,
    unit_cols: list[str],
) -> DataFrame | None:
    """Distributed twin of _prune_from_pairs: intersect the per-token
    surviving-unit frames with semi-joins. None = cannot prune."""
    if cq.match_all or idx is None:
        return None
    surviving: DataFrame | None = None
    for tp in cq.tokens:
        s = _token_units_df(tp, idx, cq.ignore_case, lt_man, var_man, unit_cols)
        if s is None:
            continue
        surviving = s if surviving is None else surviving.join(
            s, unit_cols, "left_semi"
        )
    return surviving


def prune_segment_units(
    cq: CompiledQuery,
    idx: _DictIndex,
    lt_manifest: DataFrame,
    var_manifest: DataFrame | None,
) -> tuple[list, list[str]] | None:
    """(surviving prune units, unit column names); None = cannot prune."""
    if cq.match_all or idx is None:
        return None
    lt = _collect_pairs(lt_manifest, "logtype_id")
    var = _collect_pairs(var_manifest, "var_id") if var_manifest is not None else None
    return _prune_from_pairs(cq, idx, lt, var, _unit_cols(lt_manifest))


def prune_sink_ids(
    cq: CompiledQuery,
    idx: _DictIndex,
    lt_manifest: DataFrame,
    var_manifest: DataFrame | None,
) -> list | None:
    """Sink ids that could contain matches; None = cannot prune.
    Sink-granular view over prune_segment_units (kept for callers that
    only key on sink_id)."""
    r = prune_segment_units(cq, idx, lt_manifest, var_manifest)
    if r is None:
        return None
    units, _ = r
    return sorted({u[0] for u in units})


def unit_filter(units: list, unit_cols: list[str]):
    """Partition predicate selecting exactly these prune units.

    Grouped per sink — `sink_id == s AND seg_id IN (...)` OR'd across
    sinks — so Catalyst folds it into PartitionFilters and the parquet
    scan lists only the surviving sink/segment directories."""
    if not units:
        return F.lit(False)
    if len(unit_cols) == 1:
        return F.col("sink_id").isin([u[0] for u in units])
    by_sink: dict = {}
    for s, g in units:
        by_sink.setdefault(s, []).append(g)
    pred = None
    for s, segs in sorted(by_sink.items()):
        p = (F.col("sink_id") == s) & F.col("seg_id").isin(sorted(segs))
        pred = p if pred is None else (pred | p)
    return pred


def ts_surviving_units(
    seg_manifest: DataFrame, ts_range: tuple
) -> tuple[list, list[str]] | None:
    """Prune units whose zone-map [ts_min, ts_max] overlaps the query
    range (CLP's archive-level timestamp range pruning, SURVEY §4 row 1;
    Grep.cpp skips archives outside [begin_ts, end_ts]). None when the
    manifest carries no timestamp columns."""
    if "ts_min" not in seg_manifest.columns:
        return None
    lo, hi = ts_range
    df = seg_manifest
    if lo is not None:
        df = df.filter(F.col("ts_max") >= lo)
    if hi is not None:
        df = df.filter(F.col("ts_min") <= hi)
    unit_cols = _unit_cols(seg_manifest)
    rows = df.select(*unit_cols).collect()
    return [tuple(r[c] for c in unit_cols) for r in rows], unit_cols


def _ts_units_cached(
    spark: SparkSession, seg_dir: str, ts_range: tuple, ts_col: str
):
    """ts_surviving_units over a CACHED zone map: the segments table is
    one row per (sink, seg) — collect it once per archive, filter the
    driver-side copy per query (zone-map compares are trivial). The zone
    map applies ONLY when it was built from the query's ts_col (the
    manifest records its source in ts_src); a warc_ts zone map must not
    prune a ts_ms query. Manifests predating ts_src are treated as
    warc_ts-sourced (the historical default of segment_summary)."""
    from clp_spark.route.gc import _heal_dir

    _heal_dir(seg_dir)
    cached = _MANIFEST_CACHE.get(("segments", seg_dir, _dir_token(seg_dir)))
    if cached is None:
        seg = spark.read.parquet(seg_dir)
        if "ts_min" not in seg.columns:
            cached = (None, _unit_cols(seg), None)
        else:
            unit_cols = _unit_cols(seg)
            if "ts_src" in seg.columns:
                src_rows = seg.select("ts_src").limit(1).collect()
                ts_src = src_rows[0]["ts_src"] if src_rows else None
            else:
                ts_src = "warc_ts"
            rows = [
                (tuple(r[c] for c in unit_cols), r["ts_min"], r["ts_max"])
                for r in seg.select(*unit_cols, "ts_min", "ts_max").collect()
            ]
            cached = (rows, unit_cols, ts_src)
        _MANIFEST_CACHE.put(("segments", seg_dir, _dir_token(seg_dir)), cached)
    rows, unit_cols, ts_src = cached
    if rows is None or ts_src != ts_col:
        return None
    lo, hi = ts_range
    import datetime

    def _cmp_key(v):
        # ts bounds may arrive as ISO strings (executor semantics allow
        # string/timestamp comparison); normalize for the driver compare.
        # Applied to BOTH sides — a string-typed warc_ts column yields
        # string zone-map bounds, which must not str-vs-datetime crash.
        if isinstance(v, str):
            return datetime.datetime.fromisoformat(v)
        return v

    lo_k = _cmp_key(lo) if lo is not None else None
    hi_k = _cmp_key(hi) if hi is not None else None

    def _survives(tmin, tmax):
        # NULL bounds (an all-null-ts segment) mean "unknown": the zone
        # map cannot prove non-overlap, so the unit must SURVIVE — the
        # sound degrade direction (same rule as Spark's null-safe
        # filters in the DataFrame path this cache replaced)
        if tmin is None or tmax is None:
            return True
        try:
            return (lo_k is None or _cmp_key(tmax) >= lo_k) and (
                hi_k is None or _cmp_key(tmin) <= hi_k
            )
        except TypeError:
            # incomparable unit mix (e.g. int zone map vs datetime
            # query): cannot prove non-overlap — survive, never prune
            return True

    out = [u for u, tmin, tmax in rows if _survives(tmin, tmax)]
    return out, unit_cols


def surviving_unit_filter(
    spark: SparkSession,
    out_dir: str,
    query: str,
    ignore_case: bool = False,
    substring: bool = True,
    ts_range: tuple | None = None,
    ts_col: str = "warc_ts",
):
    """(predicate | None, provably_empty) for one archive: the combined
    token-manifest + ts-zone-map prune. predicate None = cannot prune;
    provably_empty = the archive cannot contain matches at all."""
    lt_dict = spark.read.parquet(os.path.join(out_dir, "dicts", "logtype"))
    v_dict = spark.read.parquet(os.path.join(out_dir, "dicts", "var"))
    cq = compile_query(query, ignore_case=ignore_case, substring=substring)
    man_dir = os.path.join(out_dir, "manifest")
    if not os.path.isdir(man_dir):
        return None, False
    units: set | None = None
    unit_cols: list[str] | None = None
    if not cq.match_all:
        idx = _load_index(lt_dict, v_dict)
        if idx is not None:
            lt_pairs, var_pairs, man_cols, lt_man, var_man = _manifest_cached(
                spark, man_dir
            )
            if lt_pairs is not None:
                r = _prune_from_pairs(cq, idx, lt_pairs, var_pairs, man_cols)
                if r is not None:
                    units, unit_cols = set(r[0]), r[1]
            else:
                # over-cap manifests: the archive-level verdict collects
                # only up to the literal cap; past it, leave the real
                # pruning to search_sinks' semi-join
                units_df = _prune_units_distributed(
                    cq, idx, lt_man, var_man, man_cols
                )
                if units_df is not None:
                    rows = units_df.limit(_MAX_UNIT_LITERALS + 1).collect()
                    if len(rows) <= _MAX_UNIT_LITERALS:
                        units = {tuple(r[c] for c in man_cols) for r in rows}
                        unit_cols = man_cols
    from clp_spark.route.gc import _heal_dir

    seg_dir = _heal_dir(os.path.join(man_dir, "segments"))
    if ts_range is not None and os.path.isdir(seg_dir):
        r = _ts_units_cached(spark, seg_dir, ts_range, ts_col)
        if r is not None:
            ts_units, ts_cols = set(r[0]), r[1]
            if units is None:
                units, unit_cols = ts_units, ts_cols
            elif unit_cols == ts_cols:
                units &= ts_units
    if units is None:
        return None, False
    if not units:
        return F.lit(False), True
    return unit_filter(sorted(units), unit_cols), False


def _plan_probes(cq: CompiledQuery):
    """Compile the query's tokens into archive-level existence probes.

    Returns (lt_conds, var_conds, tokens_req) where lt_conds/var_conds
    are Columns over the logtype/var dict schemas (probe i hits an
    archive iff any dict row satisfies cond i) and tokens_req is, per
    token, the list of branch requirement trees:
      None                -> branch unconstrained (token can't prune)
      ("lt"|"var", pid)   -> branch needs that probe to hit
      ("and", [trees])    -> split: every constrained part must hit
    """
    from clp_spark.config import PLACEHOLDER_FLOAT, PLACEHOLDER_INT
    from clp_spark.search.wildcard import wildcard_to_java_regex

    lt_conds: list = []
    var_conds: list = []
    lt_ids: dict = {}
    var_ids: dict = {}

    def lt_probe(key, cond):
        if key not in lt_ids:
            lt_ids[key] = len(lt_conds)
            lt_conds.append(cond)
        return ("lt", lt_ids[key])

    def var_probe(key, cond):
        if key not in var_ids:
            var_ids[key] = len(var_conds)
            var_conds.append(cond)
        return ("var", var_ids[key])

    def branch_tree(br):
        k = br.kind
        if k in ("any", "enc"):
            return None  # not archive-indexable: cannot prune via dicts
        if k == "logtype":
            jrx = wildcard_to_java_regex(br.pattern, cq.ignore_case)
            return lt_probe(
                ("lt", br.pattern),
                F.col("logtype").rlike("\\A(?:" + jrx + ")\\z"),
            )
        if k in ("enc_int", "enc_float"):
            ph = PLACEHOLDER_INT if k == "enc_int" else PLACEHOLDER_FLOAT
            return lt_probe(("ph", ph), F.col("logtype").contains(ph))
        if k == "dictvar":
            if _has_meta(br.pattern):
                jrx = wildcard_to_java_regex(br.pattern, cq.ignore_case)
                cond = F.col("value").rlike("\\A(?:" + jrx + ")\\z")
            elif cq.ignore_case:
                cond = F.lower(F.col("value")) == F.lit(br.pattern.lower())
            else:
                cond = F.col("value") == F.lit(br.pattern)
            return var_probe(("var", br.pattern), cond)
        if k == "split":
            parts = [t for p in br.parts for t in _token_trees(p)]
            constrained = [t for t in parts if t is not None]
            if not constrained:
                return None
            return ("and", constrained)
        return None

    def _token_trees(tp):
        # a token part inside a split is itself a TokenPred (OR of
        # branches); at archive level OR-of-branches collapses to: the
        # part is satisfied if ANY branch tree is satisfiable. For the
        # AND above we conservatively require only parts whose EVERY
        # branch is constrained (else the part can't prune).
        trees = [branch_tree(b) for b in tp.branches]
        if any(t is None for t in trees):
            return [None]
        if len(trees) == 1:
            return trees
        return [("or", trees)]

    tokens_req = []
    for tp in cq.tokens:
        tokens_req.append([branch_tree(br) for br in tp.branches])
    return lt_conds, var_conds, tokens_req


def _eval_tree(tree, lt_hits: set, var_hits: set) -> bool:
    if tree is None:
        return True
    op = tree[0]
    if op == "lt":
        return tree[1] in lt_hits
    if op == "var":
        return tree[1] in var_hits
    if op == "and":
        return all(_eval_tree(t, lt_hits, var_hits) for t in tree[1])
    if op == "or":
        return any(_eval_tree(t, lt_hits, var_hits) for t in tree[1])
    return True


def _norm_file_uri(p: str) -> str:
    from urllib.parse import unquote, urlparse

    u = urlparse(p)
    return unquote(u.path) if u.scheme else p


def plan_archives(
    spark: SparkSession,
    out_dirs: list,
    query: str,
    *,
    ignore_case: bool = False,
    substring: bool = True,
    ts_range: tuple | None = None,
    ts_col: str = "warc_ts",
) -> list:
    """Batched federated planning: the archive-level prune verdicts for
    ALL archives come from ONE Spark action over union scans of every
    archive's dictionaries (+ ts zone maps), instead of a per-archive
    driver loop (the reference plans across its archives in one SQL
    query against the metadata DB — query_scheduler.py:464-524; here
    the dict parquets ARE the metadata tables). O(1) planning jobs at
    any archive count. Conservative and therefore exact: an archive is
    dropped only when some required token provably has no candidate
    value/template there, or its ts zone map (same ts_src) proves no
    segment overlaps ts_range."""
    cq = compile_query(query, ignore_case=ignore_case, substring=substring)
    amap = {os.path.abspath(d): d for d in out_dirs}
    if cq.match_all and ts_range is None:
        return list(out_dirs)

    lt_conds, var_conds, tokens_req = (
        _plan_probes(cq) if not cq.match_all else ([], [], [])
    )

    def _agg_hits(sub: str, conds: list, tag: str):
        paths = [
            os.path.join(d, "dicts", sub)
            for d in out_dirs
            if os.path.isdir(os.path.join(d, "dicts", sub))
        ]
        if not conds or not paths:
            return None
        df = spark.read.parquet(*paths).withColumn(
            "_arch",
            F.regexp_extract(F.input_file_name(), f"(.*)/dicts/{sub}/[^/]+$", 1),
        )
        aggs = [
            F.max(c.cast("int")).alias(f"{tag}{i}") for i, c in enumerate(conds)
        ]
        return df.groupBy("_arch").agg(*aggs)

    lt_agg = _agg_hits("logtype", lt_conds, "l")
    var_agg = _agg_hits("var", var_conds, "v")

    ts_agg = None
    if ts_range is not None:
        seg_paths = [
            os.path.join(d, "manifest", "segments")
            for d in out_dirs
            if os.path.isdir(os.path.join(d, "manifest", "segments"))
        ]
        if seg_paths:
            try:
                seg = (
                    spark.read.option("mergeSchema", "true").parquet(*seg_paths)
                )
            except Exception:
                seg = None  # mixed zone-map types: skip ts planning
            if seg is not None and "ts_min" in seg.columns:
                seg = seg.withColumn(
                    "_arch",
                    F.regexp_extract(
                        F.input_file_name(), "(.*)/manifest/segments/[^/]+$", 1
                    ),
                )
                lo, hi = ts_range
                overlap = F.lit(True)
                if lo is not None:
                    overlap = overlap & (F.col("ts_max") >= F.lit(lo))
                if hi is not None:
                    overlap = overlap & (F.col("ts_min") <= F.lit(hi))
                if "ts_src" in seg.columns:
                    src_ok = F.col("ts_src") == F.lit(ts_col)
                else:
                    src_ok = F.lit(ts_col == "warc_ts")
                # prunable: the archive HAS a matching-source zone map;
                # alive: some segment of it overlaps the range
                ts_agg = seg.groupBy("_arch").agg(
                    F.max(src_ok.cast("int")).alias("_prunable"),
                    F.max((src_ok & overlap).cast("int")).alias("_alive"),
                )

    frames = [f for f in (lt_agg, var_agg, ts_agg) if f is not None]
    if not frames:
        return list(out_dirs)
    joined = frames[0]
    for f in frames[1:]:
        joined = joined.join(f, "_arch", "full_outer")
    rows = joined.collect()  # the ONE planning action

    by_arch = {}
    for r in rows:
        by_arch[os.path.abspath(_norm_file_uri(r["_arch"]))] = r

    survivors = []
    for ap, d in amap.items():
        r = by_arch.get(ap)
        if r is None:
            survivors.append(d)  # nothing readable to prune on: keep
            continue
        rd = r.asDict()
        lt_hits = {
            i for i in range(len(lt_conds)) if (rd.get(f"l{i}") or 0) >= 1
        }
        var_hits = {
            i for i in range(len(var_conds)) if (rd.get(f"v{i}") or 0) >= 1
        }
        alive = True
        for trees in tokens_req:
            if not any(_eval_tree(t, lt_hits, var_hits) for t in trees):
                alive = False
                break
        if alive and ts_agg is not None and (rd.get("_prunable") or 0) >= 1:
            alive = (rd.get("_alive") or 0) >= 1
        if alive:
            survivors.append(d)
    return survivors


def search_archives(
    spark: SparkSession,
    out_dirs: list,
    query: str,
    **kwargs,
) -> DataFrame:
    """Federated search across MANY compress() archives — the clg CLI's
    ARCHIVES-DIR shape (each archive searched with its own dictionaries;
    results unioned: Grep.cpp's per-archive loop). Archive-level
    pruning is BATCHED: one planning action over all archives'
    dictionaries + zone maps (plan_archives) decides which archives can
    match at all; only survivors get their per-archive staged search."""
    if not out_dirs:
        # the schema-preserving empty fallback below needs one archive
        # to borrow a schema from; a dynamic discovery that matched
        # nothing deserves a clear error, not an IndexError
        raise ValueError("search_archives: out_dirs is empty")
    survivors = plan_archives(
        spark,
        out_dirs,
        query,
        ignore_case=kwargs.get("ignore_case", False),
        substring=kwargs.get("substring", True),
        ts_range=kwargs.get("ts_range"),
        ts_col=kwargs.get("ts_col", "warc_ts"),
    )
    parts = [search_sinks(spark, d, query, **kwargs) for d in survivors]
    if not parts:
        # preserve the output schema: run one archive's (empty) search
        return search_sinks(spark, out_dirs[0], query, **kwargs).limit(0)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def search_sinks(
    spark: SparkSession,
    out_dir: str,
    query: str,
    **kwargs,
) -> DataFrame:
    """Search a persisted compress() output directory: segment-manifest
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
    if os.path.isdir(man_dir):
        units: set | None = None
        unit_cols: list[str] | None = None
        units_df: DataFrame | None = None
        if not cq.match_all:
            idx = _load_index(lt_dict, v_dict)
            if idx is not None:
                lt_pairs, var_pairs, man_cols, lt_man, var_man = (
                    _manifest_cached(spark, man_dir)
                )
                if lt_pairs is not None:
                    r = _prune_from_pairs(cq, idx, lt_pairs, var_pairs, man_cols)
                    if r is not None:
                        units, unit_cols = set(r[0]), r[1]
                else:
                    # manifests above the driver cap: distributed pruning
                    # (manifest filters + semi-joins; SURVEY §2.3's
                    # manifest semi-join shape)
                    units_df = _prune_units_distributed(
                        cq, idx, lt_man, var_man, man_cols
                    )
                    unit_cols = man_cols
        ts_range = kwargs.get("ts_range")
        from clp_spark.route.gc import _heal_dir

        seg_dir = _heal_dir(os.path.join(man_dir, "segments"))
        if ts_range is not None and os.path.isdir(seg_dir):
            r = _ts_units_cached(
                spark, seg_dir, ts_range, kwargs.get("ts_col", "warc_ts")
            )
            if r is not None:
                ts_units, ts_cols = set(r[0]), r[1]
                if units_df is not None:
                    if unit_cols == ts_cols:
                        units_df = units_df.filter(
                            unit_filter(sorted(ts_units), ts_cols)
                        )
                elif units is None:
                    units, unit_cols = ts_units, ts_cols
                elif unit_cols == ts_cols:
                    units &= ts_units
        if units_df is not None:
            # adaptive: a small survivor set collects into a literal
            # partition predicate (whole sink/segment directories pruned
            # at scan planning); a large one stays distributed as a
            # semi-join against the sinks scan
            rows = units_df.limit(_MAX_UNIT_LITERALS + 1).collect()
            if len(rows) <= _MAX_UNIT_LITERALS:
                units = {tuple(r[c] for c in unit_cols) for r in rows}
            else:
                sinks = sinks.join(units_df, unit_cols, "left_semi")
        if units is not None:
            sinks = sinks.filter(unit_filter(sorted(units), unit_cols))
    return search(sinks, lt_dict, v_dict, query, **kwargs)
