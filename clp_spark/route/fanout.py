"""Fan-out routing: encoded rows → per-(logtype, lang)-hash sink tables.

This is the Spark re-expression of GLT's group-by-logtype storage
(reference: glt/streaming_archive/writer/LogtypeTable.hpp:13-17 — all
messages of one logtype stored together, small tables merged into
combined tables). Here: sink_id = pmod(xxhash64(logtype_id, lang), K),
one parquet (stand-in for Iceberg) partition per sink, written in a
single job via partitionBy.

Skew (north_rule requires explicit handling): template frequencies are
Zipf-like, so a plain repartition("sink_id") would send the hot
logtype's sink to one task. We detect hot logtypes with a cheap count
aggregate and salt the shuffle key for those rows only, so the hot
sink's data spreads over `num_salt_buckets` tasks while cold sinks stay
un-salted (no extra files). AQE skew-join/coalesce stays on as backstop.

Per-sink aggregates (FIXTURES.md §3 sink_metrics) are the pipeline's
aggregate contract: rows, logtype/var cardinalities, encoded byte sizes —
all Catalyst partial+final hash aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from clp_spark.config import PipelineConfig


def add_sink_id(
    encoded: DataFrame, num_sinks: int, cols: tuple = ("logtype_id", "lang")
) -> DataFrame:
    cols = tuple(c for c in cols if c in encoded.columns) or ("logtype_id",)
    return encoded.withColumn(
        "sink_id", F.pmod(F.xxhash64(*cols), F.lit(num_sinks))
    )


def segment_expr(
    df: DataFrame,
    num_segments: int,
    window_days: float = 7.0,
    ts_cols: tuple = ("warc_ts", "ts_ms"),
    key_cols: tuple = ("url", "doc_id", "event_id"),
):
    """The seg_id Column for `df` (shared by add_seg_id and the
    dict-phase routing-count aggregation, so both compute IDENTICAL
    window ids — the analytic route boundaries depend on it)."""
    ts = next((c for c in ts_cols if c in df.columns), None)
    if ts is not None:
        dt = dict(df.dtypes)[ts]
        epoch_s = (
            F.unix_timestamp(F.col(ts)).cast("double")
            if dt.startswith("timestamp") or dt == "date"
            else F.col(ts).cast("double") / F.lit(1000.0)
        )
        seg = F.floor(
            F.coalesce(epoch_s, F.lit(0.0)) / F.lit(86400.0 * window_days)
        )
    else:
        key = next((c for c in key_cols if c in df.columns), "logtype_id")
        seg = F.pmod(F.xxhash64(key), F.lit(num_segments))
    return seg.cast("long"), ts


def add_seg_id(
    encoded: DataFrame,
    num_segments: int,
    window_days: float = 7.0,
    ts_cols: tuple = ("warc_ts", "ts_ms"),
    key_cols: tuple = ("url", "doc_id", "event_id"),
) -> DataFrame:
    """Split each sink into segments (the CLP segment analog —
    reference segments are ingest-order-contiguous, so dictionary IDs
    and timestamps CLUSTER per segment; that clustering is what makes
    the per-segment index prune below archive level).

    Time-windowed when a timestamp column exists: seg_id =
    floor(epoch / window). Contiguous time ranges per segment mean the
    zone map [ts_min, ts_max] aligns exactly with the window and rare
    ids (which cluster in time in real logs) hit few segments. Null
    timestamps land in window 0 — sound, because a NULL ts never
    matches a ts-range predicate anyway, and token pruning still sees
    the row's ids in segment 0's manifest. Falls back to a
    row-identity hash mod num_segments when no ts column is present.
    Either way seg_id is row-deterministic at any parallelism, so
    per-sink aggregates stay exact across cluster sizes."""
    seg, _ = segment_expr(encoded, num_segments, window_days, ts_cols, key_cols)
    return encoded.withColumn("seg_id", seg)


def segment_summary(encoded_with_seg: DataFrame) -> DataFrame:
    """ONE pass fusing the per-SEGMENT metric aggregates with the
    logtype inverted index and the timestamp zone map (sink_id, seg_id,
    rows, n_encoded_vars, encoded_bytes, raw_bytes, lt_set
    [, ts_min, ts_max]). Per-sink metrics re-aggregate from this tiny
    frame; the manifests explode from it — the big frame is scanned
    once for all of them."""
    aggs = [
        F.count("*").alias("rows"),
        F.sum(F.size("encoded_vars")).alias("n_encoded_vars"),
        F.sum(F.expr("8 + 8 + 8 * size(encoded_vars)")).alias("encoded_bytes"),
        F.sum("raw_bytes").alias("raw_bytes"),
        F.sort_array(F.collect_set("logtype_id")).alias("lt_set"),
    ]
    ts_src = None
    for c in ("warc_ts", "ts_ms"):
        if c in encoded_with_seg.columns:
            aggs += [F.min(c).alias("ts_min"), F.max(c).alias("ts_max")]
            ts_src = c
            break
    out = encoded_with_seg.groupBy("sink_id", "seg_id").agg(*aggs)
    if ts_src is not None:
        # record WHICH column fed the zone map so search only applies it
        # to queries filtering on that same column (an archive can carry
        # both warc_ts and ts_ms; pruning a ts_ms query with warc_ts
        # stats would be unsound)
        out = out.withColumn("ts_src", F.lit(ts_src))
    return out


def detect_hot_logtypes(encoded: DataFrame, threshold_fraction: float) -> list[int]:
    """Logtype IDs whose row share exceeds the threshold (driver-side list).

    One cheap pre-aggregated count pass; the result is tiny (it is at most
    1/threshold entries) so collecting it is safe at any scale.
    """
    counts = encoded.groupBy("logtype_id").count()
    total = encoded.count()
    hot = counts.filter(F.col("count") >= threshold_fraction * total)
    return [r["logtype_id"] for r in hot.collect()]


def hot_logtypes_from_dict(
    logtype_dict: DataFrame, threshold_fraction: float
) -> list[int]:
    """Hot-template IDs straight from the dictionary's n_rows column —
    zero extra scans of the data (build_logtype_dict counts ride along
    with the distinct aggregation)."""
    agg = logtype_dict.agg(F.sum("n_rows").alias("total")).collect()[0]
    total = agg["total"] or 0
    hot = logtype_dict.filter(
        F.col("n_rows") >= F.lit(threshold_fraction * total)
    )
    return [r["logtype_id"] for r in hot.select("logtype_id").collect()]


def murmur3_long(value: int, seed: int = 42) -> int:
    """Spark's Murmur3Hash (Murmur3_x86_32.hashLong, public MurmurHash3
    spec) of a LongType value — the hash behind `repartition(n, col)`
    placement (HashPartitioning = pmod(murmur3(col), n)). Implemented
    driver-side so the analytic route can pick 'magic' key values that
    land rows in exact partition indexes. Parity-tested against F.hash
    in tests/test_route_bounds.py."""
    m = 0xFFFFFFFF
    h1 = seed & m
    v = value & 0xFFFFFFFFFFFFFFFF
    for half in (v & m, (v >> 32) & m):
        k1 = (half * 0xCC9E2D51) & m
        k1 = ((k1 << 15) | (k1 >> 17)) & m
        k1 = (k1 * 0x1B873593) & m
        h1 ^= k1
        h1 = ((h1 << 13) | (h1 >> 19)) & m
        h1 = (h1 * 5 + 0xE6546B64) & m
    h1 ^= 8  # length in bytes
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & m
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & m
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


def magic_partition_keys(num_partitions: int) -> list[int]:
    """Small ints m_p with pmod(murmur3(m_p), P) == p for every p, so
    `repartition(P, lit-array[pid])` places each row in exactly the
    partition index the analytic boundaries computed. The search is a
    driver-side loop over a few hundred ints (coupon-collector)."""
    keys: dict[int, int] = {}
    i = 0
    while len(keys) < num_partitions:
        p = murmur3_long(i) % num_partitions
        if p not in keys:
            keys[p] = i
        i += 1
    return [keys[p] for p in range(num_partitions)]


def _route_with_bounds(
    df: DataFrame,
    out_path: str,
    cfg: PipelineConfig,
    part_cols: list,
    sort_cols: list,
    tiebreak,
    bounds_pdf,
    total: int,
) -> None:
    """Analytic range route: partition boundaries computed from EXACT
    per-(sink, seg, logtype) row counts that ride along with the
    dictionary aggregation — zero extra scans.

    Why not repartitionByRange: its RangePartitioner runs a SAMPLE job
    that recomputes the mapInArrow encode of every input partition just
    to draw ~100 keys each, which forces the encode output to be
    persisted full-width so the write doesn't compute it twice — a
    second full pass plus cache traffic that erodes N→4N scaling (the
    bandwidth-bound phases are the ones that don't scale on a busy
    host). Here rows go straight from the encode pass into the shuffle:

        pid = floor((cum_before(sink,seg,logtype)
                     + u01(row_hash) * cell_rows) / rows_per_partition)

    Each partition receives a contiguous (sink,seg,logtype) range (the
    same GLT clustering the range sort gave) and hot cells split
    uniformly by the row hash (the sampler's tiebreaker, minus the
    sampler). Placement uses magic key values with
    pmod(murmur3(m_pid), P) == pid, so file contents and split points
    are deterministic at ANY parallelism — the sampler's are not.
    Counts as float64 are exact to 2^53 rows (>> the 10^12-doc target).
    """
    spark = df.sparkSession
    p_n = int(cfg.shuffle_partitions)
    rpp = max(1, -(-total // p_n))
    b_sdf = spark.createDataFrame(bounds_pdf)
    magic = magic_partition_keys(p_n)
    u01 = (tiebreak.cast("double") / F.lit(float(2**64))) + F.lit(0.5)
    joined = df.join(
        F.broadcast(b_sdf), ["sink_id", "seg_id", "logtype_id"], "left"
    )
    # rows whose cell is missing from the counts cannot occur (the counts
    # come from the same frame) — the coalesce is a pure safety net that
    # spreads such rows uniformly instead of failing
    pos = F.coalesce(
        F.col("_cum_before") + u01 * F.col("_cell_rows"),
        u01 * F.lit(float(total)),
    )
    pid = F.least(F.lit(p_n - 1), F.floor(pos / F.lit(float(rpp)))).cast("int")
    magic_col = F.element_at(
        F.array(*[F.lit(mk) for mk in magic]).cast("array<long>"), pid + F.lit(1)
    )
    writer = (
        joined.withColumn("_magic", magic_col)
        .repartition(p_n, F.col("_magic"))
        .sortWithinPartitions(*sort_cols)
        .drop("_magic", "_cum_before", "_cell_rows")
        .write.mode("overwrite")
        .partitionBy(*part_cols)
        .option("compression", cfg.compression_codec)
        .option("parquet.bloom.filter.enabled#logtype_id", "true")
    )
    if cfg.parquet_block_size is not None:
        writer = writer.option("parquet.block.size", str(cfg.parquet_block_size))
    writer.parquet(out_path)


def route_to_sinks(
    encoded: DataFrame,
    out_path: str,
    cfg: PipelineConfig,
    hot_logtypes: list[int] | None = None,
    presinked: bool = False,
    bounds: tuple | None = None,
) -> None:
    """Write encoded rows into per-sink parquet partitions, skew-salted.

    presinked=True: `encoded` already carries sink_id (caller persisted
    it to also derive metrics without a sink read-back).

    bounds=(bounds_pdf, total_rows): exact per-(sink, seg, logtype) row
    counts from the dictionary phase — takes the analytic single-pass
    route (_route_with_bounds, no sampler job, no persist needed). When
    None (no timestamp column, resume without counts, above-cap dicts)
    the sampler-based range shuffle below stands.

    hot_logtypes is accepted for API compatibility but unused: the range
    partitioner below handles hot-template skew natively (rows equal on
    every range key are split across partitions by the hash tiebreaker),
    so no explicit salting pass is needed."""
    df = encoded if presinked else add_sink_id(encoded, cfg.num_sinks)

    part_cols = ["sink_id"] + (["seg_id"] if "seg_id" in df.columns else [])
    # GLT layout: cluster rows by logtype (then ts) WITHIN each task so
    # parquet row-group min/max stats + the logtype bloom actually bite —
    # the reference's group-by-logtype tables get 7.8× search speedup
    # from exactly this clustering (docs/core-unstructured/glt.md:6-7,
    # glt/streaming_archive/writer/LogtypeTable.hpp:13-17). Sorting by
    # the partition columns first also satisfies the file writer's
    # required dynamic-partition sort, so this adds no extra sort pass.
    sort_cols = part_cols + ["logtype_id"]
    for ts in ("warc_ts", "ts_ms"):
        if ts in df.columns:
            sort_cols.append(ts)
            break
    # Range-partition the shuffle on the sort keys + a row-hash
    # tiebreaker. Hashing on the raw (sink_id, seg_id, salt) tuple was a
    # balls-in-bins skew trap: with ~num_sinks × num_segments distinct
    # keys into shuffle_partitions buckets, some tasks drew 3 key-groups
    # and others none — invisible at low parallelism (stragglers hide
    # behind the queue) but the wall-setter at high parallelism, which
    # tanked N→4N route scaling to ~2.4×. The range sampler instead
    # equalizes ROWS per task; heavy (sink, seg) groups and hot
    # logtypes split across contiguous partitions via the tiebreaker,
    # directory layout still comes from partitionBy, and each output
    # file now covers a NARROW logtype range — strictly better row-group
    # min/max pruning than per-task-global sorting.
    tiebreak = F.xxhash64(
        *[c for c in ("url", "doc_id", "event_id") if c in df.columns][:1]
        or ["logtype_id"]
    )
    if bounds is not None and bounds[1] > 0:
        bounds_pdf, total = bounds
        _route_with_bounds(
            df, out_path, cfg, part_cols, sort_cols, tiebreak, bounds_pdf, total
        )
        return
    writer = (
        df.repartitionByRange(
            cfg.shuffle_partitions, *[F.col(c) for c in sort_cols], tiebreak
        )
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .partitionBy(*part_cols)
        .option("compression", cfg.compression_codec)
        # parquet bloom filter on logtype_id: the row-group analog of the
        # reference's var-dict bloom (BloomFilter.hpp:18-29, SURVEY §2.3)
        # — logtype isin prefilters skip row groups without the IDs
        .option("parquet.bloom.filter.enabled#logtype_id", "true")
    )
    if cfg.parquet_block_size is not None:
        writer = writer.option("parquet.block.size", str(cfg.parquet_block_size))
    writer.parquet(out_path)


def sink_manifests(
    encoded_with_sink: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """Per-sink inverted indexes — the Spark analog of CLP's segment
    indexes (reference: DictionaryWriter.hpp:72 per-dict segment ID sets;
    Query.hpp:103-121 calculate_ids_of_matching_segments consumes them).

    Returns (logtype_manifest, var_manifest):
      logtype_manifest(sink_id, logtype_id) — distinct pairs
      var_manifest(sink_id, var_id)         — distinct dict-var pairs
    Both are plain tables (not array columns) so they scale to any
    dictionary size; search semi-joins them to skip whole sinks."""
    lt = encoded_with_sink.select("sink_id", "logtype_id").distinct()
    var = (
        encoded_with_sink.select(
            "sink_id", F.explode("dict_var_ids").alias("var_id")
        )
        .distinct()
    )
    return lt, var


def sink_summary(encoded_with_sink: DataFrame) -> DataFrame:
    """ONE pass over the routed rows fusing the per-sink metric
    aggregates with the logtype inverted index (round 2 ran them as two
    separate scans of the persisted frame, plus a third for var
    cardinality — the serial small jobs that eroded N→4N scaling and
    the local[32] pipeline wall).

    Output: sink_id, rows, n_encoded_vars, encoded_bytes, raw_bytes,
    lt_set (sorted distinct logtype ids — safe as an array: the logtype
    dictionary is CLP-small by design, unlike the var dict, which keeps
    its pair-table manifest). Derive:
      metrics  = select(..., size(lt_set) AS logtype_cardinality)
      manifest = select(sink_id, explode(lt_set))
    Optional min/max of `ts_col` ride along when present — the sink-level
    timestamp zone map used for archive-style time pruning."""
    aggs = [
        F.count("*").alias("rows"),
        F.sum(F.size("encoded_vars")).alias("n_encoded_vars"),
        F.sum(F.expr("8 + 8 + 8 * size(encoded_vars)")).alias("encoded_bytes"),
        F.sum("raw_bytes").alias("raw_bytes"),
        F.sort_array(F.collect_set("logtype_id")).alias("lt_set"),
    ]
    for c in ("warc_ts",):
        if c in encoded_with_sink.columns:
            aggs += [F.min(c).alias("ts_min"), F.max(c).alias("ts_max")]
    return encoded_with_sink.groupBy("sink_id").agg(*aggs)


def sink_metrics(encoded_with_sink: DataFrame) -> DataFrame:
    """Per-sink aggregate contract (exact-match vs oracle).

    encoded_bytes models the reference's columnar cost: 8 bytes per
    (timestamp, logtype_id, encoded var) slot —
    streaming_archive/writer/File.hpp:257-259's three parallel columns.
    """
    return (
        encoded_with_sink.groupBy("sink_id")
        .agg(
            F.count("*").alias("rows"),
            F.countDistinct("logtype_id").alias("logtype_cardinality"),
            F.sum(F.size("encoded_vars")).alias("n_encoded_vars"),
            F.sum(F.expr("8 + 8 + 8 * size(encoded_vars)")).alias("encoded_bytes"),
            F.sum("raw_bytes").alias("raw_bytes"),
        )
        .orderBy("sink_id")
    )


def sink_var_cardinality(encoded_with_sink: DataFrame) -> DataFrame:
    """Distinct dictionary-var IDs per sink (separate agg: needs explode)."""
    return (
        encoded_with_sink.select(
            "sink_id", F.explode("dict_var_ids").alias("var_id")
        )
        .groupBy("sink_id")
        .agg(F.countDistinct("var_id").alias("var_cardinality"))
        .orderBy("sink_id")
    )
