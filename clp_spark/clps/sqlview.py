"""SQL surface over clp_s archives — the Presto-connector analog.

The reference exposes archives to an external SQL engine through a
Presto fork: the connector serves table metadata from the
column-metadata index and scans the surviving archives' records
(reference: docs/src/user-docs/guides-using-presto.md:1-16,
components/core/src/clp_s/indexer/IndexManager.hpp:14-27); the
engine's own SQL grammar is a stub (search/sql/Sql.g4:1-6). The
Spark-native equivalent implemented here:

1. derive a typed relational schema for each archive from its schema
   TREE — metadata only, no data pass (IndexManager's job);
2. reconstruct records lazily and parse them against that schema
   (`from_json` stays inside the scan projection — whole rows are
   never materialized on the driver);
3. prune archives whose schema tree cannot host a field the query
   needs (same soundness rule as federated KQL, `index.py`);
4. union the survivors by name (schemas may differ per archive) and
   register a temp view, so users run arbitrary `spark.sql(...)` —
   Catalyst is strictly richer than the reference's SQL stub.

Type-merge rules for a path observed with several node types, chosen
so values are never silently nulled by the parse:

- pure int            -> long
- int | bignum        -> decimal(38,0)  (bignum = integer > int64)
- any float in a numeric-only mix -> double
- pure bool           -> boolean
- arrays (structurized or not), objects-mixed-with-scalars, or any
  other mix           -> string holding the raw JSON text verbatim
  (Spark's JSON parser captures the unparsed token for string
  targets, so nothing is lost — query with get_json_object/variant)
- null contributes nothing (fits every type)

Paths containing '.' in a single key are indistinguishable from
nesting (same convention as the KQL path grammar).

Scale note: by default the scan reconstructs the FULL record per row
before from_json projects the queried columns. Catalyst cannot push a
projection through the reconstruct's mapInPandas, so `columns=` does
it at the archive layer instead: the encoded leaf arrays are filtered
to the requested top-level fields (one JVM-side `filter(jvals, ...)`
against a broadcast keep-set — no shuffle, no Python) BEFORE the
decode, so a two-column aggregate never pays to rebuild whole
records. For selective predicates prefer the KQL path
(`kql_query`/`search_archives_kql`), which also pushes dictionary and
schema pruning below the decode; this view is the ad-hoc analytics
surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BooleanType,
    DecimalType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from clp_spark.clps.encoder import (
    NODE_ARRAY,
    NODE_ARREND,
    NODE_ARRSTART,
    NODE_BIGNUM,
    NODE_BOOL,
    NODE_FLOAT,
    NODE_FMTFLOAT,
    NODE_INT,
    NODE_NULL,
    NODE_OBJEND,
    NODE_OBJSTART,
    JsonArchive,
    reconstruct_json_df,
)

_ARRAYISH = {NODE_ARRAY, NODE_ARRSTART, NODE_ARREND, NODE_OBJSTART, NODE_OBJEND}
_ENCODING_COLS = {"schema_id", "node_ids", "jvals"}
# schema trees are bounded by distinct (path, type) pairs, not rows;
# same order of magnitude as the column index the reference serves
# Presto metadata from, so a driver collect is safe — but cap it.
_MAX_TREE_NODES = 200_000


def _leaf_type(tags: set):
    tags = tags - {NODE_NULL}
    if not tags:
        return StringType()
    if tags & _ARRAYISH:
        return StringType()
    if tags == {NODE_BOOL}:
        return BooleanType()
    numeric = {NODE_INT, NODE_BIGNUM, NODE_FLOAT, NODE_FMTFLOAT}
    if tags <= numeric:
        if tags & {NODE_FLOAT, NODE_FMTFLOAT}:
            return DoubleType()
        if NODE_BIGNUM in tags:
            return DecimalType(38, 0)
        return LongType()
    return StringType()


def archive_sql_schema(archive: JsonArchive) -> StructType:
    """Typed relational schema derived from the archive's schema tree
    (node_id, path, tag) — a metadata-only read, no scan of the data.

    Dotted paths become nested structs. When one path is both a scalar
    leaf and a struct prefix across records, the struct wins (the
    scalar occurrences parse as null there — same relaxation a SQL
    metadata service must pick); when it is ever an array, the raw
    JSON text (string) wins, including over nested structurized-array
    leaves."""
    rows = archive.tree.limit(_MAX_TREE_NODES + 1).collect()
    if len(rows) > _MAX_TREE_NODES:
        raise ValueError(
            f"schema tree exceeds {_MAX_TREE_NODES} nodes; not a "
            "relational surface — query it with KQL instead"
        )
    by_path: dict[str, set] = {}
    for r in rows:
        by_path.setdefault(r["path"], set()).add(r["tag"])

    # array-tagged paths dominate everything at or below them
    array_roots = sorted(p for p, t in by_path.items() if t & _ARRAYISH)
    pruned: dict[str, set] = {}
    for p, tags in by_path.items():
        root = next(
            (a for a in array_roots if p == a or p.startswith(a + ".")), None
        )
        if root is None:
            pruned[p] = tags
        else:
            pruned.setdefault(root, set()).update(_ARRAYISH & (tags | {NODE_ARRAY}))
    for a in array_roots:
        pruned.setdefault(a, {NODE_ARRAY})

    tree: dict = {}
    for path in sorted(pruned):
        parts = path.split(".")
        node = tree
        for part in parts[:-1]:
            nxt = node.get(part)
            if not isinstance(nxt, dict):
                # absent, or previously planted as a scalar leaf by a
                # record where this path held a scalar: struct wins
                nxt = node[part] = {}
            node = nxt
        leaf = parts[-1]
        if isinstance(node.get(leaf), dict):
            continue  # struct prefix wins over the scalar leaf
        node[leaf] = _leaf_type(pruned[path])

    def build(d: dict) -> StructType:
        return StructType(
            [
                StructField(k, build(v) if isinstance(v, dict) else v, True)
                for k, v in d.items()
            ]
        )

    return build(tree)


# projection pushdown pays when the kept leaf set is a genuine subset
# and small enough that the per-leaf array_contains probe stays cheap
_MAX_PROJECT_IDS = 20_000


def _project_encoded(archive: JsonArchive, columns: set) -> JsonArchive:
    """Filter the encoded leaf arrays to nodes whose top-level field is
    requested — the projection-pushdown step Catalyst cannot perform
    through the reconstruct's mapInPandas barrier. Pure column algebra
    over the existing partitioning (broadcast keep-set + higher-order
    `filter`): no shuffle, no Python, deterministic at any parallelism.
    Leaf order is preserved and whole marker groups share their array's
    top-level segment, so structurized-array framing stays balanced.
    Skipped (full reconstruct, still exact) when nothing would be
    dropped or the keep-set exceeds the probe-cost cap."""
    rows = (
        archive.tree.select("node_id", "path")
        .limit(_MAX_TREE_NODES + 1)
        .collect()
    )
    if len(rows) > _MAX_TREE_NODES:
        return archive
    keep = [r["node_id"] for r in rows if r["path"].split(".")[0] in columns]
    if len(keep) >= len(rows) or len(keep) > _MAX_PROJECT_IDS:
        return archive
    spark = archive.encoded.sparkSession
    kdf = spark.createDataFrame([(keep,)], "__keep array<bigint>")
    enc = (
        archive.encoded.crossJoin(F.broadcast(kdf))
        .withColumn(
            "jvals",
            F.filter("jvals", lambda x: F.array_contains("__keep", x["node"])),
        )
        .drop("__keep")
    )
    return JsonArchive(
        enc,
        archive.tree,
        archive.schema_map,
        archive.logtype_dict,
        archive.var_dict,
        archive.node_map,
        archive.schema_ids,
        range_index=archive.range_index,
        range_index_idx_col=archive.range_index_idx_col,
    )


def archive_table(
    spark, archive: JsonArchive, json_col: str = "__json", columns=None
) -> DataFrame:
    """One archive as a typed DataFrame: passthrough columns + the
    tree-derived record columns. The reconstruct + parse ride inside
    the scan projection (mapInPandas + from_json). With `columns`, the
    record fields are restricted to those top-level names and the
    encoded leaves are pruned BEFORE the decode (see
    `_project_encoded`) — rows stay present (count semantics) even
    when none of their fields survive."""
    schema = archive_sql_schema(archive)
    if columns is not None:
        want = set(columns)
        schema = StructType([f for f in schema.fields if f.name in want])
        archive = _project_encoded(archive, want)
    rec = reconstruct_json_df(archive, json_col)
    passthrough = [
        c
        for c in rec.columns
        if c not in _ENCODING_COLS and c != json_col and c not in schema.names
    ]
    return rec.select(
        *passthrough, F.from_json(json_col, schema).alias("__rec")
    ).select(*passthrough, "__rec.*")


def register_archive_sql(
    spark,
    archive_dirs: list[str],
    view: str = "clp",
    where_fields=None,
    columns=None,
) -> list[str]:
    """Register a temp view over one or more archives and return the
    list of archive dirs actually loaded.

    `where_fields`: field paths the query requires on every matching
    row (the SQL analog of `index.required_paths`) — archives whose
    column index cannot host one of them are pruned without being
    loaded, exactly the reference connector's metadata-pruning step.
    `columns`: top-level record fields the view needs — projection is
    pushed below the record decode (`_project_encoded`), the SQL-side
    analog of a Presto connector's column handle list.

    Archives with differing schemas union by name; fields an archive
    lacks read as null there."""
    from clp_spark.clps.index import load_surviving_archives

    searched, archs = load_surviving_archives(
        spark,
        list(archive_dirs),
        frozenset(where_fields) if where_fields else None,
    )
    if not searched:
        raise ValueError("every archive was pruned; nothing to register")
    frames = [
        archive_table(spark, a, columns=columns) for a in archs
    ]
    df = frames[0]
    for f in frames[1:]:
        df = df.unionByName(f, allowMissingColumns=True)
    df.createOrReplaceTempView(view)
    return searched


def sql_over_archives(
    spark,
    archive_dirs: list[str],
    sql: str,
    view: str = "clp",
    where_fields=None,
    columns=None,
) -> tuple[DataFrame, list[str]]:
    """Run one SQL statement over the (index-pruned) archive fleet;
    returns (result DataFrame, archive dirs loaded)."""
    searched = register_archive_sql(
        spark, archive_dirs, view=view, where_fields=where_fields,
        columns=columns,
    )
    return spark.sql(sql), searched


__all__ = [
    "archive_sql_schema",
    "archive_table",
    "register_archive_sql",
    "sql_over_archives",
]
