"""clp_s (semi-structured JSON) engine, Spark-first."""

from clp_spark.clps.encoder import (
    NODE_ARRAY,
    NODE_BIGNUM,
    NODE_BOOL,
    NODE_CLPSTR,
    NODE_FLOAT,
    NODE_INT,
    NODE_NULL,
    NODE_VARSTR,
    JsonArchive,
    encode_json_df,
    reconstruct_json_df,
)
from clp_spark.clps.index import (
    read_column_index,
    search_archives_kql,
    write_column_index,
)
from clp_spark.clps.kql import kql_count, kql_count_by_time, kql_query
from clp_spark.clps.search import json_filter, json_predicate, schema_candidates
from clp_spark.clps.sqlview import (
    archive_sql_schema,
    archive_table,
    register_archive_sql,
    sql_over_archives,
)

__all__ = [
    "NODE_ARRAY",
    "NODE_BIGNUM",
    "NODE_BOOL",
    "NODE_CLPSTR",
    "NODE_FLOAT",
    "NODE_INT",
    "NODE_NULL",
    "NODE_VARSTR",
    "JsonArchive",
    "archive_sql_schema",
    "archive_table",
    "encode_json_df",
    "reconstruct_json_df",
    "register_archive_sql",
    "sql_over_archives",
    "json_filter",
    "json_predicate",
    "kql_count",
    "kql_count_by_time",
    "kql_query",
    "read_column_index",
    "schema_candidates",
    "search_archives_kql",
    "write_column_index",
]
