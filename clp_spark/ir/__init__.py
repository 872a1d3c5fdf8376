"""CLP IR stream layer: the streaming wire format logging libraries emit.

Two formats, both with four-byte and eight-byte variable encodings:
  - unstructured (v0.0.2): timestamp + CLP-tokenized message events
    (`codec.IrStreamWriter` / `codec.deserialize_ir_stream`)
  - key-value pair (v0.1.0): schema-tree-backed structured records
    (`kv.KvIrWriter` / `kv.deserialize_kv_ir_stream`)

Spark operators (serialize a DataFrame to IR streams, read them back,
and search them directly without archiving) live in `spark`.
"""

from clp_spark.ir.codec import (
    IrStreamWriter,
    decode_message,
    deserialize_ir_stream,
    encode_message,
)
from clp_spark.ir.kv import KvIrWriter, deserialize_kv_ir_stream
from clp_spark.ir.search import parse_kql_ir
from clp_spark.ir.spark import (
    convert_log_df_to_kv_ir,
    grep_ir,
    read_kv_ir,
    search_kv_ir,
    serialize_ir_df,
    serialize_kv_ir_df,
)

__all__ = [
    "IrStreamWriter",
    "KvIrWriter",
    "convert_log_df_to_kv_ir",
    "decode_message",
    "deserialize_ir_stream",
    "deserialize_kv_ir_stream",
    "encode_message",
    "grep_ir",
    "parse_kql_ir",
    "read_kv_ir",
    "search_kv_ir",
    "serialize_ir_df",
    "serialize_kv_ir_df",
]
