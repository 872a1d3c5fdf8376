"""Single-process pure-Python oracle.

A clean-room reference implementation of the pipeline's semantics
(tokenize → encode → dict → route → search) used by the pytest suite to
validate the distributed Spark implementation. Rules derived from the
reference's documented behavior (file:line citations in each module).
"""

from clp_spark.oracle.tokenizer import (
    tokenize_message,
    encode_int,
    encode_float,
    decode_float,
    decode_message,
    is_delim,
    TOKEN_RE,
)
from clp_spark.oracle.xxhash import xxhash64_long, xxhash64_str, spark_xxhash64
