"""Decode encoded messages back to original text (the decompressor).

Re-expression of the reference's decode loop
(/root/reference/components/core/src/clp/EncodedVariableInterpreter.hpp:505-579):
walk the logtype template; placeholder 0x11 → int64 as decimal text,
0x13 → 54-bit-packed float unpacked byte-identically, 0x12 → variable
dictionary lookup, '\\' → escaped literal.

Spark shape: dictionaries ship as broadcast variables (CLP itself keeps
both dicts in memory per archive); decoding is an Arrow-batched
mapInPandas over only the rows that need text (search survivors or a
full extract). For variable dictionaries too large to broadcast, the
explode → shuffle-join → regroup fallback in dicts/build.py is the
template to follow; not needed while dicts are CLP-small.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from clp_spark.config import (
    PLACEHOLDER_DICT,
    PLACEHOLDER_ESCAPE,
    PLACEHOLDER_FLOAT,
    PLACEHOLDER_INT,
)
from clp_spark.oracle.tokenizer import decode_float


def decode_one(logtype: str, encoded_vars, var_map) -> str:
    out = []
    vi = 0
    i, n = 0, len(logtype)
    while i < n:
        ch = logtype[i]
        if ch == PLACEHOLDER_ESCAPE and i + 1 < n:
            out.append(logtype[i + 1])
            i += 2
        elif ch == PLACEHOLDER_INT:
            out.append(str(int(encoded_vars[vi])))
            vi += 1
            i += 1
        elif ch == PLACEHOLDER_FLOAT:
            out.append(decode_float(int(encoded_vars[vi])))
            vi += 1
            i += 1
        elif ch == PLACEHOLDER_DICT:
            out.append(var_map[encoded_vars[vi]])
            vi += 1
            i += 1
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def decode_messages(
    encoded: DataFrame,
    logtype_dict: DataFrame,
    var_dict: DataFrame,
    out_col: str = "text",
) -> DataFrame:
    """Append the reconstructed original message text. Narrow map."""
    spark = encoded.sparkSession
    lt_map = {r["logtype_id"]: r["logtype"] for r in logtype_dict.collect()}
    v_map = {r["var_id"]: r["value"] for r in var_dict.collect()}
    b_lt = spark.sparkContext.broadcast(lt_map)
    b_v = spark.sparkContext.broadcast(v_map)

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in encoded.schema
    ) + f", {out_col} string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lts = b_lt.value
        vs = b_v.value
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [
                decode_one(lts[lt_id], ev, vs)
                for lt_id, ev in zip(pdf["logtype_id"], pdf["encoded_vars"])
            ]
            yield pdf

    return encoded.mapInPandas(run, schema=out_schema)
