"""Single-process oracle for the full compress pipeline.

Given the pages table as a pandas DataFrame, computes everything the
Spark pipeline computes — dictionaries with value-sorted rank IDs,
encoded rows, sink assignment via XXH64 routing, per-sink metrics —
row-at-a-time and obviously correct. pytest compares the distributed
results against this exactly (FIXTURES.md §3 parity checks).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd

from clp_spark.config import VT_DICT
from clp_spark.oracle.tokenizer import tokenize_message
from clp_spark.oracle.xxhash import pmod, spark_xxhash64


@dataclass
class OracleResult:
    parsed: pd.DataFrame
    logtype_dict: dict  # logtype -> id
    var_dict: dict  # value -> id
    encoded: pd.DataFrame
    sink_counts: dict = field(default_factory=dict)
    sink_metrics: pd.DataFrame | None = None


def run_oracle(pages: pd.DataFrame, num_sinks: int = 8) -> OracleResult:
    rows = []
    for url, text, lang in zip(pages["url"], pages["text"], pages["lang"]):
        logtype, var_strs, var_types, enc = tokenize_message(text or "")
        rows.append(
            {
                "url": url,
                "lang": lang,
                "logtype": logtype,
                "var_strs": var_strs,
                "var_types": var_types,
                "enc_prelim": enc,
                "n_vars": len(var_strs),
                "raw_bytes": len((text or "").encode("utf-8")),
            }
        )
    parsed = pd.DataFrame(rows)

    logtypes = sorted(set(parsed["logtype"]))
    logtype_dict = {v: i for i, v in enumerate(logtypes)}
    dict_var_values = sorted(
        {
            s
            for strs, types in zip(parsed["var_strs"], parsed["var_types"])
            for s, t in zip(strs, types)
            if t == VT_DICT
        }
    )
    var_dict = {v: i for i, v in enumerate(dict_var_values)}

    enc_rows = []
    for r in rows:
        encoded_vars = []
        dict_var_ids = []
        for s, t, e in zip(r["var_strs"], r["var_types"], r["enc_prelim"]):
            if t == VT_DICT:
                vid = var_dict[s]
                encoded_vars.append(vid)
                dict_var_ids.append(vid)
            else:
                encoded_vars.append(e)
        lt_id = logtype_dict[r["logtype"]]
        sink_id = pmod(spark_xxhash64(lt_id, r["lang"]), num_sinks)
        enc_rows.append(
            {
                "url": r["url"],
                "lang": r["lang"],
                "logtype_id": lt_id,
                "encoded_vars": encoded_vars,
                "dict_var_ids": dict_var_ids,
                "n_vars": r["n_vars"],
                "raw_bytes": r["raw_bytes"],
                "sink_id": sink_id,
            }
        )
    encoded = pd.DataFrame(enc_rows)

    sink_counts = encoded.groupby("sink_id").size().to_dict()
    metrics = []
    for sid, g in encoded.groupby("sink_id"):
        metrics.append(
            {
                "sink_id": sid,
                "rows": len(g),
                "logtype_cardinality": g["logtype_id"].nunique(),
                "n_encoded_vars": int(g["encoded_vars"].map(len).sum()),
                "encoded_bytes": int((16 + 8 * g["encoded_vars"].map(len)).sum()),
                "raw_bytes": int(g["raw_bytes"].sum()),
                "var_cardinality": len(
                    {v for ids in g["dict_var_ids"] for v in ids}
                ),
            }
        )
    return OracleResult(
        parsed=parsed,
        logtype_dict=logtype_dict,
        var_dict=var_dict,
        encoded=encoded,
        sink_counts=sink_counts,
        sink_metrics=pd.DataFrame(metrics).sort_values("sink_id").reset_index(drop=True),
    )
