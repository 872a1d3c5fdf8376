"""Human-readable dictionary dumps — the make-dictionaries-readable tool
(/root/reference/components/core/src/clp/make_dictionaries_readable/
make-dictionaries-readable.cpp:60-115): logtype templates with
placeholder bytes rendered as \\i (Integer), \\f (Float), \\d
(Dictionary) and each entry's segment (here: sink/segment) occurrence
list alongside; var dictionaries dumped as value-per-line.

Driver-side by design — a debugging tool over CLP-small dictionaries,
not a data-plane operator.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from clp_spark.config import (
    PLACEHOLDER_DICT,
    PLACEHOLDER_ESCAPE,
    PLACEHOLDER_FLOAT,
    PLACEHOLDER_INT,
)


def logtype_to_readable(logtype: str) -> str:
    """Placeholder bytes → \\i / \\f / \\d; escaped placeholder bytes →
    the literal byte (the reference skips the Escape marker and emits
    the following char verbatim)."""
    out: list[str] = []
    i, n = 0, len(logtype)
    while i < n:
        c = logtype[i]
        if c == PLACEHOLDER_ESCAPE and i + 1 < n:
            out.append(logtype[i + 1])
            i += 2
            continue
        if c == PLACEHOLDER_INT:
            out.append("\\i")
        elif c == PLACEHOLDER_FLOAT:
            out.append("\\f")
        elif c == PLACEHOLDER_DICT:
            out.append("\\d")
        else:
            out.append(c)
        i += 1
    return "".join(out).replace("\n", "\\n")


def dump_dictionaries(spark: SparkSession, archive_dir: str, out_dir: str) -> dict:
    """Write <out_dir>/logtype.dict.hr, var.dict.hr and (when segment
    manifests exist) logtype.segindex.hr — the readable-archive layout.
    Returns {'logtypes': n, 'vars': n}."""
    os.makedirs(out_dir, exist_ok=True)
    lt = (
        spark.read.parquet(os.path.join(archive_dir, "dicts", "logtype"))
        .orderBy("logtype_id")
        .collect()
    )
    with open(os.path.join(out_dir, "logtype.dict.hr"), "w") as f:
        for r in lt:
            f.write(f"{r['logtype_id']}\t{logtype_to_readable(r['logtype'])}\n")
    vd = (
        spark.read.parquet(os.path.join(archive_dir, "dicts", "var"))
        .orderBy("var_id")
        .collect()
    )
    with open(os.path.join(out_dir, "var.dict.hr"), "w") as f:
        for r in vd:
            f.write(f"{r['var_id']}\t{r['value']}\n".replace("\n\t", "\\n\t"))
    seg_path = os.path.join(archive_dir, "manifest", "logtype")
    if os.path.isdir(seg_path):
        man = spark.read.parquet(seg_path).collect()
        occ: dict = {}
        for r in man:
            unit = (
                (r["sink_id"], r["seg_id"])
                if "seg_id" in r.asDict()
                else (r["sink_id"],)
            )
            occ.setdefault(r["logtype_id"], []).append(unit)
        with open(os.path.join(out_dir, "logtype.segindex.hr"), "w") as f:
            for lt_id in sorted(occ):
                units = " ".join(
                    "/".join(str(x) for x in u) for u in sorted(occ[lt_id])
                )
                f.write(f"{lt_id}\t{units}\n")
    return {"logtypes": len(lt), "vars": len(vd)}
