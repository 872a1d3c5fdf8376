"""Distributed CLP-style tokenizer/encoder: Arrow-batched mapInPandas.

Independent (vectorized) implementation of the semantics in
clp_spark.oracle.tokenizer — the pytest suite asserts exact agreement
between the two. Rules from the reference:
  - delimiters / var schemas: clp/ir/parsing.cpp:20-88
  - int encodability:         clp/EncodedVariableInterpreter.cpp:25-62
  - float bit-packing:        clp/EncodedVariableInterpreter.cpp:64-143
  - logtype escaping:         clp/ir/parsing.inc

Design notes (scale):
  - runs as `mapInPandas` so the whole parse stage is one narrow
    (shuffle-free) map over the input scan; Arrow moves batches, the
    Python worker loops over tokens with compiled C regexes.
  - encoded int/float values are computed here; dictionary-variable IDs
    are enriched later (clp_spark.dicts) so this stage needs no global
    state and is embarrassingly parallel at any cluster size.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd

from clp_spark.config import (
    PLACEHOLDER_DICT,
    PLACEHOLDER_ESCAPE,
    PLACEHOLDER_FLOAT,
    PLACEHOLDER_INT,
    VT_DICT,
    VT_FLOAT,
    VT_INT,
)

# Single classifying regex that matches ONLY variable tokens — static
# text is never visited by the Python loop (the hot-path optimization:
# most log text is static). Boundary lookarounds pin matches to maximal
# token-char runs; alternation order resolves the type:
#   i — integer var (no zero-pad, no '+', no '-0'; range-checked after)
#   f — float var (digit-count-checked after)
#   d — any digit-bearing token (dictionary var)
#   e — '='-preceded token containing a letter (dictionary var)
#   h — 2+-char hex token (dictionary var)
# A failed boundary backtracks into the next alternative (e.g. '1.2.3':
# i fails at '.', f fails at the 2nd '.', d takes the whole token), so
# classification matches the per-token rules of ir/parsing.cpp:74-85 +
# EncodedVariableInterpreter.cpp:25-143 exactly (fuzz-verified against
# the oracle).
_TC = r"+\-.0-9A-Za-z\\_"
_VAR_RE = re.compile(
    rf"(?<![{_TC}])"
    rf"(?:(?P<i>0|-?[1-9][0-9]*)"
    rf"|(?P<f>-?[0-9]*\.[0-9]+)"
    rf"|(?P<d>[{_TC}]*[0-9][{_TC}]*)"
    rf"|(?P<e>(?<==)[{_TC}]*[A-Za-z][{_TC}]*)"
    rf"|(?P<h>[0-9a-fA-F]{{2,}}))"
    rf"(?![{_TC}])"
)

_INT64_MIN = -(2**63)
_INT64_MAX = 2**63 - 1
_ESC_TRANS = {
    ord(PLACEHOLDER_INT): PLACEHOLDER_ESCAPE + PLACEHOLDER_INT,
    ord(PLACEHOLDER_DICT): PLACEHOLDER_ESCAPE + PLACEHOLDER_DICT,
    ord(PLACEHOLDER_FLOAT): PLACEHOLDER_ESCAPE + PLACEHOLDER_FLOAT,
    ord(PLACEHOLDER_ESCAPE): PLACEHOLDER_ESCAPE + PLACEHOLDER_ESCAPE,
}

PARSED_FIELDS = (
    "logtype string, var_strs array<string>, var_types array<int>, "
    "enc_prelim array<long>, n_vars int, raw_bytes long"
)


def _encode_float_packed(tok: str) -> int:
    """54-bit float packing (EncodedVariableInterpreter.cpp:113-140)."""
    neg = tok[0] == "-"
    body = tok[1:] if neg else tok
    dot = body.index(".")
    digits_str = body[:dot] + body[dot + 1 :]
    num_digits = len(digits_str)
    if num_digits > 16:
        return None  # type: ignore[return-value]
    decimal_pos = len(body) - 1 - dot
    enc = (1 << 55) if neg else 0
    enc |= int(digits_str) & ((1 << 54) - 1)
    enc <<= 4
    enc |= (num_digits - 1) & 0x0F
    enc <<= 4
    enc |= (decimal_pos - 1) & 0x0F
    return enc - (1 << 64) if enc >= (1 << 63) else enc


def parse_one(msg: str):
    """Tokenize one message → (logtype, var_strs, var_types, enc_prelim).

    enc_prelim holds the int64 encoding for INT/FLOAT vars; DICT slots get
    0 (patched with the dictionary ID by the enrich stage). The loop only
    visits variable matches — static-only messages cost one regex scan +
    one translate.
    """
    lt: list[str] = []
    vs: list[str] = []
    vt: list[int] = []
    ev: list[int] = []
    last = 0
    for m in _VAR_RE.finditer(msg):
        tok = m.group(0)
        kind = m.lastgroup
        lt.append(msg[last : m.start()].translate(_ESC_TRANS))
        if kind == "i":
            v = int(tok)
            if _INT64_MIN <= v <= _INT64_MAX:
                lt.append(PLACEHOLDER_INT)
                vt.append(VT_INT)
                ev.append(v)
            else:  # out-of-range integer text → dictionary var
                lt.append(PLACEHOLDER_DICT)
                vt.append(VT_DICT)
                ev.append(0)
        elif kind == "f":
            f = _encode_float_packed(tok)
            if f is not None:
                lt.append(PLACEHOLDER_FLOAT)
                vt.append(VT_FLOAT)
                ev.append(f)
            else:  # >16 digits → dictionary var
                lt.append(PLACEHOLDER_DICT)
                vt.append(VT_DICT)
                ev.append(0)
        else:  # d / e / h → dictionary var
            lt.append(PLACEHOLDER_DICT)
            vt.append(VT_DICT)
            ev.append(0)
        vs.append(tok)
        last = m.end()
    lt.append(msg[last:].translate(_ESC_TRANS))
    return "".join(lt), vs, vt, ev


def _parse_batch(texts: pd.Series) -> pd.DataFrame:
    logtypes = []
    var_strs = []
    var_types = []
    enc = []
    nv = []
    nb = []
    for msg in texts:
        l, s, t, e = parse_one(msg if msg is not None else "")
        logtypes.append(l)
        var_strs.append(s)
        var_types.append(t)
        enc.append(e)
        nv.append(len(s))
        nb.append(len(msg.encode("utf-8")) if msg is not None else 0)
    return pd.DataFrame(
        {
            "logtype": logtypes,
            "var_strs": var_strs,
            "var_types": var_types,
            "enc_prelim": enc,
            "n_vars": nv,
            "raw_bytes": nb,
        }
    )


def tokenize_df(df, text_col: str = "text", passthrough: list[str] | None = None):
    """pages → parsed messages. Narrow map, no shuffle.

    Keeps `passthrough` columns (default: url, warc_ts, lang) and appends
    the parsed fields.
    """
    if passthrough is None:
        passthrough = [c for c in ("url", "warc_ts", "lang") if c in df.columns]
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema if f.name in passthrough
    )
    out_schema = out_schema + ", " + PARSED_FIELDS

    cols = passthrough + [text_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = _parse_batch(pdf[text_col])
            yield pd.concat(
                [pdf[passthrough].reset_index(drop=True), parsed], axis=1
            )

    return df.select(*cols).mapInPandas(run, schema=out_schema)
