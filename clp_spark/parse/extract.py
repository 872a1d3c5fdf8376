"""HTML → text extraction (byte-stable), Arrow-batched.

The byte-parity contract (BASELINE.json input_hint): for every url,
extracted text must be byte-identical to the reference extractor
(clp_spark.fixtures.pages.extract_text_reference). Real decoders for
image/audio payloads would slot in the same way (see
clp_spark.functions.multimodal); HTML is text-native so it's real here.
"""

from __future__ import annotations

import html as _html
from typing import Iterator

import pandas as pd


def extract_one(html_bytes: bytes | None) -> str | None:
    if html_bytes is None:
        return None
    s = bytes(html_bytes).decode("utf-8")
    a = s.find("<pre>")
    if a < 0:
        return ""
    a += 5
    b = s.rfind("</pre>")
    if b < a:
        return ""
    return _html.unescape(s[a:b])


def extract_text_df(df, html_col: str = "html", out_col: str = "extracted_text"):
    """Append an extracted-text column. Narrow map, no shuffle."""
    names = df.columns
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema
    ) + f", {out_col} string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [extract_one(h) for h in pdf[html_col]]
            yield pdf

    return df.mapInPandas(run, schema=out_schema)
