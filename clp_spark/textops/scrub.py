"""PII scrubbing for training corpora: redact emails, IPv4 addresses,
and long digit runs (ids / card / phone numbers) before a corpus ships
to training — the standard scrub step of web-data curation pipelines.

One narrow column expression per document (chained `regexp_replace`
inside whole-stage codegen — no UDF, no shuffle, pushed right after the
scan). The patterns deliberately use only syntax shared by Java regex
(Spark) and RE2 (DuckDB / most scrubbing stacks): character classes,
bounded repetition, non-capturing groups, and \\b — so an oracle can
reproduce the redaction byte-for-byte.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["EMAIL_RE", "IPV4_RE", "LONG_DIGITS_RE", "redact_pii"]

EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
LONG_DIGITS_RE = r"\b\d{9,}\b"

# applied in this order: emails first (they contain dots/digits that the
# later patterns could otherwise chew on), then IPs, then digit runs
_RULES = (
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ipv4", IPV4_RE, "<IP>"),
    ("long_digits", LONG_DIGITS_RE, "<NUM>"),
)


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    rules: tuple[str, ...] = ("email", "ipv4", "long_digits"),
) -> DataFrame:
    """Replace each enabled PII class with its placeholder token.
    Deterministic, order-fixed rule chain; returns df with `out_col`
    (default: overwrite text_col)."""
    want = set(rules)
    unknown = want - {name for name, _p, _r in _RULES}
    if unknown:
        raise ValueError(f"unknown rules: {sorted(unknown)}")
    col = F.col(text_col)
    for name, pat, repl in _RULES:
        if name in want:
            col = F.regexp_replace(col, pat, repl)
    return df.withColumn(out_col or text_col, col)
