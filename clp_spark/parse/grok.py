"""Config-driven grok/regex field extraction.

The reference's extension point for custom parsing is the schema file:
named variable patterns + delimiters compiled into a DFA
(/root/reference/docs/src/user-docs/reference-unstructured-schema-file.md,
LogSurgeonReader). Spark-first equivalent: a grok pattern dictionary
(%{NAME} placeholders over named regex groups) compiled to one Python
regex applied in an Arrow-batched pass — or, when the pattern is simple
enough, pushed down as JVM-side `regexp_extract` column expressions.

`grok_to_regex` → compile; `grok_extract_df` → mapInPandas extraction;
`grok_extract_exprs` → list of (field, regexp_extract expr) usable in
pure Catalyst plans (whole-stage codegen, no Python).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# Default pattern library (subset of the classic grok core, anchored on
# the reference's variable schemas where they overlap).
GROK_PATTERNS: dict[str, str] = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "BASE16NUM": r"[0-9a-fA-F]+",
    "IP": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
    "IPORHOST": r"[\w.\-]+",
    "PATH": r"(?:/[\w.\-]+)+",
    "LOGLEVEL": r"(?:TRACE|DEBUG|INFO|WARN|WARNING|ERROR|FATAL|CRITICAL)",
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?",
    "UUID": r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}",
}

_GROK_TOKEN = re.compile(r"%\{(\w+)(?::(\w+))?\}")


def grok_to_regex(
    pattern: str, library: dict[str, str] | None = None
) -> tuple[str, list[str]]:
    """Expand %{PATTERN:field} placeholders → (regex, ordered fields).

    Unnamed placeholders (%{WORD}) match without capturing. Literal text
    between placeholders is regex-escaped.
    """
    lib = {**GROK_PATTERNS, **(library or {})}
    out: list[str] = []
    fields: list[str] = []
    last = 0
    for m in _GROK_TOKEN.finditer(pattern):
        out.append(re.escape(pattern[last : m.start()]))
        name, field = m.group(1), m.group(2)
        if name not in lib:
            raise KeyError(f"unknown grok pattern %{{{name}}}")
        if field:
            out.append(f"(?P<{field}>{lib[name]})")
            fields.append(field)
        else:
            out.append(f"(?:{lib[name]})")
        last = m.end()
    out.append(re.escape(pattern[last:]))
    return "".join(out), fields


def grok_extract_df(
    df: DataFrame,
    pattern: str,
    text_col: str = "text",
    library: dict[str, str] | None = None,
    keep: list[str] | None = None,
) -> DataFrame:
    """Extract grok fields as string columns (null if no match).

    Arrow-batched; one compiled regex, search (unanchored) per row —
    the general path for patterns JVM regexp_extract can't express
    (named groups, alternations with captures).
    """
    rx_str, fields = grok_to_regex(pattern, library)
    if keep is None:
        keep = list(df.columns)
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema if f.name in keep
    )
    out_schema += ", " + ", ".join(f"{f} string" for f in fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rx = re.compile(rx_str)
        for pdf in batches:
            cols: dict[str, list] = {f: [] for f in fields}
            for s in pdf[text_col]:
                m = rx.search(s) if s is not None else None
                for f_ in fields:
                    cols[f_].append(m.group(f_) if m else None)
            out = pdf[keep].copy()
            for f_ in fields:
                out[f_] = cols[f_]
            yield out

    return df.select(*dict.fromkeys(keep + [text_col])).mapInPandas(
        run, schema=out_schema
    )


def grok_extract_exprs(
    pattern: str, text_col: str = "text", library: dict[str, str] | None = None
) -> list:
    """JVM pushdown variant: one `regexp_extract` column per field
    (whole-stage codegen, no Python). Named groups are rewritten to
    plain groups with the right index."""
    rx_str, fields = grok_to_regex(pattern, library)
    exprs = []
    for f_ in fields:
        # keep only this field's group capturing; others non-capturing
        single = rx_str
        for g in fields:
            if g == f_:
                single = single.replace(f"(?P<{g}>", "(", 1)
            else:
                single = single.replace(f"(?P<{g}>", "(?:", 1)
        exprs.append(F.regexp_extract(F.col(text_col), single, 1).alias(f_))
    return exprs
