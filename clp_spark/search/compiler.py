"""Driver-side wildcard-query compiler.

Re-expression of the reference's query compilation
(/root/reference/components/core/src/clp/GrepCore.hpp:139-246:
process_raw_query → per-subquery logtype patterns + QueryVars;
token classification at GrepCore.hpp:251-305). Instead of enumerating
every ambiguous-token interpretation combinatorially (bounded at
GrepCore.hpp:194-233), we compile ONE sound superset prefilter:

  - query tokens that are *unambiguously* variables (bounded by real
    delimiters on both sides, no wildcards touching them) become hard
    conditions: an int/float token must appear among `encoded_vars`
    (same int64 encodings as compression), a dictionary token must
    resolve in the variable dictionary (miss ⇒ zero results, no scan);
  - unambiguous static tokens + all delimiter runs become the logtype
    wildcard pattern matched against the logtype dictionary;
  - anything touched by a wildcard contributes `*` (no constraint).

Exactness is restored by the mandatory decode+wildcard-confirm stage on
surviving rows (executor.py), mirroring Grep.cpp:115-132. A prefilter
that is a superset + an exact confirm ⇒ exact results, while preserving
CLP's "search without decompress" pruning behavior (dictionary misses
prune to zero before any data scan).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from clp_spark.config import (
    PLACEHOLDER_DICT,
    PLACEHOLDER_FLOAT,
    PLACEHOLDER_INT,
)
from clp_spark.oracle.tokenizer import encode_float, encode_int, is_delim
from clp_spark.parse.tokenizer import _ESC_TRANS  # same escaping as compression


@dataclass
class CompiledQuery:
    raw: str
    ignore_case: bool
    match_all: bool
    # wildcard pattern over the logtype *template* string (placeholder
    # bytes included); None ⇒ no logtype constraint
    logtype_pattern: str | None
    # int64 encodings that must each appear in encoded_vars
    int_vars: list[int] = field(default_factory=list)
    float_vars: list[int] = field(default_factory=list)
    # variable-dictionary strings that must each resolve + appear
    dict_vars: list[str] = field(default_factory=list)
    # the same conditions in query order — ("int"|"float", encoding) or
    # ("dict", token) — for the subsequence refinement
    # (Query.hpp:245-270: query vars must appear in order,
    # non-contiguously, among the message's variables)
    ordered_vars: list[tuple] = field(default_factory=list)
    # full wildcard pattern for the final confirm on decoded text
    confirm_pattern: str = "*"


def _scan(query: str):
    """Split a query into runs: ('tok'|'delim'|'wild', text, has_wildcard).

    Escapes (`\\*`, `\\?`, `\\\\`) are resolved here; an escaped wildcard
    is a literal char. `\\` itself is a token char (same delimiter set as
    compression: ir/parsing.cpp:20-24).
    """
    chars: list[tuple[str, bool]] = []  # (char, is_wildcard_meta)
    i, n = 0, len(query)
    while i < n:
        c = query[i]
        if c == "\\" and i + 1 < n and query[i + 1] in ("*", "?", "\\"):
            chars.append((query[i + 1], False))
            i += 2
        elif c in ("*", "?"):
            chars.append((c, True))
            i += 1
        else:
            chars.append((c, False))
            i += 1

    runs: list[list] = []  # [kind, [chars], has_wild]
    for c, is_meta in chars:
        if is_meta:
            kind = "wild"
        elif is_delim(c):
            kind = "delim"
        else:
            kind = "tok"
        # wildcards glue to adjacent token runs (a wildcard may stand for
        # token chars); delimiters never merge with tokens
        if runs and (
            runs[-1][0] == kind
            or (runs[-1][0] in ("tok", "wild") and kind in ("tok", "wild"))
        ):
            if kind == "wild" or runs[-1][0] == "wild":
                runs[-1][0] = "tok"
                runs[-1][2] = True
            runs[-1][1].append(c)
            if kind == "wild":
                runs[-1][2] = True
        else:
            runs.append([kind if kind != "wild" else "tok", [c], kind == "wild"])
    return [(k, "".join(cs), w) for k, cs, w in runs]


def compile_query(
    query: str, ignore_case: bool = False, substring: bool = True
) -> CompiledQuery:
    """Compile a wildcard query into a prefilter + confirm plan.

    substring=True wraps the query in `*...*` (the reference's CLI
    semantics: a search string is a substring match).
    """
    q = query
    if substring:
        q = "*" + q + "*"

    runs = _scan(q)
    # a run is "clean" iff it has no wildcard and its neighbors on both
    # sides are delimiter runs or string boundaries
    lt_parts: list[str] = []
    int_vars: list[int] = []
    float_vars: list[int] = []
    dict_vars: list[str] = []
    ordered: list[tuple] = []
    any_constraint = False

    for idx, (kind, text, has_wild) in enumerate(runs):
        if kind == "delim":
            lt_parts.append(_escape_for_pattern(text))
            continue
        prev_ok = idx == 0 or runs[idx - 1][0] == "delim"
        next_ok = idx == len(runs) - 1 or runs[idx + 1][0] == "delim"
        clean = (not has_wild) and prev_ok and next_ok
        if not clean:
            if lt_parts and lt_parts[-1] == "*":
                continue
            lt_parts.append("*")
            continue
        # classify exactly as the compression tokenizer would in context
        preceded_by_eq = idx > 0 and runs[idx - 1][1].endswith("=")
        has_digit = any("0" <= ch <= "9" for ch in text)
        if has_digit:
            iv = encode_int(text)
            if iv is not None:
                lt_parts.append(_wc_escape(PLACEHOLDER_INT))
                int_vars.append(iv)
                ordered.append(("int", iv))
            else:
                fv = encode_float(text)
                if fv is not None:
                    lt_parts.append(_wc_escape(PLACEHOLDER_FLOAT))
                    float_vars.append(fv)
                    ordered.append(("float", fv))
                else:
                    lt_parts.append(_wc_escape(PLACEHOLDER_DICT))
                    dict_vars.append(text)
                    ordered.append(("dict", text))
            any_constraint = True
        elif (preceded_by_eq and any(ch.isalpha() for ch in text)) or _is_hex(text):
            lt_parts.append(_wc_escape(PLACEHOLDER_DICT))
            dict_vars.append(text)
            ordered.append(("dict", text))
            any_constraint = True
        else:
            # static text — appears verbatim in the logtype template
            lt_parts.append(_escape_for_pattern(text))
            any_constraint = True

    lt_pattern = "".join(lt_parts)
    # match-all iff the *entire* confirm pattern is unescaped '*'s — then
    # both the prefilter and the confirm are trivially true ("*" alone
    # supersedes everything: GrepCore.hpp:383-387). A query like
    # "*deadbeef*" has no prefilterable token (everything touches a
    # wildcard) yet still needs the decode+confirm stage.
    match_all = all(
        k == "tok" and w and set(t) <= {"*"} for k, t, w in runs
    )
    no_prefilter = not any_constraint and set(lt_pattern) <= {"*"}
    return CompiledQuery(
        raw=query,
        ignore_case=ignore_case,
        match_all=match_all,
        logtype_pattern=None if (match_all or no_prefilter) else lt_pattern,
        int_vars=int_vars,
        float_vars=float_vars,
        dict_vars=dict_vars,
        ordered_vars=ordered,
        confirm_pattern=q,
    )


def _is_hex(s: str) -> bool:
    return len(s) >= 2 and all(
        "0" <= c <= "9" or "a" <= c <= "f" or "A" <= c <= "F" for c in s
    )


def _wc_escape(s: str) -> str:
    """Escape wildcard metachars so s is literal in a wildcard pattern."""
    return s.replace("\\", "\\\\").replace("*", "\\*").replace("?", "\\?")


def _escape_for_pattern(text: str) -> str:
    """Static query text → how it appears in a logtype template, made
    literal for the wildcard-pattern language (compression escapes
    placeholder bytes and backslashes: ir/parsing.inc)."""
    return _wc_escape(text.translate(_ESC_TRANS))
