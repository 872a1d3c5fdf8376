"""CLP wildcard language: `*` = any chars (incl. none), `?` = any one char.

Semantics from the reference's matcher
(/root/reference/components/core/src/clp/string_utils/string_utils.hpp:119-154):
whole-string match, optional case-insensitivity, `\\` escapes a literal
`*`/`?`/`\\`. `*` spans newlines (messages can be multi-line).
"""

from __future__ import annotations

import re


def wildcard_to_regex(pattern: str, ignore_case: bool = False) -> re.Pattern:
    """Compile a CLP wildcard pattern to an anchored Python regex."""
    out = []
    i, n = 0, len(pattern)
    while i < n:
        c = pattern[i]
        if c == "\\" and i + 1 < n:
            out.append(re.escape(pattern[i + 1]))
            i += 2
            continue
        if c == "*":
            out.append(".*")
        elif c == "?":
            out.append(".")
        else:
            out.append(re.escape(c))
        i += 1
    flags = re.DOTALL | (re.IGNORECASE if ignore_case else 0)
    return re.compile("".join(out), flags)


def wildcard_to_java_regex(pattern: str, ignore_case: bool = False) -> str:
    """Same translation but emitting a Java-regex string for `rlike`.

    Literal runs are wrapped in \\Q...\\E quoting (Java-only construct) so
    no per-character escaping differences can creep in.
    """
    out = ["(?s)"]
    if ignore_case:
        out.append("(?i)")
    lit: list[str] = []

    def flush():
        if lit:
            s = "".join(lit)
            out.append("\\Q" + s.replace("\\E", "\\E\\\\E\\Q") + "\\E")
            lit.clear()

    i, n = 0, len(pattern)
    while i < n:
        c = pattern[i]
        if c == "\\" and i + 1 < n:
            lit.append(pattern[i + 1])
            i += 2
            continue
        if c == "*":
            flush()
            out.append(".*")
        elif c == "?":
            flush()
            out.append(".")
        else:
            lit.append(c)
        i += 1
    flush()
    return "".join(out)


def wildcard_match(pattern: str, text: str, ignore_case: bool = False) -> bool:
    """Whole-string wildcard match (oracle-side helper)."""
    return wildcard_to_regex(pattern, ignore_case).fullmatch(text) is not None
