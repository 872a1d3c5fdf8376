"""Regex → CLP-wildcard translation (driver-side query front-end).

Re-expression of the reference's translator
(/root/reference/components/core/src/clp/regex_utils/regex_translation_utils.{hpp,cpp}):
  - `.` → `?`, `.*` → `*`, `.+` → `?*`
  - `\\<meta>` → the literal char (wildcard-escaped where needed)
  - a trivial character set (`[a]`, or `[aA]` under case-insensitive
    mode) reduces to its single character
  - `^`/`$` anchors are only valid at the ends; without them, substring
    semantics optionally wrap the result in `*...*`
  - anything else (alternation, groups, quantifiers on non-dot atoms,
    non-trivial classes) is untranslatable → ValueError.

The output feeds compile_query()/search() like any wildcard string.
"""

from __future__ import annotations

_META = set(".*+?[]()|^${}\\")


class RegexTranslationError(ValueError):
    pass


def regex_to_wildcard(
    regex: str,
    case_insensitive: bool = False,
    add_prefix_suffix_wildcards: bool = False,
) -> str:
    out: list[str] = []
    i, n = 0, len(regex)
    anchored_start = anchored_end = False

    if regex.startswith("^"):
        anchored_start = True
        i = 1

    def emit_literal(c: str) -> None:
        if c in ("*", "?", "\\"):
            out.append("\\" + c)
        else:
            out.append(c)

    while i < n:
        c = regex[i]
        if c == "$":
            if i != n - 1:
                raise RegexTranslationError("'$' only supported at the end")
            anchored_end = True
            i += 1
        elif c == ".":
            if i + 1 < n and regex[i + 1] == "*":
                out.append("*")
                i += 2
            elif i + 1 < n and regex[i + 1] == "+":
                out.append("?*")
                i += 2
            else:
                out.append("?")
                i += 1
        elif c == "\\":
            if i + 1 >= n:
                raise RegexTranslationError("dangling escape")
            nxt = regex[i + 1]
            if nxt not in _META:
                raise RegexTranslationError(
                    f"unsupported escape sequence \\{nxt}"
                )
            emit_literal(nxt)
            i += 2
        elif c == "[":
            j = regex.find("]", i + 1)
            if j < 0:
                raise RegexTranslationError("unterminated character set")
            body = regex[i + 1 : j]
            if len(body) == 1 and body not in ("^",):
                emit_literal(body)
            elif (
                case_insensitive
                and len(body) == 2
                and body[0].lower() == body[1].lower()
                and body[0] != body[1]
            ):
                emit_literal(body[0].lower())
            else:
                raise RegexTranslationError(
                    f"non-trivial character set [{body}]"
                )
            i = j + 1
        elif c in ("*", "+", "?", "(", ")", "|", "{", "}", "^"):
            raise RegexTranslationError(f"unsupported regex construct '{c}'")
        else:
            emit_literal(c)
            i += 1

    s = "".join(out)
    if add_prefix_suffix_wildcards:
        if not anchored_start:
            s = "*" + s
        if not anchored_end:
            s = s + "*"
    return s
