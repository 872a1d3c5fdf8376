"""Pure-Python oracle for CLP-style message tokenization + variable encoding.

Semantics (clean-room, from the reference's documented rules):
  - delimiter set / variable schemas:
      /root/reference/components/core/src/clp/ir/parsing.cpp:20-88
      (a token — a maximal run of non-delimiter chars — is a variable iff
       it contains a decimal digit, OR is directly preceded by '=' and
       contains a letter, OR is a 2+-char hex string)
  - integer encodability:
      EncodedVariableInterpreter.cpp:25-62 (no zero-pad, no '+', no '-0',
      must fit int64)
  - float encodability + 64-bit packing:
      EncodedVariableInterpreter.cpp:64-143 (≤16 digits, exactly one '.',
      '.' not last, ≥1 digit; pack sign|54-bit digits|4-bit ndigits-1|
      4-bit decimal-pos-from-right-1)
  - float decode: EncodedVariableInterpreter.cpp:145-198 (byte-identical
    round trip, e.g. '0.500' survives)
  - logtype escaping: ir/parsing.inc + types.hpp:17-22 (placeholder bytes
    0x11/0x12/0x13 and '\\' in static text get a '\\' prepended)

This module is the *oracle*: single-process, row-at-a-time, obviously
correct. The distributed implementation lives in clp_spark.parse and is
property-tested against this.
"""

from __future__ import annotations

import re

from clp_spark.config import (
    PLACEHOLDER_DICT,
    PLACEHOLDER_ESCAPE,
    PLACEHOLDER_FLOAT,
    PLACEHOLDER_INT,
    VT_DICT,
    VT_FLOAT,
    VT_INT,
)

# Non-delimiter (token) characters: + - . 0-9 A-Z \ _ a-z
_TOKEN_CHARS = r"+\-.0-9A-Za-z\\_"
TOKEN_RE = re.compile(rf"[{_TOKEN_CHARS}]+")

_HEX_RE = re.compile(r"^[0-9a-fA-F]{2,}$")
_DIGIT_RE = re.compile(r"[0-9]")
_ALPHA_RE = re.compile(r"[A-Za-z]")
_INT_RE = re.compile(r"^(0|-?[1-9][0-9]*)$")  # no zero-pad, no '+', no '-0'
# float: optional '-', digits with exactly one '.', at least one digit
# after the '.' ('.' may not be the last char), at least one digit total.
_FLOAT_RE = re.compile(r"^-?[0-9]*\.[0-9]+$")

INT64_MIN = -(2**63)
INT64_MAX = 2**63 - 1

_ESCAPABLE = {PLACEHOLDER_INT, PLACEHOLDER_DICT, PLACEHOLDER_FLOAT, PLACEHOLDER_ESCAPE}


def is_delim(c: str) -> bool:
    return not (
        c == "+"
        or "-" <= c <= "."
        or "0" <= c <= "9"
        or "A" <= c <= "Z"
        or c == "\\"
        or c == "_"
        or "a" <= c <= "z"
    )


def is_variable_token(token: str, preceded_by_eq: bool) -> bool:
    if _DIGIT_RE.search(token):
        return True
    if preceded_by_eq and _ALPHA_RE.search(token):
        return True
    return bool(_HEX_RE.match(token))


def encode_int(token: str) -> int | None:
    """int64 encoding if the token is a representable integer var, else None."""
    if not _INT_RE.match(token):
        return None
    v = int(token)
    if v < INT64_MIN or v > INT64_MAX:
        return None
    return v


def encode_float(token: str) -> int | None:
    """54-bit packed float encoding (as signed int64) or None."""
    if not _FLOAT_RE.match(token):
        return None
    neg = token.startswith("-")
    body = token[1:] if neg else token
    digits_str = body.replace(".", "")
    num_digits = len(digits_str)
    if num_digits < 1 or num_digits > 16:
        return None
    dot_idx = body.index(".")
    # position of the decimal from the right of the whole token body
    decimal_pos = len(body) - 1 - dot_idx
    if decimal_pos == 0:
        return None
    digits = int(digits_str)
    enc = 1 if neg else 0
    enc <<= 55
    enc |= digits & ((1 << 54) - 1)
    enc <<= 4
    enc |= (num_digits - 1) & 0x0F
    enc <<= 4
    enc |= (decimal_pos - 1) & 0x0F
    # bit-cast uint64 -> int64
    if enc >= 2**63:
        enc -= 2**64
    return enc


def decode_float(encoded: int) -> str:
    """Inverse of encode_float — byte-identical reconstruction."""
    u = encoded & ((1 << 64) - 1)
    decimal_pos = (u & 0x0F) + 1
    u >>= 4
    num_digits = (u & 0x0F) + 1
    u >>= 4
    digits = u & ((1 << 54) - 1)
    u >>= 55
    neg = u > 0
    digit_str = str(digits).rjust(num_digits, "0")
    # insert '.' at decimal_pos from the right
    body = digit_str[: num_digits - decimal_pos] + "." + digit_str[num_digits - decimal_pos :]
    return ("-" if neg else "") + body


def _escape_static(text: str) -> str:
    out = []
    for ch in text:
        if ch in _ESCAPABLE:
            out.append(PLACEHOLDER_ESCAPE)
        out.append(ch)
    return "".join(out)


def tokenize_message(msg: str):
    """Split one message into (logtype, var_strings, var_types, encoded_vars).

    var_types[i] in {VT_INT, VT_FLOAT, VT_DICT}; encoded_vars[i] is the
    int64 encoding for INT/FLOAT vars and None for DICT vars (the dict ID
    is assigned globally later).
    """
    logtype_parts: list[str] = []
    var_strs: list[str] = []
    var_types: list[int] = []
    encoded: list[int | None] = []
    last_end = 0
    for m in TOKEN_RE.finditer(msg):
        tok = m.group(0)
        start = m.start()
        preceded_by_eq = start > 0 and msg[start - 1] == "="
        if not is_variable_token(tok, preceded_by_eq):
            continue
        logtype_parts.append(_escape_static(msg[last_end:start]))
        iv = encode_int(tok)
        if iv is not None:
            logtype_parts.append(PLACEHOLDER_INT)
            var_types.append(VT_INT)
            encoded.append(iv)
        else:
            fv = encode_float(tok)
            if fv is not None:
                logtype_parts.append(PLACEHOLDER_FLOAT)
                var_types.append(VT_FLOAT)
                encoded.append(fv)
            else:
                logtype_parts.append(PLACEHOLDER_DICT)
                var_types.append(VT_DICT)
                encoded.append(None)
        var_strs.append(tok)
        last_end = m.end()
    logtype_parts.append(_escape_static(msg[last_end:]))
    return "".join(logtype_parts), var_strs, var_types, encoded


def decode_message(logtype: str, var_strs: list[str]) -> str:
    """Fill a logtype template with variable strings (inverse of tokenize).

    Reference: EncodedVariableInterpreter.hpp:505-579 decode loop.
    """
    out = []
    vi = 0
    i = 0
    n = len(logtype)
    while i < n:
        ch = logtype[i]
        if ch == PLACEHOLDER_ESCAPE and i + 1 < n:
            out.append(logtype[i + 1])
            i += 2
        elif ch in (PLACEHOLDER_INT, PLACEHOLDER_DICT, PLACEHOLDER_FLOAT):
            out.append(var_strs[vi])
            vi += 1
            i += 1
        else:
            out.append(ch)
            i += 1
    return "".join(out)
