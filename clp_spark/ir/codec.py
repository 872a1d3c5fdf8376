"""Unstructured (v0.0.2) CLP IR-stream codec.

Serializes log events (timestamp + raw message) into the streaming IR
format that CLP logging libraries emit, and deserializes/decodes it
back — both the eight-byte encoding (absolute timestamps, int64/packed
float64 encoded vars) and the four-byte encoding (delta timestamps,
int32/packed float32 encoded vars, with automatic degradation of
unrepresentable tokens to dictionary vars).

Reference behavior:
  - stream framing / tags:   clp/ffi/ir_stream/protocol_constants.hpp
  - message encode:          clp/ffi/encoding_methods.inc:345-420
                             clp/ffi/ir_stream/encoding_methods.cpp:76-265
  - int/float encodability:  clp/ffi/encoding_methods.inc:14-132,307-343
  - event deserialization:   clp/ffi/ir_stream/decoding_methods.cpp:230-460
  - variable boundaries are the same `ir::get_bounds_of_next_var`
    heuristic the archive tokenizer uses, so this module reuses the
    repo's fuzz-verified scan regex (parse/tokenizer.py).

The metadata JSON is dumped with sorted keys and no whitespace to
match nlohmann::json's canonical (std::map-ordered, compact) dump, so
two writers producing the same events produce byte-identical streams.
"""

from __future__ import annotations

import json
import struct

from clp_spark.config import (
    PLACEHOLDER_DICT,
    PLACEHOLDER_ESCAPE,
    PLACEHOLDER_FLOAT,
    PLACEHOLDER_INT,
)
from clp_spark.ir import protocol as P
from clp_spark.parse.tokenizer import _ESC_TRANS, _VAR_RE, _encode_float_packed

_INT64_MIN, _INT64_MAX = -(2**63), 2**63 - 1
_INT32_MIN, _INT32_MAX = -(2**31), 2**31 - 1

_PACK_I16 = struct.Struct(">h").pack
_PACK_I32 = struct.Struct(">i").pack
_PACK_I64 = struct.Struct(">q").pack
_PACK_U16 = struct.Struct(">H").pack
_PACK_U32 = struct.Struct(">I").pack


# ---------------------------------------------------------------- floats
def _encode_float4(tok: str):
    """25-bit float packing (encoding_methods.inc:135-166); None if the
    token isn't representable in the four-byte encoding."""
    neg = tok[0] == "-"
    body = tok[1:] if neg else tok
    if len(body) > 9:  # 8 digits + decimal point (inc:22-40)
        return None
    dot = body.index(".")
    digits_str = body[:dot] + body[dot + 1 :]
    num_digits = len(digits_str)
    if num_digits == 0 or num_digits > 8:
        return None
    digits = int(digits_str)
    if digits > (1 << 25) - 1:
        return None
    decimal_pos = len(body) - 1 - dot
    if decimal_pos == 0:
        return None
    enc = (1 << 25) if neg else 0
    enc |= digits
    enc <<= 3
    enc |= (num_digits - 1) & 0x07
    enc <<= 3
    enc |= (decimal_pos - 1) & 0x07
    return enc - (1 << 32) if enc >= (1 << 31) else enc


def _decode_float_props(digits: int, num_digits: int, decimal_pos: int, neg: bool) -> str:
    s = str(digits).zfill(num_digits)
    cut = num_digits - decimal_pos
    out = s[:cut] + "." + s[cut:]
    return "-" + out if neg else out


def decode_float4(enc: int) -> str:
    u = enc & 0xFFFFFFFF
    decimal_pos = (u & 0x07) + 1
    u >>= 3
    num_digits = (u & 0x07) + 1
    u >>= 3
    digits = u & ((1 << 25) - 1)
    u >>= 25
    return _decode_float_props(digits, num_digits, decimal_pos, u > 0)


def decode_float8(enc: int) -> str:
    u = enc & 0xFFFFFFFFFFFFFFFF
    decimal_pos = (u & 0x0F) + 1
    u >>= 4
    num_digits = (u & 0x0F) + 1
    u >>= 4
    digits = u & ((1 << 54) - 1)
    u >>= 55
    return _decode_float_props(digits, num_digits, decimal_pos, u > 0)


# ---------------------------------------------------------------- lengths
def _append_len_tagged(buf: bytearray, tag_ubyte: int, tag_ushort: int, tag_int: int, raw: bytes):
    n = len(raw)
    if n <= 0xFF:
        buf.append(tag_ubyte)
        buf.append(n)
    elif n <= 0xFFFF:
        buf.append(tag_ushort)
        buf += _PACK_U16(n)
    else:
        buf.append(tag_int)
        buf += _PACK_I32(n)
    buf += raw


def _append_str_value(buf: bytearray, raw: bytes):
    """serialize_string (utils.cpp:37-55): StrLen* tagged string."""
    n = len(raw)
    if n <= 0xFF:
        buf.append(P.STR_LEN_UBYTE)
        buf.append(n)
    elif n <= 0xFFFF:
        buf.append(P.STR_LEN_USHORT)
        buf += _PACK_U16(n)
    else:
        buf.append(P.STR_LEN_UINT)
        buf += _PACK_U32(n)
    buf += raw


# ---------------------------------------------------------------- messages
def encode_message(msg: str, four_byte: bool, buf: bytearray) -> str:
    """Serialize one message's variables + logtype into `buf`; returns
    the logtype (encoding_methods.cpp:150-240). Token classification
    follows encode_message_generically (float, then int, else dict),
    with four-byte encodability limits when `four_byte`."""
    parts = _VAR_RE.split(msg)
    n = (len(parts) - 1) // 6
    esc = "\\" in msg or "\x11" in msg or "\x12" in msg or "\x13" in msg
    var_tag = P.VAR_FOUR_BYTE_ENCODING if four_byte else P.VAR_EIGHT_BYTE_ENCODING
    pack_enc = _PACK_I32 if four_byte else _PACK_I64
    int_min, int_max = (_INT32_MIN, _INT32_MAX) if four_byte else (_INT64_MIN, _INT64_MAX)
    enc_float = _encode_float4 if four_byte else _encode_float_packed

    lt: list[str] = []
    k = 0
    for _ in range(n):
        s = parts[k]
        lt.append(s.translate(_ESC_TRANS) if esc else s)
        gi = parts[k + 1]
        gf = parts[k + 2]
        enc = None
        if gi is not None:
            tok = gi
            v = int(tok)
            if int_min <= v <= int_max:
                lt.append(PLACEHOLDER_INT)
                buf.append(var_tag)
                buf += pack_enc(v)
                enc = v
        elif gf is not None:
            tok = gf
            f = enc_float(tok)
            if f is not None:
                lt.append(PLACEHOLDER_FLOAT)
                buf.append(var_tag)
                buf += pack_enc(f)
                enc = f
        else:
            tok = parts[k + 3] or parts[k + 4] or parts[k + 5]
        if enc is None:  # dictionary variable
            lt.append(PLACEHOLDER_DICT)
            _append_len_tagged(
                buf,
                P.VAR_STR_LEN_UBYTE,
                P.VAR_STR_LEN_USHORT,
                P.VAR_STR_LEN_INT,
                tok.encode("utf-8"),
            )
        k += 6
    s = parts[k]
    lt.append(s.translate(_ESC_TRANS) if esc else s)
    logtype = "".join(lt)
    _append_len_tagged(
        buf,
        P.LOGTYPE_STR_LEN_UBYTE,
        P.LOGTYPE_STR_LEN_USHORT,
        P.LOGTYPE_STR_LEN_INT,
        logtype.encode("utf-8"),
    )
    return logtype


def decode_message(logtype: str, enc_vars: list[int], dict_vars: list[str], four_byte: bool) -> str:
    """Reassemble the original message (decoding_methods generic_decode_message)."""
    dec_float = decode_float4 if four_byte else decode_float8
    out: list[str] = []
    ei = 0
    di = 0
    i = 0
    n = len(logtype)
    start = 0
    while i < n:
        c = logtype[i]
        if c == PLACEHOLDER_INT:
            out.append(logtype[start:i])
            out.append(str(enc_vars[ei]))
            ei += 1
            start = i + 1
        elif c == PLACEHOLDER_FLOAT:
            out.append(logtype[start:i])
            out.append(dec_float(enc_vars[ei]))
            ei += 1
            start = i + 1
        elif c == PLACEHOLDER_DICT:
            out.append(logtype[start:i])
            out.append(dict_vars[di])
            di += 1
            start = i + 1
        elif c == PLACEHOLDER_ESCAPE:
            out.append(logtype[start:i])
            i += 1  # next char is a literal
            start = i
        i += 1
    out.append(logtype[start:])
    return "".join(out)


# ---------------------------------------------------------------- framing
def serialize_metadata(meta: dict, buf: bytearray):
    raw = json.dumps(meta, sort_keys=True, separators=(",", ":")).encode("utf-8")
    buf.append(P.METADATA_ENCODING_JSON)
    n = len(raw)
    if n <= 0xFF:
        buf.append(P.METADATA_LEN_UBYTE)
        buf.append(n)
    elif n <= 0xFFFF:
        buf.append(P.METADATA_LEN_USHORT)
        buf += _PACK_U16(n)
    else:
        raise ValueError("metadata longer than 64 KiB")
    buf += raw


def _serialize_ts_delta(delta: int, buf: bytearray):
    if -128 <= delta <= 127:
        buf.append(P.TIMESTAMP_DELTA_BYTE)
        buf += struct.pack(">b", delta)
    elif -32768 <= delta <= 32767:
        buf.append(P.TIMESTAMP_DELTA_SHORT)
        buf += _PACK_I16(delta)
    elif _INT32_MIN <= delta <= _INT32_MAX:
        buf.append(P.TIMESTAMP_DELTA_INT)
        buf += _PACK_I32(delta)
    else:
        buf.append(P.TIMESTAMP_DELTA_LONG)
        buf += _PACK_I64(delta)


class IrStreamWriter:
    """Serializes (ts_ms, message) events into one IR stream.

    Four-byte streams carry delta timestamps against REFERENCE_TIMESTAMP
    (encoding_methods.cpp:174-196); eight-byte streams carry absolute
    TimestampVal int64s (encoding_methods.cpp:110-148)."""

    def __init__(
        self,
        four_byte: bool = True,
        ts_pattern: str = "%Y-%m-%dT%H:%M:%S.%3",
        ts_pattern_syntax: str = "",
        time_zone_id: str = "UTC",
        reference_timestamp: int = 0,
    ):
        self.four_byte = four_byte
        self.buf = bytearray()
        self.buf += P.FOUR_BYTE_MAGIC if four_byte else P.EIGHT_BYTE_MAGIC
        meta = {
            P.VERSION_KEY: P.BACKWARD_COMPATIBLE_VERSION,
            P.VARIABLES_SCHEMA_ID_KEY: P.VARIABLES_SCHEMA_VERSION,
            P.VARIABLE_ENCODING_METHODS_ID_KEY: P.VARIABLE_ENCODING_METHODS_VERSION,
            P.TIMESTAMP_PATTERN_KEY: ts_pattern,
            P.TIMESTAMP_PATTERN_SYNTAX_KEY: ts_pattern_syntax,
            P.TIME_ZONE_ID_KEY: time_zone_id,
        }
        if four_byte:
            meta[P.REFERENCE_TIMESTAMP_KEY] = str(reference_timestamp)
            self._prev_ts = reference_timestamp
        serialize_metadata(meta, self.buf)

    def add(self, ts_ms: int, message: str):
        encode_message(message, self.four_byte, self.buf)
        if self.four_byte:
            _serialize_ts_delta(ts_ms - self._prev_ts, self.buf)
            self._prev_ts = ts_ms
        else:
            self.buf.append(P.TIMESTAMP_VAL)
            self.buf += _PACK_I64(ts_ms)

    def finish(self) -> bytes:
        self.buf.append(P.EOF_BYTE)
        return bytes(self.buf)


# ---------------------------------------------------------------- reading
def _read_int(data, pos: int, size: int, signed: bool = True):
    return int.from_bytes(data[pos : pos + size], "big", signed=signed), pos + size


def _read_len_tagged(data, pos: int, tag: int, ubyte: int, ushort: int, as_int: int):
    if tag == ubyte:
        n, pos = _read_int(data, pos, 1, signed=False)
    elif tag == ushort:
        n, pos = _read_int(data, pos, 2, signed=False)
    elif tag == as_int:
        n, pos = _read_int(data, pos, 4, signed=True)
    else:
        raise ValueError(f"corrupted IR: unexpected length tag 0x{tag:02x} at {pos - 1}")
    s = bytes(data[pos : pos + n]).decode("utf-8")
    return s, pos + n


def read_message_tokens(data, pos: int, tag: int, four_byte: bool):
    """Reads vars + logtype for one clp-encoded message starting at the
    already-read `tag`; returns (logtype, enc_vars, dict_vars, pos).
    Mirrors decoding_methods.cpp:460-492 (vars until a logtype tag)."""
    enc_tag = P.VAR_FOUR_BYTE_ENCODING if four_byte else P.VAR_EIGHT_BYTE_ENCODING
    width = 4 if four_byte else 8
    enc_vars: list[int] = []
    dict_vars: list[str] = []
    while True:
        if tag == enc_tag:
            v, pos = _read_int(data, pos, width, signed=True)
            enc_vars.append(v)
        elif tag in (P.VAR_STR_LEN_UBYTE, P.VAR_STR_LEN_USHORT, P.VAR_STR_LEN_INT):
            s, pos = _read_len_tagged(
                data, pos, tag, P.VAR_STR_LEN_UBYTE, P.VAR_STR_LEN_USHORT, P.VAR_STR_LEN_INT
            )
            dict_vars.append(s)
        elif tag in (P.LOGTYPE_STR_LEN_UBYTE, P.LOGTYPE_STR_LEN_USHORT, P.LOGTYPE_STR_LEN_INT):
            logtype, pos = _read_len_tagged(
                data,
                pos,
                tag,
                P.LOGTYPE_STR_LEN_UBYTE,
                P.LOGTYPE_STR_LEN_USHORT,
                P.LOGTYPE_STR_LEN_INT,
            )
            return logtype, enc_vars, dict_vars, pos
        else:
            raise ValueError(f"corrupted IR: unexpected message tag 0x{tag:02x}")
        tag = data[pos]
        pos += 1


def read_preamble(data):
    """Returns (four_byte, metadata_dict, pos_after_metadata)."""
    magic = bytes(data[:4])
    if magic == P.FOUR_BYTE_MAGIC:
        four_byte = True
    elif magic == P.EIGHT_BYTE_MAGIC:
        four_byte = False
    else:
        raise ValueError("not a CLP IR stream (bad magic number)")
    pos = 4
    if data[pos] != P.METADATA_ENCODING_JSON:
        raise ValueError("unsupported IR metadata encoding")
    pos += 1
    tag = data[pos]
    pos += 1
    if tag == P.METADATA_LEN_UBYTE:
        n, pos = _read_int(data, pos, 1, signed=False)
    elif tag == P.METADATA_LEN_USHORT:
        n, pos = _read_int(data, pos, 2, signed=False)
    else:
        raise ValueError("corrupted IR metadata length")
    meta = json.loads(bytes(data[pos : pos + n]).decode("utf-8"))
    return four_byte, meta, pos + n


def deserialize_ir_stream(data: bytes, decode: bool = True):
    """Parses a full unstructured IR stream.

    Returns (metadata, events) where each event is a dict with ts_ms,
    logtype, enc_vars, dict_vars, and (if `decode`) the reassembled
    message. Raises on corrupt streams; tolerates a missing trailing
    EOF byte (truncated-but-aligned streams) like the reference's
    Incomplete_IR handling."""
    four_byte, meta, pos = read_preamble(data)
    prev_ts = int(meta.get(P.REFERENCE_TIMESTAMP_KEY, 0)) if four_byte else 0
    events = []
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        if tag == P.EOF_BYTE:
            break
        if tag == P.UTC_OFFSET_CHANGE:
            _, pos = _read_int(data, pos, 8, signed=True)
            continue
        logtype, enc_vars, dict_vars, pos = read_message_tokens(data, pos, tag, four_byte)
        tag = data[pos]
        pos += 1
        if four_byte:
            if tag == P.TIMESTAMP_DELTA_BYTE:
                d, pos = _read_int(data, pos, 1)
            elif tag == P.TIMESTAMP_DELTA_SHORT:
                d, pos = _read_int(data, pos, 2)
            elif tag == P.TIMESTAMP_DELTA_INT:
                d, pos = _read_int(data, pos, 4)
            elif tag == P.TIMESTAMP_DELTA_LONG:
                d, pos = _read_int(data, pos, 8)
            else:
                raise ValueError(f"corrupted IR: bad timestamp tag 0x{tag:02x}")
            prev_ts += d
            ts = prev_ts
        else:
            if tag != P.TIMESTAMP_VAL:
                raise ValueError(f"corrupted IR: bad timestamp tag 0x{tag:02x}")
            ts, pos = _read_int(data, pos, 8, signed=True)
        ev = {
            "ts_ms": ts,
            "logtype": logtype,
            "enc_vars": enc_vars,
            "dict_vars": dict_vars,
        }
        if decode:
            ev["message"] = decode_message(logtype, enc_vars, dict_vars, four_byte)
        events.append(ev)
    return meta, events
