"""Pure-Python XXH64 matching Spark's `xxhash64` expression.

Spark's XxHash64 (seed 42) chains multi-argument hashes: the hash of
argument i becomes the seed for argument i+1. Longs are hashed via the
8-byte little-endian fast path; strings via their UTF-8 bytes. This is
the standard public XXH64 algorithm (Collet, xxhash.com) — implemented
here so the single-process oracle can reproduce the pipeline's
sink routing `pmod(xxhash64(logtype_id, lang), K)` exactly.
Verified against pyspark in tests/test_xxhash.py.
"""

from __future__ import annotations

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    acc = _rotl(acc, 31)
    return (acc * _P1) & _M


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64_bytes(data: bytes, seed: int) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _fmix(h)


def _to_signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def _to_unsigned(s: int) -> int:
    return s & _M


def xxhash64_long(value: int, seed: int) -> int:
    """Spark's fast path for a LongType column (8-byte LE word)."""
    useed = _to_unsigned(seed)
    h = (useed + _P5 + 8) & _M
    h ^= _round(0, _to_unsigned(value))
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _to_signed(_fmix(h))


def xxhash64_str(value: str, seed: int) -> int:
    return _to_signed(xxh64_bytes(value.encode("utf-8"), _to_unsigned(seed)))


def spark_xxhash64(*args) -> int:
    """Replicates `F.xxhash64(*cols)` for int and str arguments (seed 42).
    NULL arguments are skipped — Spark's HashExpression leaves the
    running hash unchanged for null inputs, so a null lang column must
    hash to the same sink driver-side as it does in add_sink_id."""
    h = SPARK_SEED
    for a in args:
        if a is None:
            continue
        if isinstance(a, bool):
            raise TypeError("bool not supported")
        if isinstance(a, int):
            h = xxhash64_long(a, h)
        elif isinstance(a, str):
            h = xxhash64_str(a, h)
        elif isinstance(a, bytes):
            h = _to_signed(xxh64_bytes(a, _to_unsigned(h)))
        else:
            raise TypeError(f"unsupported type {type(a)}")
    return h


def pmod(x: int, m: int) -> int:
    """Spark's pmod (non-negative modulus)."""
    r = x % m
    return r + m if r < 0 else r
