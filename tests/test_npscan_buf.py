"""parse_block_buf — the zero-copy Arrow-buffer tokenizer entry.

Must produce results identical to parse_block (list path) and the
scalar oracle over tricky shapes: empty rows, unicode multibyte
statics, int64 boundary ints, sliced Arrow arrays (non-zero offset),
nulls, and control-byte fallback. Reference tokenizer semantics:
clp/ir/parsing.cpp:20-88, EncodedVariableInterpreter.cpp:25-143.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from clp_spark.parse.npscan import parse_block, parse_block_buf, parse_block_rows
from clp_spark.parse.tokenizer import parse_one

CASES = [
    "2026-08-18 12:00:01 INFO task 17 took 3.25 ms id=abc123 \\ x11 0xDEAD",
    "",
    "no digits here",
    "=alpha beta=gamma 12.5.3",
    "héllo wörld 42 ümlaut=ß9",
    "a" * 300 + "123",
    "-9223372036854775808 9223372036854775807 19999999999999999999",
    "0.5 -0.25 .5 5. 00.5 1e5",
    "tail42",
    "   ",
    "1",
]


def _bufs(col):
    offs = np.frombuffer(col.buffers()[1], dtype=np.int32)[
        col.offset : col.offset + len(col) + 1
    ].astype(np.int64)
    vals = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    return vals, offs


def _logtypes(r):
    lo, lv = r["lt_offsets"], r["lt_values"]
    b = lv.tobytes()
    return [b[lo[i] : lo[i + 1]].decode("utf-8") for i in range(len(lo) - 1)]


def test_buf_matches_list_and_oracle():
    col = pc.fill_null(pa.array(CASES + [None], pa.string()), "")
    r = parse_block_buf(*_bufs(col))
    msgs = CASES + [""]
    rl = parse_block(msgs)
    assert r is not None and rl is not None
    for k in (
        "tok_offsets",
        "tok_val_offsets",
        "tok_bytes",
        "var_types",
        "enc",
        "n_toks",
        "raw_bytes",
    ):
        assert np.array_equal(r[k], rl[k]), k
    assert _logtypes(r) == rl["logtypes"]
    # and the list path matches the scalar oracle row-by-row
    for got, msg in zip(parse_block_rows(msgs), msgs):
        assert got == parse_one(msg), msg


def test_buf_sliced_column_nonzero_offset():
    col = pa.array(CASES, pa.string()).slice(2, 5)
    r = parse_block_buf(*_bufs(col))
    rl = parse_block(CASES[2:7])
    for k in ("tok_bytes", "var_types", "enc", "n_toks", "raw_bytes"):
        assert np.array_equal(r[k], rl[k]), k
    assert _logtypes(r) == rl["logtypes"]


@pytest.mark.parametrize(
    "rows,want_toks",
    [([], []), ([""], [0]), (["", ""], [0, 0]), (["abc 12"], [2])],
)
def test_buf_degenerate_shapes(rows, want_toks):
    col = pa.array(rows, pa.string())
    r = parse_block_buf(*_bufs(col))
    assert r["n_toks"].tolist() == want_toks
    assert len(r["lt_offsets"]) == len(rows) + 1


def test_buf_control_bytes_fall_back():
    vals = np.frombuffer(b"a\x01b", dtype=np.uint8)
    assert parse_block_buf(vals, np.array([0, 3], dtype=np.int64)) is None


def test_buf_single_row_no_separator_scatter():
    col = pa.array(["x=9 then 10.5 end"], pa.string())
    r = parse_block_buf(*_bufs(col))
    (lt, toks, vts, encs) = parse_one("x=9 then 10.5 end")
    assert _logtypes(r) == [lt]
    tb, vo = r["tok_bytes"].tobytes(), r["tok_val_offsets"]
    assert [
        tb[vo[i] : vo[i + 1]].decode() for i in range(len(vo) - 1)
    ] == toks
    assert r["var_types"].tolist() == vts
    assert r["enc"].tolist() == encs
