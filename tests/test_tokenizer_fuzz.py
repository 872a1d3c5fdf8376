"""Property fuzz: for ANY text, the oracle tokenizer and the
distributed implementation agree exactly, and decode(encode(x)) == x."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from clp_spark.config import VT_DICT, VT_FLOAT, VT_INT
from clp_spark.oracle.tokenizer import (
    decode_float,
    decode_message,
    tokenize_message,
)
from clp_spark.parse.tokenizer import parse_one

# text drawn from the alphabet that exercises every branch: digits,
# hex, letters, '=', delimiters, placeholders-adjacent bytes, newlines,
# backslashes, wildcard chars, unicode
_ALPHABET = st.sampled_from(
    list("abcdef ghXYZ=0123456789.-+_\\/:[](){}*?!\n\t\x11\x12\x13é•")
)
texts = st.text(alphabet=_ALPHABET, min_size=0, max_size=80)


@settings(max_examples=2000, deadline=None)
@given(texts)
def test_oracle_and_impl_agree(msg):
    o_lt, o_vs, o_vt, o_enc = tokenize_message(msg)
    i_lt, i_vs, i_vt, i_enc = parse_one(msg)
    assert i_lt == o_lt
    assert i_vs == o_vs
    assert i_vt == o_vt
    # oracle leaves dict slots None; impl puts 0 — compare typed slots
    for t, oe, ie in zip(o_vt, o_enc, i_enc):
        if t != VT_DICT:
            assert oe == ie


_NP_ALPHABET = st.sampled_from(
    list("abcdef ghXYZ=0123456789.-+_\\/:[](){}*?!\n\t\x11\x12\x13é•")
    + ["\x00", "\x01", "\x02", "\x03"]  # scalar-fallback trigger bytes
)
np_texts = st.lists(
    st.text(alphabet=_NP_ALPHABET, min_size=0, max_size=60),
    min_size=0,
    max_size=8,
)


@settings(max_examples=1500, deadline=None)
@given(np_texts)
def test_npscan_engine_agrees(batch):
    """The byte-level numpy engine (parse/npscan.py) must match the
    oracle row-for-row on WHOLE BATCHES — fuzzes the megastring row
    mapping (separators, escapes, unicode, control-byte fallback), not
    just single messages."""
    from clp_spark.parse.npscan import parse_block_rows

    got = parse_block_rows(batch)
    for msg, (lt, vs, vt, enc) in zip(batch, got):
        o_lt, o_vs, o_vt, o_enc = tokenize_message(msg)
        assert lt == o_lt, msg
        assert vs == o_vs, msg
        assert vt == o_vt, msg
        for t, oe, ie in zip(o_vt, o_enc, enc):
            if t != VT_DICT:
                assert oe == ie, msg


@settings(max_examples=2000, deadline=None)
@given(texts)
def test_roundtrip_byte_identical(msg):
    lt, vs, vt, enc = tokenize_message(msg)
    assert decode_message(lt, vs) == msg
    # float encodings must round-trip to the exact original token text
    for t, s, e in zip(vt, vs, enc):
        if t == VT_FLOAT:
            assert decode_float(e) == s
        elif t == VT_INT:
            assert str(e) == s
