"""Timestamp pattern table: parse + byte-exact regeneration round trip."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from clp_spark.functions.timestamps import (
    TS_PATTERNS,
    extract_timestamp_df,
    match_leading_timestamp,
    regenerate_timestamp,
)

CASES = [
    ("2025-01-02T15:04:05.123 INFO hi", 0, " INFO hi"),
    ("2025-01-02 15:04:05.999 x", 1, " x"),
    ("2025-01-02T15:04:05 plain", 2, " plain"),
    ("2025-01-02 15:04:05 plain", 3, " plain"),
    ("02/Jan/2025:15:04:05 GET /", 4, " GET /"),
    ("Jan  2 15:04:05 host daemon: msg", 5, " host daemon: msg"),
    ("1735830245123 payload", 6, " payload"),
    ("1735830245 payload", 7, " payload"),
    ("no timestamp here", None, "no timestamp here"),
]


@pytest.mark.parametrize("text,pid,rest", CASES)
def test_match_and_roundtrip(text, pid, rest):
    got_pid, ts_ms, got_rest = match_leading_timestamp(text)
    assert got_pid == pid
    assert got_rest == rest
    if pid is not None:
        regen = regenerate_timestamp(pid, ts_ms)
        assert regen + rest == text  # byte-identical reconstruction


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=0, max_value=4102444799_000),  # 1970..2099
    st.integers(min_value=0, max_value=len(TS_PATTERNS) - 1),
)
def test_regen_reparses_to_same_value(ts_ms, pid):
    # syslog has no year → same-ms only within 1970; mod out the year part
    text = regenerate_timestamp(pid, ts_ms) + " tail"
    got_pid, got_ts, rest = match_leading_timestamp(text)
    assert rest == " tail"
    assert got_pid == pid or TS_PATTERNS[got_pid][0].pattern == TS_PATTERNS[pid][0].pattern
    if pid not in (5,):  # syslog drops the year
        # ms-precision loss only where the pattern has no ms field
        scale = 1000 if pid in (2, 3, 4, 7) else 1
        assert got_ts // scale * scale == ts_ms // scale * scale


def test_extract_df(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _, _) in enumerate(CASES)], "id long, text string"
    )
    rows = {r["id"]: r for r in extract_timestamp_df(df, keep=["id"]).collect()}
    for i, (text, pid, rest) in enumerate(CASES):
        assert rows[i]["ts_pattern_id"] == pid
        assert rows[i]["rest"] == rest
