"""Timestamp pattern table: parse + byte-exact regeneration round trip.

Pattern ids follow the reference table order
(TimestampPattern.cpp:124-192); cases below include one example per
reference pattern family plus the repo extensions."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from clp_spark.functions.timestamps import (
    TS_PATTERNS,
    extract_timestamp_df,
    match_leading_timestamp,
    regenerate_timestamp,
)

# (text, expected pattern id, expected prefix, expected rest)
CASES = [
    ("2015-01-31T15:50:45.392 INFO hi", 0, "", " INFO hi"),
    ("2015-01-31T15:50:45,392 x", 1, "", " x"),
    ("2015-01-31 15:50:45.392 x", 2, "", " x"),
    ("2015-01-31 15:50:45,392 x", 3, "", " x"),
    ("2015/01/31T15:50:45.123 x", 4, "", " x"),
    ("2015/01/31 15:50:45.123 x", 6, "", " x"),
    ("[2015-01-31 15:50:45,085] x", 8, "", " x"),
    ("INFO [main] 2015-01-31 15:50:45,085 x", 9, "INFO [main] ", " x"),
    ("<<<2016-11-10 03:02:29:936 x", 10, "", " x"),
    ("01 Jan 2016 15:50:17,085 x", 11, "", " x"),
    ("2015-01-31T15:50:45 plain", 12, "", " plain"),
    ("2015-01-31 15:50:45 plain", 13, "", " plain"),
    ("2015/01/31 15:50:45 x", 15, "", " x"),
    ("[2015-01-31T15:50:45] x", 16, "", "] x"),
    ("[20170106-16:56:41] x", 17, "", " x"),
    ("Start-Date: 2015-01-31  15:50:45 x", 18, "Start-Date: ", " x"),
    ("15/01/31 15:50:45 x", 19, "", " x"),
    ("150131  9:50:45 x", 20, "", " x"),
    ("Jan 01, 2016 3:50:17 PM x", 21, "", " x"),
    ("January 31, 2015 15:50 x", 22, "", " x"),
    ("E [31/Jan/2015:15:50:45 x", 23, "E ", " x"),
    ("192.168.4.5 - - [01/Jan/2016:15:50:17 x", 24, "192.168.4.5 - - ", " x"),
    ("192.168.4.5 - - [01/01/2016:15:50:17 x", 25, "192.168.4.5 - - ", " x"),
    (
        'Started POST "/a" for 1.2.3.4 at 2017-06-18 00:20:44 x',
        26,
        'Started POST "/a" for 1.2.3.4 at ',
        " x",
    ),
    ("update-alternatives 2015-01-31 15:50:45 x", 27, "update-alternatives ", " x"),
    (
        "ERROR: apport (pid 4557) Sun Feb  1 15:50:45 2015 x",
        28,
        "ERROR: apport (pid 4557) ",
        " x",
    ),
    ("Sun Feb  1 15:50:45 2015 x", 29, "", " x"),
    ("Jan 21 11:56:42 x", 30, "", " x"),
    ("01-21 11:56:42.392 x", 31, "", " x"),
    ("916321 x", 32, "", " x"),
    ("Jan  2 15:04:05 host daemon: msg", 33, "", " host daemon: msg"),
    ("1735830245123 payload", 32, "", " payload"),  # %#3 wins over epoch13
    ("0735830245 payload", 35, "", " payload"),  # leading 0 → epoch-sec
    ("no timestamp here", None, "", "no timestamp here"),
    # timezone-bearing patterns (clp_s \z{...} analog, ids 36-38)
    ("2015-01-31T15:50:45.392+05:30 x", 36, "", " x"),
    ("2015-01-31T15:50:45.392Z x", 36, "", " x"),
    ("2015-01-31T15:50:45-0800 x", 37, "", " x"),
    ("2015-01-31T15:50:45+02 x", 37, "", " x"),
    ("2024-01-05 10:00:00 +0530 uid=7", 38, "", " uid=7"),
]


@pytest.mark.parametrize("text,pid,prefix,rest", CASES)
def test_match_and_roundtrip(text, pid, prefix, rest):
    got_pid, ts_ms, got_prefix, got_tz, got_rest = match_leading_timestamp(text)
    assert got_pid == pid, text
    assert got_prefix == prefix
    assert got_rest == rest
    if pid is not None:
        regen = regenerate_timestamp(pid, ts_ms, got_tz)
        assert prefix + regen + rest == text  # byte-identical reconstruction


def test_pattern_count_matches_reference():
    # 33 reference patterns + 3 repo extensions + 2 epoch + 3 timezone
    assert len(TS_PATTERNS) == 39


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=0, max_value=4102444799_000),  # 1970..2099
    st.integers(min_value=0, max_value=len(TS_PATTERNS) - 1),
)
def test_regen_reparses_to_same_value(ts_ms, pid):
    pat = TS_PATTERNS[pid]
    if pat.num_spaces > 0:
        return  # prefixed patterns regenerate only the ts span
    if pat.fmt == "%#3" and ts_ms == 0:
        # unrepresentable in BOTH systems: the reference rejects a
        # leading '0' for relative timestamps (TimestampPattern.cpp:654
        # "Leading zeroes are not currently supported"), so "0" never
        # matches and regen(0) has no reparseable form
        return
    text = pat.regen(ts_ms) + " tail"
    got_pid, got_ts, _prefix, got_tz, rest = match_leading_timestamp(text)
    assert rest == " tail" or rest.endswith(" tail")
    # an earlier pattern may legitimately win; whoever wins, regenerating
    # with the winner must reproduce the exact same text span
    assert regenerate_timestamp(got_pid, got_ts, got_tz) + rest == text


def test_extract_df(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _, _, _) in enumerate(CASES)], "id long, text string"
    )
    rows = {r["id"]: r for r in extract_timestamp_df(df, keep=["id"]).collect()}
    for i, (text, pid, prefix, rest) in enumerate(CASES):
        assert rows[i]["ts_pattern_id"] == pid
        assert rows[i]["ts_prefix"] == (prefix if pid is not None else "")
        assert rows[i]["rest"] == rest


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=0, max_value=4102444799_000),
    st.integers(min_value=-23, max_value=23),
    st.integers(min_value=0, max_value=59),
    st.sampled_from(["colon", "plain", "hh", "zulu"]),
)
def test_tz_patterns_normalize_to_utc(ts_ms, off_h, off_m, style):
    """%z: parse adjusts to true UTC epoch; regen is byte-exact."""
    if style == "zulu":
        tz = "Z"
        off = 0
    else:
        sign = "-" if off_h < 0 else "+"
        h = abs(off_h)
        if style == "hh":
            tz, off_m = f"{sign}{h:02d}", 0
        elif style == "colon":
            tz = f"{sign}{h:02d}:{off_m:02d}"
        else:
            tz = f"{sign}{h:02d}{off_m:02d}"
        off = (h * 60 + off_m) * (-1 if off_h < 0 else 1)
    base = ts_ms - (ts_ms % 1000)  # pattern 37 has no millis
    local = base + off * 60_000
    if not (0 <= local <= 4102444799_000):
        return
    import datetime as dt

    wall = dt.datetime.fromtimestamp(local / 1000, tz=dt.timezone.utc)
    text = wall.strftime("%Y-%m-%dT%H:%M:%S") + tz + " x"
    pid, got_ts, _p, got_tz, rest = match_leading_timestamp(text)
    assert pid == 37 and rest == " x"
    assert got_tz == tz
    assert got_ts == base  # normalized to true UTC
    assert regenerate_timestamp(pid, got_ts, got_tz) + rest == text
