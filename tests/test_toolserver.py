"""MCP-analog tool surface (clp-mcp-server/server.py:111-166):
instruction gate, paged newest-first results, TTL sessions, timestamp
range, engine-side cap."""

from __future__ import annotations

import json

import pytest

from clp_spark.clps import encode_json_df
from clp_spark.toolserver import INSTRUCTIONS, LogToolServer


def _save_archive(spark, tmp, name, docs):
    df = spark.createDataFrame(
        [(i, 1_700_000_000_000 + i * 60_000, json.dumps(d)) for i, d in enumerate(docs)],
        "event_id long, ts_ms long, j string",
    )
    arch = encode_json_df(df, "j", passthrough=["event_id", "ts_ms"])
    d = str(tmp / name)
    arch.save(d)
    return d


@pytest.fixture(scope="module")
def dirs(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mcp")
    a = _save_archive(
        spark, tmp, "a",
        [{"svc": "auth", "code": 100 + i, "msg": f"user u{i} ok"} for i in range(25)],
    )
    b = _save_archive(
        spark, tmp, "b",
        [{"svc": "cart", "amount": i} for i in range(5)],
    )
    return [a, b]


def _server(spark, dirs, **kw):
    srv = LogToolServer(
        spark, dirs, ts_col="ts_ms", link_cols=("event_id",), **kw
    )
    assert srv.get_instructions("s") == INSTRUCTIONS
    return srv


def test_instruction_gate(spark, dirs):
    srv = LogToolServer(spark, dirs, ts_col="ts_ms")
    out = srv.search_by_kql("fresh", "svc: auth")
    assert "Error" in out and "instructions" in out["Error"]


def test_first_page_newest_first_and_pagination(spark, dirs):
    srv = _server(spark, dirs)
    page = srv.search_by_kql("s", "svc: auth")
    assert page["num_total_items"] == 25
    assert page["num_total_pages"] == 3
    assert page["num_items_per_page"] == 10
    assert page["has_next"] and not page["has_previous"]
    assert len(page["items"]) == 10
    # newest first: event 24 (latest ts) leads, link carries the id
    assert page["items"][0].startswith("timestamp: 2023-11-")
    assert page["items"][0].endswith("link: clp://a/24")
    assert '"code":124' in page["items"][0]

    p2 = srv.get_nth_page("s", 2)
    assert len(p2["items"]) == 5
    assert p2["has_previous"] and not p2["has_next"]
    assert p2["items"][-1].endswith("link: clp://a/0")
    assert "Error" in srv.get_nth_page("s", 3)
    assert "Error" in srv.get_nth_page("s", -1)


def test_sessions_are_isolated(spark, dirs):
    srv = _server(spark, dirs)
    srv.search_by_kql("s", "svc: auth")
    assert "Error" in srv.get_nth_page("other", 0)


def test_ts_range(spark, dirs):
    srv = _server(spark, dirs)
    # events 0..9 only (ts = base + i*60s)
    page = srv.search_by_kql_with_timestamp_range(
        "s", "svc: auth",
        "2023-11-14T22:13:20.000Z", "2023-11-14T22:22:20.000Z",
    )
    assert page["num_total_items"] == 10
    assert page["items"][0].endswith("clp://a/9")

    bad = srv.search_by_kql_with_timestamp_range(
        "s", "svc: auth", "2023-11-14T22:13:20.000", "2023-11-14T22:22:20.000Z"
    )
    assert "Error" in bad and "UTC" in bad["Error"]
    rev = srv.search_by_kql_with_timestamp_range(
        "s", "svc: auth",
        "2023-11-14T23:00:00.000Z", "2023-11-14T22:00:00.000Z",
    )
    assert "Error" in rev and "precedes" in rev["Error"]


def test_cross_archive_union_and_no_match(spark, dirs):
    srv = _server(spark, dirs)
    page = srv.search_by_kql("s", 'svc: *')
    assert page["num_total_items"] == 30  # both archives
    out = srv.search_by_kql("s", "no_such_field: 1")
    assert "Error" in out and "no log events" in out["Error"]


def test_engine_side_cap_marks_truncation(spark, dirs):
    srv = _server(spark, dirs, max_cached=7)
    page = srv.search_by_kql("s", "svc: auth")
    assert page["num_total_items"] == 7
    assert page.get("truncated") is True
    # cap keeps the NEWEST entries
    assert page["items"][0].endswith("clp://a/24")


def test_session_ttl_expiry(spark, dirs):
    now = [0.0]
    srv = LogToolServer(
        spark, dirs, ts_col="ts_ms", ttl_seconds=100.0, clock=lambda: now[0]
    )
    srv.get_instructions("s")
    srv.search_by_kql("s", "svc: auth")
    now[0] = 50.0
    assert "items" in srv.get_nth_page("s", 0)  # access refreshes TTL
    now[0] = 149.0
    assert "items" in srv.get_nth_page("s", 0)
    now[0] = 260.0  # past 149 + 100
    out = srv.get_nth_page("s", 0)
    assert "Error" in out  # expired: cache gone, session recreated
    assert "Error" in srv.search_by_kql("s", "svc: auth")  # gate re-armed


def test_archive_loads_cached_across_calls(spark, dirs, monkeypatch):
    """A long-lived server must not re-run driver-side dictionary
    collects per query: JsonArchive.load fires once per archive for
    repeated searches, and again only after the archive is re-saved."""
    import clp_spark.clps.encoder as enc

    calls = []
    real_load = enc.JsonArchive.load.__func__

    def counting_load(cls, spark_, d, **kw):
        calls.append(d)
        return real_load(cls, spark_, d, **kw)

    monkeypatch.setattr(
        enc.JsonArchive, "load", classmethod(counting_load)
    )
    srv = _server(spark, dirs)
    srv.search_by_kql("s", "svc: auth")
    n1 = len(calls)
    assert n1 >= 1
    srv.search_by_kql("s", "svc: auth")
    srv.search_by_kql("s", "svc: cart")
    assert len(calls) == max(n1, 2)  # cache hits; only new dirs load

    # touching the archive (a re-save) bumps the freshness token
    import os
    import time

    for d in dirs:
        entry = next(os.scandir(d)).path
        os.utime(entry, (time.time() + 5, time.time() + 5))
    srv.search_by_kql("s", "svc: auth")
    assert len(calls) > max(n1, 2)
