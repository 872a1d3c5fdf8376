"""IR stream layer: byte-exact roundtrips for both wire formats and
both variable encodings, archive-parity for in-stream KQL, and the
Spark serialize/search operators.

Reference: clp/ffi/ir_stream (protocol_constants.hpp, Serializer.cpp,
ir_unit_deserialization_methods.cpp), clp_s/kv_ir_search.hpp:26-36."""

from __future__ import annotations

import json

import pytest
from hypothesis import given, settings, strategies as st

from clp_spark.ir import (
    IrStreamWriter,
    KvIrWriter,
    deserialize_ir_stream,
    deserialize_kv_ir_stream,
    parse_kql_ir,
)

# ---------------------------------------------------------------- codecs

_MSG_ALPHABET = st.sampled_from(
    list("abcdef ghXYZ=0123456789.-+_\\/:[](){}*?!\n\t\x11\x12\x13é•")
)
_msgs = st.lists(
    st.text(alphabet=_MSG_ALPHABET, min_size=0, max_size=60),
    min_size=1,
    max_size=12,
)
_deltas = st.lists(
    st.integers(min_value=-(2**40), max_value=2**40), min_size=1, max_size=12
)


@settings(max_examples=400, deadline=None)
@given(_msgs, _deltas, st.booleans())
def test_unstructured_roundtrip_byte_exact(msgs, deltas, four_byte):
    ts = 1_700_000_000_000
    events_in = []
    w = IrStreamWriter(four_byte=four_byte, reference_timestamp=ts)
    for i, m in enumerate(msgs):
        ts += deltas[i % len(deltas)]
        w.add(ts, m)
        events_in.append((ts, m))
    data = w.finish()
    _, events = deserialize_ir_stream(data)
    assert [(e["ts_ms"], e["message"]) for e in events] == events_in
    # writer determinism: same events → byte-identical stream
    w2 = IrStreamWriter(four_byte=four_byte, reference_timestamp=1_700_000_000_000)
    for t, m in events_in:
        w2.add(t, m)
    assert w2.finish() == data


def test_four_byte_degrades_unrepresentable_tokens_to_dict_vars():
    # int64-but-not-int32 and >8-digit floats can't ride the four-byte
    # encoded-var path (encoding_methods.inc:14-132) — they fall back
    # to dictionary vars and still roundtrip byte-exactly
    msg = "big=123456789012 f=123456.789012 ok=7 g=1.5"
    w4 = IrStreamWriter(four_byte=True, reference_timestamp=0)
    w4.add(5, msg)
    _, ev4 = deserialize_ir_stream(w4.finish())
    w8 = IrStreamWriter(four_byte=False)
    w8.add(5, msg)
    _, ev8 = deserialize_ir_stream(w8.finish())
    assert ev4[0]["message"] == msg
    assert ev8[0]["message"] == msg
    # eight-byte packs all four tokens; four-byte only the small two
    assert len(ev8[0]["enc_vars"]) == 4 and not ev8[0]["dict_vars"]
    assert len(ev4[0]["enc_vars"]) == 2 and len(ev4[0]["dict_vars"]) == 2


def test_truncated_stream_tolerated_at_event_boundary():
    w = IrStreamWriter(four_byte=True, reference_timestamp=0)
    w.add(1, "hello world 42")
    w.add(2, "goodbye 7")
    data = w.finish()
    _, events = deserialize_ir_stream(data[:-1])  # EOF byte missing
    assert [e["message"] for e in events] == ["hello world 42", "goodbye 7"]


_keys = st.text(
    alphabet=st.sampled_from(list("abcXYZ09 _-é")), min_size=1, max_size=8
)
_scalars = st.one_of(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.floats(allow_nan=False, allow_infinity=False),
    st.booleans(),
    st.none(),
    st.text(alphabet=_MSG_ALPHABET, max_size=40),
)
_values = st.recursive(
    _scalars,
    lambda inner: st.one_of(
        st.lists(inner, max_size=4),
        st.dictionaries(_keys, inner, max_size=4),
    ),
    max_leaves=12,
)
_records = st.lists(
    st.dictionaries(_keys, _values, max_size=6), min_size=1, max_size=8
)


@settings(max_examples=300, deadline=None)
@given(_records, _records, st.booleans())
def test_kv_roundtrip(users, autos, four_byte):
    n = max(len(users), len(autos))
    users = (users * n)[:n]
    autos = (autos * n)[:n]
    w = KvIrWriter(four_byte=four_byte)
    for u, a in zip(users, autos):
        w.add(u, a)
    data = w.finish()
    _, events = deserialize_kv_ir_stream(data)
    assert len(events) == n
    for ev, u, a in zip(events, users, autos):
        assert ev["user"] == u
        assert ev["auto"] == a
    # determinism
    w2 = KvIrWriter(four_byte=four_byte)
    for u, a in zip(users, autos):
        w2.add(u, a)
    assert w2.finish() == data


def test_kv_int_outside_int64_raises():
    w = KvIrWriter()
    with pytest.raises(OverflowError):
        w.add({"big": 2**63}, None)


def test_kv_user_metadata_rides_the_preamble():
    w = KvIrWriter(user_defined_metadata={"job": "ingest-7"})
    w.add({"a": 1}, None)
    meta, events = deserialize_kv_ir_stream(w.finish())
    assert meta["USER_DEFINED_METADATA"] == {"job": "ingest-7"}
    assert events[0]["user"] == {"a": 1}


# ------------------------------------------------- archive ↔ stream parity

RECORDS = [
    {"id": 0, "level": "INFO", "msg": "request handled in 35 ms", "k": 42},
    {"id": 1, "level": "ERROR", "msg": "timeout after 2.5 sec", "k": 7,
     "ctx": {"host": "node-3", "retries": 2}},
    {"id": 2, "level": "INFO", "msg": "cache hit ratio 0.95", "pi": 3.14159,
     "flags": [1, 2, 3]},
    {"id": 3, "level": "WARN", "ok": True, "k": 42, "note": None},
    {"id": 4, "level": "INFO", "ctx": {"host": "node-7", "retries": 0}},
    {"id": 5, "level": "ERROR", "msg": "request handled in 35 ms", "k": 99},
    {"id": 6, "level": "info-lower", "k": -5, "nested": {"deep": {"x": "y z"}}},
]

PARITY_QUERIES = [
    ("k: 42", False),
    ("k < 40", False),
    ("k >= 42", False),
    ('level: "ERROR"', False),
    ('msg: "request handled in 35 ms"', False),
    # wildcard values match inside CLP-encoded strings on BOTH engines
    # (QueryRunner.cpp:463-516 evaluate_clp_string_filter)
    ('msg: "request*"', False),
    ('msg: "*2.5*"', False),
    ('msg: "*HANDLED*"', False),
    ('msg: "*handled*"', True),
    ('ctx: {host: "node-3"}', False),
    ("ctx: {host: node-7 AND retries: 0}", False),
    ('nested: {deep: {x: "y z"}}', False),
    ("level: (INFO WARN)", False),
    ("level: (not INFO ERROR)", False),
    ("k: (42 99)", False),
    ("NOT level: INFO AND k > 0", False),
    # exists on an interior OBJECT path matches nothing — the reference
    # has no ObjectT literal type (SchemaTree.cpp:12-14 TODO), so both
    # engines must agree on the empty result
    ("ctx: *", False),
    ("ctx.retries: *", False),
    ("flags: 2", False),
    ("flags > 2", False),
    ("pi: 3.14159", False),
    ("pi > 3", False),
    ("ok: true", False),
    ("note: null", False),
    ('"42"', False),
    ("42", False),
    ('le*l: "INFO*"', True),
    ('level: "INFO*"', True),
]


@pytest.fixture(scope="module")
def parity_archive(spark):
    from clp_spark.clps import encode_json_df

    df = spark.createDataFrame(
        [(r["id"], json.dumps(r)) for r in RECORDS], "rid long, json string"
    )
    a = encode_json_df(df, "json", passthrough=["rid"])
    a.encoded = a.encoded.persist()
    a.encoded.count()
    return a


@pytest.fixture(scope="module")
def parity_events():
    w = KvIrWriter(four_byte=True)
    for r in RECORDS:
        w.add(r, {"rid": r["id"]})
    _, events = deserialize_kv_ir_stream(w.finish())
    return events


@pytest.mark.parametrize("query,icase", PARITY_QUERIES)
def test_stream_kql_matches_archive_kql(parity_archive, parity_events, query, icase):
    """The in-stream evaluator and the archive KQL engine must agree on
    every grammar feature — same records, same query, same ids."""
    from clp_spark.clps import kql_query

    arch_ids = sorted(
        r["rid"]
        for r in kql_query(parity_archive, query, ignore_case=icase)
        .select("rid")
        .collect()
    )
    pred = parse_kql_ir(query, ignore_case=icase)
    stream_ids = sorted(ev["auto"]["rid"] for ev in parity_events if pred(ev))
    assert stream_ids == arch_ids, query


def test_stream_kql_autogen_namespace(parity_events):
    # '@'-prefixed paths resolve in the auto-generated tree
    pred = parse_kql_ir("@rid: 3")
    assert [ev["auto"]["rid"] for ev in parity_events if pred(ev)] == [3]


def test_stream_kql_rejects_range_index_filters(parity_events):
    with pytest.raises(ValueError, match="range index"):
        parse_kql_ir('$filename: "a.log"')


# ---------------------------------------------------------- spark operators


@pytest.fixture(scope="module")
def kv_streams(spark):
    from clp_spark.ir import serialize_kv_ir_df

    df = spark.createDataFrame(
        [(r["id"], json.dumps(r)) for r in RECORDS for _ in range(3)],
        "rid long, json string",
    ).repartition(2)
    # tiny events_per_stream forces multiple streams per partition
    return serialize_kv_ir_df(
        df, "json", auto_cols=("rid",), events_per_stream=4
    ).persist()


def test_serialize_kv_ir_df_partitions_into_bounded_streams(kv_streams):
    rows = kv_streams.collect()
    assert sum(r["n_events"] for r in rows) == len(RECORDS) * 3
    assert all(r["n_events"] <= 4 for r in rows)
    assert len({r["stream_id"] for r in rows}) == len(rows)


def test_search_kv_ir_matches_driver_eval(kv_streams):
    from clp_spark.ir import read_kv_ir, search_kv_ir

    q = 'level: (INFO WARN) AND k: *'
    hits = search_kv_ir(kv_streams, q).collect()
    got = sorted(json.loads(r["auto"])["rid"] for r in hits)
    pred = parse_kql_ir(q)
    all_events = [
        {"user": json.loads(r["user"]), "auto": json.loads(r["auto"])}
        for r in read_kv_ir(kv_streams).collect()
    ]
    want = sorted(ev["auto"]["rid"] for ev in all_events if pred(ev))
    assert got == want
    assert len(all_events) == len(RECORDS) * 3


def test_convert_log_df_to_kv_ir(spark):
    """text→KV-IR converter (LogConverter.hpp:15-34): one stream chain
    per file, timestamp kept as original TEXT (LogSerializer.hpp:58-63),
    original_file in the stream metadata, searchable with stream KQL."""
    from clp_spark.ir import convert_log_df_to_kv_ir

    rows = []
    for i in range(20):
        f = f"app-{i % 3}.log"
        rows.append((f, i, f"2024-01-0{(i % 5) + 1}T12:00:0{i % 10}.000 job {i} ok"))
    rows.append(("app-0.log", 99, "no leading timestamp here 7"))
    df = spark.createDataFrame(rows, "file string, msg_idx long, message string")
    streams = convert_log_df_to_kv_ir(
        df, "message", "file", order_col="msg_idx", events_per_stream=4
    ).persist()
    out = streams.collect()
    assert sum(r["n_events"] for r in out) == len(rows)
    assert all(r["n_events"] <= 4 for r in out)

    by_file: dict = {}
    for r in out:
        meta, events = deserialize_kv_ir_stream(bytes(r["data"]))
        assert meta["USER_DEFINED_METADATA"] == {"original_file": r["file"]}
        by_file.setdefault(r["file"], []).extend(events)
    # timestamp text + message reassemble the original line byte-exactly
    reassembled = sorted(
        ev["user"].get("timestamp", "") + ev["user"]["message"]
        for evs in by_file.values()
        for ev in evs
    )
    assert reassembled == sorted(m for _, _, m in rows)
    # the no-timestamp line has only a message field
    odd = [
        ev
        for ev in by_file["app-0.log"]
        if ev["user"]["message"].startswith("no leading")
    ]
    assert odd and "timestamp" not in odd[0]["user"]
    # converted streams are directly searchable (kv_ir_search analog)
    from clp_spark.ir import search_kv_ir

    hits = search_kv_ir(streams, 'message: "*job 7*"').collect()
    assert len(hits) == 1


def test_convert_no_order_col_does_not_fragment(spark):
    """Without order_col the converter must still cluster rows by file
    within each task: shuffle-read interleaves upstream blocks, and an
    unsorted partition holding two files would flush a tiny stream at
    every alternation. One stream per file when events fit."""
    from clp_spark.ir import convert_log_df_to_kv_ir

    rows = [
        (f"app-{i % 4}.log", f"2024-01-01T12:00:00.000 row {i} ok")
        for i in range(400)
    ]
    # many upstream partitions → many interleaved shuffle blocks
    df = spark.createDataFrame(
        rows, "file string, message string"
    ).repartition(32)
    out = convert_log_df_to_kv_ir(df, "message", "file").collect()
    assert sum(r["n_events"] for r in out) == len(rows)
    assert len(out) == 4  # exactly one stream per file


def test_unstructured_spark_grep_and_ts_range(spark):
    from clp_spark.ir import grep_ir, serialize_ir_df

    rows = [(i * 1000, f"job {i} finished in {i * 3} ms") for i in range(40)]
    df = spark.createDataFrame(rows, "ts_ms long, message string").repartition(3)
    streams = serialize_ir_df(df, events_per_stream=7).persist()
    assert streams.agg({"n_events": "sum"}).first()[0] == 40
    out = grep_ir(streams, "job * finished*", ts_min=10_000, ts_max=20_000)
    got = sorted(r["message"] for r in out.collect())
    want = sorted(m for t, m in rows if 10_000 <= t <= 20_000)
    assert got == want
    # no filter → every event back, byte-exact
    assert sorted(r["message"] for r in grep_ir(streams).collect()) == sorted(
        m for _, m in rows
    )


def test_scan_flush_bound_is_exact(spark, kv_streams, monkeypatch):
    """The per-task output buffer flushes every _SCAN_FLUSH_EVENTS
    buffered events (each input ROW is a whole stream, so without the
    bound a task would buffer every decoded event of every stream in an
    Arrow batch). A tiny bound must change batching only — results are
    identical for both scan families."""
    import clp_spark.ir.spark as irs
    from clp_spark.ir import grep_ir, read_kv_ir, serialize_ir_df

    baseline_kv = sorted(
        (r["stream_id"], r["event_idx"], r["user"], r["auto"])
        for r in read_kv_ir(kv_streams).collect()
    )
    rows = [(i * 1000, f"job {i} done") for i in range(30)]
    df = spark.createDataFrame(rows, "ts_ms long, message string").repartition(2)
    streams = serialize_ir_df(df, events_per_stream=5).persist()
    baseline_log = sorted(
        (r["ts_ms"], r["message"]) for r in grep_ir(streams).collect()
    )

    monkeypatch.setattr(irs, "_SCAN_FLUSH_EVENTS", 3)
    got_kv = sorted(
        (r["stream_id"], r["event_idx"], r["user"], r["auto"])
        for r in read_kv_ir(kv_streams).collect()
    )
    got_log = sorted((r["ts_ms"], r["message"]) for r in grep_ir(streams).collect())
    assert got_kv == baseline_kv
    assert got_log == baseline_log


def test_kv_writer_failed_add_rolls_back_schema_tree(spark):
    """A failed add() must not leave nodes indexed whose tree-insertion
    bytes were discarded — later events would reference ids the reader
    has never seen, corrupting the whole stream."""
    import pytest as _pytest

    from clp_spark.ir.kv import KvIrWriter, deserialize_kv_ir_stream

    w = KvIrWriter()
    w.add({"a": 1})
    with _pytest.raises(OverflowError):
        w.add({"a": 5, "huge": 2**70})  # fails after inserting 'huge'
    with _pytest.raises(TypeError):
        w.add({"ok": {1: "non-string key"}})
    w.add({"a": 2, "huge": 3})  # 'huge' must insert FRESH (and serialize)
    meta, events = deserialize_kv_ir_stream(w.finish())
    assert [e["user"] for e in events] == [{"a": 1}, {"a": 2, "huge": 3}]
