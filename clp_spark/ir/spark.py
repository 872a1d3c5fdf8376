"""Spark operators over CLP IR streams.

Serialize DataFrames into IR streams and read/search the streams back —
all as narrow `mapInPandas` passes (no shuffle): each input partition
serializes independently into size-bounded streams, and each stream
deserializes + filters independently, so parallelism is #partitions on
the way in and #streams on the way out. At 100 TB the streams are the
unit of work exactly as the reference schedules one `kv_ir_search` task
per stream file (clp_s/kv_ir_search.hpp:26-36); no driver state grows
with data volume.

The predicate runs INSIDE the scan: a stream is one sequential buffer,
so per-event evaluation during the single deserialization pass is the
IO-optimal plan (there is no columnar projection to push — the wire
format is row-oriented by design; archive it with clps/encoder.py when
you want columnar pushdown).
"""

from __future__ import annotations

import json

import pandas as pd

try:  # fast JSON parse for the serialize hot path; KV IR stores typed
    # VALUES (doubles, int64s), not float source text, so orjson's
    # value-identical parse is sound here with no canonical-bytes check
    # (unlike clps/encoder.py, which must preserve float spellings)
    import orjson as _orjson
except ImportError:  # pragma: no cover
    _orjson = None


def _loads(s: str):
    if _orjson is not None:
        try:
            return _orjson.loads(s)
        except Exception:  # >64-bit ints, NaN literals → stdlib
            pass
    return json.loads(s)
from pyspark import TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clp_spark.ir.codec import IrStreamWriter, deserialize_ir_stream
from clp_spark.ir.kv import KvIrWriter, deserialize_kv_ir_stream

_STREAM_SCHEMA = "stream_id string, n_events long, data binary"
# Scan outputs are flushed every this-many buffered events, so a task's
# Python-side buffer is bounded by ~one stream's decode regardless of
# how many stream rows Arrow packs into a batch (each input ROW is a
# whole stream — without the bound, a 10k-row batch of 64Ki-event
# streams would buffer ~650M decoded events before yielding).
_SCAN_FLUSH_EVENTS = 65536
_KV_EVENT_SCHEMA = "stream_id string, event_idx long, user string, auto string"
_LOG_EVENT_SCHEMA = "stream_id string, event_idx long, ts_ms long, message string"


def _py(v):
    """numpy scalar → plain Python (KvIrWriter types on isinstance)."""
    return v.item() if hasattr(v, "item") else v


def _stream_id(seq: int) -> str:
    ctx = TaskContext.get()
    pid = ctx.partitionId() if ctx is not None else 0
    return f"p{pid:05d}-{seq:04d}"


# ---------------------------------------------------------------- KV IR
def serialize_kv_ir_df(
    df: DataFrame,
    json_col: str = "json",
    auto_cols: tuple[str, ...] = (),
    four_byte: bool = True,
    events_per_stream: int = 65536,
) -> DataFrame:
    """JSON-record DataFrame → KV IR streams, one row per stream
    (stream_id, n_events, data). `auto_cols` ride in the auto-generated
    schema tree (Serializer.cpp:574-640's auto-gen kv pairs) — the
    slot the reference uses for ingestion-time fields like timestamps.

    Each partition cuts a new stream every `events_per_stream` events,
    so stream size (and the per-task serializer state) is bounded
    regardless of partition size."""
    cols = [json_col, *auto_cols]
    sel = df.select(*cols)

    def ser(batches):
        writer = KvIrWriter(four_byte=four_byte)
        count = 0
        seq = 0
        for pdf in batches:
            recs = pdf[json_col]
            autos = [pdf[c] for c in auto_cols]
            for i in range(len(pdf)):
                user_kv = _loads(recs.iloc[i])
                auto_kv = {c: _py(col.iloc[i]) for c, col in zip(auto_cols, autos)}
                writer.add(user_kv, auto_kv or None)
                count += 1
                if count >= events_per_stream:
                    yield pd.DataFrame(
                        {
                            "stream_id": [_stream_id(seq)],
                            "n_events": [count],
                            "data": [writer.finish()],
                        }
                    )
                    writer = KvIrWriter(four_byte=four_byte)
                    count = 0
                    seq += 1
        if count:
            yield pd.DataFrame(
                {
                    "stream_id": [_stream_id(seq)],
                    "n_events": [count],
                    "data": [writer.finish()],
                }
            )

    return sel.mapInPandas(ser, _STREAM_SCHEMA)


def _kv_events(streams: DataFrame, query: str | None, ignore_case: bool) -> DataFrame:
    def scan(batches):
        pred = None
        if query is not None:
            # compiled once per task, evaluated per event — the stream
            # is deserialized exactly once whether or not it matches
            from clp_spark.ir.search import parse_kql_ir

            pred = parse_kql_ir(query, ignore_case)
        out_sid: list[str] = []
        out_idx: list[int] = []
        out_user: list[str] = []
        out_auto: list[str] = []

        def flush():
            out = pd.DataFrame(
                {
                    "stream_id": out_sid,
                    "event_idx": pd.Series(out_idx, dtype="int64"),
                    "user": out_user,
                    "auto": out_auto,
                }
            )
            out_sid.clear()
            out_idx.clear()
            out_user.clear()
            out_auto.clear()
            return out

        for pdf in batches:
            for sid, data in zip(pdf["stream_id"], pdf["data"]):
                _, events = deserialize_kv_ir_stream(bytes(data))
                for idx, ev in enumerate(events):
                    if pred is not None and not pred(ev):
                        continue
                    out_sid.append(sid)
                    out_idx.append(idx)
                    out_user.append(json.dumps(ev["user"], separators=(",", ":")))
                    out_auto.append(json.dumps(ev["auto"], separators=(",", ":")))
                if len(out_sid) >= _SCAN_FLUSH_EVENTS:
                    yield flush()
        yield flush()

    return streams.select("stream_id", "data").mapInPandas(scan, _KV_EVENT_SCHEMA)


def read_kv_ir(streams: DataFrame) -> DataFrame:
    """KV IR streams → one row per event (stream_id, event_idx, user
    JSON, auto JSON), in stream order."""
    return _kv_events(streams, None, False)


def search_kv_ir(
    streams: DataFrame, query: str, ignore_case: bool = False
) -> DataFrame:
    """Search KV IR streams directly with a KQL query — no archive
    build (kv_ir_search.hpp:26-36). Grammar and match semantics are
    shared with the archive path (ir/search.py); `@`-prefixed paths
    address the auto-generated namespace. Like the reference, count
    and projection modes are not supported on streams — archive first
    for those."""
    return _kv_events(streams, query, ignore_case)


_CONVERT_SCHEMA = "stream_id string, file string, n_events long, data binary"


def convert_log_df_to_kv_ir(
    df: DataFrame,
    msg_col: str = "message",
    file_col: str = "file",
    order_col: str | None = None,
    four_byte: bool = True,
    events_per_stream: int = 65536,
) -> DataFrame:
    """Unstructured log messages → KV-IR streams, one stream (or chain
    of size-bounded streams) per source file — the text→KV-IR converter
    (clp_s/log_converter/LogConverter.hpp:15-34). Each message becomes
    the record {"timestamp": <leading ts text>, "message": <rest>} with
    the timestamp kept as TEXT so the original format survives
    (LogSerializer.hpp:58-63, add_message), or {"message": ...} when no
    leading timestamp parses; the source file rides in the stream's
    user-defined metadata (cOriginalFileMetadataKey).

    Files are co-located per task via a hash repartition on `file_col`
    (pass `order_col` to restore message order within each file), so
    conversion parallelism is #files — the reference's one-task-per-file
    schedule — with no driver state."""
    from clp_spark.functions.timestamps import match_leading_timestamp

    cols = [file_col, msg_col] + ([order_col] if order_col else [])
    sel = df.select(*cols).repartition(F.col(file_col))
    # ALWAYS cluster by file within the task: shuffle-read order
    # interleaves blocks from different map tasks, so without this a
    # partition holding two files arrives as [A-block, B-block,
    # A-block, ...] and the f != cur_file flush fragments each file
    # into O(#upstream-partitions) tiny streams instead of one
    # events_per_stream-bounded chain per file
    sel = sel.sortWithinPartitions(
        *( [file_col, order_col] if order_col else [file_col] )
    )

    def conv(batches):
        writer = None
        cur_file = None
        count = 0
        seq = 0

        def flush():
            nonlocal writer, count, seq
            out = pd.DataFrame(
                {
                    "stream_id": [_stream_id(seq)],
                    "file": [cur_file],
                    "n_events": [count],
                    "data": [writer.finish()],
                }
            )
            writer = None
            count = 0
            seq += 1
            return out

        for pdf in batches:
            for f, msg in zip(pdf[file_col], pdf[msg_col]):
                if writer is not None and (f != cur_file or count >= events_per_stream):
                    yield flush()
                if writer is None:
                    cur_file = f
                    writer = KvIrWriter(
                        four_byte=four_byte,
                        user_defined_metadata={"original_file": f},
                    )
                pid, _ts, prefix, _tz, rest = match_leading_timestamp(msg)
                if pid is not None and prefix == "":
                    ts_text = msg[: len(msg) - len(rest)]
                    writer.add({"timestamp": ts_text, "message": rest}, None)
                else:
                    writer.add({"message": msg}, None)
                count += 1
        if writer is not None:
            yield flush()

    return sel.mapInPandas(conv, _CONVERT_SCHEMA)


# -------------------------------------------------------- unstructured IR
def serialize_ir_df(
    df: DataFrame,
    ts_col: str = "ts_ms",
    msg_col: str = "message",
    four_byte: bool = True,
    events_per_stream: int = 65536,
) -> DataFrame:
    """(ts_ms, message) DataFrame → unstructured IR streams (v0.0.2).

    Events are serialized in partition order; sort the input by
    timestamp first if delta-compression locality matters (four-byte
    streams store timestamp deltas)."""
    sel = df.select(F.col(ts_col).cast("long").alias("ts_ms"), F.col(msg_col).alias("message"))

    def ser(batches):
        writer = None
        count = 0
        seq = 0
        for pdf in batches:
            for ts, msg in zip(pdf["ts_ms"], pdf["message"]):
                ts = int(ts)
                if writer is None:
                    # reference_timestamp = first event's ts, so the
                    # first delta is 0 (encoding_methods.cpp:174-196)
                    writer = IrStreamWriter(four_byte=four_byte, reference_timestamp=ts)
                writer.add(ts, msg)
                count += 1
                if count >= events_per_stream:
                    yield pd.DataFrame(
                        {
                            "stream_id": [_stream_id(seq)],
                            "n_events": [count],
                            "data": [writer.finish()],
                        }
                    )
                    writer = None
                    count = 0
                    seq += 1
        if count:
            yield pd.DataFrame(
                {
                    "stream_id": [_stream_id(seq)],
                    "n_events": [count],
                    "data": [writer.finish()],
                }
            )

    return sel.mapInPandas(ser, _STREAM_SCHEMA)


def grep_ir(
    streams: DataFrame,
    pattern: str | None = None,
    ts_min: int | None = None,
    ts_max: int | None = None,
    ignore_case: bool = False,
) -> DataFrame:
    """Wildcard-grep unstructured IR streams without archiving them
    (the `clo`-on-IR analog): one deserialization pass per stream,
    timestamp range checked BEFORE message decode (delta-summed ts is
    available from the event frame alone), wildcard match on the
    decoded text. Returns (stream_id, event_idx, ts_ms, message)."""
    from clp_spark.ir import protocol as P
    from clp_spark.ir.codec import decode_message
    from clp_spark.search.wildcard import wildcard_match

    def scan(batches):
        out_sid: list[str] = []
        out_idx: list[int] = []
        out_ts: list[int] = []
        out_msg: list[str] = []

        def flush():
            out = pd.DataFrame(
                {
                    "stream_id": out_sid,
                    "event_idx": pd.Series(out_idx, dtype="int64"),
                    "ts_ms": pd.Series(out_ts, dtype="int64"),
                    "message": out_msg,
                }
            )
            out_sid.clear()
            out_idx.clear()
            out_ts.clear()
            out_msg.clear()
            return out

        for pdf in batches:
            for sid, data in zip(pdf["stream_id"], pdf["data"]):
                _, events = deserialize_ir_stream(bytes(data), decode=False)
                four_byte = bytes(data[:4]) == P.FOUR_BYTE_MAGIC
                for idx, ev in enumerate(events):
                    ts = ev["ts_ms"]
                    if ts_min is not None and ts < ts_min:
                        continue
                    if ts_max is not None and ts > ts_max:
                        continue
                    msg = decode_message(
                        ev["logtype"], ev["enc_vars"], ev["dict_vars"], four_byte
                    )
                    if pattern is not None and not wildcard_match(
                        pattern, msg, ignore_case
                    ):
                        continue
                    out_sid.append(sid)
                    out_idx.append(idx)
                    out_ts.append(ts)
                    out_msg.append(msg)
                if len(out_sid) >= _SCAN_FLUSH_EVENTS:
                    yield flush()
        yield flush()

    return streams.select("stream_id", "data").mapInPandas(scan, _LOG_EVENT_SCHEMA)
