"""Key-value-pair IR stream (v0.1.0) codec.

Serializes structured records (Python dicts) into the KV IR format and
deserializes them back, without building an archive — the streaming
producer/consumer path that `clp_s`'s kv_ir_search consumes directly.

Reference behavior:
  - event layout (new schema-tree nodes → auto-gen id/value pairs →
    user-gen ids → user-gen values): clp/ffi/ir_stream/Serializer.cpp:
    574-724 and ir_unit_deserialization_methods.cpp:271-546
  - schema-tree node insertion: Serializer.cpp:726-767 (type tag,
    parent id — ones'-complement for the auto-generated tree — then
    the key as a tagged string); node ids are implicit insertion order
    with the root at id 0 (SchemaTree.hpp:244)
  - values: Serializer.cpp:286-340 (size-tiered ints, raw IEEE double,
    bools, plain strings without spaces, CLP-encoded strings with,
    null / empty-object markers, arrays as CLP-encoded text)

Each stream carries its own pair of schema trees (auto-generated keys
vs user-generated keys), built incrementally as events are serialized.
Arrays are serialized as their compact-JSON text through the CLP string
encoder (the reference serializes msgpack's textual dump the same way).
"""

from __future__ import annotations

import json
import struct

from clp_spark.ir import protocol as P
from clp_spark.ir.codec import (
    _append_str_value,
    _read_int,
    _read_len_tagged,
    decode_message,
    encode_message,
    read_message_tokens,
    read_preamble,
    serialize_metadata,
)

_PACK_I16 = struct.Struct(">h").pack
_PACK_I32 = struct.Struct(">i").pack
_PACK_I64 = struct.Struct(">q").pack
_PACK_D = struct.Struct(">d").pack
_UNPACK_D = struct.Struct(">d").unpack

_KEY_ID_TAGS = (
    P.SCHEMA_TREE_NODE_ID_BYTE,
    P.SCHEMA_TREE_NODE_ID_SHORT,
    P.SCHEMA_TREE_NODE_ID_INT,
)
_PARENT_ID_TAGS = (
    P.SCHEMA_TREE_NODE_PARENT_ID_BYTE,
    P.SCHEMA_TREE_NODE_PARENT_ID_SHORT,
    P.SCHEMA_TREE_NODE_PARENT_ID_INT,
)


def _node_type_of(val) -> str:
    if isinstance(val, bool):  # before int: Python bool subclasses int
        return P.NODE_TYPE_BOOL
    if isinstance(val, int):
        return P.NODE_TYPE_INT
    if isinstance(val, float):
        return P.NODE_TYPE_FLOAT
    if isinstance(val, str):
        return P.NODE_TYPE_STR
    if val is None or isinstance(val, dict):
        return P.NODE_TYPE_OBJ
    if isinstance(val, (list, tuple)):
        return P.NODE_TYPE_ARRAY
    raise TypeError(f"unsupported KV IR value type: {type(val).__name__}")


def _append_node_id(buf: bytearray, node_id: int, tags, auto: bool):
    """encode_and_serialize_schema_tree_node_id (utils.hpp:245-280):
    width from the id, ones' complement in that width when auto."""
    if node_id <= 0x7F:
        buf.append(tags[0])
        v = (~node_id) & 0xFF if auto else node_id
        buf += struct.pack(">b", v - 0x100 if v > 0x7F else v)
    elif node_id <= 0x7FFF:
        buf.append(tags[1])
        v = (~node_id) & 0xFFFF if auto else node_id
        buf += _PACK_I16(v - 0x10000 if v > 0x7FFF else v)
    elif node_id <= 0x7FFFFFFF:
        buf.append(tags[2])
        v = (~node_id) & 0xFFFFFFFF if auto else node_id
        buf += _PACK_I32(v - 0x100000000 if v > 0x7FFFFFFF else v)
    else:
        raise ValueError("schema tree node id out of range")


class _SchemaTree:
    __slots__ = ("nodes", "index", "_paths")

    def __init__(self):
        self.nodes = [(None, None, P.NODE_TYPE_OBJ)]  # root at id 0
        self.index: dict = {}
        # {node_id: path list} — _restore calls path_of per (id, value)
        # pair of every event in a stream scan; without the memo the
        # same parent chain is rebuilt O(events · pairs · depth) times
        self._paths: dict = {}

    def get_or_insert(self, parent_id: int, key: str, node_type: str):
        loc = (parent_id, key, node_type)
        nid = self.index.get(loc)
        if nid is not None:
            return nid, False
        nid = len(self.nodes)
        self.nodes.append(loc)
        self.index[loc] = nid
        return nid, True

    def path_of(self, node_id: int) -> list[str]:
        hit = self._paths.get(node_id)
        if hit is not None:
            return hit
        if node_id == P.ROOT_NODE_ID:
            return []
        parent, key, _ = self.nodes[node_id]
        path = self.path_of(parent) + [key]
        self._paths[node_id] = path
        return path


class KvIrWriter:
    """Serializes dict records into one KV IR stream."""

    def __init__(self, four_byte: bool = True, user_defined_metadata: dict | None = None):
        self.four_byte = four_byte
        self.auto_tree = _SchemaTree()
        self.user_tree = _SchemaTree()
        self.buf = bytearray()
        self.buf += P.FOUR_BYTE_MAGIC if four_byte else P.EIGHT_BYTE_MAGIC
        meta = {
            P.VERSION_KEY: P.KV_VERSION_VALUE,
            P.VARIABLES_SCHEMA_ID_KEY: P.VARIABLES_SCHEMA_VERSION,
            P.VARIABLE_ENCODING_METHODS_ID_KEY: P.VARIABLE_ENCODING_METHODS_VERSION,
        }
        if user_defined_metadata is not None:
            meta[P.USER_DEFINED_METADATA_KEY] = user_defined_metadata
        serialize_metadata(meta, self.buf)

    # -- values ------------------------------------------------------
    def _append_value(self, buf: bytearray, val, node_type: str):
        if node_type == P.NODE_TYPE_INT:
            if -128 <= val <= 127:
                buf.append(P.VALUE_INT8)
                buf += struct.pack(">b", val)
            elif -32768 <= val <= 32767:
                buf.append(P.VALUE_INT16)
                buf += _PACK_I16(val)
            elif -(2**31) <= val <= 2**31 - 1:
                buf.append(P.VALUE_INT32)
                buf += _PACK_I32(val)
            elif -(2**63) <= val <= 2**63 - 1:
                buf.append(P.VALUE_INT64)
                buf += _PACK_I64(val)
            else:
                raise OverflowError("int value outside int64 range")
        elif node_type == P.NODE_TYPE_FLOAT:
            buf.append(P.VALUE_FLOAT)
            buf += _PACK_D(val)
        elif node_type == P.NODE_TYPE_BOOL:
            buf.append(P.VALUE_TRUE if val else P.VALUE_FALSE)
        elif node_type == P.NODE_TYPE_STR:
            if " " not in val:
                _append_str_value(buf, val.encode("utf-8"))
            else:
                buf.append(
                    P.VALUE_FOUR_BYTE_CLP_STR if self.four_byte else P.VALUE_EIGHT_BYTE_CLP_STR
                )
                encode_message(val, self.four_byte, buf)
        elif node_type == P.NODE_TYPE_ARRAY:
            text = json.dumps(val, separators=(",", ":"), sort_keys=False)
            buf.append(P.VALUE_FOUR_BYTE_CLP_STR if self.four_byte else P.VALUE_EIGHT_BYTE_CLP_STR)
            encode_message(text, self.four_byte, buf)
        elif node_type == P.NODE_TYPE_OBJ:  # None value under an Obj node
            buf.append(P.VALUE_NULL)
        else:
            raise TypeError(f"unsupported node type {node_type}")

    # -- events ------------------------------------------------------
    def _dfs(self, kv: dict, tree: _SchemaTree, auto: bool, tree_buf, id_buf, val_buf):
        """serialize_msgpack_map_using_dfs (Serializer.cpp:447-520):
        depth-first, in insertion order, descending into sub-maps
        immediately. For the auto-gen group id_buf IS val_buf (pairs
        interleave); for user-gen they differ."""
        stack = [(P.ROOT_NODE_ID, list(kv.items()), 0)]
        while stack:
            parent_id, items, i = stack[-1]
            if i >= len(items):
                stack.pop()
                continue
            stack[-1] = (parent_id, items, i + 1)
            key, val = items[i]
            if not isinstance(key, str):
                raise TypeError("KV IR map keys must be strings")
            node_type = _node_type_of(val)
            nid, is_new = tree.get_or_insert(parent_id, key, node_type)
            if is_new:
                tree_buf.append(P.NODE_TYPE_TO_TAG[node_type])
                _append_node_id(tree_buf, parent_id, _PARENT_ID_TAGS, auto)
                _append_str_value(tree_buf, key.encode("utf-8"))
            if isinstance(val, dict):
                if val:
                    stack.append((nid, list(val.items()), 0))
                else:
                    _append_node_id(id_buf, nid, _KEY_ID_TAGS, auto)
                    val_buf.append(P.VALUE_EMPTY)
                continue
            _append_node_id(id_buf, nid, _KEY_ID_TAGS, auto)
            self._append_value(val_buf, val, node_type)

    def add(self, user_kv: dict, auto_kv: dict | None = None):
        tree_buf = bytearray()
        seq_buf = bytearray()
        user_val_buf = bytearray()
        # the event bytes are staged and committed atomically below; the
        # schema-tree INSERTS must be transactional too — a failed add
        # (unserializable value, non-str key) that left a node indexed
        # would make the NEXT add reference an id whose tree-insertion
        # bytes were discarded, corrupting the stream for every later
        # event. Snapshot both trees and roll back on any error.
        marks = (len(self.auto_tree.nodes), len(self.user_tree.nodes))
        try:
            if auto_kv:
                # auto-gen ids and values interleave in the seq buffer
                self._dfs(auto_kv, self.auto_tree, True, tree_buf, seq_buf, seq_buf)
            if user_kv:
                self._dfs(user_kv, self.user_tree, False, tree_buf, seq_buf, user_val_buf)
            else:
                seq_buf.append(P.VALUE_EMPTY)
        except Exception:
            for tree, mark in zip((self.auto_tree, self.user_tree), marks):
                for nid in range(mark, len(tree.nodes)):
                    tree._paths.pop(nid, None)
                for loc in tree.nodes[mark:]:
                    del tree.index[loc]
                del tree.nodes[mark:]
            raise
        self.buf += tree_buf
        self.buf += seq_buf
        self.buf += user_val_buf

    def finish(self) -> bytes:
        self.buf.append(P.EOF_BYTE)
        return bytes(self.buf)


# -------------------------------------------------------------- reading
def _read_node_id(data, pos: int, tag: int):
    """Returns (is_auto, node_id, pos). Negative on the wire = ones'
    complement of an auto-generated-tree id (utils.hpp:283-310)."""
    if tag in (P.SCHEMA_TREE_NODE_ID_BYTE, P.SCHEMA_TREE_NODE_PARENT_ID_BYTE):
        v, pos = _read_int(data, pos, 1)
    elif tag in (P.SCHEMA_TREE_NODE_ID_SHORT, P.SCHEMA_TREE_NODE_PARENT_ID_SHORT):
        v, pos = _read_int(data, pos, 2)
    elif tag in (P.SCHEMA_TREE_NODE_ID_INT, P.SCHEMA_TREE_NODE_PARENT_ID_INT):
        v, pos = _read_int(data, pos, 4)
    else:
        raise ValueError(f"corrupted KV IR: bad node-id tag 0x{tag:02x}")
    if v < 0:
        return True, ~v, pos
    return False, v, pos


def _read_value(data, pos: int, tag: int, four_byte: bool):
    """deserialize_value_and_insert_to_node_id_value_pairs
    (ir_unit_deserialization_methods.cpp:336-401). Returns (value, pos);
    empty-object is returned as the `_EMPTY` sentinel dict."""
    if tag == P.VALUE_INT8:
        return _read_int(data, pos, 1)
    if tag == P.VALUE_INT16:
        return _read_int(data, pos, 2)
    if tag == P.VALUE_INT32:
        return _read_int(data, pos, 4)
    if tag == P.VALUE_INT64:
        return _read_int(data, pos, 8)
    if tag == P.VALUE_FLOAT:
        return _UNPACK_D(bytes(data[pos : pos + 8]))[0], pos + 8
    if tag == P.VALUE_TRUE:
        return True, pos
    if tag == P.VALUE_FALSE:
        return False, pos
    if tag in (P.STR_LEN_UBYTE, P.STR_LEN_USHORT, P.STR_LEN_UINT):
        return _read_len_tagged(data, pos, tag, P.STR_LEN_UBYTE, P.STR_LEN_USHORT, P.STR_LEN_UINT)
    if tag in (P.VALUE_FOUR_BYTE_CLP_STR, P.VALUE_EIGHT_BYTE_CLP_STR):
        fb = tag == P.VALUE_FOUR_BYTE_CLP_STR
        inner = data[pos]
        pos += 1
        logtype, enc_vars, dict_vars, pos = read_message_tokens(data, pos, inner, fb)
        return _ClpStr(decode_message(logtype, enc_vars, dict_vars, fb)), pos
    if tag == P.VALUE_NULL:
        return None, pos
    if tag == P.VALUE_EMPTY:
        return _EMPTY, pos
    raise ValueError(f"corrupted KV IR: unknown value tag 0x{tag:02x}")


class _ClpStr(str):
    """Marks a string that was CLP-encoded on the wire (vs plain)."""


_EMPTY = object()  # ValueEmpty sentinel (empty object / empty user map)


def _set_path(target: dict, path: list[str], value):
    cur = target
    for key in path[:-1]:
        nxt = cur.get(key)
        if not isinstance(nxt, dict):
            nxt = {}
            cur[key] = nxt
        cur = nxt
    cur[path[-1]] = value


def deserialize_kv_ir_stream(data: bytes, array_as_json: bool = True):
    """Parses a full KV IR stream → (metadata, events).

    Each event is a dict {"user": {...}, "auto": {...}} with values
    restored to Python types (CLP-encoded strings decoded; array nodes
    parsed back from their JSON text when `array_as_json`)."""
    four_byte, meta, pos = read_preamble(data)
    auto_tree = _SchemaTree()
    user_tree = _SchemaTree()
    events = []
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        if tag == P.EOF_BYTE:
            break
        if tag == P.UTC_OFFSET_CHANGE:
            _, pos = _read_int(data, pos, 8)
            continue
        if tag in P.TAG_TO_NODE_TYPE:  # schema-tree node insertion
            node_type = P.TAG_TO_NODE_TYPE[tag]
            ptag = data[pos]
            pos += 1
            if ptag not in _PARENT_ID_TAGS:
                raise ValueError(f"corrupted KV IR: bad parent-id tag 0x{ptag:02x}")
            is_auto, parent_id, pos = _read_node_id(data, pos, ptag)
            ktag = data[pos]
            pos += 1
            key, pos = _read_len_tagged(
                data, pos, ktag, P.STR_LEN_UBYTE, P.STR_LEN_USHORT, P.STR_LEN_UINT
            )
            tree = auto_tree if is_auto else user_tree
            tree.nodes.append((parent_id, key, node_type))
            continue
        if tag not in _KEY_ID_TAGS and tag != P.VALUE_EMPTY:
            raise ValueError(f"corrupted KV IR: unexpected unit tag 0x{tag:02x}")

        # ---- log event (deserialize_ir_unit_kv_pair_log_event) ----
        auto_pairs: list[tuple[int, object]] = []
        user_schema: list[int] = []
        while tag in _KEY_ID_TAGS:
            is_auto, nid, pos = _read_node_id(data, pos, tag)
            tag = data[pos]
            pos += 1
            if not is_auto:
                user_schema.append(nid)
                break
            val, pos = _read_value(data, pos, tag, four_byte)
            auto_pairs.append((nid, val))
            tag = data[pos]
            pos += 1
        while tag in _KEY_ID_TAGS:
            is_auto, nid, pos = _read_node_id(data, pos, tag)
            if is_auto:
                raise ValueError("corrupted KV IR: auto id after user ids")
            user_schema.append(nid)
            tag = data[pos]
            pos += 1
        user_pairs: list[tuple[int, object]] = []
        if user_schema:
            for i, nid in enumerate(user_schema):
                val, pos = _read_value(data, pos, tag, four_byte)
                user_pairs.append((nid, val))
                if i + 1 < len(user_schema):
                    tag = data[pos]
                    pos += 1
        elif tag != P.VALUE_EMPTY:
            raise ValueError("corrupted KV IR: empty log event without ValueEmpty")

        events.append(
            {
                "user": _restore(user_pairs, user_tree, array_as_json),
                "auto": _restore(auto_pairs, auto_tree, array_as_json),
            }
        )
    return meta, events


def _restore(pairs, tree: _SchemaTree, array_as_json: bool) -> dict:
    out: dict = {}
    for nid, val in pairs:
        path = tree.path_of(nid)
        node_type = tree.nodes[nid][2]
        if val is _EMPTY:
            val = {}
        elif isinstance(val, _ClpStr) and node_type == P.NODE_TYPE_ARRAY and array_as_json:
            val = json.loads(val)
        elif isinstance(val, _ClpStr):
            val = str(val)
        _set_path(out, path, val)
    return out
