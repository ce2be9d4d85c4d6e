"""Event wire formats (reference parity: stateflow/serialization/ —
json_serde.py:8-48, pickle_serializer.py, cloudpickle_serializer.py,
proto/proto_serde.py).

Four interchangeable serdes:

- PickleSerde — the default engine wire form: arbitrary Python payloads
  (the reference's pickle serializer makes the same trade).
- CloudpickleSerde — same wire shape, serialized with cloudpickle, so
  events can carry closures/locally-defined classes (the reference ships
  the same variant, serialization/cloudpickle_serializer.py).
- JsonSerde — language-neutral form for cross-system topics. Entity
  references are tagged ``{"_type": "InternalClassRef", ...}`` exactly
  like the reference's wire convention (event_flow.py:34-59); in-flight
  flow state, tuples, and bytes get analogous tags. Values must be
  JSON-representable (the reference's json serde has the same
  restriction — its payloads are dicts of primitives).
- ProtoSerde — protobuf envelope with a pickled payload, mirroring the
  reference's proto_serde.py: routing fields (event_id, address, type,
  seq) are plain proto fields a router in ANY language can read without
  unpickling the Python payload. Encoded with a hand-rolled protobuf
  wire-format codec (varint + length-delimited fields) so no protobuf
  runtime is required; the bytes are exactly what protoc-generated code
  for ``proto/event.proto`` would produce.

At 100 TB the serde choice is a real knob: JSON events are ~2-3× larger
and ~10× slower to decode than pickled/Arrow rows, but are consumable by
non-Python producers. Engines take a serde so deployments can pick.
"""

from __future__ import annotations

import base64
import json
from typing import Any

from stateflow_spark.entity.interpreter import FlowState, PendingCall
from stateflow_spark.entity.model import EntityRef, Event, EventType


class PickleSerde:
    def to_bytes(self, event: Event) -> bytes:
        return event.to_bytes()

    def from_bytes(self, b: bytes) -> Event:
        return Event.from_bytes(b)


def _encode(v: Any) -> Any:
    if isinstance(v, EntityRef):
        # wire parity: reference InternalClassRef dict, event_flow.py:34-59
        return {"_type": "InternalClassRef", "entity": v.entity, "key": v.key}
    if isinstance(v, FlowState):
        return {
            "_type": "FlowState",
            "flow_id": v.flow_id,
            "entity": v.entity,
            "method": v.method,
            "self_ref": _encode(v.self_ref),
            "ip": v.ip,
            "ns": {k: _encode(x) for k, x in v.ns.items()},
            "cache": [
                [list(k), _encode(st)] for k, st in v.cache.items()
            ],
            "pending": _encode(v.pending) if v.pending else None,
            "parent": _encode(v.parent) if v.parent else None,
            "parent_result_var": v.parent_result_var,
            # stable order for wire determinism; string-keyed sort because
            # entity keys may mix types (int vs str __key__) and a plain
            # list sort would TypeError on heterogeneous pairs
            "written": sorted(
                (list(k) for k in v.written),
                key=lambda p: (str(p[0]), str(p[1])),
            ),
        }
    if isinstance(v, PendingCall):
        return {
            "_type": "PendingCall",
            "target": _encode(v.target),
            "method": v.method,
            "args": [_encode(a) for a in v.args],
            "result_var": v.result_var,
        }
    if isinstance(v, tuple):
        return {"_type": "tuple", "items": [_encode(x) for x in v]}
    if isinstance(v, bytes):
        return {"_type": "bytes", "b64": base64.b64encode(v).decode()}
    if isinstance(v, dict):
        return {k: _encode(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_encode(x) for x in v]
    if v is None or isinstance(v, (str, int, float, bool)):
        return v
    raise TypeError(
        f"JsonSerde cannot encode {type(v).__name__}; use PickleSerde for "
        f"arbitrary Python payloads"
    )


def _decode(v: Any) -> Any:
    if isinstance(v, dict):
        t = v.get("_type")
        if t == "InternalClassRef":
            return EntityRef(v["entity"], v["key"])
        if t == "FlowState":
            return FlowState(
                flow_id=v["flow_id"],
                entity=v["entity"],
                method=v["method"],
                self_ref=_decode(v["self_ref"]),
                ip=v["ip"],
                ns={k: _decode(x) for k, x in v["ns"].items()},
                cache={tuple(k): _decode(st) for k, st in v["cache"]},
                pending=_decode(v["pending"]) if v["pending"] else None,
                parent=_decode(v["parent"]) if v["parent"] else None,
                parent_result_var=v["parent_result_var"],
                written={tuple(k) for k in v.get("written", [])},
            )
        if t == "PendingCall":
            return PendingCall(
                target=_decode(v["target"]),
                method=v["method"],
                args=tuple(_decode(a) for a in v["args"]),
                result_var=v["result_var"],
            )
        if t == "tuple":
            return tuple(_decode(x) for x in v["items"])
        if t == "bytes":
            return base64.b64decode(v["b64"])
        return {k: _decode(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_decode(x) for x in v]
    return v


class JsonSerde:
    def to_bytes(self, event: Event) -> bytes:
        doc = {
            "event_id": event.event_id,
            "entity": event.entity,
            "key": event.key,
            "event_type": event.event_type.value,
            "seq": event.seq,
            "payload": _encode(event.payload),
        }
        return json.dumps(doc, separators=(",", ":")).encode()

    def from_bytes(self, b: bytes) -> Event:
        doc = json.loads(b)
        return Event(
            event_id=doc["event_id"],
            entity=doc["entity"],
            key=doc["key"],
            event_type=EventType(doc["event_type"]),
            payload=_decode(doc["payload"]),
            seq=doc["seq"],
        )


class CloudpickleSerde:
    """Pickle wire shape via cloudpickle: payloads may close over local
    functions/classes (reference cloudpickle_serializer.py)."""

    def to_bytes(self, event: Event) -> bytes:
        import cloudpickle

        return cloudpickle.dumps(event)

    def from_bytes(self, b: bytes) -> Event:
        import pickle

        return pickle.loads(b)  # cloudpickle output is plain-pickle readable


# -- protobuf envelope -------------------------------------------------------
#
# Schema (what a ``proto/event.proto`` would declare; the codec below emits
# the identical wire bytes):
#
#   message Event {                       // proto_serde.py's envelope shape
#     string event_id   = 1;
#     string entity     = 2;              // FunctionType name
#     string key        = 3;              // FunctionAddress key, stringified
#     string event_type = 4;              // EventType enum value
#     int64  seq        = 5;
#     bytes  payload    = 6;              // pickled payload (as reference)
#     int64  key_kind   = 7;              // 0=str, 1=int, 2=absent (None)
#   }
#
# Wire format is public protobuf encoding: each field is a varint tag
# ((field_number << 3) | wire_type) followed by a varint (int64) or a
# length-delimited byte run (string/bytes). key_kind restores the Python
# key type exactly (entity __key__ values may be int or str — the same
# heterogeneity the JSON serde's written-set encoding handles).


def _varint(n: int) -> bytes:
    if n < 0:
        # protobuf int64: negative values encode as 64-bit two's
        # complement (10-byte varint, same bytes protoc emits) — the
        # naive loop would never terminate on Python's arbitrary ints
        n &= 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def _ld(field: int, data: bytes) -> bytes:
    return _varint((field << 3) | 2) + _varint(len(data)) + data


class ProtoSerde:
    """Proto envelope + pickled payload (reference proto_serde.py): routing
    metadata stays language-neutral; only the payload needs Python."""

    def to_bytes(self, event: Event) -> bytes:
        import pickle

        key = event.key
        kind = 2 if key is None else (1 if isinstance(key, int) else 0)
        return (
            _ld(1, event.event_id.encode())
            + _ld(2, event.entity.encode())
            + _ld(3, ("" if key is None else str(key)).encode())
            + _ld(4, event.event_type.value.encode())
            + _varint((5 << 3) | 0)
            + _varint(event.seq)
            + _ld(6, pickle.dumps(event.payload))
            + _varint((7 << 3) | 0)
            + _varint(kind)
        )

    @staticmethod
    def _restore_key(raw: str, kind: int):
        if kind == 2:
            return None
        if kind == 1:
            return int(raw)
        return raw

    @staticmethod
    def _signed64(n: int) -> int:
        return n - (1 << 64) if n >= (1 << 63) else n

    def from_bytes(self, b: bytes) -> Event:
        import pickle

        fields: dict[int, Any] = {}
        i = 0
        while i < len(b):
            tag, i = _read_varint(b, i)
            fnum, wt = tag >> 3, tag & 7
            if wt == 0:
                fields[fnum], i = _read_varint(b, i)
            elif wt == 2:
                ln, i = _read_varint(b, i)
                fields[fnum] = b[i : i + ln]
                i += ln
            else:  # pragma: no cover - schema uses only wt 0/2
                raise ValueError(f"unsupported wire type {wt}")
        return Event(
            event_id=fields[1].decode(),
            entity=fields[2].decode(),
            key=self._restore_key(fields[3].decode(), fields.get(7, 0)),
            event_type=EventType(fields[4].decode()),
            payload=pickle.loads(fields[6]),
            seq=self._signed64(fields.get(5, 0)),
        )

    @staticmethod
    def routing_header(b: bytes) -> dict[str, Any]:
        """Decode ONLY the language-neutral routing fields — what a non-
        Python router (the reference's ingress router reading proto fields,
        dataflow.py:131-210) needs, without touching the pickled payload."""
        out: dict[str, Any] = {}
        names = {1: "event_id", 2: "entity", 3: "key", 4: "event_type", 5: "seq"}
        kind = 0
        i = 0
        while i < len(b):
            tag, i = _read_varint(b, i)
            fnum, wt = tag >> 3, tag & 7
            if wt == 0:
                v, i = _read_varint(b, i)
            else:
                ln, i = _read_varint(b, i)
                v = b[i : i + ln]
                i += ln
            if fnum == 7:
                kind = v
            elif fnum in names:
                out[names[fnum]] = v.decode() if isinstance(v, bytes) else v
        if "key" in out:
            out["key"] = ProtoSerde._restore_key(out["key"], kind)
        if "seq" in out:
            out["seq"] = ProtoSerde._signed64(out["seq"])
        return out
