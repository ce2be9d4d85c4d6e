"""Event wire formats (reference parity: stateflow/serialization/ —
json_serde.py:8-48, pickle_serializer.py, proto_serde.py).

Two interchangeable serdes:

- PickleSerde — the default engine wire form: arbitrary Python payloads
  (the reference's pickle serializer makes the same trade).
- JsonSerde — language-neutral form for cross-system topics. Entity
  references are tagged ``{"_type": "InternalClassRef", ...}`` exactly
  like the reference's wire convention (event_flow.py:34-59); in-flight
  flow state, tuples, and bytes get analogous tags. Values must be
  JSON-representable (the reference's json serde has the same
  restriction — its payloads are dicts of primitives).

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
