"""Wire-format round trips (reference analog:
tests/serialization/proto_serializer_test.py and the json serde)."""

from __future__ import annotations

import json

import pytest

from stateflow_spark.entity import operator
from stateflow_spark.entity.interpreter import FlowState, PendingCall
from stateflow_spark.entity.model import EntityRef, Event, EventType
from stateflow_spark.serde import JsonSerde, PickleSerde

# registers fixtures
from tests.test_entity_local import Item, User  # noqa: F401


def _events():
    ref = EntityRef("User", "u1")
    flow = FlowState(
        flow_id="f1",
        entity="User",
        method="buy_item",
        self_ref=ref,
        ip=3,
        ns={"amount": 3, "item": EntityRef("Item", "i1"), "xs": [1, 2]},
        cache={("Item", "i1"): {"stock": 4, "price": 5}},
        pending=PendingCall(EntityRef("Item", "i1"), "update_stock", (-3,), "ok"),
    )
    return [
        operator.make_init_event("User", ("u1",)),
        operator.make_invoke_event(ref, "update_balance", (10,)),
        Event("e3", "User", "u1", EventType.GET_STATE, {"attr": "balance"}),
        Event("e4", "User", "u1", EventType.FLOW, {"flow": flow}),
        Event("e5", "User", "u1", EventType.OK, {"result": (True, b"\x00\xff")}),
    ]


@pytest.mark.parametrize("serde", [PickleSerde(), JsonSerde()])
def test_round_trip(serde):
    for ev in _events():
        back = serde.from_bytes(serde.to_bytes(ev))
        assert back.event_id == ev.event_id
        assert back.entity == ev.entity
        assert back.key == ev.key
        assert back.event_type == ev.event_type
        assert back.seq == ev.seq
        assert back.payload == ev.payload


def test_json_wire_shape():
    """Entity refs must appear as tagged InternalClassRef dicts — the
    reference's cross-runtime wire convention (event_flow.py:34-59)."""
    ev = operator.make_invoke_event(
        EntityRef("User", "u1"), "buy_item", (3, EntityRef("Item", "i1"))
    )
    doc = json.loads(JsonSerde().to_bytes(ev))
    args = doc["payload"]["args"]["items"]
    assert args[1] == {"_type": "InternalClassRef", "entity": "Item", "key": "i1"}


def test_json_written_set_mixed_key_types():
    """written-set encoding must not assume homogeneous entity key types:
    int and str __key__ values in one flow used to TypeError during the
    sort (round-2 ADVICE)."""
    flow = FlowState(
        flow_id="f2",
        entity="User",
        method="m",
        self_ref=EntityRef("User", "u1"),
        ip=0,
        ns={},
        written={("User", "u1"), ("Counter", 7), ("Counter", 2)},
    )
    ev = Event("e6", "User", "u1", EventType.FLOW, {"flow": flow})
    back = JsonSerde().from_bytes(JsonSerde().to_bytes(ev))
    got = back.payload["flow"].written
    assert ("Counter", 7) in got and ("User", "u1") in got
    assert len(got) == 3


def test_json_rejects_unserializable():
    ev = Event("e", "User", "u1", EventType.OK, {"result": object()})
    with pytest.raises(TypeError, match="PickleSerde"):
        JsonSerde().to_bytes(ev)
