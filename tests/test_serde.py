"""Wire-format round trips (reference analog:
tests/serialization/proto_serializer_test.py and the json serde)."""

from __future__ import annotations

import json

import pytest

from stateflow_spark.entity import operator
from stateflow_spark.entity.interpreter import FlowState, PendingCall
from stateflow_spark.entity.model import EntityRef, Event, EventType
from stateflow_spark.serde import (
    CloudpickleSerde,
    JsonSerde,
    PickleSerde,
    ProtoSerde,
)

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


@pytest.mark.parametrize(
    "serde", [PickleSerde(), JsonSerde(), ProtoSerde(), CloudpickleSerde()]
)
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


def test_proto_routing_header_without_unpickle():
    """The proto envelope's point (reference proto_serde.py): a router in
    any language reads event_id/address/type as plain proto fields and
    never touches the pickled payload."""
    ev = operator.make_invoke_event(
        EntityRef("User", "u1"), "update_balance", (10,)
    )
    wire = ProtoSerde().to_bytes(ev)
    hdr = ProtoSerde.routing_header(wire)
    assert hdr == {
        "event_id": ev.event_id,
        "entity": "User",
        "key": "u1",
        "event_type": ev.event_type.value,
        "seq": ev.seq,
    }
    # payload stays pickled inside the envelope — header decode is pure
    # varint/length-delimited walking, no pickle involved
    assert b"update_balance" in wire


def test_proto_int_key_and_negative_seq_round_trip():
    """Entity __key__ values may be int (the heterogeneity the JSON
    written-set fix handles); the proto envelope must restore the exact
    key type, and a negative seq must encode as protobuf's 10-byte
    two's-complement int64 varint instead of hanging (round-3 review
    findings)."""
    for key in (7, "7", None, ""):
        ev = Event("e-k", "Counter", key, EventType.GET_STATE, {"attr": "v"})
        back = ProtoSerde().from_bytes(ProtoSerde().to_bytes(ev))
        assert back.key == key and type(back.key) is type(key)
        hdr = ProtoSerde.routing_header(ProtoSerde().to_bytes(ev))
        assert hdr["key"] == key
    ev = Event("e-s", "User", "u1", EventType.OK, {"result": 1}, seq=-5)
    wire = ProtoSerde().to_bytes(ev)
    back = ProtoSerde().from_bytes(wire)
    assert back.seq == -5
    assert ProtoSerde.routing_header(wire)["seq"] == -5


def test_proto_wire_is_protobuf_compatible():
    """Byte-level check of the hand-rolled codec against the documented
    schema: field 1 (event_id) is tag 0x0A (field 1, wire type 2) etc."""
    ev = Event("id1", "User", "u1", EventType.GET_STATE, {"attr": "x"}, seq=300)
    wire = ProtoSerde().to_bytes(ev)
    assert wire[0] == 0x0A  # (1 << 3) | 2
    assert wire[1] == 3 and wire[2:5] == b"id1"
    assert wire[5] == 0x12  # (2 << 3) | 2
    # seq=300 varint: 0xAC 0x02 after tag 0x28 ((5<<3)|0)
    i = wire.index(bytes([0x28]))
    assert wire[i + 1 : i + 3] == bytes([0xAC, 0x02])


@pytest.mark.slow
@pytest.mark.parametrize("serde", [ProtoSerde(), JsonSerde()])
def test_superstep_engine_over_serde(spark, serde):
    """Engine run over the pluggable wire format (round-2 VERDICT #4):
    the buy_item flow crosses keys through serde-encoded hops and lands
    on the reference golden values (balance 5 / stock 1)."""
    from stateflow_spark.streaming.superstep import SuperstepRuntime

    rt = SuperstepRuntime(spark, serde=serde)
    init_u = operator.make_init_event("User", (f"sd-u-{type(serde).__name__}",))
    init_i = operator.make_init_event(
        "Item", (f"sd-i-{type(serde).__name__}", 5)
    )
    res = rt.run([init_u, init_i])
    uref = res.result_of(init_u)
    iref = res.result_of(init_i)

    setup = [
        operator.make_invoke_event(uref, "update_balance", (20,)),
        operator.make_invoke_event(iref, "update_stock", (4,)),
    ]
    buy = operator.make_invoke_event(uref, "buy_item", (3, iref))
    res = rt.run(setup + [buy], state_df=res.state_df)
    assert res.result_of(buy) is True
    state = res.collect_state()
    assert state[("User", uref.key)]["balance"] == 5
    assert state[("Item", iref.key)]["stock"] == 1
