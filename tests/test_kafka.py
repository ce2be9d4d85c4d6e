"""Kafka transport tests.

The container ships no spark-sql-kafka connector and no broker, so the
split is:

- encode/decode/route are pure column transforms → tested on batch
  DataFrames, ALWAYS run (they are the part that differs from the file
  transport; the stateful operator itself is shared and covered by
  test_streaming.py).
- plan construction + E2E run only when the connector (and for E2E a
  broker via $STATEFLOW_KAFKA_BROKERS) is present, and skip loudly
  otherwise — the same gate test_sources.py uses.
"""

from __future__ import annotations

import os

import pytest

from stateflow_spark.entity import operator
from stateflow_spark.streaming import kafka as K

# registers User/Item entity fixtures
from tests.test_entity_local import Item, User  # noqa: F401


def _event_rows(spark):
    evs = [
        operator.make_init_event("User", ("kafka-u1",)),
        operator.make_init_event("Item", ("kafka-i1", 5)),
    ]
    rows = [(e.entity, e.key, e.seq, e.to_bytes()) for e in evs]
    return evs, spark.createDataFrame(
        rows, "entity STRING, key STRING, seq LONG, blob BINARY"
    )


def test_encode_decode_roundtrip(spark):
    """Producer encode → consumer decode is lossless for the engine's
    (entity, key, seq, blob) row — the wire contract both sides share."""
    from stateflow_spark.entity.model import Event

    evs, df = _event_rows(spark)
    encoded = K.encode_events(df, "sf-request")
    assert encoded.columns == ["key", "value", "topic"]
    decoded = K.decode_events(encoded).orderBy("seq").collect()
    for ev, row in zip(evs, decoded):
        assert (row.entity, row.key, row.seq) == (ev.entity, ev.key, ev.seq)
        back = Event.from_bytes(bytes(row.blob))
        assert back.event_id == ev.event_id

    # decode handles real consumer rows where key arrives as BINARY
    from pyspark.sql import functions as F

    as_binary = encoded.select(
        F.col("key").cast("binary").alias("key"), "value"
    )
    decoded2 = K.decode_events(as_binary).orderBy("seq").collect()
    assert [(r.entity, r.key) for r in decoded2] == [
        (e.entity, e.key) for e in evs
    ]


def test_route_to_topics(spark):
    """kind → destination topic as a pure column expression (the Kafka
    analog of the file transport's _route_batch rename split)."""
    rows = [
        ("reply", "User", "u1", 1, b"r"),
        ("hop", "Item", "i1", 2, b"h"),
        ("evict", "User", "u2", 3, b"e"),
    ]
    from pyspark.sql import functions as F

    out = spark.createDataFrame(
        rows, "kind STRING, entity STRING, key STRING, seq LONG, blob BINARY"
    )
    routed = {
        r.key: r.topic
        for r in K.route_to_topics(out, "sf").select(
            F.get_json_object("key", "$.key").alias("key"), "topic"
        ).collect()
    }
    assert routed == {
        "u1": "sf-reply",
        "i1": "sf-internal",
        "u2": "sf-cold",
    }


def test_client_record_matches_engine_decode(spark):
    """The client-side producer record (client.kafka_record) and the
    engine-side ingress decode (decode_events) agree on the wire format —
    a client event round-trips through the engine's column transform."""
    from stateflow_spark.client import kafka_record
    from stateflow_spark.entity.model import Event

    evs, _ = _event_rows(spark)
    records = [kafka_record(e) for e in evs]
    df = spark.createDataFrame(
        [(k, v) for k, v in records], "key BINARY, value BINARY"
    )
    decoded = K.decode_events(df).orderBy("seq").collect()
    for ev, row in zip(evs, decoded):
        assert (row.entity, row.key, row.seq) == (ev.entity, ev.key, ev.seq)
        assert Event.from_bytes(bytes(row.blob)).event_id == ev.event_id


def test_kafka_transport_needs_client_lib():
    """Without kafka-python the transport fails loudly at construction,
    not silently at first use."""
    try:
        import kafka  # noqa: F401

        pytest.skip("kafka-python installed; gate not exercisable")
    except ImportError:
        pass
    from stateflow_spark.client import KafkaTransport

    with pytest.raises(RuntimeError, match="kafka-python"):
        KafkaTransport("localhost:9092", "sf")


def test_kafka_engine_plan_shape(spark, tmp_path):
    """With the connector on the classpath, the full plan builds: kafka
    source → stateful operator → topic-routed egress. Without it, skip —
    the column-transform tests above still pin the transport logic."""
    if not K.connector_available(spark):
        pytest.skip("spark-sql-kafka connector not on classpath")
    eng = K.KafkaEntityEngine(spark, "localhost:9092", "sf", str(tmp_path))
    plan = eng.build_plan()
    assert plan.isStreaming
    assert plan.columns == ["topic", "key", "value"]
    lp = plan._jdf.queryExecution().logical().toString()
    assert "kafka" in lp.lower()


def test_kafka_engine_e2e(spark, tmp_path):
    """create/invoke/reply over a real broker — runs only where a broker
    and the connector exist ($STATEFLOW_KAFKA_BROKERS)."""
    brokers = os.environ.get("STATEFLOW_KAFKA_BROKERS")
    if not brokers:
        pytest.skip("no broker: set STATEFLOW_KAFKA_BROKERS to run")
    if not K.connector_available(spark):
        pytest.skip("spark-sql-kafka connector not on classpath")
    try:
        from kafka import KafkaConsumer, KafkaProducer  # noqa: F401
    except ImportError:
        pytest.skip("kafka-python client not installed")

    import json

    from stateflow_spark.entity.model import Event

    eng = K.KafkaEntityEngine(spark, brokers, "sf-e2e", str(tmp_path))
    eng.start()
    try:
        producer = KafkaProducer(bootstrap_servers=brokers)
        consumer = KafkaConsumer(
            "sf-e2e-reply",
            bootstrap_servers=brokers,
            auto_offset_reset="earliest",
            consumer_timeout_ms=60_000,
        )
        init = operator.make_init_event("User", ("kafka-e2e-u1",))
        producer.send(
            "sf-e2e-request",
            key=json.dumps(
                {"entity": init.entity, "key": init.key, "seq": init.seq}
            ).encode(),
            value=init.to_bytes(),
        )
        producer.flush()
        for msg in consumer:
            reply = Event.from_bytes(msg.value)
            if reply.event_id == init.event_id:
                assert reply.payload["result"].key == "kafka-e2e-u1"
                break
        else:
            pytest.fail("no reply on sf-e2e-reply within timeout")
    finally:
        eng.stop()
