"""Spark streaming source over the stub broker (Python Data Source API).

Speaks the same row schema as the real spark-sql-kafka source — key
BINARY, value BINARY, topic STRING, partition INT, offset LONG — so
``decode_events`` and the whole KafkaEntityEngine plan run byte-for-byte
identically on top of it; only the format name differs ("stubkafka" vs
"kafka"). Offsets are the broker's file-log offsets, so restart/replay
semantics mirror Kafka's: a checkpointed query resumes from its committed
per-topic offsets and re-reads anything uncommitted (at-least-once, same
as the production connector's default).

Scale note: this is a test double for environments without the connector
jar — one log partition per topic, driver-side dir listing per trigger.
The production path is format("kafka") with the JVM connector; both are
constructed by the same engine code (kafka.py), which is the point: the
engine logic under test is the real one."""

from __future__ import annotations

import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

KAFKA_ROW_SCHEMA = StructType(
    [
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
    ]
)


class _Range(InputPartition):
    def __init__(self, root: str, topic: str, start: int, end: int):
        self.root = root
        self.topic = topic
        self.start = start
        self.end = end


class StubKafkaStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self._root = options["path"]
        self._topics = [t for t in options["topics"].split(",") if t]
        starting = options.get("startingoffsets", "earliest")
        self._start_latest = starting == "latest"

    def initialOffset(self) -> dict:
        from stateflow_spark.streaming import stub_broker as B

        return {
            t: (B.next_offset(self._root, t) if self._start_latest else 0)
            for t in self._topics
        }

    def latestOffset(self) -> dict:
        from stateflow_spark.streaming import stub_broker as B

        return {t: B.next_offset(self._root, t) for t in self._topics}

    def partitions(self, start: dict, end: dict) -> list[_Range]:
        return [
            _Range(self._root, t, start.get(t, 0), end.get(t, 0))
            for t in self._topics
            if end.get(t, 0) > start.get(t, 0)
        ]

    def read(self, partition: _Range):
        from stateflow_spark.streaming import stub_broker as B

        for off, key, value in B.read_range(
            partition.root, partition.topic, partition.start, partition.end
        ):
            yield (key, value, partition.topic, 0, off)

    def commit(self, end: dict) -> None:
        pass  # the log is the source of truth; checkpoint holds offsets


class StubKafkaDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "stubkafka"

    def schema(self):
        return KAFKA_ROW_SCHEMA

    def streamReader(self, schema) -> StubKafkaStreamReader:
        return StubKafkaStreamReader(self.options)


def register(spark) -> None:
    """Idempotent per-session registration of the stubkafka format."""
    spark.dataSource.register(StubKafkaDataSource)
