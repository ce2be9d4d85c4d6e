"""Source surface: csv/json round-trips agree with the parquet catalog, the
streaming file source replays a table exactly, and the Kafka builders
construct valid plans (no broker in the container — plan-shape only)."""

from __future__ import annotations

import pytest

from stateflow_spark import sources
from stateflow_spark.catalog import load
from tests.conftest import SF_DIR


def _rows(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


@pytest.mark.parametrize("fmt", ["csv", "json"])
def test_file_roundtrip_matches_parquet(spark, tmp_path, fmt):
    base = load(spark, SF_DIR, "orders")
    path = str(tmp_path / f"orders_{fmt}")
    sources.write_file(base, path, fmt=fmt)
    back = sources.read_file(spark, path, fmt=fmt, schema=base.schema)
    assert back.schema == base.schema
    assert _rows(back) == _rows(base)


def test_csv_without_schema_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="explicit schema"):
        sources.read_file(spark, str(tmp_path), fmt="csv")


def test_stream_files_replays_table(spark, tmp_path):
    base = load(spark, SF_DIR, "nation")
    path = str(tmp_path / "stream_src")
    base.repartition(3).write.parquet(path)
    stream = sources.stream_files(
        spark, path, base.schema, max_files_per_trigger=1
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_src_replay")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert _rows(spark.sql("SELECT * FROM t_src_replay")) == _rows(base)


def test_rate_source_is_streaming(spark):
    df = sources.rate_source(spark, rows_per_second=10)
    assert df.isStreaming
    assert {f.name for f in df.schema.fields} == {"timestamp", "value"}


def test_kafka_builders_construct(spark):
    """No broker available: builders must still produce streaming plans
    (connector presence + option plumbing), failing only at start()."""
    try:
        df = sources.kafka_source(spark, "localhost:9092", "client_request")
    except Exception as ex:  # connector jar absent in some deployments
        pytest.skip(f"kafka connector unavailable: {ex}")
    assert df.isStreaming
    assert "value" in df.columns
