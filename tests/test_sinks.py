"""Incremental materialized-aggregate maintenance: a watermarked streaming
aggregate in UPDATE mode upserted into a parquet table per micro-batch
must converge to exactly the batch aggregate of the full input."""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

import pyspark.sql.functions as F

from stateflow_spark.catalog import load
from stateflow_spark.queries.common import dsum
from stateflow_spark.streaming.sinks import upsert_parquet_sink
from tests.conftest import SF_DIR


def _rows(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def test_upsert_sink_converges_to_batch_aggregate(spark, tmp_path):
    # serve events as 3 files -> 3 micro-batches touching overlapping hours
    src = str(tmp_path / "src")
    e = load(spark, SF_DIR, "events")
    e.repartition(3).write.mode("overwrite").parquet(src)

    agg_of = lambda df: (
        df.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n"),
            dsum("value", "total", 4),
        )
    )

    table = str(tmp_path / "rollup")
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).option("maxFilesPerTrigger", "1").parquet(src)
    ckpt = tempfile.mkdtemp(prefix="sink-ckpt-")
    # watermark wider than the dataset's event-time span: the files are an
    # arbitrary 3-way split, so a tight watermark would drop whichever
    # rows happen to trail a max-advancing batch — this test pins the
    # SINK's convergence, not late-drop policy (stream_append_late_drop
    # hash-gates that separately)
    sink = upsert_parquet_sink(table, ["hour", "event_type"])
    batches = []

    def merge(df, bid):
        batches.append(bid)
        sink(df, bid)

    q = (
        agg_of(stream.withWatermark("ts", "960 hours"))
        .writeStream.outputMode("update")
        .foreachBatch(merge)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .queryName(f"sink_{uuid.uuid4().hex[:8]}")
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)

    stored = spark.read.parquet(table)
    batch = agg_of(e)
    assert len(batches) >= 3  # the merge really ran incrementally
    assert _rows(stored) == _rows(batch)
    # and the swap left no stale side directories behind
    assert not os.path.isdir(table + ".old")


def test_upsert_sink_recovers_from_crashed_swap(spark, tmp_path):
    """A crash between the sink's two renames leaves a populated `.old`
    dir (and possibly no table). The next merge must clear it and
    proceed instead of failing with ENOTEMPTY forever (round-5 ADVICE)."""
    table = str(tmp_path / "t")
    df1 = spark.range(5).withColumnRenamed("id", "k").withColumn(
        "v", F.col("k") * 10
    )
    sink = upsert_parquet_sink(table, ["k"])
    sink(df1, 0)
    # simulate the crashed prior swap: table renamed aside, new data lost
    os.rename(table, table + ".old")
    assert not os.path.isdir(table)
    sink(df1.withColumn("v", F.col("v") + 1), 1)
    got = {(r.k, r.v) for r in spark.read.parquet(table).collect()}
    assert got == {(i, i * 10 + 1) for i in range(5)}
    assert not os.path.isdir(table + ".old")


def test_crashed_swap_preserves_disjoint_history(spark, tmp_path):
    """Round-6 ADVICE: when a crash leaves the table ONLY at `.old`, that
    copy is the sole merged history — the next merge must RESTORE it, not
    delete it. Keys present only in the pre-crash table must survive."""
    from stateflow_spark.streaming.sinks import recover_parquet_dir

    table = str(tmp_path / "t")
    old_keys = spark.range(0, 5).withColumnRenamed("id", "k").withColumn(
        "v", F.col("k") * 10
    )
    sink = upsert_parquet_sink(table, ["k"])
    sink(old_keys, 0)
    # crash between the two renames: history survives only at .old
    os.rename(table, table + ".old")
    # next batch touches a DISJOINT key range — without recovery the
    # merge sees no stored table and the old keys are gone forever
    new_keys = spark.range(100, 103).withColumnRenamed("id", "k").withColumn(
        "v", F.col("k") * 10
    )
    sink(new_keys, 1)
    got = {(r.k, r.v) for r in spark.read.parquet(table).collect()}
    assert got == {(i, i * 10) for i in list(range(5)) + [100, 101, 102]}
    assert not os.path.isdir(table + ".old")
    # recover is idempotent when the table is healthy
    recover_parquet_dir(table)
    assert os.path.isdir(table)


def test_scd2_merge_recovers_history_from_crashed_swap(spark, tmp_path):
    """The round-6 medium ADVICE scenario end-to-end: the SCD-2 dimension
    table is stranded at `.old` by a crash between the two renames; the
    next micro-batch touches a DIFFERENT customer — without recovery the
    merge would silently rebuild the dimension from that batch alone,
    permanently losing the first customer's version history."""
    import datetime

    from stateflow_spark.queries.streaming_late import _scd2_merge_fn

    table = str(tmp_path / "dim")
    merge = _scd2_merge_fn(table)

    def batch(rows):
        return spark.createDataFrame(
            rows,
            "o_custkey long, o_orderdate date, o_orderkey long, "
            "o_orderpriority string",
        )

    d = datetime.date
    merge(batch([(1, d(1995, 1, 1), 10, "1-URGENT"),
                 (1, d(1995, 6, 1), 11, "3-MEDIUM")]), 0)
    assert spark.read.parquet(table).filter("custkey = 1").count() == 2

    # crash between the two renames: history survives only at .old
    os.rename(table, table + ".old")

    merge(batch([(2, d(1996, 1, 1), 20, "2-HIGH")]), 1)
    got = spark.read.parquet(table)
    assert got.filter("custkey = 1").count() == 2  # history preserved
    assert got.filter("custkey = 2").count() == 1
    assert not os.path.isdir(table + ".old")
