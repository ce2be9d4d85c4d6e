"""Streaming event-time analytics: the Structured Streaming twins of the
batch queries in queries/events.py (SURVEY.md §2.C rows: watermarks,
event-time windows, streaming dedup).

Each builder takes a *streaming* DataFrame with an event-time column and
returns the transformed streaming DataFrame — the transformations are
identical to their batch forms, which is what the batch-vs-stream parity
test asserts (run the same input through both → equal results)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stateflow_spark.queries.common import dsum


def hourly_tumbling(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1h window with watermark-bounded state (late rows beyond the
    watermark are dropped; at 100 TB/day the watermark is what keeps window
    state finite)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "total_value", 4),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
            "min_value",
            "max_value",
        )
    )


def sliding_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "total_value", 4),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


def session_windows(events: DataFrame, gap: str = "30 minutes",
                    watermark: str = "1 hour") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("sw"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_last"),
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "total_value", 4),
        )
        .select(
            "user_id", "session_start", "session_last", "n_events", "total_value"
        )
    )


def stream_stream_join(
    left: DataFrame, right: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Stream–stream inner join: 'click' events joined to the same user's
    'view' events within the preceding hour.

    Both sides carry watermarks and the join condition bounds event time on
    both ends, so Spark can expire buffered rows — the state-size guarantee
    that makes this viable on an unbounded 100 TB/day stream. Without the
    time bound the join state would grow forever."""
    l = (
        left.withWatermark("ts", watermark)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("l_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
    )
    r = (
        right.withWatermark("ts", watermark)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("r_user"),
            F.col("ts").alias("view_ts"),
            F.col("event_id").alias("view_id"),
        )
    )
    return l.join(
        r,
        (F.col("l_user") == F.col("r_user"))
        & (F.col("view_ts") <= F.col("click_ts"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr("INTERVAL 1 HOUR")),
    ).select(
        F.col("l_user").alias("user_id"), "click_id", "view_id", "click_ts", "view_ts"
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming dedup on (user_id, event_type): state for a key is dropped
    once the watermark passes it — the unbounded-state-safe form of
    dropDuplicates."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )


def stream_stream_join_outer(
    left: DataFrame, right: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Stream–stream LEFT OUTER join: like stream_stream_join, but clicks
    with no qualifying view emit a null-padded row once the watermark
    proves no future view can match — the state-EVICTION semantics the
    inner join never exercises (an inner join could hold state forever
    and still be output-correct; outer null emission is observable proof
    rows leave the buffer).

    When null rows appear (derived, and pinned by the registered oracle):
    a left row is unmatchable once no future view can satisfy
    view_ts <= click_ts, i.e. once the global watermark passes click_ts
    (strictly). The global watermark is the MIN over both sides' event-
    time watermarks — and because Catalyst pushes each side's type filter
    BELOW the EventTimeWatermark node, each side tracks the max ts of its
    OWN event type: wm = min(max(click ts), max(view ts)) - delay. Spark
    emits the eviction batch after the final data batch (the "no-data
    batch"), so with availableNow the held-back tail is exactly the
    clicks in the last <delay> of the click stream (plus any after the
    last view - delay)."""
    l = (
        left.withWatermark("ts", watermark)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("l_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
    )
    r = (
        right.withWatermark("ts", watermark)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("r_user"),
            F.col("ts").alias("view_ts"),
            F.col("event_id").alias("view_id"),
        )
    )
    return l.join(
        r,
        (F.col("l_user") == F.col("r_user"))
        & (F.col("view_ts") <= F.col("click_ts"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr("INTERVAL 1 HOUR")),
        "leftOuter",
    ).select(
        F.col("l_user").alias("user_id"), "click_id", "view_id", "click_ts", "view_ts"
    )


def stream_static_enrich(stream: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static enrichment join: every micro-batch joins against a
    STATIC dimension table (no watermark needed on the static side — it
    is re-read per batch, and Spark plans it as a broadcast when small).
    The canonical 100 TB shape: the unbounded fact stream never shuffles
    for the join; the dimension ships once per executor. Here: events
    enriched with the customer row whose key shares the user id space,
    aggregated per (mktsegment, event_type)."""
    joined = stream.join(
        F.broadcast(dim),
        stream["user_id"] == dim["c_custkey"],
        "inner",
    )
    return joined.groupBy("c_mktsegment", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value", "total_value", 4),
    )
