"""Event-stream analytics over the `events` table — the batch-checkable
faces of the streaming surface (SURVEY.md §2.C: event-time windows,
sessionization, dedup, JSON payload parsing — payload handling mirrors the
reference's free-form event payload dicts, stateflow/dataflow/event.py:65-98).

The same transformations run as Structured Streaming queries via
``stateflow_spark.streaming``; here they execute in batch so the DuckDB
oracle can verify the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stateflow_spark.catalog import load
from stateflow_spark.queries.common import dsum, register


@register(
    "events_hourly_tumbling",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS total_value,
           MIN(value) AS min_value, MAX(value) AS max_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
    tags=("events", "window-tumbling", "bench"),
)
def events_hourly_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window aggregate (epoch-aligned, so it
    equals date_trunc('hour')). Streaming twin: groupBy(window(ts)) with a
    watermark — see streaming/windows.py."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
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


@register(
    "events_sliding_window",
    oracle="""
    WITH floored AS (
        SELECT *,
               date_trunc('hour', ts)
                 + CASE WHEN minute(ts) >= 30 THEN INTERVAL 30 MINUTE
                        ELSE INTERVAL 0 MINUTE END AS w1
        FROM events
    ), exploded AS (
        SELECT w1 AS window_start, value FROM floored
        UNION ALL
        SELECT w1 - INTERVAL 30 MINUTE AS window_start, value FROM floored
    )
    SELECT window_start, COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS total_value
    FROM exploded
    GROUP BY window_start
    """,
    tags=("events", "window-sliding"),
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 1-hour width, 30-minute slide (each event lands in
    exactly two windows)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "total_value", 4),
        )
        .select(
            F.col("w.start").alias("window_start"), "n_events", "total_value"
        )
    )


@register(
    "events_session_windows",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, value,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), isl AS (
        SELECT user_id, ts, value,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM seq
    )
    SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_last,
           COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS total_value
    FROM isl
    GROUP BY user_id, sid
    """,
    tags=("events", "session-window"),
)
def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute gap via session_window() — the
    native form of the reference's per-key activity grouping. Oracle is the
    equivalent gaps-and-islands SQL."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_last"),
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "total_value", 4),
        )
        .select("user_id", "session_start", "session_last", "n_events", "total_value")
    )


@register(
    "events_dedup_first",
    oracle="""
    SELECT user_id, event_type, event_id, ts, value
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts, event_id) AS rn
        FROM events
    )
    WHERE rn = 1
    """,
    tags=("events", "dedup"),
)
def events_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the earliest event per (user, type) — deterministic dedup (the
    order-by makes it reproducible, unlike bare dropDuplicates). Streaming
    twin: dropDuplicatesWithinWatermark."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts", "value")
    )


@register(
    "events_json_payload",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS n,
           CAST(CAST(SUM(CAST(value AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1
    """,
    tags=("events", "json"),
)
def events_json_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the free-form JSON payload column (reference events carry a
    payload dict, stateflow/dataflow/event.py:81-98) and aggregate on it."""
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.withColumn("k_bucket", k % 10)
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("value", "total_value", 4),
        )
    )


@register(
    "events_topk_users",
    oracle="""
    SELECT user_id,
           CAST(CAST(SUM(CAST(value AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS total_value,
           COUNT(*) AS n_events
    FROM events
    GROUP BY user_id
    ORDER BY total_value DESC, user_id
    LIMIT 10
    """,
    tags=("events", "topk"),
)
def events_topk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 users by exact total value."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .agg(dsum("value", "total_value", 4), F.count(F.lit(1)).alias("n_events"))
        .orderBy(F.col("total_value").desc(), F.col("user_id"))
        .limit(10)
    )


@register(
    "events_type_pivot",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (event_type = 'click')    AS click,
           COUNT(*) FILTER (event_type = 'view')     AS view,
           COUNT(*) FILTER (event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (event_type = 'signup')   AS signup,
           COUNT(*) FILTER (event_type = 'error')    AS error
    FROM events
    GROUP BY user_id
    """,
    tags=("events", "pivot"),
)
def events_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event types to columns (explicit value list keeps the schema
    static — required for streaming parity and for plan stability at scale)."""
    e = load(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    p = e.groupBy("user_id").pivot("event_type", types).count()
    return p.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in types],
    )


@register(
    "events_funnel",
    oracle="""
    WITH v AS (SELECT user_id, MIN(ts) AS t_view
               FROM events WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS t_click
          FROM events e JOIN v ON v.user_id = e.user_id
          WHERE e.event_type = 'click' AND e.ts > t_view
            AND e.ts <= t_view + INTERVAL 12 HOUR
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
          FROM events e JOIN c ON c.user_id = e.user_id
          WHERE e.event_type = 'purchase' AND e.ts > t_click
            AND e.ts <= t_click + INTERVAL 12 HOUR
          GROUP BY e.user_id)
    SELECT
      (SELECT COUNT(*) FROM v) AS n_view,
      (SELECT COUNT(*) FROM c) AS n_view_click,
      (SELECT COUNT(*) FROM p) AS n_view_click_purchase
    """,
    tags=("events", "funnel", "sequence"),
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered, time-bounded 3-step funnel: first view → click within 12h →
    purchase within 12h of that click. Each stage is one aggregation + one re-join
    on user_id — the standard scalable funnel shape (state per user is a
    single timestamp per stage, never the event history). Counts are
    integers: engine-exact."""
    e = load(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("t_view"))
            & (F.col("ts") <= F.col("t_view") + F.expr("INTERVAL 12 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") > F.col("t_click"))
            & (F.col("ts") <= F.col("t_click") + F.expr("INTERVAL 12 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_view_click")))
        .crossJoin(
            p.agg(F.count(F.lit(1)).alias("n_view_click_purchase"))
        )
    )


@register(
    "scalar_function_zoo",
    oracle="""
    SELECT o_orderkey,
           upper(o_orderpriority) AS prio_upper,
           substr(o_orderstatus, 1, 1) AS status_c,
           concat(o_orderstatus, '-', o_orderpriority) AS status_prio,
           len(o_orderpriority) AS prio_len,
           levenshtein(o_orderstatus, o_orderpriority) AS edit_dist,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
           dayofweek(o_orderdate) + 1 AS order_dow,
           datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch,
           abs(o_totalprice - 1000.0) AS abs_delta,
           CAST(floor(o_totalprice / 100.0) AS BIGINT) AS price_bucket,
           sqrt(o_totalprice) AS price_sqrt,
           o_orderkey % 7 AS key_mod
    FROM orders
    """,
    tags=("scalar", "functions"),
)
def scalar_function_zoo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar expression-language sweep: string (upper/substr/concat/length/
    levenshtein), date (date_trunc/dayofweek/datediff), math (abs/floor/
    sqrt/mod) — all chosen to be bit-exact across engines (sqrt is IEEE
    correctly-rounded; log/exp/pow are excluded because libm
    implementations may differ in the last ulp). Everything runs inside
    whole-stage codegen."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("prio_upper"),
        F.substring("o_orderstatus", 1, 1).alias("status_c"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.length("o_orderpriority").alias("prio_len"),
        F.levenshtein("o_orderstatus", "o_orderpriority").alias("edit_dist"),
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.dayofweek("o_orderdate").alias("order_dow"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")
        ).alias("days_since_epoch"),
        F.abs(F.col("o_totalprice") - F.lit(1000.0)).alias("abs_delta"),
        F.floor(F.col("o_totalprice") / F.lit(100.0)).alias("price_bucket"),
        F.sqrt("o_totalprice").alias("price_sqrt"),
        (F.col("o_orderkey") % 7).alias("key_mod"),
    )


_WEEK_US = 7 * 86400 * 1_000_000


@register(
    "events_retention_cohorts",
    oracle=f"""
    WITH first AS (
        SELECT user_id, MIN(ts) AS t0 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    act AS (
        SELECT DISTINCT e.user_id,
               CAST(date_trunc('week', f.t0) AS TIMESTAMP) AS cohort_week,
               (epoch_us(e.ts)
                - epoch_us(CAST(date_trunc('week', f.t0) AS TIMESTAMP)))
                 // {_WEEK_US} AS week_n
        FROM events e JOIN first f USING (user_id)
        WHERE e.ts >= f.t0
    )
    SELECT cohort_week, CAST(week_n AS BIGINT) AS week_n,
           COUNT(*) AS n_active_users
    FROM act GROUP BY cohort_week, week_n
    """,
    tags=("events", "cohorts", "retention"),
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by signup week, counted as
    active in each subsequent week they produced any event — the
    (cohort_week, week_n, n_active_users) triangle behind every retention
    curve.

    Shapes: the first-signup table is one aggregate over the signup
    subset (small — one row per user), joined back on user_id (AQE
    broadcasts it at test scale; at 100 TB it's a co-partitioned shuffle
    join on the same key the DISTINCT then reuses). Week arithmetic is
    integer `div` on epoch microseconds against the week-truncated cohort
    start, so both engines bin identically — no double rounding."""
    e = load(spark, sf_dir, "events")
    first = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    act = (
        e.join(first, "user_id")
        .filter(F.col("ts") >= F.col("t0"))
        .select(
            "user_id",
            F.date_trunc("week", "t0").alias("cohort_week"),
            F.expr(
                f"(unix_micros(ts) - unix_micros(date_trunc('week', t0)))"
                f" div {_WEEK_US}"
            ).alias("week_n"),
        )
        .distinct()
    )
    return act.groupBy("cohort_week", "week_n").agg(
        F.count(F.lit(1)).alias("n_active_users")
    )


@register(
    "events_resample_ffill",
    oracle="""
    WITH obs AS (
        SELECT user_id, date_trunc('hour', ts) AS hour,
               COUNT(*) AS n_obs,
               CAST(CAST(SUM(CAST(value AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) AS hour_avg
        FROM events WHERE user_id < 20
        GROUP BY 1, 2
    ),
    spans AS (
        SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1 FROM obs
        GROUP BY user_id
    ),
    grid AS (
        SELECT user_id, unnest(generate_series(h0, h1,
               INTERVAL 1 HOUR)) AS hour
        FROM spans
    )
    SELECT g.user_id, g.hour,
           CAST(COALESCE(o.n_obs, 0) AS BIGINT) AS n_obs,
           LAST_VALUE(o.hour_avg IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_avg
    FROM grid g LEFT JOIN obs o USING (user_id, hour)
    """,
    tags=("events", "timeseries", "resample"),
)
def events_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + gap fill: per user (bounded to ids < 20 for
    a stable result size), an hourly grid from first to last observation,
    each grid point carrying the decimal-exact average of that hour's
    events, forward-filled across empty hours — the regularization step
    before any downstream rolling-window feature.

    Scale shape: the observed-hours aggregate is a normal partial/final
    groupBy; the grid explode fans out to span/granularity rows per key
    (bounded by TIME, not event volume — a year is 8,760 rows/key); the
    forward fill is one window partitioned BY user (parallel across
    keys, ordered within — never a global sort). Hourly averages rather
    than last-event values make the fill deterministic without an
    event-level tie-break."""
    e = load(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    obs = e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n_obs"),
        (
            F.sum(F.col("value").cast("decimal(38,4)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("hour_avg"),
    )
    grid = (
        obs.groupBy("user_id")
        .agg(F.min("hour").alias("h0"), F.max("hour").alias("h1"))
        .select(
            "user_id",
            F.explode(
                F.expr("sequence(h0, h1, interval 1 hour)")
            ).alias("hour"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(obs, ["user_id", "hour"], "left")
        .select(
            "user_id",
            "hour",
            F.coalesce("n_obs", F.lit(0)).alias("n_obs"),
            F.last("hour_avg", ignorenulls=True).over(w).alias("filled_avg"),
        )
    )


@register(
    "events_rolling_features",
    oracle="""
    WITH obs AS (
        SELECT user_id, date_trunc('hour', ts) AS hour,
               COUNT(*) AS n_obs,
               CAST(CAST(SUM(CAST(value AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) AS hour_avg
        FROM events WHERE user_id < 20
        GROUP BY 1, 2
    ),
    spans AS (
        SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1 FROM obs
        GROUP BY user_id
    ),
    grid AS (
        SELECT user_id, unnest(generate_series(h0, h1,
               INTERVAL 1 HOUR)) AS hour
        FROM spans
    ),
    filled AS (
        SELECT g.user_id, g.hour,
               COALESCE(o.n_obs, 0) AS n_obs,
               LAST_VALUE(o.hour_avg IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.hour
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS filled_avg
        FROM grid g LEFT JOIN obs o USING (user_id, hour)
    )
    SELECT user_id, hour,
           CAST(SUM(n_obs) OVER w AS BIGINT) AS events_24h,
           MAX(filled_avg) OVER w AS max_avg_24h
    FROM filled
    WINDOW w AS (PARTITION BY user_id ORDER BY hour
                 ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
    """,
    tags=("events", "timeseries", "rolling"),
)
def events_rolling_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """24-hour rolling features over the resampled series: trailing event
    count and max hourly average per user-hour.

    The resample step (events_resample_ffill) is what makes this cheap
    AND exact: on the DENSE hourly grid a ROWS BETWEEN 23 PRECEDING
    frame IS a 24-hour time frame — no RANGE frame (which Spark's window
    exec evaluates without the sliding optimization) and no interval
    arithmetic per row. Feature choice is deliberate: rolling COUNT
    (integer) and rolling MAX (order-independent) are exact under any
    frame evaluation strategy, unlike a rolling double SUM whose
    accumulation order differs between engines."""
    filled = events_resample_ffill(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(-23, 0)
    )
    return filled.select(
        "user_id",
        "hour",
        F.sum("n_obs").over(w).cast("bigint").alias("events_24h"),
        F.max("filled_avg").over(w).alias("max_avg_24h"),
    )


@register(
    "events_anomaly_hours",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS n_obs
        FROM events
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT event_type, hour, n_obs,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY n_obs DESC, hour) AS rnk,
               COUNT(*) OVER (PARTITION BY event_type) AS n_hours
        FROM hourly
    )
    SELECT event_type, hour, CAST(n_obs AS BIGINT) AS n_obs,
           CAST(n_hours AS BIGINT) AS n_hours
    FROM ranked
    WHERE rnk <= CAST(ceil(0.01 * n_hours) AS BIGINT)
    """,
    tags=("events", "timeseries", "anomaly"),
)
def events_anomaly_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomalous-volume hours: per event type, the top-1% busiest hours —
    burst detection via exact order statistics.

    The deliberate design point: no z-scores. A mean/stddev threshold
    needs double aggregation whose value depends on summation order (and
    is fragile to heavy tails anyway); rank-based flagging is exactly
    reproducible on any engine and any partitioning — ROW_NUMBER with a
    (count, hour) tie-break pins even the boundary rows. One groupBy +
    one per-type window, both on the same key; at 100 TB the window
    partitions by the series key exactly like every per-entity
    analytic here."""
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count(F.lit(1)).alias("n_obs"))
    wrank = Window.partitionBy("event_type").orderBy(
        F.col("n_obs").desc(), F.col("hour")
    )
    wall = Window.partitionBy("event_type")
    return (
        hourly.withColumn("rnk", F.row_number().over(wrank))
        .withColumn("n_hours", F.count(F.lit(1)).over(wall))
        .filter(F.col("rnk") <= F.ceil(0.01 * F.col("n_hours")))
        .select(
            "event_type",
            "hour",
            F.col("n_obs").cast("bigint").alias("n_obs"),
            F.col("n_hours").cast("bigint").alias("n_hours"),
        )
    )


# --------------------------------------------------------------------------
# EWMA smoothing — finite-horizon exponential decay over each user's tail
# --------------------------------------------------------------------------

# decay 0.8, horizon 10: weights generated by REPEATED IEEE MULTIPLICATION
# (w[i] = w[i-1] * 0.8), serialized via repr() so both engines parse the
# bit-identical double — pow() is libm and not bit-pinned across engines
_EWMA_N = 10
_EWMA_WEIGHTS: list[float] = [1.0]
for _ in range(_EWMA_N - 1):
    _EWMA_WEIGHTS.append(_EWMA_WEIGHTS[-1] * 0.8)
_EWMA_W_SQL = "[" + ", ".join(
    f"CAST('{w!r}' AS DOUBLE)" for w in _EWMA_WEIGHTS
) + "]"


@register(
    "events_ewma_value",
    oracle=f"""
    WITH lagged AS (
        SELECT event_id, user_id, ts, value,
               list(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN {_EWMA_N - 1} PRECEDING AND CURRENT ROW
               ) AS lst
        FROM events
    )
    SELECT event_id, user_id, ts, value,
           CAST(len(lst) AS BIGINT) AS n_window,
           CAST(list_sum(list_transform(range(1, len(lst) + 1),
                    i -> CAST(lst[i] * ({_EWMA_W_SQL})[len(lst) - i + 1]
                              AS DECIMAL(38,12)))) AS DOUBLE)
             / CAST(list_sum(list_transform(range(1, len(lst) + 1),
                    i -> CAST(({_EWMA_W_SQL})[i] AS DECIMAL(38,12))))
                    AS DOUBLE) AS ewma
    FROM lagged
    """,
    tags=("events", "timeseries", "ewma"),
)
def events_ewma_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Finite-horizon EWMA of each user's event values: per event, the
    exponentially weighted average of the trailing {_EWMA_N} observations
    (decay 0.8, weights renormalized over the actual window length so
    early events are exact, not zero-padded) — the smoothing feature a
    telemetry/feature-store pipeline derives next to the rolling
    count/max of events_rolling_features, which deliberately avoided
    order-dependent float sums; THIS row shows how to do the weighted
    float version exactly: per-element products round once to
    DECIMAL(38,12), the sum is decimal (order-free), and the weights are
    bit-pinned literals generated by repeated IEEE multiplication, so
    both engines divide bit-identical operands.

    Scale shape: one window per user (uniform keys, frame bounded at
    {_EWMA_N} rows — ROWS not RANGE, keeping Spark's sliding-frame
    optimization), a per-row fold of ≤{_EWMA_N} products, no joins, no
    second shuffle."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_EWMA_N - 1), 0)
    )
    wl = F.array(*[F.lit(x) for x in _EWMA_WEIGHTS])
    lst = F.collect_list("value").over(w)
    num = F.expr(
        "aggregate(transform(lst, (x, i) -> "
        "CAST(x * element_at(wl, size(lst) - i) AS DECIMAL(38,12))), "
        "CAST(0 AS DECIMAL(26,12)), (a, x) -> CAST(a + x AS DECIMAL(26,12)))"
    ).cast("double")
    den = F.expr(
        "aggregate(transform(slice(wl, 1, size(lst)), "
        "x -> CAST(x AS DECIMAL(38,12))), "
        "CAST(0 AS DECIMAL(26,12)), (a, x) -> CAST(a + x AS DECIMAL(26,12)))"
    ).cast("double")
    return (
        e.select("event_id", "user_id", "ts", "value", lst.alias("lst"))
        .withColumn("wl", wl)
        .select(
            "event_id",
            "user_id",
            "ts",
            "value",
            F.size("lst").cast("bigint").alias("n_window"),
            (num / den).alias("ewma"),
        )
    )


@register(
    "events_state_runs",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type, ts, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id)
             - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS grp
        FROM events
    )
    SELECT user_id, event_type,
           MIN(ts) AS run_start, MAX(ts) AS run_end,
           COUNT(*) AS run_len,
           MIN(event_id) AS first_event_id
    FROM seq
    GROUP BY user_id, event_type, grp
    HAVING COUNT(*) >= 2
    """,
    tags=("events", "window", "islands", "bench"),
)
def events_state_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands run-length encoding: collapse each user's
    consecutive same-type event runs into [run_start, run_end] intervals
    (the SCD-2 interval-construction shape: a state change closes the
    previous validity interval and opens the next). The group key is the
    classic two-row_number difference — both windows share the single
    shuffle on user_id (the second adds event_type to the PARTITION BY,
    a sub-partition of the first, so Catalyst reuses the sort), and the
    run collapse is an ordinary partial/final hash aggregate. At 100 TB
    this is one shuffle on the user key and per-user sorts; no
    self-join, no explode. Ordering ties break on event_id so the run
    boundaries are deterministic. Reference analogue: stateful
    per-key sequence tracking (stateflow/dataflow/stateful_operator.py)
    — here expressed as a set-oriented window plan instead of per-event
    state."""
    e = load(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_typ = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    grp = (F.row_number().over(w_all) - F.row_number().over(w_typ)).alias("grp")
    return (
        e.select("user_id", "event_type", "ts", "event_id", grp)
        .groupBy("user_id", "event_type", "grp")
        .agg(
            F.min("ts").alias("run_start"),
            F.max("ts").alias("run_end"),
            F.count(F.lit(1)).alias("run_len"),
            F.min("event_id").alias("first_event_id"),
        )
        .filter(F.col("run_len") >= 2)
        .drop("grp")
    )


@register(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type AS from_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS to_type
        FROM events
    ),
    trans AS (
        SELECT from_type, to_type, COUNT(*) AS n_transitions
        FROM seq WHERE to_type IS NOT NULL
        GROUP BY from_type, to_type
    )
    SELECT from_type, to_type,
           CAST(n_transitions AS BIGINT) AS n_transitions,
           CAST(n_transitions AS DOUBLE)
             / CAST(SUM(n_transitions) OVER (PARTITION BY from_type)
                    AS DOUBLE) AS prob
    FROM trans
    ORDER BY from_type, to_type
    """,
    tags=("events", "markov", "window", "bench"),
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    P(next_type | type) estimated from consecutive event pairs. The classic
    user-behavior model (next-action prediction, anomalous-flow detection)
    and a training-data statistic (action-sequence priors for agent traces).

    Plan: ONE shuffle on user_id for the LEAD window, then a partial/final
    hash aggregate onto the (from, to) grid — the transition matrix is
    ntypes² rows, so the normalizing window (SUM over from_type) runs on a
    broadcast-sized table. At 100 TB the user-key shuffle is the
    sessionization shape (same key as events_session_windows, reusable
    exchange); the matrix itself never grows with data volume. Ties in
    event ordering break on event_id, so consecutive pairs — hence the
    counts — are deterministic. Probabilities are one double division of
    bit-identical integer counts: engine-exact. Reference analogue: per-key
    ordered event replay (stateflow/dataflow/stateful_operator.py) — here a
    set-oriented window plan, no per-event state loop."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    trans = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    w_from = Window.partitionBy("from_type")
    return trans.select(
        "from_type",
        "to_type",
        "n_transitions",
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(w_from).cast("double")
        ).alias("prob"),
    ).orderBy("from_type", "to_type")


_ATTR_WINDOW_US = 7 * 86400 * 10**6  # 7-day lookback, microseconds


@register(
    "events_attribution",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_id, event_type, value, ts, epoch_us(ts) AS us,
               CASE WHEN event_type IN ('click', 'view')
                    THEN lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                         || lpad(CAST(event_id AS VARCHAR), 20, '0')
                         || event_type END AS enc
        FROM events
    ),
    w AS (
        SELECT user_id, event_id, event_type, value, ts,
               MIN(enc) OVER win AS fe,
               MAX(enc) OVER win AS le
        FROM e
        WINDOW win AS (PARTITION BY user_id ORDER BY us
                       RANGE BETWEEN {_ATTR_WINDOW_US} PRECEDING
                             AND 1 PRECEDING)
    )
    SELECT user_id, event_id AS conv_event_id, ts AS conv_ts, value,
           CAST(CAST(substr(fe, 21, 20) AS BIGINT) AS BIGINT)
               AS first_touch_event_id,
           substr(fe, 41) AS first_touch_type,
           CAST(CAST(substr(le, 21, 20) AS BIGINT) AS BIGINT)
               AS last_touch_event_id,
           substr(le, 41) AS last_touch_type
    FROM w WHERE event_type = 'purchase'
    """,
    tags=("events", "attribution"),
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch / last-touch conversion attribution: for every
    purchase, the earliest and latest click/view by the same user inside
    a 7-day lookback — the marketing-analytics operator behind campaign
    ROI tables, and the time-bounded cousin of the as-of join
    (join_asof_click_view carries only last-touch, unbounded).

    Plan shape: ONE window per user over the event stream, with a
    microsecond RANGE frame [-7d, -1µs); first- and last-touch are MIN
    and MAX over the same frame of a single order-encoding string
    (zero-padded epoch ‖ zero-padded event_id ‖ type — lexicographic ==
    (time, id) numeric order, so ties at the same microsecond resolve by
    event_id deterministically; CAVEAT: zero-padding assumes nonnegative
    epoch micros — pre-1970 timestamps would encode with a '-' and break
    the lexicographic ordering on BOTH engines identically, i.e. wrong
    silently; an event feed with pre-epoch times needs a +2^62 offset in
    the pad). One shuffle on user_id, no self-join,
    no per-conversion probe — the naive form joins conversions against
    touches per pair and quadratics on hot users. Conversions with no
    in-window touch emit NULL attribution (the organic-traffic row).

    At 100 TB: the frame is time-bounded, so window state per user is
    bounded by a week of that user's events regardless of history
    length; the streaming twin would be the same expression over a
    watermarked stream."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "value", "ts"
    )
    us = F.unix_micros("ts")
    enc = F.when(
        F.col("event_type").isin("click", "view"),
        F.concat(
            F.lpad(us.cast("string"), 20, "0"),
            F.lpad(F.col("event_id").cast("string"), 20, "0"),
            F.col("event_type"),
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-_ATTR_WINDOW_US, -1)
    )
    attributed = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        "ts",
        F.min(enc).over(w).alias("fe"),
        F.max(enc).over(w).alias("le"),
    )
    return attributed.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("conv_event_id"),
        F.col("ts").alias("conv_ts"),
        "value",
        F.substring("fe", 21, 20).cast("bigint").alias("first_touch_event_id"),
        # 2-arg substring (unbounded suffix) mirrors the oracle's
        # substr(fe, 41) — a length cap would silently truncate any
        # future touch type longer than it
        F.expr("substring(fe, 41)").alias("first_touch_type"),
        F.substring("le", 21, 20).cast("bigint").alias("last_touch_event_id"),
        F.expr("substring(le, 41)").alias("last_touch_type"),
    )


@register(
    "events_gap_detection",
    oracle="""
    WITH obs AS (
        SELECT DISTINCT user_id, date_trunc('hour', ts) AS hour
        FROM events WHERE user_id < 20
    ),
    spans AS (
        SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1 FROM obs GROUP BY 1
    ),
    grid AS (
        SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR))
            AS hour
        FROM spans
    ),
    missing AS (
        SELECT g.user_id, g.hour,
               CAST(epoch(g.hour) AS BIGINT) / 3600
                   - ROW_NUMBER() OVER (PARTITION BY g.user_id
                                        ORDER BY g.hour) AS grp
        FROM grid g LEFT JOIN obs o USING (user_id, hour)
        WHERE o.hour IS NULL
    )
    SELECT user_id, MIN(hour) AS gap_start,
           MAX(hour) + INTERVAL 1 HOUR AS gap_end,
           CAST(COUNT(*) AS BIGINT) AS gap_hours
    FROM missing GROUP BY user_id, grp
    """,
    tags=("events", "gaps", "monitoring"),
)
def events_gap_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-gap report: for each monitored series (user_id < 20),
    every maximal run of consecutive hours with ZERO events inside the
    series' observed span — the feed-health monitor that pages before a
    silent upstream outage poisons a training snapshot (the complement
    of events_resample_ffill, which papers over the same holes).

    Plan shape: observed hours dedup to one row per (series, hour); the
    dense grid explodes from each series' span (bounded by TIME, not
    event volume); missing hours are a LEFT ANTI-style null filter on
    the grid join; consecutive runs collapse with the hour-index −
    row_number gaps-and-islands trick (one window per series, same
    shuffle as the grid join). At 100 TB the grid is |series| × span
    hours — monitoring cardinality, independent of event count.
    Exactness: pure integer/timestamp arithmetic."""
    e = load(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    obs = e.select(
        "user_id", F.date_trunc("hour", "ts").alias("hour")
    ).distinct()
    spans = obs.groupBy("user_id").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    grid = spans.select(
        "user_id",
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    )
    missing = (
        grid.join(obs, ["user_id", "hour"], "left_anti")
    )
    w = Window.partitionBy("user_id").orderBy("hour")
    runs = missing.withColumn(
        "grp",
        (F.unix_timestamp("hour") / 3600).cast("bigint")
        - F.row_number().over(w),
    )
    return runs.groupBy("user_id", "grp").agg(
        F.min("hour").alias("gap_start"),
        (F.max("hour") + F.expr("INTERVAL 1 HOUR")).alias("gap_end"),
        F.count(F.lit(1)).alias("gap_hours"),
    ).drop("grp")
