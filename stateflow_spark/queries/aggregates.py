"""Grouping-set aggregates: rollup / cube / grouping sets / distinct counts
(SURVEY.md §2.C "Aggregations" row)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stateflow_spark.catalog import load, register_views
from stateflow_spark.queries.common import dec, dsum, register


@register(
    "agg_rollup_region_nation",
    oracle="""
    SELECT r_name, n_name, COUNT(*) AS n_cust,
           CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS total_bal,
           GROUPING(r_name) AS g_region, GROUPING(n_name) AS g_nation
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    tags=("agg", "rollup"),
)
def agg_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy region→nation with GROUPING() indicators (the
    indicators disambiguate natural NULLs from subtotal NULLs)."""
    c = load(spark, sf_dir, "customer")
    n = F.broadcast(load(spark, sf_dir, "nation"))
    r = F.broadcast(load(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            dsum("c_acctbal", "total_bal", 4),
            F.grouping("r_name").cast("int").alias("g_region"),
            F.grouping("n_name").cast("int").alias("g_nation"),
        )
    )


@register(
    "agg_cube_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS total_price,
           GROUPING(o_orderstatus) AS g_status,
           GROUPING(o_orderpriority) AS g_priority
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "cube"),
)
def agg_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two independent dimensions."""
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "total_price", 4),
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS VARCHAR) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    tags=("agg", "grouping-sets"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (via Spark SQL — DataFrame API has no direct
    grouping-sets builder)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "agg_distinct_counts",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "distinct"),
)
def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT) in one aggregate (expand + two-phase agg)."""
    l = load(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "agg_variance_exact",
    oracle="""
    SELECT c_nationkey,
           COUNT(*) AS n,
           CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS s1,
           CAST(CAST(SUM(CAST(c_acctbal * c_acctbal AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS s2,
           (CAST(CAST(SUM(CAST(c_acctbal * c_acctbal AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
            - CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
              * CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
              / CAST(COUNT(*) AS DOUBLE))
           / CAST(COUNT(*) - 1 AS DOUBLE) AS var_bal
    FROM customer
    GROUP BY c_nationkey
    HAVING COUNT(*) > 1
    """,
    tags=("agg", "stats"),
)
def agg_variance_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent sample variance from exact decimal moments (a
    built-in var_samp would be summation-order-dependent across engines)."""
    c = load(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    g = c.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((bal).cast("decimal(38,6)")).cast("double").alias("s1"),
        F.sum((bal * bal).cast("decimal(38,6)")).cast("double").alias("s2"),
    )
    n = F.col("n").cast("double")
    var = (F.col("s2") - F.col("s1") * F.col("s1") / n) / (n - F.lit(1.0))
    return g.filter(F.col("n") > 1).select(
        "c_nationkey", "n", "s1", "s2", var.alias("var_bal")
    )


@register(
    "agg_pandas_udaf_median",
    oracle="""
    SELECT c_mktsegment, MEDIAN(c_acctbal) AS median_bal, COUNT(*) AS n
    FROM customer
    GROUP BY c_mktsegment
    """,
    tags=("agg", "udaf"),
)
def agg_pandas_udaf_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (the UDAF row of SURVEY.md §2.C): exact
    per-group median, which no order-independent built-in provides.

    Arrow ships each group's column to Python once; numpy's interpolated
    median matches DuckDB's MEDIAN on doubles (same (a+b)/2 IEEE step for
    even counts). At scale this shuffles only (segment, acctbal) — two
    narrow columns — and parallelizes per group."""
    import numpy as np
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit GROUPED_AGG: module-level `from __future__ import annotations`
    # stringifies hints, so signature-based eval-type inference can't apply
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def median_udaf(v):
        return float(np.median(v.to_numpy()))

    # Spark disallows mixing grouped-agg pandas UDFs with JVM aggregates in
    # one agg (INVALID_PANDAS_UDF_PLACEMENT) — the count rides along as a
    # second pandas UDAF over the same Arrow batch
    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def count_udaf(v):
        return len(v)

    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        median_udaf("c_acctbal").alias("median_bal"),
        count_udaf("c_acctbal").alias("n"),
    )


@register(
    "agg_salted_two_phase",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(CAST(SUM(CAST(value AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS total_value
    FROM events
    GROUP BY event_type
    """,
    tags=("agg", "skew", "salting"),
)
def agg_salted_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigating two-phase aggregate: events has only a handful of
    event_type values, so at 100 TB a plain groupBy sends each type's
    entire volume to one reducer. Salting splits every hot key across 16
    partial groups, then a second (tiny) aggregation merges the partials.
    Decimal accumulators keep both phases exact, so the result is
    bit-identical to the unsalted plan — which is exactly what the oracle
    checks. (AQE's skew handling covers joins; aggregate skew is handled
    by this pattern.)"""
    from stateflow_spark.catalog import load as _load

    e = _load(spark, sf_dir, "events")
    n_salts = 16
    partial = (
        e.withColumn("_salt", F.pmod(F.col("event_id"), F.lit(n_salts)))
        .groupBy("event_type", "_salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(dec("value", 4)).alias("pv"),
        )
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        F.sum("pv").cast("double").alias("total_value"),
    )


def approx_sketch_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw sketch aggregates per event_type — HLL++ distinct users
    (approx_count_distinct, rsd 2%) and GK-summary value quantiles
    (percentile_approx, accuracy 1000) beside their exact twins and the
    exact rank bands the registered query checks them against. The raw
    estimates are engine-specific, so this form is pinned locally
    (tests/test_sketches.py); the registered query below reduces it to a
    cross-engine-hashable shape."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.expr("percentile(value, 0.5)").alias("exact_p50"),
        F.expr("percentile(value, 0.40)").alias("p40"),
        F.expr("percentile(value, 0.60)").alias("p60"),
        F.expr("percentile(value, 0.98)").alias("p98"),
        F.max("value").alias("vmax"),
        F.expr("percentile_approx(value, 0.5, 1000)").alias("approx_p50"),
        F.expr("percentile_approx(value, 0.99, 1000)").alias("approx_p99"),
    )


@register(
    "agg_approx_sketches",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS exact_users,
           ROUND(quantile_cont(value, 0.5), 4) AS exact_p50,
           TRUE AS hll_within_3sd,
           TRUE AS p50_in_band,
           TRUE AS p99_in_band
    FROM events GROUP BY event_type
    """,
    tags=("agg", "sketch", "approx"),
)
def agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based aggregates per event_type: HyperLogLog++ distinct
    users (approx_count_distinct, rsd 2%) and GK-summary value quantiles
    (percentile_approx) next to their exact twins.

    This is the 100 TB cardinality posture: exact COUNT(DISTINCT user)
    shuffles every distinct key (the `expand` fan-out when combined with
    other aggregates); the HLL sketch is a few KB per group, merges
    associatively map-side, and is exact enough (±rsd) for monitoring /
    planning use. The exact columns exist at test scale to expose the
    error; a production query ships only the sketch columns.

    Oracle contract: DuckDB's approx functions use different sketch
    parameters, so the raw estimates can never hash-match. Instead the
    query emits the EXACT aggregates plus deterministic bound-check
    booleans — HLL estimate within 3·rsd of the exact distinct count,
    approx quantiles inside exact rank bands (p40..p60 for the median:
    accuracy=1000 bounds rank error at 0.1%, 100× tighter) — and the
    oracle computes the exact sides with literal TRUEs. Both Spark
    sketches are deterministic for a fixed input (HLL registers are an
    order-independent max; the GK summary is merge-deterministic under a
    fixed partitioning), so the booleans are stable round to round
    (tests/test_sketches.py also pins determinism)."""
    raw = approx_sketch_raw(spark, sf_dir)
    return raw.select(
        "event_type",
        "n_events",
        "exact_users",
        F.round("exact_p50", 4).alias("exact_p50"),
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= 3 * 0.02 * F.col("exact_users")
        ).alias("hll_within_3sd"),
        F.col("approx_p50").between(F.col("p40"), F.col("p60")).alias(
            "p50_in_band"
        ),
        F.col("approx_p99").between(F.col("p98"), F.col("vmax")).alias(
            "p99_in_band"
        ),
    )


@register(
    "agg_sketch_rollup",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT CAST(ts AS DATE)) AS n_days,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS rollup_within_3sd
    FROM events GROUP BY event_type
    """,
    tags=("agg", "sketch", "rollup"),
)
def agg_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RE-AGGREGATABLE sketches — the property that makes sketches the
    100 TB cardinality tool: per-(event_type, day) HLL sketches
    (Datasketches ``hll_sketch_agg``, the precomputed-partition artifact a
    lakehouse rollup table stores) are UNIONED per event_type
    (``hll_union_agg``) and estimated — daily distinct-user sketches roll
    up to any coarser grain without rescanning raw data, which exact
    distinct counts fundamentally cannot do (distinct is not
    re-aggregatable). Plan: two keyed aggregates over sketch blobs (KB per
    group) + one broadcast-sized join against the exact twin.

    Oracle contract: same as agg_approx_sketches — the raw estimate is
    engine-specific, so the row hashes the exact sides plus a
    deterministic bound boolean (union estimate within 3σ ≈ 6% at the
    default lgK=12, rsd ≈ 1.6%); tests/test_sketches.py additionally pins
    that the UNION-of-daily-sketches estimate equals the single-pass
    whole-group sketch estimate exactly (register-wise max is associative)
    and that everything is deterministic."""
    e = load(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day"), "user_id"
    )
    daily = e.groupBy("event_type", "day").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    rolled = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
        F.count(F.lit(1)).alias("n_days"),
    )
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return rolled.join(exact, "event_type").select(
        "event_type",
        "n_days",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= 0.06 * F.col("exact_users")
        ).alias("rollup_within_3sd"),
    )


# --------------------------------------------------------------------------
# Count-min sketch heavy hitters (Cormode & Muthukrishnan 2005)
# --------------------------------------------------------------------------

_CM_DEPTH = 4  # hash rows
_CM_WIDTH = 64  # buckets per row
_CM_TOPN = 15  # candidates reported (the exact top-N user_ids)

# md5-derived row hash, replayable in DuckDB hex-digit arithmetic:
# bucket_j(key) = int(md5(j ':' key)[:8 hex]) % WIDTH
_CM_BUCKET_SQL = f"""list_reduce(list_transform(range(1, 9),
        i -> CAST(strpos('0123456789abcdef',
                         substr(md5(CAST(j AS VARCHAR) || ':' ||
                                    CAST(user_id AS VARCHAR)), i, 1))
                  - 1 AS BIGINT)),
        (a, b) -> a * 16 + b) % {_CM_WIDTH}"""


def _cm_bucket() -> F.Column:
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.col("j").cast("string"),
                        F.col("user_id").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % _CM_WIDTH
    )


@register(
    "agg_countmin_heavy_hitters",
    oracle=f"""
    WITH ev AS (SELECT user_id FROM events),
    hashed AS (
        SELECT user_id, j, {_CM_BUCKET_SQL} AS bucket
        FROM ev, (SELECT unnest(range(0, {_CM_DEPTH})) AS j)
    ),
    counters AS (
        SELECT j, bucket, COUNT(*) AS c FROM hashed GROUP BY 1, 2
    ),
    exact AS (
        SELECT user_id, COUNT(*) AS exact_cnt, COUNT(*) OVER () AS n_users,
               CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS n_events
        FROM ev GROUP BY user_id
    ),
    cand AS (
        SELECT user_id, exact_cnt, n_events FROM exact
        ORDER BY exact_cnt DESC, user_id LIMIT {_CM_TOPN}
    ),
    est AS (
        SELECT c.user_id, c.exact_cnt, c.n_events,
               MIN(ct.c) AS cm_estimate
        FROM (SELECT cand.*, j, {_CM_BUCKET_SQL.replace("user_id", "cand.user_id")} AS bucket
              FROM cand, (SELECT unnest(range(0, {_CM_DEPTH})) AS j)) c
        JOIN counters ct ON ct.j = c.j AND ct.bucket = c.bucket
        GROUP BY 1, 2, 3
    )
    SELECT user_id, CAST(exact_cnt AS BIGINT) AS exact_cnt,
           CAST(cm_estimate AS BIGINT) AS cm_estimate,
           CAST(cm_estimate - exact_cnt AS BIGINT) AS overcount,
           (cm_estimate >= exact_cnt) AS never_undercounts,
           (cm_estimate - exact_cnt <= 2 * n_events / {_CM_WIDTH})
             AS within_bound
    FROM est
    """,
    tags=("agg", "sketch", "countmin"),
)
def agg_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy hitters: build a {_CM_DEPTH}×{_CM_WIDTH}
    counter sketch over event user_ids with md5-derived row hashes, then
    report the exact top-{_CM_TOPN} users beside their sketch estimates,
    the overcount, and the CM guarantees as computed booleans — the
    one-sided error (never undercounts) and the ε=2/width bound. Fixed
    deterministic hashes make the SKETCH CONTENT itself hash-gateable
    cross-engine, the same trick the curation samplers use — where
    agg_approx_sketches gates Spark's built-in HLL/KLL behind bound
    checks, this row pins every counter bit.

    Scale shape: the build explodes each event into {_CM_DEPTH} hash rows
    but the (j, bucket) key space is {_CM_DEPTH}×{_CM_WIDTH} = 256 —
    map-side combine collapses each partition to ≤256 partial rows, so
    the exchange carries ~256 rows per partition REGARDLESS of event
    volume: the textbook mergeable-sketch aggregation (and why CM beats
    exact counting at 100 TB: the shuffle is O(sketch), not O(keys)).
    The counter table broadcasts back to score the candidate set; the
    candidate list itself is a TakeOrdered over the exact per-user
    aggregate (at production scale the candidates come from upstream —
    the sketch is the filter, exact counting the verify pass)."""
    ev = load(spark, sf_dir, "events").select("user_id")
    js = F.array(*[F.lit(j) for j in range(_CM_DEPTH)])
    hashed = ev.select("user_id", F.explode(js).alias("j")).select(
        "j", _cm_bucket().alias("bucket")
    )
    counters = F.broadcast(
        hashed.groupBy("j", "bucket").agg(F.count(F.lit(1)).alias("c"))
    )
    n_events = F.broadcast(ev.agg(F.count(F.lit(1)).alias("n_events")))
    cand = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), "user_id")
        .limit(_CM_TOPN)
        .crossJoin(n_events)
    )
    est = (
        cand.select("user_id", "exact_cnt", "n_events", F.explode(js).alias("j"))
        .select("user_id", "exact_cnt", "n_events", "j", _cm_bucket().alias("bucket"))
        .join(counters, ["j", "bucket"])
        .groupBy("user_id", "exact_cnt", "n_events")
        .agg(F.min("c").alias("cm_estimate"))
    )
    return est.select(
        "user_id",
        "exact_cnt",
        "cm_estimate",
        (F.col("cm_estimate") - F.col("exact_cnt")).alias("overcount"),
        (F.col("cm_estimate") >= F.col("exact_cnt")).alias("never_undercounts"),
        (
            F.col("cm_estimate") - F.col("exact_cnt")
            <= 2 * F.col("n_events") / _CM_WIDTH
        ).alias("within_bound"),
    )


# --------------------------------------------------------------------------
# Bloom-filter membership (Bloom 1970) — the join-pruning sketch
# --------------------------------------------------------------------------

_BLOOM_K = 3  # hash functions
_BLOOM_M = 16384  # bits

_BLOOM_BUCKET_SQL = f"""list_reduce(list_transform(range(1, 9),
        i -> CAST(strpos('0123456789abcdef',
                         substr(md5(CAST(j AS VARCHAR) || ':' ||
                                    CAST(k AS VARCHAR)), i, 1))
                  - 1 AS BIGINT)),
        (a, b) -> a * 16 + b) % {_BLOOM_M}"""


def _bloom_bucket(key: str) -> F.Column:
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.col("j").cast("string"), F.col(key).cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % _BLOOM_M
    )


@register(
    "agg_bloom_filter_membership",
    oracle=f"""
    WITH build AS (
        SELECT DISTINCT o_custkey AS k FROM orders
        WHERE o_orderpriority = '1-URGENT'
    ),
    bits AS (
        SELECT DISTINCT j, {_BLOOM_BUCKET_SQL} AS bucket
        FROM build, (SELECT unnest(range(0, {_BLOOM_K})) AS j)
    ),
    probe AS (
        SELECT c_custkey AS k, j, {_BLOOM_BUCKET_SQL} AS bucket
        FROM customer, (SELECT unnest(range(0, {_BLOOM_K})) AS j)
    ),
    hits AS (
        SELECT p.k, COUNT(b.bucket) AS n_set
        FROM probe p
        LEFT JOIN bits b ON b.j = p.j AND b.bucket = p.bucket
        GROUP BY p.k
    ),
    truth AS (SELECT k, TRUE AS has_urgent FROM build)
    SELECT h.k AS c_custkey,
           (h.n_set = {_BLOOM_K}) AS in_bloom,
           COALESCE(t.has_urgent, FALSE) AS has_urgent,
           ((h.n_set = {_BLOOM_K}) AND t.has_urgent IS NULL)
             AS is_false_positive,
           (NOT (h.n_set = {_BLOOM_K}) AND t.has_urgent IS NOT NULL)
             AS is_false_negative
    FROM hits h LEFT JOIN truth t ON t.k = h.k
    """,
    tags=("agg", "sketch", "bloom"),
)
def agg_bloom_filter_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership — the join-pruning sketch: build a k=3,
    m=16384-bit filter over the custkeys that placed an URGENT order,
    probe every customer, and emit the sketch verdict beside ground truth
    with false-positive / false-negative booleans (the latter must be
    all-FALSE — Bloom's one-sided guarantee — and IS, pinned by the hash
    gate; the former surfaces the actual ε of this fill level). Fixed
    md5-derived bit positions make the filter CONTENT bit-identical
    cross-engine, like agg_countmin_heavy_hitters.

    Scale shape: the build side reduces to ≤ k·m DISTINCT (j, bucket)
    rows — map-side combine caps each partition's output at the sketch
    size, the exchange is O(sketch) not O(keys), and the bit set
    broadcasts to the probe (one scan, no shuffle). This is exactly how
    a runtime bloom join filter prunes a 100 TB probe side: the build
    fact's key set travels as kilobytes of bits, and probe rows that
    miss any of the k buckets never reach the join."""
    o = load(spark, sf_dir, "orders")
    build = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    js = F.array(*[F.lit(j) for j in range(_BLOOM_K)])
    bits = F.broadcast(
        build.select("k", F.explode(js).alias("j"))
        .select("j", _bloom_bucket("k").alias("bucket"))
        .distinct()
        .withColumn("set_bit", F.lit(1))
    )
    probe = (
        load(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("k"))
        .select("k", F.explode(js).alias("j"))
        .select("k", "j", _bloom_bucket("k").alias("bucket"))
    )
    hits = (
        probe.join(bits, ["j", "bucket"], "left")
        .groupBy("k")
        .agg(F.count("set_bit").alias("n_set"))
    )
    # no hint: the build/truth key set is corpus-proportional (the bloom
    # exists precisely so this join is avoidable at scale; the truth join
    # here is the accuracy audit) — AQE broadcasts it while it fits
    truth = build.withColumn("has_urgent", F.lit(True))
    in_bloom = F.col("n_set") == _BLOOM_K
    return (
        hits.join(truth, "k", "left")
        .select(
            F.col("k").alias("c_custkey"),
            in_bloom.alias("in_bloom"),
            F.coalesce(F.col("has_urgent"), F.lit(False)).alias("has_urgent"),
            (in_bloom & F.col("has_urgent").isNull()).alias("is_false_positive"),
            (~in_bloom & F.col("has_urgent").isNotNull()).alias(
                "is_false_negative"
            ),
        )
    )


@register(
    "agg_group_ols_trend",
    oracle="""
    WITH base AS (
        SELECT event_type, ts, CAST(value AS DECIMAL(38,2)) AS yq
        FROM events
    ),
    g0 AS (SELECT event_type, MIN(ts) AS t0 FROM base GROUP BY event_type),
    xy AS (
        SELECT b.event_type,
               (epoch_us(b.ts) - epoch_us(g0.t0)) // 3600000000 AS x,
               CAST(b.yq * 100 AS BIGINT) AS y
        FROM base b JOIN g0 USING (event_type)
    ),
    s AS (
        SELECT event_type,
               COUNT(*) AS n,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * y) AS sxy, SUM(x * x) AS sxx
        FROM xy GROUP BY event_type
    )
    SELECT event_type, n,
           CAST(sx AS BIGINT) AS sx, CAST(sy AS BIGINT) AS sy,
           CAST(sxy AS BIGINT) AS sxy, CAST(sxx AS BIGINT) AS sxx,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
           / 100.0 AS slope_per_hour,
           (CAST(sy AS DOUBLE)
              - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * CAST(sx AS DOUBLE))
           / CAST(n AS DOUBLE) / 100.0 AS intercept
    FROM s
    """,
    tags=("agg", "regression"),
)
def agg_group_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series OLS trend (slope/intercept of value over time) from
    EXACT sufficient statistics — the canonical 100 TB regression
    pattern: the only corpus pass is one partial/final hash aggregate of
    five integer sums per group (n, Σx, Σy, Σxy, Σx²); the closed-form
    solve happens on the 5-rows-per-group result. Exactness layering:
    x = whole hours since the group's first event (small exact ints),
    y = value quantized at scale 2 (a double→decimal cast can never tie
    at any scale — a tie would need a non-dyadic fraction to be exactly
    representable — so HALF_UP/half-even divergence is impossible); the
    per-row products and their sums stay < 2^53 (sized in SCALING.md),
    so every statistic is integer-exact in both engines. The final
    slope/intercept are computed by the SAME scalar expression tree on
    identical double operands — IEEE ops are deterministic, so the gate
    hashes bit-identical floats without needing the solve itself to be
    exact. Group t0 comes from a 5-row broadcast self-aggregate, not a
    window over the corpus."""
    e = load(spark, sf_dir, "events").select(
        "event_type", "ts", dec("value", 2).alias("yq")
    )
    g0 = e.groupBy("event_type").agg(F.min("ts").alias("t0"))
    xy = e.join(F.broadcast(g0), "event_type").select(
        "event_type",
        F.expr(
            "(unix_micros(ts) - unix_micros(t0)) div 3600000000"
        ).alias("x"),
        (F.col("yq") * 100).cast("bigint").alias("y"),
    )
    s = xy.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    sxyd = F.col("sxy").cast("double")
    sxxd = F.col("sxx").cast("double")
    slope = (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)
    return s.select(
        "event_type",
        "n",
        "sx",
        "sy",
        "sxy",
        "sxx",
        (slope / 100.0).alias("slope_per_hour"),
        ((syd - slope * sxd) / nd / 100.0).alias("intercept"),
    )


@register(
    "agg_series_correlation",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               SUM(CAST(CAST(value AS DECIMAL(38,2)) * 100 AS BIGINT)) AS s
        FROM events GROUP BY 1, 2
    ),
    p AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               a.s AS x, b.s AS y
        FROM hourly a JOIN hourly b
          ON a.h = b.h AND a.event_type < b.event_type
    ),
    st AS (
        SELECT type_a, type_b, COUNT(*) AS n_hours,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy
        FROM p GROUP BY 1, 2
    )
    SELECT type_a, type_b, n_hours,
           (CAST(n_hours AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / sqrt((CAST(n_hours AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * (CAST(n_hours AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
           AS pearson_r
    FROM st
    """,
    tags=("agg", "correlation", "timeseries"),
)
def agg_series_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation between event-type time series at
    hourly grain, from EXACT sufficient statistics — OLS-trend's sibling
    (agg_group_ols_trend) for the cross-series question "which signals
    move together". Correlation is over pairwise-complete hours (hours
    where both series have events; absent hours are missing data, not
    zeros — documented semantic choice).

    Exactness: hourly sums are scale-2-quantized bigints (exact in both
    engines regardless of partitioning); the six statistics per pair are
    integer sums; the closed-form r is one identical double expression
    tree on identical operands — and IEEE-754 REQUIRES sqrt to be
    correctly rounded, so unlike ln/exp it is bit-identical across
    JVM and DuckDB and safe to hash-gate.

    Scale shape: the only corpus pass is one partial/final hash aggregate
    onto the (event_type × hour) grid. Pairs are expanded by the house
    posting-list pattern (collect the hour's ≤|types| series values, pair
    them in an array lambda) rather than a hourly⋈hourly self-join — a
    self-join re-states the aggregate subtree per branch and the static
    plan scans the corpus TWICE (ReuseExchange is not guaranteed to fire
    across the rename, and did not here); the posting form is one scan by
    construction. Everything after the corpus aggregate is grid-sized
    (hours × types, independent of event volume). The 2^53 budget:
    hourly scale-2 sums ~10^4 on this data; x·y ~10^8 per hour, ~10^13
    per decade-year of hours — escalate the six sums to DECIMAL(38,0)
    accumulators past ~10^5-row hourly cells; the plan is unchanged."""
    e = load(spark, sf_dir, "events")
    hourly = (
        e.select(
            "event_type",
            F.date_trunc("hour", "ts").alias("h"),
            (dec("value", 2) * 100).cast("bigint").alias("v"),
        )
        .groupBy("event_type", "h")
        .agg(F.sum("v").alias("s"))
    )
    byhour = (
        hourly.groupBy("h")
        .agg(F.sort_array(F.collect_list(F.struct("event_type", "s"))).alias("ds"))
        .filter(F.size("ds") > 1)
    )
    p = byhour.select(
        F.explode(
            F.expr(
                """
                flatten(transform(ds, (a, i) ->
                    transform(slice(ds, i + 2, size(ds) - i - 1),
                              b -> struct(a.event_type AS type_a,
                                          b.event_type AS type_b,
                                          a.s AS x, b.s AS y))))
                """
            )
        ).alias("p")
    ).select("p.*")
    st = p.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd = F.col("n_hours").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    sxyd = F.col("sxy").cast("double")
    sxxd = F.col("sxx").cast("double")
    syyd = F.col("syy").cast("double")
    r = (nd * sxyd - sxd * syd) / F.sqrt(
        (nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd)
    )
    return st.select("type_a", "type_b", "n_hours", r.alias("pearson_r"))


@register(
    "agg_ab_test_zscore",
    oracle="""
    WITH u AS (
        SELECT user_id, user_id % 2 AS variant,
               CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                                  THEN 1 ELSE 0 END)
                         > SUM(CASE WHEN event_type = 'error'
                                    THEN 1 ELSE 0 END)
                    THEN 1 ELSE 0 END AS converted
        FROM events GROUP BY user_id
    ),
    v AS (
        SELECT variant, COUNT(*) AS n_users,
               CAST(SUM(converted) AS BIGINT) AS n_converted
        FROM u GROUP BY variant
    ),
    w AS (
        SELECT
            (SELECT n_users FROM v WHERE variant = 0) AS n_a,
            (SELECT n_converted FROM v WHERE variant = 0) AS conv_a,
            (SELECT n_users FROM v WHERE variant = 1) AS n_b,
            (SELECT n_converted FROM v WHERE variant = 1) AS conv_b
    )
    SELECT n_a, conv_a, n_b, conv_b,
           CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS p_a,
           CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS p_b,
           (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
              - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
           / sqrt((CAST(conv_a + conv_b AS DOUBLE)
                     / CAST(n_a + n_b AS DOUBLE))
                  * (1.0 - CAST(conv_a + conv_b AS DOUBLE)
                             / CAST(n_a + n_b AS DOUBLE))
                  * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
           AS z_score
    FROM w
    """,
    tags=("agg", "experiment", "stats"),
)
def agg_ab_test_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test for an A/B experiment readout — the
    third member of the exact-statistics family (with agg_group_ols_trend
    and agg_series_correlation): variant = user_id % 2, conversion =
    the user fired more 'purchase' than 'error' events (a per-user
    comparison that stays non-degenerate at every scale — "ever
    purchased" saturates to p=1 on dense replay data and zeroes the
    pooled-variance denominator); the z statistic for p_a - p_b under
    the pooled null is computed from FOUR integers (n_a, conv_a, n_b,
    conv_b) by one identical double expression tree — division and
    IEEE-correctly-rounded sqrt only, so the gate hashes bit-identical
    floats cross-engine.

    Scale shape: one partial/final aggregate to per-user conversion flags
    (the corpus pass; max() combines map-side), one 2-row variant
    aggregate, then a scalar solve. At 100 TB the per-user aggregate is
    the only shuffle and its key space is users — uniform, salting-free."""
    e = load(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        (
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            > F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        )
        .cast("int")
        .alias("converted")
    )
    v = (
        u.select((F.col("user_id") % 2).alias("variant"), "converted")
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("converted").alias("n_converted"),
        )
    )
    w = v.groupBy().pivot("variant", [0, 1]).agg(
        F.first("n_users").alias("n"), F.first("n_converted").alias("conv")
    ).select(
        F.col("0_n").alias("n_a"),
        F.col("0_conv").alias("conv_a"),
        F.col("1_n").alias("n_b"),
        F.col("1_conv").alias("conv_b"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    pa = F.col("conv_a").cast("double") / na
    pb = F.col("conv_b").cast("double") / nb
    pp = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    z = (pa - pb) / F.sqrt(pp * (F.lit(1.0) - pp) * (F.lit(1.0) / na + F.lit(1.0) / nb))
    return w.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        pa.alias("p_a"),
        pb.alias("p_b"),
        z.alias("z_score"),
    )


@register(
    "agg_exact_percentiles",
    oracle="""
    WITH q AS (
        SELECT event_type, CAST(value AS DECIMAL(38,2)) AS v, COUNT(*) AS c
        FROM events GROUP BY 1, 2
    ),
    cum AS (
        SELECT event_type, v,
               SUM(c) OVER (PARTITION BY event_type ORDER BY v
                            ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(c) OVER (PARTITION BY event_type) AS n
        FROM q
    )
    SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
           CAST(MIN(CASE WHEN cum >= CAST(ceil(0.50 * n) AS BIGINT)
                         THEN v END) AS DOUBLE) AS p50,
           CAST(MIN(CASE WHEN cum >= CAST(ceil(0.90 * n) AS BIGINT)
                         THEN v END) AS DOUBLE) AS p90,
           CAST(MIN(CASE WHEN cum >= CAST(ceil(0.99 * n) AS BIGINT)
                         THEN v END) AS DOUBLE) AS p99
    FROM cum GROUP BY event_type
    """,
    tags=("agg", "percentile", "stats"),
)
def agg_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT grouped percentiles (p50/p90/p99 per event_type, lower
    discrete quantile: the smallest value whose cumulative count reaches
    ceil(q·n) — verified identical to DuckDB's quantile_disc) in the
    SCALABLE form: the corpus pass is one (type, distinct-value) count
    aggregate — map-side combinable, one shuffle — and the cumulative
    window runs over the distinct-value histogram, whose size is bounded
    by the value domain (scale-2 quantization ⇒ ~10⁴ rows/type), not by
    event volume. The naive form — a window sort over raw events
    partitioned by a 5-value key — is exactly the hot-key anti-pattern
    SCALING.md warns about and is what percentile_approx exists to
    avoid; this row shows exactness does NOT require it. Complements
    agg_approx_sketches (percentile_approx twin, error-bounded) and
    window_equidepth_histogram (rank-based buckets).

    Exactness: values ride a scale-2 decimal (never ties across
    engines), counts/targets are integers, and ceil(q·n) is the same
    IEEE double op both sides."""
    from pyspark.sql.window import Window

    e = load(spark, sf_dir, "events")
    q = (
        e.groupBy("event_type", dec("value", 2).alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    cum = q.select(
        "event_type",
        "v",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    )

    def pick(frac: float, name: str):
        target = F.ceil(F.lit(frac) * F.col("n")).cast("bigint")
        return (
            F.min(F.when(F.col("cum") >= target, F.col("v")))
            .cast("double")
            .alias(name)
        )

    return cum.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n"),
        pick(0.50, "p50"),
        pick(0.90, "p90"),
        pick(0.99, "p99"),
    )


@register(
    "agg_table_checksum",
    oracle="""
    WITH h AS (
        SELECT l_returnflag,
               list_reduce(list_transform(range(1, 16),
                   j -> CAST(strpos('0123456789abcdef',
                             substr(md5(
                                 CAST(l_orderkey AS VARCHAR) || '|' ||
                                 CAST(l_linenumber AS VARCHAR) || '|' ||
                                 CAST(CAST(CAST(l_quantity AS DECIMAL(38,2))
                                           * 100 AS BIGINT) AS VARCHAR)
                                 || '|' ||
                                 CAST(epoch_us(l_shipdate) AS VARCHAR)
                                 || '|' || l_returnflag
                             ), j, 1)) - 1 AS BIGINT)),
                   (a, b) -> a * 16 + b) AS hv
        FROM lineitem
    )
    SELECT l_returnflag, COUNT(*) AS n,
           BIT_XOR(hv) AS xor_checksum,
           CAST(SUM(hv) % 1000000000000000000 AS BIGINT) AS modsum_checksum
    FROM h GROUP BY l_returnflag
    """,
    tags=("agg", "checksum", "audit"),
)
def agg_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table checksum — the audit primitive for 100 TB
    migrations/replications: verify two copies hold identical content
    WITHOUT sorting or shipping either (compare one small grouped-
    checksum table per side). Each row serializes to a canonical string
    of exactly-representable pieces ONLY (integers, epoch micros,
    scale-2-quantized quantity, raw strings — never engine-formatted
    floats), hashes to a 60-bit md5-prefix int, and the per-group digest
    is the pair (BIT_XOR, SUM mod 10^18): both commutative/associative —
    any partitioning gives the same answer — and complementary (XOR is
    blind to duplicated row PAIRS, the modular sum is not; the count
    closes cardinality). The whole thing is one map-side-combinable
    aggregate: the shuffle carries |groups| rows.

    This is also the engine's own cross-engine proof pattern turned into
    an operator: the DuckDB oracle computes the identical digests, so
    the hash gate certifies Spark's md5/serialization/fold bit-for-bit."""
    l = load(spark, sf_dir, "lineitem")
    s = F.concat_ws(
        "|",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
        (dec("l_quantity", 2) * 100).cast("bigint").cast("string"),
        F.unix_micros(F.col("l_shipdate").cast("timestamp")).cast("string"),
        F.col("l_returnflag"),
    )
    h = l.select(
        "l_returnflag",
        F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint").alias("hv"),
    )
    return h.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(hv)").alias("xor_checksum"),
        (
            F.sum(F.col("hv").cast("decimal(38,0)"))
            % F.lit(10**18)
        )
        .cast("bigint")
        .alias("modsum_checksum"),
    )


# ---------------------------------------------------------------------------
# One-pass data profiler (the ingest-time data-quality report)
# ---------------------------------------------------------------------------
# (name, spark canonical template over {c}, duck canonical template over
# {c}) — both sides are TEMPLATES so min/max can substitute MIN(col)/
# MAX(col) without string surgery on the column name. Doubles
# canonicalize through DECIMAL(12,2) so both engines emit the identical
# string (and the 2-decimal source values are never scale-2 rounding
# ties — see queries/common.py tie-hazard note).
_PROFILE_COLS = [
    ("l_linenumber", "CAST({c} AS STRING)", "CAST({c} AS VARCHAR)"),
    ("l_quantity", "CAST(CAST({c} AS DECIMAL(12,2)) AS STRING)",
     "CAST(CAST({c} AS DECIMAL(12,2)) AS VARCHAR)"),
    ("l_discount", "CAST(CAST({c} AS DECIMAL(12,2)) AS STRING)",
     "CAST(CAST({c} AS DECIMAL(12,2)) AS VARCHAR)"),
    ("l_tax", "CAST(CAST({c} AS DECIMAL(12,2)) AS STRING)",
     "CAST(CAST({c} AS DECIMAL(12,2)) AS VARCHAR)"),
    ("l_returnflag", "{c}", "{c}"),
    ("l_linestatus", "{c}", "{c}"),
    ("l_shipdate", "CAST({c} AS STRING)", "CAST({c} AS VARCHAR)"),
]


def _profile_oracle() -> str:
    branches = []
    for name, _, duck_t in _PROFILE_COLS:
        canon = duck_t.format(c=name)
        branches.append(f"""
    SELECT '{name}' AS col_name,
           CAST(SUM(cnt) AS BIGINT) AS n_rows,
           CAST(COALESCE(SUM(CASE WHEN val IS NULL THEN cnt END), 0)
                AS BIGINT) AS n_nulls,
           CAST(COUNT(val) AS BIGINT) AS n_distinct,
           (SELECT {duck_t.format(c=f"MIN({name})")} FROM lineitem) AS min_val,
           (SELECT {duck_t.format(c=f"MAX({name})")} FROM lineitem) AS max_val,
           MAX(CASE WHEN val IS NOT NULL
                    THEN lpad(CAST(cnt AS VARCHAR), 12, '0') || '|' || val
               END) AS _top
    FROM (SELECT {canon} AS val, COUNT(*) AS cnt FROM lineitem GROUP BY 1)
        """)
    u = " UNION ALL ".join(f"({b})" for b in branches)
    return f"""
    SELECT col_name, n_rows, n_nulls, n_distinct, min_val, max_val,
           substr(_top, 14) AS top_value,
           CAST(CAST(substr(_top, 1, 12) AS BIGINT) AS BIGINT) AS top_count
    FROM ({u})
    """


@register(
    "profile_table_stats",
    oracle=_profile_oracle(),
    tags=("agg", "profiling"),
)
def profile_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass table profiler — the ingest-time data-quality report every
    pipeline runs before training on a new source: per column, row/null
    counts, EXACT distinct cardinality, typed min/max, and the modal value
    with its frequency (deterministic tiebreak: higher value wins).

    Plan shape: the k profiled columns unpivot via ``stack`` into
    (col_name, canonical_value) rows — k× the scan rows BEFORE partial
    aggregation, but the (col, val) count agg map-side-combines to
    distinct-value volume per partition, so the only real shuffle carries
    ~|distinct values| rows, not k×N. The per-column rollup is a second
    k-row-output aggregate, and typed min/max ride ONE global 1-row
    aggregate unpivoted and broadcast back — three aggregates, no window,
    no per-column jobs (a naive profiler runs k scans). Top-value
    selection is an order-independent struct MAX. At 100 TB: scan-bound;
    high-cardinality columns dominate the count shuffle and would move to
    approx_count_distinct — kept exact here so the oracle hash-gates."""
    li = load(spark, sf_dir, "lineitem")
    k = len(_PROFILE_COLS)
    stack_args = ", ".join(
        f"'{n}', {s.format(c=n)}" for n, s, _ in _PROFILE_COLS
    )
    long = li.select(
        F.expr(f"stack({k}, {stack_args})").alias("col_name", "val")
    )
    vc = long.groupBy("col_name", "val").agg(F.count(F.lit(1)).alias("cnt"))
    top_struct = F.max(
        F.when(F.col("val").isNotNull(), F.struct("cnt", "val"))
    )
    stats = vc.groupBy("col_name").agg(
        F.sum("cnt").alias("n_rows"),
        F.coalesce(
            F.sum(F.when(F.col("val").isNull(), F.col("cnt"))), F.lit(0)
        ).alias("n_nulls"),
        F.count("val").alias("n_distinct"),
        top_struct.getField("val").alias("top_value"),
        top_struct.getField("cnt").alias("top_count"),
    )
    mm_exprs = []
    for n, s, _ in _PROFILE_COLS:
        mm_exprs += [
            F.expr(s.format(c=f"MIN({n})")).alias(f"mn_{n}"),
            F.expr(s.format(c=f"MAX({n})")).alias(f"mx_{n}"),
        ]
    mm_row = li.agg(*mm_exprs)
    mm_stack = ", ".join(f"'{n}', mn_{n}, mx_{n}" for n, _, _ in _PROFILE_COLS)
    minmax = mm_row.select(
        F.expr(f"stack({k}, {mm_stack})").alias("col_name", "min_val", "max_val")
    )
    return stats.join(F.broadcast(minmax), "col_name").select(
        "col_name", "n_rows", "n_nulls", "n_distinct",
        "min_val", "max_val", "top_value", "top_count",
    )


@register(
    "agg_winsorized_mean",
    oracle="""
    WITH q AS (
        SELECT event_type, CAST(value AS DECIMAL(38,2)) AS v, COUNT(*) AS c
        FROM events GROUP BY 1, 2
    ),
    cum AS (
        SELECT event_type, v, c,
               SUM(c) OVER (PARTITION BY event_type ORDER BY v
                            ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(c) OVER (PARTITION BY event_type) AS n
        FROM q
    ),
    thr AS (
        SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
               MIN(CASE WHEN cum >= CAST(ceil(0.05 * n) AS BIGINT)
                        THEN v END) AS p05,
               MIN(CASE WHEN cum >= CAST(ceil(0.95 * n) AS BIGINT)
                        THEN v END) AS p95
        FROM cum GROUP BY event_type
    ),
    stats AS (
        SELECT q.event_type,
               SUM(CAST(CAST(q.v * 100 AS BIGINT) * q.c
                        AS DECIMAL(38,0))) AS plain_cents,
               SUM(CAST(CAST(LEAST(GREATEST(q.v, thr.p05), thr.p95) * 100
                             AS BIGINT) * q.c AS DECIMAL(38,0))) AS wins_cents
        FROM q JOIN thr USING (event_type)
        GROUP BY q.event_type
    )
    SELECT thr.event_type, thr.n,
           CAST(thr.p05 AS DOUBLE) AS p05,
           CAST(thr.p95 AS DOUBLE) AS p95,
           CAST(CAST(plain_cents AS VARCHAR) AS DOUBLE)
               / (100.0 * CAST(thr.n AS DOUBLE)) AS mean_plain,
           CAST(CAST(wins_cents AS VARCHAR) AS DOUBLE)
               / (100.0 * CAST(thr.n AS DOUBLE)) AS mean_winsorized
    FROM thr JOIN stats USING (event_type)
    """,
    tags=("agg", "robust", "stats"),
)
def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (winsorized) mean per event type: values clipped to the
    EXACT [p05, p95] before averaging — the outlier-resistant quality
    metric a data pipeline reports beside the plain mean (one fat-finger
    value can move a plain mean arbitrarily; the winsorized mean is
    bounded). Completes the robust-statistics corner beside exact
    variance / OLS / correlation / z-test.

    Scale shape: EVERYTHING computes off the (type, distinct-value)
    histogram from agg_exact_percentiles — one map-combinable corpus
    aggregate; the cumulative window, the threshold pick AND the clipped
    sums all run over the ~10⁴-rows-per-type histogram (clip(v)·count is
    algebra over the histogram, so winsorizing needs NO second corpus
    pass — the naive form rescans with a per-row CASE). Exactness:
    values quantize to cents (never scale-2 ties), clipped sums are
    int64-cents products accumulated through decimal(38,0), means are
    one IEEE division of bit-identical operands."""
    from pyspark.sql.window import Window

    e = load(spark, sf_dir, "events")
    # the histogram feeds BOTH the threshold branch and the clipped sums —
    # materialize it once or the corpus scan + (type, value) shuffle runs
    # twice (which would falsify the no-second-corpus-pass claim)
    q = (
        e.groupBy(
            "event_type", F.col("value").cast("decimal(38,2)").alias("v")
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    cum = q.select(
        "event_type",
        "v",
        "c",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    )

    def pick_dec(frac: float, name: str):
        target = F.ceil(F.lit(frac) * F.col("n")).cast("bigint")
        return F.min(F.when(F.col("cum") >= target, F.col("v"))).alias(name)

    thr = cum.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n"),
        pick_dec(0.05, "p05"),
        pick_dec(0.95, "p95"),
    )
    cents = (F.col("v") * 100).cast("bigint")
    clipped_cents = (
        F.least(F.greatest(F.col("v"), F.col("p05")), F.col("p95")) * 100
    ).cast("bigint")
    stats = (
        q.join(F.broadcast(thr), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.max("p05").alias("p05"),
            F.max("p95").alias("p95"),
            F.sum((cents * F.col("c")).cast("decimal(38,0)")).alias(
                "plain_cents"
            ),
            F.sum((clipped_cents * F.col("c")).cast("decimal(38,0)")).alias(
                "wins_cents"
            ),
        )
    )
    denom = F.lit(100.0) * F.col("n").cast("double")
    return stats.select(
        "event_type",
        "n",
        F.col("p05").cast("double").alias("p05"),
        F.col("p95").cast("double").alias("p95"),
        (F.col("plain_cents").cast("double") / denom).alias("mean_plain"),
        (F.col("wins_cents").cast("double") / denom).alias("mean_winsorized"),
    )


# epoch-2 synthesis for the table-diff audit: deterministic hash-selected
# mutations of orders (same derivation both engines, so the DIFF REPORT
# itself is the oracle-checked artifact):
#   - rows with md5(orderkey) % 19 == 0 get totalprice + 1.00 (changed)
#   - rows with md5(orderkey) % 23 == 0 are dropped (removed)
#   - every orderkey + 10^12 with % 31 == 0 is inserted (added) — the
#     offset sits far above any reachable dense orderkey (10^12 rows of
#     orders ≈ 100+ PB), so synthesized keys can never collide with real
#     ones and fan out the full-outer join at large scale factors
_DIFF_H = (
    "CAST(CONV(SUBSTRING(MD5(CAST(o_orderkey AS STRING)), 1, 8), 16, 10)"
    " AS BIGINT)"
)
_DIFF_H_DUCK = (
    "list_reduce(list_transform(range(1, 9),"
    " j -> CAST(strpos('0123456789abcdef',"
    " substr(md5(CAST(o_orderkey AS VARCHAR)), j, 1)) - 1 AS BIGINT)),"
    " (a, b) -> a * 16 + b)"
)


@register(
    "profile_table_diff",
    oracle=f"""
    WITH v1 AS (SELECT o_orderkey, o_custkey,
                       CAST(o_totalprice AS DECIMAL(18,2)) AS price,
                       o_orderstatus FROM orders),
    v2 AS (
        SELECT o_orderkey, o_custkey,
               CASE WHEN {_DIFF_H_DUCK} % 19 = 0
                    THEN price + CAST(1 AS DECIMAL(18,2)) ELSE price END
                   AS price,
               o_orderstatus
        FROM v1 WHERE {_DIFF_H_DUCK} % 23 <> 0
        UNION ALL
        SELECT o_orderkey + 1000000000000, o_custkey, price, o_orderstatus
        FROM v1 WHERE {_DIFF_H_DUCK} % 31 = 0
    ),
    j AS (
        SELECT COALESCE(v1.o_orderkey, v2.o_orderkey) AS k,
               v1.o_orderkey IS NULL AS added,
               v2.o_orderkey IS NULL AS removed,
               v1.o_orderkey IS NOT NULL AND v2.o_orderkey IS NOT NULL
                   AND (v1.price <> v2.price
                        OR v1.o_custkey <> v2.o_custkey
                        OR v1.o_orderstatus <> v2.o_orderstatus) AS changed,
               v1.price <> v2.price AS price_changed
        FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(CASE WHEN added THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
           CAST(SUM(CASE WHEN removed THEN 1 ELSE 0 END) AS BIGINT)
               AS n_removed,
           CAST(SUM(CASE WHEN changed THEN 1 ELSE 0 END) AS BIGINT)
               AS n_changed,
           CAST(SUM(CASE WHEN COALESCE(price_changed, FALSE)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_price_changed,
           CAST(SUM(CASE WHEN NOT added AND NOT removed AND NOT changed
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_identical
    FROM j
    """,
    tags=("agg", "profiling", "diff"),
)
def profile_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-version diff audit: given two versions of a keyed table,
    classify every key as added / removed / changed / identical and
    count which columns changed — the migration-verification report
    beside agg_table_checksum (the checksum DETECTS a difference; the
    diff EXPLAINS it). Version 2 is synthesized from orders with
    deterministic hash-selected mutations, so the oracle replays the
    mutation AND the diff.

    Plan shape: one FULL OUTER join on the key (AQE sizes it; at 100 TB
    both versions pre-bucket on the key → zero-exchange SMJ, the
    storage.py layout) and one global aggregate — no per-column jobs;
    column comparisons are projection expressions. Decimal-quantized
    price comparison avoids float equality."""
    o = load(spark, sf_dir, "orders")
    h = F.expr(_DIFF_H)
    v1 = o.select(
        "o_orderkey",
        "o_custkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        "o_orderstatus",
        h.alias("h"),
    )
    v2 = (
        v1.filter(F.col("h") % 23 != 0)
        .select(
            "o_orderkey",
            "o_custkey",
            F.when(
                F.col("h") % 19 == 0,
                F.col("price") + F.lit(1).cast("decimal(18,2)"),
            )
            .otherwise(F.col("price"))
            .alias("price"),
            "o_orderstatus",
        )
        .unionByName(
            v1.filter(F.col("h") % 31 == 0).select(
                (F.col("o_orderkey") + 1000000000000).alias("o_orderkey"),
                "o_custkey",
                "price",
                "o_orderstatus",
            )
        )
    )
    a, b = v1.drop("h").alias("a"), v2.alias("b")
    j = a.join(b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer")
    added = F.col("a.o_orderkey").isNull()
    removed = F.col("b.o_orderkey").isNull()
    changed = (
        F.col("a.o_orderkey").isNotNull()
        & F.col("b.o_orderkey").isNotNull()
        & (
            (F.col("a.price") != F.col("b.price"))
            | (F.col("a.o_custkey") != F.col("b.o_custkey"))
            | (F.col("a.o_orderstatus") != F.col("b.o_orderstatus"))
        )
    )
    price_changed = F.coalesce(
        F.col("a.price") != F.col("b.price"), F.lit(False)
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(added.cast("bigint")).alias("n_added"),
        F.sum(removed.cast("bigint")).alias("n_removed"),
        F.sum(changed.cast("bigint")).alias("n_changed"),
        F.sum(price_changed.cast("bigint")).alias("n_price_changed"),
        F.sum(
            (~added & ~removed & ~changed).cast("bigint")
        ).alias("n_identical"),
    )


_SKEW_KEYS = [
    ("lineitem.l_orderkey", "lineitem", "l_orderkey"),
    ("lineitem.l_partkey", "lineitem", "l_partkey"),
    ("lineitem.l_suppkey", "lineitem", "l_suppkey"),
    ("orders.o_custkey", "orders", "o_custkey"),
    ("events.user_id", "events", "user_id"),
]


def _skew_oracle() -> str:
    branches = []
    for name, tbl, col in _SKEW_KEYS:
        branches.append(f"""
    SELECT '{name}' AS join_key,
           CAST(SUM(c) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(MAX(c) AS BIGINT) AS max_key_rows,
           CAST(MAX(c) * COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
               AS skew_factor,
           CAST(substr(MAX(lpad(CAST(c AS VARCHAR), 12, '0')
                            || '|' || lpad(CAST(k AS VARCHAR), 20, '0')),
                       14) AS BIGINT) AS hottest_key
    FROM (SELECT {col} AS k, COUNT(*) AS c FROM {tbl} GROUP BY 1)
        """)
    return " UNION ALL ".join(f"({b})" for b in branches)


@register(
    "profile_join_skew",
    oracle=_skew_oracle(),
    tags=("agg", "profiling", "skew"),
)
def profile_join_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew report across the schema's shuffle keys — the
    diagnostic a pipeline runs BEFORE sizing a cluster: rows, distinct
    keys, the hottest key and its row count, and the skew factor
    (max-key rows ÷ mean rows per key; 1.0 = uniform, large = salting /
    AQE-skew-join territory — the knob DEPLOY.md maps). Completes the
    profiling trio: per-column stats, cross-table integrity, shuffle-key
    skew.

    Plan shape: one map-side-combinable (key, count) aggregate per
    listed key, then a 1-row rollup — the shuffle carries distinct keys
    only, and the rollup's hottest-key pick is an order-independent MAX
    over a count-padded encoding (count desc, then key desc —
    deterministic on ties). Exactness: integer counts; the skew factor
    is one IEEE division of exact integer products."""
    outs = []
    for name, tbl, col in _SKEW_KEYS:
        t = load(spark, sf_dir, tbl)
        vc = t.groupBy(F.col(col).alias("k")).agg(
            F.count(F.lit(1)).alias("c")
        )
        enc = F.concat(
            F.lpad(F.col("c").cast("string"), 12, "0"),
            F.lit("|"),
            F.lpad(F.col("k").cast("string"), 20, "0"),
        )
        outs.append(
            vc.agg(
                F.sum("c").alias("n_rows"),
                F.count(F.lit(1)).alias("n_keys"),
                F.max("c").alias("max_key_rows"),
                (
                    (F.max("c") * F.count(F.lit(1))).cast("double")
                    / F.sum("c").cast("double")
                ).alias("skew_factor"),
                F.substring(F.max(enc), 14, 20).cast("bigint").alias(
                    "hottest_key"
                ),
            ).select(
                F.lit(name).alias("join_key"),
                "n_rows",
                "n_keys",
                "max_key_rows",
                "skew_factor",
                "hottest_key",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


@register(
    "agg_srm_audit",
    oracle="""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    asg AS (
        SELECT user_id,
               list_reduce(list_transform(range(1, 9),
                   j -> CAST(strpos('0123456789abcdef',
                        substr(md5(CAST(user_id AS VARCHAR)), j, 1)) - 1
                        AS BIGINT)), (a, b) -> a * 16 + b) % 2 AS arm
        FROM u
    ),
    counts AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_control,
               CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_treatment
        FROM asg
    )
    SELECT n, n_control, n_treatment,
           (CAST(n_control AS DOUBLE) - CAST(n AS DOUBLE) / 2.0)
             * (CAST(n_control AS DOUBLE) - CAST(n AS DOUBLE) / 2.0)
             / (CAST(n AS DOUBLE) / 2.0)
           + (CAST(n_treatment AS DOUBLE) - CAST(n AS DOUBLE) / 2.0)
             * (CAST(n_treatment AS DOUBLE) - CAST(n AS DOUBLE) / 2.0)
             / (CAST(n AS DOUBLE) / 2.0) AS chi2,
           (CAST(n_control AS DOUBLE) - CAST(n AS DOUBLE) / 2.0)
             * (CAST(n_control AS DOUBLE) - CAST(n AS DOUBLE) / 2.0)
             / (CAST(n AS DOUBLE) / 2.0)
           + (CAST(n_treatment AS DOUBLE) - CAST(n AS DOUBLE) / 2.0)
             * (CAST(n_treatment AS DOUBLE) - CAST(n AS DOUBLE) / 2.0)
             / (CAST(n AS DOUBLE) / 2.0) > 3.841 AS srm_detected
    FROM counts
    """,
    tags=("agg", "experiment", "srm"),
)
def agg_srm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch audit for a hash-based 50/50 experiment
    assignment (arm = md5(user) % 2): the chi-square goodness-of-fit
    readout every experimentation pipeline gates on BEFORE trusting an
    A/B metric (a biased assignment invalidates agg_ab_test_zscore's
    effect readout — these two rows are the pair). Deterministic
    assignment means the audit itself is replayable: same hash, same
    arms, same chi2 in both engines.

    Plan shape: one distinct over users (map-combined), one md5 per
    user, one global aggregate — 1-row output. Exactness: counts are
    exact ints; chi2 is a fixed tree of IEEE ops on bit-identical
    doubles, so even the boolean gate (χ² > 3.841, the 95% critical
    value at df=1) hash-matches."""
    e = load(spark, sf_dir, "events")
    u = e.select("user_id").distinct()
    arm = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
        ).cast("bigint")
        % 2
    )
    counts = u.select(arm.alias("arm")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_control"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_treatment"),
    )
    nd = F.col("n").cast("double")
    exp = nd / F.lit(2.0)
    chi2 = (
        (F.col("n_control").cast("double") - exp)
        * (F.col("n_control").cast("double") - exp)
        / exp
        + (F.col("n_treatment").cast("double") - exp)
        * (F.col("n_treatment").cast("double") - exp)
        / exp
    )
    return counts.select(
        "n",
        "n_control",
        "n_treatment",
        chi2.alias("chi2"),
        (chi2 > F.lit(3.841)).alias("srm_detected"),
    )
