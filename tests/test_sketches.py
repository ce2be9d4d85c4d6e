"""Accuracy contract for the sketch aggregates. The raw estimates are
engine-specific (DuckDB's sketch parameters differ), so the registered
query emits exact twins + bound-check booleans for the cross-engine hash
gate; these tests pin the underlying accuracy and determinism on the RAW
estimates, which the driver never sees."""

from __future__ import annotations

from stateflow_spark.queries import REGISTRY
from stateflow_spark.queries.aggregates import approx_sketch_raw
from tests.conftest import SF_DIR


def test_sketch_error_bounds(spark):
    rows = approx_sketch_raw(spark, SF_DIR).collect()
    assert rows, "no groups"
    for r in rows:
        # HLL++ at rsd=2%: allow 3 standard deviations
        rel = abs(r.approx_users - r.exact_users) / r.exact_users
        assert rel <= 0.06, (r.event_type, r.approx_users, r.exact_users)
        # percentile_approx(accuracy=1000) bounds RANK error at 1/1000;
        # translate to a loose value check: approx p50 must sit within
        # the exact p40..p60 band (the same band the registered query
        # reduces to a boolean)
        assert r.p40 <= r.approx_p50 <= r.p60, (
            r.event_type, r.approx_p50, r.p40, r.p60,
        )
        assert r.p98 <= r.approx_p99 <= r.vmax, (
            r.event_type, r.approx_p99, r.p98, r.vmax,
        )


def test_sketch_bound_booleans_true(spark):
    """The registered (driver-hashed) form: every bound-check boolean must
    be TRUE — the oracle emits literal TRUEs, so a false here is exactly
    the hash mismatch the driver would see."""
    rows = REGISTRY["agg_approx_sketches"].fn(spark, SF_DIR).collect()
    assert rows, "no groups"
    for r in rows:
        assert r.hll_within_3sd, r
        assert r.p50_in_band, r
        assert r.p99_in_band, r


def test_sketch_determinism(spark):
    """Sketches must be deterministic run-to-run (the driver hashes rows
    twice across rounds): HLL++ and percentile_approx are deterministic
    for a fixed input, unlike sampling-based estimators."""
    a = sorted(map(tuple, approx_sketch_raw(spark, SF_DIR).collect()))
    b = sorted(map(tuple, approx_sketch_raw(spark, SF_DIR).collect()))
    assert a == b


def test_sketch_rollup_mergeability(spark):
    """The core sketch property: the union of per-day HLL sketches must
    estimate EXACTLY what a single-pass whole-group sketch estimates —
    HLL registers merge by elementwise max, which is associative, so
    pre-aggregated daily sketches lose nothing vs rescanning raw data."""
    import pyspark.sql.functions as F

    from stateflow_spark.catalog import load

    e = load(spark, SF_DIR, "events").select(
        "event_type", F.to_date("ts").alias("day"), "user_id"
    )
    rolled = (
        e.groupBy("event_type", "day")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    )
    direct = e.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    )
    r = {x.event_type: x.est for x in rolled.collect()}
    d = {x.event_type: x.est for x in direct.collect()}
    assert r == d, (r, d)


def test_sketch_rollup_booleans_true(spark):
    rows = REGISTRY["agg_sketch_rollup"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.rollup_within_3sd, r
