"""Accuracy contract for the sketch aggregates: no cross-engine oracle
exists (sketch internals differ per engine), so the driver's rows-only
check is backed by these local bounds against the exact twins."""

from __future__ import annotations

from stateflow_spark.queries import REGISTRY
from tests.conftest import SF_DIR


def test_sketch_error_bounds(spark):
    rows = REGISTRY["agg_approx_sketches"].fn(spark, SF_DIR).collect()
    assert rows, "no groups"
    for r in rows:
        # HLL++ at rsd=2%: allow 3 standard deviations
        rel = abs(r.approx_users - r.exact_users) / r.exact_users
        assert rel <= 0.06, (r.event_type, r.approx_users, r.exact_users)
        # percentile_approx(accuracy=1000) bounds RANK error at 1/1000;
        # translate to a loose value check: approx p50 must sit within
        # the exact p40..p60 band
        import pyspark.sql.functions as F

        from stateflow_spark.catalog import load

        band = (
            load(spark, SF_DIR, "events")
            .filter(F.col("event_type") == r.event_type)
            .agg(
                F.expr("percentile(value, 0.40)").alias("lo"),
                F.expr("percentile(value, 0.60)").alias("hi"),
            )
            .first()
        )
        assert band.lo <= r.approx_p50 <= band.hi, (
            r.event_type, r.approx_p50, band.lo, band.hi,
        )


def test_sketch_determinism(spark):
    """Sketches must be deterministic run-to-run (the driver hashes rows
    twice across rounds): HLL++ and percentile_approx are deterministic
    for a fixed input, unlike sampling-based estimators."""
    a = sorted(map(tuple, REGISTRY["agg_approx_sketches"].fn(spark, SF_DIR).collect()))
    b = sorted(map(tuple, REGISTRY["agg_approx_sketches"].fn(spark, SF_DIR).collect()))
    assert a == b
