"""The unsplittable-input fan-out (catalog.load(fanout=...), r12 optimization).

Spark cannot split a parquet scan below one row group, so the single-file/
single-row-group testdata layout scans as ONE task and serializes every
filter/projection/partial aggregate fused into the scan. load(fanout=key)
mitigates per guide §2.5 — but ONLY when the file layout actually offers
fewer row groups than the session has cores, so at production scale the
plan is untouched.
"""

import os

import pytest

from stateflow_spark import catalog
from stateflow_spark.catalog import _scan_parallelism, load

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_scan_parallelism_counts_row_groups(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table({"x": list(range(1000))})
    p = str(tmp_path / "t.parquet")
    pq.write_table(tbl, p, row_group_size=100)  # 10 row groups
    assert _scan_parallelism(p) == 10


def test_scan_parallelism_missing_path_never_fans():
    assert _scan_parallelism("/nonexistent/xyz.parquet") == 4096


def test_fanout_fires_on_single_row_group_layout(spark):
    df = load(spark, SF_DIR, "lineitem", fanout="l_extendedprice")
    plan = _plan(df)
    assert "hashpartitioning(l_extendedprice" in plan


def test_fanout_noop_when_layout_is_splittable_enough(spark, monkeypatch):
    # at scale the footer reports >= cores of row groups → no exchange
    monkeypatch.setattr(catalog, "_scan_parallelism", lambda p, cap=4096: 4096)
    df = load(spark, SF_DIR, "lineitem", fanout="l_extendedprice")
    assert "hashpartitioning" not in _plan(df)


def test_fanout_preserves_rows(spark):
    a = load(spark, SF_DIR, "lineitem").count()
    b = load(spark, SF_DIR, "lineitem", fanout="l_extendedprice").count()
    assert a == b


def test_q1_plan_carries_fanout_exchange(spark):
    from stateflow_spark.queries import REGISTRY

    plan = _plan(REGISTRY["q1_pricing_summary"].fn(spark, SF_DIR))
    assert "hashpartitioning(l_extendedprice" in plan
