"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All queries live in ``stateflow_spark.queries`` (one module per operator
family, SURVEY.md §2); this file just exposes the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q1 pricing summary."""
    from stateflow_spark.queries import REGISTRY

    return REGISTRY["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from stateflow_spark.queries import REGISTRY

    return {name: qd.fn for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query. The driver FAILS oracle-less rows
    (err=no_oracle), so every registered query carries an oracle — even the
    sketch aggregates, which emit exact twins + deterministic bound-check
    booleans against literal TRUEs (aggregates.py:agg_approx_sketches)."""
    from stateflow_spark.queries import REGISTRY

    return {
        name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle is not None
    }
