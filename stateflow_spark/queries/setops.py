"""Set operations (SURVEY.md §2.C "Set ops"). The reference only unions
streams (op #20); here we declare the full relational set-op family."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stateflow_spark.catalog import load
from stateflow_spark.queries.common import register


def _custkeys_with_status(spark, sf_dir, status):
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == status)
        .select(F.col("o_custkey").alias("custkey"))
    )


@register(
    "setops_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("setops",),
)
def setops_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics): customers with both open+filled orders."""
    return _custkeys_with_status(spark, sf_dir, "O").intersect(
        _custkeys_with_status(spark, sf_dir, "F")
    )


@register(
    "setops_except",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("setops",),
)
def setops_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customers with open orders and no filled ones."""
    return _custkeys_with_status(spark, sf_dir, "O").subtract(
        _custkeys_with_status(spark, sf_dir, "F")
    )


@register(
    "setops_union_distinct",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
    tags=("setops",),
)
def setops_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): building-segment customers ∪ pending-order customers."""
    a = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("custkey"))
    )
    return a.union(_custkeys_with_status(spark, sf_dir, "P")).distinct()


@register(
    "setops_union_all_counts",
    oracle="""
    SELECT src, COUNT(*) AS n FROM (
        SELECT 'open'   AS src, o_custkey FROM orders WHERE o_orderstatus = 'O'
        UNION ALL
        SELECT 'filled' AS src, o_custkey FROM orders WHERE o_orderstatus = 'F'
    )
    GROUP BY src
    """,
    tags=("setops",),
)
def setops_union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics) preserved through aggregation."""
    a = _custkeys_with_status(spark, sf_dir, "O").withColumn("src", F.lit("open"))
    b = _custkeys_with_status(spark, sf_dir, "F").withColumn("src", F.lit("filled"))
    return (
        a.unionByName(b)
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "setops_intersect_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("setops",),
)
def setops_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics): per-key multiplicity is the MIN of the
    two sides' counts — duplicates survive, unlike INTERSECT."""
    return _custkeys_with_status(spark, sf_dir, "O").intersectAll(
        _custkeys_with_status(spark, sf_dir, "F")
    )


@register(
    "setops_except_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("setops",),
)
def setops_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics): per-key multiplicity is left count minus
    right count, floored at zero."""
    return _custkeys_with_status(spark, sf_dir, "O").exceptAll(
        _custkeys_with_status(spark, sf_dir, "F")
    )
