"""SQL-string interface: catalog.register_views + spark.sql must agree with
the DataFrame builders — a user of the engine can write plain ANSI SQL
against the registered views and get identical results."""

from __future__ import annotations

from stateflow_spark.catalog import register_views
from stateflow_spark.queries import REGISTRY
from tests.conftest import SF_DIR


def _rows(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def test_sql_matches_dataframe_q1(spark):
    register_views(spark, SF_DIR)
    sql = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        GROUP BY l_returnflag, l_linestatus
        """
    )
    df = REGISTRY["q1_pricing_summary"].fn(spark, SF_DIR).select(
        "l_returnflag", "l_linestatus", "sum_qty", "count_order"
    )
    assert _rows(sql) == _rows(df)


def test_sql_join_matches_dataframe_q4(spark):
    register_views(spark, SF_DIR)
    sql = spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-07-01'
          AND o_orderdate <  TIMESTAMP '1997-10-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority
        """
    )
    df = REGISTRY["q4_order_priority"].fn(spark, SF_DIR)
    assert _rows(sql) == _rows(df)
