"""Testdata catalog: load the driver-generated parquet tables.

Tables (see /root/repo/TESTDATA.md): region nation customer supplier part
orders lineitem events documents embeddings — one parquet file each under a
scale-factor directory.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to always broadcast in joins, even at 100 TB
# fact scale (region/nation are fixed-size; customer/supplier/part grow with
# SF but stay orders of magnitude below the facts — we still broadcast-hint
# only the fixed-size ones and let AQE decide for the rest).
BROADCAST_ALWAYS = ("region", "nation")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame (schema comes from parquet).

    events.ts is normalized to TIMESTAMP (with local/session timezone),
    whatever physical layout the parquet carries:

    - timestamp[us] without timezone → Spark reads TIMESTAMP_NTZ, which
      ``withWatermark`` rejects (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE).
      Cast to TIMESTAMP: under the UTC session timezone the wall-clock
      values are unchanged, so DuckDB oracle parity (tz-naive) holds.
    - legacy TIMESTAMP(NANOS) read as a nanos bigint
      (spark.sql.legacy.parquet.nanosAsLong) → floor to micros, exactly
      what DuckDB does on read.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # a session built outside get_spark (e.g. the driver's own) may
        # reject TIMESTAMP(NANOS) parquet without this legacy conf — it is
        # runtime-settable, so set it defensively here
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    for field in df.schema.fields:
        if field.name != "ts":
            continue
        kind = field.dataType.simpleString()
        if kind == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif kind == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for spark.sql-based queries)."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
