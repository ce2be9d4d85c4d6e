"""Multimodal-column queries: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the *decode* step is a
deterministic fake (documented stub) — but the Spark-side plumbing is real:
binary columns, typed metadata structs, Arrow-batched mapInPandas with an
explicit output schema, and partition-size control for large blobs. See
stateflow_spark/functions/multimodal.py for the pipeline pieces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stateflow_spark.catalog import load
from stateflow_spark.queries.common import register


@register(
    "multimodal_binary_metadata",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS content_hash,
           ascii(substr(text, 1, 1)) AS first_byte,
           octet_length(encode(text)) // 256 AS size_bucket
    FROM documents
    """,
    tags=("multimodal", "binary"),
)
def multimodal_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Treat content as an opaque binary column and compute typed metadata
    JVM-side (length, hash, magic byte, size bucket) — the always-cheap
    pre-decode pass that prunes work before any Python decode touches data."""
    d = load(spark, sf_dir, "documents")
    blob = F.encode(F.col("text"), "utf-8")
    return d.select(
        "doc_id",
        F.octet_length(blob).alias("n_bytes"),
        F.md5("text").alias("content_hash"),
        F.ascii(F.substring("text", 1, 1)).alias("first_byte"),
        F.floor(F.octet_length(blob) / 256).cast("bigint").alias("size_bucket"),
    )


@register(
    "multimodal_decode_features",
    oracle=None,  # the decode stage is Python (mapInPandas); rows-only check.
    # tests/test_multimodal.py asserts the feature values directly.
    tags=("multimodal", "mapinpandas"),
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decode/feature-extract stage: Arrow-batched mapInPandas over
    binary payloads with an explicit output schema. The 'decoder' is the
    deterministic stub from functions/multimodal.py (real codecs are not in
    this container); swap `fake_decode_features` for a real one and nothing
    else changes."""
    from stateflow_spark.functions.multimodal import decode_features

    d = load(spark, sf_dir, "documents")
    blobs = d.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.col("n_chars").cast("bigint").alias("n_chars"),
        ).alias("meta"),
    )
    return decode_features(blobs)
