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


# the stub decoder derives features from the md5 hex digest; DuckDB can
# replay that byte-for-byte, so even the Python mapInPandas stage gets a
# full value oracle: byte i of the digest = hex pair (2i, 2i+1) scaled /256.
# Features are emitted as scalar feat_0..feat_7 columns (not array<double>):
# the driver canonicalizes results with pandas sort_values over every column,
# which cannot hash list cells.
_HEXB = (
    "(CAST(strpos('0123456789abcdef', substr(md5(text), {a}, 1)) - 1 AS BIGINT)"
    " * 16 + strpos('0123456789abcdef', substr(md5(text), {b}, 1)) - 1)"
)
_FEAT_SQL = ", ".join(
    _HEXB.format(a=2 * i + 1, b=2 * i + 2) + f" / 256.0 AS feat_{i}"
    for i in range(8)
)


@register(
    "multimodal_decode_features",
    oracle=f"""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS content_hash,
           {_FEAT_SQL},
           'ok' AS decode_status
    FROM documents
    """,
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


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH probed AS (
        SELECT doc_id, md5(text) AS h,
               (octet_length(encode(text)) // 256) % 4 + 1 AS n_frames
        FROM documents
    )
    SELECT doc_id, i.i AS frame_idx, md5(h || ':' || CAST(i.i AS VARCHAR)) AS frame_hash
    FROM probed, (SELECT unnest(range(0, 4)) AS i) i
    WHERE i.i < n_frames
    """,
    tags=("multimodal", "mapinpandas", "frame-sample"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling over binary payloads: one row in, 1-4 frame rows out
    (data-dependent fan-out through mapInPandas — the shape a video
    pipeline's decode+sample stage needs). Frame hashes are md5-derived in
    the stub, so DuckDB replays the exact output."""
    from stateflow_spark.functions.multimodal import frame_sample

    d = load(spark, sf_dir, "documents")
    blobs = d.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    return frame_sample(blobs)
