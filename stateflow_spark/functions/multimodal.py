"""Multimodal column plumbing: binary payload + typed metadata + Arrow-batched
decode/feature-extract via mapInPandas.

The real decoders (PIL/opencv/librosa/ffmpeg) are NOT in this container, so
``fake_decode_features`` is a clearly-marked deterministic stand-in: it
derives pseudo-features purely from the bytes (length, md5-derived values).
The Spark-side contract — schemas, batch iteration, partition sizing — is the
real thing: swapping in a true decoder changes only the body of the batch
function.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Output schema of the decode/feature stage. Fixed and explicit: required by
# mapInPandas, and the thing that keeps the downstream plan stable.
#
# The 8 features are emitted as scalar feat_0..feat_7 doubles rather than one
# array<double> column: scalar columns survive any downstream row-wise
# canonicalization (pandas sort_values chokes on list cells), join/group on
# individual dimensions, and store columnar in parquet. A genuinely wide
# embedding stays an array (see the embeddings table) — 8 named features is
# the "typed metadata" shape.
N_FEATURES = 8
FEAT_COLS = [f"feat_{i}" for i in range(N_FEATURES)]
FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("content_hash", StringType(), False),
        *[StructField(c, DoubleType(), False) for c in FEAT_COLS],
        StructField("decode_status", StringType(), False),
    ]
)


def fake_decode_features(payload: bytes) -> list[float]:
    """DETERMINISTIC STUB for the media decode step (no codecs in container).

    A real implementation would be e.g.::

        img = PIL.Image.open(io.BytesIO(payload))      # decode
        img = img.resize((224, 224))                    # resize
        feat = model(np.asarray(img))                   # feature-extract

    and would raise/flag on corrupt payloads. Here: 8 pseudo-features from
    the md5 digest, scaled to [0, 1) — stable across runs and engines.
    """
    digest = hashlib.md5(payload).digest()
    return [b / 256.0 for b in digest[:8]]


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("frame_hash", StringType(), False),
    ]
)


def fake_frame_count(payload: bytes) -> int:
    """DETERMINISTIC STUB for container probing: 1-4 pseudo-frames derived
    from payload length (a real probe would read the media header)."""
    return (len(payload) // 256) % 4 + 1


def frame_sample(blobs: DataFrame) -> DataFrame:
    """Frame-sampling stage: one input row → N output rows (N data-dependent).

    This is the mapInPandas shape scalar UDFs cannot express — a video
    decoder emitting k sampled frames per clip. The stub derives the frame
    count from payload length and each frame 'content' hash from the
    payload hash + index; a real implementation would seek/decode frames::

        for idx in sample_indices(n_frames(payload), k):
            frame = decode_frame(payload, idx)          # decode + seek
            frame = resize(frame, (224, 224))           # resize
            yield doc_id, idx, frame_bytes

    Input columns: doc_id (long), payload (binary)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_doc, out_idx, out_hash = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                h = hashlib.md5(payload).hexdigest()
                for i in range(fake_frame_count(payload)):
                    out_doc.append(int(doc_id))
                    out_idx.append(i)
                    out_hash.append(
                        hashlib.md5(f"{h}:{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": out_doc, "frame_idx": out_idx, "frame_hash": out_hash}
            )

    return blobs.mapInPandas(batches, FRAME_SCHEMA)


def decode_features(blobs: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature-extract over a binary `payload` column.

    Input columns: doc_id (long), payload (binary), meta (struct).
    mapInPandas (not a scalar UDF) so one Python roundtrip handles the whole
    batch and the decoder may drop/expand rows (corrupt frames, multi-frame
    sampling) without a join back.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "content_hash": payloads.map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                }
            )
            # one pass over the decoded feature lists (not one map per col)
            feats = pd.DataFrame(
                payloads.map(fake_decode_features).tolist(),
                columns=FEAT_COLS,
                index=pdf.index,
            ).astype("float64")
            out[FEAT_COLS] = feats
            out["decode_status"] = "ok"
            yield pd.DataFrame(out)

    return blobs.mapInPandas(batches, FEATURE_SCHEMA)
