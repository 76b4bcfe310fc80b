"""Multimodal column plumbing (extension surface).

Treats image/audio/video payloads as opaque ``binary`` columns with typed
metadata, processed by Arrow-batched ``mapInPandas`` stages.  The Spark-side
machinery — schemas, partitioning, UDF signatures, batch shapes — is real
and tested; the actual codec work (JPEG decode, audio resample, video frame
extraction) is **stubbed behind ``_decode_bytes``** because no media
libraries exist in this container: with Pillow/torchaudio/av installed, only
that one function changes.  The stub is deterministic (content-hash derived)
so pipelines are testable end-to-end.

Scale notes: media rows are large and skewed — repartition by a size-aware
key before heavy stages (``repartition_for_media``), keep batches small via
``spark.sql.execution.arrow.maxRecordsPerBatch``, and never collect payloads
to the driver.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Canonical multimodal record layout: payload + typed metadata.
MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("media_type", T.StringType()),   # image | audio | video
    T.StructField("payload", T.BinaryType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.IntegerType()),
    T.StructField("codec", T.StringType()),
])

FEATURE_DIM = 16


def _decode_bytes(payload: bytes, media_type: str) -> np.ndarray:
    """STUB codec: deterministic pseudo-decode.

    Real implementation would be, e.g.::

        from PIL import Image;  img = Image.open(io.BytesIO(payload))

    Without media libs we derive a stable ``FEATURE_DIM``-float vector from
    the payload's sha256 — content-determined, so dedup/feature pipelines
    behave like the real thing shape-wise.  Raises on missing payload the
    way a real decoder raises on corrupt bytes.
    """
    if payload is None:
        raise ValueError("cannot decode empty payload")
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer((digest * ((FEATURE_DIM * 4) // len(digest) + 1))[: FEATURE_DIM * 4], dtype=np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


def synth_media(
    df: DataFrame, id_col: str, media_type: str = "image"
) -> DataFrame:
    """Deterministic test fixture: synthesize a binary payload per row from
    the id (stands in for reading real media files)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit(media_type).alias("media_type"),
        F.sha2(F.col(id_col).cast("string"), 256).cast("binary").alias("payload"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        F.lit(0).alias("duration_ms"),
        F.lit("stub").alias("codec"),
    )


FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("features", T.ArrayType(T.FloatType())),
    T.StructField("payload_bytes", T.LongType()),
])


def extract_features(df: DataFrame) -> DataFrame:
    """Decode + featurize media payloads via ``mapInPandas``.

    Arrow streams column batches into Python; each batch is processed
    vectorized and yielded back — payloads never round-trip through the
    driver.  Output drops the payload (feature tables are small); join back
    on ``media_id`` when the payload is needed again.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_bytes(p, t).tolist()
                for p, t in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "features": feats,
                "payload_bytes": [len(p) for p in pdf["payload"]],
            })

    return df.mapInPandas(run, FEATURES_SCHEMA)


RESIZE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
])


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stage (stub transform: passthrough payload, new dims).

    Real codec drop-in replaces the body; the Spark contract — binary in,
    binary out, metadata updated — is what downstream stages rely on."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "payload": pdf["payload"],      # stub: no pixel transform
                "width": width,
                "height": height,
            })

    return df.filter(F.col("media_type") == "image").mapInPandas(run, RESIZE_SCHEMA)


FRAMES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame_payload", T.BinaryType()),
])


def sample_frames(df: DataFrame, n_frames: int = 3) -> DataFrame:
    """Frame-sampling stage for video rows: one output row per sampled frame
    (fan-out inside ``mapInPandas`` — output batches may be larger than
    input batches, which Arrow handles natively).  Stub derives frame bytes
    from (payload, index)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    payloads.append(
                        hashlib.sha256(bytes(payload) + i.to_bytes(4, "little")).digest()
                    )
            yield pd.DataFrame({
                "media_id": ids, "frame_idx": idxs, "frame_payload": payloads,
            })

    return df.filter(F.col("media_type") == "video").mapInPandas(run, FRAMES_SCHEMA)


def repartition_for_media(df: DataFrame, target_partitions: int) -> DataFrame:
    """Spread large-payload rows evenly before decode stages: hash-repartition
    on ``media_id`` — media arrival order correlates with size (same shoot,
    same camera), and a size-skewed partition OOMs the Arrow worker."""
    return df.repartition(target_partitions, "media_id")
