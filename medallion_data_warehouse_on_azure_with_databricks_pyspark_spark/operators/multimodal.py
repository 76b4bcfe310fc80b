"""Multimodal column plumbing (extension surface).

Treats image/audio/video payloads as opaque ``binary`` columns with typed
metadata, processed by Arrow-batched ``mapInPandas`` stages.  The Spark-side
machinery — schemas, partitioning, UDF signatures, batch shapes — is real
and tested; the codec layer is **self-upgrading**: when Pillow is importable
(``importlib.util.find_spec("PIL")``) the ``"auto"`` codec decodes real
image bytes, otherwise it falls back to a deterministic content-hash stub
so pipelines remain testable end-to-end in media-less containers.  Pin
``codec="stub"`` for oracle-reproducible runs regardless of environment.

Scale notes: media rows are large and skewed — repartition by a size-aware
key before heavy stages (``repartition_for_media``), keep batches small via
``spark.sql.execution.arrow.maxRecordsPerBatch``, and never collect payloads
to the driver.
"""

from __future__ import annotations

import hashlib
import importlib.util
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


def pil_available() -> bool:
    """True when Pillow is importable — the ``"auto"`` codec's upgrade probe."""
    return importlib.util.find_spec("PIL") is not None


def resolve_codec(codec: str, media_type: str) -> str:
    """Resolve ``"auto"`` to the best available concrete codec."""
    if codec == "auto":
        return "pil" if media_type == "image" and pil_available() else "stub"
    return codec


def _decode_bytes(payload: bytes, media_type: str, codec: str = "stub") -> np.ndarray:
    """Decode a payload to a ``FEATURE_DIM``-float feature vector.

    ``codec="pil"`` is the real path: Pillow decodes the bytes, downsamples
    to a 4×4 grayscale patch and emits normalized pixel intensities —
    raising on corrupt bytes like any decoder.  ``codec="stub"`` derives a
    stable vector from the payload's sha256 (content-determined, so dedup /
    feature pipelines behave like the real thing shape-wise) and is the
    deterministic choice for oracle-checked runs.  ``codec="auto"`` picks
    ``pil`` when Pillow is installed, else ``stub``.
    """
    if payload is None:
        raise ValueError("cannot decode empty payload")
    codec = resolve_codec(codec, media_type)
    if codec == "pil":
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(bytes(payload))).convert("L").resize((4, 4))
        return (np.asarray(img, dtype=np.float32) / 255.0).reshape(FEATURE_DIM)
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


def _bmp_bytes(seed: int, width: int = 8, height: int = 8) -> bytes:
    """A minimal valid 24-bit uncompressed BMP with deterministic
    content-hash pixels — real image bytes any decoder (Pillow included)
    can open, buildable without any media library."""
    row_size = (3 * width + 3) & ~3
    n_px = row_size * height
    digest = hashlib.sha256(seed.to_bytes(8, "little", signed=True)).digest()
    pixels = (digest * (n_px // len(digest) + 1))[:n_px]
    header = (
        b"BM" + (54 + n_px).to_bytes(4, "little") + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
    )
    info = (
        (40).to_bytes(4, "little")
        + width.to_bytes(4, "little") + height.to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + n_px.to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2 + (0).to_bytes(4, "little") * 2
    )
    return header + info + pixels


def synth_media_bmp(df: DataFrame, id_col: str) -> DataFrame:
    """Test fixture for the *real* codec path: one decodable BMP payload per
    id.  Unlike :func:`synth_media` (opaque hash bytes for the stub), these
    payloads survive an actual image decoder, so the same pipeline test runs
    with ``codec="auto"`` in both media-less and Pillow-equipped
    environments."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [_bmp_bytes(int(i)) for i in pdf[id_col]]
            yield pd.DataFrame({
                "media_id": pdf[id_col],
                "media_type": "image",
                "payload": payloads,
                "width": 8, "height": 8, "duration_ms": 0, "codec": "bmp",
            })

    return df.select(F.col(id_col).cast("long")).mapInPandas(run, MEDIA_SCHEMA)


FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("features", T.ArrayType(T.FloatType())),
    T.StructField("payload_bytes", T.LongType()),
])


def extract_features(df: DataFrame, codec: str = "auto") -> DataFrame:
    """Decode + featurize media payloads via ``mapInPandas``.

    Arrow streams column batches into Python; each batch is processed
    vectorized and yielded back — payloads never round-trip through the
    driver.  Output drops the payload (feature tables are small); join back
    on ``media_id`` when the payload is needed again.

    ``codec`` resolves per :func:`resolve_codec` — ``"auto"`` self-upgrades
    to Pillow when installed; pin ``"stub"`` for environment-independent
    deterministic output (the oracle-checked queries do).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_bytes(p, t, codec).tolist()
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
