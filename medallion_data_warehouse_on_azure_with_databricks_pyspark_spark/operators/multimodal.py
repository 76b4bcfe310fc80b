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
import zlib
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

    ``codec="pil"`` is the Pillow path: decode, downsample to a 4×4
    grayscale patch, emit normalized pixel intensities — raising on
    corrupt bytes like any decoder.  ``codec="png"`` is the same real
    decode→resample→normalize pipeline through the pure-stdlib PNG
    decoder below (:func:`_decode_png` — zlib + spec filters, no media
    library), so the genuine-decode lane executes even in media-less
    containers.  ``codec="stub"`` derives a stable vector from the
    payload's sha256 (content-determined, so dedup / feature pipelines
    behave like the real thing shape-wise) and is the deterministic choice
    for oracle-checked runs.  ``codec="auto"`` picks ``pil`` when Pillow
    is installed, else ``stub``.
    """
    if payload is None:
        raise ValueError("cannot decode empty payload")
    codec = resolve_codec(codec, media_type)
    if codec == "pil":
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(bytes(payload))).convert("L").resize((4, 4))
        return (np.asarray(img, dtype=np.float32) / 255.0).reshape(FEATURE_DIM)
    if codec == "png":
        arr = _decode_png(bytes(payload))
        patch = _box_resize(arr, 4, 4)
        return (patch.astype(np.float32) / 255.0).reshape(FEATURE_DIM)
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer((digest * ((FEATURE_DIM * 4) // len(digest) + 1))[: FEATURE_DIM * 4], dtype=np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


# ---------------------------------------------------------------------------
# Pure-stdlib PNG codec (public spec, RFC 2083): lets the real
# decode/resize lane run in containers without any media library.
# Supports 8-bit grayscale (color type 0), all five scanline filters on
# decode, filter 0 on encode; CRC-verified chunk walk.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        len(body).to_bytes(4, "big")
        + tag
        + body
        + (zlib.crc32(tag + body) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def _encode_png(arr: np.ndarray) -> bytes:
    """Encode an (H, W) uint8 array as an 8-bit grayscale PNG (filter 0)."""
    h, w = arr.shape
    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, 0, 0, 0, 0])        # bit depth 8, gray, deflate, adaptive, no interlace
    )
    raw = b"".join(b"\x00" + arr[y].astype(np.uint8).tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def _decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit grayscale PNG to an (H, W) uint8 array.

    Spec-faithful for the supported subset: signature + CRC verification
    on every chunk, multi-IDAT concatenation, and full reconstruction of
    all five scanline filters (None/Sub/Up/Average/Paeth) — not just the
    filter our encoder happens to write."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = None
    idat = b""
    while pos < len(payload):
        if pos + 12 > len(payload):
            raise ValueError("truncated PNG chunk")
        length = int.from_bytes(payload[pos:pos + 4], "big")
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk body")
        crc = int.from_bytes(payload[pos + 8 + length:pos + 12 + length], "big")
        if (zlib.crc32(tag + body) & 0xFFFFFFFF) != crc:
            raise ValueError(f"PNG CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            width = int.from_bytes(body[0:4], "big")
            height = int.from_bytes(body[4:8], "big")
            bit_depth, color_type = body[8], body[9]
            if (bit_depth, color_type) != (8, 0):
                raise ValueError(
                    "unsupported PNG: only 8-bit grayscale (type 0)"
                )
            if body[12] != 0:
                raise ValueError("unsupported PNG: interlaced")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(idat)
    stride = width + 1
    if len(raw) != stride * height:
        raise ValueError("PNG pixel data size mismatch")
    out = np.zeros((height, width), dtype=np.uint8)
    prev = np.zeros(width, dtype=np.int32)
    for y in range(height):
        line = raw[y * stride:(y + 1) * stride]
        ftype, data = line[0], np.frombuffer(line[1:], dtype=np.uint8).astype(np.int32)
        cur = np.empty(width, dtype=np.int32)
        if ftype == 0:                      # None
            cur[:] = data
        elif ftype == 2:                    # Up
            cur[:] = (data + prev) & 0xFF
        elif ftype in (1, 3, 4):            # Sub / Average / Paeth: sequential
            for x in range(width):
                a = cur[x - 1] if x > 0 else 0          # left
                b = prev[x]                              # up
                c = prev[x - 1] if x > 0 else 0          # up-left
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (data[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def _box_resize(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Box (area-average) downsample to (out_h, out_w): each output pixel
    is the mean of its source bin — deterministic integer-free float math,
    truncated back to uint8."""
    h, w = arr.shape
    ys = (np.arange(out_h + 1) * h) // out_h
    xs = (np.arange(out_w + 1) * w) // out_w
    out = np.empty((out_h, out_w), dtype=np.uint8)
    for i in range(out_h):
        for j in range(out_w):
            block = arr[ys[i]:max(ys[i + 1], ys[i] + 1),
                        xs[j]:max(xs[j + 1], xs[j] + 1)]
            out[i, j] = int(block.mean())
    return out


def _png_pixels(seed: int, width: int = 8, height: int = 8) -> np.ndarray:
    digest = hashlib.sha256(seed.to_bytes(8, "little", signed=True)).digest()
    n_px = width * height
    pixels = (digest * (n_px // len(digest) + 1))[:n_px]
    return np.frombuffer(pixels, dtype=np.uint8).reshape(height, width).copy()


def synth_media_png(df: DataFrame, id_col: str, width: int = 8, height: int = 8) -> DataFrame:
    """Test fixture for the stdlib real-codec path: one valid grayscale PNG
    per id (content-hash pixels), decodable by :func:`_decode_png`, Pillow,
    or any spec decoder — so ``codec="png"`` exercises genuine
    decode/resample plumbing with zero media-library dependency."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                _encode_png(_png_pixels(int(i), width, height))
                for i in pdf[id_col]
            ]
            yield pd.DataFrame({
                "media_id": pdf[id_col],
                "media_type": "image",
                "payload": payloads,
                "width": width, "height": height, "duration_ms": 0,
                "codec": "png",
            })

    return df.select(F.col(id_col).cast("long")).mapInPandas(run, MEDIA_SCHEMA)


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


def resize_images(
    df: DataFrame, width: int, height: int, codec: str = "stub"
) -> DataFrame:
    """Resize stage: binary in, binary out, metadata updated.

    ``codec="png"`` is a real decode → box-resample → re-encode roundtrip
    through the stdlib PNG codec (output payloads are valid PNGs of the
    new dimensions).  ``codec="stub"`` passes payloads through untouched —
    the deterministic environment-independent lane.  Either way the Spark
    contract downstream stages rely on is identical."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if codec == "png":
                payloads = [
                    _encode_png(_box_resize(_decode_png(bytes(p)), height, width))
                    for p in pdf["payload"]
                ]
            else:
                payloads = pdf["payload"]       # stub: no pixel transform
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "payload": payloads,
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
