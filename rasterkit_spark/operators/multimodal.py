"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side machinery — schemas, Arrow batch shapes, ``mapInPandas``
signatures, partitioning — is real and tested.  The actual codec work
(JPEG/PNG decode, audio resample, video frame extraction) needs wheels that
are not in this container, so each codec call sits behind an import-try:
with the wheel present it runs; without it, a **deterministic fake** decode
(documented below) keeps the pipeline executable end-to-end, and
``strict=True`` surfaces ``NotImplementedError`` instead.

Fake-decode contract (deterministic, schema-faithful):
  - image: the first 8 bytes are read as two uint32-LE (w, h) — the fixture
    media writer emits exactly that header — and the "pixels" are the
    md5-seeded gradient used by the raster fixtures.
  - audio: byte length / 2 = sample count at 16 kHz mono int16.
  - video: byte length / 4096 = frame count.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (ArrayType, BinaryType, DoubleType, FloatType,
                               IntegerType, LongType, StringType, StructField,
                               StructType)

try:  # real image codec, if present
    from PIL import Image  # type: ignore

    _HAVE_PIL = True
except ImportError:  # pragma: no cover
    _HAVE_PIL = False

IMAGE_META_SCHEMA = StructType([
    StructField("media_ref", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("decode_ok", IntegerType()),
])


def pack_fake_image(width: int, height: int) -> bytes:
    """Fixture-side binary payload: uint32-LE (w, h) header + opaque body."""
    body = hashlib.md5(f"{width}x{height}".encode()).digest()
    return struct.pack("<II", width, height) + body


def decode_image_meta(media: DataFrame, blob_col: str = "blob",
                      strict: bool = False) -> DataFrame:
    """Extract (width, height, channels) per image blob.

    Real path: PIL when importable.  Fake path: header parse per the
    fake-decode contract.  ``strict=True`` raises instead of faking."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                blob = bytes(getattr(r, blob_col))
                if _HAVE_PIL:
                    import io
                    try:
                        img = Image.open(io.BytesIO(blob))
                        rows.append((r.media_ref, img.width, img.height,
                                     len(img.getbands()), 1))
                        continue
                    except Exception:
                        pass
                if strict:
                    raise NotImplementedError(
                        "image decode requires PIL/opencv (absent in this "
                        "container); run with strict=False for the "
                        "deterministic fake-decode path")
                if len(blob) >= 8:
                    w, h = struct.unpack("<II", blob[:8])
                    rows.append((r.media_ref, int(w), int(h), 1, 0))
                else:
                    rows.append((r.media_ref, 0, 0, 0, 0))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              IMAGE_META_SCHEMA.fields])

    return media.mapInPandas(gen, IMAGE_META_SCHEMA)


FEATURE_SCHEMA = StructType([
    StructField("media_ref", StringType()),
    StructField("feature", ArrayType(FloatType())),
])


def image_features(media: DataFrame, blob_col: str = "blob",
                   dim: int = 16) -> DataFrame:
    """Feature-extraction plumbing: blob → fixed-dim float vector.

    Real extractors (CNN embeddings etc.) are out-of-container; the
    deterministic stand-in hashes the blob into ``dim`` floats so the
    downstream similarity operators (operators/similarity.py) can be tested
    against this output shape for real."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                blob = bytes(getattr(r, blob_col))
                d = hashlib.sha256(blob).digest()
                reps = (dim * 4 + len(d) - 1) // len(d)
                raw = (d * reps)[: dim * 4]
                vec = np.frombuffer(raw, dtype=np.uint32).astype(np.float32)
                vec = (vec / np.float32(2 ** 32)) * 2 - 1
                rows.append((r.media_ref, [float(x) for x in vec]))
            yield pd.DataFrame(rows, columns=["media_ref", "feature"])

    return media.mapInPandas(gen, FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType([
    StructField("media_ref", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("blob", BinaryType()),
])


def resize_images(media: DataFrame, target_w: int, target_h: int,
                  blob_col: str = "blob", strict: bool = False) -> DataFrame:
    """Resize plumbing.  Without PIL it re-packs the fake header with the
    new dims (strict=True raises NotImplementedError)."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                blob = bytes(getattr(r, blob_col))
                if _HAVE_PIL:
                    import io
                    img = Image.open(io.BytesIO(blob)).resize((target_w, target_h))
                    out = io.BytesIO()
                    img.save(out, format="PNG")
                    rows.append((r.media_ref, target_w, target_h,
                                 bytearray(out.getvalue())))
                    continue
                if strict:
                    raise NotImplementedError(
                        "image resize requires PIL (absent); strict=False "
                        "uses the fake-header repack")
                rows.append((r.media_ref, target_w, target_h,
                             bytearray(pack_fake_image(target_w, target_h))))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              RESIZE_SCHEMA.fields])

    return media.mapInPandas(gen, RESIZE_SCHEMA)


FRAME_SAMPLE_SCHEMA = StructType([
    StructField("media_ref", StringType()),
    StructField("frame_idx", LongType()),
    StructField("frame", BinaryType()),
])


def sample_video_frames(media: DataFrame, every_n: int = 10,
                        blob_col: str = "blob",
                        strict: bool = False) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame (the row
    explosion and batch shape are the real thing; frame bytes are fake
    4096-byte slices without a video codec wheel)."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                blob = bytes(getattr(r, blob_col))
                if strict:
                    raise NotImplementedError(
                        "video decode requires an out-of-container codec; "
                        "strict=False slices fake frames")
                n_frames = max(len(blob) // 4096, 1)
                for i in range(0, n_frames, every_n):
                    frame = blob[i * 4096:(i + 1) * 4096] or blob[:4096]
                    rows.append((r.media_ref, i, bytearray(frame)))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              FRAME_SAMPLE_SCHEMA.fields])

    return media.mapInPandas(gen, FRAME_SAMPLE_SCHEMA)
