"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side machinery — schemas, Arrow batch shapes, ``mapInPandas``
signatures, partitioning — is real and tested.  TIFF, PNG and baseline
JPEG decode for REAL via the in-repo codecs (:mod:`..io.tiffcodec`,
:mod:`..io.pngcodec`, :mod:`..io.jpegcodec` — no wheel needed).  The
remaining codec work (progressive JPEG, audio resample, video frame
extraction) needs wheels that are not in this container, so each such
call sits behind an import-try: with the wheel present it runs; without
it, a **deterministic fake** decode (documented below) keeps the
pipeline executable end-to-end, and ``strict=True`` surfaces
``NotImplementedError`` instead.

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
import zlib
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


def _try_tiff(blob: bytes):
    """REAL decode path for the format this engine owns: TIFF/GeoTIFF via
    io/tiffcodec (no external wheel).  Returns (w, h, channels, pixels) —
    pixels as a (h, w) u8 array for the codec's single-strip form, or
    None when only metadata is recoverable.  Non-TIFF bytes → None."""
    if len(blob) < 8 or blob[:2] not in (b"II", b"MM"):
        return None
    from ..io import tiffcodec as TC
    try:
        ifds, _, _ = TC.read_tiff(blob)
    except (ValueError, struct.error, IndexError):
        # decode-shaped failures on arbitrary sniffed bytes (bad header,
        # truncated IFD, out-of-range offset) → not a TIFF; anything else
        # (MemoryError, I/O) propagates — same policy as the PIL branch
        return None
    if not ifds:
        return None
    ifd = ifds[0]
    w = int(ifd.get(TC.TAG_WIDTH, 0))
    h = int(ifd.get(TC.TAG_HEIGHT, 0))
    spp = int(ifd.get(TC.TAG_SAMPLES_PER_PIXEL, 1))
    pixels = None
    comp = int(ifd.get(TC.TAG_COMPRESSION, 1))
    offs = ifd.entries.get(TC.TAG_STRIP_OFFSETS)
    cnts = ifd.entries.get(TC.TAG_STRIP_BYTE_COUNTS)
    if (comp == 1 and spp == 1 and offs is not None and cnts is not None
            and len(offs.values) == 1 and w * h <= len(blob)):
        off, cnt = int(offs.values[0]), int(cnts.values[0])
        raw = blob[off: off + cnt]
        if len(raw) >= w * h:
            pixels = np.frombuffer(raw[: w * h],
                                   dtype=np.uint8).reshape(h, w)
    return w, h, spp, pixels


def _try_png(blob: bytes):
    """REAL decode path #2: PNG via the stdlib-only io/pngcodec (zlib +
    the five scanline filters — no wheel).  Returns (w, h, channels,
    pixels) with pixels (h, w) gray or (h, w, c); None for non-PNG or
    out-of-codec-scope (interlaced / 16-bit) payloads."""
    from ..io import pngcodec as PC
    if not blob.startswith(PC.PNG_SIGNATURE):
        return None
    try:
        px, meta = PC.read_png(blob)
    except (PC.PngError, zlib.error):
        return None
    return meta["width"], meta["height"], meta["channels"], px


def _try_jpeg(blob: bytes):
    """REAL decode path #3: baseline JPEG via the stdlib+numpy
    io/jpegcodec (Huffman + IDCT — no wheel).  Returns (w, h, channels,
    pixels) with pixels (h, w) gray or (h, w, 3) RGB; None for non-JPEG
    or out-of-codec-scope (progressive / 12-bit) payloads."""
    from ..io import jpegcodec as JC
    if len(blob) < 4 or blob[:2] != b"\xFF\xD8":
        return None
    try:
        px, meta = JC.read_jpeg(blob)
    except (ValueError, KeyError, IndexError, OverflowError, struct.error):
        # decode-shaped failures on JPEG-shaped-but-malformed bytes:
        # JpegError (a ValueError), missing DQT/DHT table ids (KeyError,
        # e.g. MJPEG frames that legitimately omit tables), truncated
        # streams (IndexError / struct.error / frombuffer ValueError),
        # corrupt DC chains overflowing int32 (OverflowError).  Unexpected
        # errors (MemoryError, I/O) propagate — same policy as _try_tiff.
        return None
    return meta["width"], meta["height"], meta["channels"], px


def decode_image_meta(media: DataFrame, blob_col: str = "blob",
                      strict: bool = False) -> DataFrame:
    """Extract (width, height, channels) per image blob.

    Real paths: in-repo TIFF, PNG and baseline-JPEG codecs, then PIL
    when importable.
    Fake path: header parse per the fake-decode contract.  ``strict=True``
    raises instead of faking."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                blob = bytes(getattr(r, blob_col))
                real = _try_tiff(blob) or _try_png(blob) \
                    or _try_jpeg(blob)
                if real is not None:  # real decode, in-repo codecs
                    w, h, spp, _ = real
                    rows.append((r.media_ref, w, h, spp, 1))
                    continue
                if _HAVE_PIL:
                    import io
                    try:
                        img = Image.open(io.BytesIO(blob))
                        rows.append((r.media_ref, img.width, img.height,
                                     len(img.getbands()), 1))
                        continue
                    except (OSError, ValueError):
                        # decode-shaped failures only (corrupt blob /
                        # unknown format) — unexpected errors propagate
                        pass
                if strict:
                    raise NotImplementedError(
                        "image decode beyond TIFF/PNG/baseline-JPEG requires "
                        "PIL/opencv "
                        "(absent in this container); run with strict=False "
                        "for the deterministic fake-decode path")
                if len(blob) >= 8:
                    w, h = struct.unpack("<II", blob[:8])
                    # arbitrary non-fixture bytes can parse to u32 values
                    # past int32 (Arrow overflow → task death); out-of-
                    # range headers are decode failures, not dimensions
                    if w > 0x7FFFFFFF or h > 0x7FFFFFFF:
                        w = h = 0
                    rows.append((r.media_ref, int(w), int(h),
                                 1 if w or h else 0, 0))
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
    """Feature-extraction: blob → fixed-dim float vector.

    TIFF, PNG and baseline-JPEG blobs get a REAL feature: the L1-normalized ``dim``-bin
    intensity histogram of the decoded pixels (a genuine, deterministic
    visual signature — histogram similarity IS a standard near-dup signal,
    and the output feeds operators/similarity.py unmodified).  Other blobs
    fall back to a deterministic hash vector (CNN embedding extractors
    are out-of-container) so the batch shape stays exercised end-to-end."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                blob = bytes(getattr(r, blob_col))
                real = _try_tiff(blob) or _try_png(blob) \
                    or _try_jpeg(blob)
                if real is not None and real[3] is not None:
                    hist, _ = np.histogram(real[3], bins=dim,
                                           range=(0, 256))
                    vec = hist.astype(np.float32)
                    total = vec.sum()
                    if total > 0:
                        vec = vec / total
                    rows.append((r.media_ref, [float(x) for x in vec]))
                    continue
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
    """Resize: TIFF, PNG and baseline-JPEG blobs resize for REAL
    (nearest-neighbor index sampling on the decoded pixels, re-encoded
    through the in-repo writers — deterministic, no wheel needed).
    Out-of-scope formats need PIL; without it the fake header repack
    keeps the pipeline executable (strict=True raises)."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..io import jpegcodec as JC
        from ..io import pngcodec as PC
        from ..io import tiffcodec as TC
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                blob = bytes(getattr(r, blob_col))
                tiff = _try_tiff(blob)
                if tiff is not None and tiff[3] is not None:
                    w, h, _, px = tiff
                    iy = (np.arange(target_h) * h) // target_h
                    ix = (np.arange(target_w) * w) // target_w
                    out = px[iy][:, ix]
                    rows.append((r.media_ref, target_w, target_h,
                                 bytearray(TC.write_tiff(out))))
                    continue
                png = _try_png(blob)
                if png is not None:
                    w, h, _, px = png
                    iy = (np.arange(target_h) * h) // target_h
                    ix = (np.arange(target_w) * w) // target_w
                    out = px[iy][:, ix]  # (h,w) and (h,w,c) both index so
                    rows.append((r.media_ref, target_w, target_h,
                                 bytearray(PC.write_png(out))))
                    continue
                jpg = _try_jpeg(blob)
                if jpg is not None:
                    w, h, _, px = jpg
                    iy = (np.arange(target_h) * h) // target_h
                    ix = (np.arange(target_w) * w) // target_w
                    out = px[iy][:, ix]
                    rows.append((r.media_ref, target_w, target_h,
                                 bytearray(JC.write_jpeg(out))))
                    continue
                if _HAVE_PIL:
                    import io
                    try:
                        img = Image.open(io.BytesIO(blob)) \
                            .resize((target_w, target_h))
                        out = io.BytesIO()
                        img.save(out, format="PNG")
                        rows.append((r.media_ref, target_w, target_h,
                                     bytearray(out.getvalue())))
                        continue
                    except (OSError, ValueError):
                        # undecodable blob (fake-header fixture, corrupt
                        # file): strict surfaces it, otherwise fall through
                        # to the fake repack like decode_image_meta does,
                        # instead of failing the whole stage.  Narrowed to
                        # decode-shaped errors — OOM/transient failures
                        # propagate instead of masquerading as placeholders
                        if strict:
                            raise
                if strict:
                    raise NotImplementedError(
                        "image resize beyond TIFF/PNG requires PIL "
                        "(absent); strict=False uses the fake-header "
                        "repack")
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
    """One output row per sampled frame, every ``every_n``-th in stream
    order.  REAL for MJPEG/AVI containers (io.avicodec walks the RIFF
    ``movi`` chunks; each emitted frame is the JPEG payload the in-repo
    io.jpegcodec decodes) — the row explosion, batch shape and
    partitioning are the production plumbing either way.  Non-AVI blobs:
    ``strict=True`` raises (other containers need an out-of-repo codec);
    ``strict=False`` falls back to deterministic fake 4096-byte slices so
    pipeline plumbing stays testable with arbitrary bytes."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..io import avicodec

        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                blob = bytes(getattr(r, blob_col))
                try:
                    frames = avicodec.read_mjpeg_frames(blob)
                except avicodec.AviError:
                    if strict:
                        raise NotImplementedError(
                            "video decode is real only for MJPEG/AVI "
                            "(io.avicodec); other containers need an "
                            "out-of-container codec — strict=False "
                            "slices fake frames for non-AVI blobs")
                    n_frames = max(len(blob) // 4096, 1)
                    for i in range(0, n_frames, every_n):
                        frame = blob[i * 4096:(i + 1) * 4096] or blob[:4096]
                        rows.append((r.media_ref, i, bytearray(frame)))
                    continue
                for i in range(0, len(frames), every_n):
                    rows.append((r.media_ref, i, bytearray(frames[i])))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              FRAME_SAMPLE_SCHEMA.fields])

    return media.mapInPandas(gen, FRAME_SAMPLE_SCHEMA)
