"""Stdlib MJPEG/AVI container codec (Microsoft RIFF AVI 1.0).

Makes the multimodal VIDEO path real for one container with no external
wheel — the same move that made stills real via the in-repo TIFF/PNG/JPEG
codecs: an MJPEG AVI is just JPEG frames wrapped in RIFF chunks, so the
already-real :mod:`io.jpegcodec` handles the pixels and this module only
walks the container.

Scope (documented, honest):

  - read: RIFF/'AVI ' files, single video stream, frames stored as
    ``00dc``/``00db`` chunks inside the ``movi`` LIST (the standard MJPEG
    layout).  ``rec `` grouping LISTs are descended.  The optional
    ``idx1`` index is ignored — frames are walked in stream order, which
    is the authoritative order for a type-1 AVI.
  - write: minimal standards-shaped AVI: hdrl (avih + one strl with
    'vids'/'MJPG' strh + BITMAPINFOHEADER strf), movi with even-padded
    ``00dc`` chunks, and an idx1 index.  Deterministic output.

The reference engine has no video support at all (extension dispatch
only, src/extractor/extractor_strategy.rs:119-146) — north-star pipeline
surface, not §2 parity.
"""

from __future__ import annotations

import struct


class AviError(ValueError):
    """Malformed or out-of-scope AVI payload."""


def _u32(b: bytes, off: int) -> int:
    if off + 4 > len(b):
        raise AviError(f"truncated AVI: need u32 at {off}, len {len(b)}")
    return struct.unpack_from("<I", b, off)[0]


def read_mjpeg_frames(blob: bytes) -> list[bytes]:
    """All video frame payloads (JPEG byte strings) in stream order.

    Walks the RIFF tree to the ``movi`` LIST and collects ``..dc``/``..db``
    chunks (descending ``rec `` grouping LISTs).  Raises :class:`AviError`
    on non-AVI input or structural truncation.
    """
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise AviError("not a RIFF/AVI stream")
    riff_end = min(8 + _u32(blob, 4), len(blob))

    def walk_chunks(pos: int, end: int, frames: list[bytes],
                    in_movi: bool) -> None:
        while pos + 8 <= end:
            ckid = blob[pos:pos + 4]
            size = _u32(blob, pos + 4)
            body = pos + 8
            if body + size > end:
                raise AviError(
                    f"truncated chunk {ckid!r} at {pos}: size {size} "
                    f"exceeds enclosing end {end}")
            if ckid == b"LIST":
                ltype = blob[body:body + 4]
                if ltype == b"movi" or (in_movi and ltype == b"rec "):
                    walk_chunks(body + 4, body + size, frames, True)
            elif in_movi and ckid[2:4] in (b"dc", b"db"):
                frames.append(bytes(blob[body:body + size]))
            pos = body + size + (size & 1)   # chunks are even-aligned

    frames: list[bytes] = []
    walk_chunks(12, riff_end, frames, False)
    return frames


def write_mjpeg_avi(frames: list[bytes], width: int, height: int,
                    fps: int = 10) -> bytes:
    """Pack JPEG frame payloads into a minimal type-1 MJPEG AVI."""
    if not frames:
        raise AviError("write_mjpeg_avi: need at least one frame")
    n = len(frames)
    max_size = max(len(f) for f in frames)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // max(fps, 1),   # dwMicroSecPerFrame
        max_size * fps,             # dwMaxBytesPerSec
        0,                          # dwPaddingGranularity
        0x10,                       # dwFlags: AVIF_HASINDEX
        n, 0, 1,                    # frames, initial frames, streams
        max_size, width, height,
        0, 0, 0, 0)                 # dwReserved[4]
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIHHHH",
        b"vids", b"MJPG", 0, 0, 0, 0,
        1, max(fps, 1),             # dwScale / dwRate
        0, n, max_size, 0xFFFFFFFF, 0,
        0, 0, width & 0xFFFF, height & 0xFFFF)   # rcFrame
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0)

    def chunk(ckid: bytes, body: bytes) -> bytes:
        return ckid + struct.pack("<I", len(body)) + body + \
            (b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)
    movi_chunks, idx, off = [], [], 4
    for f in frames:
        ck = chunk(b"00dc", f)
        movi_chunks.append(ck)
        # idx1 offsets are relative to the start of the movi LIST data
        idx.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(f)))
        off += len(ck)
    movi = lst(b"movi", b"".join(movi_chunks))
    idx1 = chunk(b"idx1", b"".join(idx))
    payload = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(payload)) + payload
