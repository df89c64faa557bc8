"""Deterministic MJPEG/AVI fixtures built from the in-repo JPEG + AVI
codecs (pure numpy/stdlib, no SparkSession) — THE single definition used
by both the driver-gate video query (whose DuckDB oracle hashes the
pre-container frame bytes from the same builder) and the codec pytest
suite, so the two can never silently test different payloads."""

from __future__ import annotations

import numpy as np


def gradient_mjpeg(n_frames: int, w: int = 48, h: int = 32,
                   quality: int = 85, salt: int = 0,
                   fps: int = 5) -> tuple[bytes, list[bytes]]:
    """(avi_blob, jpeg_payloads): ``n_frames`` distinct gradient frames,
    deterministic in (n_frames, w, h, quality, salt)."""
    from ..io import avicodec as AC
    from ..io import jpegcodec as JC
    jpegs = []
    for i in range(n_frames):
        y, x = np.mgrid[0:h, 0:w]
        px = ((x * 3 + y * 7 + i * 31 + salt * 11) % 256).astype(np.uint8)
        jpegs.append(JC.write_jpeg(px, quality=quality))
    return AC.write_mjpeg_avi(jpegs, w, h, fps=fps), jpegs


def video_catalog(n_videos: int = 3,
                  base_frames: int = 5) -> list[tuple[str, bytes,
                                                      list[bytes]]]:
    """(media_ref, avi_blob, jpeg_payloads) rows: video v has
    base_frames+v frames salted by v — the gate-query corpus."""
    out = []
    for v in range(n_videos):
        blob, jpegs = gradient_mjpeg(base_frames + v, salt=v)
        out.append((f"vid{v}", blob, jpegs))
    return out
