"""Stdlib-only PNG codec: zlib inflate/deflate + the five scanline filters.

Makes the multimodal PNG path REAL with no external wheel — the same move
that made TIFF real via :mod:`io.tiffcodec`.  Scope (documented, honest):

  - decode: bit depth 8, color types 0 (gray), 2 (RGB), 3 (palette →
    expanded to RGB), 4 (gray+alpha), 6 (RGBA); interlace 0 only (Adam7
    raises ``PngError`` — it is a progressive-download ordering, rare in
    data-lake corpora).  All five filter types (None/Sub/Up/Average/Paeth)
    per the PNG 1.2 spec §6; chunk CRCs verified.
  - encode: bit depth 8, gray / RGB / RGBA, filter 0 scanlines, one IDAT.

The reference engine has no PNG support at all (extraction dispatches on
extension only, src/extractor/extractor_strategy.rs:119-146) — this is
north-star pipeline surface, not §2 parity.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: color type → samples per pixel (after palette expansion for type 3)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngError(ValueError):
    """Malformed or out-of-scope PNG payload."""


def _iter_chunks(blob: bytes):
    pos = len(PNG_SIGNATURE)
    n = len(blob)
    while pos + 8 <= n:
        length, ctype = struct.unpack(">I4s", blob[pos:pos + 8])
        data_end = pos + 8 + length
        if data_end + 4 > n:
            raise PngError("truncated chunk")
        data = blob[pos + 8:data_end]
        crc = struct.unpack(">I", blob[data_end:data_end + 4])[0]
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise PngError(f"bad CRC in {ctype!r} chunk")
        yield ctype, data
        pos = data_end + 4
        if ctype == b"IEND":
            return
    raise PngError("missing IEND")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: np.ndarray, height: int, stride: int,
              bpp: int) -> np.ndarray:
    """Reverse per-scanline filtering → (height, stride) u8 recon rows.

    ``raw`` is the inflated stream reshaped to (height, 1 + stride); byte 0
    of each row is the filter type.  Sub (1) is the TIFF predictor-2 move —
    a wrapping cumsum at ``bpp`` stride (vectorized); Up (2) is a wrapping
    column cumsum over the run of consecutive Up rows (vectorized); Average
    (3) and Paeth (4) depend on the left neighbor through a nonlinear
    function, so those rows run per-byte (spec-exact)."""
    recon = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    y = 0
    while y < height:
        ftype = int(raw[y, 0])
        line = raw[y, 1:].copy()
        if ftype == 0:
            recon[y] = line
        elif ftype == 1:  # Sub: recon[x] = line[x] + recon[x-bpp]
            v = line.reshape(-1, bpp) if stride % bpp == 0 else None
            if v is not None:
                np.cumsum(v, axis=0, dtype=np.uint8, out=v)
                recon[y] = v.reshape(-1)
            else:  # defensive; stride is always w*bpp for supported types
                for x in range(stride):
                    left = recon[y, x - bpp] if x >= bpp else 0
                    recon[y, x] = (int(line[x]) + int(left)) & 0xFF
        elif ftype == 2:  # Up: recon[x] = line[x] + prev[x]
            # vectorize the whole consecutive-Up run in one column cumsum
            run_end = y + 1
            while run_end < height and int(raw[run_end, 0]) == 2:
                run_end += 1
            block = raw[y:run_end, 1:].copy()
            block[0] += prev
            np.cumsum(block, axis=0, dtype=np.uint8, out=block)
            recon[y:run_end] = block
            prev = recon[run_end - 1]
            y = run_end
            continue
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(recon[y, x - bpp]) if x >= bpp else 0
                recon[y, x] = (int(line[x])
                               + (left + int(prev[x])) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = int(recon[y, x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                recon[y, x] = (int(line[x])
                               + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise PngError(f"unknown filter type {ftype}")
        prev = recon[y]
        y += 1
    return recon


def read_png(blob: bytes) -> tuple[np.ndarray, dict]:
    """Decode a PNG → (pixels, meta).

    pixels: u8 array, shape (h, w) for grayscale or (h, w, c) otherwise
    (palette images come back expanded to (h, w, 3) RGB).  meta carries
    width/height/bit_depth/color_type/channels."""
    if not blob.startswith(PNG_SIGNATURE):
        raise PngError("not a PNG (bad signature)")
    width = height = None
    bit_depth = color_type = interlace = None
    palette = None
    idat = bytearray()
    for ctype, data in _iter_chunks(blob):
        if ctype == b"IHDR":
            (width, height, bit_depth, color_type, comp, filt,
             interlace) = struct.unpack(">IIBBBBB", data)
            if comp != 0 or filt != 0:
                raise PngError("unknown compression/filter method")
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        # ancillary chunks (tEXt, pHYs, …) are CRC-checked and skipped
    if width is None:
        raise PngError("missing IHDR")
    if interlace != 0:
        raise PngError("Adam7 interlacing not supported")
    if bit_depth != 8:
        raise PngError(f"bit depth {bit_depth} not supported (8 only)")
    if color_type not in _CHANNELS:
        raise PngError(f"color type {color_type} not supported")
    spp = _CHANNELS[color_type]
    stride = width * spp
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if len(raw) != height * (stride + 1):
        raise PngError("inflated size does not match geometry")
    recon = _unfilter(raw.reshape(height, stride + 1), height, stride, spp)
    if color_type == 3:
        if palette is None:
            raise PngError("palette image without PLTE")
        px = palette[recon.reshape(height, width)]
        channels = 3
    elif spp == 1:
        px = recon.reshape(height, width)
        channels = 1
    else:
        px = recon.reshape(height, width, spp)
        channels = spp
    meta = dict(width=width, height=height, bit_depth=bit_depth,
                color_type=color_type, channels=channels)
    return px, meta


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def write_png(pixels: np.ndarray, level: int = 6) -> bytes:
    """Encode a u8 array — (h, w) gray, (h, w, 3) RGB or (h, w, 4) RGBA —
    as a non-interlaced filter-0 PNG."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        h, w, spp, color_type = px.shape[0], px.shape[1], 1, 0
    elif px.ndim == 3 and px.shape[2] in (2, 3, 4):
        h, w, spp = px.shape
        color_type = {2: 4, 3: 2, 4: 6}[spp]
    else:
        raise PngError(f"unsupported pixel shape {px.shape}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    body = np.zeros((h, w * spp + 1), dtype=np.uint8)
    body[:, 1:] = px.reshape(h, w * spp)
    idat = zlib.compress(body.tobytes(), level)
    return (PNG_SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))
