"""io/pngcodec tests: round-trip, spec-exact filter reconstruction against
an independent forward-filter implementation, palette expansion, and error
handling.  The multimodal integration (PNG as a REAL decode path) is
covered in test_text_dedup.py::test_multimodal_real_png_decode."""

import struct
import zlib

import numpy as np
import pytest

from rasterkit_spark.io import pngcodec as PC


def _rt(px):
    out, meta = PC.read_png(PC.write_png(px))
    np.testing.assert_array_equal(out, px)
    return meta


def test_roundtrip_gray():
    rng = np.random.default_rng(1)
    meta = _rt(rng.integers(0, 256, (23, 31), dtype=np.uint8))
    assert (meta["width"], meta["height"], meta["channels"]) == (31, 23, 1)
    assert meta["color_type"] == 0


def test_roundtrip_rgb_rgba_graya():
    rng = np.random.default_rng(2)
    assert _rt(rng.integers(0, 256, (8, 5, 3), np.uint8))["color_type"] == 2
    assert _rt(rng.integers(0, 256, (4, 7, 4), np.uint8))["color_type"] == 6
    assert _rt(rng.integers(0, 256, (6, 6, 2), np.uint8))["color_type"] == 4


# --- independent forward-filter implementation (PNG 1.2 spec §6) ---------

def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _forward_filter(recon, ftypes, bpp):
    """recon (h, stride) u8 → filtered stream rows [ftype || bytes]."""
    h, stride = recon.shape
    out = []
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        row, line = recon[y], np.zeros(stride, dtype=np.uint8)
        ft = ftypes[y % len(ftypes)]
        for x in range(stride):
            left = int(row[x - bpp]) if x >= bpp else 0
            up = int(prev[x])
            ul = int(prev[x - bpp]) if x >= bpp else 0
            sub = {0: 0, 1: left, 2: up, 3: (left + up) // 2,
                   4: _paeth(left, up, ul)}[ft]
            line[x] = (int(row[x]) - sub) & 0xFF
        out.append(bytes([ft]) + line.tobytes())
        prev = row
    return b"".join(out)


def _chunk(ctype, data):
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def _assemble(w, h, color_type, stream, plte=None):
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    blob = PC.PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
    if plte is not None:
        blob += _chunk(b"PLTE", plte)
    return blob + _chunk(b"IDAT", zlib.compress(stream)) + _chunk(b"IEND", b"")


@pytest.mark.parametrize("ftypes", [[0], [1], [2], [3], [4],
                                    [0, 1, 2, 3, 4], [4, 3, 2, 1]])
def test_all_filters_gray(ftypes):
    rng = np.random.default_rng(sum(ftypes) + 7)
    px = rng.integers(0, 256, (11, 17), dtype=np.uint8)
    blob = _assemble(17, 11, 0, _forward_filter(px, ftypes, bpp=1))
    out, _ = PC.read_png(blob)
    np.testing.assert_array_equal(out, px)


@pytest.mark.parametrize("ftypes", [[1], [4], [2, 4, 1, 3]])
def test_all_filters_rgb(ftypes):
    rng = np.random.default_rng(sum(ftypes))
    px = rng.integers(0, 256, (9, 6, 3), dtype=np.uint8)
    stream = _forward_filter(px.reshape(9, 18), ftypes, bpp=3)
    out, _ = PC.read_png(_assemble(6, 9, 2, stream))
    np.testing.assert_array_equal(out, px)


def test_up_run_crosses_other_filters():
    """The vectorized Up-run must seed from the true previous recon row
    when the run follows Sub/Paeth rows, and hand back the right prev."""
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (16, 8), dtype=np.uint8)
    blob = _assemble(8, 16, 0, _forward_filter(
        px, [1, 2, 2, 2, 4, 2, 2, 3], bpp=1))
    out, _ = PC.read_png(blob)
    np.testing.assert_array_equal(out, px)


def test_palette_expansion():
    rng = np.random.default_rng(4)
    plte = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (5, 7), dtype=np.uint8)
    blob = _assemble(7, 5, 3, _forward_filter(idx, [0, 2], bpp=1),
                     plte=plte.tobytes())
    out, meta = PC.read_png(blob)
    assert meta["channels"] == 3
    np.testing.assert_array_equal(out, plte[idx])


def test_errors():
    with pytest.raises(PC.PngError, match="signature"):
        PC.read_png(b"nope")
    good = PC.write_png(np.zeros((2, 2), dtype=np.uint8))
    bad = bytearray(good)
    bad[-5] ^= 0xFF  # corrupt IEND CRC
    with pytest.raises(PC.PngError, match="CRC"):
        PC.read_png(bytes(bad))
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)  # interlace=1
    blob = (PC.PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"\0\0\0" * 2))
            + _chunk(b"IEND", b""))
    with pytest.raises(PC.PngError, match="Adam7"):
        PC.read_png(blob)
    with pytest.raises(PC.PngError, match="bit depth"):
        ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
        PC.read_png(PC.PNG_SIGNATURE + _chunk(b"IHDR", ihdr16)
                    + _chunk(b"IDAT", zlib.compress(b"\0" * 10))
                    + _chunk(b"IEND", b""))


def test_geometry_mismatch():
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    blob = (PC.PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"\0" * 7))  # not 4*(4+1)
            + _chunk(b"IEND", b""))
    with pytest.raises(PC.PngError, match="geometry"):
        PC.read_png(blob)
