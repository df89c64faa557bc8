"""Stdlib+numpy baseline JPEG codec (ITU-T T.81 sequential DCT).

Makes the multimodal JPEG path REAL with no external wheel — the same
move that made TIFF real via :mod:`io.tiffcodec` and PNG via
:mod:`io.pngcodec`.  Scope (documented, honest):

  - decode: baseline sequential (SOF0), 8-bit samples, 1 component
    (grayscale) or 3 components (JFIF YCbCr) with sampling factors 1-2
    in each axis (4:4:4, 4:2:2, 4:2:0), restart markers (DRI/RSTn).
    Progressive (SOF2), arithmetic coding, 12-bit, and CMYK raise
    ``JpegError``.
  - encode: baseline sequential, grayscale or RGB as 4:4:4 YCbCr, the
    T.81 Annex K example quantization tables scaled by a quality factor
    (libjpeg's 5000/q // 200q-2 convention) and the Annex K "typical"
    Huffman tables.  Deterministic output (no optimization passes).

Entropy decode walks bits in Python (fine for the catalog-fixture sizes
this repo decodes in tests); dequantize + IDCT + upsample + color
convert are vectorized numpy over all blocks at once — the same split
the TIFF codec uses (header walk in Python, pixel math in numpy).

The reference engine has no JPEG support (extraction dispatches on
extension only, src/extractor/extractor_strategy.rs:119-146) — this is
north-star pipeline surface, not §2 parity.
"""

from __future__ import annotations

import struct

import numpy as np


class JpegError(ValueError):
    """Malformed or out-of-scope JPEG payload."""


# --------------------------------------------------------------------------
# Spec constants (public data: ITU-T T.81 Annex K)
# --------------------------------------------------------------------------

ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int32)

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32)

# (bits-per-length[1..16], symbol values) — Annex K "typical" tables
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA])
AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA])

for _bits, _vals in (DC_LUMA, DC_CHROMA, AC_LUMA, AC_CHROMA):
    assert sum(_bits) == len(_vals)

#: 8×8 DCT-II basis: A[u, x] = C(u)/2 · cos((2x+1)uπ/16);
#: forward F = A f Aᵀ, inverse f = Aᵀ F A (A is orthogonal)
_X = np.arange(8)
DCT_A = np.cos((2 * _X[None, :] + 1) * _X[:, None] * np.pi / 16) / 2.0
DCT_A[0, :] *= 1.0 / np.sqrt(2.0)


def _huff_decode_table(bits: list[int], vals: list[int]) -> dict:
    """(length, code) → symbol, codes assigned in canonical order."""
    table, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_encode_table(bits: list[int], vals: list[int]) -> dict:
    """symbol → (code, length)."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitReader:
    """Entropy-segment bit reader: un-stuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RSTn consumed by caller
                raise _RestartMarker()
            else:
                raise JpegError(f"marker 0x{nxt:02x} inside entropy data")
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, table: dict) -> int:
        code, ln = 0, 0
        while ln < 16:
            code = (code << 1) | self.read_bit()
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise JpegError("invalid Huffman code")

    def align_restart(self) -> None:
        """Drop partial bits, consume the RSTn marker."""
        self.bitbuf = 0
        self.nbits = 0
        if (self.data[self.pos] == 0xFF
                and 0xD0 <= self.data[self.pos + 1] <= 0xD7):
            self.pos += 2
        else:
            raise JpegError("expected restart marker")


class _RestartMarker(Exception):
    pass


def _extend(v: int, n: int) -> int:
    """T.81 F.2.2.1 EXTEND: map an n-bit magnitude to its signed value."""
    return v - (1 << n) + 1 if n and v < (1 << (n - 1)) else v


def read_jpeg(blob: bytes):
    """Decode a baseline JPEG → (pixels, meta).

    pixels: uint8 (h, w) for grayscale, (h, w, 3) RGB for YCbCr;
    meta: dict(width, height, channels).

    Exception contract: every malformed/truncated/out-of-scope input
    raises :class:`JpegError` — low-level struct/index failures from
    damaged streams are wrapped, so direct callers need only one
    except clause."""
    try:
        return _read_jpeg(blob)
    except JpegError:
        raise
    except (struct.error, IndexError, ValueError) as e:
        raise JpegError(f"malformed JPEG stream: {e}") from e


def _read_jpeg(blob: bytes):
    if len(blob) < 4 or blob[:2] != b"\xFF\xD8":
        raise JpegError("not a JPEG (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps = None  # list of (cid, h, v, tq)
    w = h = 0
    restart_interval = 0
    n = len(blob)
    while pos + 2 <= n:
        if blob[pos] != 0xFF:
            raise JpegError("expected marker")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while pos + 1 < n and blob[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > n:
            break
        marker = blob[pos + 1]
        if marker == 0xD9:  # EOI
            raise JpegError("EOI before SOS")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # standalone markers (TEM, RSTn) carry no length segment
            pos += 2
            continue
        if pos + 4 > n:
            raise JpegError("truncated marker segment header")
        seglen = struct.unpack(">H", blob[pos + 2:pos + 4])[0]
        if seglen < 2 or pos + 2 + seglen > n:
            raise JpegError(
                f"truncated or invalid segment length {seglen} for "
                f"marker 0xFF{marker:02X} at {pos}")
        seg = blob[pos + 4:pos + 2 + seglen]
        if marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise JpegError(f"{prec}-bit samples unsupported")
            if nc not in (1, 3):
                raise JpegError(f"{nc}-component JPEG unsupported")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i: 9 + 3 * i]
                ch, cv = hv >> 4, hv & 0xF
                if not (1 <= ch <= 2 and 1 <= cv <= 2):
                    raise JpegError(f"sampling {ch}x{cv} unsupported")
                comps.append((cid, ch, cv, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError("only baseline sequential (SOF0) supported")
        elif marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[p:p + 64], np.uint8) \
                        .astype(np.int32)
                    p += 64
                else:
                    tbl = np.frombuffer(seg[p:p + 128], ">u2") \
                        .astype(np.int32)
                    p += 128
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17:p + 17 + nv])
                p += 17 + nv
                (huff_ac if tc else huff_dc)[th] = \
                    _huff_decode_table(bits, vals)
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS → entropy data follows
            if comps is None:
                raise JpegError("SOS before SOF0")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i:3 + 2 * i]
                scan.append((cs, tdta >> 4, tdta & 0xF))
            pos = pos + 2 + seglen
            return _decode_scan(blob, pos, w, h, comps, scan, qt,
                                huff_dc, huff_ac, restart_interval)
        # APPn / COM / others: skip
        pos += 2 + seglen
    raise JpegError("no SOS segment")


def _decode_scan(blob, pos, w, h, comps, scan, qt, huff_dc, huff_ac,
                 restart_interval):
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    scan_by_cid = {s[0]: s for s in scan}
    # per component: coefficient store (n_blocks_total, 64) in MCU order
    coeffs = []
    meta = []
    for cid, ch, cv, tq in comps:
        s = scan_by_cid.get(cid)
        if s is None:
            raise JpegError("non-interleaved scans unsupported")
        coeffs.append(np.zeros((mcuy * cv, mcux * ch, 64), np.int32))
        meta.append((ch, cv, qt[tq], huff_dc[s[1]], huff_ac[s[2]]))
    br = _BitReader(blob, pos)
    preds = [0] * len(comps)
    mcu_index = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_index and \
                    mcu_index % restart_interval == 0:
                br.align_restart()
                preds = [0] * len(comps)
            try:
                for ci, (ch, cv, _q, hdc, hac) in enumerate(meta):
                    for by in range(cv):
                        for bx in range(ch):
                            blk = coeffs[ci][my * cv + by, mx * ch + bx]
                            preds[ci] = _decode_block(br, blk, hdc, hac,
                                                      preds[ci])
            except _RestartMarker:
                raise JpegError("unexpected restart marker")
            mcu_index += 1
    # vectorized dequantize → dezigzag → IDCT → plane per component
    planes = []
    for ci, (ch, cv, q, _hdc, _hac) in enumerate(meta):
        c = coeffs[ci].reshape(-1, 64) * q[None, :]
        blocks = np.zeros((len(c), 64), np.float64)
        blocks[:, ZIGZAG] = c
        blocks = blocks.reshape(-1, 8, 8)
        px = np.einsum("ux,nuv,vy->nxy", DCT_A, blocks, DCT_A) + 128.0
        by, bx = coeffs[ci].shape[:2]
        plane = px.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3) \
            .reshape(by * 8, bx * 8)
        # upsample to full frame resolution then crop
        plane = np.repeat(np.repeat(plane, vmax // cv, 0), hmax // ch, 1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        out = np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
        return out, dict(width=w, height=h, channels=1)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    out = np.clip(np.rint(np.stack([r, g, b], -1)), 0, 255).astype(np.uint8)
    return out, dict(width=w, height=h, channels=3)


def _decode_block(br: _BitReader, blk: np.ndarray, hdc: dict, hac: dict,
                  pred: int) -> int:
    s = br.decode_huff(hdc)
    diff = _extend(br.receive(s), s) if s else 0
    pred += diff
    blk[0] = pred
    k = 1
    while k < 64:
        rs = br.decode_huff(hac)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break        # EOB
        k += r
        if k > 63:
            raise JpegError("AC run past end of block")
        blk[k] = _extend(br.receive(s), s)
        k += 1
    return pred


# --------------------------------------------------------------------------
# Encoder (baseline, 4:4:4, Annex K tables)
# --------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: 1..100 → scale 5000/q (q<50) else 200-2q."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: int,
                  dc_tab: dict, ac_tab: dict) -> int:
    diff = int(zz[0]) - pred
    pred = int(zz[0])
    mag, v = abs(diff), diff
    s = int(mag).bit_length()
    code, ln = dc_tab[s]
    bw.write(code, ln)
    if s:
        if v < 0:
            v += (1 << s) - 1
        bw.write(v & ((1 << s) - 1), s)
    run = 0
    last_nz = np.nonzero(zz[1:])[0]
    last = last_nz[-1] + 1 if len(last_nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = abs(v).bit_length()
        code, ln = ac_tab[(run << 4) | s]
        bw.write(code, ln)
        vv = v + (1 << s) - 1 if v < 0 else v
        bw.write(vv & ((1 << s) - 1), s)
        run = 0
    if last < 63:
        code, ln = ac_tab[0x00]  # EOB
        bw.write(code, ln)
    return pred


def _component_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(h, w) float plane → (n_blocks, 64) quantized zigzag coeffs, blocks
    in raster order, edge-replicated padding to 8-multiples."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    p = np.empty((ph, pw), np.float64)
    p[:h, :w] = plane
    p[h:, :w] = plane[-1:, :]
    p[:h, w:] = p[:h, w - 1:w]
    p[h:, w:] = p[h - 1, w - 1]
    blocks = p.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3) \
        .reshape(-1, 8, 8) - 128.0
    F = np.einsum("ux,nxy,vy->nuv", DCT_A, blocks, DCT_A).reshape(-1, 64)
    zz = F[:, ZIGZAG]  # coefficients in zigzag order, like the decoder's
    return np.floor(zz / q[None, ZIGZAG] + 0.5).astype(np.int32)


def write_jpeg(pixels: np.ndarray, quality: int = 90) -> bytes:
    """Encode uint8 (h, w) grayscale or (h, w, 3) RGB → baseline JPEG
    bytes (4:4:4, Annex K Huffman tables, quality-scaled Annex K quant)."""
    px = np.asarray(pixels)
    if px.dtype != np.uint8:
        raise JpegError("write_jpeg expects uint8 pixels")
    gray = px.ndim == 2
    if not gray and (px.ndim != 3 or px.shape[2] != 3):
        raise JpegError("write_jpeg expects (h,w) or (h,w,3)")
    h, w = px.shape[:2]
    ql = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)
    if gray:
        planes = [px.astype(np.float64)]
        qts, comps = [ql], [(1, 0)]  # (cid, tq)
    else:
        r, g, b = (px[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
        qts, comps = [ql, qc, qc], [(1, 0), (2, 1), (3, 1)]

    out = bytearray(b"\xFF\xD8")                       # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01" \
        + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"   # APP0
    for tq, q in enumerate([ql] if gray else [ql, qc]):
        out += b"\xFF\xDB" + struct.pack(">HB", 67, tq) \
            + bytes(int(v) for v in q[ZIGZAG])          # DQT (zigzag order)
    nc = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for cid, tq in comps:
        sof += bytes([cid, 0x11, tq])                  # 1x1 sampling
    out += b"\xFF\xC0" + struct.pack(">H", 2 + len(sof)) + sof
    tables = [(0x00, DC_LUMA), (0x10, AC_LUMA)]
    if not gray:
        tables += [(0x01, DC_CHROMA), (0x11, AC_CHROMA)]
    for tcth, (bits, vals) in tables:
        seg = bytes([tcth]) + bytes(bits) + bytes(vals)
        out += b"\xFF\xC4" + struct.pack(">H", 2 + len(seg)) + seg
    sos = bytes([nc])
    for i, (cid, _tq) in enumerate(comps):
        td = 0 if i == 0 else 1
        sos += bytes([cid, (td << 4) | td])
    sos += bytes([0, 63, 0])
    out += b"\xFF\xDA" + struct.pack(">H", 2 + len(sos)) + sos

    enc_dc = [_huff_encode_table(*DC_LUMA), _huff_encode_table(*DC_CHROMA)]
    enc_ac = [_huff_encode_table(*AC_LUMA), _huff_encode_table(*AC_CHROMA)]
    comp_zz = [_component_blocks(p, q) for p, q in zip(planes, qts)]
    bw = _BitWriter()
    preds = [0] * nc
    nblocks = len(comp_zz[0])
    for bi in range(nblocks):                          # 4:4:4 → interleave
        for ci in range(nc):
            t = 0 if ci == 0 else 1
            preds[ci] = _encode_block(bw, comp_zz[ci][bi], preds[ci],
                                      enc_dc[t], enc_ac[t])
    bw.flush()
    out += bw.out
    out += b"\xFF\xD9"                                 # EOI
    return bytes(out)
