"""Minimal pure-Python TIFF codec — the fixture/test-only twin of the
reference's byte-level reader/writer (SURVEY.md §2.1 S1-S4 / K1-K2).

At runtime the engine never parses TIFF bytes (the catalog and tile tables
are pre-materialized); this codec exists so tests can (a) generate real
TIFF byte streams for ingestion tests and (b) verify that the writer
honors the reference's layout rules:

- byte-order marker II/MM → LE/BE (src/io/byte_order.rs:23-30);
- version 42 classic / 43 BigTIFF with 8-byte offsets
  (src/utils/format_utils.rs:29-50, src/tiff/validation.rs:69-88);
- IFD chain walk capped at 100 IFDs (src/tiff/reader.rs:165-168);
- inline values when they fit 4 bytes (8 for BigTIFF)
  (src/tiff/ifd.rs:92-104);
- writer: header → sorted/unique tags (keep-LAST duplicate,
  src/utils/write_utils.rs:41-61) → external tag data → image data, all
  4-byte aligned (src/utils/write_utils.rs:15-34);
- output images written as a single uncompressed strip
  (src/tiff/builders/basic_tags.rs:63-102).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

# field types (src/tiff/constants.rs:26-42)
T_BYTE, T_ASCII, T_SHORT, T_LONG, T_RATIONAL = 1, 2, 3, 4, 5
T_DOUBLE = 12
TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8,
              11: 4, 12: 8, 16: 8, 17: 8, 18: 8}

# tag ids (public TIFF/GeoTIFF spec)
TAG_WIDTH, TAG_HEIGHT = 256, 257
TAG_BITS_PER_SAMPLE = 258
TAG_COMPRESSION = 259
TAG_PHOTOMETRIC = 262
TAG_STRIP_OFFSETS = 273
TAG_SAMPLES_PER_PIXEL = 277
TAG_ROWS_PER_STRIP = 278
TAG_STRIP_BYTE_COUNTS = 279
TAG_PREDICTOR = 317
TAG_TILE_WIDTH, TAG_TILE_LENGTH = 322, 323
TAG_TILE_OFFSETS, TAG_TILE_BYTE_COUNTS = 324, 325
TAG_PIXEL_SCALE, TAG_TIEPOINT = 33550, 33922
TAG_GDAL_NODATA = 42113

MAX_IFDS = 100  # loop guard parity (src/tiff/reader.rs:165-168)


@dataclass
class Entry:
    tag: int
    ftype: int
    values: list


@dataclass
class Ifd:
    entries: dict = field(default_factory=dict)

    def get(self, tag, default=None):
        e = self.entries.get(tag)
        return e.values[0] if e and e.values else default


def detect_byte_order(buf: bytes) -> str:
    """II → '<', MM → '>' (src/io/byte_order.rs:23-30)."""
    if buf[:2] == b"II":
        return "<"
    if buf[:2] == b"MM":
        return ">"
    raise ValueError("Invalid TIFF byte order marker")


def detect_format(buf: bytes):
    """(byte_order, is_bigtiff); BigTIFF validates offset size 8
    (src/utils/format_utils.rs:29-50)."""
    bo = detect_byte_order(buf)
    version = struct.unpack(bo + "H", buf[2:4])[0]
    if version == 42:
        return bo, False
    if version == 43:
        offset_size, zero = struct.unpack(bo + "HH", buf[4:8])
        if offset_size != 8 or zero != 0:
            raise ValueError("Invalid BigTIFF header")
        return bo, True
    raise ValueError(f"Not a TIFF file (version {version})")


def _align4(n: int) -> int:
    return (n + 3) & ~3  # src/utils/write_utils.rs:15-34


def unique_sorted_entries(entries: list[Entry]) -> list[Entry]:
    """Sort by tag; duplicates keep the LAST occurrence
    (src/utils/write_utils.rs:41-61)."""
    last: dict[int, Entry] = {}
    for e in entries:
        last[e.tag] = e
    return [last[t] for t in sorted(last)]


def read_tiff(buf: bytes):
    """S1: walk the IFD chain (≤100), parse entries, resolve offsets."""
    bo, big = detect_format(buf)
    if big:
        first = struct.unpack(bo + "Q", buf[8:16])[0]
        entry_count_fmt, entry_size, inline = "Q", 20, 8
    else:
        first = struct.unpack(bo + "I", buf[4:8])[0]
        entry_count_fmt, entry_size, inline = "H", 12, 4

    ifds = []
    offset = first
    while offset and len(ifds) < MAX_IFDS:
        if big:
            n = struct.unpack(bo + "Q", buf[offset:offset + 8])[0]
            base = offset + 8
        else:
            n = struct.unpack(bo + "H", buf[offset:offset + 2])[0]
            base = offset + 2
        ifd = Ifd()
        for i in range(n):
            eb = buf[base + i * entry_size: base + (i + 1) * entry_size]
            tag, ftype = struct.unpack(bo + "HH", eb[:4])
            if big:
                count = struct.unpack(bo + "Q", eb[4:12])[0]
                raw = eb[12:20]
            else:
                count = struct.unpack(bo + "I", eb[4:8])[0]
                raw = eb[8:12]
            size = TYPE_SIZES.get(ftype, 1) * count
            if size <= inline:
                data = raw[:size]
            else:
                voff = struct.unpack(bo + ("Q" if big else "I"), raw)[0]
                data = buf[voff: voff + size]
            ifd.entries[tag] = Entry(tag, ftype, _decode_values(
                bo, ftype, count, data))
        ifds.append(ifd)
        tail = base + n * entry_size
        offset = struct.unpack(bo + ("Q" if big else "I"),
                               buf[tail: tail + (8 if big else 4)])[0]
    return ifds, bo, big


def _decode_values(bo, ftype, count, data):
    if ftype == T_ASCII:
        return [data.rstrip(b"\x00").decode("ascii", "replace")]
    fmt = {T_BYTE: "B", T_SHORT: "H", T_LONG: "I", T_DOUBLE: "d",
           16: "Q"}.get(ftype)
    if fmt is None:
        if ftype == T_RATIONAL:  # packed (num<<32)|den (tag_utils.rs:34-37)
            vals = struct.unpack(bo + "II" * count, data)
            return [(vals[2 * i] << 32) | vals[2 * i + 1] for i in range(count)]
        return [data]
    return list(struct.unpack(bo + fmt * count, data))


def write_tiff(image: np.ndarray, extra_entries: list[Entry] | None = None,
               byte_order: str = "<") -> bytes:
    """K1/K2: classic-TIFF writer — header → sorted unique tags → external
    data → pixels, 4-byte aligned, single uncompressed strip."""
    h, w = image.shape
    pixels = image.astype(np.uint8).tobytes()
    entries = [
        Entry(TAG_WIDTH, T_LONG, [w]),
        Entry(TAG_HEIGHT, T_LONG, [h]),
        Entry(TAG_BITS_PER_SAMPLE, T_SHORT, [8]),
        Entry(TAG_COMPRESSION, T_SHORT, [1]),
        Entry(TAG_PHOTOMETRIC, T_SHORT, [1]),
        Entry(TAG_SAMPLES_PER_PIXEL, T_SHORT, [1]),
        Entry(TAG_ROWS_PER_STRIP, T_LONG, [h]),        # single strip
        Entry(TAG_STRIP_BYTE_COUNTS, T_LONG, [len(pixels)]),
        Entry(TAG_STRIP_OFFSETS, T_LONG, [0]),         # patched below
    ] + list(extra_entries or [])
    entries = unique_sorted_entries(entries)

    bo = byte_order
    n = len(entries)
    ifd_offset = 8
    ifd_size = 2 + n * 12 + 4
    data_offset = _align4(ifd_offset + ifd_size)

    # lay out external value blocks
    ext: dict[int, bytes] = {}
    cursor = data_offset
    for e in entries:
        raw = _encode_values(bo, e)
        if len(raw) > 4:
            ext[e.tag] = raw
            cursor = _align4(cursor + len(raw))
    pixel_offset = _align4(cursor)
    for e in entries:
        if e.tag == TAG_STRIP_OFFSETS:
            e.values = [pixel_offset]

    out = bytearray()
    out += (b"II" if bo == "<" else b"MM") + struct.pack(bo + "H", 42)
    out += struct.pack(bo + "I", ifd_offset)
    out += struct.pack(bo + "H", n)
    cursor = data_offset
    ext_offsets = {}
    for e in entries:
        raw = _encode_values(bo, e)
        if len(raw) > 4:
            ext_offsets[e.tag] = cursor
            cursor = _align4(cursor + len(raw))
    for e in entries:
        raw = _encode_values(bo, e)
        out += struct.pack(bo + "HH", e.tag, e.ftype)
        out += struct.pack(bo + "I", len(e.values) if e.ftype != T_ASCII
                           else len(raw))
        if len(raw) <= 4:
            out += raw + b"\x00" * (4 - len(raw))
        else:
            out += struct.pack(bo + "I", ext_offsets[e.tag])
    out += struct.pack(bo + "I", 0)  # next-IFD pointer
    while len(out) < data_offset:
        out += b"\x00"
    for e in entries:
        raw = _encode_values(bo, e)
        if len(raw) > 4:
            while len(out) < ext_offsets[e.tag]:
                out += b"\x00"
            out += raw
    while len(out) < pixel_offset:
        out += b"\x00"
    out += pixels
    return bytes(out)


def _encode_values(bo, e: Entry) -> bytes:
    if e.ftype == T_ASCII:
        s = (e.values[0] + "\x00").encode("ascii")
        return s
    fmt = {T_BYTE: "B", T_SHORT: "H", T_LONG: "I", T_DOUBLE: "d"}[e.ftype]
    return struct.pack(bo + fmt * len(e.values), *e.values)
