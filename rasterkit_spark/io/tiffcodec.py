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
TAG_GEO_KEY_DIRECTORY = 34735   # src/tiff/constants.rs GeoTIFF block
TAG_GEO_DOUBLE_PARAMS = 34736
TAG_GEO_ASCII_PARAMS = 34737
TAG_GDAL_NODATA = 42113

# GeoKey ids (GeoTIFF 1.1 spec; the subset the reference names)
GKEY_MODEL_TYPE = 1024        # 1=projected, 2=geographic
GKEY_RASTER_TYPE = 1025       # 1=PixelIsArea
GKEY_CITATION = 1026          # ascii, lives in GeoAsciiParamsTag
GKEY_GEOGRAPHIC_TYPE = 2048   # geographic EPSG
GKEY_GEOG_INV_FLATTENING = 2059  # double, lives in GeoDoubleParamsTag
GKEY_PROJECTED_CS_TYPE = 3072  # projected EPSG

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
    data → pixels, 4-byte aligned, single uncompressed strip.  ``image``
    is (h, w) grayscale or (h, w, spp) interleaved (chunky) RGB."""
    if image.ndim == 3:
        h, w, spp = image.shape
    else:
        h, w = image.shape
        spp = 1
    pixels = image.astype(np.uint8).tobytes()
    entries = [
        Entry(TAG_WIDTH, T_LONG, [w]),
        Entry(TAG_HEIGHT, T_LONG, [h]),
        Entry(TAG_BITS_PER_SAMPLE, T_SHORT, [8] * spp),
        Entry(TAG_COMPRESSION, T_SHORT, [1]),
        Entry(TAG_PHOTOMETRIC, T_SHORT, [2 if spp == 3 else 1]),
        Entry(TAG_SAMPLES_PER_PIXEL, T_SHORT, [spp]),
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


# ---------------------------------------------------------------------------
# S8 — GeoKey directory (GeoTIFF 1.1; parse twin of geo_key_parser.rs:33-142)
# ---------------------------------------------------------------------------

@dataclass
class GeoKeyEntry:
    key_id: int
    tiff_tag_location: int
    count: int
    value_offset: int


# Projected CRSs that live inside the mostly-geographic EPSG 4xxx block
# (public EPSG registry): World Equidistant Cylindrical (4087/4088),
# Mexico ITRF92 UTM zones (4484-4489), CGCS2000 / Gauss-Kruger CM zones
# (4491-4554) and 3-degree CM zones (4568-4589), ETRS89 / LCC Germany
# N-E (4839).  Writing these as geographic would emit GTModelType=2 +
# GeographicTypeGeoKey and other readers would misinterpret the CRS.
_PROJECTED_IN_4XXX = frozenset(
    {4087, 4088, 4839}
    | set(range(4484, 4490))
    | set(range(4491, 4555))
    | set(range(4568, 4590)))


def geokey_entries(epsg: int, citation: str | None = None,
                   inv_flattening: float | None = None,
                   geographic: bool | None = None) -> list[Entry]:
    """Writer half: the GeoKeyDirectoryTag short array (header 1,1,0,N +
    4-short entries, sorted by key id per spec) plus the Double/Ascii
    params tags when referenced.

    ``geographic=None`` classifies by EPSG code: the 4xxx block is
    geographic except the known projected interlopers in
    ``_PROJECTED_IN_4XXX``; everything else is projected
    (ProjectedCSTypeGeoKey) — the same split geo_key_parser.rs's consumers
    apply.  Callers with out-of-registry codes should pass the flag
    explicitly rather than rely on the heuristic."""
    if geographic is None:
        geographic = 4000 <= epsg <= 4999 and epsg not in _PROJECTED_IN_4XXX
    keys: list[tuple[int, int, int, int]] = [
        (GKEY_MODEL_TYPE, 0, 1, 2 if geographic else 1),
        (GKEY_RASTER_TYPE, 0, 1, 1),
    ]
    doubles: list[float] = []
    ascii_blob = ""
    if citation is not None:
        s = citation + "|"  # GeoTIFF ascii values are '|'-terminated
        keys.append((GKEY_CITATION, TAG_GEO_ASCII_PARAMS, len(s),
                     len(ascii_blob)))
        ascii_blob += s
    if geographic:
        keys.append((GKEY_GEOGRAPHIC_TYPE, 0, 1, epsg))
    if inv_flattening is not None:
        keys.append((GKEY_GEOG_INV_FLATTENING, TAG_GEO_DOUBLE_PARAMS, 1,
                     len(doubles)))
        doubles.append(float(inv_flattening))
    if not geographic:
        keys.append((GKEY_PROJECTED_CS_TYPE, 0, 1, epsg))
    keys.sort()
    shorts = [1, 1, 0, len(keys)]
    for k in keys:
        shorts.extend(k)
    out = [Entry(TAG_GEO_KEY_DIRECTORY, T_SHORT, shorts)]
    if doubles:
        out.append(Entry(TAG_GEO_DOUBLE_PARAMS, T_DOUBLE, doubles))
    if ascii_blob:
        out.append(Entry(TAG_GEO_ASCII_PARAMS, T_ASCII, [ascii_blob]))
    return out


def parse_geo_key_directory(ifd: Ifd) -> list[GeoKeyEntry]:
    """Reader half (geo_key_parser.rs:33-82): header shorts
    (version, revision, minor, num_keys) then 4-short entries.  Missing
    tag → empty list; short header → error (":68-70")."""
    e = ifd.entries.get(TAG_GEO_KEY_DIRECTORY)
    if e is None:
        return []
    vals = e.values
    if len(vals) < 4:
        raise ValueError("Invalid GeoKey directory header")
    num_keys = vals[3]
    out = []
    for i in range(num_keys):
        k = vals[4 + i * 4: 8 + i * 4]
        if len(k) < 4:
            break
        out.append(GeoKeyEntry(*k))
    return out


def geo_key_value_as_string(ifd: Ifd, key: GeoKeyEntry) -> str:
    """Value resolution (geo_key_parser.rs:95-142): location 0 → inline
    short; 34736 → index into GeoDoubleParams; 34737 → count-bounded slice
    of GeoAsciiParams with trailing nulls/terminator trimmed."""
    if key.tiff_tag_location == 0:
        return str(key.value_offset)
    if key.tiff_tag_location == TAG_GEO_DOUBLE_PARAMS:
        e = ifd.entries.get(TAG_GEO_DOUBLE_PARAMS)
        if e is not None and key.value_offset < len(e.values):
            v = float(e.values[key.value_offset])
            return repr(v)  # shortest round-trip, like Rust's f64 Display
    elif key.tiff_tag_location == TAG_GEO_ASCII_PARAMS:
        e = ifd.entries.get(TAG_GEO_ASCII_PARAMS)
        if e is not None:
            s = e.values[0][key.value_offset: key.value_offset + key.count]
            return s.rstrip("\x00").rstrip("|")
    raise ValueError(f"Could not retrieve GeoKey value for key {key.key_id}")


def epsg_from_geo_keys(keys: list[GeoKeyEntry]) -> int | None:
    """EPSG selection: ProjectedCSType (3072) wins when model type is
    projected, else GeographicType (2048) — the lookup order the
    reference's analyze/reproject paths use."""
    by_id = {k.key_id: k for k in keys}
    model = by_id.get(GKEY_MODEL_TYPE)
    if model is not None and model.value_offset == 1:
        proj = by_id.get(GKEY_PROJECTED_CS_TYPE)
        if proj is not None:
            return proj.value_offset
    geo = by_id.get(GKEY_GEOGRAPHIC_TYPE)
    if geo is not None:
        return geo.value_offset
    proj = by_id.get(GKEY_PROJECTED_CS_TYPE)
    return proj.value_offset if proj is not None else None


def catalog_row_from_tiff(buf: bytes) -> dict:
    """Ingestion shim: one catalog-table row from real TIFF bytes — the
    bridge between byte-level GeoTIFFs and the engine's table residency
    (geo metadata via S8/S9, layout via S1-S6 tags)."""
    ifds, _, _ = read_tiff(buf)
    ifd = ifds[0]
    keys = parse_geo_key_directory(ifd)
    scale = ifd.entries.get(TAG_PIXEL_SCALE)
    tie = ifd.entries.get(TAG_TIEPOINT)
    return dict(
        width=ifd.get(TAG_WIDTH, 0),
        height=ifd.get(TAG_HEIGHT, 0),
        tile_w=ifd.get(TAG_TILE_WIDTH, 0),
        tile_h=ifd.get(TAG_TILE_LENGTH, 0),
        rows_per_strip=ifd.get(TAG_ROWS_PER_STRIP, 0),
        compression=ifd.get(TAG_COMPRESSION, 1),
        predictor=ifd.get(TAG_PREDICTOR, 1),
        bits_per_sample=ifd.get(TAG_BITS_PER_SAMPLE, 8),
        samples_per_pixel=ifd.get(TAG_SAMPLES_PER_PIXEL, 1),
        pixel_sx=float(scale.values[0]) if scale else 0.0,
        pixel_sy=float(scale.values[1]) if scale else 0.0,
        # origin through the G8 geotransform (kernels.geotransform_from
        # _tags): a ModelTiepoint may anchor a non-(0,0) raster pixel
        # (values [0]/[1]), so taking [3]/[4] raw would shift the origin
        # by tie_i·pw / tie_j·scale_y
        origin_x=(float(tie.values[3])
                  - float(tie.values[0])
                  * (float(scale.values[0]) if scale else 0.0))
        if tie else 0.0,
        origin_y=(float(tie.values[4])
                  + float(tie.values[1])
                  * (float(scale.values[1]) if scale else 0.0))
        if tie else 0.0,
        epsg=epsg_from_geo_keys(keys),
        nodata=ifd.get(TAG_GDAL_NODATA, ""),
    )
