"""String / XML / parsing scalar functions (SURVEY.md §2.9 X1-X8)."""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# ---------------------------------------------------------------------------
# X1 — bbox / coordinate / filter-range string parsing
# (src/coordinate/bbox.rs:48-64, src/utils/coordinate_utils.rs:35-46,
#  src/utils/filter_utils.rs:120-146)
# ---------------------------------------------------------------------------

def parse_bbox_str(s: str):
    parts = [p.strip() for p in s.split(",")]
    if len(parts) != 4:
        raise ValueError(f"Invalid bounding box format '{s}'")
    return tuple(float(p) for p in parts)


def parse_coord_str(s: str):
    parts = [p.strip() for p in s.split(",")]
    if len(parts) != 2:
        raise ValueError("Coordinate must be in format 'x,y'")
    return float(parts[0]), float(parts[1])


def parse_filter_range(s: str):
    """'min,max' u8 with min ≤ max (filter_utils.rs:120-146)."""
    parts = [p.strip() for p in s.split(",")]
    if len(parts) != 2:
        raise ValueError(f"Invalid filter range format '{s}'. Expected 'min,max'")
    lo, hi = int(parts[0]), int(parts[1])
    if not (0 <= lo <= 255 and 0 <= hi <= 255):
        raise ValueError("Expected a number between 0-255")
    if lo > hi:
        raise ValueError(f"Invalid range: min ({lo}) is greater than max ({hi})")
    return lo, hi


def bbox_cols_from_string(c: Column) -> list[Column]:
    """Column flavor of X1: 'a,b,c,d' → four double columns."""
    p = F.split(c, ",")
    return [F.trim(p[i]).cast("double").alias(n)
            for i, n in enumerate(["minx", "miny", "maxx", "maxy"])]


# ---------------------------------------------------------------------------
# X2 — hex color parse/format (src/tiff/colormap.rs:50-85)
# ---------------------------------------------------------------------------

def hex_to_rgb(s: str):
    s = s.strip().lstrip("#")
    if len(s) != 6:
        raise ValueError(f"Invalid hex color '{s}'")
    return int(s[0:2], 16), int(s[2:4], 16), int(s[4:6], 16)


def rgb_to_hex(r: int, g: int, b: int) -> str:
    return f"#{r:02X}{g:02X}{b:02X}"


def hex_to_rgb_cols(c: Column) -> list[Column]:
    h = F.regexp_replace(F.trim(c), "^#", "")
    return [F.conv(F.substring(h, 1 + 2 * i, 2), 16, 10).cast("int").alias(n)
            for i, n in enumerate(["r", "g", "b"])]


# ---------------------------------------------------------------------------
# X3/X4 — XML attribute scrape / escape / GDALMetadata item surgery
# (string-split based, like src/utils/xml_utils.rs:9-52 and
#  src/tiff/colormap.rs:940-951,971-977 — deliberately not a real XML parser)
# ---------------------------------------------------------------------------

def xml_attr(line: str, name: str):
    marker = f'{name}="'
    i = line.find(marker)
    if i < 0:
        return None
    j = line.find('"', i + len(marker))
    if j < 0:
        return None
    return line[i + len(marker): j]


def xml_escape(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
             .replace("'", "&apos;").replace('"', "&quot;"))


def replace_gdal_metadata_item(xml: str, name: str, value: str) -> str:
    """Replace (or append) an <Item name="..."> in a GDALMetadata blob via
    string surgery (xml_utils.rs:9-52)."""
    open_tag = f'<Item name="{name}"'
    new_item = f'<Item name="{name}">{xml_escape(value)}</Item>'
    i = xml.find(open_tag)
    if i < 0:
        j = xml.find("</GDALMetadata>")
        if j < 0:
            return f"<GDALMetadata>{new_item}</GDALMetadata>"
        return xml[:j] + new_item + xml[j:]
    j = xml.find("</Item>", i)
    return xml[:i] + new_item + xml[j + len("</Item>"):]


# ---------------------------------------------------------------------------
# X5 — trailing-null trim (src/utils/string_utils.rs:6-10)
# ---------------------------------------------------------------------------

def trim_trailing_nulls(c: Column) -> Column:
    return F.regexp_replace(c, "\x00+$", "")


# ---------------------------------------------------------------------------
# X6/X8 — code→name translators (src/utils/tiff_code_translators.rs:10-73,
# src/tiff/geo_key_parser.rs:299-346); the display-name registries
# ---------------------------------------------------------------------------

COMPRESSION_NAMES = {1: "None", 2: "CCITT RLE", 5: "LZW", 6: "JPEG (old)",
                     7: "JPEG", 8: "Deflate (zlib)", 14: "ZStd",
                     32773: "PackBits"}
PHOTOMETRIC_NAMES = {0: "WhiteIsZero", 1: "BlackIsZero", 2: "RGB",
                     3: "Palette", 4: "Mask", 5: "CMYK", 6: "YCbCr"}
PREDICTOR_NAMES = {1: "None", 2: "Horizontal differencing",
                   3: "Floating point"}
EPSG_DESCRIPTIONS = {
    4326: "WGS 84 geographic (lat/lon)",
    3857: "WGS 84 / Pseudo-Mercator (Web Mercator)",
    3785: "Popular Visualisation CRS / Mercator (deprecated)",
    900913: "Google Web Mercator (unofficial)",
}


def epsg_description(code: int) -> str:
    if code in EPSG_DESCRIPTIONS:
        return EPSG_DESCRIPTIONS[code]
    if 32601 <= code <= 32660:
        return f"WGS 84 / UTM zone {code - 32600}N"
    if 32701 <= code <= 32760:
        return f"WGS 84 / UTM zone {code - 32700}S"
    return f"EPSG:{code}"


# ---------------------------------------------------------------------------
# X7 — well-known TIFF/GeoTIFF tag-name registry.  The reference ships a
# 1785-entry TOML (geotiff_tags.toml); we register the tags the engine
# actually touches, written fresh from the public TIFF 6.0 / GeoTIFF specs.
# ---------------------------------------------------------------------------

TAG_NAMES = {
    256: "ImageWidth", 257: "ImageLength", 258: "BitsPerSample",
    259: "Compression", 262: "PhotometricInterpretation",
    273: "StripOffsets", 274: "Orientation", 277: "SamplesPerPixel",
    278: "RowsPerStrip", 279: "StripByteCounts", 282: "XResolution",
    283: "YResolution", 284: "PlanarConfiguration", 296: "ResolutionUnit",
    305: "Software", 306: "DateTime", 315: "Artist", 317: "Predictor",
    320: "ColorMap", 322: "TileWidth", 323: "TileLength",
    324: "TileOffsets", 325: "TileByteCounts", 338: "ExtraSamples",
    339: "SampleFormat", 254: "NewSubfileType",
    33550: "ModelPixelScaleTag", 33922: "ModelTiepointTag",
    34264: "ModelTransformationTag", 34735: "GeoKeyDirectoryTag",
    34736: "GeoDoubleParamsTag", 34737: "GeoAsciiParamsTag",
    42112: "GDAL_METADATA", 42113: "GDAL_NODATA",
}

GEOKEY_NAMES = {
    1024: "GTModelTypeGeoKey", 1025: "GTRasterTypeGeoKey",
    1026: "GTCitationGeoKey", 2048: "GeographicTypeGeoKey",
    2049: "GeogCitationGeoKey", 2054: "GeogAngularUnitsGeoKey",
    3072: "ProjectedCSTypeGeoKey", 3073: "PCSCitationGeoKey",
    3076: "ProjLinearUnitsGeoKey",
}


def tag_name(tag: int) -> str:
    return TAG_NAMES.get(tag, f"Tag{tag}")
