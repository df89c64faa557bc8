"""Coordinate / region math as Spark *Column expressions* (G1-G12).

These are the JVM-side (whole-stage-codegen) twins of the numpy kernels in
:mod:`rasterkit_spark.kernels`.  Same formulas, same reference citations,
same quirks — tests assert the two implementations agree to float precision.
Use these on relational paths (region resolution over millions of query
rows); use the kernels inside ``mapInPandas`` pixel paths.

No UDFs here: everything is built-in ``pyspark.sql.functions``, so Catalyst
can constant-fold, push down, and codegen all of it.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..kernels import (
    EARTH_RADIUS,
    LAT_CLAMP_INLINE,
    LAT_CLAMP_TRANSFORMER,
    MERC_MAX_INLINE,
    METERS_PER_DEG_LAT,
)

DOUBLE = "double"


def _clamp(c: Column, lo: float, hi: float) -> Column:
    return F.least(F.greatest(c, F.lit(float(lo))), F.lit(float(hi)))


# ---------------------------------------------------------------------------
# G1 / G1b / G2 — Mercator
# ---------------------------------------------------------------------------

def merc_x(lon: Column) -> Column:
    """x = lon·R·π/180 (src/coordinate/transform.rs:23)."""
    return lon * F.lit(EARTH_RADIUS * math.pi / 180.0)


def merc_y(lat: Column) -> Column:
    """y = ln(tan((90+lat)·π/360))·R, clamp ±85.05 (transform.rs:20-24)."""
    lat_c = _clamp(lat, -LAT_CLAMP_TRANSFORMER, LAT_CLAMP_TRANSFORMER)
    return F.log(F.tan((F.lit(90.0) + lat_c) * F.lit(math.pi / 360.0))) * F.lit(EARTH_RADIUS)


def merc_x_inline(lon: Column) -> Column:
    """x = lon·20037508.34/180 — the inline region-math variant
    (src/utils/image_extraction_utils.rs:264)."""
    return lon * F.lit(MERC_MAX_INLINE / 180.0)


def merc_y_inline(lat: Column) -> Column:
    """y = ln(tan((lat+90)·π/360))·20037508.34/π, clamp ±85.06
    (src/utils/image_extraction_utils.rs:255-269)."""
    lat_c = _clamp(lat, -LAT_CLAMP_INLINE, LAT_CLAMP_INLINE)
    return (F.log(F.tan((lat_c + F.lit(90.0)) * F.lit(math.pi / 360.0)))
            * F.lit(MERC_MAX_INLINE / math.pi))


def inv_merc_lon(x: Column) -> Column:
    """lon = x·180/(R·π) (transform.rs:32)."""
    return x * F.lit(180.0 / (EARTH_RADIUS * math.pi))


def inv_merc_lat(y: Column) -> Column:
    """lat = (2·atan(e^{y/R}) − π/2)·180/π (transform.rs:33)."""
    return (F.atan(F.exp(y / F.lit(EARTH_RADIUS))) * F.lit(2.0)
            - F.lit(math.pi / 2.0)) * F.lit(180.0 / math.pi)


# ---------------------------------------------------------------------------
# G3/G4 — point + radius → bbox
# ---------------------------------------------------------------------------

def meters_per_lon_degree(lat: Column) -> Column:
    """111320·cos(lat) (src/utils/coordinate_utils.rs:178-184)."""
    return F.lit(METERS_PER_DEG_LAT) * F.cos(F.radians(lat))


def bbox_from_point_radius(x: Column, y: Column, radius: Column,
                           epsg: Column) -> list[Column]:
    """Point+radius → (minx, miny, maxx, maxy), per-CRS
    (src/utils/coordinate_utils.rs:30-154).

    Mercator aliases: ±radius in meters.  4326: lat buffer = r/111320,
    lon buffer = r/(111320·cos(lat)).  Generic CRSes use the ellipsoidal
    average series (coordinate_utils.rs:198-232).
    """
    is_merc = epsg.isin(3857, 3785, 900913)
    is_wgs = epsg == 4326

    lat_buf = radius / F.lit(METERS_PER_DEG_LAT)
    lon_buf = radius / meters_per_lon_degree(y)

    lat_rad = F.radians(F.abs(y))
    lat_len = (F.lit(111_132.92) - F.lit(559.82) * F.cos(lat_rad * 2)
               + F.lit(1.175) * F.cos(lat_rad * 4))
    lon_len = F.lit(111_412.84) * F.cos(lat_rad) - F.lit(93.5) * F.cos(lat_rad * 3)
    generic_buf = radius / ((lat_len + lon_len) / 2)

    def pick(m, w, g):
        return F.when(is_merc, m).when(is_wgs, w).otherwise(g)

    return [
        pick(x - radius, x - lon_buf, x - generic_buf).alias("minx"),
        pick(y - radius, y - lat_buf, y - generic_buf).alias("miny"),
        pick(x + radius, x + lon_buf, x + generic_buf).alias("maxx"),
        pick(y + radius, y + lat_buf, y + generic_buf).alias("maxy"),
    ]


# ---------------------------------------------------------------------------
# G5 — bbox → pixel region (same CRS)
# ---------------------------------------------------------------------------

def region_same_crs(minx: Column, miny: Column, maxx: Column, maxy: Column,
                    origin_x: Column, pixel_w: Column,
                    origin_y: Column, pixel_h: Column,
                    img_w: Column, img_h: Column) -> list[Column]:
    """``convert_same_crs_to_pixels``
    (src/utils/image_extraction_utils.rs:193-223).

    Quirk: floor min_x / ceil max_x in X, but floor on *both* Y conversions.
    Returns [x, y, w, h] long columns aliased region_x/y/w/h.
    """
    min_x_px = F.floor((minx - origin_x) / pixel_w)
    max_y_px = F.floor((miny - origin_y) / pixel_h)
    max_x_px = F.ceil((maxx - origin_x) / pixel_w)
    min_y_px = F.floor((maxy - origin_y) / pixel_h)

    x = F.greatest(F.lit(0), F.least(min_x_px, img_w.cast("long") - 1))
    y = F.greatest(F.lit(0), F.least(min_y_px, img_h.cast("long") - 1))
    w = F.least(F.greatest(max_x_px - min_x_px, F.lit(1)), img_w.cast("long") - x)
    h = F.least(F.greatest(max_y_px - min_y_px, F.lit(1)), img_h.cast("long") - y)
    return [x.alias("region_x"), y.alias("region_y"),
            w.alias("region_w"), h.alias("region_h")]


# ---------------------------------------------------------------------------
# G6 — bbox(4326) → pixel region on a 3857 raster, with fallback
# ---------------------------------------------------------------------------

def region_wgs84_on_mercator(minx: Column, miny: Column,
                             maxx: Column, maxy: Column,
                             origin_x: Column, pixel_w: Column,
                             origin_y: Column, pixel_h: Column,
                             img_w: Column, img_h: Column,
                             radius_m: Column) -> list[Column]:
    """``convert_wgs84_to_web_mercator``
    (src/utils/image_extraction_utils.rs:238-328), including the
    centered-fallback when the projected bbox misses the image entirely
    (lines 294-315: size = trunc(2r/pw) or 1000, saturating placement).
    """
    x_min = merc_x_inline(minx)
    x_max = merc_x_inline(maxx)
    y_min = merc_y_inline(miny)
    y_max = merc_y_inline(maxy)

    iw = img_w.cast("long")
    ih = img_h.cast("long")

    min_x_px = F.floor((x_min - origin_x) / pixel_w)
    max_y_px = F.floor((y_min - origin_y) / pixel_h)
    max_x_px = F.ceil((x_max - origin_x) / pixel_w)
    min_y_px = F.floor((y_max - origin_y) / pixel_h)

    in_bounds = ((min_x_px < iw) & (max_x_px >= 0)
                 & (min_y_px < ih) & (max_y_px >= 0))

    x = F.greatest(F.lit(0), F.least(min_x_px, iw - 1))
    y = F.greatest(F.lit(0), F.least(min_y_px, ih - 1))
    w = F.least(F.greatest(max_x_px - min_x_px, F.lit(1)), iw - x)
    h = F.least(F.greatest(max_y_px - min_y_px, F.lit(1)), ih - y)

    # NaN radius counts as absent, like the numpy twin (a bare CAST(NaN
    # AS BIGINT) would yield 0 — a degenerate region — where the kernel
    # returns the documented 1000-px fallback)
    size = F.when(radius_m.isNull() | F.isnan(radius_m),
                  F.lit(1000).cast("long")) \
            .otherwise((radius_m * 2 / F.abs(pixel_w)).cast("long"))
    # integer semantics: center and half-size use integer division
    # (image_extraction_utils.rs:298,304-305,309-314)
    fb_x = F.greatest((iw / 2).cast("long") - (size / 2).cast("long"), F.lit(0))
    fb_y = F.greatest((ih / 2).cast("long") - (size / 2).cast("long"), F.lit(0))
    fb_w = F.least(size, iw)
    fb_h = F.least(size, ih)

    return [
        F.when(in_bounds, x).otherwise(fb_x).alias("region_x"),
        F.when(in_bounds, y).otherwise(fb_y).alias("region_y"),
        F.when(in_bounds, w).otherwise(fb_w).alias("region_w"),
        F.when(in_bounds, h).otherwise(fb_h).alias("region_h"),
    ]


# ---------------------------------------------------------------------------
# G7 — generic CRS pair: crude transform → same-CRS → bounds adjust
# ---------------------------------------------------------------------------

def region_generic_crs(minx: Column, miny: Column, maxx: Column, maxy: Column,
                       source_epsg: Column,
                       origin_x: Column, pixel_w: Column,
                       origin_y: Column, pixel_h: Column,
                       img_w: Column, img_h: Column,
                       radius_m: Column) -> list[Column]:
    """``generic_crs_to_pixel_region`` non-special-case branch
    (src/utils/image_extraction_utils.rs:126-147): ``try_transform_bbox``
    (4326 → crude meters scaling at center latitude, lines 158-181), then
    same-CRS pixel math, then ``adjust_region_to_image_bounds``
    (lines 341-414: fully-outside/zero → centered fallback of
    clamp(ceil(2r/|pw|), 100, 5000) px, else clip with w/h ≥ 1).
    This path is *approximate by design* — replicated, not fixed.
    """
    is_wgs = source_epsg == 4326
    center_lat = (miny + maxy) / 2
    m_lat = F.lit(METERS_PER_DEG_LAT)
    m_lon = F.lit(METERS_PER_DEG_LAT) * F.cos(F.radians(center_lat))
    tminx = F.when(is_wgs, minx * m_lon).otherwise(minx)
    tmaxx = F.when(is_wgs, maxx * m_lon).otherwise(maxx)
    tminy = F.when(is_wgs, miny * m_lat).otherwise(miny)
    tmaxy = F.when(is_wgs, maxy * m_lat).otherwise(maxy)

    base = region_same_crs(tminx, tminy, tmaxx, tmaxy,
                           origin_x, pixel_w, origin_y, pixel_h, img_w, img_h)
    iw = img_w.cast("long")
    ih = img_h.cast("long")
    x, y, w, h = base[0], base[1], base[2], base[3]

    bad = (x >= iw) | (y >= ih) | (w == 0) | (h == 0)

    size = F.when(
        radius_m.isNull(), F.lit(100).cast("long")
    ).otherwise(
        F.greatest(F.lit(100).cast("long"),
                   F.least(F.lit(5000).cast("long"),
                           F.ceil(radius_m * 2 / F.abs(pixel_w)))))
    center_x = (iw / 2).cast("long")
    center_y = (ih / 2).cast("long")
    half = (size / 2).cast("long")
    fb_x = F.greatest(center_x - half, F.lit(0))
    fb_y = F.greatest(center_y - half, F.lit(0))
    fb_w = F.least(size, iw - fb_x)
    fb_h = F.least(size, ih - fb_y)

    cx = F.when(x >= iw, iw - 1).otherwise(x)
    cy = F.when(y >= ih, ih - 1).otherwise(y)
    cw = F.greatest(F.when(cx + w > iw, iw - cx).otherwise(w), F.lit(1))
    ch = F.greatest(F.when(cy + h > ih, ih - cy).otherwise(h), F.lit(1))

    return [
        F.when(bad, fb_x).otherwise(cx).alias("region_x"),
        F.when(bad, fb_y).otherwise(cy).alias("region_y"),
        F.when(bad, fb_w).otherwise(cw).alias("region_w"),
        F.when(bad, fb_h).otherwise(ch).alias("region_h"),
    ]


def region_dispatch(minx: Column, miny: Column, maxx: Column, maxy: Column,
                    source_epsg: Column, target_epsg: Column,
                    origin_x: Column, pixel_w: Column,
                    origin_y: Column, pixel_h: Column,
                    img_w: Column, img_h: Column,
                    radius_m: Column) -> list[Column]:
    """Full ``generic_crs_to_pixel_region`` dispatch
    (src/utils/image_extraction_utils.rs:104-147): 4326→3857 special case,
    same-CRS direct, otherwise generic.  One Column per region field.
    """
    merc = region_wgs84_on_mercator(minx, miny, maxx, maxy, origin_x, pixel_w,
                                    origin_y, pixel_h, img_w, img_h, radius_m)
    same = region_same_crs(minx, miny, maxx, maxy, origin_x, pixel_w,
                           origin_y, pixel_h, img_w, img_h)
    gen = region_generic_crs(minx, miny, maxx, maxy, source_epsg, origin_x,
                             pixel_w, origin_y, pixel_h, img_w, img_h, radius_m)
    is_merc_case = (source_epsg == 4326) & (target_epsg == 3857)
    is_same = source_epsg == target_epsg
    out = []
    for i, name in enumerate(["region_x", "region_y", "region_w", "region_h"]):
        out.append(F.when(is_merc_case, merc[i])
                    .when(is_same, same[i])
                    .otherwise(gen[i]).alias(name))
    return out


# ---------------------------------------------------------------------------
# G8/G9/G10 — geotransform columns
# ---------------------------------------------------------------------------

def geotransform_cols(scale_x: Column, scale_y: Column,
                      tie_i: Column, tie_j: Column,
                      tie_x: Column, tie_y: Column) -> list[Column]:
    """pw=scale[0], ph=−scale[1], ox=tie[3]−tie[0]·pw, oy=tie[4]+tie[1]·(−ph)
    (src/utils/image_extraction_utils.rs:51-86)."""
    pw = scale_x
    ph = -scale_y
    ox = tie_x - tie_i * pw
    oy = tie_y + tie_j * (-ph)
    return [ox.alias("origin_x"), pw.alias("pixel_w"),
            oy.alias("origin_y"), ph.alias("pixel_h")]


def adjusted_tiepoint_cols(region_x: Column, region_y: Column,
                           origin_x: Column, origin_y: Column,
                           scale_x: Column, scale_y: Column) -> list[Column]:
    """New map origin of an extracted window
    (src/tiff/builders/geo_tags.rs:144-146)."""
    return [
        (origin_x + region_x.cast(DOUBLE) * scale_x).alias("new_origin_x"),
        (origin_y - region_y.cast(DOUBLE) * F.abs(scale_y)).alias("new_origin_y"),
    ]


def bounds_cols(origin_x: Column, origin_y: Column,
                width: Column, height: Column,
                px: Column, py: Column) -> list[Column]:
    """(minx, miny, maxx, maxy) of a raster footprint
    (src/tiff/geo_key_parser.rs:435-446)."""
    return [
        origin_x.alias("minx"),
        (origin_y - height.cast(DOUBLE) * py).alias("miny"),
        (origin_x + width.cast(DOUBLE) * px).alias("maxx"),
        origin_y.alias("maxy"),
    ]


# ---------------------------------------------------------------------------
# J1/J2 — chunk range columns
# ---------------------------------------------------------------------------

def tile_range_cols(region_x: Column, region_y: Column,
                    region_w: Column, region_h: Column,
                    tile_w: Column, tile_h: Column) -> list[Column]:
    """Covered tile ranges, half-open (src/extractor/tile_reader.rs:148-152)."""
    end_x = region_x + region_w
    end_y = region_y + region_h
    return [
        (region_x / tile_w).cast("long").alias("start_tile_x"),
        (region_y / tile_h).cast("long").alias("start_tile_y"),
        ((end_x + tile_w - 1) / tile_w).cast("long").alias("end_tile_x"),
        ((end_y + tile_h - 1) / tile_h).cast("long").alias("end_tile_y"),
    ]


def strip_range_cols(region_y: Column, region_h: Column,
                     rows_per_strip: Column) -> list[Column]:
    """Covered strips (src/extractor/strip_reader.rs:147-149)."""
    end_y = region_y + region_h
    return [
        (region_y / rows_per_strip).cast("long").alias("start_strip"),
        ((end_y + rows_per_strip - 1) / rows_per_strip).cast("long").alias("end_strip"),
    ]


# ---------------------------------------------------------------------------
# G12 — EPSG classification
# ---------------------------------------------------------------------------

def classify_epsg(epsg: Column) -> Column:
    """WGS84 / WebMercator / UTM / Other (src/coordinate/crs.rs:57-65)."""
    return (F.when(epsg == 4326, F.lit("WGS84"))
             .when(epsg.isin(3857, 3785, 900913), F.lit("WebMercator"))
             .when((epsg >= 32601) & (epsg <= 32660), F.lit("UTM-North"))
             .when((epsg >= 32701) & (epsg <= 32760), F.lit("UTM-South"))
             .otherwise(F.lit("Other")))
