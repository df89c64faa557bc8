"""Pure-numpy oracle: computes expected outputs for the extraction pipeline
straight from the fixture tables, using the same shared kernels.

In this sandbox the oracle *is* the executable spec (SURVEY.md §5.1 — the
reference ships no golden images); every formula it uses is traced to the
reference by file:line inside :mod:`rasterkit_spark.kernels`.  Where a real
RasterKit binary is available, ``cargo run`` outputs can cross-check it.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from .. import kernels as K
from .corpus import Corpus, chunk_layout


def expected_region(qrow, cat_row) -> tuple[int, int, int, int]:
    """Region via kernels.generic_crs_to_pixel_region (G5/G6/G7)."""
    radius = getattr(qrow, "radius_m", None)
    if radius is not None and (radius != radius):  # NaN
        radius = None
    x, y, w, h = K.generic_crs_to_pixel_region(
        qrow.minx, qrow.miny, qrow.maxx, qrow.maxy,
        cat_row.origin_x, cat_row.pixel_sx,
        cat_row.origin_y, -cat_row.pixel_sy,
        cat_row.width, cat_row.height,
        int(qrow.crs), int(cat_row.epsg),
        radius)
    return int(x), int(y), int(w), int(h)


def expected_tile_assignment(region, cat_row, level: int = 0):
    """Sorted covered tile_idx list (J1/J2 with strips normalized)."""
    x, y, w, h = region
    img_w = cat_row.width >> level
    img_h = cat_row.height >> level
    cw, ch, _ = chunk_layout(img_w, img_h, cat_row.tile_w, cat_row.tile_h,
                             cat_row.rows_per_strip)
    sx, sy, ex, ey = K.tile_range_for_region(x, y, w, h, cw, ch)
    across = int(K.tiles_across(img_w, cw))
    down = (img_h + ch - 1) // ch
    out = []
    for ty in range(int(sy), int(ey)):
        for tx in range(int(sx), int(ex)):
            if tx < across and ty < down:
                out.append(ty * across + tx)
    return sorted(out)


def expected_window(corpus: Corpus, qrow, cat_row, level: int = 0):
    """Clipped window assembled from the *tile blobs* (never the ground-truth
    array directly), exercising the full decode chain."""
    region = expected_region(qrow, cat_row)
    rx, ry, rw, rh = region
    img = corpus.pixels[cat_row.media_ref][level]
    img_h, img_w = img.shape[:2]
    spp = int(getattr(cat_row, "samples_per_pixel", 1) or 1)
    cw, ch, _ = chunk_layout(img_w, img_h, cat_row.tile_w, cat_row.tile_h,
                             cat_row.rows_per_strip)
    tiles = corpus.tiles
    sel = tiles[(tiles.media_ref == cat_row.media_ref) & (tiles.level == level)]
    sx, sy, ex, ey = K.tile_range_for_region(rx, ry, rw, rh, cw, ch)
    out = np.zeros((rh, rw) if spp == 1 else (rh, rw, spp), dtype=np.uint8)
    for trow in sel.itertuples():
        if not (sx <= trow.tile_x < ex and sy <= trow.tile_y < ey):
            continue
        chunk = K.decode_chunk(bytes(trow.blob), cat_row.compression,
                               cat_row.predictor, cw, ch, spp)
        K.clip_chunk_into(out, chunk, cw, ch,
                          trow.tile_x * cw, trow.tile_y * ch, rx, ry, rw, rh,
                          spp)
    new_x, new_y = K.adjust_tiepoint_for_region(
        rx, ry, cat_row.origin_x, cat_row.origin_y,
        cat_row.pixel_sx, cat_row.pixel_sy)
    return dict(region=region, window=out,
                sha256=hashlib.sha256(out.tobytes()).hexdigest(),
                new_origin_x=float(new_x), new_origin_y=float(new_y))


def expected_all_bbox(corpus: Corpus) -> pd.DataFrame:
    """Expected (query_id, media_ref) → region/tiles/sha for every bbox
    query against its raster."""
    cat = corpus.media_catalog.set_index("media_ref", drop=False)
    rows = []
    for q in corpus.queries_bbox.itertuples():
        c = cat.loc[q.media_ref]
        if c.media_kind != "raster":
            continue
        exp = expected_window(corpus, q, c)
        rows.append(dict(
            query_id=q.query_id, media_ref=q.media_ref,
            region_x=exp["region"][0], region_y=exp["region"][1],
            region_w=exp["region"][2], region_h=exp["region"][3],
            tile_idx=expected_tile_assignment(exp["region"], c),
            window_sha256=exp["sha256"],
            new_origin_x=exp["new_origin_x"],
            new_origin_y=exp["new_origin_y"]))
    return pd.DataFrame(rows)


MERC_LIMIT = 20037508.342789244  # functions/cells.py grid frame


def _grid_range(lo: float, hi: float, res: int) -> tuple[int, int]:
    """numpy twin of functions/cells.grid_ix over a [lo, hi] extent."""
    n = 1 << res
    def ix(x):
        return int(min(max(np.floor((x + MERC_LIMIT) / (2 * MERC_LIMIT) * n),
                           0), n - 1))
    return ix(lo), ix(hi)


def expected_zonal(corpus: Corpus, res: int = 6) -> pd.DataFrame:
    """Independent numpy replay of operators/spatial.zonal_stats: cover-cell
    footprint pairing (two bboxes pair iff their res-``res`` Mercator cell
    ranges intersect — identical to sharing ≥1 cover cell), region via the
    shared kernels, PIP mask on ground-truth pixels, min/max/sum/count."""
    from ..operators.spatial import parse_wkt_polygon
    rows = []
    rasters = corpus.media_catalog[corpus.media_catalog.media_kind == "raster"]
    for z in corpus.zones.itertuples():
        xs, ys = parse_wkt_polygon(z.polygon_wkt)
        minx, maxx, miny, maxy = min(xs), max(xs), min(ys), max(ys)
        zmx = K.wgs84_to_webmercator(np.array([minx, maxx]),
                                     np.array([miny, maxy]))
        zxr = _grid_range(zmx[0][0], zmx[0][1], res)
        zyr = _grid_range(zmx[1][0], zmx[1][1], res)
        for c in rasters.itertuples():
            bx0, by1 = c.origin_x, c.origin_y
            bx1 = c.origin_x + c.width * c.pixel_sx
            by0 = c.origin_y - c.height * c.pixel_sy
            if int(c.epsg) == 3857:
                mx0, my0, mx1, my1 = bx0, by0, bx1, by1
            else:
                (mx0, mx1), (my0, my1) = K.wgs84_to_webmercator(
                    np.array([bx0, bx1]), np.array([by0, by1]))
            rxr = _grid_range(mx0, mx1, res)
            ryr = _grid_range(my0, my1, res)
            if rxr[1] < zxr[0] or zxr[1] < rxr[0] or \
               ryr[1] < zyr[0] or zyr[1] < ryr[0]:
                continue  # no shared cover cell → pair absent by contract
            rx, ry, rw, rh = (int(v) for v in K.generic_crs_to_pixel_region(
                minx, miny, maxx, maxy, c.origin_x, c.pixel_sx,
                c.origin_y, -c.pixel_sy, c.width, c.height,
                4326, int(c.epsg), None))
            img = corpus.pixels[c.media_ref][0]
            if img.ndim == 3:  # RGB → luma8 first (A1 grayscale-stats
                img = K.rgb_to_luma8(img)  # semantics; per-pixel, so
            win = img[ry: ry + rh, rx: rx + rw]  # per-tile == whole-image
            gx = c.origin_x + (rx + np.arange(win.shape[1]) + 0.5) * c.pixel_sx
            gy = c.origin_y - (ry + np.arange(win.shape[0]) + 0.5) * c.pixel_sy
            mx, my = np.meshgrid(gx, gy)
            if int(c.epsg) == 3857:
                lon, lat = K.webmercator_to_wgs84(mx.ravel(), my.ravel())
            else:
                lon, lat = mx.ravel(), my.ravel()
            inside = K.points_in_polygon(lon, lat, np.array(xs),
                                         np.array(ys)).reshape(win.shape)
            vals = win[inside]
            if vals.size:
                rows.append(dict(zone_id=z.zone_id, media_ref=c.media_ref,
                                 zmin=int(vals.min()), zmax=int(vals.max()),
                                 zsum=int(vals.sum(dtype=np.int64)),
                                 zcount=int(vals.size)))
            else:
                rows.append(dict(zone_id=z.zone_id, media_ref=c.media_ref,
                                 zmin=-1, zmax=-1, zsum=0, zcount=0))
    return pd.DataFrame(rows)


def oracle_window_check(corpus: Corpus) -> None:
    """Self-check: windows cut from tile blobs must equal direct slices of
    the ground-truth pixel array wherever the region is in-image (the
    decode chain is lossless)."""
    cat = corpus.media_catalog.set_index("media_ref", drop=False)
    for q in corpus.queries_bbox.itertuples():
        c = cat.loc[q.media_ref]
        if c.media_kind != "raster":
            continue
        exp = expected_window(corpus, q, c)
        rx, ry, rw, rh = exp["region"]
        img = corpus.pixels[q.media_ref][0]
        direct = img[ry: ry + rh, rx: rx + rw]
        got = exp["window"][: direct.shape[0], : direct.shape[1]]
        assert np.array_equal(got, direct), (q.query_id, q.media_ref)
