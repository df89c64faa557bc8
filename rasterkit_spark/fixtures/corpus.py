"""Deterministic synthetic corpus generators (FIXTURES.md).

All tables are seeded (seed=42 default), scale-parameterized, and built as
pandas DataFrames (converted to Spark via ``to_spark``).  The pixel payloads
are produced with the *same* kernels the engine decodes with
(:mod:`rasterkit_spark.kernels`), so fixtures are bit-exact by construction:
``v(x, y) = (a·x + b·y + hash(media_ref)) mod 256`` (FIXTURES.md §3), split
into 16×16 tiles or strips, predictor-encoded, then deflate/none compressed.

The ``docs`` table has the exact BASELINE.json ``input_hint`` shape:
``(doc_id:string, spans:array<struct<kind,text,media_ref,offset>>)`` with
media refs drawn Zipf(α=1.2) so some refs (hence some cells) are hot.
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from .. import kernels as K

SEED = 42

# Explicit Spark schemas for every fixture table.  Bare
# ``spark.createDataFrame(pdf)`` infers types from the data, and an all-None
# column (e.g. queries_bbox.radius_m — every bbox row carries radius_m=None)
# raises CANNOT_DETERMINE_TYPE on sessions without the Arrow fallback
# (the round-1 driver gate crash).  The DDL strings below pin a concrete
# type for every column so conversion never depends on the data.
_SCHEMAS = {
    "media_catalog": (
        "media_ref string, media_kind string, width int, height int,"
        " tile_w int, tile_h int, rows_per_strip int, epsg int,"
        " pixel_sx double, pixel_sy double, origin_x double, origin_y double,"
        " compression int, predictor int, nodata string, bits_per_sample int,"
        " samples_per_pixel int, geometry_wkt string"
    ),
    "tiles": (
        "media_ref string, level int, tile_x int, tile_y int, tile_idx int,"
        " blob binary, byte_count int"
    ),
    "docs": (
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>"
    ),
    "colormaps": (
        "cmap_id string, map_type string, value int, r int, g int, b int,"
        " label string"
    ),
    "queries_bbox": (
        "query_id string, media_ref string, minx double, miny double,"
        " maxx double, maxy double, crs int, proj int, filter_lo int,"
        " filter_hi int, filter_transparency boolean, cmap_id string,"
        " shape string, radius_m double"
    ),
    "queries_point": (
        "query_id string, media_ref string, x double, y double,"
        " radius_m double, shape string, crs int, proj int, filter_lo int,"
        " filter_hi int, filter_transparency boolean, cmap_id string, k int"
    ),
    "queries_polygon": "query_id string, polygon_wkt string, crs int, k int",
    "zones": "zone_id string, polygon_wkt string, epsg int",
}

_INT_TYPES = (int, np.integer)
_FLOAT_TYPES = (float, np.floating)


def _py(v, kind: str):
    """Numpy scalar / NaN → plain-Python value of the schema's type.

    pandas widens int columns containing None to float64 (``proj`` becomes
    3857.0/NaN), and Spark's schema verifier rejects floats for IntegerType
    — so coercion must follow the declared column type, not the pandas one.
    """
    if v is None:
        return None
    if isinstance(v, _FLOAT_TYPES) and math.isnan(float(v)):
        return None
    if kind == "int":
        return int(v)
    if kind == "double":
        return float(v)
    if kind == "boolean":
        return bool(v)
    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(v, _INT_TYPES):
        return int(v)
    if isinstance(v, _FLOAT_TYPES):
        return float(v)
    return v


def _col_kinds(ddl: str) -> list[str]:
    """Column base types from a flat DDL string (``array<…>`` has no
    top-level commas in our schemas' nesting — split is on ', ' pairs)."""
    kinds = []
    depth = 0
    piece = ""
    for ch in ddl + ",":
        if ch == "," and depth == 0:
            name_type = piece.strip().split(None, 1)
            kinds.append(name_type[1].strip().lower())
            piece = ""
            continue
        depth += ch in "<("
        depth -= ch in ">)"
        piece += ch
    return kinds


def _records(pdf: pd.DataFrame, ddl: str):
    kinds = _col_kinds(ddl)
    assert len(kinds) == len(pdf.columns), (kinds, list(pdf.columns))
    return [tuple(_py(v, k) for v, k in zip(row, kinds))
            for row in pdf.itertuples(index=False, name=None)]

_WORDS = ("the raster tile span doc joins scan merge cell index zonal knn "
          "window clip region bbox mercator pixel strip overview colormap "
          "predictor deflate grid quad face hilbert level").split()


def _ref_hash(media_ref: str) -> int:
    return int.from_bytes(hashlib.sha256(media_ref.encode()).digest()[:4], "little")


def raster_pixels(media_ref: str, width: int, height: int,
                  a: int, b: int) -> np.ndarray:
    """FIXTURES.md §3 pixel law — gradient-rich, deterministic."""
    xs = np.arange(width, dtype=np.int64)[None, :]
    ys = np.arange(height, dtype=np.int64)[:, None]
    return ((a * xs + b * ys + _ref_hash(media_ref)) % 256).astype(np.uint8)


def raster_pixels_rgb(media_ref: str, width: int, height: int,
                      a: int, b: int) -> np.ndarray:
    """3-channel extension of the pixel law: channel c adds 71·c —
    channels are distinct but equally gradient-rich.  Shape (h, w, 3)."""
    xs = np.arange(width, dtype=np.int64)[None, :, None]
    ys = np.arange(height, dtype=np.int64)[:, None, None]
    cs = np.arange(3, dtype=np.int64)[None, None, :]
    return ((a * xs + b * ys + 71 * cs + _ref_hash(media_ref)) % 256) \
        .astype(np.uint8)


@dataclass
class Corpus:
    media_catalog: pd.DataFrame
    tiles: pd.DataFrame
    docs: pd.DataFrame
    colormaps: pd.DataFrame
    queries_bbox: pd.DataFrame
    queries_point: pd.DataFrame
    queries_polygon: pd.DataFrame
    zones: pd.DataFrame
    pixels: dict = field(default_factory=dict)  # media_ref -> level -> np.ndarray

    def to_spark(self, spark, names=None):
        out = {}
        for name in (names or ["media_catalog", "tiles", "docs", "colormaps",
                               "queries_bbox", "queries_point",
                               "queries_polygon", "zones"]):
            pdf = getattr(self, name)
            ddl = _SCHEMAS[name]
            out[name] = spark.createDataFrame(_records(pdf, ddl), ddl)
        return out


def make_media_catalog(n_media: int = 12, seed: int = SEED,
                       sizes=(17, 32, 48, 64),
                       rgb_every: int = 0, tile_size: int = 16,
                       rps_choices=(4, 8, 16),
                       null_rps_every: int = 6) -> pd.DataFrame:
    """``rgb_every > 0`` makes every ``rgb_every``-th raster a 3-sample
    (interleaved RGB) image — 0 keeps the historical all-grayscale corpus
    so existing VALUES oracles stay stable.  ``tile_size``/``rps_choices``
    set the chunk geometry (COG-scale benches use 256-px tiles; the
    16-px default keeps the tiny parity corpora multi-tile)."""
    rng = np.random.default_rng(seed)
    rows = []
    strip_idx = 0
    for j in range(n_media):
        media_ref = f"m_{j:08d}"
        kind = "vector" if j % 4 == 3 else "raster"
        if kind == "vector":
            # simple polygon around a deterministic center (4326)
            cx = float(rng.uniform(-170, 170))
            cy = float(rng.uniform(-80, 80))
            r = float(rng.uniform(0.1, 2.0))
            pts = [(cx + r * np.cos(t), cy + r * np.sin(t))
                   for t in np.linspace(0, 2 * np.pi, 7)[:-1]]
            wkt = "POLYGON((" + ", ".join(f"{x:.6f} {y:.6f}" for x, y in pts)
            wkt += f", {pts[0][0]:.6f} {pts[0][1]:.6f}))"
            rows.append(dict(
                media_ref=media_ref, media_kind=kind, width=0, height=0,
                tile_w=0, tile_h=0, rows_per_strip=0, epsg=4326,
                pixel_sx=0.0, pixel_sy=0.0, origin_x=0.0, origin_y=0.0,
                compression=1, predictor=1, nodata="", bits_per_sample=8,
                samples_per_pixel=1, geometry_wkt=wkt))
            continue
        width = int(rng.choice(sizes))
        height = int(rng.choice(sizes))
        tiled = j % 3 != 2
        rps = 0
        tile_w = tile_h = 0
        if tiled:
            tile_w = tile_h = tile_size
        else:
            # include the NULL case → reference quirk default = image WIDTH
            # (null_rps_every=0 disables: at 2048-px bench geometry the
            # quirk makes one whole-image 4 MB chunk — a deliberate skew
            # monster that belongs in parity corpora, not throughput runs)
            # every null_rps_every-th STRIP raster (counter, first slot
            # null): the old `j % null_rps_every == 5` trigger silently
            # produced ZERO null-rps rasters for any value <= 5 (and for
            # 4 it could only land on vector slots, j % 4 == 3)
            is_null = (bool(null_rps_every)
                       and strip_idx % null_rps_every == 0)
            strip_idx += 1
            rps = 0 if is_null else int(rng.choice(list(rps_choices)))
        epsg = 3857 if j % 2 == 0 else 4326
        if epsg == 3857:
            pixel_s = float(rng.choice([50.0, 100.0, 200.0]))
            origin_x = float(rng.uniform(-2e6, 2e6))
            origin_y = float(rng.uniform(-2e6, 2e6))
        else:
            pixel_s = float(rng.choice([0.01, 0.005]))
            origin_x = float(rng.uniform(-170, 160))
            origin_y = float(rng.uniform(-70, 80))
        # full reference codec set {1: none, 8: deflate, 14: zstd}
        # (zstd runs on the pyarrow-bundled codec when the wheel is absent)
        compression = int([1, 8, 14][j % 3]) if K._HAVE_ZSTD \
            else int([1, 8, 8][j % 3])
        predictor = int([1, 2][j % 2])
        nodata = ["255", "", ":w 255", "0"][j % 4]
        spp = 3 if (rgb_every and j % rgb_every == 1) else 1
        rows.append(dict(
            media_ref=media_ref, media_kind=kind, width=width, height=height,
            tile_w=tile_w, tile_h=tile_h, rows_per_strip=rps, epsg=epsg,
            pixel_sx=pixel_s, pixel_sy=pixel_s, origin_x=origin_x,
            origin_y=origin_y, compression=compression, predictor=predictor,
            nodata=nodata, bits_per_sample=8, samples_per_pixel=spp,
            geometry_wkt=""))
    return pd.DataFrame(rows)


def chunk_layout(width: int, height: int, tile_w: int, tile_h: int,
                 rows_per_strip: int):
    """Normalize strips into the tile model: strips are tiles with
    tile_w = image width (the J1/J2 range formulas coincide then).
    rows_per_strip == 0 (NULL) triggers the reference quirk: default =
    image **width** (src/extractor/strip_reader.rs:67-68).
    """
    if tile_w:
        return tile_w, tile_h, True
    rps = rows_per_strip or int(K.default_rows_per_strip(width))
    return width, rps, False


def make_tiles(catalog: pd.DataFrame, levels: int = 3, seed: int = SEED):
    """Tile/strip payload rows + the ground-truth pixel arrays per level."""
    rng = np.random.default_rng(seed + 1)
    rows = []
    pixels: dict[str, dict[int, np.ndarray]] = {}
    for rec in catalog.itertuples():
        if rec.media_kind != "raster":
            continue
        a, b = int(rng.integers(1, 9)), int(rng.integers(1, 9))
        spp = int(getattr(rec, "samples_per_pixel", 1) or 1)
        if spp == 3:
            base = raster_pixels_rgb(rec.media_ref, rec.width, rec.height,
                                     a, b)
        else:
            base = raster_pixels(rec.media_ref, rec.width, rec.height, a, b)
        pixels[rec.media_ref] = {0: base}
        for lvl in range(1, levels):
            prev = pixels[rec.media_ref][lvl - 1]
            if prev.shape[0] < 2 or prev.shape[1] < 2:
                break
            if spp == 3:
                pixels[rec.media_ref][lvl] = np.stack(
                    [K.box_reduce_2x2(prev[..., c]) for c in range(3)],
                    axis=-1)
            else:
                pixels[rec.media_ref][lvl] = K.box_reduce_2x2(prev)
        for lvl, img in pixels[rec.media_ref].items():
            h, w = img.shape[:2]
            cw, ch, tiled = chunk_layout(w, h, rec.tile_w, rec.tile_h,
                                         rec.rows_per_strip)
            tiles_across = (w + cw - 1) // cw
            tiles_down = (h + ch - 1) // ch
            for ty in range(tiles_down):
                for tx in range(tiles_across):
                    if tiled:
                        # tiles are full-size, zero-padded at edges (TIFF)
                        shape = (ch, cw) if spp == 1 else (ch, cw, spp)
                        chunk = np.zeros(shape, dtype=np.uint8)
                        sub = img[ty * ch: (ty + 1) * ch, tx * cw: (tx + 1) * cw]
                        chunk[: sub.shape[0], : sub.shape[1]] = sub
                        flat = chunk.reshape(-1)
                        enc_h = ch
                    else:
                        # strips: last strip holds only the remaining rows
                        sub = img[ty * ch: (ty + 1) * ch]
                        flat = sub.reshape(-1)
                        enc_h = sub.shape[0]
                    if rec.predictor == K.PREDICTOR_HORIZONTAL:
                        flat = K.apply_horizontal_predictor_encode(
                            flat, cw, enc_h, spp)
                    blob = K.compress(bytes(flat), rec.compression)
                    rows.append(dict(
                        media_ref=rec.media_ref, level=lvl, tile_x=tx,
                        tile_y=ty, tile_idx=ty * tiles_across + tx,
                        blob=bytearray(blob), byte_count=len(blob)))
    return pd.DataFrame(rows), pixels


def make_docs(catalog: pd.DataFrame, n_docs: int = 200,
              seed: int = SEED) -> pd.DataFrame:
    """input_hint-shaped docs with Zipf-hot media refs."""
    rng = np.random.default_rng(seed + 2)
    refs = catalog.media_ref.tolist()
    # Zipf(1.2) ranks over the catalog
    ranks = np.arange(1, len(refs) + 1, dtype=np.float64)
    probs = ranks ** -1.2
    probs /= probs.sum()
    rows = []
    for i in range(n_docs):
        doc_rng = np.random.default_rng((seed ^ _ref_hash(f"doc_{i:012d}")) & 0x7FFFFFFF)
        n_spans = int(doc_rng.integers(1, 9))
        has_media = doc_rng.uniform() < 0.6
        spans = []
        offset = 0
        for s in range(n_spans):
            is_media = has_media and (s == n_spans - 1 or doc_rng.uniform() < 0.3)
            if is_media:
                ref = refs[int(doc_rng.choice(len(refs), p=probs))]
                spans.append(dict(kind="media", text="", media_ref=ref,
                                  offset=offset))
                offset += 1
            else:
                words = doc_rng.choice(_WORDS, size=int(doc_rng.integers(2, 8)))
                text = " ".join(words)
                spans.append(dict(kind="text", text=text, media_ref="",
                                  offset=offset))
                offset += len(text) + 1
        rows.append(dict(doc_id=f"doc_{i:012d}", spans=spans))
    return pd.DataFrame(rows)


def make_colormaps(seed: int = SEED) -> pd.DataFrame:
    rng = np.random.default_rng(seed + 3)
    rows = []
    for cmap_id, map_type in [("cm_ramp", "ramp"), ("cm_values", "values"),
                              ("cm_intervals", "intervals")]:
        values = sorted(rng.choice(np.arange(1, 255), size=8, replace=False))
        values = [0] + [int(v) for v in values]
        for i, v in enumerate(values):
            if i == 0:
                r = g = b = 0  # leading-black (trim case)
            elif i == 3:
                r, g, b = rows[-1]["r"], rows[-1]["g"], rows[-1]["b"]  # dup color
            else:
                r, g, b = (int(x) for x in rng.integers(0, 256, 3))
            rows.append(dict(cmap_id=cmap_id, map_type=map_type, value=int(v),
                             r=r, g=g, b=b,
                             label=f"{cmap_id}_{v}" if i % 2 else None))
    return pd.DataFrame(rows)


def make_queries(catalog: pd.DataFrame, n_per_kind: int = 25,
                 seed: int = SEED):
    """bbox / point / polygon query tables, covering: inside / partial /
    fully-outside (fallback), high-lat clamp, degenerate zero-area,
    filter and colormap combos (FIXTURES.md §5)."""
    rng = np.random.default_rng(seed + 4)
    rasters = catalog[catalog.media_kind == "raster"]

    bbox_rows, point_rows, poly_rows = [], [], []
    recs = list(rasters.itertuples())
    for i in range(n_per_kind):
        rec = recs[i % len(recs)]
        # raster footprint in its own CRS
        fw = rec.width * rec.pixel_sx
        fh = rec.height * rec.pixel_sy
        mode = i % 5
        if mode == 0:    # fully inside
            x0 = rec.origin_x + fw * 0.25
            y1 = rec.origin_y - fh * 0.25
            x1 = x0 + fw * 0.4
            y0 = y1 - fh * 0.4
        elif mode == 1:  # partial overlap
            x0 = rec.origin_x - fw * 0.3
            y1 = rec.origin_y + fh * 0.2
            x1 = x0 + fw * 0.7
            y0 = y1 - fh * 0.6
        elif mode == 2:  # fully outside → fallback path
            x0 = rec.origin_x + fw * 3
            y1 = rec.origin_y - fh * 3
            x1 = x0 + fw * 0.5
            y0 = y1 - fh * 0.5
        elif mode == 3:  # degenerate zero-area
            x0 = x1 = rec.origin_x + fw * 0.5
            y0 = y1 = rec.origin_y - fh * 0.5
        else:            # thin sliver
            x0 = rec.origin_x + fw * 0.1
            y1 = rec.origin_y - fh * 0.45
            x1 = x0 + fw * 0.8
            y0 = y1 - rec.pixel_sy * 1.5
        # crs: express bbox in raster CRS (same-crs path), or in 4326 when
        # the raster is 3857 (the flagship 4326→3857 path)
        if rec.epsg == 3857 and i % 2 == 0:
            lon0, lat0 = K.webmercator_to_wgs84(np.array([x0]), np.array([y0]))
            lon1, lat1 = K.webmercator_to_wgs84(np.array([x1]), np.array([y1]))
            crs = 4326
            x0, y0, x1, y1 = float(lon0[0]), float(lat0[0]), float(lon1[0]), float(lat1[0])
        else:
            crs = rec.epsg
        if i == 7:
            # high-latitude clamp case: MUST target a 3857 raster so the
            # 4326 bbox takes the G6 inline-Mercator (±85.06 clamp) path —
            # recs[7] happens to be 4326 in both standard corpora, which
            # silently routed this query down the same-CRS path and left
            # the clamp quirk with zero fixture coverage
            merc = [r for r in recs if r.epsg == 3857]
            if merc:
                rec = merc[0]
            crs, x0, y0, x1, y1 = 4326, -10.0, 84.9, -9.0, 89.9
        bbox_rows.append(dict(
            query_id=f"qb_{i:04d}", media_ref=rec.media_ref,
            minx=float(x0), miny=float(y0), maxx=float(x1), maxy=float(y1),
            crs=int(crs), proj=3857 if i % 6 == 0 else None,
            filter_lo=int(40) if i % 3 == 0 else None,
            filter_hi=int(200) if i % 3 == 0 else None,
            filter_transparency=bool(i % 4 == 0),
            cmap_id=["cm_ramp", "cm_values", None][i % 3],
            shape="square", radius_m=None))

        # point queries with radius
        cx = rec.origin_x + fw * float(rng.uniform(0.2, 0.8))
        cy = rec.origin_y - fh * float(rng.uniform(0.2, 0.8))
        if rec.epsg == 3857 and i % 2 == 1:
            lon, lat = K.webmercator_to_wgs84(np.array([cx]), np.array([cy]))
            px_, py_, crs_p = float(lon[0]), float(lat[0]), 4326
            radius = float(rng.uniform(0.5, 3) * rec.pixel_sx * rec.width / 2)
        else:
            px_, py_, crs_p = cx, cy, rec.epsg
            radius = float(rng.uniform(0.2, 0.6) * fw / 2)
            if rec.epsg == 4326:
                radius = radius * 111_320.0  # degrees → meters-ish scale
        point_rows.append(dict(
            query_id=f"qp_{i:04d}", media_ref=rec.media_ref,
            x=px_, y=py_, radius_m=radius,
            shape="circle" if i % 2 else "square", crs=int(crs_p),
            proj=None, filter_lo=None, filter_hi=None,
            filter_transparency=False, cmap_id=None, k=int([1, 5, 10][i % 3])))

        # polygon queries in 4326 (convex hexagon / concave L)
        pcx = float(rng.uniform(-60, 60))
        pcy = float(rng.uniform(-50, 50))
        if i % 3 == 2:  # concave L
            pts = [(pcx, pcy), (pcx + 4, pcy), (pcx + 4, pcy + 2),
                   (pcx + 2, pcy + 2), (pcx + 2, pcy + 4), (pcx, pcy + 4)]
        else:
            r = float(rng.uniform(1, 6))
            pts = [(pcx + r * np.cos(t), pcy + r * np.sin(t))
                   for t in np.linspace(0, 2 * np.pi, 7)[:-1]]
        wkt = "POLYGON((" + ", ".join(f"{x:.6f} {y:.6f}" for x, y in pts)
        wkt += f", {pts[0][0]:.6f} {pts[0][1]:.6f}))"
        poly_rows.append(dict(query_id=f"qg_{i:04d}", polygon_wkt=wkt,
                              crs=4326, k=int([1, 5, 10][i % 3])))

    return (pd.DataFrame(bbox_rows), pd.DataFrame(point_rows),
            pd.DataFrame(poly_rows))


def make_zones(catalog: pd.DataFrame | None = None, n_zones: int = 8,
               seed: int = SEED) -> pd.DataFrame:
    """Zones anchored over raster footprints (so zonal stats have pixels
    to aggregate), expressed in 4326."""
    rng = np.random.default_rng(seed + 5)
    rasters = (catalog[catalog.media_kind == "raster"].reset_index(drop=True)
               if catalog is not None else None)
    rows = []
    for z in range(n_zones):
        if rasters is not None:
            rec = rasters.iloc[z % len(rasters)]
            fw = rec.width * rec.pixel_sx
            fh = rec.height * rec.pixel_sy
            ccx = rec.origin_x + fw * float(rng.uniform(0.3, 0.7))
            ccy = rec.origin_y - fh * float(rng.uniform(0.3, 0.7))
            if rec.epsg == 3857:
                lon, lat = K.webmercator_to_wgs84(np.array([ccx]), np.array([ccy]))
                cx, cy = float(lon[0]), float(lat[0])
                # radius ~ a chunk of the footprint, in degrees
                r = float(fw * rng.uniform(0.2, 0.5) / 111_320.0
                          / max(np.cos(np.radians(cy)), 0.2))
            else:
                cx, cy = float(ccx), float(ccy)
                r = float(max(fw, fh) * rng.uniform(0.2, 0.5))
        else:
            cx = float(rng.uniform(-60, 60))
            cy = float(rng.uniform(-50, 50))
            r = float(rng.uniform(2, 10))
        pts = [(cx + r * np.cos(t), cy + r * np.sin(t))
               for t in np.linspace(0, 2 * np.pi, 9)[:-1]]
        wkt = "POLYGON((" + ", ".join(f"{x:.6f} {y:.6f}" for x, y in pts)
        wkt += f", {pts[0][0]:.6f} {pts[0][1]:.6f}))"
        rows.append(dict(zone_id=f"z_{z:03d}", polygon_wkt=wkt, epsg=4326))
    return pd.DataFrame(rows)


def build_corpus(n_media: int = 12, n_docs: int = 200,
                 n_queries: int = 25, seed: int = SEED,
                 sizes=(17, 32, 48, 64), rgb_every: int = 0,
                 tile_size: int = 16, rps_choices=(4, 8, 16),
                 levels: int = 3, null_rps_every: int = 6) -> Corpus:
    catalog = make_media_catalog(n_media, seed, sizes=sizes,
                                 rgb_every=rgb_every, tile_size=tile_size,
                                 rps_choices=rps_choices,
                                 null_rps_every=null_rps_every)
    tiles, pixels = make_tiles(catalog, levels=levels, seed=seed)
    docs = make_docs(catalog, n_docs, seed)
    colormaps = make_colormaps(seed)
    qb, qp, qg = make_queries(catalog, n_queries, seed)
    zones = make_zones(catalog, seed=seed)
    return Corpus(media_catalog=catalog, tiles=tiles, docs=docs,
                  colormaps=colormaps, queries_bbox=qb, queries_point=qp,
                  queries_polygon=qg, zones=zones, pixels=pixels)
