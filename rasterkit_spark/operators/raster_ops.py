"""RasterKit post-ops and whole-raster ops as DataFrame operators
(SURVEY.md §7 Phase 3).

- :func:`apply_filter` — value-range filter P3 (src/utils/filter_utils.rs).
- :func:`apply_circle_mask` — P5 (src/utils/mask_utils.rs:22-60).
- :func:`apply_colormap_op` — J3/W2 colormap render incl. 255→white and u8
  truncation quirks (src/utils/colormap_utils.rs:26-84).
- :func:`convert_compression` — C5, the offsets-free distributed version of
  src/compression/converter.rs:49-194 (embarrassingly parallel).
- :func:`grayscale_minmax` — A1/A2 as partial (per-chunk numpy) + final
  (groupBy) aggregation (src/utils/tiff_extraction_utils.rs:40-94).
- :func:`build_pyramid` — A5 overview generation (the reference only reads
  overviews, src/tiff/types.rs:35-45): groupBy parent-tile 2×2 box reduce.
- :func:`analyze` — §3.2 metadata describe with code→name translators
  (src/utils/tiff_code_translators.rs:10-73).

All pixel work runs through the shared kernels inside Arrow-batched
``mapInPandas``/``applyInPandas`` — never per-row Python.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (BinaryType, IntegerType, LongType, StringType,
                               StructField, StructType)

from .. import kernels as K


def window_2d(row) -> np.ndarray:
    """Window bytes → 2-D grayscale array, samples_per_pixel-aware.

    RGB (spp=3) windows collapse to luma8 — the reference grayscales
    before every single-band post-op (api.rs:322 ``to_luma``); a plain
    reshape(h, w) on a 3·h·w buffer would just crash.  Other spp raise."""
    h, w = int(row.region_h), int(row.region_w)
    spp = int(getattr(row, "samples_per_pixel", 1) or 1)
    buf = np.frombuffer(bytes(row.window), dtype=np.uint8)
    if spp == 1:
        return buf.reshape(h, w)
    if spp == 3:
        return K.rgb_to_luma8(buf.reshape(h, w, 3))
    raise ValueError(
        f"unsupported samples_per_pixel={spp} (expected 1 or 3)")


def _map_windows(df: DataFrame, fn, extra_fields=()) -> DataFrame:
    """mapInPandas over window rows: fn(np2d, row) → (np2d_out, extras)."""
    fields = [f for f in df.schema.fields]
    out_schema = StructType(fields + list(extra_fields))
    has_spp = "samples_per_pixel" in df.columns

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            new_windows, extras = [], []
            for row in pdf.itertuples():
                out, ex = fn(window_2d(row), row)
                new_windows.append(bytearray(out.tobytes()))
                extras.append(ex)
            pdf = pdf.copy()
            pdf["window"] = new_windows
            if has_spp:  # RGB inputs were luma-collapsed above
                pdf["samples_per_pixel"] = 1
            for i, f_ in enumerate(extra_fields):
                pdf[f_.name] = [e[i] for e in extras]
            yield pdf

    return df.mapInPandas(gen, out_schema)


def to_luma_op(windows: DataFrame) -> DataFrame:
    """P6: collapse multi-sample (RGB) windows to luma8 the way the
    reference does before every filter/colormap step (filter_utils.rs:81,
    tiff_extraction_utils.rs:41, api.rs:322 all call ``image.to_luma8()``
    first).  Grayscale windows pass through byte-identical; the
    ``samples_per_pixel`` column collapses to 1 and ``window_sha256``
    is recomputed."""
    out_schema = windows.schema

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            new_w, new_sha, new_spp = [], [], []
            for row in pdf.itertuples():
                spp = int(getattr(row, "samples_per_pixel", 1) or 1)
                if spp == 1:
                    new_w.append(row.window)
                    new_sha.append(row.window_sha256)
                    new_spp.append(1)
                    continue
                arr = np.frombuffer(bytes(row.window), dtype=np.uint8) \
                    .reshape(int(row.region_h), int(row.region_w), spp)
                luma = K.rgb_to_luma8(arr[..., :3])
                buf = luma.tobytes()
                new_w.append(bytearray(buf))
                new_sha.append(hashlib.sha256(buf).hexdigest())
                new_spp.append(1)
            pdf = pdf.copy()
            pdf["window"] = new_w
            pdf["window_sha256"] = new_sha
            if "samples_per_pixel" in pdf.columns:
                pdf["samples_per_pixel"] = new_spp
            yield pdf

    return windows.mapInPandas(gen, out_schema)


RGB_STATS_SCHEMA = StructType([
    StructField("query_id", StringType()),
    StructField("media_ref", StringType()),
    StructField("vmin", LongType()),
    StructField("vmax", LongType()),
])


def rgb_minmax(windows: DataFrame) -> DataFrame:
    """A2: overall min/max of a window across all sample channels
    (calculate_rgb_stats, src/utils/tiff_extraction_utils.rs:62-94:
    per-channel mins/maxes then min-of-mins / max-of-maxes — equal to the
    global byte min/max of the interleaved buffer).  Works on grayscale
    windows too (degenerates to A1 per-window stats)."""
    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            out = []
            for row in pdf.itertuples():
                buf = np.frombuffer(bytes(row.window), dtype=np.uint8)
                if buf.size == 0:
                    out.append((row.query_id, row.media_ref, -1, -1))
                else:
                    out.append((row.query_id, row.media_ref,
                                int(buf.min()), int(buf.max())))
            yield pd.DataFrame(out, columns=["query_id", "media_ref",
                                             "vmin", "vmax"])

    return windows.mapInPandas(gen, RGB_STATS_SCHEMA)


def apply_filter(windows: DataFrame, lo: int, hi: int,
                 background: int = 0) -> DataFrame:
    """P3: keep v∈[lo,hi] else background (filter_utils.rs:24-54)."""
    sha = StructField("filtered_sha256", StringType())

    def fn(arr, row):
        out = K.filter_values(arr, lo, hi, background)
        return out, (hashlib.sha256(out.tobytes()).hexdigest(),)

    return _map_windows(windows, fn, [sha])


def apply_filter_per_row(windows: DataFrame) -> DataFrame:
    """P3 with per-query lo/hi columns (filter_lo / filter_hi), rows with
    NULL bounds pass through untouched."""
    sha = StructField("filtered_sha256", StringType())

    def fn(arr, row):
        lo = getattr(row, "filter_lo", None)
        hi = getattr(row, "filter_hi", None)
        if lo is None or hi is None or pd.isna(lo) or pd.isna(hi):
            out = arr
        else:
            out = K.filter_values(arr, int(lo), int(hi), 0)
        return out, (hashlib.sha256(out.tobytes()).hexdigest(),)

    return _map_windows(windows, fn, [sha])


def apply_filter_transparency(windows: DataFrame, lo: int, hi: int) -> DataFrame:
    """P3 transparency variant (filter_utils.rs:70-111): out-of-range pixels
    become fully transparent RGBA instead of a background value; output
    column ``window_rgba`` (pairs with the K3 PNG-extension rule)."""
    schema = StructType(windows.schema.fields + [
        StructField("window_rgba", BinaryType()),
        StructField("rgba_sha256", StringType())])

    def gen(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            rgba_col, sha_col = [], []
            for row in pdf.itertuples():
                rgba = K.filter_values_transparency(window_2d(row), lo, hi)
                buf = rgba.tobytes()
                rgba_col.append(bytearray(buf))
                sha_col.append(hashlib.sha256(buf).hexdigest())
            pdf = pdf.copy()
            pdf["window_rgba"] = rgba_col
            pdf["rgba_sha256"] = sha_col
            yield pdf

    return windows.mapInPandas(gen, schema)


def apply_circle_mask(windows: DataFrame) -> DataFrame:
    """P5: RGBA window with transparent pixels outside the inscribed circle
    (mask_utils.rs:22-60); output column ``window_rgba``."""
    schema = StructType(windows.schema.fields + [
        StructField("window_rgba", BinaryType()),
        StructField("rgba_sha256", StringType())])

    def gen(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            rgba_col, sha_col = [], []
            for row in pdf.itertuples():
                rgba = K.apply_circle_mask_rgba(window_2d(row))
                buf = rgba.tobytes()
                rgba_col.append(bytearray(buf))
                sha_col.append(hashlib.sha256(buf).hexdigest())
            pdf = pdf.copy()
            pdf["window_rgba"] = rgba_col
            pdf["rgba_sha256"] = sha_col
            yield pdf

    return windows.mapInPandas(gen, schema)


def apply_colormap_op(windows: DataFrame, colormaps: DataFrame,
                      cmap_col: str = "cmap_id") -> DataFrame:
    """J3/W2: colormap render.  The colormap table is tiny → collected and
    closed over (the broadcast-dict flavor of a broadcast join); entries are
    pre-trimmed/deduped (A3/A4) and sorted, as the reference's loader does
    (src/tiff/colormap.rs:185-189,293-322)."""
    cm_pdf = colormaps.toPandas()
    cmaps = {}
    for cid, grp in cm_pdf.groupby("cmap_id"):
        grp = grp.sort_values("value")
        vals, rgb = K.colormap_trim_and_dedup(
            grp.value.to_numpy(), grp[["r", "g", "b"]].to_numpy())
        cmaps[cid] = (vals, rgb.astype(np.uint8), grp.map_type.iloc[0])

    schema = StructType(windows.schema.fields + [
        StructField("window_rgb", BinaryType()),
        StructField("rgb_sha256", StringType())])

    def gen(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            rgb_col, sha_col = [], []
            for row in pdf.itertuples():
                cid = getattr(row, cmap_col)
                arr = np.frombuffer(bytes(row.window), dtype=np.uint8) \
                    .reshape(int(row.region_h), int(row.region_w))
                if cid is None or (isinstance(cid, float) and pd.isna(cid)) \
                        or cid not in cmaps:
                    rgb = np.repeat(arr[..., None], 3, axis=2)  # gray→RGB
                else:
                    vals, ergb, mtype = cmaps[cid]
                    rgb = K.apply_colormap(arr.astype(np.uint16), vals, ergb,
                                           mtype)
                buf = rgb.tobytes()
                rgb_col.append(bytearray(buf))
                sha_col.append(hashlib.sha256(buf).hexdigest())
            pdf = pdf.copy()
            pdf["window_rgb"] = rgb_col
            pdf["rgb_sha256"] = sha_col
            yield pdf

    return windows.mapInPandas(gen, schema)


# ---------------------------------------------------------------------------
# C5 — compression conversion
# ---------------------------------------------------------------------------

def convert_compression(tiles: DataFrame, catalog: DataFrame,
                        target: int) -> DataFrame:
    """Per-chunk decompress → recompress (src/compression/converter.rs:49-194).
    The reference's sequential offset bookkeeping (converter.rs:113-116)
    disappears: blobs are table-resident.  One narrow mapInPandas — the
    canonical embarrassingly-parallel op at corpus scale."""
    if target not in K.SUPPORTED_COMPRESSIONS:
        raise ValueError(f"Unsupported compression method: {target} "
                         "(supported: 1=none, 8=deflate, 14=zstd — "
                         "src/compression/factory.rs:14-40)")
    meta = catalog.select("media_ref", "compression")
    t = tiles.join(F.broadcast(meta), "media_ref")

    schema = StructType([f for f in tiles.schema.fields
                         if f.name != "byte_count"] +
                        [StructField("byte_count", LongType()),
                         StructField("compression", IntegerType())])

    def gen(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            blobs, counts = [], []
            for row in pdf.itertuples():
                raw = K.decompress(bytes(row.blob), int(row.compression))
                enc = K.compress(raw, target)
                blobs.append(bytearray(enc))
                counts.append(len(enc))
            pdf = pdf.copy()
            pdf["blob"] = blobs
            pdf["byte_count"] = counts
            pdf["compression"] = np.int32(target)
            cols = [f.name for f in schema.fields]
            yield pdf[cols]

    return t.mapInPandas(gen, schema)


# ---------------------------------------------------------------------------
# A1/A2 — min/max stats (partial + final agg)
# ---------------------------------------------------------------------------

CHUNK_STATS_SCHEMA = StructType([
    StructField("media_ref", StringType()),
    StructField("level", IntegerType()),
    StructField("cmin", IntegerType()),
    StructField("cmax", IntegerType()),
])


def grayscale_minmax(tiles: DataFrame, catalog: DataFrame) -> DataFrame:
    """Full-image min/max (tiff_extraction_utils.rs:40-58) as a distributed
    partial+final aggregation: per-chunk numpy min/max (map side), then
    F.min/F.max per raster (reduce side).  Valid-pixel subtlety: edge tiles
    are zero-padded in storage, so per-chunk partials crop padding using the
    image dims before reducing."""
    meta = catalog.select("media_ref", "width", "height", "compression",
                          "predictor", "tile_w", "tile_h", "rows_per_strip")
    t = tiles.join(F.broadcast(meta), "media_ref")

    def gen(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            rows = []
            for row in pdf.itertuples():
                lvl = int(row.level)
                w = int(row.width) >> lvl
                h = int(row.height) >> lvl
                cw = int(row.tile_w) or w
                # NULL rps quirk defaults to the *level* image width
                ch = int(row.tile_h) or (int(row.rows_per_strip) or w)
                chunk = K.decode_chunk(bytes(row.blob), int(row.compression),
                                       int(row.predictor), cw, ch)
                avail = min(ch, len(chunk) // cw)
                arr = chunk[: avail * cw].reshape(avail, cw)
                # crop storage padding beyond image bounds
                x0 = int(row.tile_x) * cw
                y0 = int(row.tile_y) * ch
                arr = arr[: max(0, min(h - y0, avail)),
                          : max(0, min(w - x0, cw))]
                if arr.size == 0:
                    continue
                mn, mx = K.grayscale_stats(arr)
                rows.append((row.media_ref, lvl, mn, mx))
            if rows:
                yield pd.DataFrame(rows, columns=["media_ref", "level",
                                                  "cmin", "cmax"])

    partial = t.mapInPandas(gen, CHUNK_STATS_SCHEMA)
    return (partial.groupBy("media_ref", "level")
            .agg(F.min("cmin").alias("min_sample_value"),
                 F.max("cmax").alias("max_sample_value")))


# ---------------------------------------------------------------------------
# A5 — pyramid generation
# ---------------------------------------------------------------------------

def build_pyramid(tiles: DataFrame, catalog: DataFrame,
                  source_level: int = 0) -> DataFrame:
    """Generate level ``source_level+1`` chunk rows by 2×2 box-reduction.

    Each parent chunk (tx//2, ty//2) gathers its ≤4 source chunks (one
    groupBy = one shuffle per level), crops storage padding to the true
    image bounds, box-reduces (kernels.box_reduce_2x2 — floor average,
    trailing odd row/col dropped), then re-encodes with the raster's own
    predictor + compression so the output rows are indistinguishable from
    stored overview tiles."""
    meta = catalog.select("media_ref", "width", "height", "compression",
                          "predictor", "tile_w", "tile_h", "rows_per_strip")
    # chunk dims at source/target level (columns, so the parent-key mapping
    # is correct even for the NULL-rps quirk where chunk height = level
    # width and therefore differs between levels)
    w_src_c = F.floor(F.col("width") / (1 << source_level)).cast("int")
    cw_s_c = F.when(F.col("tile_w") > 0, F.col("tile_w")).otherwise(w_src_c)
    ch_s_c = F.when(F.col("tile_h") > 0, F.col("tile_h")).otherwise(
        F.when(F.col("rows_per_strip") > 0, F.col("rows_per_strip"))
         .otherwise(w_src_c))
    cw_t_c = F.when(F.col("tile_w") > 0, F.col("tile_w")).otherwise(
        F.floor(w_src_c / 2).cast("int"))
    ch_t_c = F.when(F.col("tile_h") > 0, F.col("tile_h")).otherwise(
        F.when(F.col("rows_per_strip") > 0, F.col("rows_per_strip"))
         .otherwise(F.floor(w_src_c / 2).cast("int")))
    # a source chunk can straddle parent windows (e.g. NULL-rps strips of an
    # odd-width raster: ch_s=17 vs parent row window 2·ch_t=16) → explode it
    # over every parent it overlaps; the assemble-side clip intersects
    # correctly regardless.
    ptx0 = F.floor(F.col("tile_x") * cw_s_c / (cw_t_c * 2)).cast("int")
    ptx1 = F.floor(((F.col("tile_x") + 1) * cw_s_c - 1) / (cw_t_c * 2)).cast("int")
    pty0 = F.floor(F.col("tile_y") * ch_s_c / (ch_t_c * 2)).cast("int")
    pty1 = F.floor(((F.col("tile_y") + 1) * ch_s_c - 1) / (ch_t_c * 2)).cast("int")
    src = (tiles.filter(F.col("level") == source_level)
           .join(F.broadcast(meta), "media_ref")
           .withColumn("ptx", F.explode(F.sequence(ptx0, ptx1)))
           .withColumn("pty", F.explode(F.sequence(pty0, pty1))))

    out_schema = StructType([
        StructField("media_ref", StringType()),
        StructField("level", IntegerType()),
        StructField("tile_x", IntegerType()),
        StructField("tile_y", IntegerType()),
        StructField("tile_idx", LongType()),
        StructField("blob", BinaryType()),
        StructField("byte_count", LongType()),
    ])
    tgt_level = source_level + 1

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        first = pdf.iloc[0]
        lvl = source_level
        w_src = int(first.width) >> lvl
        h_src = int(first.height) >> lvl
        # chunk layout at source and target levels (strips re-derive from
        # the level width — reference quirk default rps = image width)
        tiled = int(first.tile_w) > 0
        if tiled:
            cw_s = int(first.tile_w)
            ch_s = int(first.tile_h)
            cw_t, ch_t = cw_s, ch_s
        else:
            cw_s = w_src
            ch_s = int(first.rows_per_strip) or w_src   # NULL rps quirk
            cw_t = w_src // 2
            ch_t = int(first.rows_per_strip) or (w_src // 2)
        w_tgt, h_tgt = w_src // 2, h_src // 2
        ptx, pty = int(first.ptx), int(first.pty)
        # canvas over the source pixels feeding this parent chunk
        canvas = np.zeros((2 * ch_t, 2 * cw_t), dtype=np.uint8)
        base_x, base_y = ptx * 2 * cw_t, pty * 2 * ch_t
        for row in pdf.itertuples():
            chunk = K.decode_chunk(bytes(row.blob), int(first.compression),
                                   int(first.predictor), cw_s, ch_s)
            K.clip_chunk_into(canvas, chunk, cw_s, ch_s,
                              int(row.tile_x) * cw_s, int(row.tile_y) * ch_s,
                              base_x, base_y, 2 * cw_t, 2 * ch_t)
        # crop to true source extent (kills zero padding), then reduce
        valid_w = max(0, min(2 * cw_t, w_src - base_x))
        valid_h = max(0, min(2 * ch_t, h_src - base_y))
        reduced = K.box_reduce_2x2(canvas[:valid_h, :valid_w])
        # clip to target image dims
        out_w = max(0, min(cw_t, w_tgt - ptx * cw_t))
        out_h = max(0, min(ch_t, h_tgt - pty * ch_t))
        if out_w == 0 or out_h == 0:
            return pd.DataFrame(columns=[f.name for f in out_schema.fields])
        reduced = reduced[:out_h, :out_w]
        if tiled:  # tiles are stored full-size, zero-padded
            store = np.zeros((ch_t, cw_t), dtype=np.uint8)
            store[:out_h, :out_w] = reduced
            enc_h, enc_w = ch_t, cw_t
        else:
            store = reduced
            enc_h, enc_w = out_h, out_w
        flat = store.reshape(-1)
        if int(first.predictor) == K.PREDICTOR_HORIZONTAL:
            flat = K.apply_horizontal_predictor_encode(flat, enc_w, enc_h)
        blob = K.compress(bytes(flat), int(first.compression))
        across_t = (w_tgt + cw_t - 1) // cw_t
        return pd.DataFrame([{
            "media_ref": first.media_ref, "level": tgt_level,
            "tile_x": ptx, "tile_y": pty,
            "tile_idx": pty * across_t + ptx,
            "blob": bytearray(blob), "byte_count": len(blob)}])

    return (src.groupBy("media_ref", "ptx", "pty")
            .applyInPandas(assemble, out_schema))


# ---------------------------------------------------------------------------
# §3.2 — analyze (metadata describe)
# ---------------------------------------------------------------------------

_COMPRESSION_NAMES = {1: "None", 8: "Deflate (zlib)", 14: "ZStd"}
_PREDICTOR_NAMES = {1: "None", 2: "Horizontal differencing"}


def analyze(catalog: DataFrame) -> DataFrame:
    """Per-media metadata summary (src/commands/analyze_command.rs:275-322):
    dims, layout, compression/predictor display names
    (src/utils/tiff_code_translators.rs:10-73), CRS classification and map
    bounds (G10).  Pure metadata — no pixel IO, fully Catalyst."""
    from ..functions import geo

    comp_name = F.element_at(
        F.create_map(*[F.lit(x) for kv in _COMPRESSION_NAMES.items()
                       for x in kv]), F.col("compression"))
    pred_name = F.element_at(
        F.create_map(*[F.lit(x) for kv in _PREDICTOR_NAMES.items()
                       for x in kv]), F.col("predictor"))
    layout = F.when(F.col("media_kind") == "vector", "vector") \
        .when(F.col("tile_w") > 0, "tiled").otherwise("stripped")
    bounds = geo.bounds_cols(F.col("origin_x"), F.col("origin_y"),
                             F.col("width"), F.col("height"),
                             F.col("pixel_sx"), F.col("pixel_sy"))
    return catalog.select(
        "media_ref", "media_kind", "width", "height",
        layout.alias("layout"),
        F.coalesce(comp_name, F.lit("Unknown")).alias("compression_name"),
        F.coalesce(pred_name, F.lit("Unknown")).alias("predictor_name"),
        "epsg", geo.classify_epsg(F.col("epsg")).alias("crs_name"),
        *bounds,
        F.when(F.col("nodata") == "", "255")  # default nodata quirk
         .otherwise(F.regexp_replace("nodata", r"^:w\s*", "")).alias("nodata_value"),
    )
