"""Unit tests for the shared numpy kernels (the executable spec).

Scalar re-implementations in this file are written straight from the
reference source (file:line cited in kernels.py) and checked against the
vectorized kernels, plus Hypothesis property checks.
"""

import math
import zlib

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from rasterkit_spark import kernels as K


# ---------------------------------------------------------------------------
# Mercator
# ---------------------------------------------------------------------------

def scalar_merc_inline(lon, lat):
    lat = max(-85.06, min(85.06, lat))
    x = lon * 20037508.34 / 180.0
    y = math.log(math.tan((lat + 90.0) * math.pi / 360.0)) * 20037508.34 / math.pi
    return x, y


@given(st.floats(-180, 180), st.floats(-90, 90))
@settings(max_examples=200, deadline=None)
def test_merc_inline_matches_scalar(lon, lat):
    x, y = K.wgs84_to_webmercator_inline(np.array([lon]), np.array([lat]))
    sx, sy = scalar_merc_inline(lon, lat)
    assert x[0] == pytest.approx(sx, rel=1e-12, abs=1e-9)
    # Conditioning-aware tolerance for y.  Near lat≈0 the formula is
    # y = C·log(tan(θ)) with tan(θ)≈1, so log(1+ε) amplifies a 1-ulp libm
    # difference (numpy SIMD tan vs math.tan) by C = 20037508.34/π ≈ 6.4e6:
    # one ulp of 1.0 (2.22e-16) becomes ~1.4e-9 m absolute.  Allow ~16 ulps
    # of tan slack (≈2.3e-8 m — a few nanometers on the ground); the same
    # slack exists vs the Rust reference's libm and can only perturb the
    # floor/ceil region math if a region edge lands within ~1e-8 m of a
    # pixel boundary, which the fixtures never do (see kernels.py
    # wgs84_to_webmercator_inline docstring).
    ulp_amp = 16 * 2.220446049250313e-16 * 20037508.34 / math.pi
    assert y[0] == pytest.approx(sy, rel=1e-12, abs=ulp_amp)


@given(st.floats(-180, 180), st.floats(-85, 85))
@settings(max_examples=200, deadline=None)
def test_merc_roundtrip(lon, lat):
    x, y = K.wgs84_to_webmercator(np.array([lon]), np.array([lat]))
    lon2, lat2 = K.webmercator_to_wgs84(x, y)
    assert lon2[0] == pytest.approx(lon, abs=1e-6)
    assert lat2[0] == pytest.approx(lat, abs=1e-6)


def test_two_clamp_constants_differ():
    # The reference has two clamps (85.05 vs 85.06); both paths must exist.
    _, y_t = K.wgs84_to_webmercator(0.0, 89.0)
    _, y_i = K.wgs84_to_webmercator_inline(0.0, 89.0)
    assert y_t != y_i


# ---------------------------------------------------------------------------
# Region math
# ---------------------------------------------------------------------------

def scalar_same_crs(minx, miny, maxx, maxy, ox, pw, oy, ph, iw, ih):
    min_x_pixel = math.floor((minx - ox) / pw)
    max_y_pixel = math.floor((miny - oy) / ph)
    max_x_pixel = math.ceil((maxx - ox) / pw)
    min_y_pixel = math.floor((maxy - oy) / ph)
    x = max(0, min(min_x_pixel, iw - 1))
    y = max(0, min(min_y_pixel, ih - 1))
    w = min(max(max_x_pixel - min_x_pixel, 1), iw - x)
    h = min(max(max_y_pixel - min_y_pixel, 1), ih - y)
    return x, y, w, h


@given(st.floats(-1000, 1000), st.floats(-1000, 1000),
       st.floats(0.1, 100), st.floats(0.1, 100))
@settings(max_examples=200, deadline=None)
def test_same_crs_matches_scalar(minx, miny, dx, dy):
    maxx, maxy = minx + dx, miny + dy
    ox, pw, oy, ph, iw, ih = -500.0, 2.0, 500.0, -2.0, 64, 48
    got = K.same_crs_to_pixels(minx, miny, maxx, maxy, ox, pw, oy, ph, iw, ih)
    want = scalar_same_crs(minx, miny, maxx, maxy, ox, pw, oy, ph, iw, ih)
    assert tuple(int(v) for v in got) == want


def test_region_monotonicity():
    # bbox ⊆ bbox' ⇒ region ⊆ region' (G5 property)
    ox, pw, oy, ph, iw, ih = 0.0, 1.0, 100.0, -1.0, 100, 100
    inner = K.same_crs_to_pixels(10, 10, 20, 20, ox, pw, oy, ph, iw, ih)
    outer = K.same_crs_to_pixels(5, 5, 25, 25, ox, pw, oy, ph, iw, ih)
    assert outer[0] <= inner[0] and outer[1] <= inner[1]
    assert outer[0] + outer[2] >= inner[0] + inner[2]
    assert outer[1] + outer[3] >= inner[1] + inner[3]


def test_mercator_fallback_region():
    # bbox far outside image → centered fallback (image_extraction_utils.rs:294-315)
    x, y, w, h = K.wgs84_bbox_to_mercator_pixels(
        minx=100.0, miny=50.0, maxx=101.0, maxy=51.0,  # way east
        origin_x=0.0, pixel_w=10.0, origin_y=100.0, pixel_h=-10.0,
        img_w=64, img_h=64, radius_m=200.0)
    # size = (200*2)/10 = 40 px, centered at (32,32) → x=y=32-20=12
    assert (int(x), int(y), int(w), int(h)) == (12, 12, 40, 40)


def test_mercator_fallback_default_1000():
    x, y, w, h = K.wgs84_bbox_to_mercator_pixels(
        100.0, 50.0, 101.0, 51.0, 0.0, 10.0, 100.0, -10.0, 64, 64, None)
    assert (int(w), int(h)) == (64, 64)  # 1000 clipped to image
    assert (int(x), int(y)) == (0, 0)    # saturating 32-500 → 0


# ---------------------------------------------------------------------------
# Geotransform
# ---------------------------------------------------------------------------

def test_geotransform_from_tags():
    ox, pw, oy, ph = K.geotransform_from_tags(2.0, 2.0, 0.0, 0.0, 100.0, 200.0)
    assert (ox, pw, oy, ph) == (100.0, 2.0, 200.0, -2.0)
    # non-zero raster tiepoint part
    ox, pw, oy, ph = K.geotransform_from_tags(2.0, 2.0, 3.0, 4.0, 100.0, 200.0)
    # ox = 100 - 3*2 = 94 ; oy = 200 + 4*(-(-2)) = 200 + 4*2 = 208
    assert (ox, oy) == (94.0, 208.0)


def test_adjust_tiepoint():
    nx, ny = K.adjust_tiepoint_for_region(8, 4, 100.0, 200.0, 2.0, 2.0)
    assert (nx, ny) == (116.0, 192.0)


# ---------------------------------------------------------------------------
# Tile/strip ranges
# ---------------------------------------------------------------------------

def test_tile_range():
    sx, sy, ex, ey = K.tile_range_for_region(10, 20, 30, 40, 16, 16)
    assert (int(sx), int(sy), int(ex), int(ey)) == (0, 1, 3, 4)


def test_strip_range_and_default_rps():
    s, e = K.strip_range_for_region(5, 20, 8)
    assert (int(s), int(e)) == (0, 4)
    # quirk: default rows_per_strip = image WIDTH
    assert int(K.default_rows_per_strip(37)) == 37


# ---------------------------------------------------------------------------
# Predictor
# ---------------------------------------------------------------------------

@given(st.lists(st.integers(0, 255), min_size=1, max_size=64),
       st.integers(1, 8))
@settings(max_examples=200, deadline=None)
def test_predictor_roundtrip(data, width):
    height = (len(data) + width - 1) // width
    buf = np.array(data + [0] * (width * height - len(data)), dtype=np.uint8)
    enc = K.apply_horizontal_predictor_encode(buf, width, height)
    dec = K.undo_horizontal_predictor(enc, width, height)
    assert np.array_equal(dec, buf)


def test_predictor_scalar_parity():
    # direct port of the reference loop (image_extraction_utils.rs:545-554)
    data = [int(v) for v in
            np.random.default_rng(42).integers(0, 256, 24, dtype=np.uint8)]
    width, height = 5, 5  # buffer shorter than w*h → partial row path
    ref = list(data)  # Python ints: the += below must not wrap at uint8
    for row in range(height):
        start = row * width
        end = min(start + width, len(ref))
        for i in range(start + 1, end):
            ref[i] = (ref[i] + ref[i - 1]) % 256
    got = K.undo_horizontal_predictor(np.array(data, dtype=np.uint8), width, height)
    assert list(got) == ref


# ---------------------------------------------------------------------------
# Clip
# ---------------------------------------------------------------------------

def test_clip_chunk_matches_per_pixel_reference():
    rng = np.random.default_rng(7)
    tile_w = tile_h = 8
    rx, ry, rw, rh = 5, 3, 10, 9
    out_vec = np.zeros((rh, rw), dtype=np.uint8)
    out_ref = np.zeros((rh, rw), dtype=np.uint8)
    for ty in range(2):
        for tx in range(2):
            tile = rng.integers(0, 256, tile_w * tile_h, dtype=np.uint8)
            x0, y0 = tx * tile_w, ty * tile_h
            K.clip_chunk_into(out_vec, tile, tile_w, tile_h, x0, y0, rx, ry, rw, rh)
            # reference per-pixel loop (copy_pixel, tile_reader.rs:224-259)
            for y in range(tile_h):
                gy = y0 + y
                if gy < ry or gy >= ry + rh:
                    continue
                for x in range(tile_w):
                    gx = x0 + x
                    if gx < rx or gx >= rx + rw:
                        continue
                    idx = y * tile_w + x
                    if idx >= len(tile):
                        continue
                    out_ref[gy - ry, gx - rx] = tile[idx]
    assert np.array_equal(out_vec, out_ref)


def test_decode_chain():
    raw = np.arange(64, dtype=np.uint8)
    enc = K.apply_horizontal_predictor_encode(raw, 8, 8)
    blob = zlib.compress(bytes(enc))
    got = K.decode_chunk(blob, K.COMPRESSION_DEFLATE, K.PREDICTOR_HORIZONTAL, 8, 8)
    assert np.array_equal(got, raw)


# ---------------------------------------------------------------------------
# Filters / masks
# ---------------------------------------------------------------------------

def test_filter_values():
    w = np.array([[0, 10, 20], [30, 255, 5]], dtype=np.uint8)
    got = K.filter_values(w, 10, 30, 0)
    assert got.tolist() == [[0, 10, 20], [30, 0, 0]]


def test_circle_mask_scalar_parity():
    for (w, h) in [(8, 8), (7, 5), (16, 9), (1, 1)]:
        mask = K.circle_mask(w, h)
        cx, cy = np.float32(w) / 2, np.float32(h) / 2
        r = np.float32(min(w, h) // 2)
        for y in range(h):
            for x in range(w):
                dx = np.float32(x) - cx
                dy = np.float32(y) - cy
                want = dx * dx + dy * dy <= r * r
                assert mask[y, x] == want, (w, h, x, y)


# ---------------------------------------------------------------------------
# Colormap
# ---------------------------------------------------------------------------

def ref_find_color(entries, map_type, value):
    """Direct port of find_color_for_value (colormap_utils.rs:26-51)."""
    if value == 255:
        return (255, 255, 255)
    if not entries:
        return (0, 0, 0)
    for ev, rgb in entries:
        if ev == value:
            return rgb
    if map_type == "ramp" and len(entries) > 1:
        lower, upper = entries[0], entries[-1]
        for i in range(len(entries) - 1):
            if entries[i][0] <= value < entries[i + 1][0]:
                lower, upper = entries[i], entries[i + 1]
                break
        if value <= lower[0]:
            return lower[1]
        if value >= upper[0]:
            return upper[1]
        # reference does all interpolation math in f32 (colormap_utils.rs:78-82)
        f = np.float32
        rng = f(upper[0]) - f(lower[0])
        t = (f(value) - f(lower[0])) / rng
        one = f(1.0)
        return tuple(int(f(lower[1][c]) * (one - t) + f(upper[1][c]) * t)
                     for c in range(3))
    best, bd = entries[0][1], 1 << 30
    for ev, rgb in entries:
        d = abs(ev - value)
        if d < bd:
            bd, best = d, rgb
    return best


@pytest.mark.parametrize("map_type", ["ramp", "values", "intervals"])
def test_colormap_matches_reference_port(map_type):
    entries = [(0, (10, 20, 30)), (50, (100, 0, 200)), (120, (0, 255, 17)),
               (200, (5, 5, 5)), (250, (90, 80, 70))]
    values = np.arange(256, dtype=np.uint16)
    got = K.apply_colormap(values,
                           np.array([e[0] for e in entries]),
                           np.array([e[1] for e in entries], dtype=np.uint8),
                           map_type)
    for v in range(256):
        assert tuple(got[v]) == ref_find_color(entries, map_type, v), (map_type, v)


def test_colormap_empty_and_255():
    got = K.apply_colormap(np.array([0, 255], dtype=np.uint16),
                           np.array([], dtype=np.int64),
                           np.zeros((0, 3), dtype=np.uint8), "values")
    assert tuple(got[0]) == (0, 0, 0)
    assert tuple(got[1]) == (255, 255, 255)


def test_colormap_trim_dedup():
    vals = np.arange(5)
    rgb = np.array([[0, 0, 0], [0, 0, 0], [1, 2, 3], [0, 0, 0], [9, 9, 9]])
    v2, r2 = K.colormap_trim_and_dedup(vals, rgb)
    assert v2.tolist() == [2, 3, 4]  # leading black trimmed, interior kept


# ---------------------------------------------------------------------------
# Stats / pyramid / luma / geometry
# ---------------------------------------------------------------------------

def test_stats():
    w = np.array([[3, 200], [7, 9]], dtype=np.uint8)
    assert K.grayscale_stats(w) == (3, 200)
    rgb = np.array([[[5, 100, 40], [1, 2, 3]]], dtype=np.uint8)
    assert K.rgb_stats(rgb) == (1, 100)


def test_box_reduce():
    w = np.array([[0, 1, 2], [4, 5, 6], [8, 9, 10]], dtype=np.uint8)
    got = K.box_reduce_2x2(w)
    assert got.tolist() == [[(0 + 1 + 4 + 5) // 4]]


def test_pip_square_and_concave():
    # unit square
    polyx = np.array([0.0, 10.0, 10.0, 0.0])
    polyy = np.array([0.0, 0.0, 10.0, 10.0])
    px = np.array([5.0, 15.0, -1.0, 9.99])
    py = np.array([5.0, 5.0, 5.0, 9.99])
    got = K.points_in_polygon(px, py, polyx, polyy)
    assert got.tolist() == [True, False, False, True]
    # concave "L" shape
    lx = np.array([0, 4, 4, 2, 2, 0], dtype=float)
    ly = np.array([0, 0, 2, 2, 4, 4], dtype=float)
    got = K.points_in_polygon(np.array([3.0, 3.0, 1.0]),
                              np.array([1.0, 3.0, 3.0]), lx, ly)
    assert got.tolist() == [True, False, True]


def test_bbox_contains_inclusive():
    assert K.bbox_contains(0, 0, 10, 10, 10, 10)  # inclusive (bbox.rs:85-88)
    assert not K.bbox_contains(0, 0, 10, 10, 10.0001, 10)


def test_coord_to_bbox_4326():
    minx, miny, maxx, maxy = K.coord_to_bbox(
        np.array([10.0]), np.array([60.0]), np.array([1000.0]), "square", 4326)
    lat_buf = 1000.0 / 111320.0
    lon_buf = 1000.0 / (111320.0 * math.cos(math.radians(60.0)))
    assert miny[0] == pytest.approx(60.0 - lat_buf)
    assert minx[0] == pytest.approx(10.0 - lon_buf)


def test_coord_to_bbox_mercator():
    minx, miny, maxx, maxy = K.coord_to_bbox(
        np.array([500.0]), np.array([600.0]), np.array([50.0]), "circle", 3857)
    assert (minx[0], miny[0], maxx[0], maxy[0]) == (450.0, 550.0, 550.0, 650.0)


def test_zstd_codec_roundtrip_and_frame_size():
    """C2: zstd (code 14) through the pyarrow-bundled codec — one-shot
    frames carry Frame_Content_Size (RFC 8878 §3.1.1), parsed so decode
    needs no size hint (matching zstd.rs decode_all semantics)."""
    import numpy as np
    rng = np.random.default_rng(11)
    raw = rng.integers(0, 256, size=16 * 16, dtype=np.uint8).tobytes()
    blob = K.compress(raw, K.COMPRESSION_ZSTD)
    assert blob[:4] == b"\x28\xb5\x2f\xfd"
    assert K._zstd_frame_content_size(blob) == len(raw)
    assert K.decompress(blob, K.COMPRESSION_ZSTD) == raw
    # full decode chain with predictor
    enc = K.apply_horizontal_predictor_encode(raw, 16, 16)
    blob2 = K.compress(bytes(enc), K.COMPRESSION_ZSTD)
    dec = K.decode_chunk(blob2, K.COMPRESSION_ZSTD, K.PREDICTOR_HORIZONTAL,
                         16, 16)
    assert bytes(dec) == raw


def test_rgb_to_luma8_truncates_like_image_crate():
    """image 0.25 u8 luma is (2126R + 7152G + 722B) // 10000 (truncating
    integer division) — a float round() is off by one whenever the
    weighted sum mod 10000 >= 5000 (e.g. (3,0,0): crate 0, round 1)."""
    rgb = np.array([[[3, 0, 0], [0, 0, 255], [255, 255, 255],
                     [10, 10, 10]]], dtype=np.uint8)
    got = K.rgb_to_luma8(rgb)
    assert got.tolist() == [[0, 18, 255, 10]]


def test_clip_chunk_partial_last_row_copies_available_pixels():
    """A short chunk buffer whose length is not a multiple of chunk_w:
    the reference's copy_pixel skips only pixels past data.len(), so the
    pixels present in the incomplete final row must still copy."""
    chunk_w, chunk_h = 16, 4
    buf = np.arange(40, dtype=np.uint8)  # 2 full rows + 8 pixels of row 2
    out = np.zeros((4, 16), dtype=np.uint8)
    K.clip_chunk_into(out, buf.tobytes(), chunk_w, chunk_h, 0, 0,
                      0, 0, 16, 4)
    assert out[2, :8].tolist() == list(range(32, 40))  # partial row copied
    assert (out[2, 8:] == 0).all() and (out[3] == 0).all()
    # spp=3 flavor: only complete pixels of the partial row copy
    out3 = np.zeros((2, 4, 3), dtype=np.uint8)
    buf3 = np.arange(17, dtype=np.uint8)  # row0 = 12B, then 1 pixel + 2B
    K.clip_chunk_into(out3, buf3.tobytes(), 4, 2, 0, 0, 0, 0, 4, 2,
                      samples=3)
    assert out3[1, 0].tolist() == [12, 13, 14]
    assert (out3[1, 1:] == 0).all()


def test_predictor_stride_partial_row_tail():
    """samples=3 predictor undo must cumsum the partial final row too
    (the stride branch used to leave tail pixels as raw deltas while the
    grayscale branch handled them)."""
    width, height, spp = 4, 2, 3
    full = np.arange(1, width * height * spp + 1, dtype=np.uint8) \
        .reshape(height, width, spp)
    enc = K.apply_horizontal_predictor_encode(full.reshape(-1), width,
                                              height, spp)
    short = enc[: width * spp + 2 * spp]  # row 0 + 2 pixels of row 1
    dec = K.undo_horizontal_predictor(short, width, height, spp)
    want = full.reshape(-1)[: len(short)]
    assert dec.tolist() == want.tolist()


def test_points_in_polygon_grid_bitwise_parity():
    """The separable grid kernel must produce the EXACT mask of the flat
    kernel on the meshgrid of its axes — including degenerate polygons
    (horizontal edges, repeated vertices, point on edge/vertex rows)."""
    rng = np.random.default_rng(11)
    polys = [
        # convex quad
        (np.array([0.0, 4.0, 4.0, 0.0]), np.array([0.0, 0.0, 3.0, 3.0])),
        # concave with a horizontal edge (y1 == y2)
        (np.array([0.0, 6.0, 6.0, 3.0, 3.0, 0.0]),
         np.array([0.0, 0.0, 4.0, 4.0, 2.0, 2.0])),
        # repeated vertex (zero-length edge)
        (np.array([1.0, 5.0, 5.0, 5.0, 1.0]),
         np.array([1.0, 1.0, 1.0, 4.0, 4.0])),
    ]
    for polyx, polyy in polys:
        for _ in range(3):
            gx = np.sort(rng.uniform(-1, 7, size=rng.integers(1, 40)))
            gy = np.sort(rng.uniform(-1, 5, size=rng.integers(1, 40)))
            # include exact vertex coordinates in the grid axes
            gx = np.unique(np.concatenate([gx, polyx]))
            gy = np.unique(np.concatenate([gy, polyy]))
            mx, my = np.meshgrid(gx, gy)
            flat = K.points_in_polygon(mx.ravel(), my.ravel(),
                                       polyx, polyy).reshape(mx.shape)
            grid = K.points_in_polygon_grid(gx, gy, polyx, polyy)
            assert grid.dtype == np.bool_
            assert np.array_equal(flat, grid)
            # non-monotone axis exercises the direct-comparison fallback
            perm = rng.permutation(len(gx))
            mx2, my2 = np.meshgrid(gx[perm], gy)
            flat2 = K.points_in_polygon(mx2.ravel(), my2.ravel(),
                                        polyx, polyy).reshape(mx2.shape)
            grid2 = K.points_in_polygon_grid(gx[perm], gy, polyx, polyy)
            assert np.array_equal(flat2, grid2)
