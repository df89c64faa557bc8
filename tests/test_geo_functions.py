"""Column-expression geo functions must agree with the numpy kernels."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from rasterkit_spark import kernels as K
from rasterkit_spark.functions import cells as C
from rasterkit_spark.functions import geo as G

RNG = np.random.default_rng(42)


@pytest.fixture(scope="module")
def coords_df(spark):
    n = 500
    pdf = pd.DataFrame({
        "lon": RNG.uniform(-180, 180, n),
        "lat": RNG.uniform(-90, 90, n),
        "radius": RNG.uniform(10, 100000, n),
    })
    return spark.createDataFrame(pdf).cache(), pdf


def test_mercator_columns_match_kernels(coords_df):
    df, pdf = coords_df
    out = df.select(
        G.merc_x(F.col("lon")).alias("x"),
        G.merc_y(F.col("lat")).alias("y"),
        G.merc_x_inline(F.col("lon")).alias("xi"),
        G.merc_y_inline(F.col("lat")).alias("yi"),
    ).toPandas()
    kx, ky = K.wgs84_to_webmercator(pdf.lon.values, pdf.lat.values)
    kxi, kyi = K.wgs84_to_webmercator_inline(pdf.lon.values, pdf.lat.values)
    np.testing.assert_allclose(out.x.values, kx, rtol=1e-12)
    np.testing.assert_allclose(out.y.values, ky, rtol=1e-12)
    np.testing.assert_allclose(out.xi.values, kxi, rtol=1e-12)
    np.testing.assert_allclose(out.yi.values, kyi, rtol=1e-12)


def test_inverse_mercator_roundtrip(coords_df):
    df, pdf = coords_df
    out = df.select(
        G.inv_merc_lon(G.merc_x(F.col("lon"))).alias("lon2"),
        G.inv_merc_lat(G.merc_y(F.col("lat"))).alias("lat2"),
        "lon", "lat",
    ).toPandas()
    np.testing.assert_allclose(out.lon2, out.lon, atol=1e-9)
    clamped = np.clip(out.lat, -85.05, 85.05)
    np.testing.assert_allclose(out.lat2, clamped, atol=1e-9)


@pytest.mark.parametrize("epsg", [3857, 4326, 32633])
def test_bbox_from_point_radius_matches_kernel(coords_df, epsg):
    df, pdf = coords_df
    out = df.select(G.bbox_from_point_radius(
        F.col("lon"), F.col("lat"), F.col("radius"), F.lit(epsg))).toPandas()
    kminx, kminy, kmaxx, kmaxy = K.coord_to_bbox(
        pdf.lon.values, pdf.lat.values, pdf.radius.values, "square", epsg)
    np.testing.assert_allclose(out.minx.values, kminx, rtol=1e-12)
    np.testing.assert_allclose(out.miny.values, kminy, rtol=1e-12)
    np.testing.assert_allclose(out.maxx.values, kmaxx, rtol=1e-12)
    np.testing.assert_allclose(out.maxy.values, kmaxy, rtol=1e-12)


def test_region_same_crs_matches_kernel(spark):
    n = 400
    pdf = pd.DataFrame({
        "minx": RNG.uniform(-600, 500, n),
        "miny": RNG.uniform(-600, 500, n),
    })
    pdf["maxx"] = pdf.minx + RNG.uniform(0.1, 300, n)
    pdf["maxy"] = pdf.miny + RNG.uniform(0.1, 300, n)
    ox, pw, oy, ph, iw, ih = -500.0, 2.0, 500.0, -2.0, 64, 48
    df = spark.createDataFrame(pdf)
    out = df.select(G.region_same_crs(
        F.col("minx"), F.col("miny"), F.col("maxx"), F.col("maxy"),
        F.lit(ox), F.lit(pw), F.lit(oy), F.lit(ph),
        F.lit(iw), F.lit(ih))).toPandas()
    kx, ky, kw, kh = K.same_crs_to_pixels(
        pdf.minx.values, pdf.miny.values, pdf.maxx.values, pdf.maxy.values,
        ox, pw, oy, ph, iw, ih)
    np.testing.assert_array_equal(out.region_x.values, kx)
    np.testing.assert_array_equal(out.region_y.values, ky)
    np.testing.assert_array_equal(out.region_w.values, kw)
    np.testing.assert_array_equal(out.region_h.values, kh)


def test_region_wgs84_on_mercator_matches_kernel(spark):
    n = 300
    # mix of in-bounds and far-out bboxes to hit the fallback path
    pdf = pd.DataFrame({
        "minx": RNG.uniform(-180, 170, n),
        "miny": RNG.uniform(-86, 80, n),
        "radius": np.where(RNG.uniform(size=n) < 0.5,
                           RNG.uniform(100, 5e5, n), np.nan),
    })
    pdf["maxx"] = pdf.minx + RNG.uniform(0.01, 10, n)
    pdf["maxy"] = pdf.miny + RNG.uniform(0.01, 6, n)
    # small raster near Oslo in 3857
    ox, pw, oy, ph, iw, ih = 1.19e6, 100.0, 8.39e6, -100.0, 640, 480
    df = spark.createDataFrame(pdf)
    out = df.select(G.region_wgs84_on_mercator(
        F.col("minx"), F.col("miny"), F.col("maxx"), F.col("maxy"),
        F.lit(ox), F.lit(pw), F.lit(oy), F.lit(ph),
        F.lit(iw), F.lit(ih), F.col("radius"))).toPandas()
    kx, ky, kw, kh = K.wgs84_bbox_to_mercator_pixels(
        pdf.minx.values, pdf.miny.values, pdf.maxx.values, pdf.maxy.values,
        ox, pw, oy, ph, iw, ih, pdf.radius.values)
    np.testing.assert_array_equal(out.region_x.values, kx)
    np.testing.assert_array_equal(out.region_y.values, ky)
    np.testing.assert_array_equal(out.region_w.values, kw)
    np.testing.assert_array_equal(out.region_h.values, kh)


def test_geotransform_and_tiepoint_cols(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"sx": [2.0], "sy": [2.0], "ti": [3.0], "tj": [4.0],
                      "tx": [100.0], "ty": [200.0]}))
    out = df.select(G.geotransform_cols(
        F.col("sx"), F.col("sy"), F.col("ti"), F.col("tj"),
        F.col("tx"), F.col("ty"))).collect()[0]
    assert (out.origin_x, out.origin_y, out.pixel_w, out.pixel_h) == (94.0, 208.0, 2.0, -2.0)
    out2 = df.select(G.adjusted_tiepoint_cols(
        F.lit(8), F.lit(4), F.col("tx"), F.col("ty"),
        F.col("sx"), F.col("sy"))).collect()[0]
    assert (out2.new_origin_x, out2.new_origin_y) == (116.0, 192.0)


def test_tile_range_cols(spark):
    df = spark.range(1)
    out = df.select(G.tile_range_cols(F.lit(10), F.lit(20), F.lit(30),
                                      F.lit(40), F.lit(16), F.lit(16))).collect()[0]
    assert (out.start_tile_x, out.start_tile_y, out.end_tile_x, out.end_tile_y) == (0, 1, 3, 4)


def test_classify_epsg(spark):
    df = spark.createDataFrame(pd.DataFrame({"e": [4326, 3857, 32633, 32733, 2154]}))
    got = [r[0] for r in df.select(G.classify_epsg(F.col("e"))).collect()]
    assert got == ["WGS84", "WebMercator", "UTM-North", "UTM-South", "Other"]


# ---------------------------------------------------------------------------
# Cells
# ---------------------------------------------------------------------------

def test_grid_cell_column_matches_numpy(coords_df):
    df, pdf = coords_df
    for res in (7, 12, 16):
        out = df.select(C.grid_cell_from_lonlat(
            F.col("lon"), F.col("lat"), res)).toPandas().iloc[:, 0].values
        want = C.grid_cell_id_np(pdf.lon.values, pdf.lat.values, res)
        np.testing.assert_array_equal(out, want)


def test_grid_parent_consistency(coords_df):
    df, pdf = coords_df
    out = df.select(
        C.grid_parent(C.grid_cell_from_lonlat(F.col("lon"), F.col("lat"), 12)).alias("p"),
        C.grid_cell_from_lonlat(F.col("lon"), F.col("lat"), 11).alias("c11"),
    ).toPandas()
    np.testing.assert_array_equal(out.p.values, out.c11.values)


def test_grid_neighbors(spark):
    df = spark.range(1).select(
        C.grid_cell(F.lit(0.0), F.lit(0.0), 10).alias("cell"))
    ring = df.select(F.size(C.grid_neighbors(F.col("cell"), 1)).alias("n")).collect()[0].n
    assert ring == 9  # interior cell: full 3x3 block
    # corner cell: clamped
    corner = spark.range(1).select(
        C.grid_cell(F.lit(-20037508.0), F.lit(-20037508.0), 10).alias("cell"))
    n2 = corner.select(F.size(C.grid_neighbors(F.col("cell"), 1)).alias("n")).collect()[0].n
    assert n2 == 4


def test_grid_bbox_cover(spark):
    df = spark.range(1)
    cover = df.select(F.size(C.grid_cells_for_bbox(
        F.lit(-10000.0), F.lit(-10000.0), F.lit(10000.0), F.lit(10000.0), 12)).alias("n"))
    # res 12 cell ~ 9784m → a 20km box straddling origin covers 3x3 or 2x2+
    n = cover.collect()[0].n
    assert 4 <= n <= 16


def test_s2_invariants():
    lat = RNG.uniform(-89, 89, 2000)
    lon = RNG.uniform(-180, 180, 2000)
    leaf = C.s2_cell_id(lat, lon, 30)
    assert np.all(leaf % 2 == 1)  # leaf ids odd
    for level in (10, 15, 20):
        cid = C.s2_cell_id(lat, lon, level)
        assert np.all(C.s2_level(cid) == level)
        # parent-of-leaf equals direct computation at that level
        np.testing.assert_array_equal(C.s2_parent(leaf, level), cid)
        # coarser parent is a prefix: parent(level) of cid at level+2 matches
        finer = C.s2_cell_id(lat, lon, level + 2)
        np.testing.assert_array_equal(C.s2_parent(finer, level), cid)


def test_s2_locality():
    # nearby points share coarse cells; antipodal points never share leaf
    base_lat, base_lon = 48.8566, 2.3522
    lat = base_lat + RNG.uniform(-1e-4, 1e-4, 100)
    lon = base_lon + RNG.uniform(-1e-4, 1e-4, 100)
    cells = C.s2_cell_id(lat, lon, 10)
    assert len(np.unique(cells)) == 1
    far = C.s2_cell_id(np.array([-base_lat]), np.array([base_lon - 180]), 10)
    assert far[0] != cells[0]


def test_s2_face_centers():
    # face centers map to the 6 face ids in the leading 3 bits
    lats = np.array([0.0, 0.0, 90.0, 0.0, 0.0, -90.0])
    lons = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
    ids = C.s2_cell_id(lats, lons, 30).astype(np.uint64)
    faces = (ids >> np.uint64(61)).astype(int)
    assert list(faces) == [0, 1, 2, 3, 4, 5]


def test_h3_feature_gate():
    """h3_cell_udf is wheel-gated: raises with grid-index guidance when the
    wheel is absent; produces real H3 longs when present (the bench
    harness auto-exercises it via h3_available())."""
    from rasterkit_spark.functions import cells as C
    if C.h3_available():
        udf = C.h3_cell_udf(8)
        assert udf is not None
    else:
        import pytest as _pt
        with _pt.raises(NotImplementedError, match="grid_cell"):
            C.h3_cell_udf(8)


def test_grid_cells_for_bbox_inverted_is_empty(spark):
    """An inverted bbox (minx > maxx) covers ZERO cells — sequence over a
    negative span used to mint descending negative offsets whose cell ids
    silently joined nothing."""
    from pyspark.sql import functions as F
    from rasterkit_spark.functions import cells as C
    df = spark.range(1).select(
        C.grid_cells_for_bbox(F.lit(1.0e6), F.lit(1.0e6),
                              F.lit(-1.0e6), F.lit(-1.0e6), 6).alias("c"),
        C.grid_cells_for_bbox(F.lit(-1.0e6), F.lit(-1.0e6),
                              F.lit(1.0e6), F.lit(1.0e6), 6).alias("ok"))
    row = df.first()
    assert row.c == []
    assert len(row.ok) > 0 and all(v >= 0 for v in row.ok)


def test_get_spark_config_resolution():
    """Explicit shuffle_partitions must win regardless of the cores
    string; the master fallback must not fire when an env master is set
    (the old precedence silently used 64 / stamped local[] over yarn)."""
    import importlib
    import os
    from unittest import mock
    from rasterkit_spark import session as S
    captured = {}

    class FakeBuilder:
        def appName(self, *_): return self
        def config(self, k, v=None):
            captured[k] = v
            return self
        def master(self, m):
            captured["_master"] = m
            return self
        def getOrCreate(self): return None

    with mock.patch.object(S.SparkSession, "builder", FakeBuilder()):
        S.get_spark("app", cores="*", shuffle_partitions=400)
        assert captured["spark.sql.shuffle.partitions"] == "400"
        with mock.patch.dict(os.environ, {"MASTER": "yarn"}):
            captured.pop("_master", None)
            S.get_spark("app", cores=8)
            assert captured["_master"] == "yarn"


@pytest.mark.skipif(not __import__(
    "rasterkit_spark.functions.cells", fromlist=["h3_available"]
).h3_available(), reason="h3 wheel not installed in this environment")
def test_h3_bucket_recall_parity_with_grid(spark):
    """VERDICT r5 #8: the moment the ``h3`` wheel lands, prove the true-H3
    path serves the same join-bucketing role as the grid quadtree on the
    PIP fixture: points inside one polygon's bbox must share an H3 cell
    with the polygon's own cover at the mapped resolution (recall 1.0 for
    the coarse candidate stage), mirroring the grid-cover guarantee."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from rasterkit_spark.functions import cells as CL

    h3res = 7
    u = CL.h3_cell_udf(h3res)
    rng = np.random.default_rng(5)
    cx, cy, r = 12.0, 47.0, 0.5
    pts = pd.DataFrame({
        "id": range(200),
        "lon": rng.uniform(cx - r, cx + r, 200),
        "lat": rng.uniform(cy - r, cy + r, 200)})
    pdf = spark.createDataFrame(pts).select(
        "id", u(F.col("lat"), F.col("lon")).alias("cell"))
    import h3
    # polygon cover = all cells of the bbox grid sampled densely
    cover = set()
    for lon in np.linspace(cx - r, cx + r, 60):
        for lat in np.linspace(cy - r, cy + r, 60):
            cover.add(h3.latlng_to_cell(lat, lon, h3res))
    got = {row.cell for row in pdf.collect()}
    # every point's cell must be in the densely-sampled bbox cover
    missed = got - {int(c, 16) if isinstance(c, str) else c for c in cover}
    assert not missed, f"H3 point cells outside bbox cover: {missed}"
