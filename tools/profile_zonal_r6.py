#!/usr/bin/env python
"""In-UDF phase timing for the big-raster zonal partials stage."""
from __future__ import annotations

import glob
import json
import os
import sys
import time

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROF_DIR = "/tmp/zonal_prof"


def main() -> None:
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from rasterkit_spark import kernels as K
    from rasterkit_spark.fixtures import corpus as CP
    from rasterkit_spark.operators import extract as EX
    from rasterkit_spark.operators import spatial as SP
    from rasterkit_spark.session import get_spark

    os.makedirs(PROF_DIR, exist_ok=True)
    for f in glob.glob(PROF_DIR + "/*.json"):
        os.unlink(f)

    spark = get_spark("profile-zonal-r6",
                      cores=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    c = CP.build_corpus(n_media=8, n_docs=50, n_queries=96,
                        sizes=(2048,), tile_size=256,
                        rps_choices=(256,), levels=2, null_rps_every=0)
    sdfs = c.to_spark(spark)
    zrep = int(os.environ.get("SPARK_GRAFT_BENCH_ZREP", "32"))
    sdfs["zones"] = sdfs["zones"].crossJoin(
        spark.range(zrep).select(F.col("id").alias("_rep"))) \
        .withColumn("zone_id", F.concat_ws("_", "zone_id", "_rep")) \
        .drop("_rep")
    for k in ("media_catalog", "tiles", "zones"):
        sdfs[k] = sdfs[k].cache()
        sdfs[k].count()

    orig = SP._zonal_tile_partials

    def timed_partials(pdf_iter, chunk_getter=None):
        tt = dict(wall=0.0, chunk=0.0, lonlat=0.0, pip=0.0, stats=0.0,
                  rows=0, out_rows=0, batches=0)
        t_start = time.time()

        def instrumented(pdf_iter_inner):
            from collections import OrderedDict

            from rasterkit_spark.operators.extract import \
                _decode_chunk_cached

            gray = OrderedDict()
            gray_bytes = 0
            for pdf in pdf_iter_inner:
                tt["batches"] += 1
                out = []
                for row in pdf.itertuples():
                    tt["rows"] += 1
                    cw, ch = int(row.chunk_w), int(row.chunk_h)
                    spp = int(getattr(row, "samples_per_pixel", 1) or 1)
                    gkey = (row.media_ref,
                            int(getattr(row, "level", 0) or 0),
                            int(row.tile_x), int(row.tile_y))
                    t1 = time.time()
                    chunk = gray.get(gkey)
                    if chunk is None:
                        if chunk_getter is not None:
                            raw = chunk_getter(row, int(row.compression),
                                               int(row.predictor), cw, ch,
                                               spp)
                            if raw is None:
                                tt["chunk"] += time.time() - t1
                                continue
                        else:
                            raw = _decode_chunk_cached(
                                bytes(row.blob), int(row.compression),
                                int(row.predictor), cw, ch, spp,
                                row.media_ref, int(row.tile_x),
                                int(row.tile_y),
                                int(getattr(row, "level", 0) or 0))
                        chunk = (K.rgb_to_luma8(raw.reshape(-1, cw, 3))
                                 if spp == 3 else raw.reshape(-1, cw))
                        gray[gkey] = chunk
                    else:
                        gray.move_to_end(gkey)
                    tt["chunk"] += time.time() - t1
                    rx, ry = int(row.region_x), int(row.region_y)
                    rw, rh = int(row.region_w), int(row.region_h)
                    tx0 = int(row.tile_x) * cw
                    ty0 = int(row.tile_y) * ch
                    gx0, gx1 = max(rx, tx0), min(rx + rw,
                                                 tx0 + chunk.shape[1])
                    gy0, gy1 = max(ry, ty0), min(ry + rh,
                                                 ty0 + chunk.shape[0])
                    if gx0 >= gx1 or gy0 >= gy1:
                        continue
                    sub = chunk[gy0 - ty0: gy1 - ty0, gx0 - tx0: gx1 - tx0]
                    t2 = time.time()
                    lon_t, lat_t = SP._tile_lonlat(
                        row.media_ref, int(getattr(row, "level", 0) or 0),
                        int(row.tile_x), int(row.tile_y), tx0, ty0,
                        chunk.shape[1], chunk.shape[0],
                        float(row.origin_x), float(row.origin_y),
                        float(row.pixel_sx), float(row.pixel_sy),
                        int(row.epsg))
                    t3 = time.time()
                    tt["lonlat"] += t3 - t2
                    inside = K.points_in_polygon_grid(
                        lon_t[gx0 - tx0: gx1 - tx0],
                        lat_t[gy0 - ty0: gy1 - ty0],
                        np.asarray(row.poly_xs), np.asarray(row.poly_ys))
                    t4 = time.time()
                    tt["pip"] += t4 - t3
                    vals = sub[inside]
                    if vals.size:
                        out.append((row.zone_id, row.media_ref,
                                    int(vals.min()), int(vals.max()),
                                    int(vals.sum(dtype=np.int64)),
                                    int(vals.size)))
                    tt["stats"] += time.time() - t4
                if out:
                    tt["out_rows"] += len(out)
                    yield pd.DataFrame(out, columns=[
                        "zone_id", "media_ref", "pmin", "pmax", "psum",
                        "pcount"])

        yield from instrumented(pdf_iter)
        tt["wall"] = time.time() - t_start
        with open(f"{PROF_DIR}/{os.getpid()}_{time.time_ns()}.json",
                  "w") as f:
            json.dump(tt, f)

    SP._zonal_tile_partials = timed_partials

    # the zonal lambda references _zonal_partials_lookup by module-global
    # name; replace it with a BY-VALUE picklable wrapper so the
    # instrumentation actually ships to the python workers
    def timed_lookup(pdf_iter, tile_map):
        from rasterkit_spark.operators.extract import _decode_chunk_cached

        def get_chunk(row, comp, pred, cw, ch_, spp):
            key = (row.media_ref, int(getattr(row, "level", 0) or 0),
                   int(row.tile_x), int(row.tile_y))
            blob = tile_map.get(key)
            if blob is None:
                return None
            return _decode_chunk_cached(blob, comp, pred, cw, ch_, spp,
                                        key[0], key[2], key[3], key[1])

        yield from timed_partials(pdf_iter, get_chunk)

    import rasterkit_spark.operators.spatial as SPmod
    SPmod._zonal_partials_lookup = timed_lookup

    t0 = time.time()
    out = SP.zonal_stats(sdfs["zones"], sdfs["media_catalog"],
                         sdfs["tiles"], broadcast_tiles=True)
    row = out.agg(F.count("*"), F.sum("zcount")).first()
    print(f"zonal wall: {time.time() - t0:.2f}s rows={int(row[0])}")

    tot: dict = {}
    files = glob.glob(PROF_DIR + "/*.json")
    for fp in files:
        with open(fp) as f:
            d = json.load(f)
        for k, v in d.items():
            tot[k] = tot.get(k, 0) + v
    print(f"tasks: {len(files)}")
    for k in ("wall", "chunk", "lonlat", "pip", "stats"):
        print(f"  {k}: {tot.get(k, 0):.2f} core-s")
    acc = sum(tot.get(k, 0) for k in ("chunk", "lonlat", "pip", "stats"))
    print(f"  accounted {acc:.2f} / wall {tot.get('wall', 0):.2f} "
          f"(rest = itertuples/arrow plumbing)")
    print(f"  rows={tot.get('rows')} out_rows={tot.get('out_rows')} "
          f"batches={tot.get('batches')}")
    spark.stop()


if __name__ == "__main__":
    main()
