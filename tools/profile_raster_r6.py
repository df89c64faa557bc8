#!/usr/bin/env python
"""Round-6 stage isolation for the big-raster bench config (bench.py
SPARK_GRAFT_BENCH_BIG=1): where do the extract/zonal walls go —
key planning, tile broadcast, or the decode/assemble python stage?"""
from __future__ import annotations

import os
import sys
import time

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from rasterkit_spark.fixtures import corpus as CP
    from rasterkit_spark.operators import extract as EX
    from rasterkit_spark.operators import spatial as SP
    from rasterkit_spark.session import get_spark

    spark = get_spark("profile-raster-r6",
                      cores=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    c = CP.build_corpus(n_media=8, n_docs=50, n_queries=96,
                        sizes=(2048,), tile_size=256,
                        rps_choices=(256,), levels=2, null_rps_every=0)
    sdfs = c.to_spark(spark)
    print(f"corpus build: {time.time() - t0:.2f}s")
    qrep, zrep = 256, int(os.environ.get("SPARK_GRAFT_BENCH_ZREP", "32"))
    sdfs["queries_bbox"] = sdfs["queries_bbox"].crossJoin(
        spark.range(qrep).select(F.col("id").alias("_rep"))) \
        .withColumn("query_id", F.concat_ws("_", "query_id", "_rep")) \
        .drop("_rep")
    sdfs["zones"] = sdfs["zones"].crossJoin(
        spark.range(zrep).select(F.col("id").alias("_rep"))) \
        .withColumn("zone_id", F.concat_ws("_", "zone_id", "_rep")) \
        .drop("_rep")
    for k in ("media_catalog", "tiles", "queries_bbox", "zones"):
        sdfs[k] = sdfs[k].cache()
        sdfs[k].count()

    from pyspark.sql.functions import pandas_udf
    _warm = pandas_udf(lambda s: s + 1, "long")
    slots = spark.sparkContext.defaultParallelism
    spark.range(0, slots * 1000, 1, slots * 2) \
        .select(_warm(F.col("id"))).count()

    def t(label, fn):
        t1 = time.time()
        out = fn()
        print(f"  {label}: {time.time() - t1:.2f}s -> {out}", flush=True)
        return out

    print("== extract (broadcast_tiles, emit_window=False) ==")
    for _ in range(2):
        # phase a: key planning only (regions + explode + repartition+sort)
        regions = EX.resolve_regions(sdfs["queries_bbox"],
                                     sdfs["media_catalog"])
        keys = EX.expand_tile_keys(regions)
        t("keys only (count)", lambda: keys.count())
        # phase b: tile size agg + collect + broadcast
        def bc_build():
            total = sdfs["tiles"].agg(
                F.coalesce(F.sum(F.length("blob")), F.lit(0)).alias("b")
            ).collect()[0]["b"]
            rows = sdfs["tiles"].select("media_ref", "level", "tile_x",
                                        "tile_y", "blob").collect()
            bc = spark.sparkContext.broadcast(
                {(r["media_ref"], int(r["level"]), int(r["tile_x"]),
                  int(r["tile_y"])): bytes(r["blob"]) for r in rows})
            n = len(bc.value)
            bc.unpersist()
            return (total, n)
        t("tiles agg+collect+broadcast", bc_build)
        # phase c: full operator
        t("extract full (count)", lambda: EX.extract(
            sdfs["queries_bbox"], sdfs["media_catalog"], sdfs["tiles"],
            broadcast_tiles=True, emit_window=False).count())

    print("== zonal (broadcast_tiles) ==")
    for _ in range(2):
        def zfull():
            out = SP.zonal_stats(sdfs["zones"], sdfs["media_catalog"],
                                 sdfs["tiles"], broadcast_tiles=True)
            row = out.agg(F.count("*"), F.sum("zcount")).first()
            return int(row[0])
        t("zonal full", zfull)

    spark.stop()


if __name__ == "__main__":
    main()
