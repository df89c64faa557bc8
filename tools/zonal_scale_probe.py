"""Decompose the big-raster zonal wall: run the bench big-mode zonal at a
given parallelism with stages toggled off via ZONAL_PROBE_MODE, to locate
the non-scaling term.

Modes (set ZONAL_PROBE_MODE): full | no_pip | no_stats | decode_only
Usage: ZONAL_PROBE_MODE=full python tools/zonal_scale_probe.py <cpus> [zrep]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cpus = int(sys.argv[1])
    zrep = int(sys.argv[2]) if len(sys.argv) > 2 else 192
    mode = os.environ.get("ZONAL_PROBE_MODE", "full")
    from pyspark.sql import SparkSession, functions as F
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", str(cpus))
             .getOrCreate())
    from rasterkit_spark.fixtures import corpus as CP
    from rasterkit_spark.operators import spatial as SP
    c = CP.build_corpus(n_media=8, n_docs=50, n_queries=96,
                        sizes=(2048,), tile_size=256,
                        rps_choices=(256,), levels=2, null_rps_every=0)
    sdfs = c.to_spark(spark)
    sdfs["zones"] = sdfs["zones"].crossJoin(
        spark.range(zrep).select(F.col("id").alias("_rep"))) \
        .withColumn("zone_id", F.concat_ws("_", "zone_id", "_rep")) \
        .drop("_rep")
    for k in ("media_catalog", "tiles", "zones"):
        sdfs[k] = sdfs[k].cache()
        sdfs[k].count()
    secs = []
    for _ in range(2):
        t0 = time.monotonic()
        out = SP.zonal_stats(sdfs["zones"], sdfs["media_catalog"],
                             sdfs["tiles"], broadcast_tiles=True)
        out.agg(F.count("*"), F.sum("zcount")).first()
        secs.append(round(time.monotonic() - t0, 2))
    print(json.dumps({"mode": mode, "cpus": cpus, "zrep": zrep,
                      "secs": secs, "min": min(secs)}))
    spark.stop()


if __name__ == "__main__":
    main()
