"""Round-5 bisection harness for the judge-reproduced parity-corpus wall
regressions (VERDICT r4 item #2): knn_join 1.63->5.5-11.1 s and
zonal_stats 3.96->9.2-10.5 s at local[32]/sf0.1 between BENCH_r03 and
BENCH_r04.

Replicates bench.py's exact input construction for the two queries and
times ONE query per subprocess run, with the implementation tree chosen
by --tree (a path whose rasterkit_spark package is imported — point it
at /tmp/r3tree for the round-3-end snapshot, or the repo root for HEAD).
Single-change attribution is done by EDITING the tree under test between
runs (git worktree / stash), not by env toggles — an earlier draft of
this header advertised KNN_NO_CKPT/KNN_NO_CROSS/ZONAL_NO_MEMO toggles
that were never implemented; they are gone so a toggle set in the
environment can't silently measure the unmodified tree.

Usage:
  python tools/bisect_parity_r5.py --tree /root/repo --query knn
  python tools/bisect_parity_r5.py --tree /tmp/r3tree --query zonal
"""
import argparse
import json
import os
import sys
import time

import numpy as np
import pandas as pd


def build_spark(cpus: int):
    from pyspark.sql import SparkSession
    return (SparkSession.builder.master(f"local[{cpus}]")
            .config("spark.sql.shuffle.partitions", str(cpus))
            .config("spark.driver.memory", "16g")
            .config("spark.sql.adaptive.enabled", "true")
            .getOrCreate())


def time_knn(spark, sf_dir, trials):
    from pyspark.sql import functions as F
    from rasterkit_spark.operators import spatial as SP
    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    kpts = cust.select(
        F.col("c_custkey").alias("id"),
        (((F.col("c_custkey") * 37) % 3600) / 10.0 - 180.0 + 0.05).alias("lon"),
        (((F.col("c_custkey") * 91) % 1700) / 10.0 - 85.0 + 0.05).alias("lat"))
    supp = spark.read.parquet(os.path.join(sf_dir, "supplier.parquet")) \
        .crossJoin(spark.range(10).select(F.col("id").alias("qrep")))
    kq = supp.select(
        (F.col("s_suppkey") * 10 + F.col("qrep")).alias("qid"),
        (((F.col("s_suppkey") * 53 + F.col("qrep") * 7) % 3600) / 10.0
         - 180.0 + 0.05).alias("lon"),
        (((F.col("s_suppkey") * 17 + F.col("qrep") * 11) % 1700) / 10.0
         - 85.0 + 0.05).alias("lat"))
    kq.count()
    secs, rows = [], None
    for _ in range(trials):
        t0 = time.monotonic()
        rows = SP.knn_join(kpts, kq, 10, point_id="id", query_id="qid",
                           x_col="lon", y_col="lat", res=5).count()
        secs.append(time.monotonic() - t0)
    return secs, rows


def time_zonal(spark, sf_dir, trials):
    from pyspark.sql import functions as F
    from rasterkit_spark.fixtures import corpus as CP
    from rasterkit_spark.operators import extract as EX
    from rasterkit_spark.operators import spatial as SP
    c = CP.build_corpus(n_media=48, n_docs=400, n_queries=400,
                        sizes=(128, 192, 256))
    sdfs = c.to_spark(spark)
    for k in ("media_catalog", "tiles", "queries_bbox", "zones"):
        sdfs[k] = sdfs[k].cache()
        sdfs[k].count()
    if os.environ.get("ZONAL_WARM_EXTRACT"):
        # replicate bench.py ordering: extract_windows runs (3 trials)
        # before zonal in the same session, warming JIT + worker memos
        for _ in range(3):
            EX.extract(sdfs["queries_bbox"], sdfs["media_catalog"],
                       sdfs["tiles"]).count()
    secs, rows = [], None
    for _ in range(trials):
        t0 = time.monotonic()
        out = SP.zonal_stats(sdfs["zones"], sdfs["media_catalog"],
                             sdfs["tiles"])
        r = out.agg(F.count("*"), F.sum("zcount")).first()
        rows = int(r[0])
        secs.append(time.monotonic() - t0)
    return secs, rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tree", default="/root/repo")
    ap.add_argument("--query", choices=["knn", "zonal"], required=True)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    a = ap.parse_args()
    sys.path.insert(0, a.tree)
    # python workers must import the SAME tree (mapInPandas UDFs)
    os.environ["PYTHONPATH"] = a.tree + os.pathsep + \
        os.environ.get("PYTHONPATH", "")
    import rasterkit_spark
    assert rasterkit_spark.__file__.startswith(a.tree), \
        rasterkit_spark.__file__
    spark = build_spark(a.cpus)
    fn = time_knn if a.query == "knn" else time_zonal
    secs, rows = fn(spark, a.sf_dir, a.trials)
    print(json.dumps({"tree": a.tree, "query": a.query, "rows": rows,
                      "cpus": a.cpus,
                      "secs": [round(s, 2) for s in secs],
                      "min": round(min(secs), 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
