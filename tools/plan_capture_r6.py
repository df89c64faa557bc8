#!/usr/bin/env python
"""Round-6 plan capture: rebuild each headline bench query EXACTLY as
bench.py does (same corpus, same parameters) and dump
``.explain("formatted")`` to plans/r06/<query>_<tag>.txt.

Usage:  python tools/plan_capture_r6.py <tag> [query ...]
        tag is e.g. 'before' or 'after'; with no query names, captures all.

This is a measurement tool (guide §1) — bench.py itself is frozen.
Queries whose construction runs driver actions (dup_clusters' iterative
rounds, cosine/ivf's bounded collects) execute those actions here too;
the captured plan is the final returned DataFrame's.
"""
from __future__ import annotations

import io
import os
import sys

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _explain_str(df) -> str:
    buf = io.StringIO()
    old = sys.stdout
    sys.stdout = buf
    try:
        df.explain("formatted")
    finally:
        sys.stdout = old
    return buf.getvalue()


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import functions as F

    from rasterkit_spark.fixtures import corpus as CP
    from rasterkit_spark.operators import dedup as DD
    from rasterkit_spark.operators import extract as EX
    from rasterkit_spark.operators import similarity as SIM
    from rasterkit_spark.operators import spatial as SP
    from rasterkit_spark.operators.pipeline import corpus_pipeline as _cpipe
    from rasterkit_spark.session import get_spark

    spark = get_spark("plan-capture-r6",
                      cores=os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import numpy as np
    import pandas as pd

    # ---- same corpus construction as bench.py default mode (heavy=1) ----
    c = CP.build_corpus(n_media=48, n_docs=400, n_queries=400,
                        sizes=(128, 192, 256))
    sdfs = c.to_spark(spark)
    for k in ("media_catalog", "tiles", "queries_bbox", "zones"):
        sdfs[k] = sdfs[k].cache()
        sdfs[k].count()

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    pts = li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("id"),
        (((F.col("l_orderkey") * 37 + F.col("l_linenumber")) % 3600) / 10.0
         - 180.0 + 0.05).alias("lon"),
        (((F.col("l_orderkey") * 91 + F.col("l_linenumber")) % 1700) / 10.0
         - 85.0 + 0.05).alias("lat")).cache()
    pts.count()

    zones_pdf = []
    rng = np.random.default_rng(7)
    for z in range(120):
        cx, cy = float(rng.uniform(-150, 150)), float(rng.uniform(-70, 70))
        r = float(rng.uniform(3, 18))
        ring = [(cx + r * np.cos(t), cy + r * np.sin(t))
                for t in np.linspace(0, 2 * np.pi, 9)[:-1]]
        wkt = ("POLYGON((" + ", ".join(f"{x:.6f} {y:.6f}" for x, y in ring)
               + f", {ring[0][0]:.6f} {ring[0][1]:.6f}))")
        zones_pdf.append(dict(zone_id=f"z{z}", polygon_wkt=wkt))
    zones = spark.createDataFrame(pd.DataFrame(zones_pdf))

    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    kpts = cust.select(
        F.col("c_custkey").alias("id"),
        (((F.col("c_custkey") * 37) % 3600) / 10.0 - 180.0 + 0.05)
        .alias("lon"),
        (((F.col("c_custkey") * 91) % 1700) / 10.0 - 85.0 + 0.05)
        .alias("lat"))
    supp = spark.read.parquet(os.path.join(sf_dir, "supplier.parquet")) \
        .crossJoin(spark.range(10).select(F.col("id").alias("qrep")))
    kq = supp.select(
        (F.col("s_suppkey") * 10 + F.col("qrep")).alias("qid"),
        (((F.col("s_suppkey") * 53 + F.col("qrep") * 7) % 3600) / 10.0
         - 180.0 + 0.05).alias("lon"),
        (((F.col("s_suppkey") * 17 + F.col("qrep") * 11) % 1700) / 10.0
         - 85.0 + 0.05).alias("lat"))

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")).repartition(32)

    def _amplify(reps: int):
        return docs.crossJoin(
            spark.range(reps).select(F.col("id").alias("rep"))) \
            .select((F.col("doc_id") * 100 + F.col("rep")).alias("doc_id"),
                    F.when(F.col("rep") == 0, F.col("text"))
                     .otherwise(F.concat(F.col("text"), F.lit(" tail"),
                                         F.col("rep").cast("string")))
                    .alias("text"))

    amplified = _amplify(6).cache()
    amplified.count()
    pdocs = amplified.withColumn(
        "source", F.concat(F.lit("s"), (F.col("doc_id") % 4).cast("string")))

    emb = spark.read.parquet(
        os.path.join(sf_dir, "embeddings.parquet")).repartition(32)
    bigemb = emb.crossJoin(
        spark.range(60).select(F.col("id").alias("rep"))) \
        .select((F.col("vec_id") * 1000 + F.col("rep")).alias("vec_id"),
                F.transform("embedding",
                            lambda x: x + F.col("rep") * 0.01)
                .alias("embedding"))
    qe = emb.filter("vec_id % 5 = 0") \
        .crossJoin(spark.range(5).select(F.col("id").alias("qr"))) \
        .select((F.col("vec_id") * 1000 + F.col("qr")).alias("qid"),
                "embedding")
    bigemb = bigemb.cache()
    qe = qe.cache()
    bigemb.count()
    qe.count()

    builders = {
        "extract_windows": lambda: EX.extract(
            sdfs["queries_bbox"], sdfs["media_catalog"], sdfs["tiles"],
            broadcast_tiles=False, emit_window=True),
        "zonal_stats": lambda: SP.zonal_stats(
            sdfs["zones"], sdfs["media_catalog"], sdfs["tiles"],
            broadcast_tiles=False),
        "pip_join": lambda: SP.pip_join(pts, zones, "id", "lon", "lat",
                                        "zone_id", "polygon_wkt", res=7),
        "knn_join": lambda: SP.knn_join(kpts, kq, 10, point_id="id",
                                        query_id="qid", x_col="lon",
                                        y_col="lat", res=5),
        "minhash_dedup": lambda: DD.minhash_lsh_pairs(
            amplified, 0.8, n_hashes=32, bands=8, shingle_n=3,
            use_words=True),
        "simhash_dedup": lambda: DD.simhash_pairs(amplified, max_hamming=3),
        "shared_spans": lambda: DD.shared_span_pairs(amplified, min_len=40),
        "dedup_blocks": lambda: DD.dedup_blocks(amplified, block_words=16),
        "corpus_pipeline": lambda: _cpipe(pdocs, docs, min_quality=80,
                                          max_contamination_e6=900_000,
                                          seq_len=512),
        "cosine_topk": lambda: SIM.cosine_topk_fast(bigemb, qe, 10),
        "ann_ivf_topk": lambda: SIM.ivf_topk(bigemb, qe, 10, n_lists=32,
                                             nprobe=4),
    }
    # dup_clusters executes its iterative rounds at construction time over
    # a pre-materialized pair graph (same shape as bench.py)
    def _dup_clusters():
        pair_graph = DD.simhash_pairs(amplified, max_hamming=3).cache()
        pair_graph.count()
        return DD.dup_clusters(amplified, pair_graph)
    builders["dup_clusters"] = _dup_clusters

    for name, build in builders.items():
        if only and name not in only:
            continue
        print(f"[plan] {name} ...", file=sys.stderr, flush=True)
        df = build()
        txt = _explain_str(df)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"[plan] wrote {path} ({len(txt)} chars)", file=sys.stderr)

    spark.stop()


if __name__ == "__main__":
    main()
