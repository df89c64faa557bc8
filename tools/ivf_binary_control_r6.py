#!/usr/bin/env python
"""VERDICT r5 #4 control experiment: does shipping IVF vectors as
fixed-width BINARY through the cogroup (instead of array<float>) move the
wall or the N->4N efficiency?  If not, the big-dedup ann_ivf scaling row is
bus-bound (stream ceiling ~0.3 on this host) and the item closes.

Replicates the big-dedup bench corpus exactly; the binary variant packs
each float32 vector into one bytes cell before the cogroup exchange and
unpacks with np.frombuffer inside score_list.  Result parity asserted.

Usage: python tools/ivf_binary_control_r6.py <cpus> [trials]
"""
from __future__ import annotations

import json
import os
import sys
import time

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window, functions as F
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import (BinaryType, LongType, StructField,
                                   StructType)

    from rasterkit_spark.operators import similarity as SIM
    from rasterkit_spark.session import get_spark

    cpus = sys.argv[1] if len(sys.argv) > 1 else "8"
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ivf-binary-control", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # exact big-dedup embedding corpus from bench.py
    emb = spark.read.parquet(
        os.path.join(sf_dir, "embeddings.parquet")).repartition(32)
    erep, qrep = 48, 20
    wide = F.flatten(F.array(
        F.col("embedding"),
        F.transform("embedding", lambda x: x * 0.7 + 0.1),
        F.transform("embedding", lambda x: x * -0.5 + 0.2),
        F.transform("embedding", lambda x: x * 0.3 - 0.15)))
    bigemb = emb.crossJoin(
        spark.range(erep).select(F.col("id").alias("rep"))) \
        .select((F.col("vec_id") * 100 + F.col("rep")).alias("vec_id"),
                F.transform(wide, lambda x: x + F.col("rep") * 0.01)
                .cast("array<float>").alias("embedding"))
    qe = emb.filter("vec_id % 5 = 0").crossJoin(
        spark.range(qrep).select(F.col("id").alias("qr"))) \
        .select((F.col("vec_id") * 1000 + F.col("qr")).alias("qid"),
                F.transform(wide, lambda x: x + F.col("qr") * 0.007)
                .cast("array<float>").alias("embedding"))
    bigemb = bigemb.cache()
    qe = qe.cache()
    n = bigemb.count()
    qe.count()

    # warm python workers
    _warm = pandas_udf(lambda s: s + 1, "long")
    slots = spark.sparkContext.defaultParallelism
    spark.range(0, slots * 1000, 1, slots * 2) \
        .select(_warm(F.col("id"))).count()

    k, n_lists, nprobe = 10, 48, 4
    cents = SIM.fit_centroids(bigemb, n_lists)

    def run_array():
        return SIM.ivf_topk(bigemb, qe, k, n_lists=n_lists,
                            nprobe=nprobe).count()

    # ---- binary-transport variant ----
    # no type hints: `from __future__ import annotations` stringifies
    # them and pandas_udf can't resolve the local 'pd' alias (the same
    # gotcha minhash_sig_udf documents)
    @pandas_udf(BinaryType())
    def pack(v):
        return pd.Series(
            [np.asarray(x, dtype=np.float32).tobytes() for x in v])

    def run_binary():
        assign = SIM._assign_udf(cents)
        e = bigemb.select(F.col("vec_id").alias("nbr_id"),
                          pack(F.col("embedding")).alias("vb"),
                          assign(F.col("embedding")).alias("list_id"))
        probes = qe.select(
            F.col("qid"), pack(F.col("embedding")).alias("qvb"),
            F.explode(SIM._probe_udf(cents, nprobe)(F.col("embedding")))
            .alias("list_id")).localCheckpoint(eager=True)
        probed = [r["list_id"] for r in
                  probes.select("list_id").distinct().collect()]
        pruned = e.filter(F.col("list_id").isin(probed))

        schema = StructType([StructField("qid", LongType()),
                             StructField("nbr_id", LongType()),
                             StructField("cos_e6", LongType())])

        def score_list(left, right):
            cols = ["qid", "nbr_id", "cos_e6"]
            if len(left) == 0 or len(right) == 0:
                return pd.DataFrame(columns=cols)
            V = np.frombuffer(b"".join(left["vb"]), dtype=np.float32) \
                .reshape(len(left), -1).astype(np.float64)
            Q = np.frombuffer(b"".join(right["qvb"]), dtype=np.float32) \
                .reshape(len(right), -1).astype(np.float64)
            ids = left["nbr_id"].to_numpy()
            nb = np.sqrt(np.cumsum(V * V, axis=1)[:, -1])
            na = np.sqrt(np.cumsum(Q * Q, axis=1)[:, -1])
            e6 = (Q @ V.T) / (na[:, None] * nb[None, :]) * 1e6
            fr = np.abs(e6 - np.rint(e6))
            qb, vb_ = np.nonzero(fr < 1e-5)
            if len(qb):
                dseq = np.cumsum(Q[qb] * V[vb_], axis=1)[:, -1]
                e6[qb, vb_] = dseq / (na[qb] * nb[vb_]) * 1e6
            ce6 = np.floor(e6).astype(np.int64)
            qids = right["qid"].to_numpy()
            out_q, out_i, out_c = [], [], []
            kk = min(k, ce6.shape[1])
            for qi in range(ce6.shape[0]):
                col = ce6[qi]
                for i in SIM._topk_ids(col, ids, kk):
                    out_q.append(qids[qi])
                    out_i.append(ids[i])
                    out_c.append(int(col[i]))
            return pd.DataFrame(
                {"qid": out_q, "nbr_id": out_i, "cos_e6": out_c})

        partials = (pruned.groupBy("list_id")
                    .cogroup(probes.groupBy("list_id"))
                    .applyInPandas(lambda l, r: score_list(l, r), schema))
        w = Window.partitionBy("qid").orderBy(F.desc("cos_e6"),
                                              F.col("nbr_id"))
        return (partials.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k).count())

    # parity check once
    a = SIM.ivf_topk(bigemb, qe, k, n_lists=n_lists, nprobe=nprobe) \
        .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    rb = run_binary()
    assert rb == len(a), (rb, len(a))

    out = {"cpus": cpus, "n_vecs": n}
    for name, fn in (("array_float", run_array), ("binary", run_binary)):
        best = None
        for _ in range(trials):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 2)
    print("CONTROL:" + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
