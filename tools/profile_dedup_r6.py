#!/usr/bin/env python
"""Round-6 stage isolation for minhash_lsh_pairs / dup_clusters /
simhash_pairs over the EXACT bench corpus (guide §1.4: noop-sink /
eager-materialization timing, outside the frozen bench.py).

Usage: python tools/profile_dedup_r6.py [minhash|cc|simhash|spans] ...
"""
from __future__ import annotations

import os
import sys
import time

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    which = set(sys.argv[1:]) or {"minhash", "cc"}
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from rasterkit_spark.operators import dedup as DD
    from rasterkit_spark.session import get_spark

    spark = get_spark("profile-dedup-r6",
                      cores=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")).repartition(32)
    amplified = docs.crossJoin(
        spark.range(6).select(F.col("id").alias("rep"))) \
        .select((F.col("doc_id") * 100 + F.col("rep")).alias("doc_id"),
                F.when(F.col("rep") == 0, F.col("text"))
                 .otherwise(F.concat(F.col("text"), F.lit(" tail"),
                                     F.col("rep").cast("string")))
                .alias("text")).cache()
    n = amplified.count()
    print(f"docs: {n}")

    # warm python workers like bench does
    from pyspark.sql.functions import pandas_udf
    _warm = pandas_udf(lambda s: s + 1, "long")
    slots = spark.sparkContext.defaultParallelism
    spark.range(0, slots * 1000, 1, slots * 2) \
        .select(_warm(F.col("id"))).count()

    def t(label, fn):
        t0 = time.time()
        out = fn()
        print(f"  {label}: {time.time() - t0:.2f}s", flush=True)
        return out

    if "minhash" in which:
        print("== minhash_lsh_pairs phases ==")
        for trial in range(2):
            t0 = time.time()
            buckets = t("band_signatures (sig UDF + checkpoint + explode)",
                        lambda: DD._band_signatures(
                            amplified, 32, 8, 3, "text", "doc_id", True))
            a = buckets.select(F.col("id").alias("id_a"), "band", "bsig")
            b = buckets.select(F.col("id").alias("id_b"), "band", "bsig")
            cand_lazy = (a.join(b, ["band", "bsig"])
                         .filter(F.col("id_a") < F.col("id_b"))
                         .select("id_a", "id_b").dropDuplicates())
            cand = t("candidate band join (checkpoint)",
                     lambda: cand_lazy.localCheckpoint(eager=True))
            print(f"    candidates: {cand.count()}")
            out = t("verify (semi-join + reshingle + joins + count)",
                    lambda: DD._verify_candidates(
                        cand, amplified, 0.8, 3, True, "text",
                        "doc_id").count())
            print(f"  total: {time.time() - t0:.2f}s rows={out}")

    if "simhash" in which:
        print("== simhash phases ==")
        for trial in range(2):
            t0 = time.time()
            s = t("sig UDF + checkpoint", lambda: amplified.select(
                F.col("doc_id").alias("id"),
                DD.simhash64_udf()(F.col("text")).alias("sig"))
                .localCheckpoint(eager=True))
            rest = t("chunk join + verify count",
                     lambda: DD.simhash_pairs(amplified, 3).count())
            print(f"  total: {time.time() - t0:.2f}s")

    if "cc" in which:
        print("== dup_clusters rounds ==")
        pair_graph = DD.simhash_pairs(amplified, max_hamming=3).cache()
        print(f"  pairs: {pair_graph.count()}")
        for trial in range(2):
            t0 = time.time()
            e = (pair_graph.select(F.col("id_a").alias("u"),
                                   F.col("id_b").alias("v"))
                 .filter(F.col("u") != F.col("v"))
                 .dropDuplicates(["u", "v"]))
            e = t("init checkpoint", lambda: e.localCheckpoint(eager=True))
            prev, prev_count = None, -1
            for i in range(25):
                tr = time.time()
                e2 = DD._small_star(DD._large_star(e)) \
                    .localCheckpoint(eager=True)
                t_star = time.time() - tr
                n2 = e2.count()
                t_cnt = time.time() - tr - t_star
                same = (n2 == prev_count and
                        e2.exceptAll(prev).count() == 0) if prev is not None \
                    and n2 == prev_count else False
                print(f"  round {i}: star+ckpt {t_star:.2f}s count "
                      f"{t_cnt:.2f}s eq-check {time.time() - tr - t_star - t_cnt:.2f}s"
                      f" edges={n2}", flush=True)
                if same:
                    break
                prev, prev_count = e2, n2
                e = e2
            # label + sizes tail
            tr = time.time()
            out = DD.dup_clusters(amplified, pair_graph).count()
            print(f"  full dup_clusters call: {time.time() - tr:.2f}s "
                  f"rows={out} (includes its own CC re-run)")
            print(f"  total loop: {time.time() - t0:.2f}s")

    if "spans" in which:
        print("== shared_spans ==")
        for trial in range(2):
            t0 = time.time()
            out = DD.shared_span_pairs(amplified, min_len=40).count()
            print(f"  total: {time.time() - t0:.2f}s rows={out}")

    spark.stop()


if __name__ == "__main__":
    main()
