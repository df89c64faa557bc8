#!/usr/bin/env python
"""spark-submit entry point.

Usage (cluster):
    python jobs/package.py                       # → dist/rasterkit_spark.zip
    spark-submit --py-files dist/rasterkit_spark.zip jobs/run_job.py \
        --job extract --queries <path> --catalog <path> --tiles <path> \
        --out <path> [--resume-id my_job --base-dir <ckpt>]

Jobs: extract | analyze | convert | pyramid | pip | knn | zonal | corpus.
(Benchmarks run via the repo-root ``bench.py``, not through this entry.)
In local mode the session factory supplies master/local parallelism; on a
cluster, master/executors come from spark-submit and the Iceberg catalog
from RASTERKIT_TABLE_FORMAT=iceberg + the usual catalog confs."""

from __future__ import annotations

import argparse
import os
import sys

# local runs: make the repo root importable (on a cluster --py-files ships
# the rasterkit_spark.zip instead and this is a no-op)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--job", required=True,
                    choices=["extract", "analyze", "convert", "pyramid",
                             "pip", "knn", "zonal", "corpus"])
    ap.add_argument("--queries")
    ap.add_argument("--catalog")
    ap.add_argument("--tiles")
    ap.add_argument("--points")
    ap.add_argument("--polygons")
    ap.add_argument("--zones")
    ap.add_argument("--docs", help="documents table (corpus job)")
    ap.add_argument("--benchmark", help="benchmark/eval table (corpus job)")
    ap.add_argument("--min-quality", type=int, default=70)
    ap.add_argument("--max-contamination-e6", type=int, default=500_000)
    ap.add_argument("--seq-len", type=int, default=1024)
    ap.add_argument("--out", required=True)
    ap.add_argument("--target-compression", type=int, default=8)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--res", type=int, default=12)
    ap.add_argument("--resume-id", help="resumable-job id (plans/checkpoint)")
    ap.add_argument("--base-dir", help="checkpoint base dir for --resume-id")
    ap.add_argument("--buckets", type=int, default=64,
                    help="logical partitions for resumable mode")
    args = ap.parse_args()
    if args.job == "corpus" and not (args.docs and args.benchmark):
        # fail fast with a usage error instead of a TypeError deep inside
        # the parquet reader (ADVICE r5)
        ap.error("corpus job requires --docs and --benchmark")

    from rasterkit_spark import api
    from rasterkit_spark.session import get_spark, table_writer

    spark = get_spark(f"rasterkit-{args.job}")
    rd = spark.read.parquet

    def compute(queries=None):
        if args.job == "extract":
            return api.extract(queries if queries is not None
                               else rd(args.queries),
                               rd(args.catalog), rd(args.tiles))
        if args.job == "analyze":
            return api.analyze(rd(args.catalog))
        if args.job == "convert":
            return api.convert_compression(rd(args.tiles), rd(args.catalog),
                                           args.target_compression)
        if args.job == "pyramid":
            return api.build_pyramid(rd(args.tiles), rd(args.catalog))
        if args.job == "pip":
            return api.spatial_join(
                rd(args.points), rd(args.polygons), point_id="id",
                lon_col="lon", lat_col="lat", poly_id="poly_id",
                wkt_col="polygon_wkt", res=args.res)
        if args.job == "knn":
            return api.knn_join(rd(args.points), rd(args.queries), args.k,
                                point_id="id", query_id="qid",
                                x_col="lon", y_col="lat")
        if args.job == "zonal":
            return api.zonal_stats(rd(args.zones), rd(args.catalog),
                                   rd(args.tiles))
        if args.job == "corpus":
            from rasterkit_spark.operators.pipeline import corpus_pipeline
            return corpus_pipeline(
                rd(args.docs), rd(args.benchmark),
                min_quality=args.min_quality,
                max_contamination_e6=args.max_contamination_e6,
                seq_len=args.seq_len)
        raise SystemExit(f"unknown job {args.job}")

    if args.resume_id and args.job == "extract":
        # resumable flavor: partition the query set, commit per partition
        from rasterkit_spark.plans.checkpoint import (ResumableJob,
                                                      bucket_filter)
        job = ResumableJob(spark, args.resume_id,
                           args.base_dir or args.out + "_ckpt")
        queries = rd(args.queries)

        def process(pid: str):
            return compute(bucket_filter(queries, "query_id",
                                         args.buckets, pid))

        job.run([str(b) for b in range(args.buckets)], process)
        job.result().write.mode("overwrite").parquet(args.out)
    else:
        table_writer(compute()).save(args.out)
    spark.stop()


if __name__ == "__main__":
    main()
