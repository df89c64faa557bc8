"""Standalone shared_spans two-parallelism probe (the r4 protocol: 6-rep
amplified sf0.1 documents, min of 2 trials per side).

Usage: python tools/spans_scale_probe.py <cpus>
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cpus = int(sys.argv[1])
    from pyspark.sql import SparkSession, functions as F
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", str(cpus))
             .config("spark.driver.memory", "16g")
             .getOrCreate())
    from rasterkit_spark.operators import dedup as DD
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    amplified = docs.crossJoin(
        spark.range(6).select(F.col("id").alias("rep"))) \
        .select((F.col("doc_id") * 100 + F.col("rep")).alias("doc_id"),
                F.when(F.col("rep") == 0, F.col("text"))
                 .otherwise(F.concat(F.col("text"), F.lit(" tail"),
                                     F.col("rep").cast("string")))
                .alias("text"))
    n = amplified.count()
    secs = []
    for _ in range(2):
        t0 = time.monotonic()
        rows = DD.shared_span_pairs(amplified, min_len=40).count()
        secs.append(round(time.monotonic() - t0, 2))
    print(json.dumps({"cpus": cpus, "docs": n, "rows": rows,
                      "secs": secs, "min": min(secs)}))
    spark.stop()


if __name__ == "__main__":
    main()
