"""Resumable-batch lineage (zero recompute on restart) and the streaming
wrapper (watermarked window agg; foreachBatch reuse of batch extract)."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from rasterkit_spark.plans.checkpoint import ResumableJob, bucket_filter


def test_resume_skips_committed_partitions(spark, tmp_path):
    src = spark.range(0, 1000).withColumn("k", F.col("id") % 7)
    calls = []

    def process(pid):
        calls.append(pid)
        return bucket_filter(src, "id", 4, pid).withColumn(
            "v", F.col("id") * 2)

    job = ResumableJob(spark, "job1", str(tmp_path))
    # crash after 2 partitions
    with pytest.raises(RuntimeError, match="simulated failure"):
        job.run([str(i) for i in range(4)], process, fail_after=2)
    assert len(calls) == 2
    assert len(job.committed()) == 2

    # restart: only the remaining 2 partitions are computed
    calls.clear()
    n = ResumableJob(spark, "job1", str(tmp_path)).run(
        [str(i) for i in range(4)], process)
    assert n == 2
    assert sorted(calls) == sorted(set(calls))  # no recompute

    # final result is complete and exact
    result = job.result()
    assert result.count() == 1000
    assert result.select(F.sum("v")).collect()[0][0] == 2 * sum(range(1000))

    # metrics lineage covers all partitions
    m = job.metrics().toPandas()
    assert len(m) == 4
    assert m.rows.sum() == 1000
    assert (m.bytes > 0).all()


def test_rerun_is_fully_idempotent(spark, tmp_path):
    src = spark.range(0, 100)

    def process(pid):
        return bucket_filter(src, "id", 2, pid)

    job = ResumableJob(spark, "job2", str(tmp_path))
    assert job.run(["0", "1"], process) == 2
    assert job.run(["0", "1"], process) == 0  # nothing recomputed
    assert job.result().count() == 100


def test_windowed_event_counts_stream(spark, tmp_path):
    from rasterkit_spark.streaming.jobs import windowed_event_counts

    pdf = pd.DataFrame({
        "ts": pd.to_datetime([
            "2026-01-01 00:00:10", "2026-01-01 00:01:00",
            "2026-01-01 00:06:30", "2026-01-01 00:07:00"]),
        "event_type": ["a", "a", "b", "a"],
        "value": [1.0, 2.0, 3.0, 4.0]})
    src_dir = str(tmp_path / "events_src")
    spark.createDataFrame(pdf).write.parquet(src_dir)
    stream = spark.readStream.schema(
        spark.read.parquet(src_dir).schema).parquet(src_dir)
    agg = windowed_event_counts(stream, "5 minutes", "10 minutes")
    q = (agg.writeStream.outputMode("complete")
         .format("memory").queryName("winagg")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    out = spark.sql("select * from winagg").toPandas()
    assert out.n.sum() == 4
    assert len(out) == 3  # (win0,a), (win1,a), (win1,b)


def test_incremental_extract_stream(spark, tmp_path):
    from rasterkit_spark.fixtures import corpus as CP
    from rasterkit_spark.streaming.jobs import incremental_extract

    c = CP.build_corpus(n_media=8, n_docs=30, n_queries=8)
    sdfs = c.to_spark(spark, ["docs", "media_catalog", "tiles",
                              "queries_bbox"])
    docs_dir = str(tmp_path / "docs_src")
    sdfs["docs"].write.parquet(docs_dir)
    stream = spark.readStream.schema(
        spark.read.parquet(docs_dir).schema).parquet(docs_dir)
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    q = incremental_extract(stream, sdfs["media_catalog"], sdfs["tiles"],
                            sdfs["queries_bbox"], sink, ckpt).start()
    q.awaitTermination(300)
    out = spark.read.parquet(sink)
    # streaming micro-batch result == direct batch result
    from rasterkit_spark.operators import extract as EX
    batch = EX.extract_for_docs(sdfs["docs"], sdfs["media_catalog"],
                                sdfs["tiles"], sdfs["queries_bbox"])
    assert out.count() == batch.count()
