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
    # zero recompute means EXACTLY the two uncommitted partitions ran —
    # a uniqueness check alone would pass even if '0'/'1' were re-run
    assert sorted(calls) == ["2", "3"]

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
    from rasterkit_spark.streaming.jobs import read_incremental_sink
    out = read_incremental_sink(spark, sink)
    assert "batch" not in out.columns  # helper hides the layout column
    # streaming micro-batch result == direct batch result
    from rasterkit_spark.operators import extract as EX
    batch = EX.extract_for_docs(sdfs["docs"], sdfs["media_catalog"],
                                sdfs["tiles"], sdfs["queries_bbox"])
    assert out.count() == batch.count()
    # a sink mixing the pre-round-3 flat layout with batch= dirs must be
    # refused, not silently double-read
    flat_file = os.path.join(sink, "part-legacy.parquet")
    with open(flat_file, "wb") as fh:
        fh.write(b"PAR1")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="mixed sink layout"):
        read_incremental_sink(spark, sink)


def test_running_type_stats_stateful(spark, tmp_path):
    """applyInPandasWithState: running per-type totals carried across
    micro-batches in the state store; the final update per key equals the
    batch aggregate over the whole input."""
    import shutil

    from rasterkit_spark.streaming.jobs import running_type_stats

    sf = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")
    src = os.path.join(sf, "events.parquet")
    batch = spark.read.parquet(src)
    want = {r["event_type"]: (r["n"], r["s"], r["sc"])
            for r in batch.groupBy("event_type")
            .agg(F.count("*").alias("n"), F.sum("value").alias("s"),
                 F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
                 .alias("sc"))
            .collect()}

    # two files → two micro-batches (state must persist between them).
    # Split on a deterministic predicate, NOT limit(): an unordered
    # limit() evaluated in two separate actions may pick different row
    # subsets, duplicating/missing events between the halves.
    cutoff = batch.selectExpr(
        "percentile_approx(event_id, 0.5) AS c").collect()[0]["c"]
    d = tmp_path / "stream_src"
    batch.filter(F.col("event_id") <= cutoff) \
        .coalesce(1).write.parquet(str(d / "a"))
    batch.filter(F.col("event_id") > cutoff) \
        .coalesce(1).write.parquet(str(d / "b"))
    flat = tmp_path / "flat"
    flat.mkdir()
    i = 0
    for sub in ("a", "b"):
        for f in (d / sub).glob("*.parquet"):
            shutil.copy(f, flat / f"{i:02d}.parquet")
            i += 1

    stream = (spark.readStream.schema(batch.schema)
              .option("maxFilesPerTrigger", "1").parquet(str(flat)))
    q = (running_type_stats(stream).writeStream
         .format("memory").queryName("rts").outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql(
        "SELECT * FROM rts").toPandas()
    assert len(out) > len(want)  # at least one mid-stream update emitted
    # last update per key == exact batch aggregate
    final = out.groupby("event_type").last()
    for etype, (n, s, sc) in want.items():
        assert int(final.loc[etype, "n_total"]) == n, etype
        assert abs(float(final.loc[etype, "sum_total"]) - float(s)) < 1e-6
        # the exact integer centi-sum must match with NO tolerance — it is
        # the order-independent accumulator the driver gate compares
        assert int(final.loc[etype, "sum_c"]) == sc, etype
    assert not final["closed"].any()  # no idle timeouts in this run


def test_dedup_doc_stream(spark, tmp_path):
    """Content-keyed streaming dedup: duplicates within the watermark
    horizon collapse to one emitted row per distinct text."""
    from rasterkit_spark.streaming.jobs import dedup_doc_stream

    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "event_time": pd.to_datetime([
            "2026-01-01 00:00:01", "2026-01-01 00:00:02",
            "2026-01-01 00:00:03", "2026-01-01 00:00:04",
            "2026-01-01 00:00:05"]),
        "text": ["alpha", "beta", "alpha", "gamma", "beta"]})
    src = str(tmp_path / "docs_src")
    spark.createDataFrame(pdf).write.parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    out = dedup_doc_stream(stream, watermark="10 minutes")
    q = (out.writeStream.outputMode("append")
         .format("memory").queryName("streamdedup")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select * from streamdedup").toPandas()
    assert len(got) == 3                        # alpha, beta, gamma once
    assert set(got.text) == {"alpha", "beta", "gamma"}


def test_near_dup_ingest_stream(spark, tmp_path):
    """Ingest stream probed against a persisted LSH index: the streaming
    micro-batch result equals the direct batch probe, and the corpus is
    only touched through the stored index + candidate-verify pulls."""
    import pandas as pd

    from rasterkit_spark.operators import dedup as DD
    from rasterkit_spark.streaming.jobs import (near_dup_ingest_stream,
                                                read_incremental_sink)

    corpus = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(40).cache()
    index = DD.build_minhash_index(corpus, n_hashes=32, bands=16,
                                   shingle_n=3, use_words=True)
    stored = spark.createDataFrame(index.toPandas())
    new_docs = corpus.limit(12).selectExpr(
        "doc_id + 600000 as doc_id", "concat(text, ' drip') as text")
    src = str(tmp_path / "ingest_src")
    new_docs.write.parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    sink, ckpt = str(tmp_path / "nd_sink"), str(tmp_path / "nd_ckpt")
    q = near_dup_ingest_stream(stream, stored, corpus, sink, ckpt,
                               threshold=0.5).start()
    q.awaitTermination(300)
    out = read_incremental_sink(spark, sink).toPandas()
    want = DD.minhash_pairs_against_index(
        new_docs, stored, corpus, 0.5, n_hashes=32, bands=16,
        shingle_n=3, use_words=True).toPandas()
    got_pairs = set(zip(out.new_id, out.corpus_id))
    want_pairs = set(zip(want.new_id, want.corpus_id))
    assert got_pairs == want_pairs and len(got_pairs) >= 10


def test_sessionize_stream_matches_batch(spark, tmp_path):
    """Streaming gap sessionization: after draining a ts-ordered two-batch
    replay, the last emit per (user, session_seq) — closed or still open —
    must equal the batch sessionize() rows exactly."""
    import shutil

    from rasterkit_spark.operators.temporal import sessionize
    from rasterkit_spark.streaming.jobs import sessionize_stream

    sf = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")
    batch = spark.read.parquet(os.path.join(sf, "events.parquet"))
    gap = 600
    want = {(r.user_id, r.session_seq): (r.n_events, r.duration_sec)
            for r in sessionize(batch, gap_sec=gap).collect()}

    # split on median ts so each user's events arrive batch-monotonically
    cutoff = batch.selectExpr(
        "percentile_approx(unix_timestamp(ts), 0.5) AS c").collect()[0]["c"]
    d = tmp_path / "sess_src"
    batch.filter(F.unix_timestamp("ts") <= cutoff) \
        .coalesce(1).write.parquet(str(d / "a"))
    batch.filter(F.unix_timestamp("ts") > cutoff) \
        .coalesce(1).write.parquet(str(d / "b"))
    flat = tmp_path / "sess_flat"
    flat.mkdir()
    i = 0
    for sub in ("a", "b"):
        for f in (d / sub).glob("*.parquet"):
            shutil.copy(f, flat / f"{i:02d}.parquet")
            i += 1

    stream = (spark.readStream.schema(batch.schema)
              .option("maxFilesPerTrigger", "1").parquet(str(flat)))
    q = (sessionize_stream(stream, gap_sec=gap).writeStream
         .format("memory").queryName("sess").outputMode("update")
         .option("checkpointLocation", str(tmp_path / "sess_ck"))
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql("SELECT * FROM sess").toPandas()
    final = out.groupby(["user_id", "session_seq"]).last()
    got = {k: (int(v.n_events), int(v.duration_sec))
           for k, v in final.iterrows()}
    assert got == want
    # non-vacuity: some sessions must have closed mid-stream
    assert out.closed.any() and len(want) > 1


def test_sessionize_timeout_keeps_seq_counter():
    """The review-found collision: a timeout-close must NOT reset
    session_seq — the tombstone carries the counter so the user's next
    session numbers after the closed ones (pure state-machine test)."""
    import numpy as np

    from rasterkit_spark.streaming.jobs import (_session_steps,
                                                _session_timeout_close)

    # three sessions arrive, gap 100: [0,10], [500], [1000]
    out, st = _session_steps(7, np.array([0, 10, 500, 1000]), None, 100)
    assert [r[1] for r in out] == [1, 2, 3]       # seq per emitted row
    assert st == (3, 1000, 1000, 1)               # session 3 open
    # idle timeout closes session 3, leaving a seq-preserving tombstone
    closed, tomb = _session_timeout_close(7, st)
    assert closed == [(7, 3, 1, 0, True)]
    assert tomb == (3, 0, 1000, 0)
    # a second timeout on the tombstone emits nothing and keeps it
    assert _session_timeout_close(7, tomb) == ([], None)
    # the user returns: the new session must be seq 4, NOT 1
    out2, st2 = _session_steps(7, np.array([5000, 5020]), tomb, 100)
    assert out2 == [(7, 4, 2, 20, False)]
    assert st2 == (4, 5000, 5020, 2)
