"""Structured Streaming layer (optional wrapper — SURVEY.md §2.10: the
reference is a one-shot CLI with no streaming semantics; the north star
wants resumable *batch*.  This module provides the streaming entry points a
live corpus would use, built on the same batch operators via
``foreachBatch``).

- :func:`windowed_event_counts` — watermarked tumbling-window aggregation
  over an event stream (late data handled by the watermark).
- :func:`incremental_extract` — docs arriving as a stream; every micro-batch
  runs the *batch* extraction pipeline (operators/extract.py) so streaming
  and batch semantics cannot diverge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_event_counts(events_stream: DataFrame,
                          window: str = "5 minutes",
                          watermark: str = "10 minutes") -> DataFrame:
    """Tumbling-window counts with late-data watermark."""
    return (events_stream
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window), "event_type")
            .agg(F.count("*").alias("n"),
                 F.sum("value").alias("sum_v"))
            .select(F.col("window.start").alias("win_start"),
                    "event_type", "n", "sum_v"))


def running_type_stats(events_stream: DataFrame,
                       idle_timeout_ms: int | None = None) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per
    event_type running (count, sum, max_ts) maintained across micro-batches
    in the state store — the arbitrary-stateful path windowed aggregation
    can't express (running totals never close; a window would).

    ``idle_timeout_ms`` (continuous jobs only): emit a final tombstone row
    (``closed=true``) for keys idle that long, so downstream compaction
    knows the key went quiet.  Leave ``None`` for drain-style runs —
    with a ProcessingTimeTimeout registered the engine keeps scheduling
    timeout batches, so ``processAllAvailable()`` never returns."""
    import pandas as pd
    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)
    from pyspark.sql.types import (BooleanType, DoubleType, LongType,
                                   StringType, StructField, StructType,
                                   TimestampType)

    import numpy as np

    out_schema = StructType([
        StructField("event_type", StringType()),
        StructField("n_total", LongType()),
        StructField("sum_total", DoubleType()),
        StructField("sum_c", LongType()),
        StructField("max_ts", TimestampType()),
        StructField("closed", BooleanType()),
    ])
    state_schema = StructType([
        StructField("n", LongType()),
        StructField("s", DoubleType()),
        # exact centi-sum: per-event floor(value*100 + 0.5) accumulated in
        # int64 — float running sums are summation-order-sensitive (a
        # restarted/differently-batched stream can flip floor(s*100) by
        # one), the integer accumulation is order-independent and so
        # bit-reproducible across engines and batch splits
        StructField("sc", LongType()),
        StructField("mx", LongType()),  # epoch micros (state stores longs)
    ])

    def update(key, pdf_iter, state: GroupState):
        (etype,) = key
        if state.hasTimedOut:
            n, s, sc, mx = state.get
            state.remove()
            yield pd.DataFrame([{
                "event_type": etype, "n_total": n, "sum_total": s,
                "sum_c": sc, "max_ts": pd.Timestamp(mx, unit="us"),
                "closed": True}])
            return
        n, s, sc, mx = state.get if state.exists else (0, 0.0, 0, 0)
        for pdf in pdf_iter:
            n += len(pdf)
            s += float(pdf["value"].sum())
            sc += int(np.floor(pdf["value"].to_numpy() * 100 + 0.5)
                      .astype(np.int64).sum())
            if len(pdf):
                mx = max(mx, int(pdf["ts"].max().value // 1000))
        state.update((n, s, sc, mx))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame([{
            "event_type": etype, "n_total": n, "sum_total": s,
            "sum_c": sc, "max_ts": pd.Timestamp(mx, unit="us"),
            "closed": False}])

    timeout_conf = (GroupStateTimeout.ProcessingTimeTimeout
                    if idle_timeout_ms is not None
                    else GroupStateTimeout.NoTimeout)
    return (events_stream
            .groupBy("event_type")
            .applyInPandasWithState(
                update, out_schema, state_schema, "update", timeout_conf))


def incremental_extract(docs_stream: DataFrame, catalog: DataFrame,
                        tiles: DataFrame, queries: DataFrame,
                        sink_path: str, checkpoint_path: str):
    """Stream of input_hint docs → per-micro-batch batch extraction →
    parquet sink.  Exactly-once END-TO-END: the streaming checkpoint makes
    the SOURCE exactly-once, but foreachBatch output is at-least-once on
    its own (a batch can be replayed after a crash between the sink write
    and the checkpoint commit) — so each batch writes an OVERWRITE of its
    own ``batch=<id>`` directory, making the replay idempotent.  The batch
    operators are reused unchanged inside foreachBatch; read the sink with
    :func:`read_incremental_sink` — it drops the layout-internal ``batch``
    column and refuses a mixed flat/batch= sink instead of silently
    reading half of it (a raw ``parquet(f"{sink_path}/batch=*")`` would)."""
    import os as _os

    from ..operators import extract as EX

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = EX.extract_for_docs(batch_df, catalog, tiles, queries)
        out.write.mode("overwrite").parquet(
            _os.path.join(sink_path, f"batch={batch_id}"))

    return (docs_stream.writeStream
            .foreachBatch(process_batch)
            .option("checkpointLocation", checkpoint_path)
            .trigger(availableNow=True))


def read_incremental_sink(spark, sink_path: str) -> DataFrame:
    """Reader for :func:`incremental_extract`'s sink.

    LAYOUT CHANGE (round 3): the sink moved from flat append-parquet to
    per-batch ``batch=<id>`` subdirectories (the idempotent-replay fix) —
    a plain ``spark.read.parquet(sink_path)`` over the new layout surfaces
    a ``batch`` partition column old consumers don't expect, and a
    checkpointed stream resumed over a pre-existing FLAT sink would mix
    the two layouts.  This helper is the supported read path: it refuses
    a mixed-layout sink (flat files next to batch= dirs — migrate by
    moving the flat files into a ``batch=-1`` subdir) and drops the
    ``batch`` column so consumers see the original schema."""
    import os as _os

    entries = [e for e in _os.listdir(sink_path)
               if not e.startswith((".", "_"))]
    flat = [e for e in entries if not e.startswith("batch=")]
    batched = [e for e in entries if e.startswith("batch=")]
    if flat and batched:
        raise ValueError(
            f"mixed sink layout at {sink_path}: flat files {flat[:3]} next "
            "to batch= directories — this sink was written by both the "
            "pre-round-3 flat writer and the per-batch writer; move the "
            "flat files into a batch=-1 subdirectory to migrate")
    if batched:
        return (spark.read.parquet(_os.path.join(sink_path, "batch=*"))
                .drop("batch"))
    return spark.read.parquet(sink_path)


def dedup_doc_stream(docs_stream: DataFrame, watermark: str = "10 minutes",
                     id_col: str = "doc_id", text_col: str = "text",
                     time_col: str = "event_time") -> DataFrame:
    """Streaming exact dedup for a continuous document feed: content-keyed
    ``dropDuplicatesWithinWatermark`` — a doc whose md5(text) was already
    seen within the watermark horizon is dropped; state is bounded by the
    horizon (the engine evicts keys older than the watermark), so the job
    runs indefinitely at ingest scale.  The batch analog is
    operators/dedup.exact_dedup; this is the front-door filter a
    10¹²-doc pipeline runs before anything expensive touches a duplicate."""
    return (docs_stream
            .withColumn("text_md5", F.md5(F.col(text_col)))
            .withWatermark(time_col, watermark)
            .dropDuplicatesWithinWatermark(["text_md5"])
            .select(id_col, time_col, "text_md5", text_col))


def near_dup_ingest_stream(docs_stream: DataFrame, index: DataFrame,
                           corpus: DataFrame, sink_path: str,
                           checkpoint_path: str, threshold: float = 0.5,
                           n_hashes: int = 32, bands: int = 16,
                           shingle_n: int = 3, use_words: bool = True):
    """Streaming NEAR-dup screening for an ingest feed: every micro-batch
    is probed against the persisted :func:`~..operators.dedup.build_minhash_index`
    of the historical corpus via
    :func:`~..operators.dedup.minhash_pairs_against_index` — the streaming
    face of the write-once-index pattern (only each batch is signed; the
    corpus is never re-touched).  Matches land in ``batch=<id>``
    subdirectories (same idempotent-replay layout as incremental_extract;
    read with :func:`read_incremental_sink`).  Complements
    :func:`dedup_doc_stream`, which drops only EXACT repeats."""
    import os as _os

    from ..operators import dedup as DD

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        pairs = DD.minhash_pairs_against_index(
            batch_df, index, corpus, threshold, n_hashes=n_hashes,
            bands=bands, shingle_n=shingle_n, use_words=use_words)
        pairs.write.mode("overwrite").parquet(
            _os.path.join(sink_path, f"batch={batch_id}"))

    return (docs_stream.writeStream
            .foreachBatch(process_batch)
            .option("checkpointLocation", checkpoint_path)
            .trigger(availableNow=True))


_SESSION_COLS = ["user_id", "session_seq", "n_events", "duration_sec",
                 "closed"]


def _session_timeout_close(uid, state_tuple):
    """Timeout transition of the sessionization state machine: close the
    open session (if any) and leave a seq-preserving TOMBSTONE (n=0) —
    evicting the state would restart session_seq at 1 and collide with
    sessions already emitted for this user.  Returns (out_rows,
    new_state|None); pure, unit-tested without Spark."""
    seq, start, last, n = state_tuple
    if n <= 0:
        return [], None
    return ([(uid, seq, n, last - start, True)], (seq, 0, last, 0))


def _session_steps(uid, es_sorted, state_tuple, gap_sec):
    """Event-arrival transition: merge ts-sorted epoch seconds into the
    open session, closing on every gap > gap_sec (strictly).  A
    tombstone state (n=0) contributes only its seq counter.  Returns
    (out_rows, new_state); pure, unit-tested without Spark."""
    import numpy as np
    seq, start, last, n = state_tuple if state_tuple else (0, 0, 0, 0)
    have = state_tuple is not None and n > 0
    # break BEFORE event i when the gap from the previous event (or the
    # open session's last event) strictly exceeds gap_sec
    prev = np.concatenate(([last if have else np.iinfo(np.int64).min],
                           es_sorted[:-1]))
    brk = (es_sorted - prev) > gap_sec
    if not have:
        brk[0] = True
    out = []
    for i, e in enumerate(es_sorted):
        if brk[i]:
            if have:  # the previous session just closed
                out.append((uid, seq, n, last - start, True))
            seq, start, n, have = seq + 1, int(e), 0, True
        n += 1
        last = int(e)
    out.append((uid, seq, n, last - start, False))
    return out, (seq, start, last, n)


def sessionize_stream(events_stream: DataFrame, gap_sec: int = 1800,
                      idle_timeout_ms: int | None = None) -> DataFrame:
    """Streaming gap sessionization (the §2.10 stateful analog of
    ``operators.temporal.sessionize``): per user_id the state store holds
    only the OPEN session (seq, start_es, last_es, n_events); each
    micro-batch sorts its events by (ts, event_id), merges them into the
    open session, EMITS every session the batch closes (``closed=true``)
    and re-emits the running open session (``closed=false``).

    Semantics match the batch operator exactly for closed sessions, and
    the final open-session rows equal the batch op's last session per
    user once the stream drains — provided each user's events arrive
    batch-monotonically (an append log; within a batch any order is
    fine).  ``idle_timeout_ms`` closes open sessions after that much
    processing-time silence (continuous jobs); leave ``None`` for
    drain-style runs (see running_type_stats for why).  A timeout-close
    leaves a 4-long TOMBSTONE in the state (n=0) so the user's
    session_seq keeps counting when they return — evicting it would
    restart numbering at 1 and collide with already-emitted sessions;
    with timeouts enabled state is therefore O(distinct users ever
    seen), the price of stable numbering under eviction pressure.

    Gap arithmetic runs on ``unix_timestamp(ts)`` computed JVM-side
    (true epoch seconds, identical to the batch operator) — the tz-naive
    timestamps Arrow hands the python worker are session-timezone wall
    clocks, whose differences diverge from epoch differences across DST
    transitions.

    State is O(1) per active user (plus tombstones, above) — the classic
    reason sessionization is the canonical applyInPandasWithState
    example: a watermarked window can't express "closes only on the
    NEXT event's gap"."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as SF
    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)
    from pyspark.sql.types import (BooleanType, LongType, StructField,
                                   StructType)

    out_schema = StructType([
        StructField("user_id", LongType()),
        StructField("session_seq", LongType()),
        StructField("n_events", LongType()),
        StructField("duration_sec", LongType()),
        StructField("closed", BooleanType()),
    ])
    state_schema = StructType([
        StructField("seq", LongType()),
        StructField("start_es", LongType()),
        StructField("last_es", LongType()),
        StructField("n", LongType()),
    ])

    def update(key, pdf_iter, state: GroupState):
        (uid,) = key
        if state.hasTimedOut:
            out, new_state = _session_timeout_close(uid, state.get)
            if new_state is not None:
                state.update(new_state)
            if out:
                yield pd.DataFrame(out, columns=_SESSION_COLS)
            return
        frames = [p for p in pdf_iter if len(p)]
        if not frames:
            if idle_timeout_ms is not None and state.exists:
                state.setTimeoutDuration(idle_timeout_ms)
            return
        pdf = pd.concat(frames)
        es_all = pdf["_es"].to_numpy(dtype=np.int64)
        order = np.lexsort((pdf["event_id"].to_numpy(), es_all))
        out, new_state = _session_steps(
            uid, es_all[order],
            state.get if state.exists else None, gap_sec)
        state.update(new_state)
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(out, columns=_SESSION_COLS)

    timeout_conf = (GroupStateTimeout.ProcessingTimeTimeout
                    if idle_timeout_ms is not None
                    else GroupStateTimeout.NoTimeout)
    # null-ts rows are dropped JVM-side: unix_timestamp(NULL) reaches the
    # worker as NaN and an int64 cast would kill the whole micro-batch;
    # an event with no timestamp cannot be placed in any session
    withes = events_stream.filter(SF.col("ts").isNotNull()).select(
        "user_id", "event_id", SF.unix_timestamp("ts").alias("_es"))
    return (withes
            .groupBy("user_id")
            .applyInPandasWithState(
                update, out_schema, state_schema, "update", timeout_conf))
