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


def incremental_extract(docs_stream: DataFrame, catalog: DataFrame,
                        tiles: DataFrame, queries: DataFrame,
                        sink_path: str, checkpoint_path: str):
    """Stream of input_hint docs → per-micro-batch batch extraction →
    parquet sink.  Exactly-once via the streaming checkpoint; the batch
    operators are reused unchanged inside foreachBatch."""
    from ..operators import extract as EX

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = EX.extract_for_docs(batch_df, catalog, tiles, queries)
        out.write.mode("append").parquet(sink_path)

    return (docs_stream.writeStream
            .foreachBatch(process_batch)
            .option("checkpointLocation", checkpoint_path)
            .trigger(availableNow=True))
