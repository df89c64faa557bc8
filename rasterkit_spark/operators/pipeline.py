"""End-to-end corpus preparation pipeline — the composition a training-data
team actually runs, as ONE declarative Spark plan.

Every stage is an existing driver-gated operator; the composition adds no
new semantics, only plumbing — which is the point: a user of this engine
strings the same calls together, and the whole chain stays inside
Catalyst (predicate pushdown through the quality gate, one agg + semi-join
for dedup, one gram join for decontamination, pure-filter sampling, one
per-shard window for packing).  The driver gate verifies the composed
result against a single CTE chain that replays every stage in DuckDB.

Shuffle census at 10¹²-doc scale (the reason this shape and not another):
  quality gate        0 shuffles (projection + filter, pushed to scan)
  exact dedup         1 agg on md5(text) + 1 semi-join on doc_id
  decontamination     1 gram join (benchmark side broadcast-eligible)
                      + 1 per-doc agg + 1 semi-join
  mixture + split     0 shuffles (hash-bucket filters/projections)
  sequence packing    1 per-shard window sort
Nothing in the chain collects to the driver or depends on row order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import contamination_check, exact_dedup
from .sampling import split_assign, stratified_sample
from .text import pack_sequences, quality_score


def corpus_pipeline(docs: DataFrame, benchmark: DataFrame,
                    min_quality: int = 70,
                    max_contamination_e6: int = 500_000,
                    rates_ppm: dict[str, int] | None = None,
                    default_ppm: int = 1_000_000,
                    train_ppm: int = 980_000, val_ppm: int = 10_000,
                    seq_len: int = 1024, gram_n: int = 3,
                    text_col: str = "text", id_col: str = "doc_id",
                    source_col: str = "source") -> DataFrame:
    """quality gate → exact dedup (keep-first) → decontamination →
    mixture sample → train/val/test split → per-shard sequence packing,
    returning the packed-corpus index:

    (doc_id, shard, split, n_tokens, start_tok, seq_first, seq_last,
     n_seqs, quality_score, overlap_e6)

    ``shard`` is ``split/source`` — packing never mixes eval tokens into
    train sequences.  All filters are deterministic and row-order
    independent, so the output is bit-stable across partitionings and
    engines (the driver gate replays the full chain in SQL).
    """
    # 1. quality gate — narrow projection, filter pushes toward the scan
    scored = quality_score(docs, text_col,
                           passthrough=(text_col, source_col),
                           id_col=id_col) \
        .filter(F.col("quality_score") >= min_quality)

    # 2. exact dedup: keep each distinct text's smallest doc_id.  One
    # map-side-combinable agg + a semi-join on the id (NOT a corpus
    # self-join on text)
    reps = exact_dedup(scored, text_col, id_col) \
        .select(F.col("rep_id").alias(id_col))
    kept = scored.join(reps, id_col, "left_semi")

    # 3. decontamination: per-doc benchmark overlap, keep clean docs.
    # contamination_check never drops docs, so this inner join is a
    # pure filter on overlap_e6
    overlap = contamination_check(kept, benchmark, n=gram_n,
                                  text_col=text_col, id_col=id_col) \
        .filter(F.col("overlap_e6") <= max_contamination_e6) \
        .select(id_col, "overlap_e6")
    kept = kept.join(overlap, id_col)

    # 4. mixture + split — hash-bucket filters, zero shuffle
    if rates_ppm is not None:
        kept = stratified_sample(kept, rates_ppm, source_col, id_col,
                                 default_ppm)
    kept = split_assign(kept, id_col, train_ppm, val_ppm)
    kept = kept.withColumn(
        "shard", F.concat_ws("/", F.col("split"), F.col(source_col)))

    # 5. pack within (split, source) shards; score columns ride the
    # same window stage
    packed = pack_sequences(kept, seq_len, text_col, id_col,
                            shard_col="shard",
                            passthrough=("split", "quality_score",
                                         "overlap_e6"))
    return packed.select(
        id_col, "shard", "split", "n_tokens", "start_tok", "seq_first",
        "seq_last", "n_seqs", "quality_score", "overlap_e6")
