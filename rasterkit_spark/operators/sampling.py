"""Deterministic sampling / splitting over the ``documents`` table —
training-data corpus-management ops (stratified mixture sampling,
train/val/test assignment).

Everything here is a PURE narrow transformation: a portable md5-derived
uniform hash per row, compared against integer ×1e6 rate cutoffs — no
shuffle, no RNG state, bit-reproducible across engines, cluster sizes and
reruns.  At 100 TB that matters twice over: sampling must not cost a
shuffle, and a re-run (or a DuckDB audit) must select the SAME rows.

The hash is the repo-standard portable md5 fold (dedup.md5_int):
DuckDB replay ``('0x' || substr(md5(x), 1, 12))::BIGINT``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

#: modulus for the uniform bucket — rates are expressed as integer
#: parts-per-million so cutoffs are exact in both engines
RATE_MOD = 1_000_000


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Uniform bucket in [0, 1e6) from md5 of (salt || key) — 48-bit fold
    (12 hex digits: exact in an int64 AND in DuckDB's BIGINT hex cast).
    The salt makes independent sampling decisions possible over the same
    key (e.g. the split assignment must not correlate with a sample)."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(salt),
                                          key.cast("string"))), 1, 12),
               16, 10).cast("long")
    return h % RATE_MOD


def stratified_sample(df: DataFrame, rates_ppm: dict[str, int],
                      stratum_col: str = "source", id_col: str = "doc_id",
                      default_ppm: int = 0, salt: str = "mix") -> DataFrame:
    """Per-stratum deterministic Bernoulli sample: keep a row iff its hash
    bucket falls below the stratum's parts-per-million rate.

    ``rates_ppm`` maps stratum value → ppm kept (1_000_000 = keep all);
    unlisted strata use ``default_ppm``.  This is how a training mixture
    is struck from a heterogeneous corpus (e.g. keep 30% of web text,
    100% of reference text).  The realized fraction converges to the rate
    by the uniformity of md5; selection is independent of row order and
    partitioning.  Plan shape: scan + filter only — predicate-pushdown
    friendly, zero shuffles."""
    bucket = hash_bucket(F.col(id_col), salt=salt)
    rate = F.lit(int(default_ppm))
    for value, ppm in sorted(rates_ppm.items()):
        rate = F.when(F.col(stratum_col) == value,
                      F.lit(int(ppm))).otherwise(rate)
    return df.filter(bucket < rate)


def split_assign(df: DataFrame, id_col: str = "doc_id",
                 train_ppm: int = 980_000, val_ppm: int = 10_000,
                 salt: str = "split") -> DataFrame:
    """Deterministic train/val/test assignment: one extra column
    ``split`` ∈ {train, val, test} from the row's hash bucket —
    [0, train) → train, [train, train+val) → val, rest → test.

    Salted independently from any sampling pass so membership in a sample
    never biases the split.  Pure projection; no shuffle."""
    bucket = hash_bucket(F.col(id_col), salt=salt)
    split = (F.when(bucket < train_ppm, F.lit("train"))
             .when(bucket < train_ppm + val_ppm, F.lit("val"))
             .otherwise(F.lit("test")))
    return df.withColumn("split", split)


def skew_report(df: DataFrame, key_col: str, top_k: int = 10) -> DataFrame:
    """Hot-key diagnostics before a join/groupBy: the ``top_k`` heaviest
    keys with absolute count and ×1e6-floored share of all rows →
    (key, cnt, share_e6, rank).

    This is the measurement that decides salting (spatial.add_salt) or
    AQE skew-join reliance: a key holding >1% of 10¹² rows will dominate
    one reducer.  Plan shape: map-side-combinable groupBy, then a
    DISTRIBUTED top-k (orderBy+limit → TakeOrderedAndProject — no global
    window, no single-partition sort); the total-row count rides along as
    a sum over the aggregated groups, not a second scan.  The final rank
    IS an unpartitioned row_number (Spark logs a single-partition WARN),
    but it runs over the already-limited ``top_k`` rows — bounded by
    construction, never the key space."""
    counts = df.groupBy(F.col(key_col).alias("key")) \
        .agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("t"))
    top = counts.orderBy(F.desc("cnt"), F.asc("key")).limit(top_k)
    return (top.crossJoin(F.broadcast(total))
            .select("key", F.col("cnt").cast("long"),
                    F.floor(F.col("cnt").cast("double") * 1e6
                            / F.col("t")).cast("long").alias("share_e6"))
            .withColumn("rank", F.row_number().over(
                Window.orderBy(F.desc("cnt"), F.asc("key"))))
            .select("key", "cnt", "share_e6",
                    F.col("rank").cast("long")))
