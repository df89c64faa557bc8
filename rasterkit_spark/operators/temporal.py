"""Temporal relational operators over the ``events`` table — batch
sessionization and the as-of (point-in-time) join.

Both are per-key window computations: the only shuffle is the hash
exchange on the key (user), every window is bounded to one key's rows —
the shape that survives 10¹⁰-event tables (hot users are AQE's skew
case; there is no corpus-wide window anywhere).

Timestamps are truncated to integer epoch seconds at the boundary
(``unix_timestamp`` ≡ DuckDB ``FLOOR(epoch(ts))``) so every derived
value is exact integer arithmetic on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(events: DataFrame, gap_sec: int = 1800,
               user_col: str = "user_id", ts_col: str = "ts",
               id_col: str = "event_id") -> DataFrame:
    """Gap-based sessionization → one row per (user, session):
    (user_id, session_seq, n_events, duration_sec).

    A new session starts when the gap to the user's previous event
    exceeds ``gap_sec`` (strictly).  session_seq is the 1-based session
    index per user (lag + running sum of session starts — the classic
    two-window formulation); duration is last−first epoch second of the
    session.  Deterministic: windows order by (epoch, event_id)."""
    es = F.unix_timestamp(F.col(ts_col)).alias("es")
    w = Window.partitionBy(user_col).orderBy("es", id_col)
    base = events.select(F.col(user_col), F.col(id_col), es)
    new_s = (F.col("pes").isNull()
             | ((F.col("es") - F.col("pes")) > gap_sec)).cast("long")
    seq = (base.withColumn("pes", F.lag("es").over(w))
           .withColumn("ns", new_s)
           .withColumn("session_seq",
                       F.sum("ns").over(w.rowsBetween(
                           Window.unboundedPreceding, Window.currentRow))))
    return (seq.groupBy(user_col, "session_seq")
            .agg(F.count("*").alias("n_events"),
                 (F.max("es") - F.min("es")).alias("duration_sec"))
            .select(user_col, F.col("session_seq").cast("long"),
                    F.col("n_events").cast("long"),
                    F.col("duration_sec").cast("long")))


def asof_join(left: DataFrame, right: DataFrame, key_col: str,
              ts_col: str = "ts_sec", payload_cols: tuple = (),
              how: str = "left") -> DataFrame:
    """Backward as-of join: each left row picks the LATEST right row of
    the same key with ``right.ts_sec <= left.ts_sec`` (ties at the same
    second match).  Returns the left columns plus each payload column as
    ``asof_<name>`` and the matched timestamp ``asof_ts_sec`` (NULL when
    no prior right row exists; ``how="inner"`` drops those rows).

    Physical plan: the standard distributed as-of pattern — tag the two
    sides, UNION, one per-key ordered window carrying the last non-null
    right payload forward, filter back to left rows.  ONE shuffle on the
    key; no range-join candidate explosion (a naive ``l.ts >= r.ts``
    range join is |left|×|right per key| quadratic on hot keys).  The
    right side is first deduped to its latest row per (key, second), so
    the carry is deterministic.

    Both inputs must already carry integer-second ``ts_col`` — derive it
    with ``unix_timestamp`` so oracle replays stay exact."""
    pay = list(payload_cols)
    # latest right row per (key, second): max payload tuple — deterministic
    # (payload-less calls carry only the timestamp, any row is equivalent)
    order = [F.desc(p) for p in pay] if pay else [F.lit(1)]
    r1 = (right.withColumn(
        "_rn", F.row_number().over(
            Window.partitionBy(key_col, ts_col).orderBy(*order)))
        .filter(F.col("_rn") == 1).drop("_rn"))
    lcols = left.columns
    # the matched right row travels as ONE nullable struct: last(...,
    # ignorenulls) then skips only missing RIGHT ROWS, never a NULL field
    # inside the matched row — separate per-column carries would mix the
    # timestamp of one right row with a stale payload of an older one
    row_struct = F.struct(F.col(ts_col).cast("long").alias("ts_sec"),
                          *[F.col(p).alias(p) for p in pay])
    r_struct_type = r1.select(row_struct.alias("_m")).schema["_m"].dataType
    l_tag = left.select(
        *lcols, F.lit(1).alias("_side"),
        F.lit(None).cast(r_struct_type).alias("_m"))
    r_tag = r1.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in (key_col, ts_col)],
        F.col(key_col), F.col(ts_col).alias(ts_col),
        F.lit(0).alias("_side"),
        row_struct.alias("_m"),
    ).select(*lcols, "_side", "_m")
    u = l_tag.unionByName(r_tag)
    # right rows sort BEFORE left rows at the same second (_side 0 < 1):
    # an equal-second right row is visible to the left row — the <= rule
    w = Window.partitionBy(key_col).orderBy(ts_col, "_side") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    m = F.last("_m", ignorenulls=True).over(w)
    carried = u.select(
        *lcols, "_side",
        *[m[p].alias(f"asof_{p}") for p in pay],
        m["ts_sec"].alias("asof_ts_sec"))
    out = carried.filter(F.col("_side") == 1).drop("_side")
    if how == "inner":
        out = out.filter(F.col("asof_ts_sec").isNotNull())
    elif how != "left":
        raise ValueError("how must be 'left' or 'inner'")
    return out
