"""Sessionization and as-of join unit tests (brute-force oracles)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from rasterkit_spark.operators import temporal as TP


def test_sessionize_gap_boundaries(spark):
    ev = spark.createDataFrame(pd.DataFrame([
        dict(event_id=1, user_id=1, ts="2024-01-01 00:00:00"),
        dict(event_id=2, user_id=1, ts="2024-01-01 00:30:00"),  # gap = 1800
        dict(event_id=3, user_id=1, ts="2024-01-01 01:00:01"),  # gap = 1801
        dict(event_id=4, user_id=2, ts="2024-01-01 00:00:00"),
    ])).withColumn("ts", F.to_timestamp("ts"))
    got = TP.sessionize(ev, gap_sec=1800).toPandas() \
        .sort_values(["user_id", "session_seq"]).reset_index(drop=True)
    # exactly-at-gap stays in session (strict >); one over starts a new one
    u1 = got[got.user_id == 1]
    assert list(u1.session_seq) == [1, 2]
    assert list(u1.n_events) == [2, 1]
    assert list(u1.duration_sec) == [1800, 0]
    u2 = got[got.user_id == 2]
    assert list(u2.n_events) == [1] and list(u2.duration_sec) == [0]


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(pd.DataFrame([
        dict(event_id=101, user_id=1, ts_sec=10),
        dict(event_id=102, user_id=1, ts_sec=50),   # equal-second match
        dict(event_id=103, user_id=1, ts_sec=3),    # no prior → NULL
        dict(event_id=104, user_id=2, ts_sec=10),   # key with no right rows
    ]))
    right = spark.createDataFrame(pd.DataFrame([
        dict(event_id=201, user_id=1, ts_sec=5),
        dict(event_id=202, user_id=1, ts_sec=50),
        dict(event_id=203, user_id=1, ts_sec=50),   # same-second dup: max id
        dict(event_id=204, user_id=1, ts_sec=60),   # future → never matched
    ]))
    got = TP.asof_join(left, right, "user_id", "ts_sec", ("event_id",)) \
        .toPandas().set_index("event_id")
    assert got.loc[101].asof_event_id == 201
    assert got.loc[102].asof_event_id == 203      # <= tie → latest, max id
    assert pd.isna(got.loc[103].asof_event_id)
    assert pd.isna(got.loc[104].asof_event_id)
    inner = TP.asof_join(left, right, "user_id", "ts_sec", ("event_id",),
                         how="inner").toPandas()
    assert set(inner.event_id) == {101, 102}
    with pytest.raises(ValueError):
        TP.asof_join(left, right, "user_id", "ts_sec", (), how="outer")


def test_asof_join_payloadless_carries_ts(spark):
    left = spark.createDataFrame(pd.DataFrame(
        [dict(k=1, ts_sec=9)]))
    right = spark.createDataFrame(pd.DataFrame(
        [dict(k=1, ts_sec=4), dict(k=1, ts_sec=7)]))
    got = TP.asof_join(left, right, "k", "ts_sec").toPandas()
    assert got.iloc[0].asof_ts_sec == 7


def test_asof_join_null_payload_in_matched_row(spark):
    """The matched right row's NULL payload must come through as NULL —
    not a stale payload carried from an older right row."""
    left = spark.createDataFrame(pd.DataFrame(
        [dict(event_id=1, user_id=1, ts_sec=10)]))
    right = spark.createDataFrame(
        [(7, 1, 5), (None, 1, 8)],
        "payload int, user_id long, ts_sec long")
    got = TP.asof_join(left, right, "user_id", "ts_sec",
                       ("payload",)).toPandas()
    assert got.iloc[0].asof_ts_sec == 8          # matched row is ts=8
    assert pd.isna(got.iloc[0].asof_payload)     # its payload IS null
