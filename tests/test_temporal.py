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


def test_corpus_stats_exact_percentiles(spark):
    from rasterkit_spark.operators import text as TX
    docs = spark.createDataFrame(pd.DataFrame([
        dict(doc_id=i, source="s0", text="w " * i + "w")    # lengths vary
        for i in range(1, 6)] + [
        dict(doc_id=10, source="s1", text="")]))
    got = TX.corpus_stats(docs).toPandas().set_index("source")
    assert got.loc["s0"].n_docs == 5
    assert got.loc["s0"].total_words == sum(i + 1 for i in range(1, 6))
    # lengths: 2i+1 chars for i=1..5 → [3,5,7,9,11]; p50 = 7
    assert got.loc["s0"].p50_chars_e6 == 7_000_000
    assert got.loc["s1"].total_words == 0


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


def test_pii_scrub_redaction_and_counts(spark):
    from rasterkit_spark.operators import text as TX
    docs = spark.createDataFrame(pd.DataFrame([
        dict(doc_id=1, text="mail a.b+c@x-mail.co.uk or b@y.io, "
                            "call +4915112345678, host 192.168.001.1 up"),
        dict(doc_id=2, text="clean text with no pii at all"),
        dict(doc_id=3, text="not an ip 1234.5.6.7890 and not a phone +12"),
    ]))
    got = TX.pii_scrub(docs).toPandas().set_index("doc_id")
    assert got.loc[1].n_emails == 2
    assert got.loc[1].n_phones == 1
    assert got.loc[1].n_ips == 1
    c = got.loc[1].clean_text
    assert "<EMAIL>" in c and "<PHONE>" in c and "<IP>" in c
    assert "@" not in c and "+4915" not in c and "192.168" not in c
    assert got.loc[2].clean_text == "clean text with no pii at all"
    assert (got.loc[2][["n_emails", "n_phones", "n_ips"]] == 0).all()
    # 1234.5.6.7890: the \b-bounded octet pattern must not fire inside
    # longer digit runs; +12 is below the 7-digit phone floor
    assert got.loc[3].n_ips == 0 and got.loc[3].n_phones == 0


def test_tfidf_keywords_ranking(spark):
    from rasterkit_spark.operators import text as TX
    import math
    docs = spark.createDataFrame(pd.DataFrame([
        dict(doc_id=1, text="apple apple banana common"),
        dict(doc_id=2, text="cherry common"),
        dict(doc_id=3, text="common plum plum plum"),
    ]))
    got = TX.tfidf_keywords(docs, k=2).toPandas()
    one = got[got.doc_id == 1].sort_values("rank")
    # apple: tf=2, df=1 → 2·ln(3); banana: 1·ln(3); common: 1·ln(1)=0
    assert list(one.term) == ["apple", "banana"]
    assert one.iloc[0].tfidf_e4 == int(math.floor(2 * math.log(3) * 1e4))
    # 'common' appears in every doc → idf 0: score exactly 0, and never
    # ranked above any distinguishing term (it can still fill out top-k
    # for docs with fewer than k distinctive terms, like doc 2)
    common = got[got.term == "common"]
    assert (common.tfidf_e4 == 0).all()
    assert (common["rank"] == 2).all()
    assert got.groupby("doc_id").size().max() <= 2
