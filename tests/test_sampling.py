"""Deterministic sampling/splitting: rate convergence, reproducibility,
salt independence, and the zero-shuffle plan contract."""

import pandas as pd
import pytest

from rasterkit_spark.operators import sampling as SP


@pytest.fixture(scope="module")
def big_ids(spark):
    return spark.range(0, 20000).withColumnRenamed("id", "doc_id") \
        .selectExpr("doc_id",
                    "concat('s', cast(doc_id % 4 as string)) as source")


def test_stratified_rates_converge(spark, big_ids):
    rates = {"s0": 1_000_000, "s1": 500_000, "s2": 100_000, "s3": 0}
    got = SP.stratified_sample(big_ids, rates, stratum_col="source") \
        .groupBy("source").count().toPandas().set_index("source")
    assert got.loc["s0"]["count"] == 5000          # keep-all is exact
    assert abs(got.loc["s1"]["count"] / 5000 - 0.5) < 0.03
    assert abs(got.loc["s2"]["count"] / 5000 - 0.1) < 0.02
    assert "s3" not in got.index                   # rate 0 keeps nothing


def test_sample_deterministic_and_order_independent(spark, big_ids):
    rates = {"s0": 300_000, "s1": 300_000, "s2": 300_000, "s3": 300_000}
    a = set(r.doc_id for r in
            SP.stratified_sample(big_ids, rates).collect())
    shuffled = big_ids.orderBy("source", "doc_id").repartition(13)
    b = set(r.doc_id for r in
            SP.stratified_sample(shuffled, rates).collect())
    assert a == b and len(a) > 0


def test_split_fractions_and_salt_independence(spark, big_ids):
    got = SP.split_assign(big_ids).groupBy("split").count() \
        .toPandas().set_index("split")
    n = 20000
    assert abs(got.loc["train"]["count"] / n - 0.98) < 0.005
    assert abs(got.loc["val"]["count"] / n - 0.01) < 0.005
    # split of a 30% sample keeps ~98% train: the salts are independent,
    # so sampling must not skew the split distribution
    rates = {f"s{i}": 300_000 for i in range(4)}
    samp = SP.stratified_sample(big_ids, rates)
    sc = SP.split_assign(samp).groupBy("split").count() \
        .toPandas().set_index("split")
    tot = sc["count"].sum()
    assert abs(sc.loc["train"]["count"] / tot - 0.98) < 0.01


def test_sampling_plan_has_no_shuffle(spark, big_ids):
    rates = {"s0": 500_000}
    plan = SP.split_assign(SP.stratified_sample(big_ids, rates)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_chunk_documents_windows_and_overlap(spark):
    from rasterkit_spark.operators import text as TX
    words = " ".join(f"w{i}" for i in range(100))
    docs = spark.createDataFrame(pd.DataFrame([
        {"doc_id": 1, "text": words},           # 100 words
        {"doc_id": 2, "text": "a b c"},         # shorter than one chunk
        {"doc_id": 3, "text": ""},              # empty
    ]))
    got = TX.chunk_documents(docs, chunk_words=40, overlap=10) \
        .toPandas()
    one = got[got.doc_id == 1].sort_values("chunk_id")
    # stride 30: windows at 0, 30, 60 — the third reaches w99, so 3
    # chunks give complete coverage (no 4th window starts past the end)
    assert list(one.chunk_id) == [0, 1, 2]
    assert list(one.n_words) == [40, 40, 40]
    c0 = one.iloc[0].chunk_text.split()
    c1 = one.iloc[1].chunk_text.split()
    c2 = one.iloc[2].chunk_text.split()
    assert c0[30:] == c1[:10]                  # 10-word overlap carried
    assert c0[0] == "w0" and c1[0] == "w30" and c2[0] == "w60"
    assert c2[-1] == "w99"                     # full coverage
    two = got[got.doc_id == 2]
    assert len(two) == 1 and two.iloc[0].n_words == 3
    three = got[got.doc_id == 3]
    assert len(three) == 1 and three.iloc[0].n_words == 0
    with pytest.raises(ValueError):
        TX.chunk_documents(docs, chunk_words=10, overlap=10)


def test_skew_report_hot_keys(spark):
    rows = ([("hot",)] * 50 + [("warm",)] * 30 + [("k1",)] * 10
            + [("k2",)] * 10)
    df = spark.createDataFrame(rows, "k string")
    got = SP.skew_report(df, "k", top_k=3).toPandas()
    assert list(got.sort_values("rank").key) == ["hot", "warm", "k1"]
    top = got.set_index("key")
    assert top.loc["hot"].cnt == 50
    assert top.loc["hot"].share_e6 == 500_000
    assert top.loc["k1"]["rank"] == 3          # cnt tie with k2 → key asc
