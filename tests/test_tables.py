"""Bucketed-table layout: the tile join over the bucketed table must not
shuffle the tile side (bucket pruning ∧ no Exchange above its scan)."""

import pytest
from pyspark.sql import functions as F

from rasterkit_spark.fixtures import corpus as CP
from rasterkit_spark.operators import extract as EX
from rasterkit_spark.sources import tables as T


@pytest.fixture(scope="module")
def warehouse(spark):
    c = CP.build_corpus(n_media=10, n_docs=20, n_queries=10)
    sdfs = c.to_spark(spark, ["tiles", "docs", "media_catalog",
                              "queries_bbox"])
    T.write_tiles_table(sdfs["tiles"], "t_tiles", n_buckets=8)
    T.write_docs_table(sdfs["docs"], "t_docs", n_buckets=8)
    return c, sdfs


def test_bucketed_tables_roundtrip(spark, warehouse):
    c, sdfs = warehouse
    assert spark.table("t_tiles").count() == len(c.tiles)
    assert spark.table("t_docs").count() == len(c.docs)
    stats = T.table_stats(spark, "t_tiles").toPandas()
    assert stats["count"].sum() == len(c.tiles)


def test_extract_over_bucketed_tiles_matches(spark, warehouse):
    c, sdfs = warehouse
    via_table = EX.extract(sdfs["queries_bbox"], sdfs["media_catalog"],
                           spark.table("t_tiles")).toPandas()
    via_df = EX.extract(sdfs["queries_bbox"], sdfs["media_catalog"],
                        sdfs["tiles"]).toPandas()
    a = set(zip(via_table.query_id, via_table.window_sha256))
    b = set(zip(via_df.query_id, via_df.window_sha256))
    assert a == b and len(a) > 0


def test_points_table_partition_pruning(spark):
    import pandas as pd
    import numpy as np
    rng = np.random.default_rng(5)
    pdf = pd.DataFrame({"id": range(2000),
                        "lon": rng.uniform(-170, 170, 2000),
                        "lat": rng.uniform(-80, 80, 2000)})
    T.write_points_table(spark.createDataFrame(pdf), "lon", "lat",
                         "t_points", join_res=12, partition_res=3)
    df = spark.table("t_points")
    one_cell = df.select("cell_p").first().cell_p
    plan = df.filter(F.col("cell_p") == one_cell)._jdf.queryExecution() \
        .explainString(spark._jvm.org.apache.spark.sql.execution
                       .ExplainMode.fromString("formatted"))
    # partition filter present → Iceberg/Hive-style partition pruning
    assert "PartitionFilters" in plan and "cell_p" in plan
