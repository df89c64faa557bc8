"""Physical-plan regression tests: pushdown, pruning, and join strategy
must stay the plans we designed (SURVEY.md §4), not whatever drifts in."""

import re
import tempfile

import pytest

from rasterkit_spark.fixtures import corpus as CP
from rasterkit_spark.operators import extract as EX


@pytest.fixture(scope="module")
def parquet_tables(spark):
    c = CP.build_corpus(n_media=8, n_docs=20, n_queries=10)
    d = tempfile.mkdtemp()
    sdfs = c.to_spark(spark, ["queries_bbox", "media_catalog", "tiles"])
    out = {}
    for k, df in sdfs.items():
        df.write.mode("overwrite").parquet(f"{d}/{k}")
        out[k] = spark.read.parquet(f"{d}/{k}")
    return out


def _formatted_plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))


def test_extract_plan_pushdown_and_broadcast(spark, parquet_tables):
    t = parquet_tables
    out = EX.extract(t["queries_bbox"], t["media_catalog"], t["tiles"])
    plan = _formatted_plan(spark, out)
    # catalog filter reaches the parquet scan
    assert "EqualTo(media_kind,raster)" in plan
    # level predicate reaches the tile scan (partition-pruning analog)
    assert "EqualTo(level,0)" in plan
    # tile scan is column-pruned to exactly what decode needs (no blob-less
    # metadata columns dragged along)
    m = re.search(r"ReadSchema: struct<media_ref:string,level:(big)?int,"
                  r"tile_x:(big)?int,tile_y:(big)?int,blob:binary>", plan)
    assert m, "tile scan no longer column-pruned"
    # small sides broadcast; no sort-merge join in the small-query regime
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_region_math_stays_jvm_side(spark, parquet_tables):
    t = parquet_tables
    regions = EX.resolve_regions(t["queries_bbox"], t["media_catalog"])
    plan = _formatted_plan(spark, regions)
    # no Python evaluation in region resolution — pure column expressions
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "FlatMapGroupsInPandas" not in plan


def test_decode_is_single_grouped_pandas_stage(spark, parquet_tables):
    t = parquet_tables
    out = EX.extract(t["queries_bbox"], t["media_catalog"], t["tiles"])
    plan = _formatted_plan(spark, out)
    # exactly one Python stage: the grouped decode+clip (formatted mode
    # prints each operator twice: tree + detail → count distinct ids)
    ids = set(re.findall(r"FlatMapGroupsInPandas \((\d+)\)", plan))
    assert len(ids) == 1
