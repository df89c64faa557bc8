"""Engine-managed table layouts (SURVEY.md §4 partitioning strategy).

At 100 TB the physical layout *is* the query plan:

- ``tiles``: bucketed by ``media_ref`` (co-locates every chunk of a raster
  → the J1 tile join shuffles only the small query side), sorted within
  buckets by ``(level, tile_y, tile_x)`` so parquet row-group min/max stats
  prune the J1/J2 range predicates at scan time.
- ``docs`` (input_hint shape): bucketed by ``doc_id`` — reassembly after
  posexplode/join is shuffle-free within a bucket.
- ``points``/cell-keyed tables: partitioned by a coarse parent cell
  (``cell_p``), giving partition pruning for spatial predicates while
  keeping partition counts bounded (res-5 parent → ≤ 1024 partitions).

Local sandbox uses the Spark warehouse (parquet managed tables); on a real
cluster these map 1:1 to Iceberg ``bucket(N, col)`` / identity partition
transforms (session.TABLE_FORMAT switch).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import cells as C


def _drop_table(spark: SparkSession, name: str) -> None:
    """Idempotent drop: clears both the catalog entry and any orphaned
    warehouse directory left by a previous session (a fresh in-memory
    metastore doesn't know about it, so DROP alone won't remove it)."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    path = os.path.join(wh.replace("file:", ""), name.lower())
    shutil.rmtree(path, ignore_errors=True)


def write_tiles_table(tiles: DataFrame, name: str = "tiles",
                      n_buckets: int = 64) -> None:
    _drop_table(tiles.sparkSession, name)
    (tiles.repartition(n_buckets, "media_ref")
     .sortWithinPartitions("media_ref", "level", "tile_y", "tile_x")
     .write.mode("overwrite")
     .bucketBy(n_buckets, "media_ref")
     .sortBy("level", "tile_y", "tile_x")
     .format("parquet")
     .saveAsTable(name))


def write_docs_table(docs: DataFrame, name: str = "docs",
                     n_buckets: int = 64) -> None:
    _drop_table(docs.sparkSession, name)
    (docs.repartition(n_buckets, "doc_id")
     .write.mode("overwrite")
     .bucketBy(n_buckets, "doc_id")
     .format("parquet")
     .saveAsTable(name))


def write_points_table(points: DataFrame, lon_col: str, lat_col: str,
                       name: str = "points", join_res: int = 12,
                       partition_res: int = 5) -> None:
    """Cell-indexed point table: fine cell for the join key, coarse parent
    cell as the partition column (pruning without small-file explosion)."""
    _drop_table(points.sparkSession, name)
    p = points.withColumn(
        "cell", C.grid_cell_from_lonlat(F.col(lon_col), F.col(lat_col),
                                        join_res))
    p = p.withColumn(
        "cell_p", C.grid_cell_from_lonlat(F.col(lon_col), F.col(lat_col),
                                          partition_res))
    (p.write.mode("overwrite").partitionBy("cell_p")
     .format("parquet").saveAsTable(name))


def table_stats(spark: SparkSession, name: str) -> DataFrame:
    """Per-bucket/partition row counts — the skew pre-pass feed."""
    df = spark.table(name)
    key = "cell_p" if "cell_p" in df.columns else (
        "media_ref" if "media_ref" in df.columns else df.columns[0])
    return df.groupBy(key).count().orderBy(F.desc("count"))
