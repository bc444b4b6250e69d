"""The flagship tile-pipeline query: the relabeling engine bound to the
driver test tables.

A deterministic binary mask is derived from ``lineitem`` (one foreground
pixel per (orderkey mod H, partkey mod W)), tiled *distributedly* (rows
shuffle straight to their owning tile — the image never exists in one
piece anywhere), then pushed through the full image2labels pipeline:
halo exchange -> CCL segmentation -> checkerboard border dedup -> merge.
Output: per-tile object/pixel counts — deterministic, but CCL is not
SQL-expressible, so this entry carries no DuckDB oracle (rows-only check;
golden parity for the pipeline itself is covered by tests/ against the
reference fixtures).
"""
from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.pipeline import image2labels
from ..sources.tiles import TILE_SCHEMA, TileSet, tile_record
from .relational import register, t

H = W = 512
CHUNK = 128
OVERLAP = 16
GRID = (H // CHUNK, W // CHUNK)


def _mask_tiles(spark: SparkSession, sf_dir: str) -> TileSet:
    li = t(spark, sf_dir, "lineitem")
    # no .distinct(): the build kernel writes 1s idempotently, so duplicate
    # points are harmless and skipping the dedup saves a full shuffle+agg
    # of the point set before the groupBy-by-tile shuffle
    pts = (li.select((F.col("l_orderkey") % H).cast("int").alias("y"),
                     (F.col("l_partkey") % W).cast("int").alias("x"))
           .withColumn("cy", (F.col("y") / CHUNK).cast("int"))
           .withColumn("cx", (F.col("x") / CHUNK).cast("int")))

    def build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        cy, cx = int(key[0]), int(key[1])
        tile = np.zeros((CHUNK, CHUNK), dtype=np.int64)
        tile[pdf["y"].to_numpy() - cy * CHUNK,
             pdf["x"].to_numpy() - cx * CHUNK] = 1
        return pd.DataFrame.from_records(
            [tile_record((cy, cx), tile)],
            columns=[f.name for f in TILE_SCHEMA.fields])

    # every tile of the full grid must exist (empty tiles included)
    grid_df = spark.range(GRID[0] * GRID[1]).select(
        (F.col("id") / GRID[1]).cast("int").alias("cy"),
        (F.col("id") % GRID[1]).cast("int").alias("cx"),
        F.lit(-1).cast("int").alias("y"), F.lit(-1).cast("int").alias("x"))
    pts = pts.unionByName(grid_df).filter(F.col("y") >= -1)
    tiles_df = (pts.groupBy("cy", "cx").applyInPandas(
        lambda key, pdf: build(
            key, pdf[pdf["y"] >= 0]), TILE_SCHEMA))
    return TileSet(df=tiles_df, nd=2, grid=GRID, chunk_shape=(CHUNK, CHUNK),
                   overlaps=(0, 0), image_shape=(H, W))


@register("relabel_components", None)  # CCL: not SQL-expressible
def relabel_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    ts = _mask_tiles(spark, sf_dir)
    labeled = image2labels(ts, overlaps=OVERLAP, threshold=0.05)
    out = labeled.df.select(
        "cy", "cx",
        F.size(F.filter("data", lambda v: v != 0)).alias("n_fg_pixels"),
        F.size(F.array_distinct(F.filter("data", lambda v: v != 0)))
        .alias("n_objects_touching"))
    return out.orderBy("cy", "cx")
