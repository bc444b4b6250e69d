"""Persistent parquet tile store: a TileSet as an on-disk dataset.

This is the 100 TB ingest path the in-memory ``from_array`` stands in for
(reference: arrays arrive via dask/zarr, ``examples/test_relabeling_3D
.ipynb``): one parquet row per tile, hive-partitioned by tile row ``cy``
so spatial crops prune whole directories at the scan, plus a tiny JSON
sidecar carrying the driver-side grid metadata (grid, chunk shape,
overlaps, image shape — the reference's ambient ``block_info``,
``chunkops.py:19-20``).

Write once, then any number of pipeline runs read straight from the
store; no driver ever holds more than the metadata.
"""
from __future__ import annotations

import json
import os
from typing import Optional, Sequence, Tuple

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .tiles import TILE_SCHEMA, TileSet

META_FILE = "_tileset_meta.json"


def write_tile_store(ts: TileSet, path: str, mode: str = "error") -> None:
    """Persist ``ts`` under ``path``: parquet partitioned by ``cy`` (+
    ``cz`` for 3D) with the TileSet metadata as a JSON sidecar."""
    part_cols = ["cz", "cy"] if ts.nd == 3 else ["cy"]
    ts.df.write.mode(mode).partitionBy(*part_cols).parquet(path)
    meta = {"nd": ts.nd, "grid": list(ts.grid),
            "chunk_shape": list(ts.chunk_shape),
            "overlaps": list(ts.overlaps),
            "image_shape": list(ts.image_shape)}
    with open(os.path.join(path, META_FILE), "w") as f:
        json.dump(meta, f)


def read_tile_store(spark: SparkSession, path: str,
                    row_range: Optional[Tuple[int, int]] = None) -> TileSet:
    """Load a tile store.  ``row_range=(lo, hi)`` crops to tile rows
    ``lo <= cy < hi`` — the filter lands on the hive partition column, so
    pruning skips the other rows' files entirely (a spatial crop reads
    only its stripe of a 100 TB image)."""
    with open(os.path.join(path, META_FILE)) as f:
        meta = json.load(f)
    df = spark.read.schema(TILE_SCHEMA).parquet(path)
    grid = tuple(meta["grid"])
    image_shape = tuple(meta["image_shape"])
    if row_range is not None:
        lo, hi = row_range
        df = df.filter((F.col("cy") >= lo) & (F.col("cy") < hi))
        ny = hi - lo
        # re-key rows so the cropped set is a dense 0..ny-1 grid
        df = df.withColumn("cy", (F.col("cy") - lo).cast("int"))
        chunk_h = meta["chunk_shape"][-2]
        grid = (*grid[:-2], ny, grid[-1])
        image_shape = (*image_shape[:-2],
                       min(ny * chunk_h, image_shape[-2] - lo * chunk_h),
                       image_shape[-1])
    return TileSet(df=df, nd=meta["nd"], grid=grid,
                   chunk_shape=tuple(meta["chunk_shape"]),
                   overlaps=tuple(meta["overlaps"]),
                   image_shape=image_shape)
