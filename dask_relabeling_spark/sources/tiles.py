"""Tile table model: a chunked N-D image as a Spark DataFrame.

One row per chunk (SURVEY §1.3): grid location, local tile shape, the tile
payload as a flattened row-major ``ARRAY<BIGINT>``, plus an optional classes
payload (``nclasses`` planes, same spatial shape, concatenated).  The grid
shape, chunk shape, overlap state and original image shape are *driver-side*
metadata carried by :class:`TileSet` — in Spark there is no ambient
``block_info`` (reference ``chunkops.py:19-20``), so everything a kernel
needs is either a column or a broadcast-sized literal captured in the UDF
closure.

Scale notes: the payload column rides Arrow end-to-end (JVM <-> pandas UDF),
the tile key (cz, cy, cx) is a plain integer key usable for partitioning /
bucketing, and nothing here ever materializes the whole image on the driver
except the explicitly-named ``to_array`` test helper.
"""
from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

Loc = Tuple[int, ...]

TILE_FIELDS = [
    T.StructField("cz", T.IntegerType(), True),
    T.StructField("cy", T.IntegerType(), False),
    T.StructField("cx", T.IntegerType(), False),
    T.StructField("d", T.IntegerType(), True),
    T.StructField("h", T.IntegerType(), False),
    T.StructField("w", T.IntegerType(), False),
    T.StructField("data", T.ArrayType(T.LongType(), False), False),
    T.StructField("nclasses", T.IntegerType(), True),
    T.StructField("classes", T.ArrayType(T.LongType(), False), True),
]
TILE_SCHEMA = T.StructType(TILE_FIELDS)


def key_cols(nd: int) -> List[str]:
    return (["cz"] if nd == 3 else []) + ["cy", "cx"]


def shape_cols(nd: int) -> List[str]:
    return (["d"] if nd == 3 else []) + ["h", "w"]


def row_loc(row, nd: int) -> Loc:
    return (int(row.cz), int(row.cy), int(row.cx)) if nd == 3 \
        else (int(row.cy), int(row.cx))


def row_shape(row, nd: int) -> Loc:
    return (int(row.d), int(row.h), int(row.w)) if nd == 3 \
        else (int(row.h), int(row.w))


def pdf_tile(row, nd: int) -> np.ndarray:
    """Tile ndarray out of one pandas row."""
    shape = (int(row["d"]), int(row["h"]), int(row["w"])) if nd == 3 \
        else (int(row["h"]), int(row["w"]))
    return np.asarray(row["data"], dtype=np.int64).reshape(shape)


def pdf_classes(row, nd: int) -> Optional[np.ndarray]:
    """Classes planes (nclasses, *spatial) out of one pandas row, or None."""
    cls = row["classes"]
    if cls is None or (isinstance(cls, float) and np.isnan(cls)):
        return None
    n = int(row["nclasses"])
    shape = (n, int(row["d"]), int(row["h"]), int(row["w"])) if nd == 3 \
        else (n, int(row["h"]), int(row["w"]))
    return np.asarray(cls, dtype=np.int64).reshape(shape)


def tile_record(loc: Loc, tile: np.ndarray,
                classes: Optional[np.ndarray] = None) -> dict:
    nd = tile.ndim
    rec = {
        "cz": int(loc[0]) if nd == 3 else None,
        "cy": int(loc[-2]), "cx": int(loc[-1]),
        "d": int(tile.shape[0]) if nd == 3 else None,
        "h": int(tile.shape[-2]), "w": int(tile.shape[-1]),
        "data": tile.astype(np.int64).ravel(),
        "nclasses": None if classes is None else int(classes.shape[0]),
        "classes": None if classes is None
        else classes.astype(np.int64).ravel(),
    }
    return rec


@dataclass(frozen=True)
class TileSet:
    """A tile DataFrame plus the grid metadata every operator needs."""
    df: DataFrame
    nd: int                       # spatial dims (2 or 3)
    grid: Loc                     # chunks per axis
    chunk_shape: Loc              # base (halo-free) chunk shape
    overlaps: Loc                 # current halo depth per axis (0s if none)
    image_shape: Loc              # original (pre-pad) image shape

    @property
    def overlapped(self) -> bool:
        return any(o > 0 for o in self.overlaps)

    def with_df(self, df: DataFrame, **changes) -> "TileSet":
        return replace(self, df=df, **changes)


def from_array(spark: SparkSession, img: np.ndarray,
               chunk_shape: Sequence[int],
               classes: Optional[np.ndarray] = None,
               num_partitions: Optional[int] = None) -> TileSet:
    """Tile an in-memory ndarray into a TileSet (API-parity entry point; at
    real scale tiles arrive from a parquet/zarr tile table instead)."""
    nd = img.ndim
    chunk_shape = tuple(int(c) for c in chunk_shape)
    grid = tuple(-(-s // c) for s, c in zip(img.shape, chunk_shape))
    recs = []
    for loc in np.ndindex(grid):
        sel = tuple(slice(l * c, min((l + 1) * c, s))
                    for l, c, s in zip(loc, chunk_shape, img.shape))
        cls = None
        if classes is not None:
            cls = classes[(slice(None),) + sel]
        recs.append(tile_record(loc, img[sel], cls))
    pdf = pd.DataFrame.from_records(recs, columns=[f.name for f in
                                                   TILE_FIELDS])
    df = spark.createDataFrame(pdf, schema=TILE_SCHEMA)
    if num_partitions:
        df = df.repartition(num_partitions, *key_cols(nd))
    return TileSet(df=df, nd=nd, grid=grid, chunk_shape=chunk_shape,
                   overlaps=(0,) * nd, image_shape=tuple(img.shape))


def from_tiles(spark: SparkSession, tiles: dict, nd: int, grid: Loc,
               chunk_shape: Loc, overlaps: Loc,
               image_shape: Loc) -> TileSet:
    """Build a TileSet from ``{loc: ndarray}`` (test/golden loader)."""
    recs = [tile_record(loc, t) for loc, t in sorted(tiles.items())]
    pdf = pd.DataFrame.from_records(recs, columns=[f.name for f in
                                                   TILE_FIELDS])
    df = spark.createDataFrame(pdf, schema=TILE_SCHEMA)
    return TileSet(df=df, nd=nd, grid=grid, chunk_shape=chunk_shape,
                   overlaps=overlaps, image_shape=image_shape)


def to_tiles(ts: TileSet) -> dict:
    """Collect a TileSet into ``{loc: ndarray}`` (test helper; driver-side)."""
    out = {}
    for row in ts.df.collect():
        out[row_loc(row, ts.nd)] = np.asarray(
            row.data, dtype=np.int64).reshape(row_shape(row, ts.nd))
    return out


def to_array(ts: TileSet, trim_to_image: bool = True) -> np.ndarray:
    """Assemble the full image on the driver (test helper only)."""
    tiles = to_tiles(ts)
    grid = ts.grid
    rows: dict = {}
    arr = np.block([[tiles[(y, x)] for x in range(grid[-1])]
                    for y in range(grid[-2])]) if ts.nd == 2 else \
        np.block([[[tiles[(z, y, x)] for x in range(grid[2])]
                   for y in range(grid[1])] for z in range(grid[0])])
    if trim_to_image:
        arr = arr[tuple(slice(0, s) for s in ts.image_shape)]
    return arr


def load_npz_tiles(path: str, grid: Loc) -> dict:
    """Reference-style npz tile archive -> ``{loc: ndarray}``
    (key ``"i-j[-k]"``, reference tests/fixtures.py:31-39)."""
    out = {}
    with np.load(path, allow_pickle=True) as f:
        for loc in np.ndindex(grid):
            out[loc] = f["-".join(map(str, loc))]
    return out
