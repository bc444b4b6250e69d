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


def _is_null(v) -> bool:
    """NULL in a pandas-converted Arrow batch: ``None`` for object
    columns, ``NaN`` for nullable-int columns (Arrow widens them to
    float64)."""
    return v is None or (isinstance(v, float) and np.isnan(v))


def attributed_error(msg: str) -> ValueError:
    """A chunk-attributed validation error.  The ``_chunk_attributed``
    sentinel tells ``operators/halo._chunk_loud`` the message already
    carries its chunk coordinates, so the wrapper must pass it through
    instead of prepending a DIFFERENT chunk's context (round-14 ADVICE:
    the previous message-prefix match let an error re-raised while
    assembling another chunk through unattributed, and a kernel error
    whose text happened to start with ``tile (`` skipped attribution)."""
    exc = ValueError(msg)
    exc._chunk_attributed = True
    return exc


def _row_key_str(row, nd: int) -> str:
    """Raw key rendering for error context, e.g. ``(cy=1, cx=None)``.
    Integral floats render as ints (pandas widens int columns to float
    when a row mixes them with NULLs) and NaN as None, so the message
    is the same whichever dtype the batch arrived in."""
    def fmt(v):
        if isinstance(v, float):
            return None if np.isnan(v) else (int(v) if v == int(v) else v)
        return v
    return "(" + ", ".join(
        f"{c}={fmt(row[c])}" for c in key_cols(nd)) + ")"


def pdf_tile(row, nd: int) -> np.ndarray:
    """Tile ndarray out of one pandas row, with the structural checks
    dask's shape bookkeeping gives the reference for free (a dask chunk
    CANNOT have a payload/shape mismatch, ``chunkops.py:19-32``) — a
    Spark tile TABLE has no such guarantee, and without these checks a
    malformed row fails SILENTLY (``np.reshape`` with a -1 dimension
    INFERS it from the payload length; a zero dimension reshapes an
    empty payload into a tile that vanishes into the exchange) or
    anonymously (a bare reshape ValueError with no chunk coordinates —
    undebuggable at one bad row in 10^9).  Loud, chunk-attributed
    failure mirrors the media kernels' posture
    (``operators/multimodal._loud``; round-14 tile fuzz arm,
    ``tools/dirty_fuzz.py --tiles``)."""
    shape = _checked_shape(row, nd)
    data = row["data"]
    # iterrows() renders a NULL array cell as float NaN, not None
    if _is_null(data):
        raise attributed_error(
            f"tile {_row_key_str(row, nd)}: NULL payload")
    n = 1
    for s in shape:
        n *= s
    if len(data) != n:
        raise attributed_error(
            f"tile {_row_key_str(row, nd)}: payload length {len(data)} "
            f"!= {'x'.join(map(str, shape))} = {n}")
    return np.asarray(data, dtype=np.int64).reshape(shape)


def _checked_shape(row, nd: int) -> Loc:
    """Validated spatial tile shape out of one pandas row — shared by
    ``pdf_tile`` and ``pdf_classes`` (round-14 ADVICE: ``pdf_classes``
    used to read ``int(row['d'])/['h']/['w']`` unchecked, safe only
    because every call site evaluated ``pdf_tile`` first; a standalone
    caller on a NULL-dim row died as an anonymous ``int(None)``)."""
    dims = []
    for c in shape_cols(nd):
        v = row[c]
        if _is_null(v):
            raise attributed_error(
                f"tile {_row_key_str(row, nd)}: NULL dimension {c}")
        if int(v) <= 0:
            raise attributed_error(f"tile {_row_key_str(row, nd)}: "
                                   f"non-positive dimension {c}={int(v)}")
        dims.append(int(v))
    return tuple(dims)


def pdf_classes(row, nd: int) -> Optional[np.ndarray]:
    """Classes planes (nclasses, *spatial) out of one pandas row, or
    None.  The ``nclasses``/``classes`` pair must be NULL together and
    sized ``nclasses * d*h*w`` — same loud chunk-attributed posture as
    ``pdf_tile`` (previously a one-sided NULL either silently dropped
    the classes plane or died as an anonymous ``int(None)``)."""
    cls = row["classes"]
    ncl = row["nclasses"]
    cls_null = cls is None or (isinstance(cls, float) and np.isnan(cls))
    if cls_null and _is_null(ncl):
        return None
    if cls_null or _is_null(ncl):
        raise attributed_error(
            f"tile {_row_key_str(row, nd)}: nclasses/classes must be "
            f"NULL together (nclasses="
            f"{'NULL' if _is_null(ncl) else int(ncl)}, classes "
            f"{'NULL' if cls_null else 'present'})")
    n = int(ncl)
    if n <= 0:
        raise attributed_error(f"tile {_row_key_str(row, nd)}: "
                               f"non-positive nclasses={n}")
    shape = (n,) + _checked_shape(row, nd)
    want = 1
    for s in shape:
        want *= s
    if len(cls) != want:
        raise attributed_error(
            f"tile {_row_key_str(row, nd)}: classes length {len(cls)} "
            f"!= nclasses x tile = {want}")
    return np.asarray(cls, dtype=np.int64).reshape(shape)


def checked_loc(row, nd: int, grid: Loc) -> Loc:
    """Tile key out of one pandas row, validated: a NULL key component
    or an out-of-grid location fails loudly with the raw key.  Without
    this a NULL key dies as an anonymous ``int(None)`` TypeError, and —
    worse — an out-of-grid row SILENTLY emits halo margins into
    neighbors it does not own (wrong ownership, corrupting tiles that
    are themselves well-formed)."""
    vals = [row[c] for c in key_cols(nd)]
    if any(_is_null(v) for v in vals):
        raise attributed_error(
            f"tile {_row_key_str(row, nd)}: NULL key component")
    loc = tuple(int(v) for v in vals)
    if any(not (0 <= l < g) for l, g in zip(loc, grid)):
        raise attributed_error(
            f"tile {_row_key_str(row, nd)}: location outside the "
            f"declared grid {tuple(int(g) for g in grid)}")
    return loc


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
