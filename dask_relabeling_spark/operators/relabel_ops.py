"""Relabeling pipeline operators: segment, dedup (remove), merge, sort.

Each operator is a thin Spark wrapper over a pure-NumPy kernel from
``dask_relabeling_spark.kernels``; physical shapes:

* ``segment`` / ``remove``: narrow ``mapInPandas`` — zero shuffles, the
  kernels fuse into one Python stage per tile;
* ``merge``: one halo exchange (margins shuffle) feeding the paste kernel;
* ``sort_label_indices``: distributed ``explode -> distinct`` for the global
  label dictionary (partial + final hash agg; never ships pixels to the
  driver — only the distinct label set), then a broadcast of the sorted
  dictionary into a narrow remap.  This replaces the reference's explicit
  driver-side barrier (``relabeling.py:331``) and its O(L^2) ``list.index``
  remap (``chunkops.py:104-113``).
"""
from __future__ import annotations

from typing import Callable, Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ..kernels.ccl import segment_fn as default_segment_fn
from ..kernels.relabel import (merge_tiles as merge_kernel,
                               remove_overlapped_objects, sort_indices,
                               zero_classes_where_removed)
from ..sources.tiles import TileSet, key_cols
from .halo import halo_exchange, map_tiles, trim_overlap


def segment_overlapped_input(ts: TileSet,
                             seg_fn: Optional[Callable] = None,
                             returns_classes: bool = False,
                             segmentation_fn_kwargs: Optional[dict] = None,
                             extra_tiles: Optional[dict] = None) -> TileSet:
    """Run the user segmentation function independently per (overlapped)
    tile (reference ``relabeling.py:14-47``).

    ``seg_fn(tile, **kwargs) -> int32 labels`` — or, with
    ``returns_classes``, a stacked ``(1 + nclasses, *spatial)`` array whose
    plane 0 is labels.  ``extra_tiles`` maps kwarg names to other TileSets
    already aligned chunk-wise (the reference's dask-array kwargs,
    ``relabeling.py:28-36``); they are equi-joined on the tile key before
    the UDF, so alignment costs one co-partitioned join, not a new shuffle
    pattern.
    """
    fn = seg_fn or default_segment_fn
    kwargs = dict(segmentation_fn_kwargs or {})
    nd = ts.nd

    if extra_tiles:
        return _segment_with_aligned_kwargs(ts, fn, kwargs, returns_classes,
                                            extra_tiles)

    def fn_tile(tile, cls, loc):
        out = fn(tile, **kwargs)
        out = np.asarray(out)
        if returns_classes:
            return out[0].astype(np.int64), out[1:].astype(np.int64)
        return out.astype(np.int64), None

    return map_tiles(ts, fn_tile)


def _segment_with_aligned_kwargs(ts: TileSet, fn, kwargs: dict,
                                 returns_classes: bool,
                                 extra_tiles: dict) -> TileSet:
    """Chunk-aligned array kwargs: each extra TileSet equi-joins on the tile
    key (both sides hash-partition on the same integer key, so with
    co-partitioned inputs this is a single co-located shuffle), and its
    payload becomes an ndarray kwarg of the segmentation function —
    the reference's dask-array kwarg threading (``relabeling.py:28-36``).
    """
    import pandas as pd
    from ..sources.tiles import TILE_FIELDS, TILE_SCHEMA, pdf_tile, \
        tile_record
    nd = ts.nd
    keys = key_cols(nd)
    names = sorted(extra_tiles)
    df = ts.df
    for name in names:
        other_df = extra_tiles[name].df.select(
            *keys, F.col("data").alias(f"kw_{name}"))
        df = df.join(other_df, on=keys)

    def gen(batches):
        for pdf in batches:
            recs = []
            for _, row in pdf.iterrows():
                tile = pdf_tile(row, nd)
                extra = {name: np.asarray(row[f"kw_{name}"],
                                          dtype=np.int64).reshape(tile.shape)
                         for name in names}
                out = np.asarray(fn(tile, **extra, **kwargs))
                loc = tuple(int(row[c]) for c in keys)
                if returns_classes:
                    recs.append(tile_record(loc, out[0].astype(np.int64),
                                            out[1:].astype(np.int64)))
                else:
                    recs.append(tile_record(loc, out.astype(np.int64)))
            yield pd.DataFrame.from_records(
                recs, columns=[f.name for f in TILE_FIELDS])

    return ts.with_df(df.mapInPandas(gen, TILE_SCHEMA))


def remove_overlapped_labels(ts: TileSet, threshold: float = 0.5
                             ) -> TileSet:
    """Border dedup + deterministic global offset (narrow, no shuffle).
    Reference ``relabeling.py:50-76``."""
    nd, grid, ov = ts.nd, ts.grid, ts.overlaps

    def fn(tile, cls, loc):
        removed = remove_overlapped_objects(tile, ov, threshold, loc, grid)
        new_cls = None
        if cls is not None:
            new_cls = np.stack([zero_classes_where_removed(removed, p)
                                for p in cls])
        return removed, new_cls

    return map_tiles(ts, fn)


def merge_overlapped_tiles(ts: TileSet) -> TileSet:
    """Second halo exchange + neighbor paste + trim (one shuffle).
    Reference ``relabeling.py:79-99``."""
    nd, grid, ov = ts.nd, ts.grid, ts.overlaps
    exchanged = halo_exchange(ts, ov)

    def fn(expanded, cls, loc):
        merged = merge_kernel(expanded, ov, loc, grid, classes=cls)
        if cls is not None:
            return merged[0], merged[1:]
        return merged, None

    merged = map_tiles(exchanged, fn)
    # merge_kernel already stripped the exchange halo; tiles are back to the
    # pre-exchange (prepare-overlapped) geometry
    merged = merged.with_df(merged.df, overlaps=ov)
    return trim_overlap(merged)


def sort_label_indices(ts: TileSet, distributed: bool = False) -> TileSet:
    """Dense re-index of all labels to 0..N in sorted order.

    Default path: global dictionary = ``explode(data) -> distinct``
    (distributed partial + final aggregation); only the distinct labels
    (tiny vs pixels) reach the driver, are sorted, and ship back inside
    the remap closure — the Spark rendition of a broadcast join against a
    ``dense_rank`` dictionary.  Reference ``relabeling.py:312-346``.

    ``distributed=True`` is the scale path for when even the distinct
    label set is too large to collect/broadcast: dense ids come from
    ``functions.ids.dense_ids`` (range-partitioned two-pass indexing — no
    single-partition window, no driver materialization), each tile joins
    only ITS OWN labels' dictionary entries back (shuffle is O(distinct
    labels per tile), not O(global dictionary) per task), and the remap
    runs per tile against that local fragment.  Results are identical.
    """
    if not distributed:
        uniq = (ts.df.select(F.explode("data").alias("label"))
                .distinct().collect())
        dictionary = np.sort(np.array([r.label for r in uniq],
                                      dtype=np.int64))
        bc = ts.df.sparkSession.sparkContext.broadcast(dictionary)

        def fn(tile, cls, loc):
            return sort_indices(tile, bc.value), cls

        return map_tiles(ts, fn)

    from ..functions.ids import dense_ids
    nd = ts.nd
    keys = key_cols(nd)
    tile_labels = (ts.df.select(*keys, F.explode("data").alias("label"))
                   .distinct())
    dictionary = dense_ids(tile_labels.select("label").distinct(), "label")
    frag = (tile_labels.join(dictionary, "label")
            .groupBy(*keys)
            .agg(F.sort_array(F.collect_list(
                F.struct("label", "id"))).alias("_dict")))
    joined = ts.df.join(frag, list(keys))

    def gen(batches):
        import pandas as pd
        from ..sources.tiles import TILE_FIELDS, pdf_tile, pdf_classes, \
            tile_record
        for pdf in batches:
            recs = []
            for _, row in pdf.iterrows():
                tile = pdf_tile(row, nd)
                cls = pdf_classes(row, nd)
                loc = tuple(int(row[c]) for c in keys)
                ents = row["_dict"]
                labs = np.array([e["label"] for e in ents], dtype=np.int64)
                ids = np.array([e["id"] for e in ents], dtype=np.int64)
                remapped = ids[np.searchsorted(labs, tile)] \
                    .astype(tile.dtype)
                recs.append(tile_record(loc, remapped, cls))
            yield pd.DataFrame.from_records(
                recs, columns=[f.name for f in TILE_FIELDS])

    from ..sources.tiles import TILE_SCHEMA
    return ts.with_df(joined.mapInPandas(gen, TILE_SCHEMA))
