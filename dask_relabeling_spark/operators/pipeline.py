"""Public API parity layer: the reference's three entry points plus sort,
re-expressed over TileSets (reference ``relabel/__init__.py:1-7`` exports
and ``relabeling.py:195-309`` signatures/defaults).

The composed plan for ``image2labels`` is exactly two shuffles — the two
halo exchanges — with every kernel stage a narrow map fused between them
(SURVEY §3.1):

    tiles -(exchange)-> overlapped -(UDF seg)-> -(UDF dedup)->
          -(exchange)-> -(UDF paste/trim)-> labels
"""
from __future__ import annotations

from typing import Callable, List, Optional, Union

import numpy as np

from ..kernels.ccl import segment_fn as default_segment_fn
from ..kernels.halo import pad_tile
from ..kernels.relabel import (merge_tiles as merge_kernel,
                               remove_overlapped_objects,
                               zero_classes_where_removed)
from ..sources.tiles import TileSet
from .halo import (crop_to_image, fused_double_exchange, halo_exchange,
                   pad_edge_tiles)
from .annotate_ops import annotate_labeled_tiles
from .relabel_ops import (merge_overlapped_tiles, remove_overlapped_labels,
                          segment_overlapped_input, sort_label_indices)


def _norm_overlaps(overlaps: Union[int, List[int]], nd: int) -> tuple:
    if isinstance(overlaps, int):
        return (overlaps,) * nd
    return tuple(int(o) for o in overlaps)


def prepare_input(ts: TileSet, overlaps: Union[int, List[int]]) -> TileSet:
    """Pad to a chunk multiple, then materialize the halo (one shuffle).
    Reference ``relabeling.py:166-192``."""
    ov = _norm_overlaps(overlaps, ts.nd)
    return halo_exchange(pad_edge_tiles(ts), ov)


def _pad_pre(chunk):
    """Per-tile pad-to-chunk kernel for the fused exchanges (closes over
    the chunk shape only — a TileSet holds the DataFrame and through it
    the unpicklable SparkContext)."""
    def pre(tile, cls, loc):
        tile = pad_tile(tile, chunk)
        if cls is not None:
            cls = np.stack([pad_tile(p, chunk) for p in cls])
        return tile, cls
    return pre


def _split_seg_output(out, returns_classes):
    """Normalize a segmentation function's output to (labels, classes):
    plane 0 is labels when the fn returns a stacked classes array
    (reference contract, ``relabeling.py:22-24``)."""
    out = np.asarray(out)
    if returns_classes:
        return out[0].astype(np.int64), out[1:].astype(np.int64)
    return out.astype(np.int64), None


def image2labels(ts: TileSet, seg_fn: Optional[Callable] = None,
                 overlaps: Union[int, List[int]] = 50,
                 threshold: float = 0.05,
                 returns_classes: bool = False,
                 segmentation_fn_kwargs: Optional[dict] = None,
                 segmentation_tile_kwargs: Optional[dict] = None) -> TileSet:
    """End-to-end: pad -> overlap -> segment -> dedup -> merge -> unpad.
    Reference ``relabeling.py:195-242`` (note threshold default 0.05).

    ``segmentation_tile_kwargs`` maps kwarg names to aligned TileSets (the
    reference's dask-array kwargs); each goes through the same
    pad+overlap preparation, then equi-joins on the tile key
    (``relabeling.py:206-213``).

    Physical plan (no tile kwargs): ``fused_double_exchange`` — the whole
    pipeline in 3 Python passes / 2 shuffles, kernels unchanged (golden
    byte-equality).  With aligned tile kwargs the equi-join forces a
    materialization between exchange 1 and the segmentation UDF, so that
    path keeps the stage-per-operator composition.
    """
    if segmentation_tile_kwargs:
        overlapped = prepare_input(ts, overlaps)
        extra = {name: prepare_input(other, overlaps)
                 for name, other in segmentation_tile_kwargs.items()}
        segmented = segment_overlapped_input(
            overlapped, seg_fn=seg_fn, returns_classes=returns_classes,
            segmentation_fn_kwargs=segmentation_fn_kwargs,
            extra_tiles=extra)
        deduped = remove_overlapped_labels(segmented, threshold=threshold)
        merged = merge_overlapped_tiles(deduped)
        return crop_to_image(merged)

    ov = _norm_overlaps(overlaps, ts.nd)
    pre = _pad_pre(ts.chunk_shape)
    mid, fin = _labels_mid_fin(
        seg_fn or default_segment_fn, dict(segmentation_fn_kwargs or {}),
        returns_classes, ov, threshold, ts.grid, ts.chunk_shape,
        ts.image_shape)
    return fused_double_exchange(ts, ov, pre, mid, fin)


def _labels_mid_fin(fn, kwargs, returns_classes, ov, threshold, grid,
                    chunk, img):
    """The segment+dedup (mid) and merge+trim+crop (fin) kernel chains of
    ``image2labels``, shared with the from-pieces fusion path."""

    def mid(tile, cls, loc):
        seg, seg_cls = _split_seg_output(fn(tile, **kwargs),
                                         returns_classes)
        removed = remove_overlapped_objects(seg, ov, threshold, loc, grid)
        new_cls = None
        if seg_cls is not None:
            new_cls = np.stack([zero_classes_where_removed(removed, p)
                                for p in seg_cls])
        return removed, new_cls

    def fin(tile, cls, loc):
        merged = merge_kernel(tile, ov, loc, grid, classes=cls)
        if cls is not None:
            m, mc = merged[0], merged[1:]
        else:
            m, mc = merged, None
        # NB `-o or None`: with a zero overlap on an axis slice(0, -0)
        # would silently empty the tile
        trim = tuple(slice(o if c > 0 else 0,
                           (-o or None) if c < g - 1 else None)
                     for c, g, o in zip(loc, grid, ov))
        crop = tuple(slice(0, min((l + 1) * c, s) - l * c)
                     for l, c, s in zip(loc, chunk, img))
        m = m[trim][crop]
        mc = None if mc is None else mc[(slice(None),) + trim][
            (slice(None),) + crop]
        return m, mc

    return mid, fin


def image2labels_from_pieces(pieces_df, nd: int, grid, chunk_shape,
                             image_shape, spark,
                             seg_fn: Optional[Callable] = None,
                             overlaps: Union[int, List[int]] = 50,
                             threshold: float = 0.05) -> TileSet:
    """``image2labels`` for a source that already emitted halo pieces
    (``operators/halo.py::emit_piece_records`` inside its own build
    pass): the full tile payload never crosses the Arrow boundary before
    the first exchange — one fewer full-payload generation than
    building a tile table first.  Kernels and result are identical to
    ``image2labels`` (asserted by ``tests/test_spark_pipeline.py``)."""
    from .halo import double_exchange_pieces
    ov = _norm_overlaps(overlaps, nd)
    mid, fin = _labels_mid_fin(
        seg_fn or default_segment_fn, {}, False, ov, threshold, grid,
        chunk_shape, image_shape)
    out = double_exchange_pieces(pieces_df, nd, grid, ov, mid, fin)
    return TileSet(df=out, nd=nd, grid=grid, chunk_shape=chunk_shape,
                   overlaps=(0,) * nd, image_shape=image_shape)


def _geojson_finish(grid, chunk, ov, object_classes, threshold,
                    seg=None, returns_classes=False, seg_kwargs=None):
    """Fused (segment) -> border-dedup -> annotate kernel chain, emitting
    one annotation record per tile (NULL for empty, the reference's
    scalar-0 sentinel)."""
    import json

    from ..kernels.annotate import (annotation_offset,
                                    annotation_offset_nd,
                                    labels_to_annotations,
                                    labels_to_annotations_3d)
    from ..kernels.halo import tile_origin

    kwargs = dict(seg_kwargs or {})
    classes_map = {0: "cell"} if object_classes is None else object_classes

    def finish(tile, cls, loc):
        if seg is not None:
            tile, cls = _split_seg_output(seg(tile, **kwargs),
                                          returns_classes)
        removed = remove_overlapped_objects(tile, ov, threshold, loc, grid)
        if cls is not None:
            cls = np.stack([zero_classes_where_removed(removed, p)
                            for p in cls])
        origin = tile_origin(loc, grid, chunk, ov)
        if removed.ndim == 2:
            off = annotation_offset(loc, origin, ov)
            ann = labels_to_annotations(removed, classes_map,
                                        classes=cls, offset=off)
        else:  # 3D extension: footprint contour + zRange property
            off = annotation_offset_nd(loc, origin, ov)
            ann = labels_to_annotations_3d(removed, classes_map,
                                           classes=cls, offset=off)
        return [{"cz": loc[0] if len(loc) == 3 else None,
                 "cy": loc[-2], "cx": loc[-1],
                 "annotation": None if ann is None else json.dumps(ann)}]

    return finish


def labels2geojson(ts: TileSet, overlaps: Union[int, List[int]] = 50,
                   threshold: float = 0.5,
                   object_classes: Optional[dict] = None,
                   pre_overlapped: bool = False):
    """(overlap) -> dedup -> annotate; no merge stage — annotation bakes the
    overlap bookkeeping into its coordinate offsets (reference
    ``relabeling.py:245-276``, threshold default 0.5).

    Physical plan: dedup+annotate fuse into ONE Python pass; with
    ``pre_overlapped=False`` the pad+emit of the halo exchange fuses in
    front (2 passes, 1 shuffle total)."""
    from .halo import fused_exchange_records, map_tiles_records
    from .annotate_ops import ANNOTATION_SCHEMA
    if ts.nd not in (2, 3):
        raise NotImplementedError(
            f"annotation supports 2D (reference parity) and 3D "
            f"(footprint+zRange extension), got {ts.nd}D")
    if pre_overlapped:
        ov = ts.overlaps
        finish = _geojson_finish(ts.grid, ts.chunk_shape, ov,
                                 object_classes, threshold)
        return map_tiles_records(ts, finish, ANNOTATION_SCHEMA)
    ov = _norm_overlaps(overlaps, ts.nd)
    finish = _geojson_finish(ts.grid, ts.chunk_shape, ov,
                             object_classes, threshold)

    pre = _pad_pre(ts.chunk_shape)

    return fused_exchange_records(ts, ov, pre, finish, ANNOTATION_SCHEMA)


def image2geojson(ts: TileSet, seg_fn: Optional[Callable] = None,
                  overlaps: Union[int, List[int]] = 50,
                  threshold: float = 0.5,
                  returns_classes: bool = False,
                  object_classes: Optional[dict] = None,
                  segmentation_fn_kwargs: Optional[dict] = None):
    """pad -> overlap -> segment -> dedup -> annotate (reference
    ``relabeling.py:279-309``) — fused into 2 Python passes / 1 shuffle:
    mapInPandas(pad+emit) -> groupBy(key) -> applyInPandas(assemble+
    segment+dedup+annotate)."""
    from .halo import fused_exchange_records
    from .annotate_ops import ANNOTATION_SCHEMA
    if ts.nd not in (2, 3):
        raise NotImplementedError(
            f"annotation supports 2D (reference parity) and 3D "
            f"(footprint+zRange extension), got {ts.nd}D")
    ov = _norm_overlaps(overlaps, ts.nd)
    fn = seg_fn or default_segment_fn
    finish = _geojson_finish(ts.grid, ts.chunk_shape, ov, object_classes,
                             threshold, seg=fn,
                             returns_classes=returns_classes,
                             seg_kwargs=segmentation_fn_kwargs)

    pre = _pad_pre(ts.chunk_shape)

    return fused_exchange_records(ts, ov, pre, finish, ANNOTATION_SCHEMA)


__all__ = ["prepare_input", "image2labels", "labels2geojson",
           "image2geojson", "sort_label_indices",
           "segment_overlapped_input", "remove_overlapped_labels",
           "merge_overlapped_tiles", "annotate_labeled_tiles"]
