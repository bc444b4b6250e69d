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

from ..sources.tiles import TileSet
from .halo import crop_to_image, halo_exchange, pad_edge_tiles
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
    """
    overlapped = prepare_input(ts, overlaps)
    extra = None
    if segmentation_tile_kwargs:
        extra = {name: prepare_input(other, overlaps)
                 for name, other in segmentation_tile_kwargs.items()}
    segmented = segment_overlapped_input(
        overlapped, seg_fn=seg_fn, returns_classes=returns_classes,
        segmentation_fn_kwargs=segmentation_fn_kwargs, extra_tiles=extra)
    deduped = remove_overlapped_labels(segmented, threshold=threshold)
    merged = merge_overlapped_tiles(deduped)
    return crop_to_image(merged)


def labels2geojson(ts: TileSet, overlaps: Union[int, List[int]] = 50,
                   threshold: float = 0.5,
                   object_classes: Optional[dict] = None,
                   pre_overlapped: bool = False):
    """(overlap) -> dedup -> annotate; no merge stage — annotation bakes the
    overlap bookkeeping into its coordinate offsets (reference
    ``relabeling.py:245-276``, threshold default 0.5)."""
    if not pre_overlapped:
        ts = prepare_input(ts, overlaps)
    deduped = remove_overlapped_labels(ts, threshold=threshold)
    return annotate_labeled_tiles(deduped, object_classes=object_classes)


def image2geojson(ts: TileSet, seg_fn: Optional[Callable] = None,
                  overlaps: Union[int, List[int]] = 50,
                  threshold: float = 0.5,
                  returns_classes: bool = False,
                  object_classes: Optional[dict] = None,
                  segmentation_fn_kwargs: Optional[dict] = None):
    """pad -> overlap -> segment -> dedup -> annotate (reference
    ``relabeling.py:279-309``)."""
    overlapped = prepare_input(ts, overlaps)
    segmented = segment_overlapped_input(
        overlapped, seg_fn=seg_fn, returns_classes=returns_classes,
        segmentation_fn_kwargs=segmentation_fn_kwargs)
    return labels2geojson(overlapped.with_df(segmented.df),
                          overlaps=overlapped.overlaps, threshold=threshold,
                          object_classes=object_classes, pre_overlapped=True)


__all__ = ["prepare_input", "image2labels", "labels2geojson",
           "image2geojson", "sort_label_indices",
           "segment_overlapped_input", "remove_overlapped_labels",
           "merge_overlapped_tiles", "annotate_labeled_tiles"]
