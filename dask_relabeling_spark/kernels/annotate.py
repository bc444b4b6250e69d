"""Per-tile GeoJSON annotation kernel.

Converts a (deduped, offset) label tile into one QuPath-style GeoJSON
FeatureCollection dict — one Polygon Feature per object, coordinates in
global image space, (x, y) ordered, ring explicitly closed.  Semantics from
the reference (``/root/reference/relabel/chunkops.py:192-231`` and
``utils.py:146-188``): labels visited in ascending id order, object class =
max of the classes plane over the object mask, contours with fewer than two
points dropped, empty tiles yield ``None`` (the reference's scalar ``0``).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from .contours import trace_outer_contour

try:  # optional, as the reference (utils.py:25-61): real geojson objects
    import geojson as _geojson
except ImportError:  # plain dicts — identical post-JSON serialization
    _geojson = None


def _feature(ring, object_type):
    if _geojson is not None:
        feat = _geojson.Feature(
            geometry=_geojson.Polygon([ring]))
        feat["properties"] = {"objectType": object_type}
        return feat
    return {
        "geometry": {"coordinates": [ring], "type": "Polygon"},
        "properties": {"objectType": object_type},
        "type": "Feature",
    }


def _feature_collection(features):
    if _geojson is not None:
        return _geojson.FeatureCollection(features)
    return {"features": features, "type": "FeatureCollection"}


def labels_to_annotations(labels: np.ndarray, object_classes: Dict[int, str],
                          classes: Optional[np.ndarray] = None,
                          offset: Optional[np.ndarray] = None
                          ) -> Optional[dict]:
    """Build a FeatureCollection dict for one 2D label tile (or None)."""
    features = []
    for curr_l in np.unique(labels):
        if curr_l == 0:
            continue
        mask = labels == curr_l
        if classes is not None:
            curr_class = int(np.max(classes * mask[None, ...]))
        else:
            curr_class = 0
        object_type = object_classes[curr_class]

        cc = trace_outer_contour(mask)
        if len(cc) < 2:
            continue
        if offset is not None:
            cc = cc + np.asarray(offset, dtype=np.int64)[None, :]
        ring = np.vstack((cc, cc[0, None, :])).tolist()
        features.append(_feature(ring, object_type))
    if not features:
        return None
    return _feature_collection(features)


def annotation_offset(chunk_loc: Sequence[int], tile_origin: Sequence[int],
                      overlaps: Sequence[int]) -> np.ndarray:
    """Global (x, y) offset for a tile's local contour coordinates.

    ``tile_origin`` is the tile's start in the *overlapped* array's
    coordinates; subtracting ``2 * chunk_loc * overlap`` per axis converts
    back to original-image coordinates, and the result is swapped to (x, y)
    (reference ``chunkops.py:210-220``).
    """
    off = np.array([o - 2 * c * ov for c, o, ov
                    in zip(chunk_loc, tile_origin, overlaps)],
                   dtype=np.int64)
    return off[::-1]  # (y, x) -> (x, y)
