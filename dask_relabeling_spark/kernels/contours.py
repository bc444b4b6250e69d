"""Outer-border tracing compatible with OpenCV's ``findContours``.

The reference extracts per-object polygons with
``cv2.findContours(mode=RETR_TREE, method=CHAIN_APPROX_NONE)`` and keeps the
single longest contour per object (``/root/reference/relabel/utils.py:8-14,
163-168``).  OpenCV is not available here, so this module implements the
same border following (Suzuki-Abe, the algorithm OpenCV uses) for the outer
border of a connected mask: start at the first foreground pixel in raster
order, walk the 8-connected boundary counterclockwise, emit every boundary
pixel as (x, y).  Verified byte-identical against the reference's committed
``ann_2d.npz`` golden (which was produced with OpenCV).
"""
from __future__ import annotations

from typing import List

import numpy as np

# 8-neighborhood in CLOCKWISE order starting west: W NW N NE E SE S SW
_CW = [(0, -1), (-1, -1), (-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1)]
_CCW = list(reversed(_CW))  # W SW S SE E NE N NW
_CW_IDX = {d: i for i, d in enumerate(_CW)}
_CCW_IDX = {d: i for i, d in enumerate(_CCW)}


def trace_outer_contour(mask: np.ndarray) -> np.ndarray:
    """Outer boundary of the single connected component in ``mask``.

    Returns an (n, 2) int64 array of (x, y) pixel coordinates in OpenCV
    order; (1, 2) for an isolated pixel; (0, 2) for an empty mask.
    """
    mask = np.asarray(mask, dtype=bool)
    fg = np.argwhere(mask)
    if len(fg) == 0:
        return np.empty((0, 2), dtype=np.int64)
    si, sj = map(int, fg[0])  # raster-first pixel: left neighbor is bg
    h, w = mask.shape

    def at(i: int, j: int) -> bool:
        return 0 <= i < h and 0 <= j < w and mask[i, j]

    # Suzuki-Abe step 3.1: clockwise from the west neighbor, find the first
    # foreground neighbor of the start pixel.
    first = None
    for k in range(8):
        di, dj = _CW[k]
        if at(si + di, sj + dj):
            first = (si + di, sj + dj)
            break
    if first is None:
        return np.array([[sj, si]], dtype=np.int64)  # isolated pixel

    contour: List[List[int]] = []
    prev = first          # (i2, j2)
    cur = (si, sj)        # (i3, j3)
    guard = 4 * (h * w + 8)
    while guard:
        guard -= 1
        # step 3.3: counterclockwise around cur, starting just after prev
        start_k = _CCW_IDX[(prev[0] - cur[0], prev[1] - cur[1])]
        nxt = None
        for k in range(1, 9):
            di, dj = _CCW[(start_k + k) % 8]
            if at(cur[0] + di, cur[1] + dj):
                nxt = (cur[0] + di, cur[1] + dj)
                break
        contour.append([cur[1], cur[0]])  # emit as (x, y)
        if nxt == (si, sj) and cur == first:
            break
        prev, cur = cur, nxt
    return np.asarray(contour, dtype=np.int64)
