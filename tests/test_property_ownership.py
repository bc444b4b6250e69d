"""Property test for the `relabel_annotations` ownership oracle's
EXACTNESS ARGUMENT (plans/tile_query.py::_annotations_ownership_sql).

The oracle's SQL rests on four claims that sf0.01/sf0.1 only sample:

1. a tile with >= 1 core pixel of a component sees the WHOLE component
   (so the kernel's per-view label is the component, n_view == n_total);
2. a view-local fragment with no core pixel always drops (prop = 0);
3. the float32 prop thresholds replay as the exact rationals
   20*n_core > 19*n_total (keep) / 20*n_core < n_total (drop);
4. the region claim precedence collapses in 2D to: corner presence ->
   keep iff cy AND cx even; else x-face -> cx even; else y-face ->
   cy even.

This test checks the composed claim directly against the REAL kernels:
random masks (components constrained to the bbox-side <= overlap
contract the flagship mask asserts) run through the actual per-tile
pipeline — expanded view -> CCL -> remove_overlapped_objects — and the
per-tile surviving-label counts must equal the pure-arithmetic replay
of the oracle rule computed from global CCL.  Any mask where the SQL
rule and the kernel disagree is a counterexample to the oracle itself.
"""
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dask_relabeling_spark.grid import halo_widths
from dask_relabeling_spark.kernels.ccl import label as ccl_label
from dask_relabeling_spark.kernels.relabel import remove_overlapped_objects

CHUNK = 8
OV = 3
THRESH = 0.05


def _prune_oversize(mask: np.ndarray) -> np.ndarray:
    """Erase components whose bbox side exceeds OV — the mask contract
    (`test_flagship_mask_contract`) under which the oracle is exact."""
    lab = ccl_label(mask)
    out = mask.copy()
    for lb in range(1, lab.max() + 1):
        ys, xs = np.nonzero(lab == lb)
        if ys.ptp() + 1 > OV or xs.ptp() + 1 > OV:
            out[lab == lb] = 0
    return out


def _kernel_counts(mask: np.ndarray, grid, chunk=CHUNK,
                   ov=OV) -> dict:
    """Per-tile surviving-label counts from the REAL pipeline kernels:
    expanded view -> view CCL -> remove (checkerboard dedup); labels
    with >= 2 pixels survive annotation (the '< 2 contour points'
    rule)."""
    gy, gx = grid
    counts = {}
    for cy in range(gy):
        for cx in range(gx):
            (lo_y, hi_y), (lo_x, hi_x) = halo_widths(
                (cy, cx), grid, (ov, ov))
            view = mask[cy * chunk - lo_y: (cy + 1) * chunk + hi_y,
                        cx * chunk - lo_x: (cx + 1) * chunk + hi_x]
            removed = remove_overlapped_objects(
                ccl_label(view), (ov, ov), THRESH, (cy, cx), grid)
            kept, n = np.unique(removed[removed != 0],
                                return_counts=True)
            counts[(cy, cx)] = int((n >= 2).sum())
    return counts


def _oracle_counts(mask: np.ndarray, grid, chunk=CHUNK,
                   ov=OV) -> dict:
    """The SQL rule, re-expressed in numpy from GLOBAL CCL."""
    gy, gx = grid
    lab = ccl_label(mask)
    counts = {t: 0 for t in np.ndindex(gy, gx)}
    for lb in range(1, lab.max() + 1):
        ys, xs = np.nonzero(lab == lb)
        n_total = len(ys)
        if n_total < 2:
            continue
        for cy in range(gy):
            for cx in range(gx):
                (lo_y, hi_y), (lo_x, hi_x) = halo_widths(
                    (cy, cx), grid, (ov, ov))
                in_view = ((ys >= cy * chunk - lo_y)
                           & (ys < (cy + 1) * chunk + hi_y)
                           & (xs >= cx * chunk - lo_x)
                           & (xs < (cx + 1) * chunk + hi_x))
                y_in = ys // chunk == cy
                x_in = xs // chunk == cx
                n_core = int((y_in & x_in).sum())
                if not in_view.any() or n_core == 0:
                    continue
                if 20 * n_core > 19 * n_total:
                    keep = True
                elif 20 * n_core < n_total:
                    keep = False
                elif (~y_in & ~x_in).any():        # corner presence
                    keep = cy % 2 == 0 and cx % 2 == 0
                elif (~x_in & y_in).any():         # x-face first
                    keep = cx % 2 == 0
                elif (~y_in & x_in).any():         # then y-face
                    keep = cy % 2 == 0
                else:
                    keep = True
                if keep:
                    counts[(cy, cx)] += 1
    return counts


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_ownership_rule_matches_kernel(data):
    gy = data.draw(st.integers(2, 3), label="grid_y")
    gx = data.draw(st.integers(2, 3), label="grid_x")
    h, w = gy * CHUNK, gx * CHUNK
    density = data.draw(st.floats(0.05, 0.3), label="density")
    seed = data.draw(st.integers(0, 2**32 - 1), label="seed")
    rng = np.random.default_rng(seed)
    mask = (rng.random((h, w)) < density).astype(np.int64)
    mask = _prune_oversize(mask)
    assert _kernel_counts(mask, (gy, gx)) == \
        _oracle_counts(mask, (gy, gx))


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 2**32 - 1), st.floats(0.03, 0.15))
def test_ownership_rule_matches_kernel_3d(seed, density):
    """The 3D collapse the `relabel_components_3d` /
    `relabel_annotations_3d` oracles rely on: with one z chunk and
    zero z overlap the kernel skips every z-constrained region, so
    per-tile survival follows the SAME corner -> x-face -> y-face
    parity rule, scored on voxel counts."""
    d, grid = 4, (1, 2, 2)
    h = w = 2 * CHUNK
    rng = np.random.default_rng(seed)
    vol = (rng.random((d, h, w)) < density).astype(np.int64)
    # prune components violating the (y, x)-bbox <= OV contract
    lab = ccl_label(vol)
    for lb in range(1, lab.max() + 1):
        _, ys, xs = np.nonzero(lab == lb)
        if ys.ptp() + 1 > OV or xs.ptp() + 1 > OV:
            vol[lab == lb] = 0
    # kernel side: per-tile expanded view (full z) -> 3D CCL -> remove
    kernel = {}
    for cy in range(2):
        for cx in range(2):
            hws = halo_widths((0, cy, cx), grid, (0, OV, OV))
            (_, _), (lo_y, hi_y), (lo_x, hi_x) = hws
            view = vol[:, cy * CHUNK - lo_y: (cy + 1) * CHUNK + hi_y,
                       cx * CHUNK - lo_x: (cx + 1) * CHUNK + hi_x]
            removed = remove_overlapped_objects(
                ccl_label(view), (0, OV, OV), THRESH, (0, cy, cx), grid)
            kernel[(cy, cx)] = int(
                len(np.unique(removed[removed != 0])))
    # rule side from global CCL (no size filter: remove drops nothing
    # by size, and 1-voxel comps are keep3 in their containing tile)
    lab = ccl_label(vol)
    rule = {t: 0 for t in kernel}
    for lb in range(1, lab.max() + 1):
        _, ys, xs = np.nonzero(lab == lb)
        n_total = len(ys)
        for cy in range(2):
            for cx in range(2):
                y_in = ys // CHUNK == cy
                x_in = xs // CHUNK == cx
                n_core = int((y_in & x_in).sum())
                if n_core == 0:
                    continue
                if 20 * n_core > 19 * n_total:
                    keep = True
                elif 20 * n_core < n_total:
                    keep = False
                elif (~y_in & ~x_in).any():
                    keep = cy % 2 == 0 and cx % 2 == 0
                elif (~x_in & y_in).any():
                    keep = cx % 2 == 0
                elif (~y_in & x_in).any():
                    keep = cy % 2 == 0
                else:
                    keep = True
                if keep:
                    rule[(cy, cx)] += 1
    assert kernel == rule


@pytest.mark.parametrize("band_objects", [
    # hand-placed band-touchers around the (8|8) internal borders of a
    # 2x2 grid: (pixels) straddling y-border, x-border, and the corner
    [[(7, 3), (8, 3)]],                              # y-straddle
    [[(3, 7), (3, 8)]],                              # x-straddle
    [[(7, 7), (7, 8), (8, 7)]],                      # corner straddle
    [[(6, 6), (7, 7), (6, 7), (7, 6)]],              # corner band, no straddle
    [[(7, 3), (8, 3)], [(3, 7), (3, 8)],
     [(7, 7), (8, 8), (7, 8), (8, 7)]],              # all at once
])
def test_ownership_rule_band_cases(band_objects):
    grid = (2, 2)
    mask = np.zeros((16, 16), dtype=np.int64)
    for obj in band_objects:
        for y, x in obj:
            mask[y, x] = 1
    assert _kernel_counts(mask, grid) == _oracle_counts(mask, grid)


def test_ownership_drop3_branch_large_halo():
    """The sub-threshold drop branch (20*n_core < n_total: a tile that
    holds a core sliver of a big component drops it outright, no
    parity claim can resurrect it) needs components > 20 px — only
    reachable with a larger halo.  CHUNK=24, OV=12: a 24-px bar lying
    along the border with exactly 1 px in the odd tile exercises
    drop3 there; the even tile keeps via keep3 (23/24 > 0.95).  A
    44-px block split 22/22 exercises the pure-parity split at the
    same geometry.  Kernel and rule must agree tile for tile."""
    chunk, ov, grid = 24, 12, (2, 2)
    mask = np.zeros((48, 48), dtype=np.int64)
    # L-shape, 25 px, bbox 7x6 <= ov (the sufficient contract): a 4x6
    # block at y 8..11, x 18..23 (24 px, all in x-tile 0) plus one
    # protruding pixel at (8, 24) in x-tile 1 -> tile 1 holds a 1-px
    # core sliver of a 25-px component: 20*1 < 25 -> drop3 there,
    # while tile 0 keeps via keep3 (20*24 > 19*25).
    mask[8:12, 18:24] = 1
    mask[8, 24] = 1
    # 24-px block split 12/12 across the x border (bbox_x = 12 <= ov):
    # the pure-parity split at the same geometry
    mask[30:32, 18:30] = 1
    k = _kernel_counts(mask, grid, chunk=chunk, ov=ov)
    r = _oracle_counts(mask, grid, chunk=chunk, ov=ov)
    assert k == r
    # and the branch really fired: verify via the rule's own scoring
    lab = ccl_label(mask)
    fired = False
    for lb in range(1, lab.max() + 1):
        ys, xs = np.nonzero(lab == lb)
        n_total = len(ys)
        for cy in range(2):
            for cx in range(2):
                n_core = int(((ys // chunk == cy)
                              & (xs // chunk == cx)).sum())
                if n_core >= 1 and 20 * n_core < n_total:
                    fired = True
    assert fired, "geometry failed to exercise drop3"
