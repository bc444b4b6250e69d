"""Golden-parity tests for the pure-NumPy kernels, against the reference's
committed per-stage fixtures (/root/reference/tests/samples/*.npz).

Mirrors the reference's per-stage test strategy
(reference tests/test_relabeling.py:33-304) without Spark in the loop: each
stage kernel is driven tile-by-tile exactly as the Spark operators drive it.
"""
import numpy as np
import pytest

from dask_relabeling_spark.kernels import (
    annotation_offset, assemble_expanded, label, labels_to_annotations,
    margin_pieces, merge_tiles, pad_tile, remove_overlapped_objects,
    sort_indices, tile_origin, trim_halo, zero_classes_where_removed)

SAMPLES = "/root/reference/tests/samples"

CASES = {
    "2d": dict(grid=(4, 3), chunk=(4, 4), overlaps=(2, 2), threshold=0.25),
    "3d": dict(grid=(3, 2, 3), chunk=(5, 5, 5), overlaps=(2, 2, 2),
               threshold=0.125),
}


def load(stage, dim):
    f = np.load(f"{SAMPLES}/{stage}_{dim}.npz", allow_pickle=True)
    grid = CASES[dim]["grid"]
    return {idx: f["-".join(map(str, idx))] for idx in np.ndindex(grid)}


def exchange(tiles, grid, depth):
    """Pure-NumPy halo exchange over a dict of tiles."""
    inbox = {loc: {} for loc in tiles}
    for loc, tile in tiles.items():
        for dest, pos, piece in margin_pieces(tile, loc, grid, depth):
            inbox[dest][pos] = piece
    return {loc: assemble_expanded(tiles[loc], loc, grid, inbox[loc])
            for loc in tiles}


@pytest.fixture(scope="module", params=["2d", "3d"])
def case(request):
    dim = request.param
    p = CASES[dim]
    stages = {s: load(s, dim)
              for s in ["input", "ovp_input", "seg", "rem", "trim", "sort"]}
    if dim == "2d":
        stages["ann"] = load("ann", dim)
    return dim, p, stages


def test_prepare_input_golden(case):
    dim, p, st = case
    padded = {loc: pad_tile(t, p["chunk"]) for loc, t in st["input"].items()}
    got = exchange(padded, p["grid"], p["overlaps"])
    for loc, exp in st["ovp_input"].items():
        assert np.array_equal(got[loc], exp), f"prepare mismatch at {loc}"


def test_segment_golden(case):
    dim, p, st = case
    for loc, tile in st["ovp_input"].items():
        got = label(tile).astype(np.int32)
        assert np.array_equal(got, st["seg"][loc]), f"seg mismatch at {loc}"


def test_remove_golden(case):
    dim, p, st = case
    for loc, tile in st["seg"].items():
        got = remove_overlapped_objects(tile, p["overlaps"], p["threshold"],
                                        loc, p["grid"])
        assert np.array_equal(got, st["rem"][loc]), f"rem mismatch at {loc}"


def test_merge_golden(case):
    dim, p, st = case
    expanded = exchange(st["rem"], p["grid"], p["overlaps"])
    for loc in st["rem"]:
        merged = merge_tiles(expanded[loc], p["overlaps"], loc, p["grid"])
        got = trim_halo(merged, loc, p["grid"], p["overlaps"])
        assert np.array_equal(got, st["trim"][loc]), f"trim mismatch at {loc}"


def test_merge_golden_with_classes(case):
    """Classes-plane variant: classes = (labels != 0), map {1: 'cell'}
    (reference tests/fixtures.py:99-133)."""
    dim, p, st = case
    rem = st["rem"]
    rem_classes = {loc: np.where(t != 0, 1, 0) for loc, t in rem.items()}
    exp_lab = exchange(rem, p["grid"], p["overlaps"])
    exp_cls = exchange(rem_classes, p["grid"], p["overlaps"])
    for loc in rem:
        merged = merge_tiles(exp_lab[loc], p["overlaps"], loc, p["grid"],
                             classes=exp_cls[loc][None, ...])
        got_lab = trim_halo(merged[0], loc, p["grid"], p["overlaps"])
        got_cls = trim_halo(merged[1], loc, p["grid"], p["overlaps"])
        exp = st["trim"][loc]
        assert np.array_equal(got_lab, exp)
        assert np.array_equal(got_cls, np.where(exp != 0, 1, 0))


def test_zero_classes_where_removed(case):
    dim, p, st = case
    for loc, tile in st["rem"].items():
        classes = np.where(st["seg"][loc] != 0, 1, 0)
        got = zero_classes_where_removed(tile, classes)
        assert np.array_equal(got, np.where(tile != 0, 1, 0))


def test_sort_golden(case):
    dim, p, st = case
    all_labels = np.unique(np.concatenate(
        [t.ravel() for t in st["trim"].values()]))
    for loc, tile in st["trim"].items():
        got = sort_indices(tile, all_labels)
        assert np.array_equal(got, st["sort"][loc]), f"sort mismatch at {loc}"


def test_annotate_golden(case):
    dim, p, st = case
    if dim != "2d":
        pytest.skip("annotation goldens are 2D-only")
    for loc, tile in st["rem"].items():
        origin = tile_origin(loc, p["grid"], p["chunk"], p["overlaps"])
        off = annotation_offset(loc, origin, p["overlaps"])
        got = labels_to_annotations(tile, {0: "cell"}, offset=off)
        exp = st["ann"][loc].item()
        exp = None if exp == 0 else exp
        assert got == exp, f"ann mismatch at {loc}: {got} != {exp}"


def test_corner_object_sub_threshold_parity_loss():
    """Reference-parity edge case (verified against the reference's own
    remove_overlapped_objects kernel, bit-for-bit): an object straddling
    a 2x2 chunk corner whose share inside the only even-parity chunk is
    below ``threshold`` is dropped by ALL four chunks — the even chunk
    removes it as sub-threshold, every odd chunk drops it by the
    checkerboard rule, and no chunk remains to be merged from.  Pixel
    conservation can therefore fail for corner objects; the port must
    reproduce exactly this (losing it is parity, keeping it would be a
    divergence)."""
    import numpy as np
    from dask_relabeling_spark.kernels.ccl import label as ccl_label
    from dask_relabeling_spark.kernels.relabel import \
        remove_overlapped_objects

    vox = [[5, 32, 32], [6, 28, 33], [6, 28, 34], [6, 29, 34], [6, 31, 32],
           [6, 31, 33], [6, 32, 32], [6, 33, 31], [6, 33, 32], [7, 29, 33],
           [7, 29, 34], [7, 30, 33], [7, 30, 34], [7, 31, 33], [7, 31, 34]]
    mask = np.zeros((16, 64, 64), dtype=bool)
    for z, y, x in vox:
        mask[z, y, x] = True
    grid, ov = (1, 2, 2), (0, 16, 16)
    for cy in range(2):
        for cx in range(2):
            y0, y1 = max(cy * 32 - 16, 0), min((cy + 1) * 32 + 16, 64)
            x0, x1 = max(cx * 32 - 16, 0), min((cx + 1) * 32 + 16, 64)
            seg = ccl_label(mask[:, y0:y1, x0:x1]).astype(np.int64)
            out = remove_overlapped_objects(seg, ov, 0.05, (0, cy, cx),
                                            grid)
            assert out.max() == 0, (cy, cx)
