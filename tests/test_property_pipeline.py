"""Property tests: the chunked pipeline must agree with a single-machine
connected-component labeling up to a label bijection (the well-known-
algorithm oracle pattern of reference tests/fixtures.py:12-17), for masks
whose objects fit inside a chunk+halo view."""
import numpy as np
import pytest

from dask_relabeling_spark import from_array, image2labels, to_array
from dask_relabeling_spark.kernels.ccl import label
from dask_relabeling_spark.operators.relabel_ops import (
    segment_overlapped_input)


def random_dot_mask(shape, n_objects, max_size, seed):
    """Sparse random rectangles, quantized to disjoint cells so no two can
    merge into a component larger than the halo — the pipeline's documented
    precondition (objects must fit within ``overlaps``; an object larger
    than the halo can straddle a border beyond any neighbor's view)."""
    rng = np.random.RandomState(seed)
    mask = np.zeros(shape, dtype=np.uint8)
    cell = max_size + 2  # +2: one-pixel moat keeps objects 4-disconnected
    cells = [s // cell for s in shape]
    for _ in range(n_objects):
        cpos = [rng.randint(0, c) for c in cells]
        size = [rng.randint(1, max_size + 1) for _ in shape]
        sel = tuple(slice(cp * cell, cp * cell + sz)
                    for cp, sz in zip(cpos, size))
        mask[sel] = 1
    return mask


def assert_equiv_labeling(got: np.ndarray, exp: np.ndarray):
    """Same zero set and a consistent bijection between label ids."""
    assert np.array_equal(got != 0, exp != 0), "foreground sets differ"
    fwd = {}
    bwd = {}
    for g, e in zip(got.ravel(), exp.ravel()):
        if e == 0:
            continue
        assert fwd.setdefault(e, g) == g, f"oracle label {e} split"
        assert bwd.setdefault(g, e) == e, f"pipeline label {g} merged"


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_2d_pipeline_equiv_global_ccl(spark, seed):
    mask = random_dot_mask((61, 53), n_objects=40, max_size=5, seed=seed)
    ts = from_array(spark, mask, chunk_shape=(16, 16))
    out = image2labels(ts, overlaps=8, threshold=0.05)
    got = to_array(out)
    exp = label(mask)
    assert_equiv_labeling(got, exp)


@pytest.mark.parametrize("seed", [11, 12])
def test_3d_pipeline_equiv_global_ccl(spark, seed):
    mask = random_dot_mask((18, 22, 19), n_objects=25, max_size=3, seed=seed)
    ts = from_array(spark, mask, chunk_shape=(8, 8, 8))
    out = image2labels(ts, overlaps=4, threshold=0.05)
    got = to_array(out)
    exp = label(mask)
    assert_equiv_labeling(got, exp)


def test_segment_with_aligned_kwargs(spark):
    """Aligned-TileSet kwargs reach the segmentation fn chunk-wise (the
    reference's dask-array kwargs, relabeling.py:28-36)."""
    rng = np.random.RandomState(7)
    img = (rng.rand(32, 32) < 0.3).astype(np.uint8)
    gate = np.zeros((32, 32), dtype=np.int64)
    gate[:, :16] = 1

    def gated_seg(tile, gate=None, **kw):
        return label(tile * gate).astype(np.int32)

    ts = from_array(spark, img, chunk_shape=(16, 16))
    gate_ts = from_array(spark, gate, chunk_shape=(16, 16))
    seg = segment_overlapped_input(ts, seg_fn=gated_seg,
                                   extra_tiles={"gate": gate_ts})
    got = to_array(seg.with_df(seg.df))
    exp_fg = (img * gate) != 0
    assert np.array_equal(got != 0, exp_fg)
