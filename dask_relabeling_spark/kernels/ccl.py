"""Connected-component labeling (pure NumPy, no scipy/skimage dependency).

Implements the oracle segmenter the reference test-suite uses
(``skimage.measure.label(img, connectivity=1)``, reference
``tests/fixtures.py:12-17``) so golden parity holds in an environment without
scikit-image: connectivity-1 (4-connected in 2D, 6-connected in 3D), two
pixels belong to one component iff they are axis-adjacent AND hold the same
nonzero value, and components are numbered 1..N in order of first appearance
in raster (C-order) scan — exactly skimage's output convention.

Strategy: run-length CCL, fully vectorized.  Foreground runs are extracted
per scan-line with vectorized NumPy; run ids are painted back into the
volume, cross-line adjacencies become array comparisons of axis-shifted
views, and the resulting run-graph edges are resolved by min-label
propagation with pointer jumping (O(log diameter) vectorized passes, each
O(edges)) — zero Python-level loops over runs or lines, which is what
makes the kernel usable inside an Arrow-batched Spark UDF on large tiles.
"""
from __future__ import annotations

import numpy as np


def _resolve_min_labels(n: int, ea: np.ndarray, eb: np.ndarray) -> np.ndarray:
    """Connected components of the run graph: for each of ``n`` nodes with
    undirected edges (ea, eb), return the minimum node index reachable —
    min-label propagation + pointer jumping, all vectorized."""
    lab = np.arange(n, dtype=np.int64)
    while True:
        prev = lab
        nxt = lab.copy()
        # propagate the neighbor's current label if smaller
        np.minimum.at(nxt, ea, lab[eb])
        np.minimum.at(nxt, eb, lab[ea])
        # pointer jumping: follow labels-of-labels (labels only decrease,
        # so this converges and preserves the min-index invariant)
        nxt = np.minimum(nxt, nxt[nxt])
        nxt = np.minimum(nxt, nxt[nxt])
        if np.array_equal(nxt, prev):
            return nxt
        lab = nxt


def label(img: np.ndarray, connectivity: int = 1) -> np.ndarray:
    """Label connected components of ``img``; returns int32 labels.

    Only ``connectivity=1`` (axis-adjacent) is supported — the only mode the
    reference pipeline exercises.
    """
    if connectivity != 1:
        raise NotImplementedError("only connectivity=1 is supported")
    img = np.asarray(img)
    if img.ndim < 1:
        raise ValueError("scalar input")
    flat = img.reshape(-1, img.shape[-1]) if img.ndim > 1 \
        else img.reshape(1, -1)
    n_lines, width = flat.shape

    # --- vectorized run extraction: maximal constant-value nonzero segments
    fg = flat != 0
    # run boundary where fg toggles or the value changes within fg
    change = np.ones_like(fg, dtype=bool)
    change[:, 1:] = (flat[:, 1:] != flat[:, :-1])
    starts_mask = fg & change
    line_idx, start_col = np.nonzero(starts_mask)
    n_runs = len(line_idx)
    labels_out = np.zeros(flat.shape, dtype=np.int32)
    if n_runs == 0:
        return labels_out.reshape(img.shape)

    # end (exclusive) of each run: next change point or end of line
    ends_mask = np.zeros_like(fg)
    ends_mask[:, :-1] = fg[:, :-1] & (flat[:, 1:] != flat[:, :-1])
    ends_mask[:, -1] = fg[:, -1]
    end_line, end_col = np.nonzero(ends_mask)
    # starts and ends pair up 1:1 in raster order
    run_line = line_idx
    run_s = start_col
    run_e = end_col + 1
    run_v = flat[run_line, run_s]

    # paint RUN INDEX + 1 into the volume (0 = background); cross-line
    # adjacency then falls out of axis-shifted view comparisons
    lengths = run_e - run_s
    flat_pos = run_line.astype(np.int64) * width + run_s
    starts_rep = np.repeat(flat_pos, lengths)
    offsets = np.arange(int(lengths.sum()), dtype=np.int64) - \
        np.repeat(np.cumsum(lengths) - lengths, lengths)
    scatter_idx = starts_rep + offsets

    run_id = np.zeros(flat.size, dtype=np.int64)
    run_id[scatter_idx] = np.repeat(
        np.arange(1, n_runs + 1, dtype=np.int64), lengths)
    run_id = run_id.reshape(img.shape)

    edges = []
    if img.ndim > 1:
        vol = img
        for ax in range(img.ndim - 1):     # last axis handled by runs
            lo = [slice(None)] * img.ndim
            hi = [slice(None)] * img.ndim
            lo[ax], hi[ax] = slice(None, -1), slice(1, None)
            a_id, b_id = run_id[tuple(lo)], run_id[tuple(hi)]
            a_v, b_v = vol[tuple(lo)], vol[tuple(hi)]
            m = (a_id != 0) & (b_id != 0) & (a_v == b_v)
            if m.any():
                edges.append((a_id[m] - 1, b_id[m] - 1))

    if edges:
        ea = np.concatenate([e[0] for e in edges])
        eb = np.concatenate([e[1] for e in edges])
        # dedupe voxel-level contacts down to unique run pairs
        key = ea * np.int64(n_runs) + eb
        uniq = np.unique(key)
        ea, eb = uniq // n_runs, uniq % n_runs
        roots = _resolve_min_labels(n_runs, ea, eb)
    else:
        roots = np.arange(n_runs, dtype=np.int64)

    # number components by first appearance: the component root is the
    # minimum run index => ascending roots == raster order (skimage's
    # numbering convention)
    uniq_roots, comp_of_run = np.unique(roots, return_inverse=True)
    run_label = (comp_of_run + 1).astype(np.int32)

    labels_out.reshape(-1)[scatter_idx] = np.repeat(run_label, lengths)
    return labels_out.reshape(img.shape)


def segment_fn(img: np.ndarray, **kwargs) -> np.ndarray:
    """Default segmentation plug-in: CCL, int32 — the reference oracle."""
    return label(img, connectivity=1).astype(np.int32)
