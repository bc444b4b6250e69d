"""Connected-component labeling (pure NumPy, no scipy/skimage dependency).

Implements the oracle segmenter the reference test-suite uses
(``skimage.measure.label(img, connectivity=1)``, reference
``tests/fixtures.py:12-17``) so golden parity holds in an environment without
scikit-image: connectivity-1 (4-connected in 2D, 6-connected in 3D), two
pixels belong to one component iff they are axis-adjacent AND hold the same
nonzero value, and components are numbered 1..N in order of first appearance
in raster (C-order) scan — exactly skimage's output convention.

Strategy: run-length CCL.  Foreground runs are extracted per scan-line with
vectorized NumPy; a union-find over *runs* (orders of magnitude fewer than
pixels) merges runs that overlap column-wise on adjacent lines along every
non-last axis.  This keeps the Python-level loop proportional to the number
of runs, not pixels, which is what makes it usable inside an Arrow-batched
Spark UDF on large tiles.
"""
from __future__ import annotations

import numpy as np


def _find(parent: np.ndarray, i: int) -> int:
    root = i
    while parent[root] != root:
        root = parent[root]
    # path compression
    while parent[i] != root:
        parent[i], i = root, parent[i]
    return root


def _union(parent: np.ndarray, a: int, b: int) -> None:
    ra, rb = _find(parent, a), _find(parent, b)
    if ra != rb:
        # keep the smaller (earlier-in-raster-order) run index as root
        if ra < rb:
            parent[rb] = ra
        else:
            parent[ra] = rb


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

    # index of first run per line (runs are already in raster order)
    line_first = np.searchsorted(run_line, np.arange(n_lines))
    line_count = np.diff(np.append(line_first, n_runs))

    parent = np.arange(n_runs, dtype=np.int64)

    if img.ndim == 1:
        pass  # runs along the only axis; nothing to merge
    else:
        lead_shape = img.shape[:-1]
        # for every leading axis, union runs on lines adjacent along that axis
        line_coords = np.unravel_index(np.arange(n_lines), lead_shape)
        for ax in range(len(lead_shape)):
            if lead_shape[ax] <= 1:
                continue
            coords = line_coords[ax]
            stride = int(np.prod(lead_shape[ax + 1:], dtype=np.int64))
            has_next = coords < lead_shape[ax] - 1
            for a_line in np.nonzero(has_next)[0]:
                b_line = a_line + stride
                ca, na = line_first[a_line], line_count[a_line]
                cb, nb = line_first[b_line], line_count[b_line]
                if na == 0 or nb == 0:
                    continue
                i, j = 0, 0
                while i < na and j < nb:
                    ra, rb = ca + i, cb + j
                    if run_s[ra] < run_e[rb] and run_s[rb] < run_e[ra] \
                            and run_v[ra] == run_v[rb]:
                        _union(parent, ra, rb)
                    # advance the run that ends first
                    if run_e[ra] < run_e[rb]:
                        i += 1
                    else:
                        j += 1

    # resolve roots, then number components by first appearance (root index
    # is already the minimum run index in the component => raster order)
    roots = np.empty(n_runs, dtype=np.int64)
    for i in range(n_runs):
        roots[i] = _find(parent, i)
    uniq_roots, comp_of_run = np.unique(roots, return_inverse=True)
    # uniq_roots is sorted ascending == order of first raster appearance
    run_label = (comp_of_run + 1).astype(np.int32)

    # paint runs back (vectorized per run via repeat-based scatter)
    lengths = run_e - run_s
    flat_pos = run_line.astype(np.int64) * width + run_s
    starts_rep = np.repeat(flat_pos, lengths)
    offsets = np.arange(int(lengths.sum()), dtype=np.int64) - \
        np.repeat(np.cumsum(lengths) - lengths, lengths)
    labels_out.reshape(-1)[starts_rep + offsets] = np.repeat(run_label,
                                                             lengths)
    return labels_out.reshape(img.shape)


def segment_fn(img: np.ndarray, **kwargs) -> np.ndarray:
    """Default segmentation plug-in: CCL, int32 — the reference oracle."""
    return label(img, connectivity=1).astype(np.int32)
