"""Chunk-grid combinatorics: neighbor regions and slice arithmetic.

A labeled image is split into a regular grid of chunks; each chunk carries a
halo ("overlap") of `ov` pixels on every side that has a neighbor.  Border
deduplication reasons about the *regions* a chunk shares with its neighbors:
faces (1 constrained axis), edges (2), vertices (3 in 3D).  A region is
encoded as a list over axes of ``None`` (axis spans the whole chunk), ``0``
(low side of that axis) or ``1`` (high side).

Semantics re-derived from the reference implementation
(``/root/reference/relabel/utils.py:64-143``); the enumeration ORDER of
:func:`overlap_regions` is part of the contract — regions are produced in
decreasing dimensionality, and within one dimensionality in the reference's
(combination, little-endian counter) order, because the dedup kernel resolves
ties by first-writer-wins at equal region dimensionality.
"""
from __future__ import annotations

from itertools import combinations, product
from typing import List, Optional, Sequence, Tuple

Region = Tuple[Optional[int], ...]


def overlap_regions(chunk_loc: Sequence[int], grid: Sequence[int],
                    nd: int) -> List[Region]:
    """All face/edge/vertex regions this chunk shares with existing neighbors.

    Mirrors ``utils.get_valid_overlaps`` (reference ``utils.py:64-88``),
    including iteration order: the reference loops ``axis`` = number of
    unconstrained axes ascending (i.e. region dimensionality DEscending),
    combinations of unconstrained axis positions in lexicographic order, and a
    little-endian bit counter over the constrained axes.  ``product`` with the
    tuple reversed reproduces the little-endian counter.
    """
    regions: List[Region] = []
    for n_free in range(nd):
        for free_pos in combinations(range(nd), n_free):
            n_bound = nd - n_free
            for bits in product((0, 1), repeat=n_bound):
                levels = list(reversed(bits))  # little-endian counter order
                for p in free_pos:
                    levels[p:p] = [None]
                ok = True
                for ax, lvl in enumerate(levels):
                    if lvl is None:
                        continue
                    if lvl == 1:
                        ok = chunk_loc[ax] < grid[ax] - 1
                    else:
                        ok = chunk_loc[ax] > 0
                    if not ok:
                        break
                if ok:
                    regions.append(tuple(levels))
    return regions


def merging_regions(chunk_loc: Sequence[int], grid: Sequence[int],
                    nd: int) -> List[Region]:
    """Regions this chunk must PULL from a neighbor during merge.

    Checkerboard ownership: a chunk whose grid coordinate is odd on some
    constrained axis dropped its border objects during dedup, and pastes them
    back from the (even) neighbor that kept them.  Mirrors
    ``utils.get_merging_overlaps`` (reference ``utils.py:91-112``).
    """
    return [r for r in overlap_regions(chunk_loc, grid, nd)
            if any(chunk_loc[ax] % 2 != 0
                   for ax, lvl in enumerate(r) if lvl is not None)]


def region_dim(region: Region) -> int:
    """Number of constrained axes (1 = face, 2 = edge, 3 = vertex)."""
    return sum(1 for lvl in region if lvl is not None)


def core_slice(coord: int, axis_chunks: int, ov: int) -> slice:
    """Slice of this axis that strips the halo (halo exists on inner sides
    only).  Reference ``chunkops.py:27-32``.

    The ``-ov or None`` guard diverges from the reference's literal
    arithmetic ONLY for ``ov == 0`` on a multi-chunk axis, where the
    reference computes ``slice(0, -0)`` and silently empties the tile —
    a regime outside its operating envelope (its notebooks use ov=0 only
    on single-chunk axes).  Here a zero-overlap axis means "no halo":
    the core is the whole axis."""
    return slice(ov if coord > 0 else 0,
                 (-ov or None) if coord < axis_chunks - 1 else None)


def source_slice(coord: int, axis_chunks: int, ov: int,
                 level: Optional[int]) -> slice:
    """Per-axis source selection for a region, in the *current view* of the
    tile (halo-bearing).  Reference ``utils.get_source_selection``
    (``utils.py:131-143``)."""
    if level is None:
        return slice(ov if coord > 0 else None,
                     -ov if coord < axis_chunks - 1 else None)
    if level:
        return slice(-ov if coord < axis_chunks - 1 else None, None)
    return slice(0, ov if coord > 0 else None)


def dest_slice(coord: int, axis_chunks: int, ov: int,
               level: Optional[int]) -> slice:
    """Per-axis destination selection for pasting a merged region into the
    halo-stripped tile.  Reference ``utils.get_dest_selection``
    (``utils.py:115-128``)."""
    if level is None:
        return slice(None)
    if level:
        return slice(-ov * (2 if coord < axis_chunks - 1 else 1),
                     -ov if coord < axis_chunks - 1 else None)
    return slice(ov if coord > 0 else 0, ov * (2 if coord > 0 else 1))


def chunk_label_offset(chunk_loc: Sequence[int], grid: Sequence[int]) -> int:
    """Deterministic, coordination-free global-id offset for one chunk.

    Every chunk adds ``ravel_index(loc, grid) * (2**31 // n_chunks + 2**31)``
    to its surviving labels, guaranteeing disjoint id ranges across chunks
    without any shuffle or driver round-trip.  The exact constant is part of
    golden parity (reference ``chunkops.py:91-99``; e.g. chunk (0,1) of the
    4x3 fixture maps labels {2,5} -> {2326440620, 2326440623}).
    """
    ravel = 0
    for c, g in zip(chunk_loc, grid):
        ravel = ravel * g + c
    n_chunks = 1
    for g in grid:
        n_chunks *= g
    return ravel * (2 ** 31 // n_chunks + 2 ** 31)


def halo_widths(chunk_loc: Sequence[int], grid: Sequence[int],
                overlaps: Sequence[int]) -> List[Tuple[int, int]]:
    """(low, high) halo width per axis — 0 on outer borders."""
    return [(ov if c > 0 else 0, ov if c < g - 1 else 0)
            for c, g, ov in zip(chunk_loc, grid, overlaps)]
