"""Spark halo-exchange operators: pad, overlap (neighbor exchange), trim.

``halo_exchange`` is the Spark expression of ``da.overlap.overlap(...,
boundary=None)`` (reference ``relabeling.py:185-190``) and of the exchange
implicit in ``da.map_overlap`` (``relabeling.py:85-95``): every tile emits
its margin slices keyed by the *destination* chunk, one ``groupBy(tile key)``
co-locates each tile with the up-to-``3^nd - 1`` margins it needs, and an
Arrow-batched ``applyInPandas`` assembles the expanded view with
``np.block``.

Why this shape at 100 TB: the only data that moves twice is the margins
(O(surface-area); for 512^2 tiles with a 16 px halo ~12 % of volume), the
shuffle key is the integer tile key (AQE can coalesce / split skewed
partitions), and the kernel never sees more than one tile plus its margins
at a time, bounding executor memory at ``tile_bytes * 3^nd`` worst case.
"""
from __future__ import annotations

from typing import Iterator, Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..kernels.halo import assemble_expanded, pad_tile
from ..sources.tiles import (TILE_FIELDS, TILE_SCHEMA, TileSet,
                             attributed_error, checked_loc, key_cols,
                             pdf_classes, pdf_tile, tile_record)


def _chunk_loud(loc, fn):
    """Per-chunk loud-failure contract (the tile twin of
    ``operators/multimodal._loud``): run ``fn()`` and re-raise any
    error with the chunk's grid coordinates prepended — the posture the
    reference gets from dask, whose kernels always know their
    ``block_info`` coordinates (``chunkops.py:19-32``).  Errors already
    attributed upstream (``pdf_tile``/``pdf_classes``/``checked_loc``/
    assembly checks) carry the ``_chunk_attributed`` sentinel set by
    ``sources.tiles.attributed_error`` and pass through unchanged —
    matching on the sentinel, not the message text, so an attributed
    error re-raised while assembling a DIFFERENT chunk keeps its own
    coordinates and a kernel error whose message merely starts with
    ``tile (`` still gets attributed (round-14 ADVICE).  The wrapped
    re-raise chains the original via ``from exc``, so exception state a
    ``type(exc)(msg)`` reconstruction drops (e.g. ``OSError.errno``)
    stays reachable on ``__cause__``."""
    try:
        return fn()
    except Exception as exc:  # noqa: BLE001 — context, then re-raise
        if getattr(exc, "_chunk_attributed", False):
            raise
        msg = f"chunk {loc}: {exc}"
        try:
            new = type(exc)(msg)
        except TypeError:
            new = ValueError(msg)
        new._chunk_attributed = True
        raise new from exc

# Exchange-internal rows use BINARY payloads (raw little-endian int64),
# not ARRAY<BIGINT>: pieces are produced and consumed only by NumPy
# kernels, and a single opaque buffer skips the per-element
# UnsafeArrayData <-> Arrow list conversion on both sides of the shuffle
# (measured ~4x faster for a map->shuffle->group round-trip of 17 MB
# tiles).  The public TileSet payload stays ARRAY<BIGINT> so tile tables
# remain queryable with Spark array functions.
_PIECE_SCHEMA = T.StructType([
    T.StructField("cz", T.IntegerType(), True),
    T.StructField("cy", T.IntegerType(), False),
    T.StructField("cx", T.IntegerType(), False),
    T.StructField("pz", T.IntegerType(), True),
    T.StructField("py", T.IntegerType(), False),
    T.StructField("px", T.IntegerType(), False),
    T.StructField("d", T.IntegerType(), True),
    T.StructField("h", T.IntegerType(), False),
    T.StructField("w", T.IntegerType(), False),
    T.StructField("data", T.BinaryType(), False),
    T.StructField("nclasses", T.IntegerType(), True),
    T.StructField("classes", T.BinaryType(), True),
])
PIECE_SCHEMA = _PIECE_SCHEMA  # public: builder-side piece emission


def _piece_shape(row, nd: int) -> tuple:
    return ((int(row["d"]), int(row["h"]), int(row["w"])) if nd == 3
            else (int(row["h"]), int(row["w"])))


def _piece_tile(row, nd: int) -> np.ndarray:
    return np.frombuffer(row["data"], dtype=np.int64) \
        .reshape(_piece_shape(row, nd))


def _piece_classes(row, nd: int):
    if row["classes"] is None or row["nclasses"] is None:
        return None
    n = int(row["nclasses"])
    return np.frombuffer(row["classes"], dtype=np.int64) \
        .reshape((n,) + _piece_shape(row, nd))


def pad_edge_tiles(ts: TileSet) -> TileSet:
    """Zero-pad edge tiles up to the chunk shape (narrow; no shuffle).
    Reference ``relabeling.py:169-183`` pads the whole array to a chunk
    multiple — per-tile that touches only the last tile of each axis."""
    nd, chunk, grid = ts.nd, ts.chunk_shape, ts.grid

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for _, row in pdf.iterrows():
                loc = checked_loc(row, nd, grid)

                def work(row=row, loc=loc):
                    tile = pad_tile(pdf_tile(row, nd), chunk)
                    cls = pdf_classes(row, nd)
                    if cls is not None:
                        cls = np.stack([pad_tile(p, chunk) for p in cls])
                    return tile_record(loc, tile, cls)

                recs.append(_chunk_loud(loc, work))
            yield pd.DataFrame.from_records(
                recs, columns=[f.name for f in TILE_FIELDS])

    padded_shape = tuple(g * c for g, c in zip(ts.grid, chunk))
    return ts.with_df(ts.df.mapInPandas(gen, TILE_SCHEMA))


def _emit_rows(tile, cls, loc, grid, depth) -> list:
    """Piece rows one tile contributes to the exchange: its own body at the
    center position plus one margin slice per existing neighbor."""
    from itertools import product as iproduct
    nd = tile.ndim
    recs = [_piece_rec(loc, (0,) * nd, tile, cls)]
    for d in iproduct((-1, 0, 1), repeat=nd):
        if all(x == 0 for x in d):
            continue
        dest = tuple(l + x for l, x in zip(loc, d))
        if any(not (0 <= c < g) for c, g in zip(dest, grid)):
            continue
        pos = tuple(-x for x in d)
        sel = tuple(
            slice(tile.shape[ax] - depth[ax], None)
            if pos[ax] == -1 else
            (slice(0, depth[ax]) if pos[ax] == 1
             else slice(None))
            for ax in range(nd))
        piece_cls = None if cls is None else cls[(slice(None),) + sel]
        recs.append(_piece_rec(dest, pos, tile[sel], piece_cls))
    return recs


def _assemble_one(loc, pdf: pd.DataFrame, nd: int, grid):
    """Inverse of ``_emit_rows``: (expanded_tile, expanded_classes) from one
    key group of piece rows.

    Exchange-integrity checks (round-14 tile fuzz arm): a tile TABLE
    with a duplicated chunk key delivers two center payloads (or two
    margin pieces at one position) to this group — previously
    last-row-wins, i.e. silently nondeterministic ownership; a table
    MISSING a chunk delivers margins with no center — previously an
    anonymous crash inside ``np.block``.  Both now fail loudly with the
    chunk's coordinates (dask makes these states unrepresentable; a
    Spark table does not)."""
    pieces, cls_pieces, center, center_cls = {}, {}, None, None
    seen_center = False
    for _, row in pdf.iterrows():
        pos = tuple(int(row[c]) for c in
                    ((["pz"] if nd == 3 else []) + ["py", "px"]))
        tile = _piece_tile(row, nd)
        cls = _piece_classes(row, nd)
        if all(p == 0 for p in pos):
            if seen_center:
                raise attributed_error(
                    f"chunk {loc}: duplicate tile — two rows share "
                    f"this tile key (the exchange received two center "
                    f"payloads)")
            center, center_cls, seen_center = tile, cls, True
        else:
            if pos in pieces:
                raise attributed_error(
                    f"chunk {loc}: duplicate margin piece at position "
                    f"{pos} — a neighboring tile key appears more than "
                    f"once in the table")
            pieces[pos] = tile
            cls_pieces[pos] = cls
    if not seen_center:
        raise attributed_error(
            f"chunk {loc}: missing tile — neighbors emitted halo "
            f"margins to this key but the table has no row for it "
            f"(tile tables must be dense over the declared grid)")
    # every in-grid neighbor owes a margin piece: a chunk missing from
    # the table starves its neighbors' assemblies too, and without this
    # check that surfaces as an anonymous KeyError inside np.block
    from itertools import product as iproduct
    axis_vals = [([-1] if loc[ax] > 0 else []) + [0]
                 + ([1] if loc[ax] < grid[ax] - 1 else [])
                 for ax in range(nd)]
    for pos in iproduct(*axis_vals):
        if all(p == 0 for p in pos) or pos in pieces:
            continue
        nb = tuple(l + p for l, p in zip(loc, pos))
        raise attributed_error(
            f"chunk {loc}: missing margin piece from neighbor {nb} "
            f"(tile tables must be dense over the declared grid)")
    expanded = assemble_expanded(center, loc, grid, pieces)
    exp_cls = None
    if center_cls is not None:
        planes = []
        for p in range(center_cls.shape[0]):
            planes.append(assemble_expanded(
                center_cls[p], loc, grid,
                {k: v[p] for k, v in cls_pieces.items()}))
        exp_cls = np.stack(planes)
    return expanded, exp_cls


def halo_exchange(ts: TileSet, overlaps: Sequence[int]) -> TileSet:
    """Grow every tile by ``overlaps`` pixels per inner side with margins
    pulled from its (up to 3^nd - 1) neighbors.  One shuffle."""
    nd, grid = ts.nd, ts.grid
    depth = tuple(int(o) for o in overlaps)

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for _, row in pdf.iterrows():
                loc = checked_loc(row, nd, grid)
                recs.extend(_chunk_loud(loc, lambda: _emit_rows(
                    pdf_tile(row, nd), pdf_classes(row, nd), loc, grid,
                    depth)))
            yield pd.DataFrame.from_records(
                recs, columns=_PIECE_SCHEMA.fieldNames())

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        loc = tuple(int(k) for k in key)
        expanded, exp_cls = _chunk_loud(
            loc, lambda: _assemble_one(loc, pdf, nd, grid))
        return pd.DataFrame.from_records(
            [tile_record(loc, expanded, exp_cls)],
            columns=[f.name for f in TILE_FIELDS])

    contribs = ts.df.mapInPandas(emit, _PIECE_SCHEMA)
    out = contribs.groupBy(*key_cols(nd)).applyInPandas(assemble,
                                                        TILE_SCHEMA)
    return ts.with_df(out, overlaps=depth)


def fused_double_exchange(ts: TileSet, overlaps: Sequence[int],
                          pre_fn, mid_fn, final_fn) -> TileSet:
    """The whole pad->overlap->kernels->overlap->kernels pipeline in THREE
    Python passes and TWO shuffles (dask-style task fusion for the Arrow
    boundary; reference pipeline shape SURVEY §3.1):

        mapInPandas:    pre_fn(tile) -> emit margins           (pass 1)
        groupBy key ->  assemble -> mid_fn -> emit margins     (pass 2)
        groupBy key ->  assemble -> final_fn -> tile           (pass 3)

    Unfused, the same pipeline is ~10 Python/Arrow round-trips of full
    tile payloads; the kernels are identical, only the staging changes —
    golden byte-equality is preserved.  All fns: (tile, cls, loc) ->
    (tile, cls).
    """
    nd, grid = ts.nd, ts.grid
    depth = tuple(int(o) for o in overlaps)

    def emit1(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for _, row in pdf.iterrows():
                loc = checked_loc(row, nd, grid)

                def work(row=row, loc=loc):
                    tile, cls = pre_fn(pdf_tile(row, nd),
                                       pdf_classes(row, nd), loc)
                    return _emit_rows(tile, cls, loc, grid, depth)

                recs.extend(_chunk_loud(loc, work))
            yield pd.DataFrame.from_records(
                recs, columns=_PIECE_SCHEMA.fieldNames())

    p1 = ts.df.mapInPandas(emit1, _PIECE_SCHEMA)
    a2 = double_exchange_pieces(p1, nd, grid, depth, mid_fn, final_fn)
    return ts.with_df(a2, overlaps=(0,) * nd)


def emit_piece_records(tile, cls, loc, grid, depth) -> list:
    """Builder-side fusion hook: a source that materializes tiles inside
    its own Python pass (e.g. a bitmap-word expander) can emit the halo
    PIECES directly — the full tile payload then never crosses the Arrow
    boundary before the first exchange.  Rows conform to
    ``PIECE_SCHEMA``."""
    return _emit_rows(tile, cls, loc, grid, tuple(int(o) for o in depth))


def double_exchange_pieces(pieces_df: DataFrame, nd: int, grid,
                           depth, mid_fn, final_fn) -> DataFrame:
    """Passes 2+3 of ``fused_double_exchange`` for a source that already
    emitted piece records (see ``emit_piece_records``): assemble ->
    mid_fn -> emit margins -> exchange -> assemble -> final_fn -> tile.
    Same kernels, same goldens, one fewer full-payload Arrow generation.
    """
    keys = key_cols(nd)

    def mid(key, pdf: pd.DataFrame) -> pd.DataFrame:
        loc = tuple(int(k) for k in key)

        def work():
            tile, cls = _assemble_one(loc, pdf, nd, grid)
            tile, cls = mid_fn(tile, cls, loc)
            return _emit_rows(tile, cls, loc, grid, depth)

        return pd.DataFrame.from_records(
            _chunk_loud(loc, work), columns=_PIECE_SCHEMA.fieldNames())

    def fin(key, pdf: pd.DataFrame) -> pd.DataFrame:
        loc = tuple(int(k) for k in key)

        def work():
            tile, cls = _assemble_one(loc, pdf, nd, grid)
            tile, cls = final_fn(tile, cls, loc)
            return [tile_record(loc, tile, cls)]

        return pd.DataFrame.from_records(
            _chunk_loud(loc, work), columns=[f.name for f in TILE_FIELDS])

    a1 = pieces_df.groupBy(*keys).applyInPandas(mid, _PIECE_SCHEMA)
    return a1.groupBy(*keys).applyInPandas(fin, TILE_SCHEMA)


def _piece_rec(dest, pos, piece: np.ndarray,
               cls: Optional[np.ndarray]) -> dict:
    nd = piece.ndim
    return {
        "cz": int(dest[0]) if nd == 3 else None,
        "cy": int(dest[-2]), "cx": int(dest[-1]),
        "pz": int(pos[0]) if nd == 3 else None,
        "py": int(pos[-2]), "px": int(pos[-1]),
        "d": int(piece.shape[0]) if nd == 3 else None,
        "h": int(piece.shape[-2]), "w": int(piece.shape[-1]),
        "data": np.ascontiguousarray(piece, dtype=np.int64).tobytes(),
        "nclasses": None if cls is None else int(cls.shape[0]),
        "classes": None if cls is None
        else np.ascontiguousarray(cls, dtype=np.int64).tobytes(),
    }


def fused_exchange_records(ts: TileSet, overlaps: Sequence[int],
                           pre_fn, finish, out_schema) -> DataFrame:
    """One halo exchange with kernels fused on both sides (2 Python
    passes, 1 shuffle): ``pre_fn(tile, cls, loc) -> (tile, cls)`` runs
    before the margin emit; ``finish(expanded, cls, loc) -> list[dict]``
    runs on the assembled view and produces the output rows directly
    (arbitrary ``out_schema`` — e.g. annotation records)."""
    nd, grid = ts.nd, ts.grid
    depth = tuple(int(o) for o in overlaps)
    keys = key_cols(nd)
    cols = out_schema.fieldNames()

    def emit1(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for _, row in pdf.iterrows():
                loc = checked_loc(row, nd, grid)

                def work(row=row, loc=loc):
                    tile, cls = pre_fn(pdf_tile(row, nd),
                                       pdf_classes(row, nd), loc)
                    return _emit_rows(tile, cls, loc, grid, depth)

                recs.extend(_chunk_loud(loc, work))
            yield pd.DataFrame.from_records(
                recs, columns=_PIECE_SCHEMA.fieldNames())

    def fin(key, pdf: pd.DataFrame) -> pd.DataFrame:
        loc = tuple(int(k) for k in key)

        def work():
            tile, cls = _assemble_one(loc, pdf, nd, grid)
            return finish(tile, cls, loc)

        return pd.DataFrame.from_records(_chunk_loud(loc, work),
                                         columns=cols)

    p1 = ts.df.mapInPandas(emit1, _PIECE_SCHEMA)
    return p1.groupBy(*keys).applyInPandas(fin, out_schema)


def exchange_records_from_pieces(pieces_df: DataFrame, nd: int, grid,
                                 finish, out_schema) -> DataFrame:
    """``fused_exchange_records`` for a source that already emitted halo
    pieces (see ``emit_piece_records``): one shuffle, one Python pass —
    assemble the expanded view and run ``finish`` directly."""
    keys = key_cols(nd)
    cols = out_schema.fieldNames()

    def fin(key, pdf: pd.DataFrame) -> pd.DataFrame:
        loc = tuple(int(k) for k in key)

        def work():
            tile, cls = _assemble_one(loc, pdf, nd, grid)
            return finish(tile, cls, loc)

        return pd.DataFrame.from_records(_chunk_loud(loc, work),
                                         columns=cols)

    return pieces_df.groupBy(*keys).applyInPandas(fin, out_schema)


def map_tiles_records(ts: TileSet, finish, out_schema) -> DataFrame:
    """Narrow fused map producing arbitrary records:
    ``finish(tile, cls, loc) -> list[dict]`` per tile, one Python pass,
    no shuffle."""
    nd, grid = ts.nd, ts.grid
    cols = out_schema.fieldNames()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for _, row in pdf.iterrows():
                loc = checked_loc(row, nd, grid)
                recs.extend(_chunk_loud(loc, lambda: finish(
                    pdf_tile(row, nd), pdf_classes(row, nd), loc)))
            yield pd.DataFrame.from_records(recs, columns=cols)

    return ts.df.mapInPandas(gen, out_schema)


def map_tiles(ts: TileSet, fn, with_loc: bool = True) -> TileSet:
    """Narrow per-tile map: ``fn(tile, classes, loc) -> (tile, classes)``.
    No shuffle; stays in one Arrow batch round-trip."""
    nd, grid = ts.nd, ts.grid

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for _, row in pdf.iterrows():
                loc = checked_loc(row, nd, grid)

                def work(row=row, loc=loc):
                    new_tile, new_cls = fn(pdf_tile(row, nd),
                                           pdf_classes(row, nd), loc)
                    return tile_record(loc, new_tile, new_cls)

                recs.append(_chunk_loud(loc, work))
            yield pd.DataFrame.from_records(
                recs, columns=[f.name for f in TILE_FIELDS])

    return ts.with_df(ts.df.mapInPandas(gen, TILE_SCHEMA))


def trim_overlap(ts: TileSet) -> TileSet:
    """Strip every tile's halo (narrow).  Reference ``relabeling.py:97``."""
    nd, grid, ov = ts.nd, ts.grid, ts.overlaps

    def fn(tile, cls, loc):
        # `-o or None`: a zero overlap must not become slice(0, -0) == empty
        sel = tuple(slice(o if c > 0 else 0,
                          (-o or None) if c < g - 1 else None)
                    for c, g, o in zip(loc, grid, ov))
        new_cls = None if cls is None else cls[(slice(None),) + sel]
        return tile[sel], new_cls

    out = map_tiles(ts, fn)
    return out.with_df(out.df, overlaps=(0,) * nd)


def crop_to_image(ts: TileSet) -> TileSet:
    """Drop the pad added to reach a chunk multiple (narrow).  Edge tiles
    shrink back to their pre-pad extent (reference ``relabeling.py:237-240``).
    """
    nd, grid, chunk, img = ts.nd, ts.grid, ts.chunk_shape, ts.image_shape

    def fn(tile, cls, loc):
        sel = tuple(slice(0, min((l + 1) * c, s) - l * c)
                    for l, c, s in zip(loc, chunk, img))
        new_cls = None if cls is None else cls[(slice(None),) + sel]
        return tile[sel], new_cls

    return map_tiles(ts, fn)
