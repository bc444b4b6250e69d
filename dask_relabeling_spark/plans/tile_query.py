"""The flagship tile-pipeline query: the relabeling engine bound to the
driver test tables.

A deterministic binary mask is derived from ``lineitem`` (one foreground
pixel per (orderkey mod H, partkey mod W)), tiled *distributedly* (rows
shuffle straight to their owning tile — the image never exists in one
piece anywhere), then pushed through the full image2labels pipeline:
halo exchange -> CCL segmentation -> checkerboard border dedup -> merge.
Output: per-tile object/pixel counts — deterministic, but CCL is not
SQL-expressible, so this entry carries no DuckDB oracle (rows-only check;
golden parity for the pipeline itself is covered by tests/ against the
reference fixtures).

The 2D mask is deterministically THINNED (keep a pixel iff its md5 hash
mod 4 == 0, replayed verbatim by the oracle CTE) so the one-hop-merge
contract (max object diameter <= overlap, SURVEY §4.1) holds at every
driver scale: unthinned, sf0.1's ~90 %-full mask percolates into
grid-spanning components and the bench would measure a degenerate
regime.  Measured after thinning: density 0.051 / max component bbox
side 3 px at sf0.01, density 0.224 / max side 9 px at sf0.1 — both
within the 16 px halo (asserted by
tests/test_oracle_parity.py::test_flagship_mask_contract, so a testdata
regeneration that densifies the mask fails at the contract, not as an
opaque hash mismatch).
"""
from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.halo import (PIECE_SCHEMA, apply_by_tile_key,
                              emit_piece_records)
from ..operators.pipeline import image2labels_from_pieces
from ..sources.tiles import TILE_SCHEMA, TileSet, tile_record
from .relational import register, t

H = W = 512
CHUNK = 128
OVERLAP = 16
GRID = (H // CHUNK, W // CHUNK)
# keep 1-in-MASK_MOD pixels (md5 pixel hash) — see module docstring
MASK_MOD = 4


def _mask_tiles(spark: SparkSession, sf_dir: str, as_pieces: bool = False):
    """Build the tile table with MAP-SIDE PARTIAL AGGREGATION of a bitmap:
    each point becomes (tile, word-index, bit) and Spark's algebraic
    ``bit_or`` collapses them per (tile, 64-px word) in whole-stage
    codegen — map-side combine shrinks the shuffle to <= grid_tiles x
    chunk²/64 rows of a few bytes, and NOT ONE POINT crosses into Python (an
    earlier hand-built mapInPandas partial did the same algebra ~2x
    slower: per-Arrow-batch Python overhead on the 600 k-point stream).
    The only Python is the per-tile byte->ndarray expansion."""
    li = t(spark, sf_dir, "lineitem")
    local = (F.col("y") % CHUNK) * CHUNK + (F.col("x") % CHUNK)
    pixel_hash = F.conv(F.substring(F.md5(F.concat_ws(
        ",", F.col("y"), F.col("x"))), 1, 8), 16, 10).cast("long")
    bitrows = (li.select((F.col("l_orderkey") % H).cast("int").alias("y"),
                         (F.col("l_partkey") % W).cast("int").alias("x"))
               .filter(pixel_hash % MASK_MOD == 0)
               .select((F.col("y") / CHUNK).cast("int").alias("cy"),
                       (F.col("x") / CHUNK).cast("int").alias("cx"),
                       (local / 64).cast("int").alias("word"),
                       (local % 64).cast("int").alias("bit"))
               .groupBy("cy", "cx", "word")
               .agg(F.bit_or(F.expr("shiftleft(1L, bit)")).alias("bits")))
    nwords = CHUNK * CHUNK // 64

    def expand(key, pdf: pd.DataFrame) -> np.ndarray:
        words = np.zeros(nwords, dtype=np.int64)
        real = pdf[pdf["word"] >= 0]
        words[real["word"].to_numpy()] = real["bits"].to_numpy()
        return np.unpackbits(words.astype("<i8").view(np.uint8),
                             bitorder="little") \
            .astype(np.int64).reshape(CHUNK, CHUNK)

    def build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame.from_records(
            [tile_record((int(key[0]), int(key[1])), expand(key, pdf))],
            columns=[f.name for f in TILE_SCHEMA.fields])

    def build_pieces(key, pdf: pd.DataFrame) -> pd.DataFrame:
        # builder-side fusion: emit the halo pieces straight out of the
        # bitmap expansion — the full tile never crosses Arrow pre-shuffle
        loc = (int(key[0]), int(key[1]))
        return pd.DataFrame.from_records(
            emit_piece_records(expand(key, pdf), None, loc, GRID,
                               (OVERLAP, OVERLAP)),
            columns=PIECE_SCHEMA.fieldNames())

    # every tile of the full grid must exist (empty tiles included)
    grid_df = spark.range(GRID[0] * GRID[1]).select(
        (F.col("id") / GRID[1]).cast("int").alias("cy"),
        (F.col("id") % GRID[1]).cast("int").alias("cx"),
        F.lit(-1).cast("int").alias("word"),
        F.lit(0).cast("long").alias("bits"))
    # operator-placed tile exchange (see operators/halo.apply_by_tile_key):
    # the byte-tiny bitmap groups each cost a Python expand+emit pass,
    # so AQE byte-coalescing would serialize them
    src = bitrows.unionByName(grid_df)
    if as_pieces:
        return apply_by_tile_key(src, 2, GRID, build_pieces, PIECE_SCHEMA)
    tiles_df = apply_by_tile_key(src, 2, GRID, build, TILE_SCHEMA)
    return TileSet(df=tiles_df, nd=2, grid=GRID, chunk_shape=(CHUNK, CHUNK),
                   overlaps=(0, 0), image_shape=(H, W))


def _labeled_2d(spark: SparkSession, sf_dir: str) -> TileSet:
    pieces = _mask_tiles(spark, sf_dir, as_pieces=True)
    return image2labels_from_pieces(
        pieces, 2, GRID, (CHUNK, CHUNK), (H, W), spark,
        overlaps=OVERLAP, threshold=0.05)


def _ccl_ctes() -> str:
    """Shared recursive-CTE 4-connected CCL over the hash-thinned mask
    (exact under the diameter <= halo contract asserted by
    ``test_flagship_mask_contract``): ``comp`` maps every foreground
    pixel id to its component's minimum pixel id."""
    return f"""pts AS MATERIALIZED (
  SELECT y, x FROM (
    SELECT DISTINCT CAST(l_orderkey % {H} AS INT) AS y,
                    CAST(l_partkey % {W} AS INT) AS x
    FROM lineitem)
  WHERE CAST('0x' || substr(md5(CAST(y AS VARCHAR) || ',' ||
                                CAST(x AS VARCHAR)), 1, 8) AS BIGINT)
        % {MASK_MOD} = 0),
ids AS MATERIALIZED (SELECT y, x, y * {W} + x AS id FROM pts),
edges AS MATERIALIZED (
  SELECT a.id AS ea, b.id AS eb
  FROM ids a JOIN ids b
    ON (b.y = a.y AND b.x = a.x + 1) OR (b.y = a.y + 1 AND b.x = a.x)),
sym(ea, eb) AS MATERIALIZED (
  SELECT ea, eb FROM edges UNION ALL SELECT eb, ea FROM edges),
walk(pid, lbl) AS (
  SELECT id, id FROM ids
  UNION
  SELECT s.eb, w.lbl FROM walk w JOIN sym s ON s.ea = w.pid),
comp AS (SELECT pid, min(lbl) AS comp_id FROM walk GROUP BY pid)"""


def _components_sql() -> str:
    return ("WITH RECURSIVE " + _ccl_ctes() + f""",
grid AS (SELECT gy.v AS cy, gx.v AS cx
         FROM generate_series(0, {GRID[0] - 1}) gy(v),
              generate_series(0, {GRID[1] - 1}) gx(v)),
per AS (SELECT i.y // {CHUNK} AS cy, i.x // {CHUNK} AS cx,
               count(*) AS n_fg, count(DISTINCT c.comp_id) AS n_obj
        FROM ids i JOIN comp c ON c.pid = i.id GROUP BY 1, 2)
SELECT CAST(grid.cy AS INT) AS cy, CAST(grid.cx AS INT) AS cx,
       CAST(coalesce(per.n_fg, 0) AS INT) AS n_fg_pixels,
       CAST(coalesce(per.n_obj, 0) AS INT) AS n_objects_touching
FROM grid LEFT JOIN per ON per.cy = grid.cy AND per.cx = grid.cx
ORDER BY cy, cx
""")


@register("relabel_components", _components_sql())
def relabel_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 2D flagship terminal, now HASH-checked (round 3; previously
    rows-only): per-tile foreground-pixel and touching-object counts
    are label-id-invariant, so the same recursive-CTE CCL that backs
    ``relabel_components_summary`` re-derives them — group the
    component map by (y div CHUNK, x div CHUNK) and count pixels +
    distinct components per tile (empty tiles via a grid left join).
    Exact under the same diameter <= halo contract."""
    labeled = _labeled_2d(spark, sf_dir)
    out = labeled.df.select(
        "cy", "cx",
        F.size(F.filter("data", lambda v: v != 0)).alias("n_fg_pixels"),
        F.size(F.array_distinct(F.filter("data", lambda v: v != 0)))
        .alias("n_objects_touching"))
    return out.orderBy("cy", "cx")


# Driver-checkable flagship companion: the SAME mask and the SAME full
# pipeline as relabel_components, summarized per CONNECTED COMPONENT in
# label-id-invariant terms (pixel count + bounding box), so a DuckDB
# recursive-CTE min-label-propagation replay of 4-connected CCL is an
# exact oracle.  Valid because the thinned mask's largest component
# bbox side (3 px at sf0.01, 9 px at sf0.1 — asserted by
# test_flagship_mask_contract) stays <= the 16 px halo, so the
# checkerboard pipeline IS exact global CCL at every driver scale
# (one-hop-merge contract, SURVEY §4.1).
@register("relabel_components_summary",
          "WITH RECURSIVE " + _ccl_ctes() + """
SELECT CAST(count(*) AS BIGINT) AS n_pixels,
       min(i.y) AS min_y, min(i.x) AS min_x,
       max(i.y) AS max_y, max(i.x) AS max_x
FROM comp JOIN ids i ON i.id = comp.pid
GROUP BY comp.comp_id
ORDER BY min_y, min_x, max_y, max_x, n_pixels
""")
def relabel_components_summary(spark: SparkSession, sf_dir: str
                               ) -> DataFrame:
    labeled = _labeled_2d(spark, sf_dir)
    px = (labeled.df
          .select("cy", "cx", "w", F.posexplode("data").alias("i", "lbl"))
          .filter(F.col("lbl") != 0)
          .select(
              (F.col("cy") * CHUNK
               + (F.col("i") / F.col("w")).cast("int")).alias("y"),
              (F.col("cx") * CHUNK + F.col("i") % F.col("w"))
              .cast("int").alias("x"),
              "lbl"))
    return (px.groupBy("lbl")
            .agg(F.count("*").alias("n_pixels"),
                 F.min("y").alias("min_y"), F.min("x").alias("min_x"),
                 F.max("y").alias("max_y"), F.max("x").alias("max_x"))
            .select("n_pixels", "min_y", "min_x", "max_y", "max_x")
            .orderBy("min_y", "min_x", "max_y", "max_x", "n_pixels"))


# 3D flagship matching the reference baseline geometry (BASELINE.md: a
# 60x256x256 uint16 volume, chunks (60,128,128) => 2x2 grid, overlaps
# [0,64,64], end-to-end 17.1 s single-machine) — same volume shape, grid
# and halo here, with the CCL segmenter standing in for Cellpose so the
# number isolates the TILING machinery, not the model.
#
# NB on exactness: at sf0.1 the mask is dense enough (~14 %) that rare
# corner-straddling objects hit the reference algorithm's parity x
# threshold edge case (an object whose share in the only even-parity
# chunk is sub-threshold is dropped by all four chunks — verified
# bit-for-bit against the reference's own remove kernel; see
# tests/test_kernels_golden.py::test_corner_object_sub_threshold_parity_loss).
# The per-tile counts here reproduce the reference's answer, including
# that loss.
D3, H3, W3 = 60, 256, 256
CHUNK3 = (60, 128, 128)
OVERLAP3 = (0, 64, 64)
GRID3 = (1, H3 // CHUNK3[1], W3 // CHUNK3[2])


def _mask_tiles_3d(spark: SparkSession, sf_dir: str,
                   as_pieces: bool = False):
    """Same JVM-side bitmap partial aggregation as the 2D builder, with
    64-bit words: 600 k voxel points collapse to <= volume/64 (= 61 k)
    ``(tile, word)`` rows before the shuffle, and Python only expands
    words -> ndarray once per tile."""
    li = t(spark, sf_dir, "lineitem")
    local = ((F.col("z") * (CHUNK3[1] * CHUNK3[2]))
             + (F.col("y") % CHUNK3[1]) * CHUNK3[2]
             + (F.col("x") % CHUNK3[2]))
    wordrows = (li.select(
        (F.col("l_suppkey") % D3).cast("int").alias("z"),
        (F.col("l_orderkey") % H3).cast("int").alias("y"),
        (F.col("l_partkey") % W3).cast("int").alias("x"))
        .select(F.lit(0).alias("cz"),
                (F.col("y") / CHUNK3[1]).cast("int").alias("cy"),
                (F.col("x") / CHUNK3[2]).cast("int").alias("cx"),
                (local / 64).cast("int").alias("word"),
                (local % 64).cast("int").alias("bit"))
        .groupBy("cz", "cy", "cx", "word")
        .agg(F.bit_or(F.expr("shiftleft(1L, bit)")).alias("bits")))
    nwords = (CHUNK3[0] * CHUNK3[1] * CHUNK3[2]) // 64

    def expand(pdf: pd.DataFrame) -> np.ndarray:
        words = np.zeros(nwords, dtype=np.int64)
        real = pdf[pdf["word"] >= 0]
        words[real["word"].to_numpy()] = real["bits"].to_numpy()
        return np.unpackbits(words.astype("<i8").view(np.uint8),
                             bitorder="little") \
            .astype(np.int64).reshape(CHUNK3)

    def build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        loc = (int(key[0]), int(key[1]), int(key[2]))
        return pd.DataFrame.from_records(
            [tile_record(loc, expand(pdf))],
            columns=[f.name for f in TILE_SCHEMA.fields])

    def build_pieces(key, pdf: pd.DataFrame) -> pd.DataFrame:
        loc = (int(key[0]), int(key[1]), int(key[2]))
        return pd.DataFrame.from_records(
            emit_piece_records(expand(pdf), None, loc, GRID3, OVERLAP3),
            columns=PIECE_SCHEMA.fieldNames())

    grid_df = spark.range(GRID3[1] * GRID3[2]).select(
        F.lit(0).alias("cz"),
        (F.col("id") / GRID3[2]).cast("int").alias("cy"),
        (F.col("id") % GRID3[2]).cast("int").alias("cx"),
        F.lit(-1).cast("int").alias("word"),
        F.lit(0).cast("long").alias("bits"))
    src = wordrows.unionByName(grid_df)
    if as_pieces:
        return apply_by_tile_key(src, 3, GRID3, build_pieces, PIECE_SCHEMA)
    tiles_df = apply_by_tile_key(src, 3, GRID3, build, TILE_SCHEMA)
    return TileSet(df=tiles_df, nd=3, grid=GRID3, chunk_shape=CHUNK3,
                   overlaps=(0, 0, 0), image_shape=(D3, H3, W3))


def _ccl3_ctes() -> str:
    """6-connected 3D CCL closure over the unthinned voxel mask
    (~60 k voxels at the sf0.01 gate)."""
    return f"""pts AS MATERIALIZED (
  SELECT DISTINCT CAST(l_suppkey % {D3} AS INT) AS z,
                  CAST(l_orderkey % {H3} AS INT) AS y,
                  CAST(l_partkey % {W3} AS INT) AS x
  FROM lineitem),
ids AS MATERIALIZED (
  SELECT z, y, x, (z * {H3} + y) * {W3} + x AS id FROM pts),
edges AS MATERIALIZED (
  SELECT a.id AS ea, b.id AS eb
  FROM ids a JOIN ids b
    ON (b.z = a.z + 1 AND b.y = a.y AND b.x = a.x)
    OR (b.z = a.z AND b.y = a.y + 1 AND b.x = a.x)
    OR (b.z = a.z AND b.y = a.y AND b.x = a.x + 1)),
sym(ea, eb) AS MATERIALIZED (
  SELECT ea, eb FROM edges UNION ALL SELECT eb, ea FROM edges),
walk(pid, lbl) AS (
  SELECT id, id FROM ids
  UNION
  SELECT s.eb, w.lbl FROM walk w JOIN sym s ON s.ea = w.pid),
comp AS (SELECT pid, min(lbl) AS comp_id FROM walk GROUP BY pid)"""


def _ownership3_ctes() -> str:
    """Per-(component, tile) ownership scoring for the 3D pipeline —
    the same checkerboard-parity replay as
    ``_annotations_ownership_sql``, valid here because the 3D geometry
    collapses to the 2D rule: the z axis has one chunk and zero
    overlap, so the kernel skips every z-constrained region
    (``kernels/relabel.py`` overlap-0 guard) and the claim order is
    again (y,x)-corners -> x-faces -> y-faces.  The full-visibility
    contract holds with ~6x margin: measured max component bbox side
    is 4 (sf0.01) / 11 (sf0.1) vs the 64 px halo — so a tile with a
    core voxel sees the whole component, halo-only fragments always
    drop, and the float32 thresholds replay as exact rationals.
    Emits ``vox``, ``cstat``, ``grid3``, ``stat3`` and ``kept3``
    (one row per tile that keeps a component, joined to its stats).
    The parity x threshold corner-loss case (an object whose only
    even-parity-tile share is sub-threshold is dropped by ALL tiles —
    ``test_corner_object_sub_threshold_parity_loss``) is reproduced,
    not papered over: such components appear in no tile's kept3."""
    return f""",
vox AS MATERIALIZED (
  SELECT c.comp_id, i.z, i.y, i.x FROM comp c JOIN ids i ON i.id = c.pid),
cstat AS (
  SELECT comp_id, count(*) AS n_total,
         count(DISTINCT y * {W3} + x) AS n_cells,
         CAST(min(z) AS BIGINT) AS zmin, CAST(max(z) AS BIGINT) AS zmax
  FROM vox GROUP BY comp_id),
grid3 AS (SELECT 0 AS cz, gy.v AS cy, gx.v AS cx
          FROM generate_series(0, {GRID3[1] - 1}) gy(v),
               generate_series(0, {GRID3[2] - 1}) gx(v)),
stat3 AS (
  SELECT v.comp_id, g.cy, g.cx,
         count(*) FILTER (WHERE v.y // {CHUNK3[1]} = g.cy
                            AND v.x // {CHUNK3[2]} = g.cx) AS n_core,
         bool_or(v.y // {CHUNK3[1]} <> g.cy
                 AND v.x // {CHUNK3[2]} <> g.cx) AS in_corner,
         bool_or(v.x // {CHUNK3[2]} <> g.cx
                 AND v.y // {CHUNK3[1]} = g.cy) AS in_xface,
         bool_or(v.y // {CHUNK3[1]} <> g.cy
                 AND v.x // {CHUNK3[2]} = g.cx) AS in_yface
  FROM vox v JOIN grid3 g
    ON v.y >= g.cy * {CHUNK3[1]}
              - (CASE WHEN g.cy > 0 THEN {OVERLAP3[1]} ELSE 0 END)
   AND v.y < (g.cy + 1) * {CHUNK3[1]}
             + (CASE WHEN g.cy < {GRID3[1] - 1}
                     THEN {OVERLAP3[1]} ELSE 0 END)
   AND v.x >= g.cx * {CHUNK3[2]}
              - (CASE WHEN g.cx > 0 THEN {OVERLAP3[2]} ELSE 0 END)
   AND v.x < (g.cx + 1) * {CHUNK3[2]}
             + (CASE WHEN g.cx < {GRID3[2] - 1}
                     THEN {OVERLAP3[2]} ELSE 0 END)
  GROUP BY 1, 2, 3),
kept3 AS (
  SELECT s.comp_id, s.cy, s.cx, n.n_cells, n.zmin, n.zmax
  FROM stat3 s JOIN cstat n USING (comp_id)
  WHERE s.n_core >= 1
    AND (20 * s.n_core > 19 * n.n_total
         OR (20 * s.n_core >= n.n_total
             AND CASE WHEN s.in_corner
                        THEN s.cy % 2 = 0 AND s.cx % 2 = 0
                      WHEN s.in_xface THEN s.cx % 2 = 0
                      WHEN s.in_yface THEN s.cy % 2 = 0
                      ELSE true END)))"""


def _components_3d_sql() -> str:
    """Full per-tile replay for the 3D flagship: the merged label
    field equals the union of kept components painted at their true
    voxels (bbox <= halo means every kept component's spill lies
    inside the neighbor paste bands), and a component lost to the
    corner parity x threshold case is zero in every tile — so
    per-tile counts are voxel/component counts of someone-kept
    components, grouped by the voxel's OWN tile."""
    return ("WITH RECURSIVE " + _ccl3_ctes() + _ownership3_ctes() + f""",
keptset AS (SELECT DISTINCT comp_id FROM kept3),
per AS (
  SELECT v.y // {CHUNK3[1]} AS cy, v.x // {CHUNK3[2]} AS cx,
         count(*) AS n_fg, count(DISTINCT v.comp_id) AS n_obj
  FROM vox v JOIN keptset k USING (comp_id)
  GROUP BY 1, 2)
SELECT CAST(g.cz AS INT) AS cz, CAST(g.cy AS INT) AS cy,
       CAST(g.cx AS INT) AS cx,
       CAST(coalesce(per.n_fg, 0) AS INT) AS n_fg_pixels,
       CAST(coalesce(per.n_obj, 0) AS INT) AS n_objects_touching
FROM grid3 g LEFT JOIN per ON per.cy = g.cy AND per.cx = g.cx
ORDER BY cz, cy, cx
""")


@register("relabel_components_3d", _components_3d_sql())
def relabel_components_3d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 3D flagship terminal on the BASELINE.md geometry —
    HASH-checked as of round 5 (previously rows-only): per-tile
    foreground-voxel and touching-object counts of the merged field,
    replayed by the full checkerboard-parity ownership oracle over
    the 6-connected CCL closure (``_ownership3_ctes``)."""
    pieces = _mask_tiles_3d(spark, sf_dir, as_pieces=True)
    labeled = image2labels_from_pieces(
        pieces, 3, GRID3, CHUNK3, (D3, H3, W3), spark,
        overlaps=OVERLAP3, threshold=0.05)
    out = labeled.df.select(
        "cz", "cy", "cx",
        F.size(F.filter("data", lambda v: v != 0)).alias("n_fg_pixels"),
        F.size(F.array_distinct(F.filter("data", lambda v: v != 0)))
        .alias("n_objects_touching"))
    return out.orderBy("cz", "cy", "cx")


def _annotations_ownership_sql() -> str:
    """Full per-tile ownership replay for the 2D annotation terminal —
    the checkerboard-parity dedup (reference ``chunkops.py:59-63``) as
    SQL over the CCL closure, closing the round-4 verdict's last
    rows-only 2D gap.  Why each piece is exact:

    * Any tile with >= 1 pixel of a component in its CORE sees the
      WHOLE component (core pixels sit >= OVERLAP inside the view edge
      and the mask contract bounds bbox sides <= OVERLAP), so the
      kernel's per-view label IS the component and n_view == n_total.
    * A view-local fragment with NO core pixel has prop = 0 < threshold
      -> mark -(nd+1), always dropped: non-owner tiles contribute no
      features, so only core-pixel tiles need scoring.
    * The float32 prop thresholds replay as exact rationals
      (20*n_core vs n_total / 19*n_total): near-threshold ratios k/n
      differ from 0.05/0.95 by >= 1/(20n) >> float32 rounding at these
      magnitudes.
    * Region precedence (``grid.overlap_regions`` order: corners before
      faces, x-faces before y-faces, first-writer-wins via the
      |mark| < region_dim upgrade rule) collapses in 2D to one CASE:
      corner presence -> keep iff cy AND cx even (all four corners
      share the drop condition), else x-face presence -> cx even, else
      y-face presence -> cy even.  Presence rectangles are the view
      halo strips, which exist exactly where the view extends.
    * 1-pixel components are dropped by the annotate stage's
      '< 2 contour points' rule on both sides."""
    return ("WITH RECURSIVE " + _ccl_ctes() + f""",
px AS MATERIALIZED (
  SELECT c.comp_id, i.y, i.x FROM comp c JOIN ids i ON i.id = c.pid),
csize AS (SELECT comp_id, count(*) AS n_total FROM px
          GROUP BY comp_id HAVING count(*) >= 2),
grid AS (SELECT gy.v AS cy, gx.v AS cx
         FROM generate_series(0, {GRID[0] - 1}) gy(v),
              generate_series(0, {GRID[1] - 1}) gx(v)),
stat AS (
  SELECT p.comp_id, g.cy, g.cx,
         count(*) FILTER (WHERE p.y // {CHUNK} = g.cy
                            AND p.x // {CHUNK} = g.cx) AS n_core,
         bool_or(p.y // {CHUNK} <> g.cy AND p.x // {CHUNK} <> g.cx)
           AS in_corner,
         bool_or(p.x // {CHUNK} <> g.cx AND p.y // {CHUNK} = g.cy)
           AS in_xface,
         bool_or(p.y // {CHUNK} <> g.cy AND p.x // {CHUNK} = g.cx)
           AS in_yface
  FROM px p JOIN grid g
    ON p.y >= g.cy * {CHUNK}
              - (CASE WHEN g.cy > 0 THEN {OVERLAP} ELSE 0 END)
   AND p.y < (g.cy + 1) * {CHUNK}
             + (CASE WHEN g.cy < {GRID[0] - 1} THEN {OVERLAP} ELSE 0 END)
   AND p.x >= g.cx * {CHUNK}
              - (CASE WHEN g.cx > 0 THEN {OVERLAP} ELSE 0 END)
   AND p.x < (g.cx + 1) * {CHUNK}
             + (CASE WHEN g.cx < {GRID[1] - 1} THEN {OVERLAP} ELSE 0 END)
  GROUP BY 1, 2, 3),
kept AS (
  SELECT s.cy, s.cx
  FROM stat s JOIN csize n USING (comp_id)
  WHERE s.n_core >= 1
    AND (20 * s.n_core > 19 * n.n_total
         OR (20 * s.n_core >= n.n_total
             AND CASE WHEN s.in_corner
                        THEN s.cy % 2 = 0 AND s.cx % 2 = 0
                      WHEN s.in_xface THEN s.cx % 2 = 0
                      WHEN s.in_yface THEN s.cy % 2 = 0
                      ELSE true END))),
cnt AS (SELECT cy, cx, count(*) AS n FROM kept GROUP BY cy, cx)
SELECT CAST(g.cy AS INT) AS cy, CAST(g.cx AS INT) AS cx,
       CAST(coalesce(cnt.n, 0) AS INT) AS n_features
FROM grid g LEFT JOIN cnt ON cnt.cy = g.cy AND cnt.cx = g.cx
ORDER BY cy, cx
""")


@register("relabel_annotations", _annotations_ownership_sql())
def relabel_annotations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship variant ending in the reference's OTHER terminal:
    ``image2geojson`` (pad -> overlap -> segment -> dedup -> annotate,
    reference ``relabeling.py:279-309``) — 2 fused Python passes /
    1 shuffle, emitting one GeoJSON FeatureCollection per tile.  Output:
    per-tile feature counts.  HASH-checked as of round 5 (previously
    rows-only): the oracle replays the full checkerboard-parity
    ownership, band-touchers included — see
    ``_annotations_ownership_sql`` for the exactness argument."""
    from ..operators.annotate_ops import ANNOTATION_SCHEMA
    from ..operators.halo import exchange_records_from_pieces
    from ..operators.pipeline import _geojson_finish
    from ..kernels.ccl import segment_fn
    pieces = _mask_tiles(spark, sf_dir, as_pieces=True)
    finish = _geojson_finish(GRID, (CHUNK, CHUNK), (OVERLAP, OVERLAP),
                             None, 0.05, seg=segment_fn)
    ann = exchange_records_from_pieces(pieces, 2, GRID, finish,
                                       ANNOTATION_SCHEMA)
    return (ann.select(
        "cy", "cx",
        F.coalesce(F.json_array_length(
            F.get_json_object("annotation", "$.features")),
            F.lit(0)).alias("n_features"))
        .orderBy("cy", "cx"))


def _annotations_3d_sql() -> str:
    return ("WITH RECURSIVE " + _ccl3_ctes() + _ownership3_ctes() + """,
agg AS (
  SELECT cy, cx, count(*) AS nf, min(zmin) AS mnz, max(zmax) AS mxz
  FROM kept3 WHERE n_cells >= 2
  GROUP BY cy, cx)
SELECT CAST(g.cz AS INT) AS cz, CAST(g.cy AS INT) AS cy,
       CAST(g.cx AS INT) AS cx,
       CAST(coalesce(agg.nf, 0) AS INT) AS n_features,
       agg.mnz AS min_z, agg.mxz AS max_z
FROM grid3 g LEFT JOIN agg ON agg.cy = g.cy AND agg.cx = g.cx
ORDER BY cz, cy, cx
""")


@register("relabel_annotations_3d", _annotations_3d_sql())
def relabel_annotations_3d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3D flagship ending in the EXTENSION annotation terminal: the
    reference's own 3D annotation path cannot execute (its tests pass
    ``annotations_output=None``, reference tests/fixtures.py:93), so
    this defines the semantics — each 3D object becomes the 2D contour
    of its (y, x) footprint with an inclusive ``zRange`` property
    (kernels/annotate.py::labels_to_annotations_3d).  Same BASELINE.md
    geometry and fused 2-pass/1-shuffle plan as ``relabel_annotations``.
    Output: per-tile feature counts + the min/max z over the tile's
    annotated objects.  HASH-checked as of round 5 (previously
    rows-only): the oracle replays per-tile ownership via
    ``_ownership3_ctes`` and keeps components whose footprint has
    >= 2 (y, x) cells (the '< 2 contour points' rule)."""
    from ..operators.annotate_ops import ANNOTATION_SCHEMA
    from ..operators.halo import exchange_records_from_pieces
    from ..operators.pipeline import _geojson_finish
    from ..kernels.ccl import segment_fn
    pieces = _mask_tiles_3d(spark, sf_dir, as_pieces=True)
    finish = _geojson_finish(GRID3, CHUNK3, OVERLAP3,
                             None, 0.05, seg=segment_fn)
    ann = exchange_records_from_pieces(pieces, 3, GRID3, finish,
                                       ANNOTATION_SCHEMA)
    feats = F.from_json("annotation", "STRUCT<features: ARRAY<STRUCT<"
                        "properties: STRUCT<zRange: ARRAY<BIGINT>>>>>")
    return (ann.select(
        "cz", "cy", "cx",
        F.coalesce(F.size(feats["features"]), F.lit(0))
        .alias("n_features"),
        F.array_min(F.transform(feats["features"],
                                lambda f: f["properties"]["zRange"][0]))
        .alias("min_z"),
        F.array_max(F.transform(feats["features"],
                                lambda f: f["properties"]["zRange"][1]))
        .alias("max_z"))
        .orderBy("cz", "cy", "cx"))


@register("relabel_annotations_summary",
          "WITH RECURSIVE " + _ccl_ctes() + """
SELECT min(i.x) AS min_x, min(i.y) AS min_y,
       max(i.x) AS max_x, max(i.y) AS max_y
FROM comp JOIN ids i ON i.id = comp.pid
GROUP BY comp.comp_id
HAVING count(*) >= 2
ORDER BY min_x, min_y, max_x, max_y
""")
def relabel_annotations_summary(spark: SparkSession, sf_dir: str
                                ) -> DataFrame:
    """HASH CHECK for the GeoJSON terminal's geometric content: parse
    every tile's FeatureCollection, explode the Polygon features, and
    reduce each ring to its bbox in GLOBAL image coordinates.

    Why this is oracle-checkable when the per-tile view is not: which
    tile OWNS an object is checkerboard-parity bookkeeping no clean SQL
    replay shares, but under the diameter <= halo contract each object
    is annotated exactly once with its FULL outer contour in global
    coordinates, and an outer contour's extremes are the component's
    pixel extremes — so the multiset of ring bboxes equals the bbox set
    of all CCL components with >= 2 pixels (1-pixel contours are
    dropped by the reference's own "< 2 points" rule,
    kernels/annotate.py).  The oracle re-derives exactly that from the
    shared recursive-CTE closure."""
    from ..operators.annotate_ops import (ANNOTATION_SCHEMA,
                                          GEOJSON_SPARK_SCHEMA)
    from ..operators.halo import exchange_records_from_pieces
    from ..operators.pipeline import _geojson_finish
    from ..kernels.ccl import segment_fn
    pieces = _mask_tiles(spark, sf_dir, as_pieces=True)
    finish = _geojson_finish(GRID, (CHUNK, CHUNK), (OVERLAP, OVERLAP),
                             None, 0.05, seg=segment_fn)
    ann = exchange_records_from_pieces(pieces, 2, GRID, finish,
                                       ANNOTATION_SCHEMA)
    ring = F.col("f.geometry.coordinates")[0]
    xs = F.transform(ring, lambda p: p[0])
    ys = F.transform(ring, lambda p: p[1])
    return (ann.filter(F.col("annotation").isNotNull())
            .select(F.explode(
                F.from_json("annotation", GEOJSON_SPARK_SCHEMA)["features"])
                .alias("f"))
            .select(F.array_min(xs).alias("min_x"),
                    F.array_min(ys).alias("min_y"),
                    F.array_max(xs).alias("max_x"),
                    F.array_max(ys).alias("max_y"))
            .orderBy("min_x", "min_y", "max_x", "max_y"))


# y/x overlap bands: [CHUNK - OVERLAP, CHUNK + OVERLAP) around the one
# internal border of the 2x2 grid; objects whose bbox avoids BOTH bands
# are never dedup candidates, so the pipeline is provably exact on them.
_BAND_LO = CHUNK3[1] - OVERLAP3[1]
_BAND_HI = CHUNK3[1] + OVERLAP3[1]


@register("relabel_components_3d_interior",
          "WITH RECURSIVE " + _ccl3_ctes() + f"""
, boxes AS (
  SELECT comp.comp_id, CAST(count(*) AS BIGINT) AS n_voxels,
         min(i.z) AS min_z, min(i.y) AS min_y, min(i.x) AS min_x,
         max(i.z) AS max_z, max(i.y) AS max_y, max(i.x) AS max_x
  FROM comp JOIN ids i ON i.id = comp.pid
  GROUP BY comp.comp_id)
SELECT n_voxels, min_z, min_y, min_x, max_z, max_y, max_x
FROM boxes
WHERE (max_y < {_BAND_LO} OR min_y >= {_BAND_HI})
  AND (max_x < {_BAND_LO} OR min_x >= {_BAND_HI})
ORDER BY min_z, min_y, min_x, max_z, max_y, max_x, n_voxels
""")
def relabel_components_3d_interior(spark: SparkSession, sf_dir: str
                                   ) -> DataFrame:
    """HASH CHECK for the 3D flagship, restricted to its provably-exact
    region.  The unthinned 3D mask violates no contract for objects
    whose bbox avoids both overlap bands (y and x in
    [CHUNK-OVERLAP, CHUNK+OVERLAP) around the internal borders): such
    objects are never dedup candidates, so the pipeline reproduces
    exact global 6-connected CCL on them — while the band-touching
    objects (where the reference's own corner-parity drop semantics
    apply, tests/test_kernels_golden.py::
    test_corner_object_sub_threshold_parity_loss) are filtered
    SYMMETRICALLY on both sides: each side computes the bbox filter
    from its own component set, so surviving border objects leave both
    frames and dropped ones were never in either.  Output: bbox +
    voxel count per interior component, label-id-invariant."""
    pieces = _mask_tiles_3d(spark, sf_dir, as_pieces=True)
    labeled = image2labels_from_pieces(
        pieces, 3, GRID3, CHUNK3, (D3, H3, W3), spark,
        overlaps=OVERLAP3, threshold=0.05)
    hw = F.col("h") * F.col("w")
    vox = (labeled.df
           .select("cz", "cy", "cx", "h", "w",
                   F.posexplode("data").alias("i", "lbl"))
           .filter(F.col("lbl") != 0)
           .select(
               (F.col("i") / hw).cast("int").alias("z"),
               (F.col("cy") * CHUNK3[1]
                + ((F.col("i") % hw) / F.col("w")).cast("int"))
               .cast("int").alias("y"),
               (F.col("cx") * CHUNK3[2] + (F.col("i") % hw) % F.col("w"))
               .cast("int").alias("x"),
               "lbl"))
    boxes = (vox.groupBy("lbl")
             .agg(F.count("*").alias("n_voxels"),
                  F.min("z").alias("min_z"), F.min("y").alias("min_y"),
                  F.min("x").alias("min_x"),
                  F.max("z").alias("max_z"), F.max("y").alias("max_y"),
                  F.max("x").alias("max_x")))
    interior = (((F.col("max_y") < _BAND_LO)
                 | (F.col("min_y") >= _BAND_HI)) &
                ((F.col("max_x") < _BAND_LO)
                 | (F.col("min_x") >= _BAND_HI)))
    return (boxes.filter(interior)
            .select("n_voxels", "min_z", "min_y", "min_x",
                    "max_z", "max_y", "max_x")
            .orderBy("min_z", "min_y", "min_x",
                     "max_z", "max_y", "max_x", "n_voxels"))


@register("relabel_annotations_3d_summary",
          "WITH RECURSIVE " + _ccl3_ctes() + f"""
, foot AS (
  SELECT comp.comp_id, i.z, i.y, i.x
  FROM comp JOIN ids i ON i.id = comp.pid),
boxes AS (
  SELECT comp_id,
         count(DISTINCT y * {W3} + x) AS n_cells,
         CAST(min(x) AS BIGINT) AS min_x, CAST(min(y) AS BIGINT) AS min_y,
         CAST(max(x) AS BIGINT) AS max_x, CAST(max(y) AS BIGINT) AS max_y,
         CAST(min(z) AS BIGINT) AS min_z, CAST(max(z) AS BIGINT) AS max_z
  FROM foot GROUP BY comp_id)
SELECT min_x, min_y, max_x, max_y, min_z, max_z
FROM boxes
WHERE n_cells >= 2
  AND (max_y < {_BAND_LO} OR min_y >= {_BAND_HI})
  AND (max_x < {_BAND_LO} OR min_x >= {_BAND_HI})
ORDER BY min_x, min_y, max_x, max_y, min_z, max_z
""")
def relabel_annotations_3d_summary(spark: SparkSession, sf_dir: str
                                   ) -> DataFrame:
    """HASH CHECK for the 3D annotation terminal's geometric content —
    the 3D analog of ``relabel_annotations_summary``, closing round-3's
    last rows-only gap to per-tile ownership bookkeeping.

    Parse every tile's FeatureCollection from the EXTENSION terminal
    (footprint contour + inclusive ``zRange``,
    kernels/annotate.py::labels_to_annotations_3d), reduce each ring to
    its global (x, y) bbox plus the zRange, and keep only INTERIOR
    objects — bbox avoiding both overlap bands.  Under the
    ``relabel_components_3d_interior`` argument those objects get exact
    global 6-connected CCL on both sides (never dedup candidates;
    band-touchers filter out symmetrically), and a footprint outer
    contour's extremes are the footprint's pixel extremes, so the
    multiset of (ring bbox, zRange) rows equals the oracle's interior
    component boxes.  Components whose footprint has a single (y, x)
    cell are dropped on both sides (the reference's own '< 2 contour
    points' rule)."""
    from ..operators.annotate_ops import ANNOTATION_SCHEMA
    from ..operators.halo import exchange_records_from_pieces
    from ..operators.pipeline import _geojson_finish
    from ..kernels.ccl import segment_fn
    pieces = _mask_tiles_3d(spark, sf_dir, as_pieces=True)
    finish = _geojson_finish(GRID3, CHUNK3, OVERLAP3,
                             None, 0.05, seg=segment_fn)
    ann = exchange_records_from_pieces(pieces, 3, GRID3, finish,
                                       ANNOTATION_SCHEMA)
    feats = F.from_json(
        "annotation",
        "STRUCT<features: ARRAY<STRUCT<"
        "geometry: STRUCT<coordinates: ARRAY<ARRAY<ARRAY<BIGINT>>>>, "
        "properties: STRUCT<zRange: ARRAY<BIGINT>>>>>")
    ring = F.col("f.geometry.coordinates")[0]
    xs = F.transform(ring, lambda p: p[0])
    ys = F.transform(ring, lambda p: p[1])
    boxes = (ann.filter(F.col("annotation").isNotNull())
             .select(F.explode(feats["features"]).alias("f"))
             .select(F.array_min(xs).alias("min_x"),
                     F.array_min(ys).alias("min_y"),
                     F.array_max(xs).alias("max_x"),
                     F.array_max(ys).alias("max_y"),
                     F.col("f.properties.zRange")[0].alias("min_z"),
                     F.col("f.properties.zRange")[1].alias("max_z")))
    interior = (((F.col("max_y") < _BAND_LO)
                 | (F.col("min_y") >= _BAND_HI)) &
                ((F.col("max_x") < _BAND_LO)
                 | (F.col("min_x") >= _BAND_HI)))
    return (boxes.filter(interior)
            .orderBy("min_x", "min_y", "max_x", "max_y",
                     "min_z", "max_z"))


_IN_LO = OVERLAP                 # interior margin inside a tile's core
_IN_HI = CHUNK - OVERLAP


@register("relabel_annotations_tile_interior_counts",
          "WITH RECURSIVE " + _ccl_ctes() + f"""
, boxes AS (
  SELECT comp.comp_id,
         min(i.y) AS min_y, min(i.x) AS min_x,
         max(i.y) AS max_y, max(i.x) AS max_x
  FROM comp JOIN ids i ON i.id = comp.pid
  GROUP BY comp.comp_id
  HAVING count(*) >= 2),
own AS (
  SELECT min_y // {CHUNK} AS cy, min_x // {CHUNK} AS cx
  FROM boxes
  WHERE min_y // {CHUNK} = max_y // {CHUNK}
    AND min_x // {CHUNK} = max_x // {CHUNK}
    AND (min_y // {CHUNK} = 0 OR min_y % {CHUNK} >= {_IN_LO})
    AND (min_y // {CHUNK} = {GRID[0] - 1} OR max_y % {CHUNK} < {_IN_HI})
    AND (min_x // {CHUNK} = 0 OR min_x % {CHUNK} >= {_IN_LO})
    AND (min_x // {CHUNK} = {GRID[1] - 1} OR max_x % {CHUNK} < {_IN_HI}))
SELECT CAST(cy AS INT) AS cy, CAST(cx AS INT) AS cx,
       CAST(count(*) AS BIGINT) AS n_interior_features
FROM own GROUP BY cy, cx
ORDER BY cy, cx
""")
def relabel_annotations_tile_interior_counts(spark: SparkSession,
                                             sf_dir: str) -> DataFrame:
    """HASH CHECK for per-tile annotation OWNERSHIP on the interior —
    the piece the round-3 verdict called 'checkerboard bookkeeping no
    SQL replay shares', now checked for every object where ownership is
    determined: an object whose bbox stays >= OVERLAP px away from
    every internal tile border (and does not straddle one) never enters
    any overlap region, so exactly its CONTAINING tile owns and
    annotates it — SQL can compute that owner as (min_y div CHUNK,
    min_x div CHUNK) from the CCL closure.  The Spark side counts
    interior features per EMITTING tile (the pipeline's actual
    ownership decision); a misrouted interior annotation shifts two
    tiles' counts and fails the hash.  Only band-touching objects'
    ownership (the genuinely parity-dependent remainder) stays
    rows-only.  1-pixel components are dropped on both sides (the
    '< 2 contour points' rule)."""
    from ..operators.annotate_ops import (ANNOTATION_SCHEMA,
                                          GEOJSON_SPARK_SCHEMA)
    from ..operators.halo import exchange_records_from_pieces
    from ..operators.pipeline import _geojson_finish
    from ..kernels.ccl import segment_fn
    pieces = _mask_tiles(spark, sf_dir, as_pieces=True)
    finish = _geojson_finish(GRID, (CHUNK, CHUNK), (OVERLAP, OVERLAP),
                             None, 0.05, seg=segment_fn)
    ann = exchange_records_from_pieces(pieces, 2, GRID, finish,
                                       ANNOTATION_SCHEMA)
    ring = F.col("f.geometry.coordinates")[0]
    xs = F.transform(ring, lambda p: p[0])
    ys = F.transform(ring, lambda p: p[1])
    feats = (ann.filter(F.col("annotation").isNotNull())
             .select("cy", "cx",
                     F.explode(F.from_json(
                         "annotation",
                         GEOJSON_SPARK_SCHEMA)["features"]).alias("f"))
             .select("cy", "cx",
                     F.array_min(ys).alias("min_y"),
                     F.array_min(xs).alias("min_x"),
                     F.array_max(ys).alias("max_y"),
                     F.array_max(xs).alias("max_x")))
    c = F.lit(CHUNK)

    def tile(v):
        return F.floor(F.col(v) / c)

    interior = (
        (tile("min_y") == tile("max_y")) &
        (tile("min_x") == tile("max_x")) &
        ((tile("min_y") == 0) | (F.col("min_y") % c >= _IN_LO)) &
        ((tile("min_y") == GRID[0] - 1) | (F.col("max_y") % c < _IN_HI)) &
        ((tile("min_x") == 0) | (F.col("min_x") % c >= _IN_LO)) &
        ((tile("min_x") == GRID[1] - 1) | (F.col("max_x") % c < _IN_HI)))
    return (feats.filter(interior)
            .groupBy("cy", "cx")
            .agg(F.count("*").cast("long").alias("n_interior_features"))
            .orderBy("cy", "cx"))


@register("relabel_annotations_3d_tile_counts",
          "WITH RECURSIVE " + _ccl3_ctes() + f"""
, foot AS (
  SELECT comp.comp_id, i.z, i.y, i.x
  FROM comp JOIN ids i ON i.id = comp.pid),
boxes AS (
  SELECT comp_id,
         count(DISTINCT y * {W3} + x) AS n_cells,
         min(y) AS min_y, min(x) AS min_x,
         max(y) AS max_y, max(x) AS max_x
  FROM foot GROUP BY comp_id),
own AS (
  SELECT min_y // {CHUNK3[1]} AS cy, min_x // {CHUNK3[2]} AS cx
  FROM boxes
  WHERE n_cells >= 2
    AND (max_y < {_BAND_LO} OR min_y >= {_BAND_HI})
    AND (max_x < {_BAND_LO} OR min_x >= {_BAND_HI}))
SELECT 0 AS cz, CAST(cy AS INT) AS cy, CAST(cx AS INT) AS cx,
       CAST(count(*) AS BIGINT) AS n_interior_features
FROM own GROUP BY cy, cx
ORDER BY cy, cx
""")
def relabel_annotations_3d_tile_counts(spark: SparkSession,
                                       sf_dir: str) -> DataFrame:
    """Per-tile OWNERSHIP hash check for the 3D annotation terminal —
    the 3D analog of ``relabel_annotations_tile_interior_counts``: an
    interior object (footprint bbox outside both overlap bands) is
    owned by exactly its containing tile, computable in SQL as
    (min div CHUNK) from the 6-connected closure; the Spark side counts
    interior features per EMITTING tile.  With this, the only unchecked
    content anywhere in the tile surface is band-touching ownership —
    the checkerboard-parity decision itself."""
    from ..operators.annotate_ops import ANNOTATION_SCHEMA
    from ..operators.halo import exchange_records_from_pieces
    from ..operators.pipeline import _geojson_finish
    from ..kernels.ccl import segment_fn
    pieces = _mask_tiles_3d(spark, sf_dir, as_pieces=True)
    finish = _geojson_finish(GRID3, CHUNK3, OVERLAP3,
                             None, 0.05, seg=segment_fn)
    ann = exchange_records_from_pieces(pieces, 3, GRID3, finish,
                                       ANNOTATION_SCHEMA)
    feats_schema = ("STRUCT<features: ARRAY<STRUCT<"
                    "geometry: STRUCT<coordinates: "
                    "ARRAY<ARRAY<ARRAY<BIGINT>>>>>>>")
    ring = F.col("f.geometry.coordinates")[0]
    xs = F.transform(ring, lambda p: p[0])
    ys = F.transform(ring, lambda p: p[1])
    feats = (ann.filter(F.col("annotation").isNotNull())
             .select("cz", "cy", "cx",
                     F.explode(F.from_json("annotation", feats_schema)
                               ["features"]).alias("f"))
             .select("cz", "cy", "cx",
                     F.array_min(ys).alias("min_y"),
                     F.array_min(xs).alias("min_x"),
                     F.array_max(ys).alias("max_y"),
                     F.array_max(xs).alias("max_x")))
    interior = (((F.col("max_y") < _BAND_LO)
                 | (F.col("min_y") >= _BAND_HI)) &
                ((F.col("max_x") < _BAND_LO)
                 | (F.col("min_x") >= _BAND_HI)))
    return (feats.filter(interior)
            .groupBy("cz", "cy", "cx")
            .agg(F.count("*").cast("long").alias("n_interior_features"))
            .orderBy("cy", "cx"))


@register("relabel_sorted_label_stats",
          "WITH RECURSIVE " + _ccl_ctes() + """
SELECT CAST(count(DISTINCT c.comp_id) AS BIGINT) AS n_labels,
       CAST(count(DISTINCT c.comp_id) AS BIGINT) AS max_dense_id,
       CAST(count(*) AS BIGINT) AS n_fg_pixels
FROM ids i JOIN comp c ON c.pid = i.id
""")
def relabel_sorted_label_stats(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Driver hash row for ``sort_label_indices`` (reference ops
    #15/#16, ``relabeling.py:312-346`` / ``chunkops.py:104-113``) on
    its DISTRIBUTED path: run the full 2D pipeline, dense-re-index the
    labels with the no-driver-barrier variant, and check the property
    that defines correctness: after re-indexing, max(label) ==
    count(distinct nonzero labels) == the CCL component count — i.e.
    ids are exactly the dense range 1..L (0 = background), which the
    oracle knows as count(DISTINCT comp_id) from the shared closure.
    A dropped, duplicated, or non-dense id breaks the equality and the
    hash."""
    from ..operators.relabel_ops import sort_label_indices
    ts = _labeled_2d(spark, sf_dir)
    dense = sort_label_indices(ts, distributed=True)
    ex = (dense.df.select(F.explode("data").alias("l"))
          .filter(F.col("l") != 0))
    return ex.agg(
        F.countDistinct("l").cast("long").alias("n_labels"),
        F.max("l").cast("long").alias("max_dense_id"),
        F.count("*").cast("long").alias("n_fg_pixels"))
