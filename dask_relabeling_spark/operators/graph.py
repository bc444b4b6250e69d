"""Graph analytics on DataFrames: co-occurrence edges and triangle
counting via degree-ordered orientation.

Triangle counting is THE canonical "join explodes unless you orient"
graph op: the naive 3-way edge self-join enumerates every wedge at a
high-degree hub (a degree-d node contributes d² wedge rows).  The
standard fix (node-iterator with degree ordering, cf. Suri & Vassilvitskii
"Counting triangles and the curse of the last reducer", WWW'11) orients
every undirected edge from its lower-(degree, id) endpoint to the
higher one; out-degrees are then bounded by O(sqrt(m)), each triangle
has exactly one orientation-consistent (a->b, b->c, a->c) form, and the
3-way equi-join's per-key fan-out is capped — the "last reducer" hub
problem disappears.  All joins are plain shuffled equi-joins (AQE
splits any residual skew); counts are integers end to end.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cooccurrence_edges(events: DataFrame, max_group: int = 20
                       ) -> DataFrame:
    """Undirected user-user edges: two users are linked when they act
    in the same (event_type, clock hour).  Groups larger than
    ``max_group`` members are dropped BEFORE pairing — the standard
    hub guard: an n-user group emits C(n,2) pairs, so one viral hour
    would otherwise dominate the edge list quadratically.  Output:
    distinct (u, v) with u < v."""
    m = (events.select("event_type",
                       F.date_trunc("hour", "ts").alias("h"),
                       "user_id")
         .distinct())
    grp = (m.groupBy("event_type", "h")
           .agg(F.count("*").alias("n"))
           .filter(F.col("n") <= max_group))
    mg = m.join(grp.select("event_type", "h"), ["event_type", "h"])
    return (mg.alias("a")
            .join(mg.alias("b"),
                  (F.col("a.event_type") == F.col("b.event_type")) &
                  (F.col("a.h") == F.col("b.h")) &
                  (F.col("a.user_id") < F.col("b.user_id")))
            .select(F.col("a.user_id").alias("u"),
                    F.col("b.user_id").alias("v"))
            .distinct())


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-vertex triangle counts over an undirected edge list
    (u < v, distinct).  Degree-ordered orientation, then ONE wedge
    join + ONE closing join; each triangle is found exactly once and
    credited to all three vertices.  Output: (user_id, n_triangles)
    for vertices in at least one triangle."""
    both = (edges.select(F.col("u").alias("x"))
            .unionAll(edges.select(F.col("v").alias("x"))))
    deg = both.groupBy("x").agg(F.count("*").alias("d"))
    with_deg = (edges
                .join(deg.select(F.col("x").alias("u"),
                                 F.col("d").alias("du")), "u")
                .join(deg.select(F.col("x").alias("v"),
                                 F.col("d").alias("dv")), "v"))
    fwd = F.struct("du", "u") < F.struct("dv", "v")
    o = with_deg.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("b"))
    tri = (o.alias("e1")
           .join(o.alias("e2"), F.col("e2.a") == F.col("e1.b"))
           .join(o.alias("e3"),
                 (F.col("e3.a") == F.col("e1.a")) &
                 (F.col("e3.b") == F.col("e2.b")))
           .select(F.col("e1.a").alias("x"), F.col("e1.b").alias("y"),
                   F.col("e2.b").alias("z")))
    return (tri.select(F.explode(F.array("x", "y", "z"))
                       .alias("user_id"))
            .groupBy("user_id")
            .agg(F.count("*").alias("n_triangles")))


def pagerank_scaled(edges: DataFrame, n_iter: int = 3,
                    scale: int = 1_000_000) -> DataFrame:
    """Deterministic integer-scaled PageRank over an undirected edge
    list (u < v, distinct), damping 0.85, ``n_iter`` fixed unrolled
    iterations.  Output: (id, rank_micro) in micro-units of probability.

    All arithmetic is INTEGER — ranks live in micro-units and every
    division is an integer ``div`` (``floor(r/outdeg)``,
    ``85*sum div 100``) — so the result is order-independent across
    shuffles and bit-identical on any engine build (the package's
    determinism discipline; a float PageRank sums doubles in
    shuffle-fetch order).  The truncation loses < outdeg micro-units of
    mass per vertex per iteration — irrelevant for ranking, essential
    for replayability.

    Scale shape: each iteration is ONE shuffled equi-join (edges x
    ranks, both keyed by vertex) feeding a partial+final sum — the same
    per-iteration cost as the min-label-propagation CC operator; the
    degree table and per-iteration join keys never funnel through a
    single partition, and a fixed small ``n_iter`` keeps lineage
    shallow (use localCheckpoint per iteration if raised).  An
    undirected graph has no dangling vertices (every vertex has
    degree >= 1), so no dangling-mass redistribution term is needed.
    """
    from ..session import scoped_persist

    dir_e = scoped_persist(
        edges.select(F.col("u").alias("s"), F.col("v").alias("d"))
        .unionAll(edges.select(F.col("v").alias("s"),
                               F.col("u").alias("d"))))
    deg = scoped_persist(dir_e.groupBy("s")
                         .agg(F.count("*").alias("outdeg")))
    # n must be a driver-side scalar (it parameterizes the literals
    # below); counting the PERSISTED degree table means this extra
    # action costs one cached scan, not a recomputation of the whole
    # edge-building lineage — and each of the n_iter joins below reads
    # dir_e/deg from cache instead of re-deriving them.
    n = deg.count()
    if n == 0:                    # empty graph (e.g. every group
        return deg.select(        # hub-guarded away): empty result,
            F.col("s").alias("id"),              # not a ZeroDivision
            F.lit(0).cast("long").alias("rank_micro"))
    init = scale // n                      # Python floor == SQL // here
    base = (15 * scale) // (100 * n)
    ranks = deg.select(F.col("s").alias("id"),
                       F.lit(init).cast("long").alias("r"))
    for _ in range(n_iter):
        contrib = (dir_e
                   .join(deg, "s")
                   .join(ranks.withColumnRenamed("id", "s"), "s")
                   .select("d", F.expr("r div outdeg").alias("c"))
                   .groupBy(F.col("d").alias("id"))
                   .agg(F.sum("c").alias("insum")))
        ranks = (deg.select(F.col("s").alias("id"))
                 .join(contrib, "id", "left")
                 .select("id",
                         (F.lit(base).cast("long")
                          + F.expr("(85 * coalesce(insum, 0L)) div 100"))
                         .cast("long").alias("r")))
    return ranks.select("id", F.col("r").alias("rank_micro"))
