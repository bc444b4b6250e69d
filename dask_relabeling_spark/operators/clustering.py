"""Distributed k-means (Lloyd's algorithm) over an embedding column.

The missing piece between the one-shot centroid update
(``embedding_label_centroids``) and the IVF coarse quantizer
(``similarity.ivf_cells``): an actual *iterative* trainer, expressed
entirely as DataFrame operations with a fixed, unrolled iteration count
so a SQL oracle can replay it CTE-for-CTE.

Scale design (100 TB):

* centroids are tiny (k x dim).  Each iteration packs them into ONE row
  (a single-group ``collect_list`` — an allowlisted 1-row scalar
  aggregate) and broadcast-cross-joins that row onto the corpus, so the
  assignment step is a narrow map: argmin over k distances per vector,
  zero shuffle, no driver round-trip (contrast MLlib's
  ``collectAsMap`` per iteration — same data volume, but this stays
  inside the plan);
* the update step is one partial+final aggregation keyed on
  (cluster, dim): ``posexplode`` spreads every vector's components
  across the cluster, and map-side combine reduces each partition to at
  most k*dim cells before the exchange — a hot cluster cannot pin a
  partition;
* component sums are exact integer nano-units (``floor(v*1e9 + 0.5)``
  per component — every step IEEE-754-exact), and new centroid
  components are quantized to integer milli-units by pure integer
  floor-division, then converted back with ONE IEEE division by
  1000.0 — the same order-independence device as
  ``embedding_label_centroids``, with NO engine-build-dependent
  decimal->double rounding anywhere (the channel behind that query's
  round-2/3 driver red row), making every iteration bit-reproducible
  across shuffle orders AND across engine builds, so the unrolled
  DuckDB oracle matches by hash;
* per-element distance folds run in array-index order on both engines
  (Spark ``aggregate`` left-fold from 0.0 == DuckDB ``list_reduce``
  left-fold), so even the doubles agree bit-for-bit.

Reference parity: the reference repo has no clustering surface; this is
part of the training-data-pipeline extension (SURVEY.md §6).
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import as_vec


def _sq_dist(a: Column, b: Column) -> Column:
    """Squared L2 distance, folded in index order (engine-portable)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                       F.lit(0.0), lambda acc, v: acc + v)


def _pack_centroids(cent: DataFrame) -> DataFrame:
    """(cid, cv) rows -> one row holding array<struct<cid,cv>> sorted by
    cid.  1-row scalar aggregate: the only single-partition stage, and
    it carries k*dim numbers, not data."""
    return cent.agg(F.array_sort(
        F.collect_list(F.struct("cid", "cv"))).alias("cs"))


def assign_clusters(vecs: DataFrame, cent: DataFrame,
                    id_col: str = "vec_id",
                    vec_col: str = "ve") -> DataFrame:
    """Nearest-centroid assignment: broadcast the packed 1-row centroid
    set, argmin over k squared distances per vector (ties -> lowest
    cid).  Narrow map over the corpus — no shuffle."""
    packed = F.broadcast(_pack_centroids(cent))
    dists = F.transform(
        F.col("cs"),
        lambda c: F.struct(_sq_dist(F.col(vec_col), c["cv"]).alias("d"),
                           c["cid"].alias("cid")))
    return (vecs.crossJoin(packed)
            .select(id_col, vec_col,
                    F.array_min(dists)["cid"].alias("cluster")))


def update_centroids(assigned: DataFrame,
                     vec_col: str = "ve") -> DataFrame:
    """Mean per (cluster, dim), quantized to milli-units through pure
    integer arithmetic; re-packs arrays in dim order.

    Each component becomes exact nano-units via ``floor(v*1e9 + 0.5)``
    (IEEE-exact on any engine), sums are plain BIGINT, and the
    milli-unit mean is round-half-up(1000*s/n) as an exact integer
    floor-division: ``num - pmod(num, den)`` is divisible by ``den``,
    so the ``div`` below is exact and truncation direction is
    irrelevant.  The only float op is the final single IEEE division by
    1000.0 — bit-identical across engine builds."""
    nano = F.floor(F.col("v") * F.lit(1000000000.0) + F.lit(0.5)) \
            .cast("long")
    comp = (assigned
            .select("cluster", F.posexplode(vec_col).alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(F.sum(nano).alias("s_nano"), F.count("*").alias("n"))
            .withColumn("num", F.expr("2L * s_nano + n * 1000000L"))
            .withColumn("den", F.expr("2L * n * 1000000L"))
            .select("cluster", "pos",
                    (F.expr("(num - pmod(num, den)) div den")
                     .cast("double") / F.lit(1000.0)).alias("val")))
    return (comp.groupBy(F.col("cluster").alias("cid"))
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "val"))),
                lambda s: s["val"]).alias("cv")))


def kmeans_assignments(df: DataFrame, k: int = 8, n_iter: int = 2,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """Fixed-iteration Lloyd's k-means; returns (id, cluster) after
    ``n_iter`` assignment/update rounds.  Deterministic: centroids are
    initialized from the k lowest-id vectors — selected by an actual
    sort + limit (distributed TakeOrdered, k is small), NOT a
    ``id < k`` value filter, so sparse or offset id spaces still yield
    exactly min(k, n) centroids.  Every update is order-independent."""
    vecs = df.select(F.col(id_col),
                     as_vec(vec_col).alias("ve"))
    cent = (vecs.orderBy(id_col).limit(k)
            .select(F.col(id_col).cast("long").alias("cid"),
                    F.col("ve").alias("cv")))
    assigned = assign_clusters(vecs, cent, id_col=id_col)
    for _ in range(n_iter - 1):
        cent = update_centroids(assigned)
        assigned = assign_clusters(vecs, cent, id_col=id_col)
    return assigned.select(id_col, "cluster")


def semantic_dedup(df: DataFrame, k: int = 8, n_iter: int = 2,
                   threshold_num: int = 9, threshold_den: int = 10,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """SemDeDup (Abbas et al. 2023), end to end: k-means-cluster the
    embeddings, score cosine pairs ONLY within each cluster, connect
    the above-threshold pairs into duplicate groups, and keep each
    group's minimum id.

    This is the composition that makes embedding dedup tractable at
    corpus scale: the all-pairs cosine is confined to clusters (choose
    k so n/k vectors fit a partition — within-cluster all-pairs is the
    SemDeDup algorithm itself, not a shortcut), the pair join is an
    equi-join on the cluster id, and group canonicalization is the
    iterative min-label propagation of ``dedup.connected_components``.
    Output: (id, cluster, keep_id, is_dup) for EVERY vector —
    ``keep_id == id`` for canonical/unique rows.
    """
    from .dedup import connected_components
    from .similarity import _dot, _norm  # noqa: PLC0415

    assign = kmeans_assignments(df, k=k, n_iter=n_iter,
                                id_col=id_col, vec_col=vec_col)
    # two-step projection: one as_vec evaluation per row, not two —
    # no CSE across HOF lambdas (see similarity.cosine_neardup_pairs)
    vecs = (df.select(F.col(id_col), as_vec(vec_col).alias("v"))
            .select(id_col, "v", _norm(F.col("v")).alias("nrm"))
            .join(assign, id_col))
    a, b = vecs.alias("a"), vecs.alias("b")
    pairs = (a.join(b, (F.col("a.cluster") == F.col("b.cluster")) &
                    (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
             # try_divide: a zero-norm vector (failed embedding job)
             # has no cosine — NULL fails the threshold instead of
             # ANSI-killing the job (see operators/similarity.cosine)
             .withColumn("cos", F.try_divide(
                 _dot(F.col("a.v"), F.col("b.v")),
                 F.col("a.nrm") * F.col("b.nrm")))
             .filter(F.col("cos") * threshold_den >= threshold_num)
             .select(F.col(f"a.{id_col}").alias("id_a"),
                     F.col(f"b.{id_col}").alias("id_b")))
    comp = connected_components(pairs).withColumnRenamed("id", id_col)
    return (assign.join(comp, id_col, "left")
            .select(F.col(id_col), "cluster",
                    F.coalesce("cluster_id", F.col(id_col))
                    .alias("keep_id"))
            .withColumn("is_dup",
                        (F.col("keep_id") != F.col(id_col)).cast("int")))
