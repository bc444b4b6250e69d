"""Skew-resistant formulations of non-algebraic per-key operations.

For algebraic aggregates (sum/count/min/max/avg) Spark already does
map-side partial aggregation, so hot keys are merged before the shuffle
and manual salting adds nothing.  AQE's skew-join splitting (enabled in
``session.get_spark``) covers the join side.  What Spark does NOT
decompose automatically:

* per-key top-k via ``row_number() OVER (PARTITION BY k ORDER BY v)`` —
  every row of a hot key funnels through one reducer and is fully
  sorted, even though only k survive;
* ``collect_list`` on a hot key — one reducer materializes the whole
  list.

``grouped_topk`` is the two-phase fix for the first: a partial top-k per
(key, input-partition) — at most ``k * n_partitions`` rows per key cross
the final shuffle regardless of skew — then the exact top-k of the
partials.  Correct because top-k is idempotent over unions:
topk(A ∪ B) = topk(topk(A) ∪ topk(B)).  Results are bit-identical to the
window formulation when the ordering is total (pass a unique tiebreak
column), so the same SQL oracle validates both.
"""
from __future__ import annotations

from typing import List

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def grouped_topk(df: DataFrame, keys: List[str], order_by: List[Column],
                 k: int) -> DataFrame:
    """Top-k rows per key group under ``order_by`` (list of Column,
    e.g. ``[F.desc("price"), F.asc("id")]``; include a unique column for
    a deterministic result).  Output: input columns + ``rank`` (1-based).

    Phase 1 ranks per (salt, key) where the salt is the input partition
    id — a hot key is spread over every scan partition, so this shuffle
    is balanced by construction; only candidates that could still make
    the global top-k survive.  Phase 2 ranks the survivors per key: at
    most k rows per (key, salt) cross the final shuffle — bounded fan-in
    on hot keys and no full per-key sort of the raw data.
    """
    salted = df.withColumn("_salt", F.spark_partition_id())
    w_local = Window.partitionBy("_salt", *keys).orderBy(*order_by)
    candidates = (salted.withColumn("_lr", F.row_number().over(w_local))
                  .filter(F.col("_lr") <= k)
                  .drop("_lr", "_salt"))
    w_final = Window.partitionBy(*keys).orderBy(*order_by)
    return (candidates.withColumn("rank", F.row_number().over(w_final))
            .filter(F.col("rank") <= k))


def salted_join(left: DataFrame, right: DataFrame, key: str,
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Skew-resistant large x large equi-join: explode the (smaller)
    right side ``n_salts`` ways and spread the left side's hot keys
    across those replicas with a uniform salt — each reducer sees at
    most 1/n_salts of any hot key's rows.

    This is the manual fallback for the case AQE's skew-join splitting
    does not cover (e.g. a shuffle consumed by a later stage that pins
    the partitioning).  Results are identical to ``left.join(right,
    key, how)``; the salt columns never escape.  Supported ``how``:
    inner / left (semantics that need no right-side null expansion
    bookkeeping across replicas).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salt_l = (F.abs(F.hash(F.col(key), F.monotonically_increasing_id()))
              % n_salts)
    lhs = left.withColumn("_salt", salt_l)
    rhs = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    out = lhs.join(rhs, [key, "_salt"], how)
    return out.drop("_salt")
