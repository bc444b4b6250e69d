"""EXACT distributed order statistics without a global sort.

Spark's exact ``percentile`` aggregate pulls every value of a group
into one aggregation buffer — for a global quantile that is a
single-partition funnel holding the whole column.  The scalable exact
form used here is the value-histogram + prefix-rank scheme:

1. ``groupBy(value).count()`` — one partial+final agg; the shuffle
   carries distinct values, and map-side combine collapses repeats;
2. two-phase exclusive prefix sum over the (value, count) table
   (``functions/ids.py::exclusive_prefix_sum`` — range partition,
   per-partition cumsum, broadcast partition totals: no
   single-partition stage), giving each value its global rank range
   ``[below, below + cnt)``;
3. each requested rank k selects the unique value whose range covers
   it — a filter against a broadcast handful of (name, k) rows.

Quantile ranks are specified as RATIONALS (num/den) and resolved as
``k = (num * (n-1)) // den`` in integer arithmetic — the lower
(type-1) order statistic, reproducible on any engine with no float
boundary to disagree on.
"""
from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ids import exclusive_prefix_sum


def exact_quantiles(df: DataFrame, col: str,
                    quantiles: List[Tuple[str, int, int]]) -> DataFrame:
    """Exact type-1 quantiles of ``col``.  ``quantiles`` is a list of
    (name, num, den); each selects the value of rank
    ``(num * (n-1)) // den`` (0-indexed) in the sorted column.
    Output: (q, value), one row per requested quantile.

    NULLs are NOT values: order statistics are over the non-null
    column (the SQL percentile convention), with ``n`` the non-null
    count.  Without the explicit filter the two engines silently pick
    DIFFERENT order statistics the moment the column has one NULL —
    Spark's range partitioner sorts NULL FIRST (rank 0) while DuckDB's
    default ORDER BY puts it LAST, so every downstream threshold
    shifts by the null count on one engine only (found by
    tools/null_parity_sweep.py via events_value_winsorize_counts)."""
    base = df.select(F.col(col).alias("v")).filter(F.col("v").isNotNull())
    counts = base.groupBy("v").agg(F.count("*").alias("cnt"))
    ranked = exclusive_prefix_sum(counts, "v", "cnt", out_col="below")
    # n = sum(cnt) over the histogram, NOT count(*) over base: the
    # histogram subtree is localCheckpoint-pinned inside
    # exclusive_prefix_sum, so this agg reuses those blocks and the
    # fact table is scanned ONCE per query instead of twice (round-10
    # bench drift on lineitem_exact_quantiles).  Empty column: sum is
    # NULL, k is NULL, no rank matches — same empty result as n=0.
    n_row = ranked.agg(F.sum("cnt").alias("n"))
    qdf = df.sparkSession.createDataFrame(
        [(name, num, den) for name, num, den in quantiles],
        "q string, num long, den long")
    # floor of a correctly-rounded double quotient == integer division
    # for any n, den reachable here (see operators/dedup.py note)
    ks = (qdf.crossJoin(F.broadcast(n_row))
          .select("q", F.floor((F.col("num") * (F.col("n") - 1))
                               / F.col("den")).alias("k")))
    return (ranked.crossJoin(F.broadcast(ks))
            .filter((F.col("below") <= F.col("k")) &
                    (F.col("k") < F.col("below") + F.col("cnt")))
            .select("q", F.col("v").alias("value")))


def grouped_exact_quantiles(df: DataFrame, col: str, group_col: str,
                            quantiles: List[Tuple[str, int, int]]
                            ) -> DataFrame:
    """Exact type-1 quantiles PER GROUP, same scheme as
    ``exact_quantiles`` with the grouped two-phase prefix sum: the
    (group, value) histogram is range-partitioned on (group, value), so
    a hot group spans partitions instead of pinning one, and each
    group's rank ranges come from the same broadcast partition-totals
    table.  Group sizes join back as an aggregate (one extra shuffle of
    group cardinality, not data).  Output: (group, q, value)."""
    base = (df.select(F.col(group_col).alias("g"), F.col(col).alias("v"))
            .filter(F.col("v").isNotNull()))  # same non-null
    # convention as exact_quantiles: a group whose values are all NULL
    # gets NO quantile row (it has no order statistics), never an
    # engine-dependent one
    counts = base.groupBy("g", "v").agg(F.count("*").alias("cnt"))
    ranked = exclusive_prefix_sum(counts, "v", "cnt", out_col="below",
                                  group_col="g")
    # group sizes from the checkpointed histogram, not a second pass
    # over base (same single-scan rationale as exact_quantiles)
    sizes = ranked.groupBy("g").agg(F.sum("cnt").alias("n"))
    qdf = df.sparkSession.createDataFrame(
        [(name, num, den) for name, num, den in quantiles],
        "q string, num long, den long")
    ks = (sizes.crossJoin(F.broadcast(qdf))
          .select("g", "q",
                  F.floor((F.col("num") * (F.col("n") - 1))
                          / F.col("den")).alias("k")))
    # null-safe: NULL is a legitimate GROUP (its VALUES are filtered,
    # its key is not) — a name-list equi-join would silently drop the
    # NULL group's quantile rows (same class as the
    # exclusive_prefix_sum join, tools/null_parity_sweep.py)
    ks = ks.select(F.col("g").alias("_kg"), "q", "k")
    return (ranked.join(ks, F.col("g").eqNullSafe(F.col("_kg")))
            .filter((F.col("below") <= F.col("k")) &
                    (F.col("k") < F.col("below") + F.col("cnt")))
            .select(F.col("g").alias(group_col), "q",
                    F.col("v").alias("value")))
