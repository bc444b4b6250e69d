"""Misra-Gries heavy hitters: a MERGEABLE frequency sketch.

The second member of the mergeable-sketch family next to the HLL
rollup (``tests/test_py_udfs.py``): each partition summarizes its
token stream into at most ``k`` counters, the per-partition summaries
union-merge by plain addition, and the classic Misra-Gries guarantee
survives the merge (Agarwal et al., "Mergeable Summaries", PODS'12):

    est(x) <= true(x) <= est(x) + n/k

for EVERY term, and every term with true count > n/k is present in the
merged summary.  That is exactly the contract a 100 TB "top boilerplate
n-grams" pass needs — fixed memory per partition (k counters), one
tiny shuffle (<= k rows per partition), no second pass.

Per-batch work is vectorized: exact ``value_counts`` per Arrow batch
(C speed) folds into the running counter table, and the MG decrement
step subtracts the (k+1)-th largest count from everyone and drops the
non-positive — equivalent to element-wise MG but amortized per batch.

Like HLL (and unlike everything else in this package) the OUTPUT is
partitioning-dependent (estimates vary within the guarantee band), so
the evidence is the property test asserting the guarantee against
exact counts under several partitionings — no hash oracle by design.
"""
from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SUMMARY_SCHEMA = "term string, est long"


def _mg_fold(counters: dict, batch_counts: pd.Series, k: int) -> dict:
    for term, c in batch_counts.items():
        counters[term] = counters.get(term, 0) + int(c)
    if len(counters) > k:
        # subtract the (k+1)-th largest from all; keep positives.
        # (batched MG: same guarantee, decrements amortized)
        cut = sorted(counters.values(), reverse=True)[k]
        counters = {t: c - cut for t, c in counters.items() if c > cut}
    return counters


def mg_heavy_hitters(df: DataFrame, term_col: str = "term",
                     k: int = 64, with_total: bool = False) -> DataFrame:
    """Candidate heavy hitters of ``term_col`` with their merged
    Misra-Gries estimates.  Output: (term, est) — every term whose true
    count exceeds n/k is guaranteed present; true counts lie in
    [est, est + n/k].

    With ``with_total`` each partition also emits a sentinel
    ``(NULL, partition_row_count)`` row, so the merged frame carries the
    exact stream length n under ``term IS NULL`` — the exact-verify
    second pass (``heavy_hitters_exact``) needs n for its threshold and
    this folds it into the SAME single scan instead of a separate
    count job."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        n = 0
        for pdf in batches:
            n += len(pdf)
            # the select below aliases term_col to "term" before the
            # mapInPandas, so executors always see column "term"
            counters = _mg_fold(counters, pdf["term"].value_counts(), k)
        terms = list(counters)
        ests = list(counters.values())
        if with_total:
            terms.append(None)
            ests.append(n)
        yield pd.DataFrame({"term": terms, "est": ests})

    partials = df.select(F.col(term_col).alias("term")) \
        .mapInPandas(gen, SUMMARY_SCHEMA)
    return (partials.groupBy("term")
            .agg(F.sum("est").alias("est")))


def heavy_hitters_exact(df: DataFrame, term_col: str = "term",
                        k: int = 64) -> DataFrame:
    """EXACT heavy hitters — every term with true count * k > n, with
    its exact count — via the classic two-pass sketch-then-verify plan:

    1. one scan builds the merged Misra-Gries summary (fixed k-counter
       state per partition, <= k rows shuffled per partition) whose
       candidate set is a GUARANTEED superset of the answer, with the
       exact stream length n folded into the same pass (sentinel row);
    2. a second scan counts ONLY the candidates — a broadcast semi-join
       keeps the re-scan narrow and shuffle-free on the heavy side (at
       most ~k distinct terms survive into the final agg).

    Unlike the raw MG summary the OUTPUT is partitioning-independent
    (exact counts, exact threshold), so it carries a full SQL oracle:
    ``GROUP BY term HAVING count(*) * k > n``.  The naive one-pass
    equivalent shuffles every distinct term; at 100 TB the vocabulary
    is billions of rows while this plan's exchanges stay O(k *
    partitions).  Output: (term, cnt), the terms above the n/k bar.

    NULL terms are dropped up front: the sentinel total row uses the
    NULL key, and a genuine NULL term would otherwise merge with it
    (and pandas ``value_counts`` excludes NaN from the MG fold while
    ``len(pdf)`` would count it — the stream length and the counted
    universe must agree)."""
    from ..session import scoped_persist
    df = df.filter(F.col(term_col).isNotNull())
    summary = scoped_persist(
        mg_heavy_hitters(df, term_col, k, with_total=True))
    cand = summary.filter(F.col("term").isNotNull()).select("term")
    total = summary.filter(F.col("term").isNull()) \
        .select(F.col("est").alias("n"))
    exact = (df.select(F.col(term_col).alias("term"))
             .join(F.broadcast(cand), "term")
             .groupBy("term").agg(F.count("*").alias("cnt")))
    return (exact.crossJoin(F.broadcast(total))
            .filter(F.col("cnt") * k > F.col("n"))
            .select("term", "cnt"))
