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
                     k: int = 64) -> DataFrame:
    """Candidate heavy hitters of ``term_col`` with their merged
    Misra-Gries estimates.  Output: (term, est) — every term whose true
    count exceeds n/k is guaranteed present; true counts lie in
    [est, est + n/k]."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            counters = _mg_fold(counters, pdf[term_col].value_counts(), k)
        yield pd.DataFrame(
            {"term": list(counters), "est": list(counters.values())})

    partials = df.select(F.col(term_col).alias("term")) \
        .mapInPandas(gen, SUMMARY_SCHEMA)
    return (partials.groupBy("term")
            .agg(F.sum("est").alias("est")))
