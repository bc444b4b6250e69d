"""Interval-overlap (range) join via time-bucket binning.

Spark has no native interval-overlap join; the naive formulation
(`a.start <= b.end AND b.start <= a.end`) is a pure theta join that
plans as a nested-loop over the cross product.  The scalable shape is
the classic *bin join*: explode each interval into the fixed-width time
buckets it touches, equi-join on the bucket (shuffled hash join — the
join Spark is good at), keep each pair once by anchoring it to the
first bucket the two intervals share, then apply the exact overlap
predicate as a post-join filter.

Cost model: fan-out per row = interval_length / bin_width (pick the bin
near the median interval length), and each candidate pair is produced
exactly once — no dedup shuffle.  This is how Sedona/Flink/KDB-style
range joins decompose onto a hash-join engine.

All arithmetic is integer microseconds (``unix_micros`` /
``epoch_us``), so the oracle comparison is float-free.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bin(us: Column, bin_us: int) -> Column:
    return F.floor(us / F.lit(bin_us)).cast("long")


def _with_bins(df: DataFrame, start: str, end: str, bin_us: int,
               prefix: str) -> DataFrame:
    s_us = F.unix_micros(F.col(start))
    e_us = F.unix_micros(F.col(end))
    out = (df.withColumn(f"{prefix}_s", s_us)
           .withColumn(f"{prefix}_e", e_us)
           .withColumn(f"{prefix}_b0", _bin(F.col(f"{prefix}_s"), bin_us)))
    bins = F.sequence(F.col(f"{prefix}_b0"),
                      _bin(F.col(f"{prefix}_e"), bin_us))
    return out.withColumn("bin", F.explode(bins))


def overlap_join_binned(left: DataFrame, right: DataFrame,
                        l_start: str, l_end: str,
                        r_start: str, r_end: str,
                        bin_seconds: int = 3600) -> DataFrame:
    """Join every left interval [l_start, l_end] with every right
    interval [r_start, r_end] it overlaps (closed intervals, so
    touching endpoints count with overlap 0).  Adds ``overlap_us``.

    Each qualifying pair is emitted exactly once: the equi-join runs on
    the shared bucket AND the anchor condition `bin ==
    greatest(first_bin_left, first_bin_right)` — the first bucket both
    intervals touch — so multi-bucket overlaps don't duplicate.
    """
    bin_us = bin_seconds * 1_000_000
    lb = _with_bins(left, l_start, l_end, bin_us, "_l")
    rb = _with_bins(right, r_start, r_end, bin_us, "_r")
    joined = lb.join(
        rb,
        (lb["bin"] == rb["bin"]) &
        (lb["bin"] == F.greatest(lb["_l_b0"], rb["_r_b0"])) &
        (lb["_l_s"] <= rb["_r_e"]) & (rb["_r_s"] <= lb["_l_e"]))
    overlap = (F.least(lb["_l_e"], rb["_r_e"]) -
               F.greatest(lb["_l_s"], rb["_r_s"]))
    keep = ([lb[c] for c in left.columns] +
            [rb[c] for c in right.columns if c not in left.columns])
    return joined.select(*keep, overlap.alias("overlap_us"))
