"""A/B the PPJoin POSITIONAL filter's candidate reduction.

Rebuilds the candidate stage of
``operators.dedup.prefix_filtered_jaccard_pairs`` (same shingle table,
same (df, tok) global order, same prefix/length bounds) twice — with
and without the positional predicate — and reports collision rows,
distinct candidate pairs, and the wall for candidates+verify of each
variant.  The filter is lossless, so the final pair count must agree;
the interesting numbers are the candidate columns.

Usage: python tools/ppjoin_filter_ab.py [sf_dir]
(default: the 10x replica at .scratch/sfx10 left by
``SCALE_PROBE_KEEP=1 tools/scale_probe.py 10``)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from dask_relabeling_spark.operators.dedup import (  # noqa: E402
    _distinct_shingle_table)
from dask_relabeling_spark.session import (  # noqa: E402
    get_spark, release_persists, scoped_persist)
from dask_relabeling_spark.sources.tables import load_table  # noqa: E402

NUM, DEN = 4, 5  # the registered queries' 0.8 Jaccard threshold


def build_prefix(docs):
    toks = scoped_persist(
        _distinct_shingle_table(docs, "doc_id", "text", 3)
        .withColumnRenamed("sh", "tok"))
    dfreq = toks.groupBy("tok").agg(F.count("*").alias("df"))
    w = Window.partitionBy("id")
    rk = F.row_number().over(w.orderBy("df", "tok"))
    plen = (F.col("sz")
            - F.floor((F.lit(NUM) * F.col("sz") + (DEN - 1)) / DEN) + 1)
    return (toks.join(dfreq, "tok")
            .withColumn("sz", F.count("*").over(w))
            .withColumn("rk", rk)
            .filter(F.col("rk") <= plen)
            .select("id", "tok", "sz", "rk"))


def cand_plan(prefix, positional: bool):
    base = ((F.col("a.tok") == F.col("b.tok")) &
            (F.col("a.id") < F.col("b.id")) &
            (F.least(F.col("a.sz"), F.col("b.sz")) * DEN
             >= F.greatest(F.col("a.sz"), F.col("b.sz")) * NUM))
    if positional:
        min_ov = F.floor((F.lit(NUM) * (F.col("a.sz") + F.col("b.sz"))
                          + (NUM + DEN - 1)) / (NUM + DEN))
        base = base & (F.least(F.col("a.sz") - F.col("a.rk"),
                               F.col("b.sz") - F.col("b.rk")) + 1
                       >= min_ov)
    return (prefix.alias("a").join(prefix.alias("b"), base)
            .select(F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b")))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch", "sfx10")
    spark = get_spark(app_name="ppjoin-filter-ab")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    out = {"sf_dir": sf_dir}
    for positional in (False, True):
        key = "positional" if positional else "prefix_only"
        prefix = build_prefix(docs)
        t0 = time.perf_counter()
        collisions = cand_plan(prefix, positional).count()
        pairs = cand_plan(prefix, positional).distinct().count()
        out[key] = {"collision_rows": collisions,
                    "candidate_pairs": pairs,
                    "wall_sec": round(time.perf_counter() - t0, 2)}
        release_persists()
        spark.catalog.clearCache()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
