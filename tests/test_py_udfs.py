"""Scalar pandas_udf and Python UDTF surfaces."""
import numpy as np
from pyspark.sql import functions as F

from dask_relabeling_spark.functions.py_udfs import (SplitSentences,
                                                     cosine_to_query)
from dask_relabeling_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_pandas_udf_cosine_matches_jvm_expression(spark):
    em = load_table(spark, SF, "embeddings").limit(64)
    q = [float(i % 7) - 3.0 for i in range(
        len(em.first()["embedding"]))]
    cos = cosine_to_query(q)
    arr = F.array(*[F.lit(float(v)) for v in q])
    num = F.aggregate(F.zip_with("embedding", arr, lambda a, b: a * b),
                      F.lit(0.0), lambda acc, v: acc + v)
    den = (F.sqrt(F.aggregate("embedding", F.lit(0.0),
                              lambda acc, v: acc + v * v))
           * F.sqrt(F.aggregate(arr, F.lit(0.0),
                                lambda acc, v: acc + v * v)))
    rows = (em.select("vec_id",
                      cos("embedding").alias("py"),
                      (num / den).alias("jvm"))
            .collect())
    # float32 embeddings: the two paths promote to double at different
    # points, so agreement is bounded by f32 rounding, not f64
    assert rows and all(abs(r.py - r.jvm) < 1e-6 for r in rows)


def test_udtf_splits_sentences(spark):
    spark.udtf.register("split_sentences", SplitSentences)
    out = spark.sql(
        "SELECT s.pos, s.sentence FROM "
        "VALUES ('a b. c d. '), (NULL), ('x') AS t(txt), "
        "LATERAL split_sentences(t.txt) s").collect()
    got = sorted((r.pos, r.sentence) for r in out)
    assert got == [(0, "a b"), (0, "x"), (1, "c d")]


def test_misra_gries_mergeable_guarantee(spark):
    """Merged per-partition Misra-Gries summaries must satisfy the
    mergeable-summaries contract under ANY partitioning:
    est <= true <= est + n/k for all reported terms, and every term
    with true count > n/k is reported."""
    from pyspark.sql import functions as F
    from dask_relabeling_spark.functions.heavy_hitters import (
        mg_heavy_hitters)
    from dask_relabeling_spark.operators.text import tokens_col
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    toks = docs.select(F.explode(tokens_col(F.col("text"))).alias("term"))
    true = {r.term: r.c for r in
            toks.groupBy("term").agg(F.count("*").alias("c")).collect()}
    n = sum(true.values())
    k = 8
    for parts in (1, 3, 17):
        got = {r.term: r.est for r in
               mg_heavy_hitters(toks.repartition(parts), k=k).collect()}
        bound = n / k
        for term, cnt in true.items():
            if cnt > bound:
                assert term in got, (parts, term)
        for term, est in got.items():
            assert est <= true[term] <= est + bound, (parts, term)
