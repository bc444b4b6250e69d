"""Unit tests for the round-4 operators beyond the oracle-parity gate:
integer PageRank invariants, IVF-PQ self-query sanity, the zorder
high-bit fold, and the within-batch incremental-dedup flag."""
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dask_relabeling_spark.functions.ids import zorder_key
from dask_relabeling_spark.operators.dedup import incremental_new_docs
from dask_relabeling_spark.operators.graph import pagerank_scaled
from dask_relabeling_spark.operators.similarity import ivfpq_topk


def _edges(spark, pairs):
    return spark.createDataFrame([Row(u=a, v=b) for a, b in pairs])


def test_pagerank_star_hub_outranks_leaves(spark):
    # star: 0 at the center of 1..6 — the hub must dominate
    pr = {r.id: r.rank_micro
          for r in pagerank_scaled(
              _edges(spark, [(0, i) for i in range(1, 7)])).collect()}
    assert pr[0] > max(pr[i] for i in range(1, 7))
    leaf_ranks = {pr[i] for i in range(1, 7)}
    assert len(leaf_ranks) == 1          # symmetric leaves tie exactly


def test_pagerank_mass_approximately_conserved(spark):
    # integer truncation loses < outdeg micro-units per vertex per
    # iteration; total mass stays within that bound of `scale`
    edges = [(a, b) for a in range(8) for b in range(a + 1, 8)]
    rows = pagerank_scaled(_edges(spark, edges), n_iter=3).collect()
    total = sum(r.rank_micro for r in rows)
    assert 0 < total <= 1_000_000
    assert total >= 1_000_000 - 8 * 8 * 4       # n * maxdeg * iters slack


def test_pagerank_regular_graph_uniform(spark):
    # 4-cycle: perfectly regular, so every vertex keeps the same rank
    pr = {r.id: r.rank_micro
          for r in pagerank_scaled(
              _edges(spark, [(0, 1), (1, 2), (2, 3), (0, 3)])).collect()}
    assert len(set(pr.values())) == 1


def test_ivfpq_self_query_is_rank_one(spark):
    import random
    rng = random.Random(7)
    rows = [Row(vec_id=i, embedding=[rng.uniform(-1, 1) for _ in range(64)])
            for i in range(40)]
    df = spark.createDataFrame(rows)
    q = rows[0].embedding
    got = ivfpq_topk(df, q, k=5).collect()
    # vec 0 is a codebook/centroid vector: its ADC distance to its own
    # code is the quantization floor, and its cell is always probed
    assert got[0].rank == 1 and got[0].vec_id == 0
    assert [r.rank for r in got] == [1, 2, 3, 4, 5]


def test_zorder_high_bits_fold_not_truncate(spark):
    # values differing ONLY above the window must not all collapse
    # onto one key (the old truncation did exactly that)
    vals = [16, 32, 48, 256, 4096, 1 << 20, 1 << 40]
    keys = (spark.createDataFrame([Row(x=v, y=0) for v in vals])
            .select(zorder_key("x", "y", 4).alias("z")).collect())
    assert len({r.z for r in keys}) > 1
    # in-range inputs are untouched (fold is a no-op below 2^bits)
    small = (spark.range(16)
             .select(zorder_key(F.col("id"), F.lit(0), 4).alias("z"),
                     "id").collect())
    for r in small:
        assert r.z == int(''.join(
            '0' + b for b in format(r.id, '04b')), 2)


def test_incremental_dedup_within_batch_flag(spark):
    seen = spark.createDataFrame([Row(doc_id=100, text="old news")])
    batch = spark.createDataFrame([
        Row(doc_id=1, text="fresh"), Row(doc_id=2, text="fresh"),
        Row(doc_id=3, text="old news")])
    loose = incremental_new_docs(batch, seen)
    assert sorted(r.id for r in loose.collect()) == [1, 2]
    strict = incremental_new_docs(batch, seen, within_batch=True)
    assert sorted(r.id for r in strict.collect()) == [1]
