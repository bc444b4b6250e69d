"""Round-5 operator tests: id-space-safe PQ packing, the persisted
IVF-PQ index round-trip, segment-dedup's text output, and the
per-session persist scope."""
import tempfile

import pytest
from pyspark.sql import functions as F

from dask_relabeling_spark.operators import similarity as S
from dask_relabeling_spark.operators.dedup import segment_dedup
from dask_relabeling_spark.session import (persist_scope,
                                           release_persists,
                                           scoped_persist)


def _toy_corpus(spark, offset=0, stride=1, n=40, dim=64):
    """Deterministic embeddings with ids offset*stride-spaced — the
    sparse/offset id space the round-4 advice flagged."""
    rows = []
    for i in range(n):
        vec = [float(((i * 31 + d * 7) % 97) - 48) / 48.0
               for d in range(dim)]
        rows.append((offset + i * stride, vec))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_pq_codes_pack_rank_not_cid(spark):
    """Packed fields must hold the codebook entry's RANK: with 4
    codebook entries the field is 2 bits wide, so every packed code of
    an 8-sub-space split fits in 16 bits regardless of the id space."""
    dense = _toy_corpus(spark, offset=0, stride=1)
    sparse = _toy_corpus(spark, offset=1_000_000, stride=37)
    c_dense = {r["id"]: r["code"]
               for r in S.pq_codes(dense).collect()}
    c_sparse = {r["id"] - 1_000_000: r["code"]
                for r in S.pq_codes(sparse,).collect()}
    assert all(0 <= c < (1 << 16) for c in c_sparse.values())
    # same vectors, same codebook ranks -> identical packed codes
    assert {k // 37: v for k, v in c_sparse.items()} == c_dense


def test_ivfpq_topk_offset_ids_match_dense(spark):
    """The ADC positional lookup must resolve correctly for offset
    ids: the ranked neighbor list over the offset corpus is the dense
    list shifted by the offset."""
    dense = _toy_corpus(spark, offset=0, stride=1)
    sparse = _toy_corpus(spark, offset=1_000_000, stride=37)
    qv = dense.filter(F.col("vec_id") == 0).first()["embedding"]
    got_d = [(r["rank"], r["vec_id"])
             for r in S.ivfpq_topk(dense, qv, k=5, n_centroids=4,
                                   n_probe=2, n_codes=4).collect()]
    got_s = [(r["rank"], (r["vec_id"] - 1_000_000) // 37)
             for r in S.ivfpq_topk(sparse, qv, k=5, n_centroids=4,
                                   n_probe=2, n_codes=4).collect()]
    assert got_d == got_s
    assert len(got_d) == 5


def test_ivfpq_indexed_matches_rebuild(spark):
    """Querying the persisted index must be bit-identical to the
    rebuild-per-query path (parquet round-trips doubles losslessly and
    every fold order is shared)."""
    corpus = _toy_corpus(spark, offset=500, stride=3, n=60)
    qv = corpus.orderBy("vec_id").first()["embedding"]
    expect = [tuple(r) for r in
              S.ivfpq_topk(corpus, qv, k=7, n_centroids=6, n_probe=2,
                           n_codes=4).collect()]
    path = tempfile.mkdtemp(prefix="test_ivfpq_idx_")
    S.build_ivfpq_index(corpus, path, n_centroids=6, n_codes=4)
    got = [tuple(r) for r in
           S.ivfpq_topk_indexed(spark, path, qv, k=7, n_probe=2,
                                n_codes=4).collect()]
    assert got == expect
    # the stored index exposes only (id, cell, code) + tiny metadata
    idx = spark.read.parquet(f"{path}/index")
    assert sorted(idx.columns) == ["cell", "code", "id"]


def test_segment_dedup_out_text_consistent(spark):
    """clean_fp (default output) must equal md5 of clean_text (the
    out_text output) row for row, and fully-boilerplate docs drop from
    both."""
    rows = [(1, "a b c d e f g h i j k l m n o p q r"),
            (2, "a b c d e f g h i j k l m n o p q r"),  # exact dup
            (3, "x y z w v u t s r q p o n m l k j i")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp = {r["id"]: r["clean_fp"]
          for r in segment_dedup(df, seg_len=4).collect()}
    txt = {r["id"]: r["clean_text"]
           for r in segment_dedup(df, seg_len=4, out_text=True).collect()}
    assert set(fp) == set(txt)
    assert 2 not in fp  # every segment of doc 2 lost to doc 1
    for i, t in txt.items():
        got = spark.sql(f"SELECT md5('{t}') m").first()["m"]
        assert got == fp[i]


def _persisted_ids(spark):
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet()
               .toArray())


def test_persist_scope_releases_only_own_session(spark):
    release_persists()
    base = _persisted_ids(spark)   # other tests may leave pinned blocks
    df1 = scoped_persist(spark.range(10))
    with persist_scope(spark):
        scoped_persist(spark.range(20))
    # the context manager released BOTH (same session key) — per spec:
    # scoping is per SparkSession, not per block
    assert _persisted_ids(spark) == base
    df1.unpersist()
    release_persists()


def test_release_persists_other_session_untouched(spark):
    release_persists()
    base = _persisted_ids(spark)
    df = scoped_persist(spark.range(30))
    df.count()

    class _Fake:  # a distinct session key
        pass

    release_persists(_Fake())          # wrong session: nothing dropped
    assert _persisted_ids(spark) - base
    release_persists(spark)            # right session: dropped
    assert _persisted_ids(spark) == base
