"""Round-9 regression tests: the non-default ``term_col`` path of the
MG heavy hitters (round-8 ADVICE: the fold read the pre-alias column
name and crashed in the executor), the lowest-vec_id ANN query-vector
convention (clear error on an empty table, correct vector when the ids
don't start at 0), and the rotation's rows-only green arm requiring a
non-diverged schema.
"""
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dask_relabeling_spark.functions.heavy_hitters import (
    heavy_hitters_exact, mg_heavy_hitters)
from dask_relabeling_spark.plans import _is_green
from dask_relabeling_spark.plans.llm import _query_vec
from dask_relabeling_spark.session import release_persists


def test_heavy_hitters_non_default_term_col(spark):
    """mg_heavy_hitters aliases term_col to 'term' BEFORE the
    mapInPandas, so the fold must read the post-alias column; with a
    non-default name this used to KeyError in the executor."""
    df = spark.createDataFrame(
        [("x",)] * 5 + [("y",)] * 2, "word string")
    est = {r.term: r.est for r in
           mg_heavy_hitters(df, term_col="word", k=8).collect()}
    assert est == {"x": 5, "y": 2}
    got = {(r.term, r.cnt) for r in
           heavy_hitters_exact(df, term_col="word", k=2).collect()}
    assert got == {("x", 5)}  # 5*2 > 7; 2*2 < 7
    release_persists()


def test_query_vec_lowest_id_and_empty_error(spark):
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": [7, 3, 9],
                      "embedding": [[1.0, 0.0], [0.0, 2.0], [3.0, 3.0]]}))
    assert _query_vec(emb) == [0.0, 2.0]  # vec_id 3, not "vec_id == 0"
    with pytest.raises(ValueError, match="no ANN query vector"):
        _query_vec(emb.filter(F.col("vec_id") > 100))


def test_rows_only_green_requires_schema_match():
    """A rows-only driver row (hash_match null) whose SCHEMA diverged
    must not count as green evidence (round-8 ADVICE)."""
    base = {"rows_match": True, "hash_match": None, "err": None}
    assert _is_green({**base, "schema_match": True})
    assert _is_green(base)  # schema key absent: legacy artifacts
    assert not _is_green({**base, "schema_match": False})
    # hash-green rows are green regardless (hash implies schema).
    assert _is_green({"rows_match": True, "hash_match": True, "err": None,
                      "schema_match": True})
