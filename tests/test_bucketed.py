"""Bucketed tables must give exchange-free (and sort-free) joins."""
import pytest
from pyspark.sql import functions as F

from dask_relabeling_spark.sources.bucketed import read_table, write_bucketed


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    left = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("a"))
    right = spark.range(500).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("b"))
    write_bucketed(left, "bkt_left", ["k"], 8,
                   path=str(tmp_path / "bkt_left"))
    write_bucketed(right, "bkt_right", ["k"], 8,
                   path=str(tmp_path / "bkt_right"))
    yield "bkt_left", "bkt_right"
    spark.sql("DROP TABLE IF EXISTS bkt_left")
    spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_join_has_no_exchange(spark, bucketed_pair):
    lname, rname = bucketed_pair
    l, r = read_table(spark, lname), read_table(spark, rname)
    # disable broadcast so the co-located sort-merge path is what's tested
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = l.join(r, "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert j.count() == 500
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))


def test_values_match_unbucketed(spark, bucketed_pair):
    lname, rname = bucketed_pair
    got = sorted((r.k, r.a, r.b) for r in
                 read_table(spark, lname)
                 .join(read_table(spark, rname), "k").collect())
    assert got == [(k, k * 3, k * 7) for k in range(500)]
