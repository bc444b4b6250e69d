"""grouped_topk: equivalence with the window formulation under extreme
key skew, and the bounded-fan-in plan property."""
from pyspark.sql import Window
from pyspark.sql import functions as F

from dask_relabeling_spark.functions.skew import grouped_topk


def _window_topk(df, keys, order_by, k):
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (df.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def test_matches_window_under_skew(spark):
    # 10_000 rows for hot key 0, a handful for the rest
    df = spark.range(10_500).select(
        F.when(F.col("id") < 10_000, 0)
        .otherwise((F.col("id") % 50).cast("int")).alias("k"),
        (F.col("id") * 2654435761 % 1_000_003).alias("v"),
        F.col("id"))
    order = [F.desc("v"), F.asc("id")]
    got = {(r.k, r.rank): r.id for r in
           grouped_topk(df, ["k"], order, 5).collect()}
    exp = {(r.k, r.rank): r.id for r in
           _window_topk(df, ["k"], order, 5).collect()}
    assert got == exp and len(got) > 0


def test_k_larger_than_group(spark):
    df = spark.createDataFrame([(1, 10, 1), (1, 20, 2), (2, 5, 3)],
                               ["k", "v", "id"])
    out = grouped_topk(df, ["k"], [F.desc("v"), F.asc("id")], 10).collect()
    assert len(out) == 3  # every row kept, ranks still 1-based per key
    assert {(r.k, r.rank) for r in out} == {(1, 1), (1, 2), (2, 1)}


def test_no_salt_column_leaks(spark):
    df = spark.createDataFrame([(1, 10, 1)], ["k", "v", "id"])
    out = grouped_topk(df, ["k"], [F.desc("v")], 1)
    assert set(out.columns) == {"k", "v", "id", "rank"}


def test_salted_join_matches_plain(spark):
    import pyspark.sql.functions as F
    from dask_relabeling_spark.functions.skew import salted_join
    # hot key 7: 5000 left rows; right has multiple rows per key
    left = spark.range(0, 6000).select(
        F.when(F.col("id") < 5000, F.lit(7)).otherwise(F.col("id") % 50)
        .alias("k"), F.col("id").alias("lv"))
    right = spark.range(0, 100).select(
        (F.col("id") % 50).alias("k"), F.col("id").alias("rv"))
    for how in ("inner", "left"):
        exp = sorted(tuple(r) for r in
                     left.join(right, "k", how).collect())
        got = sorted(tuple(r) for r in
                     salted_join(left, right, "k", n_salts=8,
                                 how=how).collect())
        assert got == exp
