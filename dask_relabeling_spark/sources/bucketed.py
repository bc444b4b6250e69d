"""Bucketed-table sink: co-located (shuffle-free) big-big joins.

At 100 TB, a fact-fact equi-join (orders x lineitem, documents x
embeddings) re-shuffles both inputs on every run.  Writing both sides
bucketed (and sorted) by the join key makes the partitioning part of the
table layout: Spark's scan reports the hash-partitioning to Catalyst,
which elides both Exchanges — the join runs bucket-by-bucket, and with
sorted buckets the sort-merge join skips its sorts too.  This is the
"pre-partitioning reused across stages" idiom the reference approximates
by keeping one chunk grid across its whole pipeline (SURVEY §4.1).

The bucket count is a layout decision: pick so one bucket of the BIGGER
table fits an executor core's working memory (e.g. 100 TB / 8192 buckets
~ 12 GB per bucket pre-compression — too big; 65536 -> ~1.5 GB).
"""
from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, keys: List[str],
                   n_buckets: int, path: Optional[str] = None,
                   sort: bool = True) -> None:
    """Persist ``df`` as a parquet table bucketed (and by default sorted)
    by ``keys``.  ``path`` overrides the warehouse location (external
    table).

    NB: Spark only elides the join-side Sorts when each bucket is a
    single file — ``repartition(n_buckets, *keys)`` before writing if
    you need that; the Exchange elision (the expensive part) holds
    regardless.  Mismatched bucket counts degrade gracefully: Spark
    re-shuffles only the smaller side."""
    w = df.write.format("parquet").mode("overwrite") \
        .bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
