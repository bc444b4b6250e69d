"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every named operator/query from SURVEY.md §2 (the
relational capability surface §2.3, the LLM-data-pipeline operators, and
the flagship tile-relabeling pipeline); ``oracle_sql()`` returns the DuckDB
oracle for each SQL-expressible entry.  Implementations live in
``dask_relabeling_spark.plans``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dask_relabeling_spark.plans import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full relabeling pipeline (halo exchange -> CCL ->
    checkerboard dedup -> merge) over a mask derived from lineitem."""
    fn, _ = REGISTRY["relabel_components"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in REGISTRY.items()
            if sql is not None}
