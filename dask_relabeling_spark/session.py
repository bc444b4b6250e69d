"""SparkSession factory with the engine's scale-oriented defaults."""
from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "dask-relabeling-spark",
              master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Session with AQE, Arrow, and sane shuffle sizing.

    Local runs default to ``local[$SPARK_GRAFT_CPUS or *]``; on a real
    cluster pass ``master=None`` with a pre-configured environment and these
    settings still apply (they are safe cluster-side defaults).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.sql.shuffle.partitions",
                str(shuffle_partitions
                    or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))))
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    return builder.getOrCreate()
