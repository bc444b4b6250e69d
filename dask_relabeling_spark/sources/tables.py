"""Test-table loaders.

``load_table`` is the public, quirk-aware reader for the driver test
tables: the synthetic ``events`` table is written with parquet
``TIMESTAMP(NANOS)``, which Spark's vectorized reader rejects outright
(``PARQUET_TYPE_ILLEGAL``).  The fix is the documented escape hatch —
read nanos as raw longs (``spark.sql.legacy.parquet.nanosAsLong``) and
convert to microsecond timestamps (the synthetic data carries no
sub-microsecond precision, so the truncation is lossless here).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one of the driver test tables (region/nation/.../events),
    normalizing engine-hostile physical types."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # Driver data can also arrive as TIMESTAMP_NTZ, which
            # unix_micros(), cast("long"), and streaming watermarks all
            # reject.  With the session timezone pinned to UTC above, the
            # NTZ -> TIMESTAMP cast is a pure reinterpretation (same wall
            # clock, same microseconds), so downstream window/watermark
            # arithmetic and the DuckDB oracle (naive timestamps) agree.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
