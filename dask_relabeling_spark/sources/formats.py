"""Generic file-format sources and sinks.

The reference consumes in-memory dask arrays plus ``.npz`` fixtures and
writes a zipped GeoJSON sink (``relabeling.py:126-163``); its relational
analog here reads/writes the standard lake formats.  ``read_any`` /
``write_any`` wrap ``spark.read``/``df.write`` with the defaults a
100 TB pipeline wants:

- **parquet** (default) / **orc**: columnar, self-describing schema,
  predicate pushdown + column pruning reach the scan; the hot-path
  formats.
- **csv / json**: ingest-only formats.  Schema is REQUIRED unless
  ``infer=True`` — schema inference is a full extra pass over the data
  and must never run implicitly at scale.
- partitioned writes (``partition_by``) lay out ``k=v/`` directories so
  downstream reads get partition pruning for free.

Timestamps are normalized to UTC session time so round-trips hash
identically across engines.
"""
from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

FORMATS = ("parquet", "orc", "csv", "json")


def read_any(spark: SparkSession, path: str, fmt: str = "parquet",
             schema: Union[StructType, str, None] = None,
             infer: bool = False, **options) -> DataFrame:
    """Read ``path`` in ``fmt``.  For csv/json a ``schema`` must be given
    unless ``infer=True`` (inference = an extra full scan: opt-in only).
    CSV defaults: header on, RFC-4180 quoting."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    reader = spark.read.format(fmt)
    if fmt == "csv":
        # escape='"': RFC-4180 doubled-quote parsing.  Spark's default
        # escape is backslash, which reads the RFC form `"say ""hi"""`
        # as the literal `"say ""hi"""` — found by the round-15 sources
        # fuzz arm (tools/dirty_fuzz.py --sources) as a silent
        # divergence from DuckDB's read_csv on the same file.  Fields
        # with embedded NEWLINES additionally need multiLine=true
        # (deliberately NOT the default: multiLine reads each file
        # whole, killing split parallelism at scale — opt in per call).
        reader = (reader.option("header", "true")
                  .option("escape", '"'))
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt not in ("parquet", "orc"):
        if not infer:
            raise ValueError(
                f"{fmt} read without schema: pass schema= or infer=True "
                "(inference is a full extra pass over the data)")
        if fmt == "csv":
            reader = reader.option("inferSchema", "true")
        else:
            reader = reader.option("inferTimestamp", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_any(df: DataFrame, path: str, fmt: str = "parquet",
              mode: str = "error",
              partition_by: Optional[Sequence[str]] = None,
              **options) -> None:
    """Write ``df`` to ``path`` in ``fmt``.  ``partition_by`` produces a
    hive-style ``k=v/`` layout (partition pruning on re-read)."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        # escape='"' writes RFC-4180 doubled quotes (Spark's default
        # backslash escape emits `"say \"hi\""`, which RFC readers —
        # DuckDB, python csv — mis-parse); symmetric with read_any.
        # ignore*WhiteSpace=false: Spark's CSV WRITER defaults these to
        # true and silently TRIMS leading/trailing whitespace out of
        # string data on the way to disk — found by the round-15
        # sources fuzz arm as a round-trip multiset change
        writer = (writer.option("header", "true")
                  .option("escape", '"')
                  .option("ignoreLeadingWhiteSpace", "false")
                  .option("ignoreTrailingWhiteSpace", "false"))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)


def read_binary_files(spark: SparkSession, path: str,
                      glob: Optional[str] = None,
                      max_bytes: Optional[int] = None) -> DataFrame:
    """Raw-file ingest for multimodal payloads (images/audio/video as
    opaque blobs): Spark's ``binaryFile`` source yields one row per file
    — ``path, modificationTime, length, content:binary`` — which feeds
    straight into ``operators.multimodal`` (decode / featurize / resize
    run as Arrow-batched stages over the ``content`` column).

    ``glob`` prunes by filename pattern AT LISTING TIME (no data read
    for excluded files).  ``max_bytes`` guards executors from an
    oversized blob blowing task memory: enforced as a
    ``length <= max_bytes`` filter, which the source pushes down so
    oversized file CONTENT is never fetched (only the cheap file-status
    listing sees it)."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.filter(df.length <= max_bytes)
    return df


def read_whole_text(spark: SparkSession, path: str,
                    glob: Optional[str] = None,
                    line_mode: bool = False) -> DataFrame:
    """Text-corpus ingest: one row per FILE (``wholetext`` — a document
    per file, the common raw-corpus layout) or per LINE
    (``line_mode=True`` — JSONL-ish shards where upstream already packed
    one doc per line).  Returns ``value:string``; per-file provenance
    comes via the ``_metadata.file_path`` hidden column when needed."""
    reader = (spark.read.format("text")
              .option("wholetext", "true" if not line_mode else "false"))
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def write_zordered(df: DataFrame, path: str, zkey_col: str,
                   n_files: int = 16, fmt: str = "parquet",
                   mode: str = "error") -> None:
    """Write ``df`` clustered by a z-order key (``functions/ids.py::
    zorder_key``): range-partition on the key so each output file owns
    a contiguous key range, and sort within partitions so parquet
    row-group statistics are tight.  With a Morton key over (a, b),
    every file then covers a small rectangle of (a, b) space — min/max
    file statistics prune scans for predicates on EITHER dimension
    (the Delta/Iceberg OPTIMIZE ZORDER effect, reproduced with plain
    Spark writers).  ``tests/test_formats.py`` measures the locality:
    per-file bbox area must shrink ~n_files-fold vs the global bbox."""
    (df.repartitionByRange(n_files, zkey_col)
       .sortWithinPartitions(zkey_col)
       .write.format(fmt).mode(mode).save(path))


def compact_parquet(spark: SparkSession, path: str, out_path: str,
                    target_files: int, sort_by: Optional[str] = None
                    ) -> int:
    """Small-files compaction (the OPTIMIZE/maintenance pass every
    streaming sink needs): rewrite a parquet dataset into
    ``target_files`` right-sized files, optionally range-clustered on
    ``sort_by`` so row-group statistics stay useful after compaction.

    Writes to ``out_path`` (never in place — the swap is the caller's
    atomic rename/metadata commit, exactly how Delta/Iceberg stage
    compactions), returns the number of files written.  Plain
    ``coalesce`` when unsorted (no shuffle — input files concatenate);
    ``repartitionByRange`` + in-partition sort when clustering.
    """
    df = spark.read.parquet(path)
    if sort_by is None:
        df.coalesce(target_files).write.parquet(out_path)
    else:
        (df.repartitionByRange(target_files, sort_by)
           .sortWithinPartitions(sort_by)
           .write.parquet(out_path))
    # count through Spark's filesystem layer, not a local glob, so the
    # answer is right on s3://, hdfs://, etc. (round-3 ADVICE)
    return len(spark.read.parquet(out_path).inputFiles())
