"""Round-trip tests for the generic format sources/sinks."""
import pytest
from pyspark.sql import functions as F

from dask_relabeling_spark.sources.formats import read_any, write_any
from dask_relabeling_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def canon(df, keys):
    return [tuple(r) for r in
            df.select(*sorted(df.columns)).orderBy(*keys).collect()]


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_round_trip_preserves_values(spark, tmp_path, fmt):
    src = load_table(spark, SF, "nation")
    path = str(tmp_path / f"nation_{fmt}")
    write_any(src, path, fmt=fmt)
    back = read_any(spark, path, fmt=fmt,
                    schema=(src.schema if fmt not in ("parquet", "orc")
                            else None))
    assert back.schema == src.schema
    assert canon(back, ["n_nationkey"]) == canon(src, ["n_nationkey"])


def test_csv_without_schema_requires_optin(spark, tmp_path):
    src = load_table(spark, SF, "region")
    path = str(tmp_path / "region_csv")
    write_any(src, path, fmt="csv")
    with pytest.raises(ValueError, match="schema"):
        read_any(spark, path, fmt="csv")
    inferred = read_any(spark, path, fmt="csv", infer=True)
    assert inferred.count() == src.count()


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    src = load_table(spark, SF, "orders")
    path = str(tmp_path / "orders_part")
    write_any(src, path, fmt="parquet", partition_by=["o_orderpriority"])
    back = read_any(spark, path)
    one = back.filter(F.col("o_orderpriority") == "1-URGENT")
    # partition pruning: the filter must appear as a PartitionFilter on
    # the scan, not a post-scan Filter over all files
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "1-URGENT" in plan
    expected = src.filter(F.col("o_orderpriority") == "1-URGENT").count()
    assert one.count() == expected


def test_unknown_format_rejected(spark, tmp_path):
    src = load_table(spark, SF, "region")
    with pytest.raises(ValueError, match="unsupported"):
        write_any(src, str(tmp_path / "x"), fmt="avro")


def test_binary_file_source_reads_blobs(spark, tmp_path):
    blobs = {"a.img": b"\x00\x01\x02" * 100, "b.img": b"\xff" * 10,
             "skip.txt": b"not media"}
    for name, payload in blobs.items():
        (tmp_path / name).write_bytes(payload)
    from dask_relabeling_spark.sources.formats import read_binary_files
    df = read_binary_files(spark, str(tmp_path), glob="*.img")
    rows = {r["path"].rsplit("/", 1)[-1]: bytes(r["content"])
            for r in df.collect()}
    assert rows == {"a.img": blobs["a.img"], "b.img": blobs["b.img"]}
    # size guard: pushes a length filter, drops the big blob
    small = read_binary_files(spark, str(tmp_path), glob="*.img",
                              max_bytes=50)
    assert [r["length"] for r in small.collect()] == [10]


def test_whole_text_source_doc_per_file_and_per_line(spark, tmp_path):
    (tmp_path / "d1.txt").write_text("doc one line a\ndoc one line b")
    (tmp_path / "d2.txt").write_text("doc two")
    from dask_relabeling_spark.sources.formats import read_whole_text
    docs = read_whole_text(spark, str(tmp_path), glob="*.txt")
    assert sorted(r["value"] for r in docs.collect()) == [
        "doc one line a\ndoc one line b", "doc two"]
    lines = read_whole_text(spark, str(tmp_path), glob="*.txt",
                            line_mode=True)
    assert lines.count() == 3


def test_zorder_write_clusters_both_dimensions(spark, tmp_path):
    """Files written by write_zordered must each cover a small
    rectangle of (x, y) space: mean per-file bbox area << global area,
    so min/max stats prune on EITHER column."""
    from pyspark.sql import Row
    from dask_relabeling_spark.functions.ids import zorder_key
    from dask_relabeling_spark.sources.formats import write_zordered
    pts = spark.createDataFrame(
        [Row(x=x, y=y) for x in range(64) for y in range(64)])
    df = pts.select("x", "y", zorder_key(
        F.shiftright("x", 2).bitwiseAND(15),
        F.shiftright("y", 2).bitwiseAND(15), bits=4).alias("z"))
    path = str(tmp_path / "zordered")
    write_zordered(df, path, "z", n_files=16)
    back = (spark.read.parquet(path)
            .withColumn("f", F.input_file_name()))
    spans = (back.groupBy("f")
             .agg(((F.max("x") - F.min("x") + 1)
                   * (F.max("y") - F.min("y") + 1)).alias("area"))
             .collect())
    assert len(spans) >= 8
    mean_area = sum(r.area for r in spans) / len(spans)
    global_area = 64 * 64
    # linear range partitioning on a 1-D sort key would give full-width
    # stripes (area ~= global/n_files only in ONE dimension); the
    # z-order key must confine BOTH dimensions: mean bbox area well
    # under a quarter of the global rectangle
    assert mean_area <= global_area / 4, mean_area


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    from dask_relabeling_spark.sources.formats import compact_parquet
    src = str(tmp_path / "fragmented")
    out = str(tmp_path / "compacted")
    nation = load_table(spark, SF, "nation")
    nation.repartition(12).write.parquet(src)  # 12 tiny files
    n_files = compact_parquet(spark, src, out, target_files=2,
                              sort_by="n_nationkey")
    assert n_files <= 2
    assert canon(spark.read.parquet(out), ["n_nationkey"]) == \
        canon(nation, ["n_nationkey"])
