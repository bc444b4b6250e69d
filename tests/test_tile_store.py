"""Persistent tile store: round-trip, spatial-crop pruning, metadata."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from dask_relabeling_spark import image2labels
from dask_relabeling_spark.sources.tiles import from_array, to_array
from dask_relabeling_spark.sources.tile_store import (read_tile_store,
                                                      write_tile_store)


def mk_image(h=16, w=20):
    rng = np.random.RandomState(7)
    return (rng.rand(h, w) > 0.6).astype(np.int64)


def test_round_trip_preserves_tiles_and_meta(spark, tmp_path):
    img = mk_image()
    ts = from_array(spark, img, chunk_shape=(4, 4))
    path = str(tmp_path / "store")
    write_tile_store(ts, path)
    back = read_tile_store(spark, path)
    assert (back.nd, back.grid, back.chunk_shape, back.overlaps,
            back.image_shape) == (ts.nd, ts.grid, ts.chunk_shape,
                                  ts.overlaps, ts.image_shape)
    np.testing.assert_array_equal(to_array(back), img)


def test_pipeline_from_store_matches_direct(spark, tmp_path):
    img = mk_image()
    ts = from_array(spark, img, chunk_shape=(4, 4))
    path = str(tmp_path / "store")
    write_tile_store(ts, path)
    direct = to_array(image2labels(ts, overlaps=2, threshold=0.25))
    stored = to_array(image2labels(read_tile_store(spark, path),
                                   overlaps=2, threshold=0.25))
    np.testing.assert_array_equal(stored, direct)


def test_row_range_crop_prunes_partitions(spark, tmp_path):
    img = mk_image(h=16, w=8)
    ts = from_array(spark, img, chunk_shape=(4, 4))  # 4x2 grid
    path = str(tmp_path / "store")
    write_tile_store(ts, path)
    crop = read_tile_store(spark, path, row_range=(1, 3))
    assert crop.grid == (2, 2) and crop.image_shape == (8, 8)
    # the crop must prune at the partition level, not post-scan filter
    plan = crop.df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    np.testing.assert_array_equal(to_array(crop), img[4:12])


def test_write_mode_error_refuses_overwrite(spark, tmp_path):
    ts = from_array(spark, mk_image(), chunk_shape=(4, 4))
    path = str(tmp_path / "store")
    write_tile_store(ts, path)
    with pytest.raises(Exception):
        write_tile_store(ts, path)
