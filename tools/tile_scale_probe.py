"""Tile-pipeline scale probe: run the flagship relabeling pipeline on
G x G grids of 128-px tiles (4 -> 256 tiles) and measure wall time.

Tiles are generated EXECUTOR-SIDE from their (cy, cx) seed — the image
never exists in one piece anywhere, exactly how a 100 TB zarr/parquet
tile table would arrive.  Masks are sparse scattered pixels (object
diameter 1 << overlap 16), inside the algorithm's one-hop-merge
contract, so per-tile CCL cost is realistic and constant per tile: a
flat-ish wall until cores saturate, then linear in tiles, is the
"scales out" signature for the halo-exchange shuffle.

Usage: python tools/tile_scale_probe.py [grids...]   (default 2 4 8 16)
"""
from __future__ import annotations

import json
import os
import sys
import time
from typing import Iterator

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dask_relabeling_spark.session import get_spark  # noqa: E402
from dask_relabeling_spark.operators.pipeline import image2labels  # noqa: E402
from dask_relabeling_spark.sources.tiles import (TILE_SCHEMA, TileSet,  # noqa: E402
                                                 tile_record)

CHUNK = 128
OVERLAP = 16


def synthetic_tiles(spark, g: int) -> TileSet:
    coords = (spark.range(g * g)
              .select((F.col("id") / g).cast("int").alias("cy"),
                      (F.col("id") % g).cast("int").alias("cx"))
              .repartition(min(g * g, 64), "cy", "cx"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for cy, cx in zip(pdf["cy"], pdf["cx"]):
                y, x = np.mgrid[0:CHUNK, 0:CHUNK]
                mask = ((y * 31 + x * 17 + int(cy) * 7 + int(cx) * 13)
                        % 97 == 0).astype(np.int64)
                recs.append(tile_record((int(cy), int(cx)), mask))
            yield pd.DataFrame.from_records(
                recs, columns=[f.name for f in TILE_SCHEMA.fields])

    df = coords.mapInPandas(gen, TILE_SCHEMA)
    return TileSet(df=df, nd=2, grid=(g, g), chunk_shape=(CHUNK, CHUNK),
                   overlaps=(0, 0), image_shape=(g * CHUNK, g * CHUNK))


def main() -> None:
    grids = [int(a) for a in sys.argv[1:]] or [2, 4, 8, 16]
    spark = get_spark(app_name="tile-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for g in grids:
        ts = synthetic_tiles(spark, g)
        image2labels(ts, overlaps=OVERLAP, threshold=0.05).df.count()  # warm
        best = None
        for _ in range(2):
            ts = synthetic_tiles(spark, g)
            t0 = time.perf_counter()
            out = image2labels(ts, overlaps=OVERLAP, threshold=0.05)
            n = out.df.count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        rows.append({"grid": f"{g}x{g}", "tiles": g * g,
                     "sec": round(best, 2)})
        print(f"# {g}x{g} ({g * g} tiles, {n} rows): {best:.2f}s",
              file=sys.stderr)
    print(json.dumps({"chunk": CHUNK, "overlap": OVERLAP, "probes": rows}))


if __name__ == "__main__":
    main()
