"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall time of the headline query set (each query
fully materialized via a count/collect action).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dask_relabeling_spark.session import (  # noqa: E402
    get_spark, release_persists)
from dask_relabeling_spark.plans import REGISTRY  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the flagship tile pipeline + one representative per
# operator family (scan, agg, joins, window, dedup, similarity, text,
# events).  Everything else still runs in the correctness gate.
HEADLINE = [
    "relabel_components",
    "relabel_components_summary",  # flagship w/ recursive-CTE CCL oracle
    "relabel_annotations",     # GeoJSON terminal (1 shuffle, 1 Python pass)
    "relabel_components_3d",   # BASELINE.md geometry: 60x256x256, 2x2 grid
    "scan_filter_project",
    "q1_pricing_summary",
    "broadcast_join_brand_revenue",
    "q3_shipping_priority",
    "events_adjacent_pairs",
    "top_customers_per_nation",
    "word_counts",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_cosine_topk",
    "text_quality",
    "events_sessionize",
    "docs_pack_sequences",      # two-phase prefix-sum packing
    "events_hourly_gapfill",    # dense-grid resample
    "docs_curation_pipeline",   # composed quality+langid+dedup, one scan
    "embedding_kmeans",         # iterative Lloyd's (round 3)
    "dedup_prefix_jaccard",     # PPJoin prefix filtering (round 3)
    "lineitem_exact_quantiles",  # exact two-phase order stats (round 3)
    "dedup_prefix_clusters",    # PPJoin -> CC scale path (round 4)
    "events_user_pagerank",     # iterative integer PageRank (round 4)
    "ann_ivfpq_indexed",        # persisted-index ANN round trip (round 5;
                                # measured time = index BUILD + query — the
                                # query alone reads only probed (id, code))
    "dedup_segment_then_prefix",  # boilerplate-aware PPJoin (round 5)
    "multimodal_y4m_frames",    # real-codec multimodal representative
                                # (round 5: pure-NumPy Y4M frame walk)
]


def main() -> None:
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    sf = SF_DIR.rstrip("/").split("sf")[-1]

    # JVM/session warmup so the first measured query doesn't pay startup:
    # exercise codegen, the parquet reader, and the Arrow/pandas-UDF worker
    # pool (Python workers are reused afterwards)
    spark.range(1000).selectExpr("sum(id)").collect()
    import pandas as _pd
    warm = spark.range(64).repartition(32)
    warm.mapInPandas(lambda it: it, "id long").count()
    warm.groupBy("id").applyInPandas(
        lambda pdf: _pd.DataFrame({"id": [0]}), "id long").count()
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    warmup_runs = int(os.environ.get("BENCH_WARMUP_RUNS", "1"))
    measured_runs = int(os.environ.get("BENCH_MEASURED_RUNS", "3"))
    timings = {}
    total = 0.0
    for name in HEADLINE:
        fn, _ = REGISTRY[name]
        for _ in range(warmup_runs):  # steady-state: skip codegen/footer IO
            fn(spark, SF_DIR).count()
        # best-of-N: single-JVM runs see +/-2x GC/OS noise on this box;
        # the minimum is the reproducible steady-state cost of the plan
        best, n = None, 0
        for _ in range(measured_runs):
            # drop blocks persisted by the warmup/previous run: a measured
            # run must not read operator-internal caches built outside
            # its own wall
            spark.catalog.clearCache()
            start = time.perf_counter()
            df = fn(spark, SF_DIR)
            n = df.count()
            dt = time.perf_counter() - start
            best = dt if best is None else min(best, dt)
        spark.catalog.clearCache()
        release_persists()
        timings[name] = round(best, 3)
        total += best
        print(f"# {name}: {best:.3f}s ({n} rows)", file=sys.stderr)

    print(json.dumps({
        "metric": "headline_suite_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
    }))


if __name__ == "__main__":
    main()
