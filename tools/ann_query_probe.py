"""Query-only latency of the PERSISTED IVF-PQ index under corpus growth.

``ann_ivfpq_indexed``'s bench number times index BUILD + query in one
wall; the production claim, though, is about the QUERY side — after a
one-time build, a search reads only the probed cells' (id, code)
partitions, so latency should stay ~flat while the corpus grows.  This
probe measures exactly that: replicate the sf0.1 embeddings Kx
(vec_ids offset per replica), build the index ONCE per scale, then
time ``ivfpq_topk_indexed`` alone (best-of-N on a warmed session).

Usage:  python tools/ann_query_probe.py [K ...]     (default: 1 10 100)
Writes scratch parquet under .scratch/ann_qp/ (gitignored); prints one
row per scale: corpus rows, index build s, query-only best-of-5 s.
"""
from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dask_relabeling_spark.session import get_spark  # noqa: E402
from dask_relabeling_spark.operators import similarity as S  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".scratch", "ann_qp")
OFFSET = 100_000_000
RUNS = 5


def main() -> None:
    scales = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark(app_name="ann-query-probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{BASE}/embeddings.parquet")
    # Single source of truth for the query-vector convention (lowest
    # NON-NULL vec_id): reuse the registered queries' own helper so the
    # probe can never measure against a different vector than the arms
    # it is probing (round-10 review).
    from dask_relabeling_spark.plans.llm import _query_vec
    try:
        qv = _query_vec(base)
    except ValueError as e:
        sys.exit(str(e))
    shutil.rmtree(ROOT, ignore_errors=True)
    print(f"{'K':>4} {'rows':>10} {'build_s':>8} {'query_s':>8}")
    for k in scales:
        corpus = base
        for r in range(1, k):
            corpus = corpus.unionAll(base.withColumn(
                "vec_id", F.col("vec_id") + F.lit(r * OFFSET)))
        n = corpus.count()
        path = os.path.join(ROOT, f"x{k}")
        t0 = time.perf_counter()
        S.build_ivfpq_index(corpus, path, n_centroids=8,
                            n_sub=8, sub_dim=8, n_codes=4)
        build = time.perf_counter() - t0
        # query-only: the stored index is all the query side may read
        best = None
        for _ in range(RUNS):
            t0 = time.perf_counter()
            rows = S.ivfpq_topk_indexed(spark, path, qv, k=10, n_probe=2,
                                        n_sub=8, sub_dim=8,
                                        n_codes=4).collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        assert len(rows) == 10
        print(f"{k:>4} {n:>10} {build:>8.2f} {best:>8.2f}")
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
