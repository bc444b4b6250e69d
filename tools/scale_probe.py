"""Scale probe: replicate the sf0.1 tables Kx (keys offset per replica so
cardinalities grow with data volume) and measure how the headline plans
scale.  A plan that "would still work at 1000 executors" must scale
~linearly here; anything superlinear is a partitioning/shuffle bug to fix
before it matters.

Usage:  python tools/scale_probe.py [K]          (default K=10)
Writes replicated parquet under .scratch/sfx{K}/ (gitignored); prints a
table of 1x vs Kx wall times and the time ratio per query.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dask_relabeling_spark.session import get_spark  # noqa: E402
from dask_relabeling_spark.sources.tables import load_table  # noqa: E402
from dask_relabeling_spark.plans import REGISTRY  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".scratch")

# (table, id columns to offset per replica).  Offsetting keeps join keys
# consistent within a replica while growing global key cardinality —
# a pure UNION ALL duplicate would instead grow every group x K with
# constant group count, which under-stresses the shuffle.
TABLES = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "nation": [],
    "region": [],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
OFFSET = 100_000_000

PROBES = [
    "q1_pricing_summary",
    "broadcast_join_brand_revenue",
    "q3_shipping_priority",
    "top_customers_per_nation",
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "docs_curation_pipeline",
    "docs_pack_sequences",
    "docs_deterministic_shuffle",
    "events_user_retention_cohorts",
    "events_sessionize",
    "word_counts",
]


def replicate(spark, k: int) -> str:
    # SCALE_PROBE_TABLES=documents,embeddings bounds a heavy-K probe
    # to the tables its queries actually read (a full 100x replica of
    # lineitem is minutes of write for a documents-only probe).  A
    # partial replica gets its OWN directory (sfx{k}-{tables}) so a
    # later full-probe run can never mistake it for a complete one —
    # the existing-dir early-return below is a cache hit, and a cache
    # keyed only by k would serve missing/partial tables.
    only = os.environ.get("SCALE_PROBE_TABLES")
    wanted = (None if only is None else
              sorted(t.strip() for t in only.split(",") if t.strip()))
    suffix = "" if wanted is None else "-" + "-".join(wanted)
    out = os.path.join(ROOT, f"sfx{k}{suffix}")
    # The cache hit requires the sentinel dropped AFTER the last table:
    # a run interrupted mid-write leaves a directory without it, which
    # is rebuilt instead of silently served as complete (round-9 ADVICE)
    sentinel = os.path.join(out, "_COMPLETE")
    if os.path.isdir(out):
        if os.path.exists(sentinel):
            return out
        shutil.rmtree(out)
    os.makedirs(out, exist_ok=True)
    tables = {n: c for n, c in TABLES.items()
              if wanted is None or n in wanted}
    for name, idcols in tables.items():
        src = load_table(spark, BASE, name)
        if not idcols:
            rep = src
        else:
            parts = []
            for i in range(k):
                p = src
                for c in idcols:
                    p = p.withColumn(c, F.col(c) + F.lit(i * OFFSET))
                parts.append(p)
            rep = parts[0]
            for p in parts[1:]:
                rep = rep.unionByName(p)
        rep.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
    open(sentinel, "w").close()
    return out


def timed(fn, spark, sf_dir, runs=None):
    from dask_relabeling_spark.session import release_persists
    if runs is None:
        runs = int(os.environ.get("SCALE_PROBE_RUNS", "2"))
    # SCALE_PROBE_WARM=0 skips the warmup execution: for bounded
    # one-shot probes of very heavy terminals (e.g. the raw PPJoin
    # pair set at 100x) a warmup run doubles a >10 min wall for no
    # extra information — the single measured number is then a COLD
    # figure and must be labelled as such.
    if os.environ.get("SCALE_PROBE_WARM", "1") != "0":
        fn(spark, sf_dir).count()  # warm codegen/footers
    best = None
    for _ in range(runs):
        # same methodology as bench.py: a measured run must not read
        # operator-internal caches built outside its own wall, and
        # persists must not accumulate across queries (they inflate
        # later probes' memory pressure)
        release_persists()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    release_persists()
    spark.catalog.clearCache()
    return best


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    probes = PROBES
    if os.environ.get("SCALE_PROBE_QUERIES"):
        probes = os.environ["SCALE_PROBE_QUERIES"].split(",")
    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    big = replicate(spark, k)
    rows = []
    for name in probes:
        fn, _ = REGISTRY[name]
        t1 = timed(fn, spark, BASE)
        tk = timed(fn, spark, big)
        rows.append({"query": name, "t_1x": round(t1, 2),
                     f"t_{k}x": round(tk, 2),
                     "ratio": round(tk / t1, 1)})
        print(f"# {name}: 1x={t1:.2f}s {k}x={tk:.2f}s "
              f"ratio={tk / t1:.1f}", file=sys.stderr)
    print(json.dumps({"k": k, "probes": rows}))
    if os.environ.get("SCALE_PROBE_KEEP") != "1":
        shutil.rmtree(big, ignore_errors=True)


if __name__ == "__main__":
    main()
