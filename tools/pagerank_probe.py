"""Non-vacuous PageRank scale probe (round-4 verdict item).

The shared ``scale_probe.py`` replication offsets user ids per replica
but keeps timestamps, so every (event_type, hour) co-occurrence group
gains Kx members and the ``max_group`` hub guard empties the graph —
the 10x row measured an empty pipeline.  This probe grows the graph
ORGANICALLY instead: each replica's events are shifted to a disjoint
year (replica index recovered from the user-id offset), so groups keep
their 1x sizes while there are Kx more of them — Kx more users, ~Kx
more edges, and the guard never fires differently than at 1x.  What's
measured is therefore the actual per-iteration cost shape: one keyed
equi-join + partial+final sum over a Kx edge list, n_iter times.

Usage: python tools/pagerank_probe.py [K]   (expects .scratch/sfx{K}
from scale_probe.py with SCALE_PROBE_KEEP=1; K defaults to 10)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dask_relabeling_spark.operators.graph import (  # noqa: E402
    cooccurrence_edges, pagerank_scaled)
from dask_relabeling_spark.session import (  # noqa: E402
    get_spark, release_persists)
from dask_relabeling_spark.sources.tables import load_table  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OFFSET = 100_000_000  # scale_probe.py's per-replica id offset


def run(events, runs: int = 2):
    edges = cooccurrence_edges(events)          # default max_group=20
    n_edges = edges.count()
    best = None
    for _ in range(runs):
        t0 = time.perf_counter()
        n_rows = pagerank_scaled(edges, n_iter=3).count()
        dt = time.perf_counter() - t0
        release_persists()
        best = dt if best is None else min(best, dt)
    return n_edges, n_rows, best


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    big = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".scratch", f"sfx{k}")
    if not os.path.isdir(big):
        sys.exit(f"missing {big}: run scale_probe.py {k} with "
                 "SCALE_PROBE_KEEP=1 first")
    spark = get_spark(app_name="pagerank-probe")
    spark.sparkContext.setLogLevel("ERROR")

    ev1 = load_table(spark, BASE, "events")
    evk = load_table(spark, big, "events").withColumn(
        "ts", F.expr(f"timestampadd(DAY, CAST(user_id div {OFFSET} "
                     "AS INT) * 400, ts)"))
    e1, r1, t1 = run(ev1)
    ek, rk, tk = run(evk)
    print(json.dumps({
        "k": k,
        "edges_1x": e1, "edges_kx": ek,
        "vertices_1x": r1, "vertices_kx": rk,
        "t_1x": round(t1, 2), "t_kx": round(tk, 2),
        "ratio": round(tk / t1, 1)}))


if __name__ == "__main__":
    main()
