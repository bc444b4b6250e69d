"""A/B the PPJoin POSITIONAL filter's candidate reduction.

Runs the candidate stage of
``operators.dedup.prefix_filtered_jaccard_pairs`` twice — with and
without the positional predicate — through the operator's OWN shared
helpers (``_ppjoin_prefix_table`` / ``_ppjoin_candidates`` /
``_ppjoin_verify``), so the rig cannot drift from the shipped stage.
Reports distinct candidate pairs and the wall for candidates+verify of
each variant, and ASSERTS the losslessness invariant: both variants
must verify to the identical final pair count.

Usage: python tools/ppjoin_filter_ab.py [sf_dir]
(default: the 10x replica at .scratch/sfx10-documents left by
``SCALE_PROBE_KEEP=1 SCALE_PROBE_TABLES=documents tools/scale_probe.py
10``, falling back to the full .scratch/sfx10)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dask_relabeling_spark.operators.dedup import (  # noqa: E402
    _distinct_shingle_table, _ppjoin_candidates, _ppjoin_prefix_table,
    _ppjoin_verify)
from dask_relabeling_spark.session import (  # noqa: E402
    get_spark, release_persists, scoped_persist)
from dask_relabeling_spark.sources.tables import load_table  # noqa: E402

NUM, DEN = 4, 5  # the registered queries' 0.8 Jaccard threshold


def _default_sf_dir() -> str:
    scratch = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".scratch")
    for d in ("sfx10-documents", "sfx10"):
        p = os.path.join(scratch, d)
        # require scale_probe's completion sentinel: a replica whose
        # write was interrupted mid-table would otherwise yield A/B
        # walls and pair counts measured on a truncated corpus
        # (round-10 review; same failure class the sentinel was
        # added for)
        if os.path.isdir(p) and os.path.exists(
                os.path.join(p, "_COMPLETE")):
            return p
    sys.exit("no complete 10x documents replica under .scratch "
             "(run: SCALE_PROBE_KEEP=1 SCALE_PROBE_TABLES=documents "
             "python tools/scale_probe.py 10), or pass sf_dir")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else _default_sf_dir()
    spark = get_spark(app_name="ppjoin-filter-ab")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    # Warmup: run the whole candidates+verify stage once untimed (the
    # cheap positional arm) so JVM/codegen/parquet-footer startup is
    # paid before either timed arm — previously prefix_only always ran
    # first in a cold JVM and the startup cost biased the reported
    # wall-time improvement toward the positional arm (round-9 ADVICE;
    # the collision/pair COUNTS were never affected).
    warm_toks = scoped_persist(
        _distinct_shingle_table(docs, "doc_id", "text", 3)
        .withColumnRenamed("sh", "tok"))
    warm_prefix = _ppjoin_prefix_table(warm_toks, NUM, DEN)
    _ppjoin_verify(_ppjoin_candidates(warm_prefix, NUM, DEN),
                   warm_toks, NUM, DEN).count()
    release_persists()
    spark.catalog.clearCache()
    out: dict = {"sf_dir": sf_dir}
    finals = {}
    for positional in (False, True):
        key = "positional" if positional else "prefix_only"
        toks = scoped_persist(
            _distinct_shingle_table(docs, "doc_id", "text", 3)
            .withColumnRenamed("sh", "tok"))
        prefix = _ppjoin_prefix_table(toks, NUM, DEN)
        t0 = time.perf_counter()
        cand = _ppjoin_candidates(prefix, NUM, DEN, positional=positional)
        pairs = cand.count()
        final = _ppjoin_verify(cand, toks, NUM, DEN).count()
        wall = round(time.perf_counter() - t0, 2)
        finals[key] = final
        out[key] = {"candidate_pairs": pairs, "final_pairs": final,
                    "wall_sec": wall}
        release_persists()
        spark.catalog.clearCache()
    assert finals["positional"] == finals["prefix_only"], (
        "LOSSY: positional filter changed the verified pair count "
        f"({finals})")
    out["lossless"] = True
    print(json.dumps(out))


if __name__ == "__main__":
    main()
