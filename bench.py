"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall time of the headline query set (each query
fully materialized via a count/collect action).

The multi-second flagship terminals are measured in a FRESH JVM each
(the harness re-invokes itself with $BENCH_ONLY): a round-5/6 A/B with
zero code change showed 15-50% swings on them from accumulated
JVM/GC/suite state that warmup + best-of-N inside one long-lived
session cannot remove.  Per-query spread (worst/best across measured
runs) is reported so cross-round comparisons can tell plan changes
from noise.  Set BENCH_ISOLATE=0 to force everything in-process.
"""
from __future__ import annotations

import json
import os
import signal
import subprocess
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
                                # measured time = index BUILD + query)
    "ann_ivfpq_query",          # query-only arm (round 8): warmup builds
                                # the index once per session, measured runs
                                # read only the stored codes — the serving
                                # cost a vector store pays per query
    "dedup_segment_then_prefix",  # boilerplate-aware PPJoin (round 5)
    "multimodal_y4m_frames",    # real-codec multimodal representative
                                # (round 5: pure-NumPy Y4M frame walk)
    "docs_heavy_hitters",       # mergeable-sketch representative (round 8:
                                # Misra-Gries sketch-then-verify, exact)
    # ---- round-17 ADDITIVE noop-timed twins (guide §1.4).  count()
    # on these two arms prunes the DECIMAL money aggregation entirely
    # (0 casts / 0 sums in the executed count plan), so the original
    # entries time the grouped scan, not the query.  The twins time
    # the full computation under the noop sink; the count-timed
    # originals above are unchanged for cross-round comparability.
    "q1_pricing_summary_noop",
    "broadcast_join_brand_revenue_noop",
]

# The terminals whose in-suite numbers were proven noise-dominated by
# the r5<->r6 zero-change A/B: each gets a fresh JVM and more runs.
# relabel_components/_summary joined in round 9: the r8 judge's quiet-
# box re-runs showed their in-suite numbers 2.5x above their isolated
# steady state.
ISOLATED = [
    "relabel_components",
    "relabel_components_summary",
    "relabel_annotations",
    "relabel_components_3d",
    "dedup_prefix_clusters",
    "dedup_segment_then_prefix",
]

# In-process arms whose worst/best spread exceeds this get ONE full
# re-measurement; a clean re-run replaces a noise-dominated first
# window (round-9: BENCH_r08 was load-contaminated and nothing in the
# JSON could show it).
RERUN_SPREAD = float(os.environ.get("BENCH_RERUN_SPREAD", "1.5"))


def _canary_loop(n: int) -> int:
    acc = 0
    for i in range(n):
        acc += i
    return acc


def _canary_sec(n: int = 2_000_000) -> float:
    """Pure-python CPU canary: wall seconds for a fixed integer loop.
    Load-independent of Spark — if THIS number moves between rounds,
    the box was contended and cross-round query deltas are suspect.
    BLIND SPOT (round 9): single-threaded, it only inflates once the
    box is saturated BEYOND nproc runnable threads — it stayed flat
    while load1 hit 9-11 on 32 cores, exactly the regime that
    contaminated BENCH_r08.  Kept for cross-round continuity; the
    all-core variant below and the per-arm load1/isolated_load1
    fields are the contention signals of record."""
    start = time.perf_counter()
    _canary_loop(n)
    return round(time.perf_counter() - start, 4)


# Runs in a FRESH single-threaded interpreter: forking a worker pool
# directly from this process would fork while live Py4J/Spark gateway
# threads may hold locks (import/logging), a classic child-deadlock
# (round-10 review).  The clean child forks safely.
_PAR_CANARY_CHILD = r"""
import concurrent.futures as cf
import multiprocessing
import os
import sys
import time


def loop(n):
    acc = 0
    for i in range(n):
        acc += i
    return acc


n = int(sys.argv[1])
workers = os.cpu_count() or 1
start = time.perf_counter()
with cf.ProcessPoolExecutor(
        workers, mp_context=multiprocessing.get_context("fork")) as ex:
    list(ex.map(loop, [n] * workers))
print(round(time.perf_counter() - start, 4))
"""


def _canary_par_sec(n: int = 2_000_000) -> float:
    """All-core canary: wall seconds to run the same fixed loop in
    nproc PROCESSES at once (measured inside a fresh interpreter, see
    _PAR_CANARY_CHILD).  Quiet-box baseline on this 32-core box is
    ~0.16-0.25 s (the loop's ~0.08 s plus interpreter + pool-fork
    startup — it does NOT equal the single-thread number); any other
    runnable load queues against the 32 workers and inflates it
    roughly by (nproc + external_load) / nproc, so it moves in exactly
    the sub-saturation regime the single-thread canary is blind to.
    Read it as a cross-window delta against that baseline, not as an
    absolute.  Returns -1.0 if the child failed/hung (never wedges
    the bench)."""
    try:
        out = subprocess.run(
            [sys.executable, "-c", _PAR_CANARY_CHILD, str(n)],
            capture_output=True, text=True, timeout=120)
        return float(out.stdout.strip())
    except (subprocess.TimeoutExpired, ValueError):
        return -1.0


def _warm(spark) -> None:
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


def _measure(spark, name: str, warmup_runs: int, measured_runs: int):
    """best/worst wall seconds over ``measured_runs`` + final row count.

    A ``<registry name>_noop`` arm times the SAME registry query under
    the noop sink (guide §1.4) instead of ``count()``.  Round-17
    measurement-bug fix, additive only: ``count()`` on a terminal
    aggregate lets the optimizer prune every aggregate expression the
    row count does not need — q1's executed count-plan contains ZERO
    of its seven money aggregates (verified `explain("formatted")` of
    ``df.groupBy().count()``), so the count-timed arm measures the
    grouped scan, not the query.  The original count-timed entries are
    all kept unchanged for cross-round comparability; the _noop twins
    exist only where the gap is material (see OPTIMIZATION_r17.md)."""
    noop = name.endswith("_noop") and name not in REGISTRY
    base = name[:-len("_noop")] if noop else name
    fn, _ = REGISTRY[base]

    def action(df):
        if noop:
            df.write.format("noop").mode("overwrite").save()
            return None
        return df.count()

    for _ in range(warmup_runs):  # steady-state: skip codegen/footer IO
        action(fn(spark, SF_DIR))
    # best-of-N: single-JVM runs see +/-2x GC/OS noise on this box;
    # the minimum is the reproducible steady-state cost of the plan
    best, worst, n = None, None, 0
    for _ in range(measured_runs):
        # drop blocks persisted by the warmup/previous run: a measured
        # run must not read operator-internal caches built outside
        # its own wall
        spark.catalog.clearCache()
        start = time.perf_counter()
        df = fn(spark, SF_DIR)
        n = action(df)
        dt = time.perf_counter() - start
        best = dt if best is None else min(best, dt)
        worst = dt if worst is None else max(worst, dt)
    if noop:
        n = fn(spark, SF_DIR).count()  # untimed: the rows field only
    spark.catalog.clearCache()
    release_persists()
    return best, worst, n


def _run_isolated(name: str) -> dict | None:
    """Measure ``name`` in a fresh JVM; None if the child failed.

    The child is bounded by ``BENCH_ISOLATED_TIMEOUT`` seconds (default
    600 — many multiples of the ~1 min a cold-JVM flagship terminal
    actually takes): a hung child (executor deadlock, port contention
    with the parent) must degrade to the in-process measurement, not
    wedge the whole bench (round-7 ADVICE).

    The child runs in its OWN PROCESS GROUP and a timeout SIGKILLs the
    whole group: killing only the python child would orphan the Spark
    JVM and its python workers, which keep holding ports/memory and
    contaminate the in-process fallback — the exact contention the
    timeout exists to contain (round-8 ADVICE)."""
    env = dict(os.environ, BENCH_ONLY=name)
    timeout = float(os.environ.get("BENCH_ISOLATED_TIMEOUT", "600"))
    proc = subprocess.Popen([sys.executable, os.path.abspath(__file__)],
                            env=env, stdout=subprocess.PIPE,
                            stderr=subprocess.PIPE, text=True,
                            start_new_session=True)
    try:
        out, err = proc.communicate(timeout=timeout)
    except subprocess.TimeoutExpired:
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            pass
        proc.communicate()  # reap; pipes already broken by the kill
        sys.stderr.write(f"# isolated {name}: timed out after {timeout}s; "
                         "process group killed, falling back to "
                         "in-process\n")
        return None
    if err:
        sys.stderr.write(err)
    if proc.returncode != 0:
        return None
    for line in reversed(out.strip().splitlines()):
        try:
            rec = json.loads(line)
        except ValueError:
            continue
        if rec.get("query") == name:
            return rec
    return None


def main() -> None:
    warmup_runs = int(os.environ.get("BENCH_WARMUP_RUNS", "1"))
    measured_runs = int(os.environ.get("BENCH_MEASURED_RUNS", "3"))
    isolated_runs = int(os.environ.get("BENCH_ISOLATED_RUNS", "7"))

    only = os.environ.get("BENCH_ONLY")
    if only:
        # Child mode: one query, fresh JVM, nothing else ran here.
        # Two warmups: the first run in a cold JVM still JITs the
        # query's own codegen; best-of-7 then bounds GC outliers.
        spark = get_spark(app_name=f"bench-{only}")
        spark.sparkContext.setLogLevel("ERROR")
        _warm(spark)
        best, worst, n = _measure(spark, only, max(warmup_runs, 2),
                                  isolated_runs)
        print(json.dumps({"query": only, "best": round(best, 3),
                          "worst": round(worst, 3), "rows": n,
                          "load1": round(os.getloadavg()[0], 2)}))
        return

    isolate = os.environ.get("BENCH_ISOLATE", "1") != "0"
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    timings: dict[str, float] = {}
    spread: dict[str, float] = {}
    # Load forensics (round-9: BENCH_r08 was judged load-contaminated
    # with nothing in the JSON to show it): 1/5/15-min loadavg at the
    # start and end of the window plus Spark-independent CPU canaries.
    # Interpretation: canary_par ~ canary and load1 << nproc => quiet
    # box; canary_par inflated vs canary, or load1 >~ nproc, or an
    # isolated arm's isolated_load1 >> 1 => that window was contended;
    # treat its cross-round delta as noise and re-run.  The
    # single-thread canary only moves past FULL saturation (>nproc) —
    # canary_par_sec and load1/isolated_load1 are the signals of
    # record below that (round-9 verdict item 4).
    load_start = list(os.getloadavg())
    canary_start = _canary_sec()
    canary_par_start = _canary_par_sec()

    # Fresh-JVM block FIRST, before this process opens its own session,
    # so only one JVM holds executor memory at a time.
    pending = list(HEADLINE)
    isolated_done: list[str] = []
    isolated_load1: dict[str, float] = {}
    reran: list[str] = []
    if isolate:
        for name in ISOLATED:
            rec = _run_isolated(name)
            if rec is None:  # child crashed — fall through to in-process
                continue
            sp = round(rec["worst"] / max(rec["best"], 1e-9), 3)
            if sp > RERUN_SPREAD:
                # noisy child window: one fresh JVM retry, keep the
                # cleaner window (same recovery as in-process arms)
                rec2 = _run_isolated(name)
                if rec2 is not None:
                    reran.append(name)
                    sp2 = round(rec2["worst"] / max(rec2["best"], 1e-9), 3)
                    # (best, spread) stay an atomic pair from ONE
                    # window — mixing a clean window's spread onto a
                    # noisy window's best would misrepresent the
                    # conditions the kept number was measured under
                    if rec2["best"] < rec["best"]:
                        rec, sp = rec2, sp2
            isolated_done.append(name)
            timings[name] = rec["best"]
            spread[name] = sp
            if "load1" in rec:
                isolated_load1[name] = rec["load1"]
            print(f"# {name}: {rec['best']:.3f}s ({rec['rows']} rows) "
                  f"[isolated, spread {spread[name]:.2f}x]",
                  file=sys.stderr)
            pending.remove(name)

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    _warm(spark)
    for name in pending:
        best, worst, n = _measure(spark, name, warmup_runs, measured_runs)
        timings[name] = round(best, 3)
        spread[name] = round(worst / max(best, 1e-9), 3)
        print(f"# {name}: {best:.3f}s ({n} rows) "
              f"[spread {spread[name]:.2f}x]", file=sys.stderr)

    # Noise recovery: an in-process arm whose worst/best exceeded the
    # re-run bar gets ONE more full measurement window; keep the
    # cleaner window's numbers (lower best => closer to the plan's
    # steady-state cost; the transient that inflated the first window
    # is exactly what best-of-N is defined to exclude).
    for name in [n for n in pending if spread[n] > RERUN_SPREAD]:
        best, worst, n_rows = _measure(spark, name, warmup_runs,
                                       measured_runs)
        sp = round(worst / max(best, 1e-9), 3)
        reran.append(name)
        # keep (best, spread) as a pair from whichever window won
        if best < timings[name]:
            timings[name] = round(best, 3)
            spread[name] = sp
        print(f"# {name}: rerun {best:.3f}s [spread {sp:.2f}x] -> "
              f"kept {timings[name]:.3f}s [spread {spread[name]:.2f}x]",
              file=sys.stderr)

    ordered = {name: timings[name] for name in HEADLINE}
    record = {
        "metric": "headline_suite_wall",
        "value": round(sum(ordered.values()), 3),
        "unit": "sec",
        "queries": ordered,
        "spread": {name: spread[name] for name in HEADLINE},
        "isolated": isolated_done,
        "isolated_load1": isolated_load1,
        "reran": reran,
        "loadavg": {"start": [round(x, 2) for x in load_start],
                    "end": [round(x, 2) for x in os.getloadavg()]},
        "canary_sec": {"start": canary_start, "end": _canary_sec()},
        "canary_par_sec": {"start": canary_par_start,
                           "end": _canary_par_sec()},
        "nproc": os.cpu_count(),
        "sf": float(sf),
    }
    line = json.dumps(record)
    # stdout FIRST: the durable-file write below must never be the
    # reason the record is lost entirely (round-10 review: an
    # unwritable BENCH_OUT used to raise before print)
    print(line)
    # Durable record (round-9 verdict item 1): the driver captures only
    # a bounded stdout TAIL, which truncated the head of BENCH_r09's
    # JSON (suite wall + first ~11 arms lost from the committed
    # artifact).  Write the full record to a committed file too, named
    # for the round after the latest driver BENCH artifact.  Mode "w"
    # is deliberate: the latest run wins and earlier committed records
    # stay recoverable from git history — refusing to overwrite would
    # instead lose the DRIVER's own per-round run whenever a file for
    # that round already exists.
    out_path = os.environ.get("BENCH_OUT") or None
    if out_path is None:
        import glob
        import re
        rounds = [int(m.group(1)) for p in
                  glob.glob(os.path.join(os.path.dirname(
                      os.path.abspath(__file__)), "BENCH_r*.json"))
                  if (m := re.search(r"BENCH_r(\d+)\.json$", p))]
        nxt = max(rounds, default=0) + 1
        out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                f"bench_out_r{nxt:02d}.json")
    try:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")
        print(f"# full record -> {out_path}", file=sys.stderr)
    except OSError as e:
        print(f"# durable record write FAILED ({e}); the stdout line "
              "is the only copy", file=sys.stderr)
    # Append-only window log (round-14 verdict item 4: the driver's own
    # bench run overwrote a committed gold window in bench_out_r14.json
    # — mode "w" above is the latest-window view the driver expects,
    # but every window must also survive later runs).  One line per
    # window, never truncated; clean/gold windows stay recoverable no
    # matter how many contended windows land after them.
    jsonl_path = os.path.splitext(out_path)[0] + ".jsonl"
    base = os.path.basename(jsonl_path)
    if base.startswith("bench_out_r"):
        jsonl_path = os.path.join(os.path.dirname(jsonl_path),
                                  "bench_windows_r" +
                                  base[len("bench_out_r"):])
    try:
        with open(jsonl_path, "a") as fh:
            fh.write(line + "\n")
        print(f"# window appended -> {jsonl_path}", file=sys.stderr)
    except OSError as e:
        print(f"# window-log append FAILED ({e})", file=sys.stderr)


if __name__ == "__main__":
    main()
