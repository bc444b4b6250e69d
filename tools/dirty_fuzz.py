"""Seeded randomized dirty-corpus differential fuzz.

The fixed profiles in ``null_parity_sweep.py`` pin the dirty-row
classes we already know about; this tool searches for the ones we
don't.  Each seed generates a random batch of documents / embeddings /
events rows — including NULL keys, NULL timestamps, NULL/NaN/Inf
components and values, empty strings, duplicated text, ties, and
extreme magnitudes — injects them into the sf0.001 tables, and runs
every registered query against its DuckDB oracle through the sweep's
own ``run_profile`` machinery (same normalization as the driver gate).

Round-12 origin: seed 101 found SEVEN silently diverging queries in
one run — the NULL-ts/NULL-value/NULL-user_id divergence class across
the time-ordered event plans (engines' opposite window NULL ordering,
``F.window``'s NULL-ts drop, an incremental split predicate losing
NULL ts, DuckDB ASOF matching NULL-ts left rows).  All fixed with
explicit both-engine conventions; the trigger rows were then
promoted into the sweep's permanent null profile.

Usage:  python tools/dirty_fuzz.py [seed ...]    (default: 101)
Exit 1 if any seed produced a silent divergence.

MUST be run from the repo root (Spark's Python workers resolve
``dask_relabeling_spark`` via the working directory; run from
anywhere else and every Python-kernel query fails with a spurious
ModuleNotFoundError on the executor side).
"""
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import null_parity_sweep as NPS  # noqa: E402

from dask_relabeling_spark.session import get_spark  # noqa: E402

WORDS = ["the", "data", "spark", "engine", "tile", "label", "dedup",
         "corpus", "token", "quality", "straße", "İstanbul", "ΣΟΦΟΣ",
         "中文", "naïve", "", "a", "zzz"]
LANGS = ["en", "de", "tr", "el", "zh", None, ""]
SOURCES = ["web", "books", "code", None, ""]
ETYPES = ["view", "click", "purchase", None, ""]


def _sql_str(s):
    return "NULL" if s is None else "'" + s.replace("'", "''") + "'"


def gen_profile(rng: random.Random) -> dict:
    """Random dirty rows for the three injectable tables.  Ids start at
    9100000 (above the fixed profiles' 9000001+ range)."""
    docs, embs, evts = [], [], []
    for i in range(12):
        if rng.random() < 0.15:
            text = None
        else:
            text = " ".join(rng.choice(WORDS)
                            for _ in range(rng.randint(0, 30)))
            if rng.random() < 0.2:
                text = text + "  " + text  # duplication pressure
        nch = "NULL" if text is None else str(len(text))
        docs.append(f"(910000{i:02d}, {_sql_str(text)}, "
                    f"{_sql_str(rng.choice(LANGS))}, "
                    f"{_sql_str(rng.choice(SOURCES))}, {nch})")
    for i in range(8):
        kind = rng.random()
        if kind < 0.15:
            vec = "NULL"
        else:
            comps = []
            for _ in range(64):
                r = rng.random()
                if r < 0.02:
                    comps.append("NULL")
                elif r < 0.04:
                    comps.append("'NaN'::FLOAT")
                elif r < 0.05:
                    comps.append("'Infinity'::FLOAT")
                elif r < 0.15:
                    comps.append("0.0")  # tie / zero-norm pressure
                else:
                    comps.append(f"{rng.uniform(-2, 2):.6f}")
            vec = "[" + ", ".join(comps) + "]::FLOAT[]"
        lab = "NULL" if rng.random() < 0.2 else str(rng.randint(0, 4))
        embs.append(f"(910000{i:02d}, {vec}, {lab})")
    for i in range(12):
        ts = ("NULL" if rng.random() < 0.1 else
              f"TIMESTAMP '2024-01-0{rng.randint(1, 9)} "
              f"{rng.randint(0, 23):02d}:{rng.randint(0, 59):02d}:00'")
        uid = "NULL" if rng.random() < 0.15 else str(rng.randint(1, 5))
        r = rng.random()
        if r < 0.1:
            val = "NULL"
        elif r < 0.2:
            val = "0.0"
        elif r < 0.3:
            val = str(rng.choice([-1e9, 1e9, 1e-12, -0.0]))
        else:
            val = f"{rng.uniform(-100, 100):.4f}"
        props = rng.choice(['\'{"k": 1}\'', "'{}'", "NULL", "'[]'",
                            '\'{"k": null}\'', "'not json'"])
        evts.append(f"(910000{i:02d}, {ts}, {uid}, "
                    f"{_sql_str(rng.choice(ETYPES))}, {val}, {props})")
    return {"documents": docs, "embeddings": embs, "events": evts}


def main() -> int:
    seeds = [int(s) for s in sys.argv[1:]] or [101]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    any_bad = False
    for seed in seeds:
        NPS._PROFILES["fuzz"] = gen_profile(random.Random(seed))
        bad, loud, n_run = NPS.run_profile(spark, "fuzz", quiet=True)
        print(f"seed {seed}: {len(bad)} divergences, {len(loud)} loud "
              f"/ {n_run} run")
        for name, why in bad:
            any_bad = True
            print(f"  DIVERGE {name}: {why}")
        for name, se, oe in loud:
            print(f"  LOUD    {name}: spark: {str(se)[:80]} | "
                  f"oracle: {str(oe)[:80]}")
    return 1 if any_bad else 0


if __name__ == "__main__":
    sys.exit(main())
