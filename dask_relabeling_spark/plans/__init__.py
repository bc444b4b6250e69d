"""Query registry: importing this package registers every named query.

``REGISTRY`` maps query name -> (builder(spark, sf_dir) -> DataFrame,
oracle SQL string or None for non-SQL-expressible operators).

The registry is explicitly ORDERED: the driver's correctness gate walks
entries front-to-back with a bounded budget (each round stops after 50),
so ordering IS the evidence-refresh policy:

1. entries whose implementation changed this round (fresh evidence
   required) first,
2. then any name with no green driver row ever — i.e. queries added
   this round land at the front automatically,
3. then the flagship hash row (per-round evidence for the core),
4. then everything else ordered by evidence staleness: the round of
   each entry's LATEST green driver row, ascending, so the stalest
   evidence is refreshed first.

The green sets are NOT hand-maintained: they are folded at import time
from the committed ``CORRECTNESS_r0*.json`` driver artifacts at the
repo root, so every driver round automatically advances the rotation.
"""
import glob
import json
import os
import re

from .relational import REGISTRY  # noqa: F401  (base registry)
from . import llm  # noqa: F401  (registers dedup/similarity/text/events)
from . import tile_query  # noqa: F401  (registers the tile pipeline)
from . import curation  # noqa: F401  (round-3 pipeline extensions)

# Entries whose implementation or plan changed — fresh evidence
# required, keep at the very front.  Hand-flagged as (name,
# changed_in_round) when an operator is touched; an entry EXPIRES
# AUTOMATICALLY once a committed driver artifact from that round or
# later shows it green, so the list never needs hand-cleaning (the
# round-5/6 failure mode: a stale hand list replayed fresh evidence
# while genuinely stale entries starved).
_CHANGED = [
    # (round-12 prune: every round-10 flag's post-change green landed
    # in committed CORRECTNESS_r10/r11 artifacts, so the 36 expired
    # entries are removed — per the r10/r11 verdicts, expired flags are
    # inert but bury live signal.  The expiry mechanism is unchanged;
    # future flags go here as (name, changed_in_round).)
    # round 11: the exact-quantile machinery folded its duplicate fact
    # scan into the checkpointed histogram (functions/quantiles.py) and
    # the winsorize thresholds gained inner-join all-NULL semantics
    # (plans/curation.py) — plans changed for every quantile consumer,
    # but round 11 forgot to flag them (r11 verdict item 1), so the
    # driver never replayed the evidence; flagged now.
    ("lineitem_exact_quantiles", 11),
    ("orders_price_quartiles_by_priority", 11),
    ("events_value_winsorize_counts", 11),
    ("events_anomaly_mad", 11),
    ("docs_adaptive_quality_filter", 11),
    # round 12: every embedding consumer now normalizes ill-formed
    # (NaN/Inf-component) vectors to NULL at ingestion, on both engines
    # (operators/similarity.as_vec + plans/llm._DUCK_VEC) — plans AND
    # oracles changed together, no result change on finite corpora
    ("ann_cosine_topk", 12),
    ("ann_lsh_topk", 12),
    ("ann_ivf_topk", 12),
    ("ann_ivfpq_topk", 12),
    ("ann_ivfpq_indexed", 12),
    ("ann_ivfpq_query", 12),
    ("ann_recall_panel", 12),
    ("docs_hybrid_rrf", 12),
    ("embedding_pq_codes", 12),
    ("embedding_neardup_pairs", 12),
    ("embedding_semantic_dedup", 12),
    ("embedding_kmeans", 12),
    ("embedding_label_centroids", 12),
    ("embedding_dim_stats", 12),
    # round 12 (second batch): the randomized dirty-corpus fuzz found
    # seven time-ordered event queries silently diverging on NULL
    # ts/value/user_id (engines' opposite window NULL ordering,
    # F.window's NULL-ts drop, a split predicate losing NULL ts, and
    # DuckDB ASOF matching NULL-ts left rows) — the NULL-exclusion
    # convention is now explicit on both sides of each, and asof_join
    # enforces SQL never-match semantics (also changing
    # events_asof_next_purchase's plan)
    ("events_hourly_windows", 12),
    ("events_incremental_rollup", 12),
    ("events_sessionize", 12),
    ("events_session_windows", 12),
    ("events_asof_last_click", 12),
    ("events_asof_next_purchase", 12),
    ("events_lead_lag_deltas", 12),
    ("events_value_percentiles", 12),
    # round 12 (fuzz seeds 102/103): the inline sessionize in the
    # interval-overlap join had the same NULL-ts divergence, and the
    # props-extract oracle died on malformed JSON Spark NULLs through
    ("events_session_overlap", 12),
    ("events_props_extract", 12),
    # round 13: the corrupt-payload fuzz (tools/dirty_fuzz.py --media)
    # hardened the decode kernels — per-item media_id error context
    # (operators/multimodal._loud), NULL-meta struct tolerance, and
    # loud codec rejection of zero-dim PNM/Y4M headers and size-lying
    # RIFF chunks (kernels/codecs.py).  Clean-corpus results are
    # unchanged by construction (error paths + a nullable-struct
    # guard), but every query whose mapInPandas closure re-serialized
    # is re-verified
    ("multimodal_pgm_decode", 13),
    ("multimodal_wav_decode", 13),
    ("multimodal_y4m_frames", 13),
    ("multimodal_resize", 13),
    ("multimodal_features", 13),
    # round 13 (second batch): asof_join routes never-match left rows
    # (NULL key / NULL left_ts) around the shuffle instead of hashing
    # them all into one straggler partition (r12 ADVICE item 3) — the
    # result set is identical, the plan gains a Union
    ("events_asof_last_click", 13),
    ("events_asof_next_purchase", 13),
]

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _is_green(row: dict) -> bool:
    """A driver row counts as green evidence if it hash-matched the
    oracle, OR — for entries without an ``oracle_sql`` (the driver's
    weaker rows-only check, ``hash_match`` null) — if it errored on
    neither side, the row counts matched, AND the schema did not
    diverge.  Without the rows-only arm, any future oracle-less entry
    would read as never-checked and pin itself to the front of the
    50-row budget forever, starving the rotation (round-7 ADVICE); the
    schema guard keeps a rows-match-but-schema-drifted row from
    counting as green (round-8 ADVICE)."""
    if row.get("hash_match") is True:
        return True
    return (row.get("hash_match") is None
            and row.get("rows_match") is True
            and row.get("schema_match") is not False
            and row.get("err") is None)


def _latest_green() -> dict:
    """name -> latest round number with a green driver row.

    Folded from the committed CORRECTNESS_r0*.json artifacts; files are
    walked in round order so the latest green round wins.
    """
    latest = {}
    pattern = os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json")
    for path in sorted(glob.glob(pattern)):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and _is_green(row):
                latest[name] = max(rnd, latest.get(name, 0))
    return latest


def _front(latest: dict) -> list:
    """Names needing fresh evidence, in priority order: changed entries
    whose latest green row predates the change, then never-checked
    entries, then the flagship."""
    front = [n for n, changed_round in _CHANGED
             if n in REGISTRY and latest.get(n, -1) < changed_round]
    # Anything with no green evidence at all is new this round -> front.
    front += [n for n in REGISTRY if n not in front and n not in latest]
    # Flagship hash row next: keep per-round evidence for the core.
    front += [n for n in ["relabel_components_summary"] if n not in front]
    return front


def _reorder() -> None:
    latest = _latest_green()
    front = _front(latest)
    # Stalest evidence first (ascending latest-green round); registry
    # insertion order breaks ties deterministically.
    order = list(REGISTRY)
    rest = [n for n in order if n not in front]
    rest.sort(key=lambda n: (latest.get(n, 0), order.index(n)))
    front += rest
    assert len(front) == len(REGISTRY), "reorder dropped/duplicated entries"
    snapshot = {name: REGISTRY[name] for name in front}
    REGISTRY.clear()
    REGISTRY.update(snapshot)


_reorder()

__all__ = ["REGISTRY"]
