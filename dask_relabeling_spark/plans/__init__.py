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
    # (round-16 prune, standing discipline: all 20 round-15 flags'
    # post-change greens landed in the committed CORRECTNESS_r15.json
    # artifact, so the expired tuples are removed — expired flags are
    # inert but bury live signal.)
    # round 16 (verdict item 1): the ~25 TPC-H monetary round sites in
    # plans/relational.py converted to the finite-only DECIMAL(27,9)
    # convention (dec_sum/dec_min/dec_max/dec_avg/dec_round helpers;
    # oracles in lockstep via the _dsum/_davg/_dround fragments).  The
    # r15 deferral is closed: group sums of 4-decimal products tie at
    # true half-cents, where the engines' DOUBLE rounds split
    # (measured scale-2 splitters: 2.175, 0.145, ... — ~6 % of
    # 3-decimal halves); min/max/avg/percentile sites over salted
    # sub-cent monetary columns carry the same exposure, and the
    # q18/q20 HAVING thresholds now compare exact DECIMAL sums.  Also
    # in the batch: orders_by_year_month's double->DECIMAL(18,2) cent
    # cast (a scale-2 round that splits on sub-cent prices — now
    # routed DEC(27,9)->round->DEC(18,2), plus floored division
    # spelled via positive-mod because Spark DIV truncates where
    # DuckDB // floors), and the q8/q14 ratios recomputed as
    # exact-DECIMAL-sum quotients with one deterministic division.
    ("q1_pricing_summary", 16),
    ("q3_shipping_priority", 16),
    ("broadcast_join_brand_revenue", 16),
    ("salted_brand_revenue", 16),
    ("discount_band_totals", 16),
    ("grouped_udf_priority_stats", 16),
    ("pivot_status_by_priority", 16),
    ("lineitem_price_quantiles", 16),
    ("cube_order_stats", 16),
    ("q18_large_volume_orders", 16),
    ("profile_orders", 16),
    ("q5_supplier_nation_volume", 16),
    ("q6_forecast_revenue", 16),
    ("q7_volume_shipping", 16),
    ("q8_market_share", 16),
    ("q10_returned_items", 16),
    ("q14_promo_revenue", 16),
    ("q15_top_supplier", 16),
    ("q17_small_quantity_revenue", 16),
    ("q19_disjunctive_revenue", 16),
    ("q22_idle_customers", 16),
    ("grouping_sets_revenue", 16),
    ("parquet_sink_roundtrip", 16),
    ("q2_min_cost_supplier", 16),
    ("q9_product_type_profit", 16),
    ("q11_important_parts", 16),
    ("q20_excess_suppliers", 16),
    ("orders_by_year_month", 16),
    # round 16 (ADVICE): avg_top_decile now divides the exact DECIMAL
    # sum by the finite count (deterministic across accumulation
    # orders) instead of casting a full-precision double avg
    ("events_value_percentiles", 16),
    # round 16 (optimization): the tile exchanges now ride the salted
    # operator-placed repartition (operators/halo.apply_by_tile_key) —
    # plan changed on every relabel query, results byte-identical
    ("relabel_components", 16),
    ("relabel_components_summary", 16),
    ("relabel_components_3d", 16),
    ("relabel_annotations", 16),
    ("relabel_annotations_3d", 16),
    ("relabel_annotations_summary", 16),
    ("relabel_components_3d_interior", 16),
    ("relabel_annotations_3d_summary", 16),
    ("relabel_annotations_tile_interior_counts", 16),
    ("relabel_annotations_3d_tile_counts", 16),
    ("relabel_sorted_label_stats", 16),
    # round 16 (optimization): IVF-PQ index build fused into one corpus
    # pass (operators/similarity.build_ivfpq_index)
    ("ann_ivfpq_indexed", 16),
    ("ann_ivfpq_query", 16),
    ("ann_ivfpq_topk", 16),
    # round 16 (optimization): PPJoin prefix + verify-side byid tables
    # scoped-persisted (operators/dedup.prefix_filtered_jaccard_pairs)
    ("dedup_prefix_jaccard", 16),
    ("dedup_prefix_clusters", 16),
    ("dedup_segment_then_prefix", 16),
    # round 16 (optimization): prefix-table sz rides the rk window's
    # sort (one Sort instead of two) and the segment winner is a
    # hash-aggregable DECIMAL pack instead of min(struct) — plans
    # changed, results value-identical (operators/dedup.py)
    ("docs_segment_dedup", 16),
    # round 16 (optimization, session 4): connected_components'
    # per-iteration localCheckpoint is now lazy (the convergence
    # aggregate materializes it — one job per iteration instead of
    # two) and the IVF-PQ probe selection + ADC table ride ONE
    # metadata job instead of two driver actions; results identical
    # (parity pinned in tests/test_similarity.py and
    # tests/test_r16_sortcuts.py), job counts 9->6 (ivfpq query) and
    # 37->34 (prefix clusters).  The already-flagged ann_ivfpq_* and
    # dedup_*prefix* rows above cover the other affected entries.
    ("dedup_cluster_canonical", 16),
    ("ann_recall_panel", 16),
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
