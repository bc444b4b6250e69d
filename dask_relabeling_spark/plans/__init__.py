"""Query registry: importing this package registers every named query.

``REGISTRY`` maps query name -> (builder(spark, sf_dir) -> DataFrame,
oracle SQL string or None for non-SQL-expressible operators).

The registry is explicitly ORDERED: the driver's correctness gate walks
entries front-to-back with a bounded budget (round 1 stopped after 50),
so queries that have never received a driver-side correctness row are
rotated to the front.  Round-1 green entries (CORRECTNESS_r01.json) sit
at the back; within the never-checked block, the flagship tile pipeline
comes first, then one representative per operator family, with
family-redundant variants (a second ANN index, a second fingerprinting
scheme, ...) last so a budget cut-off still covers every family.
"""
from .relational import REGISTRY  # noqa: F401  (base registry)
from . import llm  # noqa: F401  (registers dedup/similarity/text/events)
from . import tile_query  # noqa: F401  (registers the tile pipeline)

# Names with a green driver row in round 1 — rotate to the back.
_ROUND1_GREEN = [
    "scan_filter_project", "q1_pricing_summary",
    "broadcast_join_brand_revenue", "q3_shipping_priority",
    "events_adjacent_pairs", "distinct_parts_per_flag",
    "top_customers_per_nation", "topk_orders_per_customer",
    "richest_supplier_per_nation", "word_counts", "discount_band_totals",
    "union_priority_mix", "grouped_udf_priority_stats",
    "top_parts_by_price", "nested_json_docs", "events_props_extract",
    "pivot_status_by_priority", "lineitem_price_quantiles",
    "global_sorted_orders", "cube_order_stats", "rollup_nation_region",
    "customers_without_orders", "suppliers_with_shipments",
    "parts_above_avg_price", "suppliers_per_nation_list",
    "orders_by_year_month", "part_name_tokens",
    "q5_supplier_nation_volume", "set_ops_customer_cohorts",
    "q4_late_ship_priority", "q13_customer_order_distribution",
    "q18_large_volume_orders", "profile_orders", "lineitem_price_stats",
    "part_token_positions", "orders_price_histogram",
    "events_value_anomalies", "grouping_sets_revenue",
    "ntile_customer_quartiles", "events_funnel",
    "events_user_retention_cohorts", "events_rolling_hour_stats",
    "orders_vs_shipments_by_day", "events_value_percentiles",
    "salted_brand_revenue", "q6_forecast_revenue", "q7_volume_shipping",
    "q8_market_share", "q10_returned_items", "q12_late_priority_lines",
]

# Never-driver-checked entries whose family already has an earlier
# representative — safe to lose to a budget cut-off.
_FAMILY_REDUNDANT = [
    "dedup_minhash_signatures",  # family rep: dedup_minhash_lsh
    "ann_lsh_topk",              # family reps: ann_cosine_topk, ann_ivf_topk
    "text_fingerprint",          # family rep: text_winnowing
    "events_lead_lag_deltas",    # family rep: events_sliding_windows
    "docs_fixed_per_lang_sample",  # family rep: docs_stratified_sample
    "docs_importance_sample",      # family rep: docs_stratified_sample
    "text_bpe_token_stats",        # family rep: text_token_stats
    "events_sliding_windows",      # family reps: events_hourly_windows,
                                   # events_session_windows
]

# Flagship first: the tile-relabeling pipeline is the reference's core.
# The summary variant leads — it is the one flagship entry with a full
# SQL oracle (recursive-CTE CCL replay), i.e. the hash-checked row.
_FLAGSHIP = ["relabel_components_summary", "relabel_components",
             "relabel_components_3d", "relabel_annotations"]


def _reorder() -> None:
    front = list(_FLAGSHIP)
    front += [n for n in REGISTRY
              if n not in front and n not in _ROUND1_GREEN
              and n not in _FAMILY_REDUNDANT]
    front += [n for n in _FAMILY_REDUNDANT if n in REGISTRY]
    front += [n for n in _ROUND1_GREEN if n in REGISTRY]
    assert len(front) == len(REGISTRY), "reorder dropped/duplicated entries"
    snapshot = {name: REGISTRY[name] for name in front}
    REGISTRY.clear()
    REGISTRY.update(snapshot)


_reorder()

__all__ = ["REGISTRY"]
