"""Query registry: importing this package registers every named query.

``REGISTRY`` maps query name -> (builder(spark, sf_dir) -> DataFrame,
oracle SQL string or None for non-SQL-expressible operators).

The registry is explicitly ORDERED: the driver's correctness gate walks
entries front-to-back with a bounded budget (rounds 1 and 2 each
stopped after 50), so ordering IS the evidence-refresh policy:

1. never-driver-checked entries first (round 3: the 8 entries that two
   budget cut-offs starved, plus ``events_rolling_hour_stats``, whose
   only driver row is round 1's ``err`` — it was mis-listed as round-1
   green and rotated to the back, the round-2 bookkeeping bug),
2. then entries whose implementation changed since their last driver
   row (fresh evidence required),
3. then any name in neither green list — i.e. queries added this round
   land at the front automatically,
4. then the flagship hash row and stalest (round-1) evidence,
5. round-2 green entries last.
"""
from .relational import REGISTRY  # noqa: F401  (base registry)
from . import llm  # noqa: F401  (registers dedup/similarity/text/events)
from . import tile_query  # noqa: F401  (registers the tile pipeline)
from . import curation  # noqa: F401  (round-3 pipeline extensions)

# Green driver row in CORRECTNESS_r01.json (49 of its 50 rows;
# events_rolling_hour_stats was that round's `err` row and is NOT here).
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
    "events_user_retention_cohorts",
    "orders_vs_shipments_by_day", "events_value_percentiles",
    "salted_brand_revenue", "q6_forecast_revenue", "q7_volume_shipping",
    "q8_market_share", "q10_returned_items", "q12_late_priority_lines",
]

# Green (or structurally rows-only `no_oracle`) driver row in
# CORRECTNESS_r02.json — the freshest evidence, rotate to the back.
_ROUND2_GREEN = [
    "relabel_components_summary", "relabel_components",
    "relabel_components_3d", "relabel_annotations",
    "q14_promo_revenue", "q15_top_supplier",
    "q17_small_quantity_revenue", "q19_disjunctive_revenue",
    "q21_waiting_suppliers", "q22_idle_customers",
    "q2_min_cost_supplier", "q9_product_type_profit",
    "q11_important_parts", "q16_part_supplier_counts",
    "q20_excess_suppliers", "parquet_sink_roundtrip",
    "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
    "dedup_simhash", "ann_cosine_topk",
    "text_token_stats", "text_langid", "text_quality",
    "docs_bm25_search", "text_winnowing", "multimodal_metadata",
    "multimodal_features", "events_hourly_windows",
    "events_asof_last_click", "events_sessionize",
    "events_session_windows", "docs_stratified_sample",
    "events_hourly_gapfill", "dedup_cluster_canonical",
    "docs_pack_sequences", "docs_weighted_interleave", "ann_ivf_topk",
    "events_view_click_attribution", "text_repetition", "doc_chunks",
    "events_asof_next_purchase", "docs_curation_pipeline",
    "docs_deterministic_shuffle", "parts_fuzzy_name_pairs",
    "docs_contamination_check", "docs_segment_dedup",
    "events_rollup_cascade",
]

# Implementation or plan changed since the last driver row — fresh
# evidence required even though a (stale/red) row exists.
_CHANGED_THIS_ROUND = [
    "embedding_label_centroids",  # r2 hash-fail -> decimal exact sum
    "embedding_neardup_pairs",    # brute-force -> bucketed candidates
    "relabel_components",         # 2D mask thinned (contract at sf0.1)
    "relabel_annotations",        # same thinned 2D mask
    "orders_by_year_month",       # boundary avg -> exact integer round
    "multimodal_features",        # rows-only -> real byte-arith oracle
]

# Never driver-checked: starved by two 50-entry budget cut-offs.
_NEVER_CHECKED = [
    "events_rolling_hour_stats",   # r1 err row; fix landed r2, unproven
    "dedup_minhash_signatures",
    "ann_lsh_topk",
    "text_fingerprint",
    "events_lead_lag_deltas",
    "docs_fixed_per_lang_sample",
    "docs_importance_sample",
    "text_bpe_token_stats",
    "events_sliding_windows",
]


def _reorder() -> None:
    front = [n for n in _NEVER_CHECKED if n in REGISTRY]
    front += [n for n in _CHANGED_THIS_ROUND if n in REGISTRY]
    # Anything not in a green list is new this round -> front.
    front += [n for n in REGISTRY
              if n not in front and n not in _ROUND1_GREEN
              and n not in _ROUND2_GREEN]
    # Flagship hash row next: keep per-round evidence for the core.
    front += ["relabel_components_summary"]
    # Stalest evidence (round 1) before freshest (round 2).
    front += [n for n in _ROUND1_GREEN
              if n in REGISTRY and n not in front]
    front += [n for n in _ROUND2_GREEN
              if n in REGISTRY and n not in front]
    assert len(front) == len(REGISTRY), "reorder dropped/duplicated entries"
    snapshot = {name: REGISTRY[name] for name in front}
    REGISTRY.clear()
    REGISTRY.update(snapshot)


_reorder()

__all__ = ["REGISTRY"]
