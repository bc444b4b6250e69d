"""Query registry: importing this package registers every named query.

``REGISTRY`` maps query name -> (builder(spark, sf_dir) -> DataFrame,
oracle SQL string or None for non-SQL-expressible operators).

The registry is explicitly ORDERED: the driver's correctness gate walks
entries front-to-back with a bounded budget (rounds 1-3 each stopped
after 50), so ordering IS the evidence-refresh policy:

1. red rows and entries whose implementation changed since their last
   driver row (fresh evidence required) first,
2. then any name in no green list — i.e. queries added this round land
   at the front automatically,
3. then the flagship hash row (per-round evidence for the core),
4. then everything else ordered by evidence staleness: latest-green in
   round 1 before round 2 before round 3.
"""
from .relational import REGISTRY  # noqa: F401  (base registry)
from . import llm  # noqa: F401  (registers dedup/similarity/text/events)
from . import tile_query  # noqa: F401  (registers the tile pipeline)
from . import curation  # noqa: F401  (round-3 pipeline extensions)

# Latest round in which each entry's driver row was green (hash ✓, or
# structurally rows-only `no_oracle` with matching row count).  Sourced
# from CORRECTNESS_r0{1,2,3}.json; an entry appears once, under the
# LATEST round that checked it green.
_ROUND1_GREEN = [
    "discount_band_totals", "union_priority_mix",
    "grouped_udf_priority_stats", "top_parts_by_price",
    "nested_json_docs", "events_props_extract",
    "pivot_status_by_priority", "lineitem_price_quantiles",
    "global_sorted_orders", "cube_order_stats", "rollup_nation_region",
    "customers_without_orders", "suppliers_with_shipments",
    "parts_above_avg_price", "suppliers_per_nation_list",
    "part_name_tokens", "q5_supplier_nation_volume",
    "set_ops_customer_cohorts", "q4_late_ship_priority",
    "q13_customer_order_distribution", "q18_large_volume_orders",
    "profile_orders", "lineitem_price_stats", "part_token_positions",
    "orders_price_histogram", "events_value_anomalies",
    "grouping_sets_revenue", "ntile_customer_quartiles", "events_funnel",
    "events_user_retention_cohorts", "orders_vs_shipments_by_day",
    "events_value_percentiles", "salted_brand_revenue",
    "q6_forecast_revenue", "q7_volume_shipping", "q8_market_share",
    "q10_returned_items", "q12_late_priority_lines",
]

_ROUND2_GREEN = [
    "relabel_components_3d", "q14_promo_revenue", "q15_top_supplier",
    "q17_small_quantity_revenue", "q19_disjunctive_revenue",
    "q21_waiting_suppliers", "q22_idle_customers",
    "q2_min_cost_supplier", "q9_product_type_profit",
    "q11_important_parts", "q16_part_supplier_counts",
    "q20_excess_suppliers", "parquet_sink_roundtrip",
    "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
    "dedup_simhash", "ann_cosine_topk",
    "text_token_stats", "text_langid", "text_quality",
    "docs_bm25_search", "text_winnowing", "multimodal_metadata",
    "events_hourly_windows", "events_asof_last_click",
    "events_sessionize", "events_session_windows",
    "docs_stratified_sample", "events_hourly_gapfill",
    "dedup_cluster_canonical", "docs_pack_sequences",
    "docs_weighted_interleave", "ann_ivf_topk",
    "events_view_click_attribution", "text_repetition", "doc_chunks",
    "events_asof_next_purchase", "docs_curation_pipeline",
    "docs_deterministic_shuffle", "parts_fuzzy_name_pairs",
    "docs_contamination_check", "docs_segment_dedup",
    "events_rollup_cascade",
]

_ROUND3_GREEN = [
    "events_rolling_hour_stats", "dedup_minhash_signatures",
    "ann_lsh_topk", "text_fingerprint", "events_lead_lag_deltas",
    "docs_fixed_per_lang_sample", "docs_importance_sample",
    "text_bpe_token_stats", "events_sliding_windows",
    "embedding_neardup_pairs", "relabel_components",
    "relabel_annotations", "orders_by_year_month",
    "multimodal_features", "embedding_pq_codes", "docs_hybrid_rrf",
    "docs_unigram_logprob", "relabel_annotations_3d",
    "relabel_annotations_summary", "relabel_components_3d_interior",
    "embedding_kmeans", "docs_tfidf_cosine_pairs",
    "events_session_overlap", "docs_quality_classifier",
    "bpe_merge_candidates", "docs_incremental_dedup",
    "docs_zorder_layout", "lineitem_exact_quantiles",
    "dedup_prefix_jaccard", "orders_merge_upsert",
    "events_user_triangles", "embedding_semantic_dedup",
    "docs_bigram_logprob", "events_incremental_rollup",
    "orders_price_quartiles_by_priority", "dq_orders_constraints",
    "docs_leakage_safe_split", "events_anomaly_mad",
    "relabel_components_summary", "scan_filter_project",
    "q1_pricing_summary", "broadcast_join_brand_revenue",
    "q3_shipping_priority", "events_adjacent_pairs",
    "distinct_parts_per_flag", "top_customers_per_nation",
    "topk_orders_per_customer", "richest_supplier_per_nation",
    "word_counts",
]

# Red rows + entries whose implementation or plan changed since their
# last driver row — fresh evidence required, keep at the very front.
_CHANGED_THIS_ROUND = [
    "embedding_label_centroids",  # r2+r3 hash-fail -> integer milli out
    "embedding_kmeans",           # centroid quantization -> integer milli
    "embedding_semantic_dedup",   # fixed k=8 -> scale-true k=ceil(n/64)
    "ann_ivf_topk",               # quantizer init: id<k -> rank-based
    "embedding_pq_codes",         # same (codebook selection)
    "embedding_neardup_pairs",    # same (IVF multi-assignment centroids)
]


def _reorder() -> None:
    front = [n for n in _CHANGED_THIS_ROUND if n in REGISTRY]
    green = set(_ROUND1_GREEN) | set(_ROUND2_GREEN) | set(_ROUND3_GREEN)
    # Anything with no green evidence at all is new this round -> front.
    front += [n for n in REGISTRY if n not in front and n not in green]
    # Flagship hash row next: keep per-round evidence for the core.
    front += [n for n in ["relabel_components_summary"]
              if n not in front]
    # Stalest evidence first: round 1, then 2, then 3.
    for lst in (_ROUND1_GREEN, _ROUND2_GREEN, _ROUND3_GREEN):
        front += [n for n in lst if n in REGISTRY and n not in front]
    assert len(front) == len(REGISTRY), "reorder dropped/duplicated entries"
    snapshot = {name: REGISTRY[name] for name in front}
    REGISTRY.clear()
    REGISTRY.update(snapshot)


_reorder()

__all__ = ["REGISTRY"]
