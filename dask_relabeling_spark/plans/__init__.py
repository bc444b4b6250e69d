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
# from CORRECTNESS_r0{1,2,3,4}.json; an entry appears once, under the
# LATEST round that checked it green.
_ROUND1_GREEN = [
    "events_funnel", "events_user_retention_cohorts",
    "orders_vs_shipments_by_day", "events_value_percentiles",
    "salted_brand_revenue", "q6_forecast_revenue", "q7_volume_shipping",
    "q8_market_share", "q10_returned_items", "q12_late_priority_lines",
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
    "docs_weighted_interleave",
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
    "relabel_components",
    "relabel_annotations", "orders_by_year_month",
    "multimodal_features", "docs_hybrid_rrf",
    "docs_unigram_logprob", "relabel_annotations_3d",
    "relabel_annotations_summary", "relabel_components_3d_interior",
    "docs_tfidf_cosine_pairs",
    "events_session_overlap", "docs_quality_classifier",
    "bpe_merge_candidates", "docs_incremental_dedup",
    "docs_zorder_layout", "lineitem_exact_quantiles",
    "dedup_prefix_jaccard", "orders_merge_upsert",
    "events_user_triangles",
    "docs_bigram_logprob", "events_incremental_rollup",
    "orders_price_quartiles_by_priority", "dq_orders_constraints",
    "docs_leakage_safe_split", "events_anomaly_mad",
    "scan_filter_project",
    "q1_pricing_summary", "broadcast_join_brand_revenue",
    "q3_shipping_priority", "events_adjacent_pairs",
    "distinct_parts_per_flag", "top_customers_per_nation",
    "topk_orders_per_customer", "richest_supplier_per_nation",
    "word_counts",
]

_ROUND4_GREEN = [
    "ann_ivf_topk", "ann_ivfpq_topk", "ann_recall_panel",
    "cube_order_stats", "customers_without_orders",
    "dedup_prefix_clusters", "discount_band_totals",
    "docs_adaptive_quality_filter", "docs_duplicate_spans",
    "docs_gdpr_purge", "docs_negative_samples", "embedding_dim_stats",
    "embedding_kmeans", "embedding_label_centroids",
    "embedding_neardup_pairs", "embedding_pq_codes",
    "embedding_semantic_dedup", "events_hll_distinct_users",
    "events_props_extract", "events_user_pagerank",
    "events_value_anomalies", "events_value_winsorize_counts",
    "global_sorted_orders", "grouped_udf_priority_stats",
    "grouping_sets_revenue", "lineitem_price_quantiles",
    "lineitem_price_stats", "nested_json_docs",
    "ntile_customer_quartiles", "orders_price_histogram",
    "part_name_tokens", "part_token_positions", "parts_above_avg_price",
    "pivot_status_by_priority", "profile_orders",
    "q13_customer_order_distribution", "q18_large_volume_orders",
    "q4_late_ship_priority", "q5_supplier_nation_volume",
    "relabel_annotations_3d_summary", "relabel_annotations_3d_tile_counts",
    "relabel_annotations_tile_interior_counts",
    "relabel_components_summary", "relabel_sorted_label_stats",
    "rollup_nation_region", "set_ops_customer_cohorts",
    "suppliers_per_nation_list", "suppliers_with_shipments",
    "top_parts_by_price", "union_priority_mix",
]

# Red rows + entries whose implementation or plan changed since their
# last driver row — fresh evidence required, keep at the very front.
# (Round 5: populated as operators are touched this round.)
_CHANGED_THIS_ROUND = [
    "embedding_pq_codes",     # pack centroid RANK, not raw cid (ADVICE)
    "ann_ivfpq_topk",         # ADC lookup keyed by rank, not cid value
    "ann_recall_panel",       # downstream of the rank-keyed codes
    "embedding_kmeans",       # cluster label stays LONG (no INT cast)
    "embedding_semantic_dedup",  # downstream of the LONG kmeans label
    "events_user_pagerank",   # dir_e/deg cached; no extra lineage scan
    "relabel_annotations",    # rows-only -> full parity-ownership oracle
    "docs_segment_dedup",     # segment_dedup grew the out_text path
    "dedup_prefix_jaccard",   # PPJoin candidate join grew the lossless
    "dedup_prefix_clusters",  # length filter (min*den >= max*num)
    "relabel_components_3d",  # rows-only -> parity-ownership oracle
    "relabel_annotations_3d",  # rows-only -> parity-ownership oracle
]


def _reorder() -> None:
    front = [n for n in _CHANGED_THIS_ROUND if n in REGISTRY]
    green = (set(_ROUND1_GREEN) | set(_ROUND2_GREEN)
             | set(_ROUND3_GREEN) | set(_ROUND4_GREEN))
    # Anything with no green evidence at all is new this round -> front.
    front += [n for n in REGISTRY if n not in front and n not in green]
    # Flagship hash row next: keep per-round evidence for the core.
    front += [n for n in ["relabel_components_summary"]
              if n not in front]
    # Stalest evidence first: round 1, then 2, then 3, then 4.
    for lst in (_ROUND1_GREEN, _ROUND2_GREEN, _ROUND3_GREEN,
                _ROUND4_GREEN):
        front += [n for n in lst if n in REGISTRY and n not in front]
    assert len(front) == len(REGISTRY), "reorder dropped/duplicated entries"
    snapshot = {name: REGISTRY[name] for name in front}
    REGISTRY.clear()
    REGISTRY.update(snapshot)


_reorder()

__all__ = ["REGISTRY"]
