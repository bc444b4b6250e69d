"""Plan-hazard ratchet: every registered query's physical plan is swept
for single-partition exchanges, cartesian products, and nested-loop
joins.  The allowlist below enumerates the queries where the pattern is
legitimate (single-row scalar subqueries, global aggregates whose final
exchange carries one partial row per partition, two-phase prefix-sum
partition totals bounded by partition count, tiny-broadcast nested
loops, and the documented brute-force near-dup baseline).  A NEW query
introducing any of these patterns fails here until it is explicitly
reviewed and listed — the hazards can only shrink, never silently grow.
"""
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"

# query -> why the pattern is bounded (not a data-path funnel)
ALLOWED_SINGLE_PARTITION = {
    "q6_forecast_revenue": "single-row global aggregate",
    "q14_promo_revenue": "single-row global aggregate",
    "q19_disjunctive_revenue": "single-row global aggregate",
    "profile_orders": "two-row profile aggregate",
    "events_funnel": "single-row funnel aggregate",
    "q15_top_supplier": "scalar max-revenue subquery",
    "q17_small_quantity_revenue": "scalar avg subquery",
    "q22_idle_customers": "scalar avg subquery",
    "q11_important_parts": "scalar total-value subquery",
    "events_hourly_gapfill": "scalar min/max span aggregate",
    "orders_price_histogram": "scalar min/max stats pass",
    "docs_pack_sequences": "prefix-sum partition totals (~#partitions rows)",
    "docs_deterministic_shuffle": "prefix-sum partition totals",
    "ntile_customer_quartiles": "prefix-sum partition totals + global count",
    "docs_bm25_search": "1-row corpus-stats aggregate (N, avg_len)",
    "docs_hybrid_rrf":
        "BM25 arm's 1-row stats aggregate + fusion of two <=20-row "
        "rank frames (arm outputs are TakeOrderedAndProject-bounded)",
    "docs_unigram_logprob": "1-row corpus-total aggregate",
    "embedding_kmeans":
        "1-row packed-centroid aggregate per iteration (k*dim numbers, "
        "data-independent size)",
    "docs_tfidf_cosine_pairs": "1-row corpus-count aggregate",
    "events_session_overlap":
        "top-3 busiest-hours limit over the hour-grid aggregate: the "
        "exchange carries <=3 rows per partition (LocalLimit first), "
        "never event rows",
    "lineitem_exact_quantiles":
        "prefix-sum partition totals (~#partitions rows) + 1-row "
        "global count",
    "embedding_semantic_dedup":
        "k-means arm's 1-row packed-centroid aggregate per iteration",
    "events_value_winsorize_counts":
        "prefix-sum partition totals + 1-row global count + 1-row "
        "p01/p99 threshold aggregate (exact-quantile machinery)",
    "ann_ivfpq_topk":
        "1-row packed ADC-table aggregate (n_sub*n_codes doubles, "
        "data-independent size)",
    "ann_ivfpq_indexed":
        "same 1-row ADC-table aggregate as ann_ivfpq_topk (the stored "
        "codebook is n_codes rows; the candidate scan itself is "
        "partition-pruned and never single-partition)",
    "docs_negative_samples": "1-row corpus-count aggregate",
    "ann_recall_panel":
        "inherits the arms' 1-row aggregates (ADC table, hit counts) — "
        "all data-independent sizes",
    "relabel_sorted_label_stats":
        "1-row global label-stats aggregate (one partial row per "
        "partition) + dense_ids prefix-sum partition totals",
    "docs_adaptive_quality_filter":
        "prefix-sum partition totals + 1-row global count + 1-row "
        "p25 threshold aggregate (exact-quantile machinery)",
    "ann_ivfpq_query":
        "same 1-row ADC-table aggregate as ann_ivfpq_indexed (query-"
        "only arm over the same stored index)",
}

ALLOWED_NESTED_LOOP = {
    "q22_idle_customers": "1-row scalar broadcast",
    "q11_important_parts": "1-row scalar broadcast",
    "events_hourly_gapfill": "dense-grid sequence cross (broadcast-tiny)",
    "orders_price_histogram": "1-row stats broadcast",
    "ntile_customer_quartiles": "1-row count broadcast",
    "ann_ivf_topk": "centroid-set broadcast (n_centroids rows)",
    "docs_bm25_search": "1-row corpus-stats broadcast (N, avg_len)",
    "embedding_neardup_pairs":
        "centroid-set broadcast (n_centroids rows) for IVF assignment",
    "embedding_pq_codes": "codebook broadcast (n_centroids rows)",
    "docs_hybrid_rrf": "1-row BM25 stats broadcast",
    "docs_unigram_logprob": "1-row corpus-total broadcast",
    "embedding_kmeans": "1-row packed-centroid broadcast per iteration",
    "docs_tfidf_cosine_pairs": "1-row corpus-count broadcast",
    "lineitem_exact_quantiles":
        "4-row quantile-rank broadcast against the value histogram",
    "embedding_semantic_dedup":
        "k-means arm's 1-row packed-centroid broadcast per iteration",
    "orders_price_quartiles_by_priority":
        "3-row quantile-spec broadcast against the group-sizes table",
    "events_anomaly_mad":
        "1-row quantile-spec broadcast per grouped-median pass",
    "events_value_winsorize_counts":
        "2-row quantile-rank broadcast + 1-row threshold broadcast "
        "against the events scan",
    "ann_ivfpq_topk":
        "centroid/codebook broadcasts (n_centroids + n_codes rows) + "
        "1-row ADC table broadcast",
    "ann_ivfpq_indexed":
        "stored-codebook x 1-row query broadcast + 1-row ADC table "
        "broadcast over the pruned (id, code) scan",
    "docs_negative_samples": "1-row corpus-count broadcast",
    "ann_recall_panel":
        "inherits the arms' centroid/codebook/ADC-table broadcasts",
    "docs_adaptive_quality_filter":
        "1-row quantile-rank broadcast + 1-row p25 threshold broadcast "
        "against the score table",
    "ann_ivfpq_query":
        "same stored-codebook/ADC-table broadcasts as ann_ivfpq_indexed "
        "over the pruned (id, code) scan",
    "docs_heavy_hitters":
        "1-row stream-length broadcast (the MG sentinel total) against "
        "the <=k-candidate exact-count frame",
}

ALLOWED_SINGLE_PARTITION.update({
    "dq_orders_constraints":
        "1-row multi-constraint audit aggregate + 1-row orphan count",
})

ALLOWED_CARTESIAN: dict = {}


def test_no_new_plan_hazards(spark):
    hazards = []
    for name, fn in entry_mod.queries().items():
        plan = fn(spark, SF_DIR)._jdf.queryExecution() \
            .executedPlan().toString()
        if ("Exchange SinglePartition" in plan
                and name not in ALLOWED_SINGLE_PARTITION):
            hazards.append((name, "Exchange SinglePartition"))
        if ("BroadcastNestedLoopJoin" in plan
                and name not in ALLOWED_NESTED_LOOP):
            hazards.append((name, "BroadcastNestedLoopJoin"))
        if "CartesianProduct" in plan and name not in ALLOWED_CARTESIAN:
            hazards.append((name, "CartesianProduct"))
    assert not hazards, (
        f"new plan hazards (review, fix or allowlist): {hazards}")
