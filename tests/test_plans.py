"""Physical-plan regression tests: the scale-critical plan properties
(pushdown, broadcast, map-side partial aggregation, semi joins) must not
silently regress.  These read `.explain` output — no data is moved."""
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"


def plan_of(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_scan_pushdown_and_pruning(spark):
    plan = plan_of(spark, "scan_filter_project")
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    # column pruning: the scan must not read the full 11-column lineitem
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "l_comment" not in scan and "l_partkey" not in scan


def test_broadcast_small_dims(spark):
    plan = plan_of(spark, "q5_supplier_nation_volume")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_partial_aggregation_map_side(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    assert "partial_sum" in plan or "partial_count" in plan


def test_semi_join_not_inner_explosion(spark):
    plan = plan_of(spark, "q4_late_ship_priority")
    assert "LeftSemi" in plan
    # the range predicate must ride the equi-join as a residual, never a
    # cartesian/nested-loop over orders x lineitem
    assert "CartesianProduct" not in plan


def test_gapfill_streams_big_table_once(spark):
    plan = plan_of(spark, "events_hourly_gapfill")
    # the raw events scan feeds exactly one shuffling aggregate; the dense
    # grid joins via broadcast
    assert "BroadcastHashJoin" in plan
    assert plan.count("FileScan parquet") == 3  # span, types, agg branches
    assert "SortMergeJoin" not in plan


def test_lsh_pairs_never_cross_join(spark):
    plan = plan_of(spark, "dedup_minhash_lsh")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.parametrize("name", ["dedup_exact", "word_counts",
                                  "dedup_simhash", "ann_cosine_topk"])
def test_no_single_partition_exchange(spark, name):
    plan = plan_of(spark, name)
    assert "Exchange SinglePartition" not in plan


def test_ann_topk_is_take_ordered_not_global_window(spark):
    """Brute-force cosine top-k must rank via TakeOrderedAndProject (a
    per-partition bounded heap), never by funnelling the whole scored
    corpus through a global no-partition window."""
    plan = plan_of(spark, "ann_cosine_topk")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange SinglePartition" not in plan


def test_grouping_sets_single_expand_scan(spark):
    plan = plan_of(spark, "grouping_sets_revenue")
    # the three grouping sets must come from ONE Expand over one joined
    # scan, not a UNION ALL re-reading orders per grouping
    assert "Expand" in plan
    scan = [l for l in plan.splitlines()
            if "FileScan parquet" in l and "orders" in l]
    assert len(scan) == 1
    assert "SortMergeJoin" not in plan  # all dims broadcast


def test_retention_single_events_shuffle(spark):
    plan = plan_of(spark, "events_user_retention_cohorts")
    # one user-keyed exchange for the combined min/collect_set agg, one
    # tiny final agg exchange — no join back onto the events table
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 2


def test_rolling_window_no_self_join(spark):
    plan = plan_of(spark, "events_rolling_hour_stats")
    # RANGE frame = per-partition sliding evaluation, not an interval
    # self-join fan-out
    assert "Join" not in plan
    assert "Window" in plan
    assert "Exchange SinglePartition" not in plan


def test_funnel_single_scan(spark):
    plan = plan_of(spark, "events_funnel")
    assert "Join" not in plan
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert len(scans) == 1


def test_curation_pipeline_single_scan_one_shuffle(spark):
    plan = plan_of(spark, "docs_curation_pipeline")
    assert "Join" not in plan
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert len(scans) == 1
    assert plan.count("Exchange hashpartitioning") == 1


def test_salted_join_spreads_without_plan_regression(spark):
    plan = plan_of(spark, "salted_brand_revenue")
    # the salt must ride the equi-join key (hash join on key+_salt), and
    # the dim replication must not become a nested-loop/cartesian
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Exchange SinglePartition" not in plan


def test_q8_single_fact_shuffle(spark):
    """q8 keeps every dimension on the broadcast path — exactly ONE hash
    exchange (the final aggregation); a SortMergeJoin here means a dim
    fell off the broadcast path."""
    plan = plan_of(spark, "q8_market_share")
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("BroadcastHashJoin") >= 5


def test_q7_prunes_both_shuffle_sides(spark):
    """q7's orderkey join is a legitimate fact-fact shuffle at scale —
    what must hold is that BOTH its inputs are pruned by the broadcast
    nation-restricted dims BEFORE the exchange (the 100× probe measured
    14.4×→2.9× wall ratio from exactly this), and every dimension stays
    broadcast."""
    plan = plan_of(spark, "q7_volume_shipping")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") == 4  # n1, n2, s, c
    # at most: orderkey exchange x2 + final agg
    assert plan.count("Exchange hashpartitioning") <= 3
    # the broadcast prunes sit BELOW the sort-merge join, not above it
    smj_pos = plan.find("SortMergeJoin")
    assert smj_pos >= 0
    assert plan.count("BroadcastHashJoin", smj_pos) >= 2


def test_q21_no_correlated_rescan_explosion(spark):
    """q21's EXISTS/NOT-EXISTS pair is ONE grouped aggregate per order
    whose late lines explode straight out of the aggregate: exactly one
    lineitem scan (no join-back, no per-subquery re-scan) and no
    cartesian/nested-loop."""
    plan = plan_of(spark, "q21_waiting_suppliers")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    scans = [l for l in plan.splitlines()
             if "FileScan parquet" in l and "lineitem" in l]
    assert len(scans) == 1


def test_q17_avg_subquery_co_partitioned(spark):
    """q17's per-part AVG feeds the probe join without a cartesian and
    without re-aggregating per probe row."""
    plan = plan_of(spark, "q17_small_quantity_revenue")
    assert "CartesianProduct" not in plan
    assert plan.count("partial_avg") <= 1


def test_segment_dedup_two_shuffles(spark):
    """Segment dedup = explode -> winner agg on seg -> probe join ->
    reassembly on id: two hash exchanges, never a cartesian, and the
    documents scan happens once per side (2 total), not per subquery."""
    plan = plan_of(spark, "docs_segment_dedup")
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") == 2
    assert plan.count("FileScan parquet") == 2


def test_bpe_top_k_is_take_ordered(spark):
    """Global top-20 merge candidates must plan as
    TakeOrderedAndProject (bounded per-partition heap), never a global
    Sort feeding a limit."""
    plan = plan_of(spark, "bpe_merge_candidates")
    assert "TakeOrderedAndProject" in plan


def test_kmeans_assignment_is_narrow(spark):
    """k-means: the per-vector argmin must ride a broadcast of the
    packed 1-row centroid set — no sort-merge join, no cartesian, and
    the only exchanges are the centroid-update (cluster, dim) aggs and
    the 1-row packers."""
    plan = plan_of(spark, "embedding_kmeans")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_triangle_join_no_cartesian_all_broadcast_or_hash(spark):
    plan = plan_of(spark, "events_user_triangles")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_prefix_jaccard_no_cartesian(spark):
    """PPJoin: every join is an equi-join (prefix-token candidate join,
    intersection probes, size joins) — no nested loop anywhere."""
    plan = plan_of(spark, "dedup_prefix_jaccard")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_exact_quantiles_histogram_not_global_sort(spark):
    """Exact quantiles must NOT plan a global sort of the value column
    (the single-partition exact-percentile trap): only the tiny
    rank-broadcast nested loop and the prefix-sum machinery appear."""
    plan = plan_of(spark, "lineitem_exact_quantiles")
    # every Sort node must be local (flag `false`): a global sort of the
    # value column would print `Sort [...], true, 0`.  (The prefix-sum's
    # own rangepartitioning exchange is hidden behind its
    # localCheckpoint and so doesn't appear in the executed plan.)
    assert ", true, 0" not in plan
    assert "TakeOrderedAndProject" not in plan


def test_interval_overlap_is_equi_join_on_bucket(spark):
    """The session x window overlap join must be a hash/broadcast
    equi-join on the time bucket, not a nested loop over the theta
    predicate."""
    plan = plan_of(spark, "events_session_overlap")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_merge_upsert_single_key_shuffle_join(spark):
    plan = plan_of(spark, "orders_merge_upsert")
    assert "FullOuter" in plan or "full_outer" in plan.lower()
    assert "CartesianProduct" not in plan
