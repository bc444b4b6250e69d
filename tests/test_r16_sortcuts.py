"""Round-16 optimization pins: the PPJoin prefix table computes sz and
rk in ONE window pass (one Sort), and the segment-dedup winner
aggregate is hash-aggregable (no SortAggregate), with the decimal
packing order-isomorphic to (id, seg_idx) — including negative ids.
"""
import re

from dask_relabeling_spark.operators.dedup import (
    _distinct_shingle_table, _ppjoin_prefix_table, segment_dedup)
from dask_relabeling_spark.session import release_persists


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_prefix_table_single_sort(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e g")],
        "doc_id long, text string")
    toks = _distinct_shingle_table(df, "doc_id", "text", 3) \
        .withColumnRenamed("sh", "tok")
    plan = _plan(_ppjoin_prefix_table(toks, 4, 5))
    # sz rides the rk window's (partition, order) spec with an explicit
    # whole-partition frame, so the planner fuses both functions into
    # ONE Window operator fed by one sort — a second spec would
    # reintroduce the extra full sort of the shingle table this change
    # removed.  (Join-side Sorts vary with the join strategy on tiny
    # unsized inputs, so the pin is the Window count, and that the one
    # Window is fed directly by one Sort.)
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 1, plan
    assert len(re.findall(r"Window \(\d+\)\n\s*\+- Sort \(\d+\)", plan)) \
        == 1, plan


def test_segment_winner_hash_aggregable(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d x y z w")],
        "doc_id long, text string")
    plan = _plan(segment_dedup(df, seg_len=4))
    # the decimal-packed winner min must plan as HashAggregate with a
    # map-side partial (never SortAggregate, which sorts the full
    # segment table before each aggregation phase)
    assert "SortAggregate" not in plan, plan


def test_segment_winner_packing_respects_id_order(spark):
    # negative and positive ids sharing segments: the DECIMAL(38,0)
    # pack (id * 1e9 + seg_idx) must keep (id, seg_idx) lexicographic
    # order, so the winner of the shared segment is the NEGATIVE id
    rows = [(-5, "a b c d"), (3, "a b c d e f g h")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    try:
        out = {r["id"]: (r["n_segs"], r["n_kept"])
               for r in segment_dedup(df, seg_len=4).collect()}
    finally:
        release_persists()
    # doc -5 keeps its only segment; doc 3 loses "a b c d" to doc -5
    # and keeps its second segment
    assert out == {-5: (1, 1), 3: (2, 1)}


def test_segment_winner_same_doc_repeat(spark):
    # the same segment repeated INSIDE one doc: the lowest seg_idx wins
    # (the seg_idx term of the pack), so exactly one copy survives
    df = spark.createDataFrame(
        [(7, "a b c d a b c d e f g h")], "doc_id long, text string")
    try:
        out = segment_dedup(df, seg_len=4, out_text=True).collect()
    finally:
        release_persists()
    assert [r["clean_text"] for r in out] == ["a b c d e f g h"]


def test_cc_lazy_checkpoint_deep_chain(spark):
    """Round-16 pin for the lazy-checkpoint CC iteration (the
    convergence aggregate materializes each iteration's checkpoint in
    the SAME job): a diameter-8 chain forces several propagation
    rounds through checkpointed labels, and the output must be the
    brute-force union-find fixpoint — every node labeled with its
    component's minimum id, early convergence exit included."""
    from dask_relabeling_spark.operators.dedup import connected_components
    chain = [(i, i + 1) for i in range(30, 38)]        # diameter 8
    extra = [(50, 52), (52, 51), (7, 3)]               # two small comps
    pairs = spark.createDataFrame(chain + extra, ["id_a", "id_b"])
    got = dict(connected_components(pairs).collect())

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in chain + extra:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}
    assert got == want
    release_persists()
