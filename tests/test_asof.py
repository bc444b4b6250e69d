"""asof_join: backward/forward semantics, equal-ts matches, NULL fills,
and tie-breaking by right_id."""
import datetime as dt

import pytest
from pyspark.sql import functions as F

from dask_relabeling_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def _node_count(plan: str, node: str) -> int:
    """Count physical-plan NODES named ``node`` in a plan rendering:
    a node label starts after the tree-drawing prefix ("+- ", ":- ",
    ":  ", spaces) and an optional whole-stage-codegen marker
    ("*(3) ") — tolerant of renderer/indentation changes, and immune
    to the name appearing inside expression text (e.g.
    ``windowspecdefinition``) since those never start a label."""
    import re
    pat = re.compile(
        r"^[\s:+|\-]*(?:\*\(\d+\)\s*)?" + re.escape(node) + r"\b",
        re.MULTILINE)
    return len(pat.findall(plan))


@pytest.fixture()
def sides(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(10)), (2, "u", _ts(20)), (3, "u", _ts(5)),
         (4, "v", _ts(10))],
        "lid int, k string, ts timestamp")
    right = spark.createDataFrame(
        [(100, "u", _ts(8), 1.0), (101, "u", _ts(10), 2.0),
         (102, "u", _ts(15), 3.0)],
        "rid int, k string, rts timestamp, val double")
    return left, right


def test_backward(sides):
    left, right = sides
    got = {r.lid: r.rid_r for r in
           asof_join(left, right, ["k"], "ts", "rts",
                     right_id="rid").collect()}
    # lid=1 at t10: rights at t8, t10 -> equal-ts match wins (rid 101)
    # lid=2 at t20: latest right at t15 (rid 102)
    # lid=3 at t5: nothing at/before -> NULL
    # lid=4 key v: no rights for key -> NULL
    assert got == {1: 101, 2: 102, 3: None, 4: None}


def test_forward(sides):
    left, right = sides
    got = {r.lid: r.rid_r for r in
           asof_join(left, right, ["k"], "ts", "rts",
                     right_id="rid", direction="forward").collect()}
    # lid=1 at t10: next right at/after is t10 itself (rid 101)
    # lid=2 at t20: nothing after -> NULL
    # lid=3 at t5: next right at t8 (rid 100)
    assert got == {1: 101, 2: None, 3: 100, 4: None}


def test_tie_break_highest_right_id(spark):
    left = spark.createDataFrame([(1, "u", _ts(10))],
                                 "lid int, k string, ts timestamp")
    right = spark.createDataFrame(
        [(7, "u", _ts(9)), (9, "u", _ts(9)), (8, "u", _ts(9))],
        "rid int, k string, rts timestamp")
    [row] = asof_join(left, right, ["k"], "ts", "rts",
                      right_id="rid").collect()
    assert row.rid_r == 9


def test_left_rows_all_kept_and_columns_suffixed(sides):
    left, right = sides
    out = asof_join(left, right, ["k"], "ts", "rts", right_id="rid")
    assert out.count() == left.count()
    assert set(out.columns) == {"lid", "k", "ts",
                                "rid_r", "rts_r", "val_r"}


def test_bad_direction(sides):
    left, right = sides
    with pytest.raises(ValueError):
        asof_join(left, right, ["k"], "ts", "rts", direction="sideways")


def test_single_shuffle_plan(sides):
    """The as-of join must be ONE exchange (on the key), not a range
    join: assert no Cartesian/BroadcastNestedLoop node in the plan."""
    left, right = sides
    plan = (asof_join(left, right, ["k"], "ts", "rts")
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_random_against_pandas_merge_asof(spark):
    """Property: asof_join(backward) == pandas.merge_asof on random data
    (pandas is an independent trusted implementation of as-of)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(123)
    nl, nr = 400, 300
    lpdf = pd.DataFrame({
        "k": rng.integers(0, 8, nl).astype("int64"),
        "ts": pd.to_datetime(rng.integers(0, 10_000, nl), unit="s"),
        "lid": np.arange(nl, dtype="int64"),
    })
    rpdf = pd.DataFrame({
        "k": rng.integers(0, 8, nr).astype("int64"),
        "rts": pd.to_datetime(
            rng.choice(np.arange(10_000), nr, replace=False), unit="s"),
        "rid": np.arange(nr, dtype="int64"),
        "val": rng.random(nr).round(6),
    })
    got = (asof_join(spark.createDataFrame(lpdf),
                     spark.createDataFrame(rpdf),
                     ["k"], "ts", "rts", right_id="rid")
           .toPandas())
    exp = pd.merge_asof(lpdf.sort_values("ts"),
                        rpdf.sort_values("rts"),
                        left_on="ts", right_on="rts", by="k",
                        direction="backward")
    g = got.sort_values("lid")[["lid", "rid_r", "val_r"]] \
        .reset_index(drop=True)
    e = exp.sort_values("lid")[["lid", "rid", "val"]] \
        .rename(columns={"rid": "rid_r", "val": "val_r"}) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(g, e, check_dtype=False)


def test_non_numeric_right_id_rejected(sides):
    left, right = sides
    bad = right.withColumn("rid_s", F.col("rid").cast("string"))
    with pytest.raises(TypeError, match="must be integral"):
        asof_join(left, bad, ["k"], "ts", "rts", right_id="rid_s")


def test_nearest_right_ts_in_on_rejected(spark):
    """direction='nearest' reads the matched timestamp out of the right
    payload struct; a right_ts that is also a join key is not in that
    struct and previously failed late with an opaque unresolved-field
    AnalysisException — it must be rejected up front, like the
    tolerance_seconds path always did."""
    left = spark.createDataFrame([(1, _ts(10))], "lid int, ts timestamp")
    right = spark.createDataFrame([(_ts(8), 1.0)],
                                  "ts timestamp, val double")
    with pytest.raises(ValueError, match="payload column"):
        asof_join(left, right, ["ts"], "ts", "ts", direction="nearest")


def test_backtick_column_names(spark):
    """Column names needing quoting (dots/spaces) must survive the
    timestampdiff interpolation and the output-struct field reads."""
    left = spark.createDataFrame([(1, "u", _ts(10))],
                                 "lid int, k string, ts timestamp")
    right = spark.createDataFrame(
        [(100, "u", _ts(8), 1.0), (101, "u", _ts(12), 2.0)],
        "rid int, k string, `r.ts` timestamp, `my val` double")
    [row] = asof_join(left, right, ["k"], "ts", "r.ts",
                      right_id="rid", direction="nearest").collect()
    assert row["rid_r"] == 100 and row["my val_r"] == 1.0
    [row2] = asof_join(left, right, ["k"], "ts", "r.ts",
                       right_id="rid", tolerance_seconds=1).collect()
    assert row2["rid_r"] is None


def test_null_keys_and_timestamps_never_match(spark):
    """SQL comparison semantics pinned explicitly (round-12 fuzz): a
    NULL join key or NULL timestamp never produces a match, in either
    direction — without the operator's guards, window partitioning
    would match NULL keys to each other and a NULL-ts left row would
    match everything (forward) or nothing (backward) by sort accident."""
    left = spark.createDataFrame(
        [(1, "u", _ts(20)),      # normal: matches rid 100 backward
         (2, "u", None),         # NULL left ts: kept, never matched
         (3, None, _ts(20))],    # NULL left key: kept, never matched
        "lid int, k string, ts timestamp")
    right = spark.createDataFrame(
        [(100, "u", _ts(10), 1.0),
         (101, "u", None, 2.0),    # NULL right ts: never a match
         (102, None, _ts(5), 3.0)],  # NULL right key: never a match
        "rid int, k string, rts timestamp, val double")
    # lid=1 (t20, right at t10): backward/nearest match rid 100;
    # forward has no right row at/after t20
    for direction, want1 in (("backward", 100), ("forward", None),
                             ("nearest", 100)):
        got = {r.lid: r.rid_r for r in
               asof_join(left, right, ["k"], "ts", "rts",
                         right_id="rid", direction=direction).collect()}
        assert set(got) == {1, 2, 3}, direction
        assert got[2] is None and got[3] is None, direction
        assert got[1] == want1, direction


def test_null_key_left_rows_bypass_the_window(spark):
    """Never-match left rows (NULL key or NULL left_ts) are routed
    around the shuffle (r12 ADVICE: partitionBy hashes every NULL-key
    row into ONE straggler partition computing a match that is NULL by
    definition).  Pins both the plan shape — a Union whose bypass
    branch carries no Window — and the unchanged semantics."""
    left = spark.createDataFrame(
        [(1, "u", _ts(10)), (2, None, _ts(10)), (3, "u", None),
         (4, None, None)],
        "lid int, k string, ts timestamp")
    right = spark.createDataFrame(
        [(100, "u", _ts(8), 1.5)],
        "rid int, k string, rts timestamp, val double")
    out = asof_join(left, right, ["k"], "ts", "rts", right_id="rid")
    got = {r.lid: (r.rid_r, r.val_r) for r in out.collect()}
    assert got == {1: (100, 1.5), 2: (None, None), 3: (None, None),
                   4: (None, None)}
    # under AQE the string renders the final AND initial plans; count
    # nodes in the final section only (split is a no-op if the marker
    # is absent, e.g. AQE off or a renderer change)
    plan = (out._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0])
    # one Window over one key Exchange (the backward pass), and no
    # second exchange introduced for the bypass branch — matched as
    # plan NODES (tree-prefix + optional codegen-stage marker, then the
    # node name at the start of the label), not exact string renderings
    # (r13 ADVICE: '+- Window ' / bare substring counts break
    # spuriously on Spark renderer changes rather than on regressions)
    assert _node_count(plan, "Union") >= 1
    assert _node_count(plan, "Window") == 1
    assert _node_count(plan, "Exchange hashpartitioning") == 1
