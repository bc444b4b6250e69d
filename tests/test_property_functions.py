"""Property tests for the extension operators against independent
single-machine oracles (same well-known-algorithm pattern as the pipeline
property tests): asof_join vs pandas.merge_asof, the two-phase prefix sum
vs pandas groupby cumsum, dense_ids vs sorted-rank."""
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dask_relabeling_spark.functions.ids import (dense_ids,
                                                 exclusive_prefix_sum)
from dask_relabeling_spark.operators.asof import asof_join


def _random_asof_frames(seed, n_left=200, n_right=150, n_keys=5):
    rng = np.random.RandomState(seed)
    left = pd.DataFrame({
        "k": rng.randint(0, n_keys, n_left).astype(np.int64),
        "lts": pd.to_datetime(
            rng.randint(0, 100_000, n_left), unit="s"),
        "lid": np.arange(n_left, dtype=np.int64),
    })
    right = pd.DataFrame({
        "k": rng.randint(0, n_keys, n_right).astype(np.int64),
        "rts": pd.to_datetime(
            rng.randint(0, 100_000, n_right), unit="s"),
        "rid": np.arange(n_right, dtype=np.int64),
    })
    # unique (k, rts) so the tie-break rule can't differ between oracles
    right = right.drop_duplicates(["k", "rts"]).reset_index(drop=True)
    return left, right


@pytest.mark.parametrize("seed,direction,tol", [
    (1, "backward", None), (2, "forward", None),
    (3, "backward", 1200), (4, "forward", 3600),
    (5, "backward", 0),
])
def test_asof_join_matches_pandas_merge_asof(spark, seed, direction, tol):
    left, right = _random_asof_frames(seed)
    got = asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        on=["k"], left_ts="lts", right_ts="rts", right_id="rid",
        direction=direction, tolerance_seconds=tol).toPandas()
    assert len(got) == len(left), "left rows must be preserved"

    exp = pd.merge_asof(
        left.sort_values("lts", kind="stable"),
        right.sort_values("rts", kind="stable"),
        left_on="lts", right_on="rts", by="k", direction=direction,
        tolerance=None if tol is None else pd.Timedelta(seconds=tol))
    got_map = dict(zip(got["lid"], got["rid_r"]))
    exp_map = dict(zip(exp["lid"], exp["rid"]))
    for lid in left["lid"]:
        g, e = got_map[lid], exp_map[lid]
        assert (pd.isna(g) and pd.isna(e)) or g == e, \
            f"lid={lid}: got rid {g}, pandas oracle {e}"


@pytest.mark.parametrize("seed,tol", [(6, None), (7, 1800)])
def test_asof_nearest_matches_pandas(spark, seed, tol):
    left, right = _random_asof_frames(seed)
    got = asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        on=["k"], left_ts="lts", right_ts="rts", right_id="rid",
        direction="nearest", tolerance_seconds=tol).toPandas()
    exp = pd.merge_asof(
        left.sort_values("lts", kind="stable"),
        right.sort_values("rts", kind="stable"),
        left_on="lts", right_on="rts", by="k", direction="nearest",
        tolerance=None if tol is None else pd.Timedelta(seconds=tol))
    got_map = dict(zip(got["lid"], got["rid_r"]))
    exp_map = dict(zip(exp["lid"], exp["rid"]))

    # exact-|gap| ties between the backward and forward candidate are
    # underspecified in pandas; we document ties -> backward and skip them
    def is_tie(row):
        k, lts = row["k"], row["lts"]
        cand = right[right["k"] == k]
        back = cand[cand["rts"] <= lts]["rts"]
        fwd = cand[cand["rts"] >= lts]["rts"]
        if back.empty or fwd.empty:
            return False
        gb, gf = lts - back.max(), fwd.min() - lts
        return gb == gf and gb > pd.Timedelta(0)

    checked = 0
    for _, row in left.iterrows():
        if is_tie(row):
            continue
        lid = row["lid"]
        g, e = got_map[lid], exp_map[lid]
        assert (pd.isna(g) and pd.isna(e)) or g == e, \
            f"lid={lid}: got rid {g}, pandas oracle {e}"
        checked += 1
    assert checked > len(left) * 0.9


def test_asof_nearest_tie_prefers_backward(spark):
    left = pd.DataFrame({"k": [0], "lts": pd.to_datetime([100], unit="s"),
                         "lid": [0]})
    right = pd.DataFrame({
        "k": [0, 0], "rts": pd.to_datetime([70, 130], unit="s"),
        "rid": [1, 2]})
    got = asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        on=["k"], left_ts="lts", right_ts="rts", right_id="rid",
        direction="nearest").toPandas()
    assert got["rid_r"].tolist() == [1]  # 30s either way -> backward wins


@pytest.mark.parametrize("seed,grouped", [(1, False), (2, True), (3, True)])
def test_exclusive_prefix_sum_matches_pandas_cumsum(spark, seed, grouped):
    rng = np.random.RandomState(seed)
    n = 300
    pdf = pd.DataFrame({
        "g": rng.randint(0, 4, n).astype(np.int64),
        "key": rng.permutation(10 * n)[:n].astype(np.int64),  # unique
        "v": rng.randint(0, 10, n).astype(np.int64),
    })
    out = exclusive_prefix_sum(
        spark.createDataFrame(pdf), "key", "v", out_col="off",
        num_partitions=7, group_col="g" if grouped else None).toPandas()

    by = ["g", "key"] if grouped else ["key"]
    exp = pdf.sort_values(by).reset_index(drop=True)
    grp = exp.groupby("g")["v"] if grouped else exp["v"]
    exp["off"] = grp.cumsum() - exp["v"]
    merged = out.merge(exp, on=["g", "key", "v"], suffixes=("", "_exp"))
    assert len(merged) == n
    assert (merged["off"] == merged["off_exp"]).all()


@pytest.mark.parametrize("seed", [1, 2])
def test_dense_ids_matches_sorted_rank(spark, seed):
    rng = np.random.RandomState(seed)
    vals = rng.randint(-1000, 1000, 500).astype(np.int64)  # with dups
    df = spark.createDataFrame(pd.DataFrame({"v": vals}))
    got = {r["v"]: r["id"] for r in
           dense_ids(df, "v", num_partitions=5, start=7).collect()}
    exp = {v: i + 7 for i, v in enumerate(sorted(set(vals.tolist())))}
    assert got == exp


def test_prefix_sum_deterministic_across_runs(spark):
    """Range partition boundaries are sampled — the persist() inside
    exclusive_prefix_sum must make the assignment deterministic within a
    run, and re-running must give the same totals (offsets are a pure
    function of the data regardless of partitioning)."""
    rng = np.random.RandomState(42)
    pdf = pd.DataFrame({
        "key": rng.permutation(2000).astype(np.int64),
        "v": rng.randint(0, 5, 2000).astype(np.int64),
    })
    df = spark.createDataFrame(pdf)
    a = exclusive_prefix_sum(df, "key", "v").toPandas() \
        .sort_values("key").reset_index(drop=True)
    b = exclusive_prefix_sum(df.repartition(13), "key", "v").toPandas() \
        .sort_values("key").reset_index(drop=True)
    assert (a["offset"] == b["offset"]).all()


# ------------------- integer milli-mean (the centroids-red-row fix)
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_milli_mean_formula_matches_exact_rational(spark, seed):
    """The milli-mean integer floor-division device behind
    embedding_label_centroids / update_centroids / embedding_dim_stats:
    with s in NANO units, milli = round-half-up(s / (n*1e6)) computed as
    floor((2s + n*1e6) / (2n*1e6)) via the subtract-pmod-then-div trick
    must equal exact Fraction arithmetic for positive AND negative sums,
    including exact half-points."""
    from fractions import Fraction
    rng = np.random.RandomState(seed)
    sums = rng.randint(-10**12, 10**12, 40).tolist()
    # force exact half-points into the sample: s = (2k+1)*n*500000
    # makes s/(n*1e6) = k + 1/2 exactly
    ns = rng.randint(1, 10**6, 40).tolist()
    for i in range(0, 40, 5):
        sums[i] = (2 * (i + 3) + 1) * ns[i] * 500_000 * (-1 if i % 2
                                                         else 1)
    df = spark.createDataFrame(
        [(int(s), int(n)) for s, n in zip(sums, ns)], "s long, n long")
    got = (df.withColumn("num", F.expr("2L * s + n * 1000000L"))
           .withColumn("den", F.expr("2L * n * 1000000L"))
           .selectExpr("s", "n",
                       "CAST((num - pmod(num, den)) div den AS LONG)"
                       " AS milli")
           .collect())
    for r in got:
        q = Fraction(2 * r.s + r.n * 1_000_000,
                     2 * r.n * 1_000_000)
        expect = q.numerator // q.denominator  # true floor
        assert r.milli == expect, (r.s, r.n)
        # and it IS round-half-up (toward +inf) of s / (n*1e6)
        import math
        half = Fraction(r.s, 1_000_000 * r.n)
        assert expect == math.floor(half + Fraction(1, 2)), (r.s, r.n)


@pytest.mark.parametrize("seed", [11, 13])
def test_dirty_vector_cosine_matches_duckdb(spark, seed):
    # property pin for the round-12 totality convention: on vectors
    # salted with NaN/±Inf/NULL components (plus zero vectors and NULL
    # embeddings), per-pair cosine through as_vec must match the
    # oracle-side _DUCK_VEC + _DUCK_COS combination exactly — an
    # ill-formed vector scores NULL against everything, never a
    # NaN/Inf rank or a one-engine cast error
    import duckdb

    from dask_relabeling_spark.operators.similarity import as_vec, cosine
    from dask_relabeling_spark.plans.llm import _DUCK_COS, _DUCK_VEC

    rng = np.random.RandomState(seed)
    dim, n = 6, 24
    rows = []
    for i in range(n):
        kind = rng.randint(0, 6)
        if kind == 0:
            vec = None                               # NULL embedding
        else:
            vec = [float(x) for x in rng.uniform(-1, 1, dim)]
            if kind == 1:
                vec[rng.randint(dim)] = float("nan")
            elif kind == 2:
                vec[rng.randint(dim)] = float("inf")
            elif kind == 3:
                vec[rng.randint(dim)] = None         # NULL component
            elif kind == 4:
                vec = [0.0] * dim                    # zero norm
        rows.append((i, vec))
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    vecs = df.select("id", as_vec("embedding").alias("v"))
    a, b = vecs.alias("a"), vecs.alias("b")
    got = {(r.ia, r.ib): r.cos for r in
           (a.join(b, F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("ia"), F.col("b.id").alias("ib"),
                    cosine(F.col("a.v"), F.col("b.v")).alias("cos"))
            .collect())}

    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings (id BIGINT, embedding DOUBLE[])")
    con.executemany("INSERT INTO embeddings VALUES (?, ?)", rows)
    exp = {(ia, ib): cos for ia, ib, cos in con.execute(f"""
        WITH v AS (SELECT id, {_DUCK_VEC} AS ve FROM embeddings)
        SELECT a.id, b.id, {_DUCK_COS.format(a='a.ve', b='b.ve')}
        FROM v a JOIN v b ON a.id < b.id""").fetchall()}

    assert set(got) == set(exp)
    for k in got:
        g, e = got[k], exp[k]
        if g is None or e is None:
            assert g is None and e is None, (k, g, e)
        else:
            assert abs(g - e) < 1e-12, (k, g, e)
