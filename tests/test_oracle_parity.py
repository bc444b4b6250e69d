"""Replicates the driver's t2 gate locally: every queries() entry runs on
Spark AND its oracle SQL runs on DuckDB over the same sf0.01 parquet;
results must match on row count, column names, and order-insensitive
values."""
import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM "
                    f"'{SF_DIR}/{name}.parquet'")
    return con


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
                if v == -0.0:
                    v = 0.0
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return out


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), \
        f"{name}: columns {spark_cols} vs {duck_cols}"
    assert len(spark_rows) == len(duck_rows), \
        f"{name}: rowcount {len(spark_rows)} vs {len(duck_rows)}"
    ns, nd = normalize(spark_rows, spark_cols), normalize(duck_rows,
                                                          duck_cols)
    mismatches = [(a, b) for a, b in zip(ns, nd) if a != b][:5]
    assert ns == nd, f"{name}: first diffs {mismatches}"


def test_rows_only_queries_run(spark):
    for name in sorted(set(QUERIES) - set(ORACLES)):
        df = QUERIES[name](spark, SF_DIR)
        assert df.count() >= 0, name


def test_centroids_order_independent(spark):
    """Regression for the round-2/3 driver hash-fail: a double ``avg``
    accumulates in shuffle-fetch order, and the (label=1, dim=18) mean
    sits on a round(_, 3) half boundary, so reruns flipped
    0.006<->0.007; even the decimal-exact sum left a rounded-double
    render channel where engine builds could disagree.  The query now
    emits pure-integer milli-units, which must be identical across runs
    with different partitioning (and, being BIGINT, across builds)."""
    q = QUERIES["embedding_label_centroids"]

    def run(parts):
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        try:
            rows = {(r["label"], r["dim"]): r["centroid_milli"]
                    for r in q(spark, SF_DIR).collect()}
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)
        return rows

    a, b, c = run(32), run(7), run(1)
    assert a == b == c
    assert all(isinstance(v, int) for v in a.values())


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.01",
                                    "/root/testdata/sf0.1"])
def test_flagship_mask_contract(sf_dir):
    """The relabel pipeline's one-hop-merge contract is a DATA property:
    max connected-component diameter <= halo (SURVEY §4.1).  Assert it
    directly at both driver scales so a testdata regeneration that
    densifies the mask fails HERE, naming the contract, instead of as a
    non-obvious oracle hash mismatch (round-2 ADVICE)."""
    import numpy as np

    from dask_relabeling_spark.kernels.ccl import label
    from dask_relabeling_spark.plans.tile_query import (
        H, MASK_MOD, OVERLAP, W)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"'{sf_dir}/lineitem.parquet'")
    pts = con.execute(f"""
        WITH p AS (SELECT DISTINCT CAST(l_orderkey % {H} AS INT) AS y,
                                   CAST(l_partkey % {W} AS INT) AS x
                   FROM lineitem)
        SELECT y, x FROM p
        WHERE CAST('0x' || substr(md5(CAST(y AS VARCHAR) || ',' ||
                                      CAST(x AS VARCHAR)), 1, 8) AS BIGINT)
              % {MASK_MOD} = 0""").fetchnumpy()
    mask = np.zeros((H, W), dtype=np.int64)
    mask[pts["y"], pts["x"]] = 1
    lab = label(mask)
    n = int(lab.max())
    assert n > 100, "mask degenerated to (almost) nothing"
    ys, xs = np.nonzero(lab)
    ls = lab[ys, xs]
    big = 10 ** 9
    ymin = np.full(n + 1, big); ymax = np.full(n + 1, -big)
    xmin = np.full(n + 1, big); xmax = np.full(n + 1, -big)
    np.minimum.at(ymin, ls, ys); np.maximum.at(ymax, ls, ys)
    np.minimum.at(xmin, ls, xs); np.maximum.at(xmax, ls, xs)
    max_side = int(max((ymax - ymin)[1:].max(), (xmax - xmin)[1:].max()))
    assert max_side <= OVERLAP, (
        f"one-hop-merge contract broken: max component bbox side "
        f"{max_side} > halo {OVERLAP} — regenerate/re-thin the mask "
        f"(MASK_MOD) before trusting the CCL oracle")


def test_ivf_neardup_recall(spark):
    """The bucketed near-dup pairs must be a strict candidate-pruned
    subset of the brute-force baseline with documented recall: no false
    positives (exact verify runs on every candidate), and most
    true pairs survive bucketing (12/14 at this gate's geometry, where
    planted pairs sit barely above the 0.45 threshold)."""
    from dask_relabeling_spark.operators import similarity as S
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    exact = {(r["id_a"], r["id_b"]) for r in
             S.cosine_neardup_pairs(emb, 45, 100).collect()}
    bucketed = {(r["id_a"], r["id_b"]) for r in
                S.ivf_neardup_pairs(emb, 45, 100).collect()}
    assert bucketed <= exact                    # no false positives
    assert len(bucketed) >= 0.8 * len(exact)    # recall floor


def test_lsh_buckets_spread(spark):
    """Regression: hyperplane LSH must actually spread vectors across
    buckets (a prior bug generated all-negative correlated planes that
    collapsed most vectors into 2 of 32 buckets — invisible to the
    oracle gate, which replays the same constants)."""
    from dask_relabeling_spark.operators import similarity as S
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    b = S.hyperplane_lsh_buckets(emb, S.default_lsh_planes())
    counts = [r["count"] for r in b.groupBy("bucket").count().collect()]
    n = sum(counts)
    assert len(counts) >= 16            # most of the 32 buckets populated
    assert max(counts) < n * 0.2        # no bucket dominates
    flat = [x for p in S.default_lsh_planes() for x in p]
    assert min(flat) < -0.5 and max(flat) > 0.5
