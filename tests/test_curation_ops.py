"""Unit/property tests for the round-3 pipeline extensions:
k-means, TF-IDF pairs, binned interval-overlap join, hashed linear
classifier, BPE pair counts, incremental dedup, z-order keys."""
import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dask_relabeling_spark.functions.ids import zorder_key
from dask_relabeling_spark.operators.clustering import kmeans_assignments
from dask_relabeling_spark.operators.dedup import (incremental_new_docs,
                                                   tfidf_cosine_pairs)
from dask_relabeling_spark.operators.intervals import overlap_join_binned
from dask_relabeling_spark.operators.text import (bpe_pair_counts,
                                                  hashed_linear_score)

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------- k-means
def _numpy_kmeans(vecs: dict, k: int = 8, n_iter: int = 2) -> dict:
    """Reference Lloyd's with the operator's exact determinism rules:
    init = k lowest ids, ties to lowest cid, centroid components are
    exact means rounded to 3 decimals."""
    ids = sorted(vecs)
    cent = {cid: np.asarray(vecs[cid], dtype=np.float64)
            for cid in ids[:k]}
    assign = {}
    for it in range(n_iter):
        for i in ids:
            v = np.asarray(vecs[i], dtype=np.float64)
            best = min((float(((v - cv) ** 2).sum()), cid)
                       for cid, cv in cent.items())
            assign[i] = best[1]
        if it < n_iter - 1:
            cent = {}
            for cid in set(assign.values()):
                members = np.stack([np.asarray(vecs[i], np.float64)
                                    for i in ids if assign[i] == cid])
                cent[cid] = np.round(members.mean(axis=0), 3)
    return assign


def test_kmeans_matches_numpy_reference(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = {r.vec_id: r.cluster
           for r in kmeans_assignments(emb, k=8, n_iter=2).collect()}
    vecs = {r.vec_id: [float(x) for x in r.embedding]
            for r in emb.collect()}
    want = _numpy_kmeans(vecs)
    # decimal-vs-binary rounding of the mean can differ from numpy in
    # the last ulp; assignments may only flip on exact near-ties, which
    # the random testdata does not contain
    assert got == want


def test_kmeans_deterministic_across_runs(spark):
    emb = (spark.read.parquet(f"{SF}/embeddings.parquet")
           .repartition(7))  # different partitioning than run 1
    a = sorted(map(tuple, kmeans_assignments(emb).collect()))
    b = sorted(map(tuple,
                   kmeans_assignments(emb.repartition(3)).collect()))
    assert a == b


# ------------------------------------------------------ TF-IDF pairs
def test_tfidf_exact_duplicates_score_near_one(spark):
    df = spark.createDataFrame([
        Row(doc_id=1, text="alpha beta gamma delta"),
        Row(doc_id=2, text="alpha beta gamma delta"),
        Row(doc_id=3, text="epsilon zeta eta theta"),
        Row(doc_id=4, text="alpha beta unrelated words"),
    ])
    rows = {(r.id_a, r.id_b): r.sim_micro
            for r in tfidf_cosine_pairs(df, max_df=4,
                                        threshold_micro=0).collect()}
    assert rows[(1, 2)] >= 999999  # identical docs: cos == 1 up to ulp
    assert all(a < b for a, b in rows)
    assert rows[(1, 4)] < rows[(1, 2)]


# --------------------------------------------- interval-overlap join
def test_overlap_join_binned_matches_theta_join(spark):
    import random
    rng = random.Random(7)
    base = 1_700_000_000
    left = spark.createDataFrame([
        Row(lid=i, s=base + rng.randrange(0, 72000),
            d=rng.randrange(0, 14400))
        for i in range(40)]).selectExpr(
            "lid", "timestamp_micros(s * 1000000) AS ls",
            "timestamp_micros((s + d) * 1000000) AS le")
    right = spark.createDataFrame([
        Row(rid=i, s=base + rng.randrange(0, 72000),
            d=rng.randrange(0, 7200))
        for i in range(15)]).selectExpr(
            "rid", "timestamp_micros(s * 1000000) AS rs",
            "timestamp_micros((s + d) * 1000000) AS re")
    binned = sorted(map(tuple, overlap_join_binned(
        left, right, "ls", "le", "rs", "re", bin_seconds=1800)
        .select("lid", "rid", "overlap_us").collect()))
    naive = sorted(map(tuple, left.crossJoin(right).filter(
        "ls <= re AND rs <= le").select(
        "lid", "rid",
        F.expr("least(unix_micros(le), unix_micros(re)) - "
               "greatest(unix_micros(ls), unix_micros(rs))")
        .alias("overlap_us")).collect()))
    assert binned == naive


# ------------------------------------------- hashed linear classifier
def test_hashed_linear_score_manual(spark):
    from dask_relabeling_spark.operators.dedup import token_hash
    df = spark.createDataFrame([Row(doc_id=1, text="aa bb aa")])
    out = hashed_linear_score(df, n_buckets=16).collect()[0]
    h = {r.term: r.b for r in spark.createDataFrame(
        [Row(term="aa"), Row(term="bb")])
        .select("term", (token_hash(F.col("term")) % 16).alias("b"))
        .collect()}
    wt = {b: (b * 2654435761) % 2001 - 1000 for b in range(16)}
    want = 2 * wt[h["aa"]] + 1 * wt[h["bb"]]
    assert out.score == want
    assert out.label == int(want > 0)


# ------------------------------------------------- BPE pair counting
def test_bpe_pair_counts_manual(spark):
    df = spark.createDataFrame([
        Row(text="a b a b c"), Row(text="a b"), Row(text="x")])
    got = {r.pair: r.cnt for r in bpe_pair_counts(df, k=10).collect()}
    assert got == {"a b": 3, "b a": 1, "b c": 1}


# ---------------------------------------------- incremental dedup
def test_incremental_new_docs_anti_join(spark):
    batch = spark.createDataFrame([
        Row(doc_id=10, text="seen before"),
        Row(doc_id=11, text="brand new"),
    ])
    seen = spark.createDataFrame([Row(doc_id=1, text="seen before")])
    kept = incremental_new_docs(batch, seen).select("id").collect()
    assert [r.id for r in kept] == [11]


# ------------------------------------------------------- z-order key
def _interleave(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


@pytest.mark.parametrize("x,y", [(0, 0), (15, 0), (0, 15), (10, 5),
                                 (3, 12), (7, 7)])
def test_zorder_key_bit_interleave(spark, x, y):
    got = (spark.range(1)
           .select(zorder_key(F.lit(x), F.lit(y), bits=4).alias("z"))
           .collect()[0].z)
    assert got == _interleave(x, y, 4)


def test_zorder_key_locality_monotone_blocks(spark):
    # all 16 cells of a 4x4 grid with the same top bits share a block:
    # zkey >> 4 groups (x div 4, y div 4) quadrants together
    rows = (spark.createDataFrame([Row(x=x, y=y)
                                   for x in range(16) for y in range(16)])
            .select("x", "y", zorder_key("x", "y", 4).alias("z"))
            .collect())
    for r in rows:
        assert (r.z >> 4) == _interleave(r.x >> 2, r.y >> 2, 2)


# ----------------------------- PPJoin prefix filtering completeness
def test_prefix_jaccard_equals_full_inverted_join(spark):
    """The prefix theorem says filtering candidates to rarest-shingle
    prefixes loses NO pair above threshold — assert exact equality with
    the unfiltered inverted-join operator on real data."""
    from dask_relabeling_spark.operators.dedup import (
        ngram_jaccard_pairs, prefix_filtered_jaccard_pairs)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    full = sorted(map(tuple, ngram_jaccard_pairs(docs).collect()))
    pref = sorted(map(tuple,
                      prefix_filtered_jaccard_pairs(docs).collect()))
    assert pref == full


def test_prefix_jaccard_prunes_candidates(spark):
    """The point of the prefix: candidate pairs examined must be a
    strict subset of what the full shingle join would generate."""
    from dask_relabeling_spark.operators.dedup import (
        _distinct_shingle_table)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sh = _distinct_shingle_table(docs, "doc_id", "text", 3)
    full_cand = (sh.alias("a").join(
        sh.alias("b"),
        (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .select("a.id", "b.id").distinct().count())
    # replicate the operator's internal prefix to count its candidates
    from pyspark.sql import Window
    toks = sh.withColumnRenamed("sh", "tok")
    sizes = toks.groupBy("id").agg(F.count("*").alias("sz"))
    dfreq = toks.groupBy("tok").agg(F.count("*").alias("df"))
    rk = F.row_number().over(Window.partitionBy("id").orderBy("df", "tok"))
    plen = (F.col("sz") - F.floor((4 * F.col("sz") + 4) / 5) + 1)
    prefix = (toks.join(dfreq, "tok").join(sizes, "id")
              .withColumn("rk", rk).filter(F.col("rk") <= plen)
              .select("id", "tok"))
    pref_cand = (prefix.alias("a").join(
        prefix.alias("b"),
        (F.col("a.tok") == F.col("b.tok")) &
        (F.col("a.id") < F.col("b.id")))
        .select("a.id", "b.id").distinct().count())
    assert pref_cand < full_cand


# ------------------------------------------------- exact quantiles
def test_exact_quantiles_match_sorted_list(spark):
    from dask_relabeling_spark.functions.quantiles import exact_quantiles
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    vals = sorted(r.l_extendedprice for r in
                  li.select("l_extendedprice").collect())
    n = len(vals)
    got = {r.q: r.value for r in exact_quantiles(
        li, "l_extendedprice",
        [("p50", 1, 2), ("p90", 9, 10), ("p0", 0, 1),
         ("p100", 1, 1)]).collect()}
    assert got == {"p50": vals[(n - 1) // 2],
                   "p90": vals[9 * (n - 1) // 10],
                   "p0": vals[0], "p100": vals[-1]}


def test_exact_quantiles_with_heavy_duplicates(spark):
    from dask_relabeling_spark.functions.quantiles import exact_quantiles
    df = spark.createDataFrame([(v,) for v in [1] * 50 + [2] * 5 + [3]],
                               "x long")
    got = {r.q: r.value for r in exact_quantiles(
        df, "x", [("p50", 1, 2), ("p95", 19, 20), ("p100", 1, 1)])
        .collect()}
    assert got == {"p50": 1, "p95": 2, "p100": 3}


# ------------------------------------------------- triangle counting
def test_triangle_counts_manual_graph(spark):
    from dask_relabeling_spark.operators.graph import triangle_counts
    # K4 on {1,2,3,4} (4 triangles, each vertex in 3) + pendant 5
    edges = spark.createDataFrame(
        [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
        + [(4, 5)], "u long, v long")
    got = {r.user_id: r.n_triangles
           for r in triangle_counts(edges).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_orientation_invariant(spark):
    """Degree-ordered orientation must find the same triangles as the
    plain id-ordered 3-way join."""
    from dask_relabeling_spark.operators.graph import (cooccurrence_edges,
                                                       triangle_counts)
    from dask_relabeling_spark.plans.relational import t as load
    ev = load(spark, SF, "events")
    e = cooccurrence_edges(ev, max_group=20)
    got = sorted(map(tuple, triangle_counts(e).collect()))
    e.createOrReplaceTempView("_tri_e")
    want = sorted(map(tuple, e.sparkSession.sql("""
        WITH tri AS (
          SELECT e1.u x, e1.v y, e2.v z FROM _tri_e e1
          JOIN _tri_e e2 ON e2.u = e1.v
          JOIN _tri_e e3 ON e3.u = e1.u AND e3.v = e2.v)
        SELECT user_id, count(*) AS n_triangles FROM (
          SELECT explode(array(x, y, z)) AS user_id FROM tri)
        GROUP BY user_id""").collect()))
    assert got == want


# --------------------------------------------------- semantic dedup
def test_semantic_dedup_invariants(spark):
    from dask_relabeling_spark.operators.clustering import semantic_dedup
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    rows = semantic_dedup(emb, k=8, n_iter=2).collect()
    assert len(rows) == emb.count()  # every vector classified
    by_id = {r.vec_id: r for r in rows}
    for r in rows:
        assert r.keep_id <= r.vec_id  # canonical is the group minimum
        assert r.is_dup == int(r.keep_id != r.vec_id)
        if r.is_dup:
            keeper = by_id[r.keep_id]
            assert keeper.is_dup == 0
            # SemDeDup groups are confined to one k-means cluster
            assert keeper.cluster == r.cluster


def test_semantic_dedup_finds_exact_replicas(spark):
    from pyspark.sql import Row
    from dask_relabeling_spark.operators.clustering import semantic_dedup
    base = [[float(i == j) for i in range(8)] for j in range(8)]
    rows = [Row(vec_id=j, embedding=base[j]) for j in range(8)]
    rows += [Row(vec_id=100, embedding=base[3]),  # replica of 3
             Row(vec_id=101, embedding=base[3])]
    out = {r.vec_id: r for r in
           semantic_dedup(spark.createDataFrame(rows), k=8,
                          n_iter=2).collect()}
    assert out[100].keep_id == 3 and out[100].is_dup == 1
    assert out[101].keep_id == 3 and out[101].is_dup == 1
    assert out[3].is_dup == 0


# --------------------------------------------------- bigram LM
def test_bigram_logprob_manual(spark):
    import math
    from dask_relabeling_spark.plans import REGISTRY
    import tempfile, os
    from pyspark.sql import Row
    # corpus: "a b" x2 and "a c": P(b|a)=2/3, P(c|a)=1/3
    df = spark.createDataFrame([
        Row(doc_id=1, text="a b"), Row(doc_id=2, text="a b"),
        Row(doc_id=3, text="a c")])
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "documents.parquet"))
        fn, _ = REGISTRY["docs_bigram_logprob"]
        got = {r.doc_id: r.lp_per_bigram
               for r in fn(spark, td).collect()}
    assert got[1] == got[2] == round(math.log(2 / 3), 4)
    assert got[3] == round(math.log(1 / 3), 4)


# ------------------------------------------- grouped exact quantiles
def test_grouped_exact_quantiles_matches_per_group_sort(spark):
    from dask_relabeling_spark.functions.quantiles import (
        grouped_exact_quantiles)
    import collections
    li = spark.read.parquet(f"{SF}/orders.parquet")
    rows = li.select("o_orderpriority", "o_totalprice").collect()
    groups = collections.defaultdict(list)
    for r in rows:
        groups[r.o_orderpriority].append(r.o_totalprice)
    got = {(r.o_orderpriority, r.q): r.value
           for r in grouped_exact_quantiles(
               li, "o_totalprice", "o_orderpriority",
               [("p50", 1, 2), ("p90", 9, 10)]).collect()}
    want = {}
    for g, vals in groups.items():
        vals.sort()
        n = len(vals)
        want[(g, "p50")] = vals[(n - 1) // 2]
        want[(g, "p90")] = vals[9 * (n - 1) // 10]
    assert got == want


# ------------------------------------------- leakage-safe split
def test_leakage_safe_split_no_fingerprint_straddles(spark):
    from dask_relabeling_spark.plans import REGISTRY
    fn, _ = REGISTRY["docs_leakage_safe_split"]
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = fn(spark, SF).join(docs, "doc_id") \
        .select(F.md5("text").alias("fp"), "split")
    straddlers = (out.groupBy("fp")
                  .agg(F.countDistinct("split").alias("ns"))
                  .filter(F.col("ns") > 1).count())
    assert straddlers == 0
    splits = {r.split for r in out.select("split").distinct().collect()}
    assert splits == {"train", "eval"}
