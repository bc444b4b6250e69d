"""Round-8 operator tests: exact sketch-then-verify heavy hitters
(partitioning-independence + the MG sentinel total), the PII-redaction
value path (all four categories, boundary misses), and the query-only
persisted-ANN arm (cache reuse + result parity with the rebuild arm).
"""
import os

from pyspark.sql import functions as F

from dask_relabeling_spark.functions.heavy_hitters import (
    heavy_hitters_exact, mg_heavy_hitters)
from dask_relabeling_spark.operators.text import redact_pii, tokens_col
from dask_relabeling_spark.session import release_persists


# ------------------------------------------------- exact heavy hitters

def _toks(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return docs.select(F.explode(tokens_col(F.col("text"))).alias("term"))


def test_heavy_hitters_exact_matches_truth_any_partitioning(spark):
    """The verified output is EXACT — identical to the naive
    group-by/having answer — under every partitioning, unlike the raw
    MG estimates it prunes with."""
    toks = _toks(spark)
    k = 64
    true = {r.term: r.c for r in
            toks.groupBy("term").agg(F.count("*").alias("c")).collect()}
    n = sum(true.values())
    want = {(t, c) for t, c in true.items() if c * k > n}
    assert want, "vacuous fixture: no heavy hitters at k=64"
    for parts in (1, 3, 17):
        got = {(r.term, r.cnt) for r in
               heavy_hitters_exact(toks.repartition(parts), k=k).collect()}
        assert got == want, parts
    release_persists()


def test_heavy_hitters_exact_threshold_is_strict(spark):
    """Skewed synthetic stream with a term EXACTLY at n/k: the strict
    ``cnt * k > n`` bar excludes it; terms above the bar keep exact
    counts regardless of how MG's estimates were decremented."""
    # n = 64: 'hot' x 24, 'warm' x 17, 'edge' x 16 (== n/4), 7 singles
    terms = (["hot"] * 24 + ["warm"] * 17 + ["edge"] * 16
             + [f"cold{i}" for i in range(7)])
    df = spark.createDataFrame([(x,) for x in terms], "term string")
    for parts in (1, 4):
        got = {(r.term, r.cnt) for r in
               heavy_hitters_exact(df.repartition(parts), k=4).collect()}
        assert got == {("hot", 24), ("warm", 17)}, parts
    release_persists()


def test_heavy_hitters_exact_drops_null_terms(spark):
    """A genuine NULL term must neither merge with the sentinel total
    nor inflate the stream length."""
    terms = [("a",)] * 6 + [("b",)] * 1 + [(None,)] * 5
    df = spark.createDataFrame(terms, "term string")
    # n = 7 non-null; a: 6*2 > 7 -> in; b: 1*2 < 7 -> out
    got = {(r.term, r.cnt) for r in
           heavy_hitters_exact(df.repartition(3), k=2).collect()}
    assert got == {("a", 6)}
    release_persists()


def test_mg_sentinel_total_is_exact_stream_length(spark):
    toks = _toks(spark)
    n = toks.count()
    summ = mg_heavy_hitters(toks.repartition(5), k=8, with_total=True)
    total = summ.filter(F.col("term").isNull()).collect()
    assert len(total) == 1 and total[0].est == n
    # without the flag, no sentinel row leaks into the summary
    assert mg_heavy_hitters(toks, k=8) \
        .filter(F.col("term").isNull()).count() == 0


def test_heavy_hitters_exact_random_streams(spark):
    """Random Zipf-ish streams × partitionings × k against a plain
    Python count oracle — the property the two-pass plan must hold is
    exactness, independent of how MG decremented its candidates."""
    import numpy as np
    for seed, k, parts in [(1, 4, 3), (2, 8, 7), (3, 16, 1), (4, 5, 13)]:
        rng = np.random.RandomState(seed)
        # Zipf-flavored draw over a small vocab so some terms cross n/k
        vals = rng.zipf(1.6, 400) % 37
        terms = [f"t{v}" for v in vals]
        df = spark.createDataFrame([(x,) for x in terms], "term string")
        from collections import Counter
        true = Counter(terms)
        n = len(terms)
        want = {(t, c) for t, c in true.items() if c * k > n}
        got = {(r.term, r.cnt) for r in
               heavy_hitters_exact(df.repartition(parts), k=k).collect()}
        assert got == want, (seed, k, parts)
    release_persists()


# ----------------------------------------------------- PII redaction

def test_redact_pii_all_categories_and_boundaries(spark):
    df = spark.createDataFrame([
        (0, "mail bob.smith+x@corp.example.com call (415) 555-0100 "
            "from 10.0.144.1 ssn 123-45-6789"),
        # boundary misses: 9-digit run (too short for a phone), dotted
        # version string (not 4 octets), digits glued to a word
        (1, "order 123456789 v1.2.3 build2024 no contact info"),
        (2, "two mails a@b.io c@d.org and phones 212-555-0123 "
            "+1 646 555 0199"),
    ], "doc_id long, text string")
    out = {r.doc_id: r for r in redact_pii(df).collect()}
    r0 = out[0]
    assert (r0.n_email, r0.n_phone, r0.n_ipv4, r0.n_ssn) == (1, 1, 1, 1)
    assert r0.clean_text == ("mail <EMAIL> call <PHONE> "
                             "from <IP> ssn <SSN>")
    r1 = out[1]
    assert (r1.n_email, r1.n_phone, r1.n_ipv4, r1.n_ssn) == (0, 0, 0, 0)
    assert r1.clean_text == df.collect()[1].text
    r2 = out[2]
    assert (r2.n_email, r2.n_phone) == (2, 2)
    assert "<EMAIL>" in r2.clean_text and "@" not in r2.clean_text
    assert "0123" not in r2.clean_text and "0199" not in r2.clean_text


def test_customers_pii_redaction_query_shape(spark):
    from dask_relabeling_spark.plans.curation import (
        customers_pii_redaction)
    rows = customers_pii_redaction(
        spark, "/root/testdata/sf0.001").orderBy("c_custkey").collect()
    assert rows, "empty customer table"
    for r in rows[:50]:
        assert (r.n_email, r.n_phone, r.n_ipv4) == (1, 1, 1)
        assert r.n_ssn == (1 if r.c_custkey % 3 == 0 else 0)
        # every synthesized PII shape was replaced by its placeholder
        assert "<PHONE>" in r.clean_text and "<EMAIL>" in r.clean_text
        assert "<IP>" in r.clean_text and "@" not in r.clean_text
        assert ("<SSN>" in r.clean_text) == (r.c_custkey % 3 == 0)


# ------------------------------------------------- query-only ANN arm

def test_ann_ivfpq_query_parity_and_cache_reuse(spark):
    """Same ranks as the rebuild-per-query arm, and the second call
    reuses the stored index (no rebuild: same path, same files)."""
    from dask_relabeling_spark.plans import llm
    sf = "/root/testdata/sf0.001"
    key = (spark.sparkContext.applicationId, sf)
    llm._IVFPQ_QUERY_CACHE.pop(key, None)
    got1 = [(r.rank, r.vec_id) for r in
            llm.ann_ivfpq_query(spark, sf).collect()]
    path1, _ = llm._IVFPQ_QUERY_CACHE[key]
    stamp = os.stat(f"{path1}/index").st_mtime_ns
    got2 = [(r.rank, r.vec_id) for r in
            llm.ann_ivfpq_query(spark, sf).collect()]
    path2, _ = llm._IVFPQ_QUERY_CACHE[key]
    assert got1 == got2
    assert path2 == path1
    assert os.stat(f"{path1}/index").st_mtime_ns == stamp
    ref = [(r.rank, r.vec_id) for r in
           llm.ann_ivfpq_indexed(spark, sf).collect()]
    assert got1 == ref
