"""Round-10 null/dirty-input robustness regressions, from the
tools/null_parity_sweep.py findings: the sequence(1, 0)-descending
phantom-gram bug in ``repetition_signals`` (latent on CLEAN data for
any document under 3 tokens), the non-null order-statistic convention
in the exact-quantile machinery, the NULL-text exclusion in the media
adapter plus the clear NULL-payload error in the featurizer, and the
total weight function for digitless source names.
"""
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dask_relabeling_spark.functions.quantiles import (
    exact_quantiles, grouped_exact_quantiles)
from dask_relabeling_spark.operators.multimodal import (
    decode_and_featurize, documents_as_media)
from dask_relabeling_spark.operators.text import repetition_signals


def test_repetition_signals_short_and_null_docs(spark):
    # Spark's sequence(1, 0) is DESCENDING [1, 0]: before the guard,
    # every doc under 3 tokens got two phantom "" trigrams (and under
    # 2 tokens two phantom "" bigrams) — on clean data too.
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "one"), (4, "one two"),
         (5, "a b a b")],
        "doc_id long, text string")
    rows = {r.id: r for r in repetition_signals(df).collect()}
    for doc in (1, 2, 3):                      # 0- and 1-token docs
        assert rows[doc].n_trigrams == 0, rows[doc]
        assert rows[doc].n_distinct_trigrams == 0
    for doc in (1, 2):                         # under 2 tokens
        assert rows[doc].n_bigrams == 0
        assert rows[doc].max_bigram_count == 0
    assert rows[4].n_bigrams == 1 and rows[4].n_trigrams == 0
    # 4 tokens: 2 trigrams ("a b a", "b a b"), 3 bigrams, "a b" twice
    assert rows[5].n_trigrams == 2 and rows[5].n_distinct_trigrams == 2
    assert rows[5].n_bigrams == 3 and rows[5].max_bigram_count == 2


def test_exact_quantiles_ignore_nulls(spark):
    # order statistics are over NON-NULL values: with NULLs in the
    # column the thresholds must equal those of the null-free column
    # (Spark ranks NULL first, DuckDB last — both conventions are
    # wrong answers for a percentile)
    vals = [(float(v),) for v in range(1, 101)]
    clean = spark.createDataFrame(vals, "v double")
    dirty = spark.createDataFrame(vals + [(None,)] * 7, "v double")
    qs = [("p01", 1, 100), ("p50", 1, 2), ("p99", 99, 100)]
    got_clean = {r.q: r.value for r in
                 exact_quantiles(clean, "v", qs).collect()}
    got_dirty = {r.q: r.value for r in
                 exact_quantiles(dirty, "v", qs).collect()}
    # type-1 lower statistics: k = num*(n-1)//den over the 100
    # non-null values -> ranks 0, 49, 98
    assert got_clean == got_dirty == {"p01": 1.0, "p50": 50.0,
                                      "p99": 99.0}


def test_grouped_quantiles_allnull_group_has_no_row(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", None),
         ("b", None), ("b", None)],
        "g string, v double")
    out = grouped_exact_quantiles(df, "v", "g", [("p50", 1, 2)]).collect()
    # group a: median over the 3 non-null values; group b: no order
    # statistics exist, so no row (never an engine-dependent NULL rank)
    assert [(r.g, r.value) for r in out] == [("a", 2.0)]


def test_documents_as_media_excludes_null_text(spark):
    docs = spark.createDataFrame(
        [(1, "abc"), (2, None), (3, "")],
        "doc_id long, text string")
    media = documents_as_media(docs)
    assert sorted(r.media_id for r in media.collect()) == [1, 3]
    # the whole pipeline survives the dirty corpus (empty payload ok)
    feats = decode_and_featurize(media).collect()
    assert sorted(r.media_id for r in feats) == [1, 3]


def test_decode_featurize_null_payload_clear_error(spark):
    import pyspark.sql.types as T
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.StructType([
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_frames", T.IntegerType())])),
    ])
    media = spark.createDataFrame(
        [(7, "image", None, (1, 1, None, None))], schema)
    with pytest.raises(Exception, match="NULL payload for media_id=7"):
        decode_and_featurize(media).collect()


def test_cosine_zero_vector_is_null_not_crash(spark):
    # a zero-norm embedding (failed job) must score NULL — under ANSI
    # mode the old bare division killed the whole query; and NULL
    # sorts last, so the dead vector never wins a top-k slot
    from dask_relabeling_spark.operators.similarity import (
        cosine_neardup_pairs, cosine_topk)
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 0.0])],
        "vec_id long, embedding array<double>")
    top = cosine_topk(emb, [1.0, 0.0], k=3).collect()
    assert [r.vec_id for r in top] == [0, 1, 2]   # zero vector LAST
    pairs = cosine_neardup_pairs(emb, 9, 10).collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(0, 1)]  # no 0-norm


def test_token_stats_empty_text_null_ratios(spark):
    from dask_relabeling_spark.operators.text import (
        with_quality_score, with_token_stats)
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "a bb")], "doc_id long, text string")
    ts = {r.doc_id: r for r in with_token_stats(df).collect()}
    assert ts[1].avg_token_len is None and ts[2].avg_token_len is None
    assert ts[3].avg_token_len == 1.5
    qs = {r.doc_id: r for r in with_quality_score(df).collect()}
    assert qs[1].type_token_ratio is None and qs[1].marker_ratio is None
    assert qs[3].type_token_ratio == 1.0


def test_chunk_documents_empty_doc_no_chunks(spark):
    from dask_relabeling_spark.operators.text import chunk_documents
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "a b c")], "doc_id long, text string")
    out = chunk_documents(df).collect()
    # zero-token docs produce NO chunks (the engines disagree on the
    # hash of an empty chunk: md5('') vs NULL)
    assert [(r.id, r.n_chunk_tokens) for r in out] == [(3, 3)]


def test_finite_or_null(spark):
    from dask_relabeling_spark.plans.relational import finite_or_null
    df = spark.createDataFrame(
        [(1, 1.5), (2, float("nan")), (3, float("inf")),
         (4, float("-inf")), (5, None)], "id long, v double")
    got = {r.id: r.f for r in
           df.select("id", finite_or_null("v").alias("f")).collect()}
    assert got == {1: 1.5, 2: None, 3: None, 4: None, 5: None}


def test_weighted_interleave_digitless_source(spark, tmp_path):
    # a source name with no digit used to KILL the query on both
    # engines (regexp_extract '' -> ANSI cast error); weight must be
    # total over source names
    import __spark_entry__ as E
    import shutil
    sf = str(tmp_path / "sf")
    src = "/root/testdata/sf0.001"
    shutil.copytree(src, sf)
    docs = spark.read.parquet(f"{src}/documents.parquet")
    extra = spark.createDataFrame(
        [(9000001, "t t", None, "books", 3),
         (9000002, "u u", "en", None, 3)],
        docs.schema)
    (docs.unionByName(extra).coalesce(1).write.mode("overwrite")
     .parquet(f"{sf}/documents.parquet"))
    out = E.queries()["docs_weighted_interleave"](spark, sf).toPandas()
    got = out.set_index("doc_id")
    # digitless and NULL sources fall back to weight 1: every round
    # has exactly slot 0
    assert (got.loc[[9000001, 9000002], "mix_slot"] == 0).all()


def test_fold_lower_matches_duckdb_on_special_casing(spark):
    # Java's toLowerCase applies the two Unicode SpecialCasing rules
    # (U+0130 'İ' -> 'i' + U+0307, Final_Sigma 'Σ' -> 'ς') that
    # DuckDB's 1:1 lower() does not; fold_lower pre-substitutes both
    # code points so the engines' lowercase agrees on EVERY string
    import duckdb
    from dask_relabeling_spark.operators.text import fold_lower
    # the get_spark locale pin must have stuck: a non-ROOT JVM locale
    # (tr/az) breaks fold_lower in ways the İ/Σ pre-substitution cannot
    # cover, and session.py warns-but-continues, so assert here
    jvm = spark.sparkContext._jvm
    assert jvm.java.util.Locale.getDefault().toLanguageTag() == "und"
    texts = ["İstanbul DİYARBAKIR", "ΑΣ ΣΟΦΟΣ", "straße STRASSE",
             "café café", "中文 👍🏽", "plain ASCII Text"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "id long, text string")
    got = {r.id: r.f for r in
           df.select("id", fold_lower(F.col("text")).alias("f"))
           .collect()}
    con = duckdb.connect()
    for i, t in enumerate(texts):
        want = con.execute(
            "SELECT lower(replace(replace(?, 'İ', 'i̇'), 'Σ', 'σ'))",
            [t]).fetchone()[0]
        assert got[i] == want, (t, got[i], want)


def test_media_substrate_ascii_projection_exact_bytes(spark):
    # a multibyte doc used to emit an OVERSIZED raster (chars cycled,
    # bytes emitted) that matched neither the oracle's ascii() replay
    # nor Y4M's frame-size check; the ASCII projection restores
    # 1 char == 1 byte for any unicode text
    from dask_relabeling_spark.operators.multimodal import (
        documents_as_pgm_media)
    df = spark.createDataFrame(
        [(1, "👍🏽 emoji 🚀 café\xa0ΑΣ"), (2, "plain ascii")],
        "doc_id long, text string")
    rows = {r.media_id: bytes(r.payload)
            for r in documents_as_pgm_media(df, w=4, h=4).collect()}
    header = b"P5\n4 4\n255\n"
    for mid, payload in rows.items():
        assert payload.startswith(header)
        assert len(payload) == len(header) + 16, (mid, len(payload))
        raster = payload[len(header):]
        assert all(0x20 <= b <= 0x7E for b in raster), (mid, raster)
    # each non-ASCII code point (incl. astral emoji and the combining
    # mark) became exactly one '?'
    assert rows[1][len(header):].startswith(b"?? emoji ? caf")


def test_winsorize_all_null_column(spark, tmp_path):
    # all-NULL value column: the quantile table is empty, so the
    # thresholds row is dropped (inner-join semantics) and the query
    # yields ZERO rows — matching the oracle, whose CROSS JOIN over
    # empty p01/p99 CTEs is empty (round-10 ADVICE; this is the test
    # cited at plans/curation.py events_value_winsorize_counts)
    import duckdb
    from dask_relabeling_spark.plans import REGISTRY
    fn, oracle = REGISTRY["events_value_winsorize_counts"]
    con = duckdb.connect()
    con.execute(
        "COPY (SELECT * REPLACE (CAST(NULL AS DOUBLE) AS value) "
        "FROM read_parquet('/root/testdata/sf0.001/events.parquet')) "
        f"TO '{tmp_path}/events.parquet' (FORMAT PARQUET)")
    assert fn(spark, str(tmp_path)).count() == 0
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    assert len(con.execute(oracle).fetchall()) == 0
