"""Text-analysis operators for large-scale training-data pipelines.

All hot paths are built-in ``pyspark.sql.functions`` expressions (JVM-side,
whole-stage-codegen'd, no Python in the loop): tokenization is
``split``+``filter``, hashes are ``md5``+``conv``, scores are integer
arithmetic.  Every operator keeps a deterministic, oracle-checkable output.

Scale: these are narrow per-row maps over string columns — they pipeline
into the parquet scan with zero shuffles; only the explicit aggregations
(word counts) shuffle, with partial aggregation map-side.
"""
from __future__ import annotations

from typing import Dict, List

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Deterministic per-language marker-token lists for the n-gram/stopword
# language-ID heuristic.  (On the synthetic corpus these are arbitrary but
# fixed; on real text they would be true stopword lists.)
LANG_MARKERS: Dict[str, List[str]] = {
    "de": ["der", "und", "table", "group", "merge"],
    "en": ["the", "a", "row", "scan", "value"],
    "es": ["el", "la", "data", "query", "fast"],
    "fr": ["le", "et", "join", "filter", "sort"],
    "zh": ["hash", "batch", "stream", "window", "big"],
}


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization, empty tokens dropped (JVM-side)."""
    return F.filter(F.split(text, " "), lambda t: t != F.lit(""))


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n_tokens, n_distinct_tokens, avg_token_len (rounded) per row."""
    toks = tokens_col(F.col(text_col))
    n_tok = F.size(toks)
    # when(n > 0): a zero-token doc has no average token length —
    # NULL, matching the oracle's CASE; a bare division ANSI-kills
    # the job on the first empty document (null_parity_sweep)
    # ratio rounds route the double through DECIMAL(27,9) before
    # round(., 6): both engines cast a <=9-decimal double to the SAME
    # exact DECIMAL and round true ties HALF_UP identically, where
    # round(double, 6) splits on binary-inexact 7-decimal ratio ties
    # (round-15 tie audit, e.g. 4007/16000 — Spark rounds the shortest
    # decimal, DuckDB multiplies by 10^6 in IEEE first)
    return df.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.when(n_tok > 0, F.round(
            (F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
             .cast("double") / n_tok).cast("decimal(27,9)"), 6)
            .cast("double")).alias("avg_token_len"),
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic quality signals: length, token count, type-token
    ratio, marker-word ratio — the length/punct/stopword-ratio family."""
    toks = tokens_col(F.col(text_col))
    all_markers = sorted({m for ms in LANG_MARKERS.values() for m in ms})
    marker_arr = F.array(*[F.lit(m) for m in all_markers])
    n_marker = F.size(F.filter(toks,
                               lambda t: F.array_contains(marker_arr, t)))
    n_tok = F.size(toks)
    # when(n > 0): ratios of a zero-token doc are undefined -> NULL
    # (oracle CASE matches); bare division ANSI-kills on empty text
    # DECIMAL-routed ratio rounds (round-15 tie audit): the ties
    # profile's 16000-token/4007-distinct document landed
    # type_token_ratio on the binary-inexact 7-decimal tie 0.2504375,
    # where the engines' scale-6 DOUBLE rounds split (~1 % of random
    # ratio ties measured)
    return df.select(
        "doc_id",
        F.length(text_col).alias("n_chars"),
        n_tok.alias("n_tokens"),
        F.when(n_tok > 0,
               F.round((F.size(F.array_distinct(toks)).cast("double")
                        / n_tok).cast("decimal(27,9)"), 6)
               .cast("double")).alias("type_token_ratio"),
        F.when(n_tok > 0,
               F.round((n_marker.cast("double") / n_tok)
                       .cast("decimal(27,9)"), 6)
               .cast("double")).alias("marker_ratio"),
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-token language ID: per-language score = number of tokens in
    that language's marker list; prediction = argmax, ties resolved to the
    alphabetically-first language (fully deterministic)."""
    toks = tokens_col(F.col(text_col))

    def count_in(markers):
        arr = F.array(*[F.lit(m) for m in markers])
        # single-arg lambda: a defaulted second param would make Spark
        # treat this as an (element, index) lambda
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    scores = {lang: count_in(markers)
              for lang, markers in sorted(LANG_MARKERS.items())}
    best = F.greatest(*scores.values())
    pred = None
    for lang in sorted(LANG_MARKERS, reverse=True):
        cond = scores[lang] == best
        pred = F.when(cond, F.lit(lang)) if pred is None \
            else F.when(cond, F.lit(lang)).otherwise(pred)
    # reversed fold => alphabetically-first language wins ties
    return df.select("doc_id", "lang",
                     pred.alias("pred_lang"),
                     best.alias("best_score"))


def fold_lower(col):
    """Cross-engine total lowercase.  Java's ``toLowerCase`` (what
    Spark's ``lower()`` delegates to for non-ASCII) applies the only
    two Unicode SpecialCasing lowercase rules, which DuckDB's simple
    1:1 ``lower()`` does not: U+0130 'İ' -> 'i' + U+0307 (a 1:2
    mapping; DuckDB yields a dotless 'i') and the context-dependent
    Final_Sigma 'Σ' -> 'ς' (DuckDB always yields 'σ').  Substituting
    those two code points BEFORE ``lower()`` removes both rules'
    inputs, so the engines' lowercase agrees on every string — found
    by the unicode profile of tools/null_parity_sweep.py.  Oracles
    mirror this as ``lower(replace(replace(text,'İ','i̇'),'Σ','σ'))``.

    ASSUMES a locale-root JVM: a tr/az default locale would lowercase
    plain 'I' to dotless 'ı' outside either rule.  ``session.get_spark``
    pins ``Locale.setDefault(ROOT)`` driver-side, and the special-casing
    parity test asserts 'I' -> 'i' through an actual Spark plan."""
    folded = F.regexp_replace(col, "İ", "i̇")
    return F.lower(F.regexp_replace(folded, "Σ", "σ"))


def with_curation_signals(df: DataFrame,
                          text_col: str = "text") -> DataFrame:
    """All curation signals — token count, language-ID, normalized-text
    fingerprint — in ONE select over one scan.

    Column expressions compose where the df-level helpers
    (``with_quality_score`` / ``with_lang_id`` / ``with_fingerprint``)
    would each re-scan the table and need doc_id joins: at 100 TB that is
    three reads plus two shuffles vs. this operator's single pass."""
    toks = tokens_col(F.col(text_col))

    def count_in(markers):
        arr = F.array(*[F.lit(m) for m in markers])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    scores = {lang: count_in(markers)
              for lang, markers in sorted(LANG_MARKERS.items())}
    best = F.greatest(*scores.values())
    pred = None
    for lang in sorted(LANG_MARKERS, reverse=True):
        cond = scores[lang] == best
        pred = F.when(cond, F.lit(lang)) if pred is None \
            else F.when(cond, F.lit(lang)).otherwise(pred)
    norm = F.regexp_replace(fold_lower(F.col(text_col)), r"\s+", " ")
    return df.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        pred.alias("pred_lang"),
        best.alias("best_score"),
        F.md5(norm).alias("fingerprint"))


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 over the normalized (lowercased via
    ``fold_lower``, whitespace-collapsed) text — the hash-groupBy
    dedup key."""
    norm = F.regexp_replace(fold_lower(F.col(text_col)), r"\s+", " ")
    return df.select("doc_id", F.md5(norm).alias("fingerprint"))


def winnowing_fingerprints(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", k: int = 8,
                           w: int = 4) -> DataFrame:
    """Winnowing document fingerprints (the MOSS rolling-hash scheme):
    hash every k-char gram, slide a window of ``w`` consecutive gram
    hashes, keep each window's minimum — the distinct minima are the
    document's fingerprint set.  Guarantees any shared substring of
    length >= k + w - 1 contributes at least one common fingerprint,
    while storing ~2/(w+1) of the gram hashes.

    All JVM-side array expressions (substring/md5/min over slices); a
    narrow map fused with the scan.  Output: (id, n_fingerprints,
    min_fingerprint) — set-level stats that hash-compare across engines.
    """
    txt = F.col(text_col)
    n_grams = F.greatest(F.length(txt) - (k - 1), F.lit(0))
    gram_hash = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: F.conv(F.substr(F.md5(txt.substr(i, F.lit(k))),
                                  F.lit(1), F.lit(8)), 16, 10)
        .cast("long"))
    with_h = df.select(F.col(id_col).alias("id"),
                       F.when(n_grams > 0, gram_hash)
                       .otherwise(F.array().cast("array<long>"))
                       .alias("gh"))
    gh = F.col("gh")
    n_windows = F.greatest(F.size(gh) - (w - 1), F.lit(0))
    mins = F.transform(F.sequence(F.lit(1), n_windows),
                       lambda i: F.array_min(F.slice(gh, i, w)))
    fps = F.array_distinct(F.when(n_windows > 0, mins)
                           .otherwise(F.array().cast("array<long>")))
    return (with_h.select("id", fps.alias("fps"))
            .select("id",
                    F.size("fps").cast("int").alias("n_fingerprints"),
                    F.array_min("fps").alias("min_fingerprint")))


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus word frequencies: explode -> partial+final hash agg."""
    return (df.select(F.explode(tokens_col(F.col(text_col))).alias("tok"))
            .groupBy("tok").agg(F.count("*").alias("cnt")))


def pack_sequences(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", budget: int = 2048) -> DataFrame:
    """Concat-then-chunk sequence packing: documents taken in id order
    form one contiguous token stream, split into fixed ``budget``-token
    training sequences.  Per document: token count, global start offset,
    first/last sequence index it lands in, and its offset inside the
    first sequence — everything a pack-and-shard writer needs.

    The global running offset uses the two-phase
    ``exclusive_prefix_sum`` (range partition -> parallel local cumsum ->
    broadcast partition-prefixes), so no single-partition window at any
    scale; the arithmetic after that is narrow integer math.
    """
    from ..functions.ids import exclusive_prefix_sum

    base = df.select(
        F.col(id_col).alias("id"),
        F.size(tokens_col(F.col(text_col))).cast("long").alias("n_tokens"))
    off = exclusive_prefix_sum(base, "id", "n_tokens", out_col="start_off")
    b = F.lit(budget)
    return off.select(
        "id", "n_tokens", "start_off",
        F.expr(f"start_off div {budget}").alias("seq_first"),
        F.expr(f"(start_off + greatest(n_tokens - 1, 0)) div {budget}")
        .alias("seq_last"),
        (F.col("start_off") % b).alias("offset_in_seq"))


def repetition_signals(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Repetition-based quality signals (the Gopher-rules family):
    duplicate-trigram mass and the share of the single most frequent
    bigram.  All counts stay integers so the contract hash-compares
    across engines; callers derive ratios.

    Two narrow explode->hash-agg pipelines joined on id: partial
    aggregation makes the shuffle per-doc-distinct-gram sized, and the
    join keys are the doc id (no skew beyond document length itself).
    """
    toks = tokens_col(F.col(text_col))
    # NB: Spark's sequence(1, 0) is a DESCENDING [1, 0], not [] (see
    # shingles_col) — the old greatest(size-2, 0) guard still reached
    # sequence(1, 0) for docs under 3 tokens or NULL text, minting two
    # phantom "" grams per doc (found by tools/null_parity_sweep.py);
    # guard with when/otherwise like every other gram site.
    idx3 = F.when(F.size(toks) >= 3,
                  F.sequence(F.lit(1), F.size(toks) - 2)) \
        .otherwise(F.array().cast("array<int>"))
    tri = F.transform(
        idx3,
        lambda i: F.concat_ws(" ", F.element_at(toks, i),
                              F.element_at(toks, i + 1),
                              F.element_at(toks, i + 2)))
    base = df.select(F.col(id_col).alias("id"), toks.alias("tk"),
                     tri.alias("tri"))
    tri_stats = base.select(
        "id",
        F.size("tri").cast("long").alias("n_trigrams"),
        F.size(F.array_distinct("tri")).cast("long")
        .alias("n_distinct_trigrams"))
    idx2 = F.when(F.size(F.col("tk")) >= 2,
                  F.sequence(F.lit(1), F.size(F.col("tk")) - 1)) \
        .otherwise(F.array().cast("array<int>"))
    bi = base.select(
        "id",
        F.explode(F.transform(
            idx2,
            lambda i: F.concat_ws(" ", F.element_at(F.col("tk"), i),
                                  F.element_at(F.col("tk"), i + 1))))
        .alias("bg"))
    bi_stats = (bi.groupBy("id", "bg").agg(F.count("*").alias("c"))
                .groupBy("id")
                .agg(F.sum("c").cast("long").alias("n_bigrams"),
                     F.max("c").cast("long").alias("max_bigram_count")))
    return (tri_stats.join(bi_stats, "id", "left")
            .select("id", "n_trigrams", "n_distinct_trigrams",
                    F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
                    F.coalesce("max_bigram_count", F.lit(0))
                    .alias("max_bigram_count")))


def chunk_documents(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", chunk_tokens: int = 64,
                    stride: int = 48) -> DataFrame:
    """Overlapping token-window chunking (the RAG indexing shape): windows
    of ``chunk_tokens`` tokens every ``stride`` tokens, last window
    partial.  Emits (id, chunk_idx, n_chunk_tokens, chunk_hash) — the
    hash stands in for the chunk text in cross-engine comparison; a real
    indexer would keep the text column instead.

    Narrow explode fused with the scan — the fan-out is
    ceil(n_tokens/stride) rows per document, no shuffle at all.
    """
    toks = tokens_col(F.col(text_col))
    # zero-token docs produce NO chunks (nothing to index) — the old
    # greatest(size, 1) emitted one EMPTY chunk whose hash the engines
    # disagree on (Spark md5(array_join([])) = md5('') but DuckDB's
    # array_to_string([]) is NULL); when/otherwise also avoids the
    # descending sequence(1, 0) trap (null_parity_sweep, edge profile)
    starts = F.when(F.size(toks) > 0,
                    F.sequence(F.lit(1), F.size(toks), F.lit(stride))) \
        .otherwise(F.array().cast("array<int>"))
    base = df.select(F.col(id_col).alias("id"), toks.alias("tk"),
                     F.explode(starts).alias("start"))
    chunk = F.slice(F.col("tk"), F.col("start"), chunk_tokens)
    return base.select(
        "id",
        ((F.col("start") - 1) / stride).cast("long").alias("chunk_idx"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_hash"))


# PII patterns: Java-regex (JVM `regexp_replace`) and intentionally
# conservative — curation-stage scrubbing, not a compliance guarantee.
# Order matters: emails before phones (an email's digits must not be
# half-eaten by the phone pattern first).
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("phone", r"(?<![\w.])(?:\+?\d{1,2}[\s.-]?)?\(?\d{3}\)?[\s.-]?"
              r"\d{3}[\s.-]?\d{4}(?![\w.])", "<PHONE>"),
    ("ipv4", r"(?<!\d)(?:\d{1,3}\.){3}\d{1,3}(?!\d)", "<IP>"),
    ("ssn", r"(?<!\d)\d{3}-\d{2}-\d{4}(?!\d)", "<SSN>"),
)


def redact_pii(df: DataFrame, text_col: str = "text",
               out_col: str = "clean_text") -> DataFrame:
    """Scrub common PII shapes (email / phone / IPv4 / SSN) with typed
    placeholder tokens and count the hits per category.  Entirely
    JVM-side ``regexp_replace`` chained in ONE projection fused into the
    scan — zero shuffles, zero Python; at 100 TB this runs at scan speed
    alongside the other curation signals (composable with
    ``with_curation_signals`` in the same single-pass select).  Counts
    are derived per pattern BEFORE its replacement so categories don't
    shadow each other."""
    cleaned = F.col(text_col)
    counts = []
    for name, pat, token in PII_PATTERNS:
        counts.append(
            (F.size(F.split(cleaned, pat)) - 1)
            .cast("long").alias(f"n_{name}"))
        cleaned = F.regexp_replace(cleaned, pat, token)
    return df.withColumns(
        {f"n_{name}": c for (name, _, _), c
         in zip(PII_PATTERNS, counts)} | {out_col: cleaned})


def hashed_linear_score(df: DataFrame, n_buckets: int = 256,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """fastText-style linear classifier inference over hashed unigram
    features: tokens hash into ``n_buckets`` feature buckets, each
    bucket carries a weight from a (tiny, broadcast) weight table, and
    the document score is the tf-weighted sum.

    The weight table here is generated deterministically on the cluster
    (``spark.range`` — a Knuth-hash integer weight per bucket, the
    stand-in for trained parameters, which at inference time are
    exactly such a small static table).  Every term is integer: the
    score is an exact int64 sum, order-independent and
    engine-portable.  Shape: narrow explode -> broadcast join on the
    bucket id -> one partial+final agg on the doc id.
    """
    from .dedup import token_hash
    spark = df.sparkSession
    weights = (spark.range(n_buckets).select(
        F.col("id").alias("bucket"),
        ((F.col("id") * 2654435761) % 2001 - 1000).alias("w")))
    feats = (df.select(F.col(id_col).alias("id"),
                       F.explode(tokens_col(F.col(text_col)))
                       .alias("term"))
             .groupBy("id",
                      (token_hash(F.col("term")) % n_buckets)
                      .alias("bucket"))
             .agg(F.count("*").alias("tf")))
    return (feats.join(F.broadcast(weights), "bucket")
            .groupBy(F.col("id").alias(id_col))
            .agg(F.sum(F.col("tf") * F.col("w")).alias("score"))
            .withColumn("label",
                        (F.col("score") > 0).cast("int")))


def bpe_pair_counts(df: DataFrame, k: int = 20,
                    text_col: str = "text") -> DataFrame:
    """One step of BPE tokenizer training: corpus-wide counts of
    adjacent token pairs, top-k merge candidates.

    The groupBy is map-side-combinable (pair cardinality ~= vocab^2
    effective, but partial agg collapses each partition before the
    exchange) and the top-k is orderBy+limit — Spark plans
    TakeOrderedAndProject (bounded per-partition heap + driver merge),
    never a global sort or single-partition window.  Ties break on the
    pair string so the result is total-ordered.
    """
    # materialize the token array behind a projection before indexing
    # into it (element_at over the raw split() re-tokenizes per element)
    toks = df.select(tokens_col(F.col(text_col)).alias("tk"))
    tk = F.col("tk")
    idx = F.when(F.size(tk) >= 2, F.sequence(F.lit(1), F.size(tk) - 1)) \
        .otherwise(F.array().cast("array<int>"))
    pairs = F.transform(idx, lambda i: F.concat_ws(
        " ", F.element_at(tk, i), F.element_at(tk, i + 1)))
    return (toks.select(F.explode(pairs).alias("pair"))
            .groupBy("pair").agg(F.count("*").alias("cnt"))
            .orderBy(F.desc("cnt"), F.col("pair"))
            .limit(k))
