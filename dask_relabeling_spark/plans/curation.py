"""Round-3 training-data-pipeline extensions: iterative k-means,
sparse TF-IDF similarity join, binned interval-overlap join, hashed
linear classifier inference, BPE merge-candidate counting, incremental
ingest dedup, z-order layout keys, exact distributed quantiles,
PPJoin prefix-filtered set similarity, and CDC MERGE/upsert.

Every query keeps the package's determinism discipline: integer or
exact-decimal arithmetic wherever a sum crosses a shuffle, distance
folds in array-index order on both engines, rational thresholds, and
quantized centroids between k-means iterations — so each DuckDB oracle
matches by value hash, not approximately.
"""
from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.ids import zorder_key
from ..operators.clustering import kmeans_assignments
from ..operators.dedup import incremental_new_docs, tfidf_cosine_pairs
from ..operators.intervals import overlap_join_binned
from ..operators.similarity import as_vec
from ..operators.text import bpe_pair_counts, hashed_linear_score
from .llm import _DUCK_VEC
from .relational import finite_or_null, register, t

_DUCK_H32 = "CAST('0x' || substr(md5({x}), 1, 8) AS BIGINT)"


# --------------------------------------------------- iterative k-means
def _milli_mean_sql(s: str, n: str) -> str:
    """Round-half-up(1000 * s / n) as a DOUBLE, via exact integer
    floor-division and a single final IEEE division by 1000.0 — the
    engine-build-portable quantization shared with
    ``embedding_label_centroids`` (subtracting the non-negative residue
    makes the integer division exact, so ``//`` semantics don't
    matter)."""
    num = f"(2 * {s} + {n} * 1000000)"
    den = f"(2 * {n} * 1000000)"
    return (f"CAST(({num} - ((({num} % {den}) + {den}) % {den}))"
            f" // {den} AS BIGINT) / 1000.0")


def _kmeans_ctes(k, n_iter: int = 2) -> str:
    """CTE chain (no WITH keyword) replaying the Spark k-means operator
    step-for-step, ending at assignment table ``a{n_iter}``.  The
    left-fold ``list_reduce`` matches Spark's ``aggregate`` fold order;
    centroid components are exact BIGINT nano-unit sums quantized to
    milli-units by integer arithmetic (``_milli_mean_sql``), so both
    engines iterate on bit-identical centroids regardless of build.

    ``k`` may be an int literal or a SQL expression string (e.g. a
    scalar subquery over a preceding CTE) — it is only compared against
    a row_number rank, mirroring the Spark operator's sort+limit init,
    which tolerates sparse/offset id spaces."""
    dist = ("list_reduce(list_transform(generate_series(1, len(v.ve)), "
            "i -> (v.ve[i] - c.cv[i]) * (v.ve[i] - c.cv[i])), "
            "(a, b) -> a + b)")
    sql = f"""v AS (SELECT vec_id,
                  {_DUCK_VEC} AS ve
           FROM embeddings),
c1 AS (SELECT cid, cv FROM (
         SELECT CAST(vec_id AS BIGINT) AS cid, ve AS cv,
                row_number() OVER (ORDER BY vec_id) AS rn
         FROM v) WHERE rn <= {k})"""
    for it in range(1, n_iter + 1):
        sql += f""",
d{it} AS (SELECT v.vec_id, c.cid, {dist} AS d FROM v, c{it} c),
a{it} AS (SELECT vec_id, cid AS cluster FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
    FROM d{it}) WHERE rn = 1)"""
        if it < n_iter:
            sql += f""",
x{it} AS (SELECT a{it}.cluster AS cid,
                 unnest(generate_series(1, len(v.ve))) AS pos,
                 unnest(list_transform(v.ve,
                        x -> CAST(floor(x * 1000000000 + 0.5)
                                  AS BIGINT))) AS nano
          FROM v JOIN a{it} USING (vec_id)),
m{it} AS (SELECT cid, pos,
                 {_milli_mean_sql('sum(nano)', 'count(*)')} AS val
          FROM x{it} GROUP BY 1, 2),
c{it + 1} AS (SELECT cid, list(val ORDER BY pos) AS cv
              FROM m{it} GROUP BY cid)"""
    return sql


def _kmeans_sql(k: int = 8, n_iter: int = 2) -> str:
    return (f"WITH {_kmeans_ctes(k, n_iter)}\n"
            f"SELECT vec_id, cluster FROM a{n_iter}\n")


@register("embedding_kmeans", _kmeans_sql())
def embedding_kmeans(spark, sf_dir):
    """Two unrolled Lloyd iterations, k=8, init = lowest-id vectors
    (labels stay LONG end to end — no INT narrowing that could collide
    distinct >2^31 centroid ids).  Assignment is a narrow map against a
    packed 1-row broadcast of the centroids; the update is a
    (cluster, dim)-keyed partial+final agg over exact integer
    nano-unit sums (see operators/clustering.py)."""
    return kmeans_assignments(t(spark, sf_dir, "embeddings"),
                              k=8, n_iter=2)


# ------------------------------------------- sparse TF-IDF pair join
@register("docs_tfidf_cosine_pairs", """
WITH tok AS (
  SELECT doc_id AS id,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents),
tf AS (SELECT id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
w AS (SELECT id, term, tf * (n.n_docs // df) AS w
      FROM tf JOIN dfreq USING (term), n WHERE df <= 100),
norms AS (SELECT id, sum(w * w) AS n2 FROM w GROUP BY 1),
dots AS (SELECT a.id AS id_a, b.id AS id_b, sum(a.w * b.w) AS dot
         FROM w a JOIN w b ON a.term = b.term AND a.id < b.id
         GROUP BY 1, 2),
scored AS (
  SELECT id_a, id_b, CAST(dot AS BIGINT) AS dot,
         CAST(floor(CAST(dot AS DOUBLE)
                    / (sqrt(CAST(na.n2 AS DOUBLE))
                       * sqrt(CAST(nb.n2 AS DOUBLE)))
                    * 1000000.0) AS BIGINT) AS sim_micro
  FROM dots JOIN norms na ON na.id = id_a JOIN norms nb ON nb.id = id_b)
SELECT * FROM scored WHERE sim_micro >= 800000
""")
def docs_tfidf_cosine_pairs(spark, sf_dir):
    """Inverted-index TF-IDF cosine pairs (integer weights, exact int64
    dots, micro-unit output) — see operators/dedup.py:
    tfidf_cosine_pairs for the scale analysis."""
    return tfidf_cosine_pairs(t(spark, sf_dir, "documents"))


# ------------------------------------- binned interval-overlap join
@register("events_session_overlap", """
WITH g AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w > 1800
              OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS brk
  FROM events WHERE ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, ts,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM g),
sess AS (SELECT user_id, CAST(sid AS BIGINT) AS session_idx,
                min(ts) AS s_start, max(ts) AS s_end,
                CAST(count(*) AS BIGINT) AS n_events
         FROM s GROUP BY 1, 2),
hours AS (SELECT date_trunc('hour', ts) AS h, count(*) AS c
          FROM events WHERE ts IS NOT NULL GROUP BY 1),
win AS (SELECT h FROM hours ORDER BY c DESC, h LIMIT 3)
SELECT user_id, session_idx, n_events, h AS window_start,
       least(epoch_us(s_end), epoch_us(h + INTERVAL 1 HOUR))
       - greatest(epoch_us(s_start), epoch_us(h)) AS overlap_us
FROM sess JOIN win
  ON s_start <= h + INTERVAL 1 HOUR AND h <= s_end
""")
def events_session_overlap(spark, sf_dir):
    """Range join done right: user sessions (gap > 30 min splits)
    overlap-joined against the 3 globally busiest clock hours via the
    hour-bucket bin join (operators/intervals.py) — candidates come
    from an equi-join on the bucket, each pair exactly once, the exact
    closed-interval predicate as a post-join filter.  The oracle uses
    the direct theta join (same semantics, oracle-scale only).

    NULL-ts events are off the timeline on both sides (the same
    round-12 convention as events_sessionize — the engines' opposite
    window NULL ordering would otherwise split sessions differently,
    and a NULL hour bucket could displace a top-3 busiest hour)."""
    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    brk = F.when(F.lag("ts").over(w).isNull()
                 | (gap > 1800 * 1_000_000), 1).otherwise(0)
    sess = (ev.select("user_id", "event_id", "ts")
            .withColumn("brk", brk)
            .withColumn("session_idx",
                        F.sum("brk").over(
                            w.rowsBetween(Window.unboundedPreceding, 0))
                        .cast("bigint"))
            .groupBy("user_id", "session_idx")
            .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"),
                 F.count("*").alias("n_events")))
    wins = (ev.groupBy(F.date_trunc("hour", "ts").alias("w_start"))
            .agg(F.count("*").alias("c"))
            .orderBy(F.desc("c"), F.col("w_start")).limit(3)
            .select("w_start",
                    (F.col("w_start") + F.expr("INTERVAL 1 HOUR"))
                    .alias("w_end")))
    out = overlap_join_binned(sess, wins, "s_start", "s_end",
                              "w_start", "w_end", bin_seconds=3600)
    return out.select("user_id", "session_idx", "n_events",
                      F.col("w_start").alias("window_start"),
                      "overlap_us")


# ------------------------------------- hashed linear classifier
@register("docs_quality_classifier", f"""
WITH wt AS (SELECT i AS bucket, (i * 2654435761) % 2001 - 1000 AS w
            FROM generate_series(0, 255) t(i)),
tok AS (SELECT doc_id,
               unnest(list_filter(string_split(text, ' '),
                                  x -> x <> '')) AS term
        FROM documents),
feats AS (SELECT doc_id,
                 {_DUCK_H32.format(x='term')} % 256 AS bucket,
                 count(*) AS tf
          FROM tok GROUP BY 1, 2)
SELECT doc_id, CAST(sum(tf * w) AS BIGINT) AS score,
       CAST(CAST(sum(tf * w) AS BIGINT) > 0 AS INT) AS label
FROM feats JOIN wt USING (bucket)
GROUP BY doc_id
""")
def docs_quality_classifier(spark, sf_dir):
    """Linear classifier inference over hashed unigram features: narrow
    explode -> broadcast weight join -> one doc-keyed agg; integer
    scores end to end (operators/text.py: hashed_linear_score)."""
    return hashed_linear_score(t(spark, sf_dir, "documents"))


# ------------------------------------- unaligned duplicate spans
@register("docs_duplicate_spans", f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
  FROM documents),
w AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, greatest(len(tk) - 7, 0)),
           i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' ||
                tk[i+3] || ' ' || tk[i+4] || ' ' || tk[i+5] || ' ' ||
                tk[i+6] || ' ' || tk[i+7])) AS win
  FROM toks),
wh AS (SELECT doc_id, {_DUCK_H32.format(x='win')} AS h FROM w),
shared AS (SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS nd
                          FROM wh GROUP BY h) WHERE nd > 1)
SELECT wh.doc_id, CAST(count(*) AS BIGINT) AS n_windows,
       CAST(sum(CASE WHEN shared.h IS NULL THEN 0 ELSE 1 END)
            AS BIGINT) AS n_shared_windows
FROM wh LEFT JOIN shared ON shared.h = wh.h
GROUP BY wh.doc_id
""")
def docs_duplicate_spans(spark, sf_dir):
    """Unaligned duplicate-SPAN detection (the Lee et al. 2022
    'Deduplicating Training Data' substring shape): stride-1 8-token
    windows, so duplicated passages are caught at ANY offset — the
    regime fixed-boundary segment dedup (``docs_segment_dedup``)
    structurally misses.  Per doc: total windows and windows whose
    hash occurs in >1 document (the doc's duplicated-span exposure; a
    downstream pass drops or trims docs above a threshold).

    Scale shape: the window stream is ~n_tokens rows (the bigram-LM
    cost class) carried as 8-byte hashes, one (hash)-keyed count
    distinct + one hash-keyed semi-ish join back — partial-agg'd both
    sides, AQE splits boilerplate-hash skew; nothing all-pairs,
    nothing driver-side."""
    from ..operators.dedup import _fan_out, token_hash
    from ..operators.text import tokens_col
    # materialize the token array ONCE per doc before indexing into it:
    # element_at over the raw split(...) expression would re-tokenize
    # per window element (no CSE across HOF lambdas — the
    # _distinct_shingle_table lesson; 3.4x measured here), and _fan_out
    # spreads the single-file scan across cores
    d = (_fan_out(t(spark, sf_dir, "documents"))
         .select("doc_id", tokens_col(F.col("text")).alias("tk")))
    tk = F.col("tk")
    idx = F.when(F.size(tk) >= 8,
                 F.sequence(F.lit(1), F.size(tk) - 7)) \
        .otherwise(F.array().cast("array<int>"))
    win = F.transform(idx, lambda i: F.concat_ws(
        " ", *[F.element_at(tk, i + k) for k in range(8)]))
    wh = (d.select("doc_id", F.explode(win).alias("win"))
          .select("doc_id", token_hash(F.col("win")).alias("h")))
    shared = (wh.groupBy("h")
              .agg(F.countDistinct("doc_id").alias("nd"))
              .filter(F.col("nd") > 1)
              .select("h", F.lit(1).alias("is_shared")))
    return (wh.join(shared, "h", "left")
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_windows"),
                 F.sum(F.coalesce("is_shared", F.lit(0))).cast("long")
                 .alias("n_shared_windows")))


# ------------------------------------- contrastive negative sampling
@register("docs_negative_samples", f"""
WITH nn AS (SELECT count(*) AS n FROM documents),
s AS (SELECT doc_id, j.j,
             {_DUCK_H32.format(
                 x="CAST(doc_id AS VARCHAR) || '|' || CAST(j.j AS VARCHAR)")}
               % nn.n AS raw
      FROM documents, nn, generate_series(1, 2) j(j))
SELECT doc_id, CAST(j AS INT) AS j,
       CAST(CASE WHEN raw = doc_id THEN (raw + 1) % (SELECT n FROM nn)
                 ELSE raw END AS BIGINT) AS neg_id
FROM s
""")
def docs_negative_samples(spark, sf_dir):
    """Contrastive-training negative sampling: k=2 deterministic
    pseudo-random negatives per document — ``md5(doc_id | j) mod n``,
    bumped by one on self-collision.  Stateless seeded hashing (the
    package's sampling discipline): no RNG state to synchronize across
    executors, identical on reruns and engines, and at 100 TB the
    sample is a narrow map over the corpus plus one broadcast scalar n
    — no shuffle at all.  (Relies on dense 0-based doc ids, as the
    driver corpus has; for sparse ids compose with the dense re-index
    pass first.)"""
    from ..operators.dedup import token_hash
    d = t(spark, sf_dir, "documents")
    n_row = F.broadcast(d.agg(F.count("*").alias("n")))
    ex = (d.crossJoin(n_row)
          .select("doc_id", "n",
                  F.explode(F.array(F.lit(1), F.lit(2))).alias("j")))
    raw = token_hash(F.concat(F.col("doc_id").cast("string"),
                              F.lit("|"),
                              F.col("j").cast("string"))) % F.col("n")
    return (ex.withColumn("raw", raw)
            .select("doc_id", F.col("j").cast("int").alias("j"),
                    F.when(F.col("raw") == F.col("doc_id"),
                           (F.col("raw") + 1) % F.col("n"))
                    .otherwise(F.col("raw"))
                    .cast("long").alias("neg_id")))


# ------------------------------------- deterministic HLL sketch
@register("events_hll_distinct_users", f"""
WITH h AS (
  SELECT event_type, user_id,
         {_DUCK_H32.format(x="CAST(user_id AS VARCHAR)")} AS hh
  FROM events),
b AS (SELECT event_type, hh % 64 AS bucket, hh // 64 AS w FROM h),
r AS (SELECT event_type, bucket,
             CASE WHEN w = 0 THEN 27
                  ELSE CAST(log2(w & -w) AS INT) + 1 END AS rho
      FROM b),
mx AS (SELECT event_type, bucket, max(rho) AS mr
       FROM r GROUP BY 1, 2),
s AS (SELECT event_type,
             sum(1.0 / (CAST(1 AS BIGINT) << mr)) AS s_present,
             count(*) AS nb
      FROM mx GROUP BY 1),
ex AS (SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT)
              AS n_exact
       FROM events GROUP BY 1)
SELECT s.event_type, ex.n_exact,
       CAST(floor(0.709 * 4096.0 /
                  (s.s_present + (64 - s.nb) * 1.0)) AS BIGINT)
         AS hll_estimate
FROM s JOIN ex ON ex.event_type = s.event_type
""")
def events_hll_distinct_users(spark, sf_dir):
    """HyperLogLog distinct-user estimate per event type — as a
    HASH-CHECKED query, not just a pytest sketch: because the register
    hash is the portable 32-bit md5 hash and the harmonic sum's terms
    are exact powers of two (each addition needs < 34 mantissa bits),
    the whole sketch is bit-deterministic across shuffle orders AND
    engines, so the oracle replays the estimate exactly.  m=64
    buckets (p=6), rho = trailing-zero rank of the remaining 26 hash
    bits (via the w & -w lowest-set-bit trick + an exact log2 of a
    power of two), raw alpha_64 * m^2 / S estimator (no small-range
    correction — deterministic contract, documented).  Exact distinct
    counts ride along for accuracy eyeballing.  Shape: one (type,
    bucket)-keyed partial+final max, one per-type sum over <= 64 rows
    — the mergeable-sketch scale pattern with a checked answer."""
    from ..operators.dedup import token_hash
    ev = t(spark, sf_dir, "events")
    h = (ev.select("event_type",
                   token_hash(F.col("user_id").cast("string")).alias("hh"))
         .select("event_type", (F.col("hh") % 64).alias("bucket"),
                 F.expr("hh div 64").alias("w")))
    rho = F.when(F.col("w") == 0, F.lit(27)).otherwise(
        F.log2(F.expr("w & -w")).cast("int") + 1)
    mx = (h.select("event_type", "bucket", rho.alias("rho"))
          .groupBy("event_type", "bucket")
          .agg(F.max("rho").alias("mr")))
    s = (mx.groupBy("event_type")
         .agg(F.sum(F.lit(1.0) / F.expr("shiftleft(1L, mr)"))
              .alias("s_present"),
              F.count("*").alias("nb")))
    est = F.floor(F.lit(0.709) * F.lit(4096.0)
                  / (F.col("s_present")
                     + (F.lit(64) - F.col("nb")).cast("double")))
    ex = (ev.groupBy("event_type")
          .agg(F.countDistinct("user_id").cast("long").alias("n_exact")))
    return (s.join(ex, "event_type")
            .select("event_type", "n_exact",
                    est.cast("long").alias("hll_estimate")))
@register("docs_gdpr_purge", """
WITH del AS (SELECT doc_id FROM documents WHERE doc_id % 97 = 13),
kept AS (SELECT d.doc_id, d.source FROM documents d
         LEFT JOIN del ON del.doc_id = d.doc_id
         WHERE del.doc_id IS NULL),
tot AS (SELECT source, count(*) AS n_total FROM documents GROUP BY 1),
kg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
              CAST(sum(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                           1, 8) AS BIGINT))
                   AS BIGINT) AS survivor_fp
       FROM kept GROUP BY source)
SELECT kg.source, CAST(tot.n_total - kg.n_kept AS BIGINT) AS n_purged,
       kg.n_kept, kg.survivor_fp
FROM kg JOIN tot ON tot.source = kg.source
""")
def docs_gdpr_purge(spark, sf_dir):
    """Right-to-be-forgotten maintenance: anti-join the corpus against
    a deletion list (here ids ≡ 13 mod 97 — in production, the tombstone
    table), emit a per-source audit row: purged/retained counts plus a
    set fingerprint over the surviving ids, the verifiable receipt a
    compliance process wants.  The anti-join is the shape Delta/Iceberg
    DELETE executes (at scale it prunes via bloom/file skipping on the
    id); the fingerprint is the SUM of per-id 32-bit md5 hashes —
    order-independent and partial-aggregable, so a hot source combines
    map-side instead of funnelling its whole id set through one task
    (a sorted-concat digest would)."""
    from ..operators.dedup import token_hash
    d = t(spark, sf_dir, "documents")
    kept = d.join(d.filter(F.col("doc_id") % 97 == 13).select("doc_id"),
                  "doc_id", "left_anti")
    totals = d.groupBy("source").agg(F.count("*").alias("n_total"))
    return (kept.groupBy("source")
            .agg(F.count("*").cast("long").alias("n_kept"),
                 F.sum(token_hash(F.col("doc_id").cast("string")))
                 .cast("long").alias("survivor_fp"))
            .join(F.broadcast(totals), "source")
            .select("source",
                    (F.col("n_total") - F.col("n_kept")).cast("long")
                    .alias("n_purged"),
                    "n_kept", "survivor_fp"))


@register("customers_pii_redaction", """
SELECT c_custkey,
       CAST(1 AS BIGINT) AS n_email,
       CAST(1 AS BIGINT) AS n_phone,
       CAST(1 AS BIGINT) AS n_ipv4,
       CAST(CASE WHEN c_custkey % 3 = 0 THEN 1 ELSE 0 END AS BIGINT)
         AS n_ssn,
       concat_ws(' ', c_name, 'call', '<PHONE>', 'mail', '<EMAIL>',
                 'from', '<IP>',
                 CASE WHEN c_custkey % 3 = 0 THEN 'ssn <SSN>'
                      ELSE 'no ssn on file' END) AS clean_text
FROM customer
""")
def customers_pii_redaction(spark, sf_dir):
    """PII scrubbing of contact freetext (operators/text.py:redact_pii):
    email / phone / IPv4 / SSN shapes become typed placeholder tokens
    with per-category hit counts, all in ONE chained JVM
    ``regexp_replace`` projection fused into the scan — zero shuffles,
    zero Python, scan-speed at 100 TB.

    The corpus text is synthesized deterministically from c_custkey
    (the test tables carry no organic PII), which makes the oracle an
    INDEPENDENT derivation rather than a regex replay: it constructs
    the expected post-redaction string directly, so a pattern that
    over- or under-matches (e.g. the phone regex eating an IP octet
    run, a lookaround off by one) breaks the hash even though both
    engines would happily run the same buggy regex."""
    from ..operators.text import redact_pii
    key = F.col("c_custkey")
    s = lambda c: c.cast("string")  # noqa: E731
    phone = F.concat(F.lit("("), s(key % 900 + 100), F.lit(") "),
                     s((key * 7) % 900 + 100), F.lit("-"),
                     s((key * 13) % 9000 + 1000))
    email = F.concat(F.lit("cust"), s(key), F.lit("@example.com"))
    ip = F.concat(F.lit("10."), s(key % 256), F.lit("."),
                  s((key * 3) % 256), F.lit("."), s(key % 254 + 1))
    ssn = F.concat(s(key % 900 + 100), F.lit("-"),
                   s(key % 90 + 10), F.lit("-"),
                   s(key % 9000 + 1000))
    text = F.concat_ws(
        " ", F.col("c_name"), F.lit("call"), phone,
        F.lit("mail"), email, F.lit("from"), ip,
        F.when(key % 3 == 0, F.concat(F.lit("ssn "), ssn))
         .otherwise(F.lit("no ssn on file")))
    c = t(spark, sf_dir, "customer").select(
        "c_custkey", text.alias("text"))
    return redact_pii(c).select("c_custkey", "n_email", "n_phone",
                                "n_ipv4", "n_ssn", "clean_text")


@register("docs_adaptive_quality_filter", f"""
WITH wt AS (SELECT i AS bucket, (i * 2654435761) % 2001 - 1000 AS w
            FROM generate_series(0, 255) t(i)),
tok AS (SELECT doc_id,
               unnest(list_filter(string_split(text, ' '),
                                  x -> x <> '')) AS term
        FROM documents),
feats AS (SELECT doc_id,
                 {_DUCK_H32.format(x='term')} % 256 AS bucket,
                 count(*) AS tf
          FROM tok GROUP BY 1, 2),
sc AS (SELECT doc_id, CAST(sum(tf * w) AS BIGINT) AS score
       FROM feats JOIN wt USING (bucket) GROUP BY doc_id),
nn AS (SELECT count(*) AS n FROM sc),
o AS (SELECT score, row_number() OVER (ORDER BY score) - 1 AS rk
      FROM sc),
thr AS (SELECT o.score AS v FROM o, nn
        WHERE o.rk = (1 * (nn.n - 1)) // 4)
SELECT sc.doc_id, sc.score
FROM sc CROSS JOIN thr WHERE sc.score >= thr.v
""")
def docs_adaptive_quality_filter(spark, sf_dir):
    """Adaptive-threshold curation: score every document with the
    hashed linear classifier (integer scores), take the EXACT corpus
    p25 of the score distribution (functions/quantiles.py — no global
    sort), and keep the top three quartiles.  This is the realistic
    shape of a quality gate — thresholds are set per-corpus from the
    score distribution, not hard-coded — and the whole decision chain
    is integer order statistics, so both engines keep the identical
    document set."""
    from ..functions.quantiles import exact_quantiles
    sc = hashed_linear_score(t(spark, sf_dir, "documents")) \
        .select("doc_id", "score")
    thr = F.broadcast(
        exact_quantiles(sc, "score", [("p25", 1, 4)])
        .agg(F.min("value").alias("thr")))
    return (sc.crossJoin(thr)
            .filter(F.col("score") >= F.col("thr"))
            .select("doc_id", "score"))


# ------------------------------------- BPE merge-candidate counting
@register("bpe_merge_candidates", """
WITH toks AS (
  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS tk
  FROM documents),
p AS (SELECT unnest(list_transform(
         generate_series(1, greatest(len(tk) - 1, 0)),
         i -> tk[i] || ' ' || tk[i + 1])) AS pair
      FROM toks)
SELECT pair, CAST(count(*) AS BIGINT) AS cnt
FROM p GROUP BY pair
ORDER BY cnt DESC, pair LIMIT 20
""")
def bpe_merge_candidates(spark, sf_dir):
    """One BPE tokenizer-training step: global adjacent-pair counts,
    top-20 merge candidates via TakeOrderedAndProject."""
    return bpe_pair_counts(t(spark, sf_dir, "documents"), k=20)


# ------------------------------------- incremental-ingest dedup
@register("docs_incremental_dedup", """
WITH b AS (SELECT doc_id AS id, md5(text) AS fingerprint
           FROM documents WHERE doc_id % 10 = 7),
s AS (SELECT md5(text) AS fp FROM documents WHERE doc_id % 10 <> 7)
SELECT fingerprint, id FROM b
WHERE NOT EXISTS (SELECT 1 FROM s WHERE s.fp = b.fingerprint)
""")
def docs_incremental_dedup(spark, sf_dir):
    """Ingest-time dedup of a new batch (doc_id % 10 == 7 stands in for
    today's crawl) against the already-ingested corpus: LEFT ANTI join
    on the content fingerprint (operators/dedup.py:
    incremental_new_docs)."""
    docs = t(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 10 == 7)
    seen = docs.filter(F.col("doc_id") % 10 != 7)
    return incremental_new_docs(batch, seen)


# ------------------------------------- z-order layout keys
def _zorder_sql(bits: int = 4) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"(((x >> {i}) & 1) << {2 * i})")
        terms.append(f"(((y >> {i}) & 1) << {2 * i + 1})")
    z = " | ".join(terms)
    return f"""
WITH b AS (SELECT doc_id,
                  (n_chars >> 6) & 15 AS x,
                  {_DUCK_H32.format(x='lang')} % 16 AS y
           FROM documents)
SELECT doc_id, CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y,
       CAST({z} AS BIGINT) AS zkey,
       CAST(({z}) >> 4 AS BIGINT) AS file_bucket
FROM b
"""


@register("docs_zorder_layout", _zorder_sql())
def docs_zorder_layout(spark, sf_dir):
    """Z-order clustering keys on (size bucket, language bucket): the
    Delta/Iceberg OPTIMIZE ZORDER primitive.  At scale the writer
    range-partitions on ``zkey`` and sorts within partitions, so
    min/max file stats prune scans on EITHER dimension; here the query
    surfaces the keys themselves so the oracle can check the bit
    interleave exactly (functions/ids.py: zorder_key)."""
    d = t(spark, sf_dir, "documents")
    x = F.shiftright(F.col("n_chars"), 6).bitwiseAND(F.lit(15))
    from ..operators.dedup import token_hash
    y = token_hash(F.col("lang")) % 16
    z = zorder_key(x, y, bits=4)
    return d.select("doc_id", x.cast("long").alias("x"),
                    y.cast("long").alias("y"), z.alias("zkey"),
                    F.shiftright(z, 4).cast("long").alias("file_bucket"))


# ------------------------------------- exact distributed quantiles
@register("lineitem_exact_quantiles", """
WITH n AS (SELECT count(*) AS n FROM lineitem),
o AS (SELECT l_extendedprice AS value,
             row_number() OVER (ORDER BY l_extendedprice) - 1 AS rk
      FROM lineitem),
q(qname, num, den) AS (
  VALUES ('p25', 1, 4), ('p50', 1, 2), ('p90', 9, 10), ('p99', 99, 100))
SELECT q.qname AS q, o.value
FROM o, n, q WHERE o.rk = (q.num * (n.n - 1)) // q.den
""")
def lineitem_exact_quantiles(spark, sf_dir):
    """EXACT p25/p50/p90/p99 of l_extendedprice with no global sort and
    no single-partition percentile buffer: value-histogram + two-phase
    prefix-rank (functions/quantiles.py).  Ranks are integer rationals
    (k = num*(n-1) div den), so both engines select the identical order
    statistic.  The oracle replays it as a (small-data) global
    row_number."""
    from ..functions.quantiles import exact_quantiles
    return exact_quantiles(
        t(spark, sf_dir, "lineitem"), "l_extendedprice",
        [("p25", 1, 4), ("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)])


# ------------------------------------- per-dimension embedding stats
@register("embedding_dim_stats", """
WITH ex AS (
  SELECT CAST(u.s.i AS INT) AS dim,
         CAST(floor(CAST(u.s.v AS DOUBLE) * 1000000000 + 0.5) AS BIGINT)
           AS nano,
         CAST(floor(CAST(u.s.v AS DOUBLE) * 1000 + 0.5) AS BIGINT)
           AS milli
  FROM embeddings e,
       unnest(list_transform(generate_series(1, len(e.embedding)),
              i -> {'i': i, 'v': e.embedding[i]})) AS u(s)
  WHERE len(list_filter(e.embedding, x -> x IS NULL OR
            NOT isfinite(CAST(x AS DOUBLE)))) = 0),
g AS (SELECT dim, sum(nano) AS s, sum(milli * milli) AS s2,
             count(*) AS n
      FROM ex GROUP BY 1)
SELECT dim,
       CAST(((2 * s + n * 1000000)
             - ((((2 * s + n * 1000000) % (2 * n * 1000000))
                 + (2 * n * 1000000)) % (2 * n * 1000000)))
            // (2 * n * 1000000) AS BIGINT) AS mean_milli,
       CAST(((2 * s2 + n) - ((((2 * s2 + n) % (2 * n)) + (2 * n))
                             % (2 * n))) // (2 * n) AS BIGINT)
         AS meansq_milli2,
       CAST(n AS BIGINT) AS n_vecs
FROM g
""")
def embedding_dim_stats(spark, sf_dir):
    """Per-dimension corpus statistics for feature normalization — the
    mean/second-moment pass a standardization (z-score) step needs
    before training.  Same integer discipline as
    ``embedding_label_centroids``: components become IEEE-exact nano
    (mean) and milli (second moment) units, sums are plain BIGINT, and
    both outputs are round-half-up integer floor-divisions — no doubles
    anywhere, so any engine build hashes identically.  The second
    moment is defined over the milli-quantized components (milli² sums
    stay < 2^63 even at ~1e9 rows/dim; the variance in milli² is
    ``meansq_milli2 - mean_milli²`` on the consumer side).  One
    posexplode + one (dim)-keyed partial+final agg — a hot dimension
    cannot pin a partition."""
    em = t(spark, sf_dir, "embeddings")
    v = F.col("v").cast("double")
    nano = F.floor(v * F.lit(1000000000.0) + F.lit(0.5)).cast("long")
    milli = F.floor(v * F.lit(1000.0) + F.lit(0.5)).cast("long")
    # as_vec: ill-formed (NaN/Inf-component) vectors explode to zero
    # rows like NULL embeddings — see embedding_label_centroids
    g = (em.select(F.posexplode(as_vec("embedding")).alias("pos", "v"))
         .groupBy((F.col("pos") + 1).cast("int").alias("dim"))
         .agg(F.sum(nano).alias("s"),
              F.sum(milli * milli).alias("s2"),
              F.count("*").alias("n")))
    return (g.withColumn("num1", F.expr("2L * s + n * 1000000L"))
            .withColumn("den1", F.expr("2L * n * 1000000L"))
            .withColumn("num2", F.expr("2L * s2 + n"))
            .withColumn("den2", F.expr("2L * n"))
            .select(
                "dim",
                F.expr("(num1 - pmod(num1, den1)) div den1")
                .cast("long").alias("mean_milli"),
                F.expr("(num2 - pmod(num2, den2)) div den2")
                .cast("long").alias("meansq_milli2"),
                F.col("n").cast("long").alias("n_vecs")))


# ------------------------------------- winsorized feature clipping
@register("events_value_winsorize_counts", """
WITH nn AS (SELECT count(*) AS n FROM events WHERE value IS NOT NULL),
o AS (SELECT value, row_number() OVER (ORDER BY value) - 1 AS rk
      FROM events WHERE value IS NOT NULL),
p01 AS (SELECT o.value AS v FROM o, nn WHERE o.rk = (1 * (nn.n - 1)) // 100),
p99 AS (SELECT o.value AS v FROM o, nn WHERE o.rk = (99 * (nn.n - 1)) // 100)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN value < p01.v THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clip_lo,
       CAST(sum(CASE WHEN value > p99.v THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clip_hi
FROM events CROSS JOIN p01 CROSS JOIN p99
GROUP BY event_type
""")
def events_value_winsorize_counts(spark, sf_dir):
    """Winsorization audit — the robust-scaling preprocessing step of a
    feature pipeline: EXACT global p01/p99 order statistics of the
    value column (functions/quantiles.py — histogram + two-phase prefix
    rank, no global sort, no single-partition percentile buffer),
    broadcast as one row, then per-type counts of rows a p01/p99 clamp
    would clip.  Output is pure integers; the quantile thresholds are
    exact order statistics both engines select identically, so the
    double comparisons agree bit-for-bit."""
    from ..functions.quantiles import exact_quantiles
    ev = t(spark, sf_dir, "events")
    q = exact_quantiles(ev, "value",
                        [("p01", 1, 100), ("p99", 99, 100)])
    # INNER-join semantics on the thresholds: if the value column is
    # entirely NULL the quantile table is empty, the agg row carries
    # NULL p01/p99, and the oracle's CROSS JOIN over its empty p01/p99
    # CTEs yields ZERO rows — so the Spark side must too, not per-type
    # rows with 0 clips (round-10 ADVICE; pinned by
    # tests/test_null_robustness.py::test_winsorize_all_null_column).
    b = F.broadcast(q.agg(
        F.min(F.when(F.col("q") == "p01", F.col("value"))).alias("p01"),
        F.min(F.when(F.col("q") == "p99", F.col("value"))).alias("p99"))
        .filter(F.col("p01").isNotNull() & F.col("p99").isNotNull()))
    # count(when(...)) not sum(cast(...)): a NULL value makes the
    # comparison NULL, and summing the cast turns a group of NULL
    # values into a NULL clip count where the oracle's CASE yields 0 —
    # a NULL value is simply "not clipped" (null_parity_sweep).  The
    # thresholds themselves are now over non-null values only
    # (functions/quantiles.py), matching the oracle's filtered ranks.
    return (ev.crossJoin(b)
            .groupBy("event_type")
            .agg(F.count("*").cast("long").alias("n_events"),
                 F.count(F.when(F.col("value") < F.col("p01"), 1))
                 .alias("n_clip_lo"),
                 F.count(F.when(F.col("value") > F.col("p99"), 1))
                 .alias("n_clip_hi")))


# ------------------------------------- PPJoin prefix-filtered Jaccard
def _prefix_pairs_ctes() -> str:
    """CTE chain ending in ``pairs`` (the PPJoin qualifying-pair set),
    shared by the raw pair query and the cluster composition."""
    from .llm import _DUCK_SHINGLES
    return _DUCK_SHINGLES + """,
sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY 1),
dfreq AS (SELECT sh AS tok, count(*) AS df FROM sh GROUP BY 1),
rkd AS (SELECT t.id, t.sh AS tok, s.sz,
               row_number() OVER (PARTITION BY t.id
                                  ORDER BY d.df, t.sh) AS rk
        FROM sh t JOIN dfreq d ON d.tok = t.sh JOIN sizes s USING (id)),
pre AS (SELECT id, tok FROM rkd
        WHERE rk <= sz - ((4 * sz + 4) // 5) + 1),
cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
         FROM pre a JOIN pre b ON a.tok = b.tok AND a.id < b.id),
inter AS (SELECT c.id_a, c.id_b, count(*) AS inter
          FROM cand c JOIN sh ta ON ta.id = c.id_a
                      JOIN sh tb ON tb.id = c.id_b AND tb.sh = ta.sh
          GROUP BY 1, 2),
pairs AS (
  SELECT i.id_a, i.id_b, CAST(i.inter AS BIGINT) AS inter,
         CAST(sa.sz + sb.sz - i.inter AS BIGINT) AS union_sz
  FROM inter i JOIN sizes sa ON sa.id = i.id_a
               JOIN sizes sb ON sb.id = i.id_b
  WHERE i.inter * 5 >= (sa.sz + sb.sz - i.inter) * 4)"""


def _prefix_jaccard_sql() -> str:
    return (_prefix_pairs_ctes()
            + "\nSELECT id_a, id_b, inter, union_sz FROM pairs\n")


def _prefix_clusters_sql() -> str:
    return _prefix_pairs_ctes().replace(
        "WITH ", "WITH RECURSIVE ", 1) + """,
edges AS (SELECT id_a AS s, id_b AS d FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs),
reach(id, lbl) AS (
  SELECT s, s FROM edges
  UNION
  SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.id),
comp AS (SELECT id, min(lbl) AS cluster_id FROM reach GROUP BY id),
ranked AS (
  SELECT c.cluster_id, c.id, row_number() OVER (
           PARTITION BY c.cluster_id
           ORDER BY d.n_chars DESC, c.id) AS rn,
         count(*) OVER (PARTITION BY c.cluster_id) AS n_docs
  FROM comp c JOIN documents d ON d.doc_id = c.id)
SELECT cluster_id, CAST(n_docs AS BIGINT) AS n_docs, id AS keep_id
FROM ranked WHERE rn = 1
"""


@register("dedup_prefix_jaccard", _prefix_jaccard_sql())
def dedup_prefix_jaccard(spark, sf_dir):
    """AllPairs/PPJoin prefix filtering over 3-gram shingle sets: each
    doc exposes only its rarest |d| - ceil(0.8|d|) + 1 shingles to the
    candidate join, so boilerplate shingles generate no candidates at
    all (operators/dedup.py: prefix_filtered_jaccard_pairs).  Same
    threshold and output contract as ``dedup_ngram_jaccard`` — a
    candidate-generation A/B with identical verify.  (Raw whitespace
    tokens would be degenerate here: the synthetic corpus has only ~31
    distinct words, so nearly every token-SET pair exceeds 0.8.)"""
    from ..operators.dedup import prefix_filtered_jaccard_pairs
    return prefix_filtered_jaccard_pairs(t(spark, sf_dir, "documents"))


def _seg_prefix_clusters_sql() -> str:
    """Compose the segment-dedup CTEs (ending in ``clean(doc_id,
    text)``) with the PPJoin cluster chain re-sourced at the cleaned
    text: the shingle base reads FROM clean instead of FROM documents,
    and the retention score is the cleaned length."""
    seg = """t0 AS (
  SELECT doc_id AS id,
         list_filter(string_split(text, ' '), x -> x <> '') AS tk
  FROM documents),
sbase AS (SELECT id, tk, CAST(ceil(len(tk) / 16.0) AS BIGINT) AS n_segs
          FROM t0 WHERE len(tk) > 0),
segs AS (SELECT id, i - 1 AS seg_idx,
                array_to_string(tk[(i-1)*16+1 : i*16], ' ') AS seg
         FROM sbase,
              unnest(generate_series(1, CAST(n_segs AS INT))) AS u(i)),
skeep AS (SELECT id, seg_idx, seg,
                 row_number() OVER (PARTITION BY seg
                                    ORDER BY id, seg_idx) AS rn
          FROM segs),
clean AS (SELECT id AS doc_id, string_agg(seg, ' ' ORDER BY seg_idx)
                 AS text
          FROM skeep WHERE rn = 1 GROUP BY id)"""
    body = _prefix_clusters_sql()
    for old, new in (("WITH RECURSIVE ", ""),
                     ("FROM documents\n)", "FROM clean\n)"),
                     ("JOIN documents d ON d.doc_id = c.id",
                      "JOIN (SELECT doc_id, length(text) AS n_chars "
                      "FROM clean) d\n           ON d.doc_id = c.id")):
        assert old in body, f"prefix-cluster SQL shape changed: {old!r}"
        body = body.replace(old, new, 1)
    return "WITH RECURSIVE " + seg + ",\n" + body.lstrip()


@register("dedup_segment_then_prefix", _seg_prefix_clusters_sql())
def dedup_segment_then_prefix(spark, sf_dir):
    """Boilerplate-aware PPJoin (SCALE.md's documented mitigation for
    the prefix-join's input-pair bound, made a first-class checked
    entry): corpus-wide SEGMENT dedup first — every duplicated
    16-token window survives only at its first (doc, position)
    occurrence, so exact-duplicated and boilerplate-heavy text
    vanishes for the cost of one segment-keyed shuffle — then the
    AllPairs/PPJoin prefix-filter + connected components + canonical
    retention runs on the RESIDUE.  On duplication-heavy corpora the
    quadratic C(K,2) pair volume that bounds the raw
    ``dedup_prefix_clusters`` collapses before candidate generation
    ever sees it (measured on the 10x replicated probe: the raw path's
    pair explosion never forms).  Retention score is the cleaned
    length (longest residue, ties to lowest id)."""
    from ..operators.dedup import (canonical_per_cluster,
                                   connected_components,
                                   prefix_filtered_jaccard_pairs,
                                   segment_dedup)
    from ..session import scoped_persist
    docs = t(spark, sf_dir, "documents")
    # three consumers (shingle table, retention score, canonical join):
    # persist the residue once instead of re-running the segment pass
    cleaned = scoped_persist(segment_dedup(docs, out_text=True))
    pairs = prefix_filtered_jaccard_pairs(cleaned, id_col="id",
                                          text_col="clean_text")
    clusters = connected_components(pairs)
    scored = cleaned.select("id",
                            F.length("clean_text").alias("n_chars"))
    return canonical_per_cluster(scored, clusters, id_col="id")


@register("dedup_prefix_clusters", _prefix_clusters_sql())
def dedup_prefix_clusters(spark, sf_dir):
    """The SCALE PATH for PPJoin output (SCALE.md's prefix-jaccard
    caveat made a first-class checked entry): qualifying pairs feed
    straight into connected components + canonical-per-cluster instead
    of materializing the quadratic pair list — a K-duplicated clique
    collapses to ONE output row (cluster_id, n_docs, keep_id), so the
    result stays linear in distinct content no matter the duplication
    factor.  Same retention policy as ``dedup_cluster_canonical``
    (longest member, ties to lowest id); the oracle closes the pair
    graph with WITH RECURSIVE."""
    from ..operators.dedup import (canonical_per_cluster,
                                   connected_components,
                                   prefix_filtered_jaccard_pairs)
    docs = t(spark, sf_dir, "documents")
    pairs = prefix_filtered_jaccard_pairs(docs)
    clusters = connected_components(pairs)
    return canonical_per_cluster(docs, clusters)


# ------------------------------------- CDC MERGE / upsert
@register("orders_merge_upsert", """
WITH upd AS (SELECT o_orderkey, o_totalprice + 1000.0 AS o_totalprice,
                    'U' AS src
             FROM orders WHERE o_orderkey % 50 = 3),
ins AS (SELECT o_orderkey + 1000000000 AS o_orderkey, o_totalprice,
               'N' AS src
        FROM orders WHERE o_orderkey % 50 = 4),
chg AS (SELECT * FROM upd UNION ALL SELECT * FROM ins),
merged AS (
  SELECT coalesce(c.o_totalprice, b.o_totalprice) AS price,
         coalesce(c.src, 'KEEP') AS src
  FROM orders b FULL OUTER JOIN chg c ON b.o_orderkey = c.o_orderkey)
SELECT src, CAST(count(*) AS BIGINT) AS n_rows,
       round(CAST(sum(CAST(price AS DECIMAL(27,9))) AS DOUBLE), 2)
       AS total
FROM merged GROUP BY src
""")
def orders_merge_upsert(spark, sf_dir):
    """Lakehouse MERGE INTO semantics on plain DataFrames: a CDC batch
    (updates to keys =3 mod 50, inserts at offset keys) full-outer-joins
    the base table on the key; changed rows win via coalesce.  One
    key-shuffle join — the shape Delta/Iceberg MERGE executes; at scale
    the join prunes via runtime file skipping / bucketing on the key.
    Output: per-source row counts and an exact-decimal price total."""
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    upd = (o.filter(F.col("o_orderkey") % 50 == 3)
           .select("o_orderkey",
                   (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
                   F.lit("U").alias("src")))
    ins = (o.filter(F.col("o_orderkey") % 50 == 4)
           .select((F.col("o_orderkey") + 1000000000).alias("o_orderkey"),
                   "o_totalprice", F.lit("N").alias("src")))
    chg = upd.unionByName(ins)
    merged = (o.alias("b")
              .join(chg.alias("c"),
                    F.col("b.o_orderkey") == F.col("c.o_orderkey"),
                    "full_outer")
              .select(F.coalesce(F.col("c.o_totalprice"),
                                 F.col("b.o_totalprice")).alias("price"),
                      F.coalesce(F.col("c.src"),
                                 F.lit("KEEP")).alias("src")))
    return (merged.groupBy("src")
            .agg(F.count("*").alias("n_rows"),
                 F.round(F.sum(F.col("price").cast("decimal(27,9)"))
                         .cast("double"), 2).alias("total")))


# ------------------------------------- graph: triangle counting
@register("events_user_triangles", """
WITH m AS (SELECT DISTINCT event_type, date_trunc('hour', ts) AS h,
                           user_id
           FROM events),
grp AS (SELECT event_type, h FROM m
        GROUP BY event_type, h HAVING count(*) <= 20),
mg AS (SELECT m.* FROM m JOIN grp USING (event_type, h)),
e AS (SELECT DISTINCT a.user_id AS u, b.user_id AS v
      FROM mg a JOIN mg b
        ON a.event_type = b.event_type AND a.h = b.h
       AND a.user_id < b.user_id),
tri AS (SELECT e1.u AS x, e1.v AS y, e2.v AS z
        FROM e e1 JOIN e e2 ON e2.u = e1.v
                  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
ex AS (SELECT unnest([x, y, z]) AS user_id FROM tri)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_triangles
FROM ex GROUP BY user_id
""")
def events_user_triangles(spark, sf_dir):
    """Graph analytics: per-user triangle counts over the
    (event_type, hour) co-occurrence graph, computed with
    degree-ordered orientation so no high-degree hub ever owns a
    quadratic wedge set (operators/graph.py — Suri/Vassilvitskii's
    "last reducer" fix).  The oracle enumerates the same triangle set
    with the simple id-ordered join (orientation changes how triangles
    are FOUND, not which exist)."""
    from ..operators.graph import cooccurrence_edges, triangle_counts
    ev = t(spark, sf_dir, "events")
    return triangle_counts(cooccurrence_edges(ev, max_group=20))


# ------------------------------------- graph: integer PageRank
def _pagerank_sql(n_iter: int = 3, scale: int = 1_000_000) -> str:
    """Unrolled-iteration replay of ``graph.pagerank_scaled`` over the
    same hub-guarded co-occurrence graph as the triangles oracle."""
    sql = f"""WITH m AS (SELECT DISTINCT event_type,
                         date_trunc('hour', ts) AS h, user_id
           FROM events),
grp AS (SELECT event_type, h FROM m
        GROUP BY event_type, h HAVING count(*) <= 20),
mg AS (SELECT m.* FROM m JOIN grp USING (event_type, h)),
e AS (SELECT DISTINCT a.user_id AS u, b.user_id AS v
      FROM mg a JOIN mg b
        ON a.event_type = b.event_type AND a.h = b.h
       AND a.user_id < b.user_id),
de AS (SELECT u AS s, v AS d FROM e UNION ALL SELECT v, u FROM e),
deg AS (SELECT s, count(*) AS outdeg FROM de GROUP BY 1),
nn AS (SELECT count(*) AS n FROM deg),
r0 AS (SELECT deg.s AS id, CAST({scale} // nn.n AS BIGINT) AS r
       FROM deg CROSS JOIN nn)"""
    for it in range(1, n_iter + 1):
        sql += f""",
c{it} AS (SELECT de.d AS id, sum(r{it - 1}.r // deg.outdeg) AS insum
          FROM de JOIN deg ON deg.s = de.s
                  JOIN r{it - 1} ON r{it - 1}.id = de.s
          GROUP BY 1),
r{it} AS (SELECT deg.s AS id,
                 CAST((15 * {scale}) // (100 * nn.n)
                      + (85 * coalesce(c{it}.insum, 0)) // 100
                      AS BIGINT) AS r
          FROM deg CROSS JOIN nn
          LEFT JOIN c{it} ON c{it}.id = deg.s)"""
    return sql + f"""
SELECT id AS user_id, r AS rank_micro FROM r{n_iter}
"""


@register("events_user_pagerank", _pagerank_sql())
def events_user_pagerank(spark, sf_dir):
    """Link analysis over the hub-guarded user co-occurrence graph:
    3 unrolled iterations of INTEGER-scaled PageRank (damping 0.85,
    micro-unit ranks, every division an integer div — see
    operators/graph.py: pagerank_scaled for why that makes the result
    shuffle-order- and engine-build-independent).  One keyed
    edges-x-ranks join + partial+final sum per iteration; the oracle
    replays the iterations as unrolled CTEs."""
    from ..operators.graph import cooccurrence_edges, pagerank_scaled
    ev = t(spark, sf_dir, "events")
    pr = pagerank_scaled(cooccurrence_edges(ev, max_group=20), n_iter=3)
    return pr.select(F.col("id").alias("user_id"), "rank_micro")


# ------------------------------------- SemDeDup composition
def _semantic_dedup_sql(k="(SELECT k FROM kk)", n_iter: int = 2,
                        num: int = 9, den: int = 10,
                        target_cluster: int = 64) -> str:
    fold = ("list_reduce(list_transform(generate_series(1, len({a})), "
            "i -> {expr}), (p, q) -> p + q)")
    dot = fold.format(a="a.ve", expr="a.ve[i] * b.ve[i]")
    nrm = ("sqrt(" + fold.format(a="{x}", expr="{x}[i] * {x}[i]") + ")")
    kk = (f"kk AS (SELECT greatest(CAST(ceil(count(*) / "
          f"{target_cluster}.0) AS INT), 1) AS k FROM embeddings),\n")
    return f"""WITH RECURSIVE {kk}{_kmeans_ctes(k, n_iter)},
vv AS (SELECT v.vec_id, v.ve, a{n_iter}.cluster,
              {nrm.format(x='v.ve')} AS nrm
       FROM v JOIN a{n_iter} USING (vec_id)),
pr AS (SELECT a.vec_id AS ia, b.vec_id AS ib
       FROM vv a JOIN vv b
         ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        AND a.nrm > 0 AND b.nrm > 0
        AND ({dot} / (a.nrm * b.nrm)) * {den} >= {num}),
sym(s, d) AS (SELECT ia, ib FROM pr UNION ALL SELECT ib, ia FROM pr),
walk(pid, lbl) AS (
  SELECT s, s FROM (SELECT DISTINCT s FROM sym)
  UNION
  SELECT sym.d, walk.lbl FROM walk JOIN sym ON sym.s = walk.pid),
comp AS (SELECT pid, min(lbl) AS comp_id FROM walk GROUP BY pid)
SELECT a{n_iter}.vec_id, CAST(a{n_iter}.cluster AS INT) AS cluster,
       coalesce(comp.comp_id, a{n_iter}.vec_id) AS keep_id,
       CAST(coalesce(comp.comp_id, a{n_iter}.vec_id)
            <> a{n_iter}.vec_id AS INT) AS is_dup
FROM a{n_iter} LEFT JOIN comp ON comp.pid = a{n_iter}.vec_id
"""


@register("embedding_semantic_dedup", _semantic_dedup_sql())
def embedding_semantic_dedup(spark, sf_dir):
    """SemDeDup end to end: k-means clusters -> within-cluster cosine
    pairs (>= 9/10) -> connected-component duplicate groups -> keep
    min id (operators/clustering.py: semantic_dedup).  The oracle
    replays the identical k-means CTEs, the same fold-order cosine, and
    a WITH RECURSIVE min-label closure.

    k is SCALE-TRUE: ``k = ceil(n / 64)`` derived from the corpus size
    by BOTH engines (one cheap count on the Spark side, a ``kk`` CTE in
    the oracle), so the registered query exercises the k∝n regime the
    algorithm needs — SCALE.md's probe shows fixed k=8 at 10x corpus
    takes 114 s vs 14.7 s with k scaled; a fixed-k registration was
    round-3's one 'weak at 100x' mark."""
    from math import ceil

    from ..operators.clustering import semantic_dedup
    em = t(spark, sf_dir, "embeddings")
    k = max(1, ceil(em.count() / 64))
    return semantic_dedup(em, k=k, n_iter=2,
                          threshold_num=9, threshold_den=10)


# ------------------------------------- bigram LM scoring
@register("docs_bigram_logprob", f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
  FROM documents),
bb AS (SELECT doc_id,
              {_DUCK_H32.format(x='b')} AS hb,
              {_DUCK_H32.format(x="string_split(b, ' ')[1]")} AS hc
       FROM (
  SELECT doc_id, unnest(list_transform(
           generate_series(1, greatest(len(tk) - 1, 0)),
           i -> tk[i] || ' ' || tk[i + 1])) AS b
  FROM toks)),
bfreq AS (SELECT hb, count(*) AS cb FROM bb GROUP BY 1),
ctx AS (SELECT hc, count(*) AS c1 FROM bb GROUP BY 1)
SELECT bb.doc_id, CAST(count(*) AS INT) AS n_bigrams,
       round(CAST(sum(CAST(ln(f.cb / x.c1) AS DECIMAL(27,18)))
                  AS DOUBLE) / count(*), 4) AS lp_per_bigram
FROM bb JOIN bfreq f USING (hb) JOIN ctx x USING (hc)
GROUP BY bb.doc_id
""")
def docs_bigram_logprob(spark, sf_dir):
    """Corpus-bigram-LM quality score: mean MLE log P(w2 | w1) per doc
    (the next step up from ``docs_unigram_logprob``; same determinism
    device — EXACT DECIMAL(27,18) sums of the ln values so shuffle
    order cannot flip the final rounding).  One bigram explode feeds
    the transition-count table, the context-count table, and the
    scoring join.

    Scale shape (the fix behind SCALE.md's bigram row): transition and
    context keys are the portable int64 ``token_hash`` of the bigram /
    context strings, NOT the strings themselves — at corpus scale the
    two count-table shuffles and the scoring join carry 8-byte keys
    instead of arbitrary-length text.  Both engines hash identically,
    so the (astronomically rare at test vocab) collision would merge
    the same counts on both sides — the oracle stays exact."""
    from ..operators.dedup import token_hash
    from ..operators.text import tokens_col
    d = t(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokens_col(F.col("text")).alias("tk"))
    tk = F.col("tk")
    idx = F.when(F.size(tk) >= 2, F.sequence(F.lit(1), F.size(tk) - 1)) \
        .otherwise(F.array().cast("array<int>"))
    bigram = F.transform(idx, lambda i: F.struct(
        F.element_at(tk, i).alias("w1"),
        F.concat_ws(" ", F.element_at(tk, i),
                    F.element_at(tk, i + 1)).alias("b")))
    bb = (toks.select("doc_id", F.explode(bigram).alias("g"))
          .select("doc_id", token_hash(F.col("g.b")).alias("hb"),
                  token_hash(F.col("g.w1")).alias("hc")))
    bfreq = bb.groupBy("hb").agg(F.count("*").alias("cb"))
    ctx = bb.groupBy("hc").agg(F.count("*").alias("c1"))
    lnp = F.log(F.col("cb") / F.col("c1"))
    return (bb.join(bfreq, "hb").join(ctx, "hc")
            .groupBy("doc_id")
            .agg(F.count("*").cast("int").alias("n_bigrams"),
                 F.round(F.sum(lnp.cast("decimal(27,18)")).cast("double")
                         / F.count("*"), 4).alias("lp_per_bigram")))


# ------------------------------------- incremental MV maintenance
@register("events_incremental_rollup", """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CAST(CASE WHEN isfinite(value) THEN value END
                       AS DECIMAL(27,9))) AS DECIMAL(27,9)) AS sv
  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2)
SELECT event_type, h, n_events,
       CAST(round(sv, 2) AS DOUBLE) AS sum_value
FROM hourly
""")
def events_incremental_rollup(spark, sf_dir):
    """Incremental materialized-view maintenance: the stored hourly
    rollup was built from the on-time events (first 25 days); a LATE
    batch (the remaining days) arrives and is folded in by aggregating
    ONLY the batch and outer-merging the partials onto the stored view
    (coalesce + sum per key) — never re-reading the full history.  The
    oracle is the from-scratch rollup over everything, so a hash match
    PROVES the incremental merge lossless (the same partials-compose
    argument as ``events_rollup_cascade``, applied across time instead
    of granularity).  Sums carry exact DECIMAL(27,9) partials so the
    merged total is bit-equal to the recomputed one regardless of
    arrival order.  At scale this is one small-batch agg + one
    broadcast-or-shuffle merge join onto the MV table instead of a full
    re-aggregation of the corpus."""
    # NULL-ts events are excluded EXPLICITLY on both sides: the
    # incremental split below partitions history by ts < cut vs
    # ts >= cut, and a NULL ts satisfies NEITHER predicate — without
    # the filter the Spark side silently loses the NULL-hour group the
    # oracle's single GROUP BY keeps (round-12 dirty-corpus fuzz).  A
    # row with no timestamp has no hour to roll into.
    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    cut = F.lit("2024-01-26 00:00:00").cast("timestamp")

    def hourly(df):
        # finite_or_null: NaN/Inf have no exact-decimal representation
        # — DuckDB refuses the cast (job dead), Spark silently NULLs
        # it; make the exclusion explicit and identical on both sides
        return (df.groupBy("event_type",
                           F.date_trunc("hour", "ts").alias("h"))
                .agg(F.count("*").alias("n_events"),
                     F.sum(finite_or_null("value").cast("decimal(27,9)"))
                     .alias("sv")))

    stored = hourly(ev.filter(F.col("ts") < cut))     # the standing MV
    late = hourly(ev.filter(F.col("ts") >= cut))      # today's batch
    # SUM's partial-merge identity is NULL-iff-all-null: a group whose
    # only values are NULL has sv = NULL in both the partial and the
    # from-scratch rollup, so a bare coalesce(...)+coalesce(...) would
    # mint a 0.0 the recomputation never produces (silent divergence
    # on the first NULL-valued event, found by
    # tools/null_parity_sweep.py).  n_events needs no such guard:
    # COUNT(*) partials are never NULL.
    sv_merged = F.when(
        F.col("m.sv").isNull() & F.col("l.sv").isNull(),
        F.lit(None).cast("decimal(27,9)")
    ).otherwise(
        F.coalesce(F.col("m.sv"), F.lit(0).cast("decimal(27,9)"))
        + F.coalesce(F.col("l.sv"), F.lit(0).cast("decimal(27,9)")))
    merged = (stored.alias("m")
              .join(late.alias("l"), ["event_type", "h"], "full_outer")
              .select("event_type", "h",
                      (F.coalesce(F.col("m.n_events"), F.lit(0))
                       + F.coalesce(F.col("l.n_events"), F.lit(0)))
                      .alias("n_events"),
                      sv_merged.alias("sv")))
    # Round the exact DECIMAL, cast to double AFTER (round-14 fuzz,
    # seed 131): both engines round DECIMALs identically (exact
    # HALF_UP away from zero), but their DOUBLE rounds disagree at
    # true halves — Spark rounds the double's SHORTEST decimal
    # representation (BigDecimal.valueOf: -19.185 -> "-19.185" ->
    # -19.19) while DuckDB rounds the binary value (-19.18499... ->
    # -19.18), so an exact half-cent sum (two 4-decimal values adding
    # to -19.1850) silently diverged.
    return merged.select("event_type", "h", "n_events",
                         F.round(F.col("sv"), 2).cast("double")
                         .alias("sum_value"))


# ------------------------------------- grouped exact quantiles
@register("orders_price_quartiles_by_priority", """
WITH o AS (SELECT o_orderpriority AS g, o_totalprice AS v,
                  row_number() OVER (PARTITION BY o_orderpriority
                                     ORDER BY o_totalprice) - 1 AS rk
           FROM orders),
n AS (SELECT o_orderpriority AS g, count(*) AS n FROM orders GROUP BY 1),
q(qname, num, den) AS (
  VALUES ('p25', 1, 4), ('p50', 1, 2), ('p75', 3, 4))
SELECT o.g AS o_orderpriority, q.qname AS q, o.v AS value
-- NULL-safe join for coherence with grouped_exact_quantiles: NULL is
-- a regular group (o_orderpriority is NOT NULL in TPC-H, so results
-- are unchanged here; the convention is what matters)
FROM o JOIN n ON o.g IS NOT DISTINCT FROM n.g, q
WHERE o.rk = (q.num * (n.n - 1)) // q.den
""")
def orders_price_quartiles_by_priority(spark, sf_dir):
    """Exact per-group quartiles of o_totalprice by order priority —
    the grouped form of ``lineitem_exact_quantiles``: grouped two-phase
    prefix ranks over the (group, value) histogram, hot groups spanning
    partitions (functions/quantiles.py: grouped_exact_quantiles).  The
    oracle replays it as per-group row_number at oracle scale."""
    from ..functions.quantiles import grouped_exact_quantiles
    return grouped_exact_quantiles(
        t(spark, sf_dir, "orders"), "o_totalprice", "o_orderpriority",
        [("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4)])


# ------------------------------------- data-quality constraint audit
@register("dq_orders_constraints", """
SELECT 'duplicate_orderkey' AS check_name,
       CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
       AS n_violations
FROM orders
UNION ALL
SELECT 'negative_totalprice',
       CAST(count(*) FILTER (WHERE o_totalprice < 0) AS BIGINT)
FROM orders
UNION ALL
SELECT 'null_custkey',
       CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT)
FROM orders
UNION ALL
SELECT 'orphan_custkey', CAST(count(*) AS BIGINT)
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = o.o_custkey)
ORDER BY check_name
""")
def dq_orders_constraints(spark, sf_dir):
    """dbt/Deequ-style data-quality audit in two passes: the column
    constraints (nullability, range, key uniqueness) fold into ONE
    scan's aggregate row and unpivot via ``stack``; the referential
    check is a LEFT ANTI join against the dimension (broadcast at dim
    scale, bloom-pruned at fact scale).  Output: one row per declared
    constraint with its violation count — the audit artifact a 100 TB
    ingest gate stores per batch."""
    o = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    base = (o.agg(
        (F.count("*") - F.countDistinct("o_orderkey"))
        .alias("duplicate_orderkey"),
        F.sum((F.col("o_totalprice") < 0).cast("long"))
        .alias("negative_totalprice"),
        F.sum(F.col("o_custkey").isNull().cast("long"))
        .alias("null_custkey"))
        .selectExpr("stack(3, 'duplicate_orderkey', duplicate_orderkey, "
                    "'negative_totalprice', negative_totalprice, "
                    "'null_custkey', null_custkey) "
                    "AS (check_name, n_violations)"))
    orphans = (o.join(cust.select("c_custkey"),
                      F.col("o_custkey") == F.col("c_custkey"),
                      "left_anti")
               .agg(F.count("*").alias("n_violations"))
               .select(F.lit("orphan_custkey").alias("check_name"),
                       "n_violations"))
    return base.unionByName(orphans).orderBy("check_name")


# ------------------------------------- leakage-safe train/eval split
@register("docs_leakage_safe_split", f"""
SELECT doc_id,
       CASE WHEN {_DUCK_H32.format(
           x="'split|' || md5(text)")} % 10 < 8
            THEN 'train' ELSE 'eval' END AS split
FROM documents
""")
def docs_leakage_safe_split(spark, sf_dir):
    """Train/eval split keyed on the CONTENT fingerprint, not the row
    id: exact duplicates always land in the same split, so held-out
    eval can never contain a training document's copy (the classic
    contamination-by-duplication leak).  Stateless hash-Bernoulli —
    reproducible across engines, reruns, and backfills; near-dup-safe
    variants key the same hash on ``dedup_cluster_canonical``'s
    cluster id instead.  Test pins the invariant: no fingerprint in
    both splits."""
    from ..operators.dedup import token_hash
    d = t(spark, sf_dir, "documents")
    h = token_hash(F.concat(F.lit("split|"), F.md5("text")))
    return d.select(
        "doc_id",
        F.when(h % 10 < 8, "train").otherwise("eval").alias("split"))


# ------------------------------------- robust (MAD) anomaly counts
@register("events_anomaly_mad", """
WITH med AS (
  -- medians rank NON-NULL values only (the quantile machinery's
  -- convention, functions/quantiles.py): NULLs are not values
  SELECT g AS event_type, v AS med FROM (
    SELECT event_type AS g, value AS v,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY value) - 1 AS rk
    FROM events WHERE value IS NOT NULL) o
  JOIN (SELECT event_type AS g, count(value) AS n
        FROM events GROUP BY 1) n USING (g)
  WHERE o.rk = (n.n - 1) // 2),
dev AS (SELECT e.event_type, abs(e.value - m.med) AS d, m.med
        FROM events e JOIN med m USING (event_type)),
mad AS (
  SELECT g AS event_type, v AS mad FROM (
    SELECT event_type AS g, d AS v,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY d) - 1 AS rk
    FROM dev WHERE d IS NOT NULL) o
  JOIN (SELECT event_type AS g, count(d) AS n
        FROM dev GROUP BY 1) n USING (g)
  WHERE o.rk = (n.n - 1) // 2)
SELECT d.event_type,
       CAST(count(*) FILTER (WHERE d.d > 5 * mad.mad) AS BIGINT)
       AS n_outliers,
       CAST(count(*) AS BIGINT) AS n_events
FROM dev d JOIN mad USING (event_type)
GROUP BY d.event_type
""")
def events_anomaly_mad(spark, sf_dir):
    """Robust anomaly detection: flag events whose |value - median|
    exceeds 5x the Median Absolute Deviation of their type — the
    outlier rule that, unlike the z-score (``events_value_anomalies``),
    is not itself poisoned by the outliers it hunts.  Built by
    composing ``grouped_exact_quantiles`` twice (per-type median, then
    per-type median of the absolute deviations) — each an exact
    two-phase prefix-rank with NO global sort or single-partition
    percentile buffer — plus one broadcast of the per-type constants.
    Deterministic: medians are exact order statistics (actual column
    values), deviations are correctly-rounded doubles identical on
    both engines, and the rule is a plain comparison."""
    from ..functions.quantiles import grouped_exact_quantiles
    ev = t(spark, sf_dir, "events")
    med = (grouped_exact_quantiles(ev, "value", "event_type",
                                   [("p50", 1, 2)])
           .select("event_type", F.col("value").alias("med")))
    dev = (ev.join(F.broadcast(med), "event_type")
           .select("event_type", F.abs(F.col("value") - F.col("med"))
                   .alias("d")))
    mad = (grouped_exact_quantiles(dev, "d", "event_type",
                                   [("p50", 1, 2)])
           .select("event_type", F.col("value").alias("mad")))
    return (dev.join(F.broadcast(mad), "event_type")
            .groupBy("event_type")
            .agg(F.sum((F.col("d") > 5 * F.col("mad")).cast("long"))
                 .alias("n_outliers"),
                 F.count("*").alias("n_events")))
