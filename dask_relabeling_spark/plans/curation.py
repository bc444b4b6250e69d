"""Round-3 training-data-pipeline extensions: iterative k-means,
sparse TF-IDF similarity join, binned interval-overlap join, hashed
linear classifier inference, BPE merge-candidate counting, incremental
ingest dedup, and z-order layout keys.

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
from ..operators.text import bpe_pair_counts, hashed_linear_score
from .relational import register, t

_DUCK_H32 = "CAST('0x' || substr(md5({x}), 1, 8) AS BIGINT)"


# --------------------------------------------------- iterative k-means
def _kmeans_sql(k: int = 8, n_iter: int = 2) -> str:
    """Unrolled Lloyd's: one (dist, argmin, update) CTE block per
    iteration, replaying the Spark operator step-for-step.  The
    left-fold ``list_reduce`` matches Spark's ``aggregate`` fold
    order; centroid components are exact DECIMAL(27,9) sums quantized
    to 3 decimals, so both engines iterate on bit-identical centroids."""
    dist = ("list_reduce(list_transform(generate_series(1, len(v.ve)), "
            "i -> (v.ve[i] - c.cv[i]) * (v.ve[i] - c.cv[i])), "
            "(a, b) -> a + b)")
    sql = f"""
WITH v AS (SELECT vec_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
           FROM embeddings),
c1 AS (SELECT CAST(vec_id AS INT) AS cid, ve AS cv
       FROM v WHERE vec_id < {k})"""
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
                 unnest(v.ve) AS val
          FROM v JOIN a{it} USING (vec_id)),
m{it} AS (SELECT cid, pos,
                 round(CAST(sum(CAST(val AS DECIMAL(27,9))) AS DOUBLE)
                       / count(*), 3) AS val
          FROM x{it} GROUP BY 1, 2),
c{it + 1} AS (SELECT cid, list(val ORDER BY pos) AS cv
              FROM m{it} GROUP BY cid)"""
    return sql + f"""
SELECT vec_id, cluster FROM a{n_iter}
"""


@register("embedding_kmeans", _kmeans_sql())
def embedding_kmeans(spark, sf_dir):
    """Two unrolled Lloyd iterations, k=8, init = lowest-id vectors.
    Assignment is a narrow map against a packed 1-row broadcast of the
    centroids; the update is a (cluster, dim)-keyed partial+final agg
    with exact decimal sums (see operators/clustering.py)."""
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
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
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
          FROM events GROUP BY 1),
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
    the direct theta join (same semantics, oracle-scale only)."""
    ev = t(spark, sf_dir, "events")
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
