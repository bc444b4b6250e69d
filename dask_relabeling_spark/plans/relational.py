"""The declared relational capability surface (SURVEY §2.3) as named
queries over the driver test tables, each paired with an ANSI-SQL oracle
string DuckDB can run on the same parquet.

Every query aliases all computed columns identically in the DataFrame code
and the SQL so the driver's column-sorted value-hash comparison holds.
Float-valued aggregates are rounded on BOTH sides; orderings always carry an
integer tie-break; thresholds on floats are expressed as integer cross-
multiplications wherever an engine disagreement could flip a row.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]
REGISTRY: Dict[str, Tuple[QueryFn, Optional[str]]] = {}


def register(name: str, oracle: Optional[str]):
    def deco(fn: QueryFn):
        REGISTRY[name] = (fn, oracle)
        return fn
    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def finite_or_null(c) -> F.Column:
    """NULL unless ``c`` is a finite double — the cross-engine guard
    for metric columns a dirty corpus salts with NaN/±Inf (a sensor
    glitch, a bad parse).  The engines disagree on almost everything
    about non-finite values (Spark casts NaN->long to 0 where DuckDB
    errors; DuckDB sorts/compares NaN as greater-than-everything;
    STDDEV overflows on Inf), so bucketing/decimal/moment paths
    normalize to NULL FIRST — the DuckDB side mirrors this with
    ``CASE WHEN isfinite(value) THEN value END``
    (tools/null_parity_sweep.py, edge profile).

    DECIMAL-sum convention (round-14 fuzz, seed 131): value sums ride
    ``finite_or_null(c).cast("decimal(27,9)")`` partials and are
    rounded AS DECIMALs (exact HALF_UP in both engines), cast to
    double after — rounding a DOUBLE sum splits the engines at true
    halves (Spark rounds the shortest decimal representation via
    ``BigDecimal.valueOf``, DuckDB the binary value).  RESIDUAL CLASS
    (round-14 ADVICE, documented not reachable): the double->DECIMAL
    cast is itself a scale-9 round under the same shortest-decimal
    rule, so an input landing on a true tie at the NINTH decimal
    (e.g. 5e-10, 1.0000000005) can still diverge by one ulp of the
    kept digit.  Unreachable for every current corpus (the generators
    emit <=4-decimal values, and sums of scale-4 decimals are exact at
    scale 9) — pinned by the 5e-10 / 1.5e-9 rows in the permanent
    "ties" profile (tools/null_parity_sweep.py, round-15 tie-injection
    audit; both engines cast them to 1E-9 / 2E-9) so a corpus change
    that widens value precision rediscovers it as a failing gate row,
    not a silent divergence.  The same audit proved the 4-decimal
    assumption itself is load-bearing: round(DOUBLE, 4) sites split on
    5-decimal dirty values, so window sums, lag deltas, and min/max
    over event values ride this DECIMAL convention too.

    The residual extends to FULL-PRECISION double casts (round-16
    ADVICE): dec_round over a quotient (dec_avg, the q8/q14 ratio
    sites, max(cume_dist)) casts a double that need not have a
    <=9-decimal shortest form, so a value within half an ulp of a
    scale-9 boundary could still split the engines' casts.  The inputs
    to those casts are made DETERMINISTIC first (exact DECIMAL sums
    cast to double once, then one IEEE division — bit-identical across
    engines and accumulation orders), so the residual is a fixed
    property of the value, not of shuffle order, and sits at ~1e-7
    likelihood per emitted value on adversarial data."""
    col = F.col(c) if isinstance(c, str) else c
    return F.when(~F.isnan(col) & (F.abs(col) != F.lit(float("inf"))),
                  col)


# The seed-131 DECIMAL convention as reusable aggregates (round 16:
# the ~25 TPC-H monetary round(sum/min/max/avg) sites ride these —
# the same exactness contract as events_rollup_cascade).  NOTE: never
# CAST between DECIMAL scales to narrow — DuckDB's decimal->decimal
# rescale TRUNCATES toward zero where Spark rounds HALF_UP (measured
# round 16: 0.005 -> 0.00 vs 0.01); only round(DECIMAL, k) ties the
# engines, so every helper rounds first and casts after.
def dec_round(col, scale: int):
    """Route a computed DOUBLE through DECIMAL(27,9) before rounding
    (both engines cast a <=9-decimal double to the SAME exact DECIMAL
    and round true ties HALF_UP identically; full-precision inputs
    leave the documented scale-9 cast-tie residual)."""
    return F.round(col.cast("decimal(27,9)"), scale).cast("double")


def dec_sum(col, scale: int = 2):
    """Exact monetary group sum: finite-only DECIMAL(27,9) partials,
    HALF_UP-rounded as a DECIMAL, double after."""
    return (F.round(F.sum(finite_or_null(col).cast("decimal(27,9)")),
                    scale).cast("double"))


def dec_min(col, scale: int = 2):
    return (F.round(F.min(finite_or_null(col).cast("decimal(27,9)")),
                    scale).cast("double"))


def dec_max(col, scale: int = 2):
    return (F.round(F.max(finite_or_null(col).cast("decimal(27,9)")),
                    scale).cast("double"))


def dec_avg(col, scale: int):
    """Deterministic mean (round-16 ADVICE): the exact DECIMAL sum is
    cast to double ONCE (correctly rounded in both engines — probed)
    and divided by the finite count in IEEE arithmetic, so the
    quotient is bit-identical across engines regardless of
    accumulation order; the final dec_round leaves only the
    full-precision cast-tie residual documented at finite_or_null.
    try_divide: an all-non-finite group divides by a zero count —
    NULL in DuckDB, an ANSI error in Spark without it."""
    v = finite_or_null(col)
    return dec_round(F.try_divide(
        F.sum(v.cast("decimal(27,9)")).cast("double"), F.count(v)),
        scale)


# SQL fragments keeping the DuckDB oracles in lockstep with the four
# helpers above (same finite guard, same DECIMAL route, same rounds).
def _fin(e: str) -> str:
    return f"CASE WHEN isfinite({e}) THEN {e} END"


def _dagg(agg: str, e: str, s: int = 2) -> str:
    return (f"CAST(round({agg}(CAST({_fin(e)} AS DECIMAL(27,9))), {s})"
            " AS DOUBLE)")


def _dsum(e: str, s: int = 2) -> str:
    return _dagg("sum", e, s)


def _davg(e: str, s: int) -> str:
    return (f"CAST(round(CAST(CAST(sum(CAST({_fin(e)} AS "
            f"DECIMAL(27,9))) AS DOUBLE) / count({_fin(e)}) "
            f"AS DECIMAL(27,9)), {s}) AS DOUBLE)")


def _dround(e: str, s: int) -> str:
    return f"CAST(round(CAST({e} AS DECIMAL(27,9)), {s}) AS DOUBLE)"


# ---------------------------------------------------------------- 1. scan
@register("scan_filter_project", """
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_discount > 0.05
""")
def scan_filter_project(spark, sf_dir):
    """Projection + predicate reaching the parquet scan (PushedFilters)."""
    li = t(spark, sf_dir, "lineitem")
    return (li.filter((F.col("l_shipdate") >= "1998-01-01") &
                      (F.col("l_discount") > 0.05))
            .select("l_orderkey", "l_linenumber", "l_extendedprice"))


# ------------------------------------------------------------ 2. hash agg
@register("q1_pricing_summary", f"""
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS count_order,
       {_dsum('l_quantity')} AS sum_qty,
       {_dsum('l_extendedprice')} AS sum_base_price,
       {_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {_davg('l_quantity', 6)} AS avg_qty,
       {_dagg('min', 'l_extendedprice')} AS min_price,
       {_dagg('max', 'l_extendedprice')} AS max_price
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
""")
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: partial+final hash aggregation over the fact
    table.  All monetary aggregates ride the exact DECIMAL(27,9)
    convention (round 16 — a dirty corpus salting sub-cent prices
    lands double rounds on splitting halves; see finite_or_null).

    The DECIMAL casts are PRE-PROJECTED once per column (round 17):
    codegen does not share a ``cast(... as decimal)`` child across
    aggregate functions, so the agg-embedded form paid the
    Double.toString+BigDecimal cast per aggregate per row (~6 casts/
    row here; measured q1 1.17 -> 0.85 s interleaved min at sf0.1,
    value-identical — guide §1.2 per-task work).  min/max ride the
    DOUBLE and cast once per group: a monotone non-decreasing cast
    commutes with min/max exactly (ties collapse to the same decimal
    either way), so the value is provably unchanged."""
    li = t(spark, sf_dir, "lineitem")
    qf = finite_or_null("l_quantity")
    epf = finite_or_null("l_extendedprice")
    pre = (li.filter(F.col("l_shipdate") <= "2000-09-02")
           .select("l_returnflag", "l_linestatus",
                   qf.cast("decimal(27,9)").alias("_q9"),
                   epf.cast("decimal(27,9)").alias("_ep9"),
                   finite_or_null(F.col("l_extendedprice")
                                  * (1 - F.col("l_discount")))
                   .cast("decimal(27,9)").alias("_dp9"),
                   qf.alias("_qf"), epf.alias("_epf")))
    return (pre.groupBy("l_returnflag", "l_linestatus")
            .agg(F.count("*").alias("count_order"),
                 F.round(F.sum("_q9"), 2).cast("double").alias("sum_qty"),
                 F.round(F.sum("_ep9"), 2).cast("double")
                 .alias("sum_base_price"),
                 F.round(F.sum("_dp9"), 2).cast("double")
                 .alias("sum_disc_price"),
                 # same deterministic quotient as dec_avg: exact
                 # DECIMAL sum -> double once -> one IEEE division
                 dec_round(F.try_divide(F.sum("_q9").cast("double"),
                                        F.count("_qf")), 6)
                 .alias("avg_qty"),
                 dec_round(F.min("_epf"), 2).alias("min_price"),
                 dec_round(F.max("_epf"), 2).alias("max_price")))


# ------------------------------------------------- 3. broadcast equi-join
@register("broadcast_join_brand_revenue", f"""
SELECT p.p_brand,
       CAST(count(*) AS BIGINT) AS n_items,
       {_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
""")
def broadcast_join_brand_revenue(spark, sf_dir):
    """Small dim broadcast into the fact scan — no shuffle of lineitem for
    the join itself (only the final agg exchanges).  The revenue
    DECIMAL cast is projected BEFORE the join (round 17, guide §2.3:
    project before the exchange/join): the probe rows carry one
    16-byte decimal instead of two doubles, and the cast sits in the
    scan stage instead of per-aggregate — measured 0.78 -> 0.69 s
    interleaved min at sf0.1, value-identical (an inner equi-join
    evaluates the cast exactly once per surviving row either way)."""
    li, part = t(spark, sf_dir, "lineitem"), t(spark, sf_dir, "part")
    li = li.select("l_partkey",
                   finite_or_null(F.col("l_extendedprice")
                                  * (1 - F.col("l_discount")))
                   .cast("decimal(27,9)").alias("_dp9"))
    return (li.join(F.broadcast(part),
                    li.l_partkey == part.p_partkey)
            .groupBy("p_brand")
            .agg(F.count("*").alias("n_items"),
                 F.round(F.sum("_dp9"), 2).cast("double").alias("revenue")))


# -------------------------------------------------- 4. shuffle join + topk
@register("q3_shipping_priority", f"""
SELECT o.o_orderkey,
       {_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       o.o_orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""")
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: two joins (one broadcastable, one shuffled on the
    fact key) + top-k with deterministic tie-break.  The segment-
    filtered customers broadcast into orders BEFORE the orderkey
    exchange, so the orders side of the shuffle carries only the ~20 %
    of rows that can survive (the lineitem side has no pruning
    predicate and must shuffle in full)."""
    c = t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING")
    o = (t(spark, sf_dir, "orders")
         .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey))
    li = t(spark, sf_dir, "lineitem")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderkey", "o_orderdate")
            .agg(dec_sum(F.col("l_extendedprice")
                         * (1 - F.col("l_discount"))).alias("revenue"))
            .select("o_orderkey", "revenue", "o_orderdate")
            .orderBy(F.desc("revenue"), "o_orderkey")
            .limit(10))


# -------------------------------------------- 5. range/adjacency self-join
@register("events_adjacent_pairs", """
SELECT a.user_id,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM (SELECT user_id, event_id, event_type,
             CAST(CASE WHEN isfinite(value) THEN floor(value / 50) END
                  AS BIGINT) AS bucket FROM events) a
JOIN (SELECT user_id, event_id, event_type,
             CAST(CASE WHEN isfinite(value) THEN floor(value / 50) END
                  AS BIGINT) AS bucket FROM events) b
  ON a.user_id = b.user_id AND a.event_type = b.event_type
 AND abs(a.bucket - b.bucket) <= 1 AND a.event_id < b.event_id
GROUP BY a.user_id
""")
def events_adjacent_pairs(spark, sf_dir):
    """Bounded range self-join on grid adjacency — the relational rendition
    of the halo exchange's neighbor predicate (SURVEY §2.3.4)."""
    # finite_or_null: a NaN/Inf value has NO bucket (NULL fails the
    # adjacency predicate) — Spark would otherwise cast NaN's floor to
    # 0 and pair a garbage row with real bucket-0 events, while DuckDB
    # refuses the cast outright
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        F.floor(finite_or_null("value") / 50).cast("long").alias("bucket"))
    a, b = ev.alias("a"), ev.alias("b")
    return (a.join(b, (F.col("a.user_id") == F.col("b.user_id")) &
                   (F.col("a.event_type") == F.col("b.event_type")) &
                   (F.abs(F.col("a.bucket") - F.col("b.bucket")) <= 1) &
                   (F.col("a.event_id") < F.col("b.event_id")))
            .groupBy(F.col("a.user_id").alias("user_id"))
            .agg(F.count("*").alias("n_pairs")))


# ------------------------------------------------------------- 6. distinct
@register("distinct_parts_per_flag", """
SELECT l_returnflag, l_linestatus,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS distinct_parts
FROM lineitem GROUP BY l_returnflag, l_linestatus
""")
def distinct_parts_per_flag(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.countDistinct("l_partkey").alias("distinct_parts")))


# ----------------------------------------------------- 7. window functions
@register("top_customers_per_nation", """
SELECT c_custkey, c_nationkey, rnk FROM (
  SELECT c_custkey, c_nationkey,
         CAST(dense_rank() OVER (PARTITION BY c_nationkey
              ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rnk
  FROM customer) WHERE rnk <= 3
""")
def top_customers_per_nation(spark, sf_dir):
    """dense_rank window — the dense re-index idiom (SURVEY §2.3.7)."""
    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.col("c_custkey"))
    return (c.select("c_custkey", "c_nationkey",
                     F.dense_rank().over(w).cast("int").alias("rnk"))
            .filter(F.col("rnk") <= 3))


@register("topk_orders_per_customer", """
SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(row_number() OVER (PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rank
  FROM orders) WHERE rank <= 3
""")
def topk_orders_per_customer(spark, sf_dir):
    """Top-3 orders per customer via the SKEW-RESISTANT two-phase top-k
    (``functions.skew.grouped_topk``): partial top-k per (scan-partition,
    key), then exact top-k of the survivors — bounded fan-in on hot keys
    instead of a full per-key window sort.  Bit-identical to the window
    formulation (total order via the o_orderkey tiebreak), which is what
    the oracle runs."""
    from ..functions.skew import grouped_topk
    o = t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice")
    return grouped_topk(o, ["o_custkey"],
                        [F.desc("o_totalprice"), F.asc("o_orderkey")], 3)


# --------------------------------------------------------------- 8. max_by
@register("richest_supplier_per_nation", """
SELECT s_nationkey, max_by(s_name, s_acctbal) AS top_supplier,
       round(max(s_acctbal), 2) AS top_acctbal
FROM supplier GROUP BY s_nationkey
""")
def richest_supplier_per_nation(spark, sf_dir):
    """struct-argmax (the longest-contour selection idiom, §2.3.8)."""
    s = t(spark, sf_dir, "supplier")
    return (s.groupBy("s_nationkey")
            .agg(F.max_by("s_name", "s_acctbal").alias("top_supplier"),
                 F.round(F.max("s_acctbal"), 2).alias("top_acctbal")))


# -------------------------------------------------------------- 9. explode
@register("word_counts", """
SELECT tok, CAST(count(*) AS BIGINT) AS cnt
FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
WHERE tok <> '' GROUP BY tok
""")
def word_counts_q(spark, sf_dir):
    from ..operators.text import word_counts
    return word_counts(t(spark, sf_dir, "documents"))


# ------------------------------------------------- 10. conditional project
@register("discount_band_totals", f"""
SELECT CASE WHEN l_discount < 0.03 THEN 'low'
            WHEN l_discount < 0.07 THEN 'mid' ELSE 'high' END AS band,
       CAST(count(*) AS BIGINT) AS n,
       {_dsum('l_extendedprice')} AS total_price
FROM lineitem GROUP BY 1
""")
def discount_band_totals(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    band = (F.when(F.col("l_discount") < 0.03, "low")
            .when(F.col("l_discount") < 0.07, "mid").otherwise("high"))
    return (li.groupBy(band.alias("band"))
            .agg(F.count("*").alias("n"),
                 dec_sum("l_extendedprice").alias("total_price")))


# ----------------------------------------------------------------- 11. union
@register("union_priority_mix", """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n FROM (
  SELECT o_orderpriority FROM orders WHERE o_totalprice > 150000
  UNION ALL
  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
) GROUP BY o_orderpriority
""")
def union_priority_mix(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    u = (o.filter(F.col("o_totalprice") > 150000)
         .select("o_orderpriority")
         .unionAll(o.filter(F.col("o_orderstatus") == "F")
                   .select("o_orderpriority")))
    return u.groupBy("o_orderpriority").agg(F.count("*").alias("n"))


# ------------------------------------------------------ 12. grouped pandas
@register("grouped_udf_priority_stats", f"""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       {_dagg('min', 'o_totalprice')} AS min_price,
       {_dagg('max', 'o_totalprice')} AS max_price,
       min(o_orderdate) AS first_order,
       max(o_orderdate) AS last_order
FROM orders GROUP BY o_orderpriority
""")
def grouped_udf_priority_stats(spark, sf_dir):
    """applyInPandas — the grouped-UDF surface (§2.3.12), oracled by plain
    SQL aggregation (exact stats only: counts, min/max).  The UDF emits
    the RAW finite min/max (Python's round is half-to-EVEN on the
    binary value — a third rounding semantic); cent rounding happens
    outside in the shared dec_round convention (round 16)."""
    import numpy as np
    o = t(spark, sf_dir, "orders")
    schema = ("o_orderpriority string, n_orders bigint, min_price double, "
              "max_price double, first_order timestamp, "
              "last_order timestamp")

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["o_totalprice"]
        v = v[np.isfinite(v)]
        return pd.DataFrame([{
            "o_orderpriority": pdf["o_orderpriority"].iloc[0],
            "n_orders": len(pdf),
            "min_price": v.min() if len(v) else None,
            "max_price": v.max() if len(v) else None,
            "first_order": pdf["o_orderdate"].min(),
            "last_order": pdf["o_orderdate"].max(),
        }])

    return (o.groupBy("o_orderpriority").applyInPandas(stats, schema)
            .withColumn("min_price", dec_round(F.col("min_price"), 2))
            .withColumn("max_price", dec_round(F.col("max_price"), 2)))


# ------------------------------------------------------- 13. sort + limit
@register("top_parts_by_price", """
SELECT p_partkey, p_name, p_retailprice
FROM part ORDER BY p_retailprice DESC, p_partkey LIMIT 10
""")
def top_parts_by_price(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    return (p.select("p_partkey", "p_name", "p_retailprice")
            .orderBy(F.desc("p_retailprice"), "p_partkey").limit(10))


# ------------------------------------------- 14. nested struct + to_json
@register("nested_json_docs", """
SELECT doc_id,
       to_json(struct_pack(doc_id := doc_id, lang := lang,
                           n_chars := n_chars)) AS payload
FROM documents
""")
def nested_json_docs(spark, sf_dir):
    """Nested-struct construction + to_json — the GeoJSON export idiom
    (§2.3.14); Spark and DuckDB emit the identical compact JSON."""
    d = t(spark, sf_dir, "documents")
    # ignoreNullFields=false: Spark's default silently DROPS null
    # struct fields ({"doc_id":1}) where DuckDB emits them explicitly
    # ({"doc_id":1,"lang":null}) — identical on null-free data, a
    # silent export divergence on the first dirty corpus (found by
    # tools/null_parity_sweep.py); explicit nulls are also the GeoJSON
    # properties convention this query stands in for.
    return d.select(
        "doc_id",
        F.to_json(F.struct("doc_id", "lang", "n_chars"),
                  {"ignoreNullFields": "false"}).alias("payload"))


@register("events_props_extract", """
SELECT event_id,
       CASE WHEN json_valid(props)
            THEN CAST(json_extract(props, '$.k') AS INT) END AS prop_k
FROM events WHERE event_type = 'purchase'
""")
def events_props_extract(spark, sf_dir):
    """JSON path extraction from a string column (get_json_object) —
    semi-structured props riding a typed table.

    Total over malformed JSON: Spark's get_json_object returns NULL on
    an unparseable document, but DuckDB's json_extract ERRORS — the
    json_valid guard makes the oracle as total as the plan, so one
    garbage props string can't kill the oracle while Spark sails on
    (round-12 dirty-corpus fuzz, seed 103)."""
    ev = t(spark, sf_dir, "events")
    return (ev.filter(F.col("event_type") == "purchase")
            .select("event_id",
                    F.get_json_object("props", "$.k").cast("int")
                    .alias("prop_k")))


@register("pivot_status_by_priority", """
SELECT o_orderpriority,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_o,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_p,
       CAST(round(sum(CAST(CASE WHEN isfinite(o_totalprice)
                           THEN o_totalprice END AS DECIMAL(27,9)))
                  FILTER (WHERE o_orderstatus = 'F'), 2) AS DOUBLE)
         AS total_f
FROM orders GROUP BY o_orderpriority
""")
def pivot_status_by_priority(spark, sf_dir):
    """Pivot (wide conditional aggregation).  Spark's ``pivot`` with an
    explicit value list is a single hash aggregation — no extra shuffle
    versus plain groupBy; the oracle spells it as FILTERed aggregates."""
    o = t(spark, sf_dir, "orders")
    p = (o.groupBy("o_orderpriority")
         .pivot("o_orderstatus", ["F", "O", "P"])
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum(finite_or_null("o_totalprice")
                    .cast("decimal(27,9)")).alias("total")))
    # coalesce the counts: a pivot cell with no rows is NULL in Spark
    # but count(*) FILTER is 0 in SQL — identical while every status
    # exists, a silent divergence on the first corpus missing one
    # (found by tests/test_decimal_money.py's mini-corpus, round 16)
    return p.select(
        "o_orderpriority",
        F.coalesce("F_n", F.lit(0)).alias("n_f"),
        F.coalesce("O_n", F.lit(0)).alias("n_o"),
        F.coalesce("P_n", F.lit(0)).alias("n_p"),
        F.round(F.col("F_total"), 2).cast("double").alias("total_f"))


@register("lineitem_price_quantiles", f"""
SELECT l_returnflag,
       {_dround("quantile_cont(" + _fin('l_extendedprice') + ", 0.25)", 4)}
         AS p25,
       {_dround("quantile_cont(" + _fin('l_extendedprice') + ", 0.50)", 4)}
         AS p50,
       {_dround("quantile_cont(" + _fin('l_extendedprice') + ", 0.75)", 4)}
         AS p75
FROM lineitem GROUP BY l_returnflag
""")
def lineitem_price_quantiles(spark, sf_dir):
    """Exact interpolated percentiles (Spark ``percentile`` == DuckDB
    ``quantile_cont``, same linear-interpolation definition — the
    interpolated doubles probed bit-identical on salted 4-decimal
    data).  Finite-only input, dec_round output (round 16): an
    even-sized group of salted values interpolates p50 onto a true
    decimal half ~50 % of the time, where the raw DOUBLE rounds
    split.  The approx_percentile sketch path is pinned separately in
    tests (not oracle-hashable across engines)."""
    li = t(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(*[dec_round(F.expr(
                "percentile(CASE WHEN NOT isnan(l_extendedprice) AND "
                "abs(l_extendedprice) != double('inf') "
                f"THEN l_extendedprice END, {q})"), 4)
                .alias(f"p{int(q*100)}")
                for q in (0.25, 0.50, 0.75)]))


# ------------------------------------------------------- 15. global sort
@register("global_sorted_orders", """
SELECT o_orderkey, o_totalprice FROM orders
WHERE o_orderstatus = 'O' ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
""")
def global_sorted_orders(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (o.filter(F.col("o_orderstatus") == "O")
            .select("o_orderkey", "o_totalprice")
            .orderBy(F.desc("o_totalprice"), "o_orderkey").limit(100))


# ------------------------------------------------ 16. grouping sets: cube
@register("cube_order_stats", f"""
SELECT o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       {_dsum('o_totalprice')} AS total
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
""")
def cube_order_stats(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (o.cube("o_orderstatus", "o_orderpriority")
            .agg(F.count("*").alias("n"),
                 dec_sum("o_totalprice").alias("total")))


@register("rollup_nation_region", """
SELECT r.r_name, n.n_name, CAST(count(*) AS BIGINT) AS n_customers
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
""")
def rollup_nation_region(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .rollup("r_name", "n_name")
            .agg(F.count("*").alias("n_customers")))


# --------------------------------------------------- 17. semi / anti joins
@register("customers_without_orders", """
SELECT c_custkey FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
""")
def customers_without_orders(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti") \
        .select("c_custkey")


@register("suppliers_with_shipments", """
SELECT s_suppkey, s_name FROM supplier
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)
""")
def suppliers_with_shipments(spark, sf_dir):
    s = t(spark, sf_dir, "supplier")
    li = t(spark, sf_dir, "lineitem")
    return s.join(li, s.s_suppkey == li.l_suppkey, "left_semi") \
        .select("s_suppkey", "s_name")


# ------------------------------------------------- 18. scalar subquery
@register("parts_above_avg_price", """
SELECT p_partkey, p_retailprice FROM part
WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
""")
def parts_above_avg_price(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    avg_price = p.agg(F.avg("p_retailprice")).first()[0]
    return (p.filter(F.col("p_retailprice") > avg_price)
            .select("p_partkey", "p_retailprice"))


# ------------------------------------------- 19. collect_list (array agg)
@register("suppliers_per_nation_list", """
SELECT s_nationkey,
       array_to_string(list(s_suppkey ORDER BY s_suppkey), ',')
         AS supplier_keys
FROM supplier GROUP BY s_nationkey
""")
def suppliers_per_nation_list(spark, sf_dir):
    s = t(spark, sf_dir, "supplier")
    return (s.groupBy("s_nationkey")
            .agg(F.array_join(F.sort_array(F.collect_list("s_suppkey")),
                              ",").alias("supplier_keys")))


# ------------------------------------------------------ 20. date functions
@register("orders_by_year_month", f"""
SELECT CAST(year(o_orderdate) AS INT) AS yr,
       CAST(month(o_orderdate) AS INT) AS mo,
       CAST(count(*) AS BIGINT) AS n,
       CAST(CASE WHEN count({_fin('o_totalprice')}) > 0 THEN
            ((2 * CAST(sum(CAST(round(CAST({_fin('o_totalprice')}
                   AS DECIMAL(27,9)), 2) AS DECIMAL(18,2))) * 10000
                 AS BIGINT) + count({_fin('o_totalprice')}))
             - ((((2 * CAST(sum(CAST(round(CAST({_fin('o_totalprice')}
                   AS DECIMAL(27,9)), 2) AS DECIMAL(18,2))) * 10000
                 AS BIGINT) + count({_fin('o_totalprice')}))
                  % (2 * count({_fin('o_totalprice')})))
                 + (2 * count({_fin('o_totalprice')})))
                % (2 * count({_fin('o_totalprice')}))))
            // (2 * count({_fin('o_totalprice')})) END AS BIGINT)
         AS avg_price_e4
FROM orders GROUP BY 1, 2
""")
def orders_by_year_month(spark, sf_dir):
    """Date-part grouping with an EXACT scaled average.

    The obvious ``round(avg(o_totalprice), 4)`` is a latent determinism
    bug: the 1995-11 group's true mean x 10^4 sits exactly ON the
    round-half boundary (found by tools/round_boundary_audit.py), so a
    double ``avg`` accumulated in a different shuffle order can flip the
    last digit — the same failure mode that hit
    ``embedding_label_centroids`` in round 2.  The half-up-rounded
    scaled mean is pure integer arithmetic over exact decimal cents:
    ``floor((2*S*10^4 + n) / (2n))``, with the division spelled via the
    positive-mod normalization (embedding_dim_stats' trick) because
    Spark's ``DIV`` truncates where DuckDB's ``//`` floors — they
    differ on the negative sums a dirty corpus produces.  Round 16:
    prices reach the cent sum through the DECIMAL(27,9)->round->
    DECIMAL(18,2) route (a direct double->DECIMAL(18,2) cast is a
    scale-2 round that splits the engines on salted sub-cent prices),
    finite-only, and the count is the finite-price count so an
    all-non-finite group yields NULL instead of dividing by zero."""
    o = t(spark, sf_dir, "orders")
    fin = ("CASE WHEN NOT isnan(o_totalprice) AND abs(o_totalprice) != "
           "double('inf') THEN o_totalprice END")
    s4 = (f"(2 * CAST(sum(CAST(round(CAST({fin} AS DECIMAL(27,9)), 2) "
          f"AS DECIMAL(18,2))) * 10000 AS BIGINT) + count({fin}))")
    d = f"(2 * count({fin}))"
    return (o.groupBy(F.year("o_orderdate").cast("int").alias("yr"),
                      F.month("o_orderdate").cast("int").alias("mo"))
            .agg(F.count("*").alias("n"),
                 F.expr(f"CASE WHEN count({fin}) > 0 THEN "
                        f"({s4} - ((({s4} % {d}) + {d}) % {d})) "
                        f"DIV {d} END")
                 .cast("long").alias("avg_price_e4")))


# ---------------------------------------------------- 21. string functions
@register("part_name_tokens", """
SELECT p_partkey, upper(substr(p_name, 1, 5)) AS prefix,
       CAST(length(p_name) AS INT) AS name_len
FROM part WHERE p_name LIKE '%a%'
""")
def part_name_tokens(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    return (p.filter(F.col("p_name").like("%a%"))
            .select("p_partkey",
                    F.upper(F.substring("p_name", 1, 5)).alias("prefix"),
                    F.length("p_name").cast("int").alias("name_len")))


# ------------------------------------------------ 22. multi-join pipeline
@register("q5_supplier_nation_volume", f"""
SELECT n.n_name,
       {_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
""")
def q5_supplier_nation_volume(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    return (li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
            .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .groupBy("n_name")
            .agg(dec_sum(F.col("l_extendedprice")
                         * (1 - F.col("l_discount"))).alias("revenue")))


# --------------------------------------------- 23. set ops (INTERSECT/EXCEPT)
@register("set_ops_customer_cohorts", """
WITH y97 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE year(o_orderdate) = 1997),
     y98 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE year(o_orderdate) = 1998)
SELECT 'retained' AS cohort, o_custkey
FROM (SELECT o_custkey FROM y97 INTERSECT SELECT o_custkey FROM y98)
UNION ALL
SELECT 'churned' AS cohort, o_custkey
FROM (SELECT o_custkey FROM y97 EXCEPT SELECT o_custkey FROM y98)
""")
def set_ops_customer_cohorts(spark, sf_dir):
    """INTERSECT / EXCEPT (distinct set semantics).  Both compile to
    left-semi / left-anti hash joins over the deduplicated key sets —
    partial-aggregated map-side, one shuffle each on o_custkey."""
    o = t(spark, sf_dir, "orders")
    y97 = (o.filter(F.year("o_orderdate") == 1997)
           .select("o_custkey").distinct())
    y98 = (o.filter(F.year("o_orderdate") == 1998)
           .select("o_custkey").distinct())
    retained = y97.intersect(y98).select(
        F.lit("retained").alias("cohort"), "o_custkey")
    churned = y97.exceptAll(y98).select(
        F.lit("churned").alias("cohort"), "o_custkey")
    return retained.unionByName(churned)


# ------------------------------------------ 24. correlated EXISTS (q4 shape)
@register("q4_late_ship_priority", """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
""")
def q4_late_ship_priority(spark, sf_dir):
    """TPC-H Q4 shape: correlated EXISTS subquery = left-semi join with a
    compound (equi + range) condition.  The equi half (l_orderkey =
    o_orderkey) keeps it a hash semi-join — one shuffle on orderkey, the
    range predicate evaluated residually; no row explosion."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    cond = ((li.l_orderkey == o.o_orderkey) &
            (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")))
    return (o.join(li, cond, "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count("*").cast("bigint").alias("order_count")))


# ----------------------------------- 25. outer-join distribution (q13 shape)
@register("q13_customer_order_distribution", """
WITH per_cust AS (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM per_cust GROUP BY c_count
""")
def q13_customer_order_distribution(spark, sf_dir):
    """TPC-H Q13 shape: left outer join keeping order-less customers,
    count per customer, then the distribution of those counts.  First agg
    shuffles on custkey (map-side partial), second agg's domain is tiny
    (distinct order counts)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    per_cust = (c.join(o, o.o_custkey == c.c_custkey, "left")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").cast("bigint").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count("*").cast("bigint").alias("custdist")))


# ------------------------------------------ 26. IN subquery + HAVING (q18)
@register("q18_large_volume_orders", f"""
SELECT o.o_orderkey, o.o_custkey,
       {_dround(_fin('o.o_totalprice'), 2)} AS total_price,
       {_dsum('l.l_quantity')} AS total_qty
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST({_fin('l_quantity')} AS DECIMAL(27,9))) > 150)
GROUP BY o.o_orderkey, o.o_custkey, o.o_totalprice
""")
def q18_large_volume_orders(spark, sf_dir):
    """TPC-H Q18 shape: IN over a grouped-HAVING subquery = left-semi
    join against the qualifying key set.  The qualifying set is computed
    once (partial-agg'd), and both the semi join and the final agg share
    the l_orderkey/o_orderkey shuffle key, so AQE can reuse the exchange."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    # the HAVING threshold compares an exact DECIMAL sum (round 16):
    # a dirty sub-unit quantity makes the double group sum
    # accumulation-order-dependent right at the cutoff
    big = (li.groupBy("l_orderkey")
           .agg(F.sum(finite_or_null("l_quantity")
                      .cast("decimal(27,9)")).alias("q"))
           .filter(F.col("q") > 150).select("l_orderkey"))
    return (o.join(big.withColumnRenamed("l_orderkey", "o_orderkey"),
                   "o_orderkey", "left_semi")
            .join(li, o.o_orderkey == li.l_orderkey)
            .groupBy("o_orderkey", "o_custkey", "o_totalprice")
            .agg(dec_sum("l_quantity").alias("total_qty"))
            .select("o_orderkey", "o_custkey",
                    dec_round(finite_or_null("o_totalprice"), 2)
                    .alias("total_price"),
                    "total_qty"))


# ------------------------------------------------- 27. table profiling
@register("profile_orders", f"""
SELECT 'o_custkey' AS col,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(o_custkey) AS BIGINT) AS n_nonnull,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
       round(min(o_custkey), 2) AS min_val,
       round(max(o_custkey), 2) AS max_val
FROM orders
UNION ALL
SELECT 'o_totalprice', CAST(count(*) AS BIGINT),
       CAST(count(o_totalprice) AS BIGINT),
       CAST(count(DISTINCT o_totalprice) AS BIGINT),
       {_dagg('min', 'o_totalprice')}, {_dagg('max', 'o_totalprice')}
FROM orders
""")
def profile_orders(spark, sf_dir):
    """Data-profiling pass: per-column row/non-null/distinct counts and
    min/max, all columns in parallel over a SINGLE scan + aggregation
    (count(DISTINCT x), count(DISTINCT y) in one agg expand — not one
    job per column)."""
    o = t(spark, sf_dir, "orders")
    prof = o.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.count("o_custkey").cast("bigint").alias("nn_ck"),
        F.count_distinct("o_custkey").cast("bigint").alias("nd_ck"),
        F.round(F.min("o_custkey"), 2).alias("min_ck"),
        F.round(F.max("o_custkey"), 2).alias("max_ck"),
        F.count("o_totalprice").cast("bigint").alias("nn_tp"),
        F.count_distinct("o_totalprice").cast("bigint").alias("nd_tp"),
        dec_min("o_totalprice").alias("min_tp"),
        dec_max("o_totalprice").alias("max_tp"))
    ck = prof.select(F.lit("o_custkey").alias("col"), "n_rows",
                     F.col("nn_ck").alias("n_nonnull"),
                     F.col("nd_ck").alias("n_distinct"),
                     F.col("min_ck").cast("double").alias("min_val"),
                     F.col("max_ck").cast("double").alias("max_val"))
    tp = prof.select(F.lit("o_totalprice").alias("col"), "n_rows",
                     F.col("nn_tp").alias("n_nonnull"),
                     F.col("nd_tp").alias("n_distinct"),
                     F.col("min_tp").alias("min_val"),
                     F.col("max_tp").alias("max_val"))
    return ck.unionByName(tp)


# ---------------------------------------------- 28. statistical aggregates
@register("lineitem_price_stats", """
SELECT l_returnflag,
       round(stddev_samp(l_extendedprice), 4) AS price_stddev,
       round(var_samp(l_quantity), 4) AS qty_var,
       round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
       round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar
FROM lineitem GROUP BY l_returnflag
""")
def lineitem_price_stats(spark, sf_dir):
    """Moment-based statistics (stddev/variance/correlation/covariance)
    in one partial-aggregated pass — Spark's declarative agg computes
    these via single-pass co-moments, no second scan."""
    li = t(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.round(F.stddev_samp("l_extendedprice"), 4)
                 .alias("price_stddev"),
                 F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
                 F.round(F.corr("l_quantity", "l_extendedprice"), 6)
                 .alias("qty_price_corr"),
                 F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4)
                 .alias("qty_price_covar")))


# ------------------------------------------------- 29. positional explode
@register("part_token_positions", """
SELECT p_partkey, CAST(s.i AS INT) AS pos, s.tok
FROM (
  SELECT p_partkey,
         unnest(list_transform(generate_series(1, len(tk)),
                               i -> {'i': i, 'tok': tk[i]})) AS s
  FROM (SELECT p_partkey, string_split(p_name, ' ') AS tk
        FROM part WHERE p_partkey <= 200))
""")
def part_token_positions(spark, sf_dir):
    """posexplode: array element + its position (1-based to match SQL
    ordinality) — the lateral-view fan-out shape."""
    p = t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 200)
    return (p.select("p_partkey",
                     F.posexplode(F.split("p_name", " "))
                     .alias("pos0", "tok"))
            .select("p_partkey", (F.col("pos0") + 1).cast("int")
                    .alias("pos"), "tok"))


# --------------------------------------------- 30. equal-width histogram
@register("orders_price_histogram", """
WITH mm AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
            FROM orders)
SELECT CAST(least(floor((o_totalprice - lo) / ((hi - lo) / 10)), 9)
            AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n
FROM orders, mm GROUP BY 1
""")
def orders_price_histogram(spark, sf_dir):
    """Equal-width 10-bucket histogram: classic two-pass — a tiny global
    min/max aggregate broadcast back over the scan, then one partial-agg
    groupBy on the bucket id.  The broadcast keeps pass 2 shuffle-free
    until the 10-row final agg."""
    o = t(spark, sf_dir, "orders")
    mm = o.agg(F.min("o_totalprice").alias("lo"),
               F.max("o_totalprice").alias("hi"))
    return (o.crossJoin(F.broadcast(mm))
            .select(F.least(F.floor((F.col("o_totalprice") - F.col("lo"))
                                    / ((F.col("hi") - F.col("lo")) / 10)),
                            F.lit(9)).cast("bigint").alias("bucket"))
            .groupBy("bucket")
            .agg(F.count("*").cast("bigint").alias("n")))


# --------------------------------------------- 31. z-score anomaly flags
@register("events_value_anomalies", """
WITH stats AS (
  SELECT event_type,
         avg(CASE WHEN isfinite(value) THEN value END) AS mu,
         stddev_samp(CASE WHEN isfinite(value) THEN value END) AS sigma
  FROM events GROUP BY event_type)
SELECT e.event_id, e.event_type,
       round((e.value - s.mu) / s.sigma, 4) AS zscore
FROM events e JOIN stats s ON s.event_type = e.event_type
WHERE isfinite(e.value) AND s.sigma > 0
  AND abs((e.value - s.mu) / s.sigma) > 2.5
""")
def events_value_anomalies(spark, sf_dir):
    """Per-type z-score outliers: aggregate stats once (tiny — one row
    per type), broadcast them back over the stream, flag |z| > 2.5.
    No window, no second shuffle of the big table."""
    # moments over FINITE values only (one Inf overflows DuckDB's
    # STDDEV and poisons Spark's mean to NaN — silently zeroing the
    # output); non-finite rows can't be scored and are excluded;
    # try_divide keeps a constant group (sigma 0 -> NULL z) from
    # ANSI-killing the job, mirroring the oracle's sigma > 0
    ev = t(spark, sf_dir, "events")
    val = finite_or_null("value")
    stats = ev.groupBy(F.col("event_type").alias("s_type")).agg(
        F.avg(val).alias("mu"),
        F.stddev_samp(val).alias("sigma"))
    z = F.try_divide(val - F.col("mu"), F.col("sigma"))
    return (ev.join(F.broadcast(stats),
                    ev.event_type == F.col("s_type"))
            .filter(F.abs(z) > 2.5)
            .select("event_id", "event_type",
                    F.round(z, 4).alias("zscore")))


# ------------------------------------------ 32. explicit GROUPING SETS
@register("grouping_sets_revenue", f"""
SELECT r.r_name, n.n_name,
       {_dsum('o.o_totalprice')} AS revenue
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY GROUPING SETS ((r.r_name, n.n_name), (r.r_name), ())
""")
def grouping_sets_revenue(spark, sf_dir):
    """Explicit GROUPING SETS (vs CUBE/ROLLUP elsewhere): Catalyst expands
    the sets in ONE Expand+partial-agg pass over the joined scan — no
    re-read of the fact table per grouping, unlike a UNION ALL of three
    aggregates.  Dims are broadcast; only the final agg exchanges."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    o = t(spark, sf_dir, "orders")
    joined = (o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
              .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
              .join(F.broadcast(r), n.n_regionkey == r.r_regionkey))
    return (joined.groupingSets([["r_name", "n_name"], ["r_name"], []],
                                "r_name", "n_name")
            .agg(dec_sum("o_totalprice").alias("revenue")))


# ----------------------------------------------- 33. ntile bucketing
@register("ntile_customer_quartiles", """
SELECT quartile,
       CAST(count(*) AS BIGINT) AS n_customers,
       round(avg(c_acctbal), 2) AS avg_bal,
       round(min(c_acctbal), 2) AS min_bal,
       round(max(c_acctbal), 2) AS max_bal
FROM (SELECT c_acctbal,
             ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
      FROM customer)
GROUP BY quartile
""")
def ntile_customer_quartiles(spark, sf_dir):
    """EXACT ntile(4) semantics without the global-order window: a bare
    ``ntile() OVER (ORDER BY ...)`` is a single-partition sort at scale,
    so the global 0-based row number comes from the two-phase prefix sum
    (``functions/ids.py`` — range partition, per-partition cumsum, tiny
    partition-totals broadcast) and the tile id from ntile's own
    arithmetic: the first ``n mod 4`` tiles hold ``ceil(n/4)`` rows, the
    rest ``floor(n/4)`` (integer DIV throughout — no double rounding at
    any row count)."""
    from ..functions.ids import exclusive_prefix_sum
    c = t(spark, sf_dir, "customer").select("c_acctbal", "c_custkey")
    keyed = (c.withColumn("_k", F.struct("c_acctbal", "c_custkey"))
             .withColumn("_one", F.lit(1)))
    rn = exclusive_prefix_sum(keyed, "_k", "_one", out_col="_rn")
    n = c.agg(F.count("*").alias("_n"))
    tiled = (rn.crossJoin(F.broadcast(n))
             .withColumn("_big", F.expr("(_n + 3) DIV 4"))
             .withColumn("_small", F.expr("_n DIV 4"))
             .withColumn("_r", F.expr("_n % 4"))
             .withColumn(
                 "quartile",
                 F.expr("CAST(IF(_rn < _r * _big, _rn DIV _big, "
                        "_r + (_rn - _r * _big) DIV _small) + 1 AS INT)")))
    return (tiled.groupBy("quartile")
            .agg(F.count("*").alias("n_customers"),
                 F.round(F.avg("c_acctbal"), 2).alias("avg_bal"),
                 F.round(F.min("c_acctbal"), 2).alias("min_bal"),
                 F.round(F.max("c_acctbal"), 2).alias("max_bal")))


# ------------------------------------------------ 34. ordered funnel
@register("events_funnel", """
WITH stage AS (
  SELECT user_id,
         min(ts) FILTER (WHERE event_type = 'view')     AS t_view,
         min(ts) FILTER (WHERE event_type = 'click')    AS t_click,
         min(ts) FILTER (WHERE event_type = 'purchase') AS t_purchase
  FROM events GROUP BY user_id)
SELECT CAST(count(t_view) AS BIGINT) AS n_view,
       CAST(count(CASE WHEN t_click > t_view THEN 1 END) AS BIGINT)
         AS n_view_click,
       CAST(count(CASE WHEN t_click > t_view AND t_purchase > t_click
                       THEN 1 END) AS BIGINT) AS n_view_click_purchase
FROM stage
""")
def events_funnel(spark, sf_dir):
    """Ordered conversion funnel (view -> click -> purchase): one
    conditional-min agg per user (partial+final, single shuffle on
    user_id), then a tiny global rollup of stage reach.  No self-joins:
    the classic 3-way funnel join would shuffle the events table three
    times; this shape scans it once."""
    ev = t(spark, sf_dir, "events")
    first = lambda typ: F.min(F.when(F.col("event_type") == typ,
                                     F.col("ts")))
    stage = ev.groupBy("user_id").agg(
        first("view").alias("t_view"),
        first("click").alias("t_click"),
        first("purchase").alias("t_purchase"))
    vc = F.col("t_click") > F.col("t_view")
    vcp = vc & (F.col("t_purchase") > F.col("t_click"))
    return stage.agg(
        F.count("t_view").alias("n_view"),
        F.count(F.when(vc, 1)).alias("n_view_click"),
        F.count(F.when(vcp, 1)).alias("n_view_click_purchase"))


# -------------------------------------------- 35. cohort retention
@register("events_user_retention_cohorts", """
WITH per_user AS (
  SELECT user_id,
         date_trunc('week', min(ts)) AS cohort_week,
         list_distinct(list(date_trunc('week', ts))) AS weeks
  FROM events GROUP BY user_id)
SELECT CAST(cohort_week AS DATE) AS cohort_week,
       CAST(date_diff('day', cohort_week, w) / 7 AS INT) AS week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM per_user, unnest(weeks) AS t(w)
GROUP BY 1, 2
""")
def events_user_retention_cohorts(spark, sf_dir):
    """Weekly cohort retention in ONE shuffle of the events table: the
    per-user pass computes the cohort week (min ts) AND the distinct
    active weeks in the same user-keyed aggregation, then explodes the
    (small) week set — no second shuffle-join of activity back onto
    cohorts, which is the naive two-scan formulation."""
    ev = t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week"),
        F.collect_set(F.date_trunc("week", F.col("ts"))).alias("weeks"))
    return (per_user
            .select("cohort_week", F.explode("weeks").alias("w"))
            .groupBy(F.to_date("cohort_week").alias("cohort_week"),
                     (F.datediff("w", "cohort_week") / 7).cast("int")
                     .alias("week_offset"))
            .agg(F.count("*").alias("n_users")))


# ------------------------------------- 36. RANGE-frame rolling window
@register("events_rolling_hour_stats", """
SELECT event_id,
       CAST(count(*) OVER w AS BIGINT) AS n_trailing_hour,
       CAST(round(sum(CAST(CASE WHEN isfinite(value) THEN value END
                           AS DECIMAL(27,9))) OVER w, 4) AS DOUBLE)
         AS sum_trailing_hour
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
""")
def events_rolling_hour_stats(spark, sf_dir):
    """Per-event trailing-hour stats via a RANGE window frame over
    microsecond epoch (integer order key -> identical tie semantics in
    every engine; RANGE frames are tie-inclusive so the result is
    deterministic without a tiebreak).  One shuffle on user_id; the
    frame is evaluated with a sliding two-pointer pass per partition —
    no self-join fan-out, unlike the interval-join formulation.  The
    trailing sum rides finite-only DECIMAL(27,9) partials, rounded as
    a DECIMAL (seed-131 convention; round-15 tie audit: a 5-decimal
    dirty value lands the DOUBLE round on a splitting half)."""
    ev = t(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id")
         .orderBy(F.unix_micros("ts"))
         .rangeBetween(-3_600_000_000, 0))
    return ev.select(
        "event_id",
        F.count("*").over(w).alias("n_trailing_hour"),
        F.round(F.sum(finite_or_null("value").cast("decimal(27,9)"))
                .over(w), 4)
        .cast("double").alias("sum_trailing_hour"))


# ------------------------------------------------ 37. full outer join
@register("orders_vs_shipments_by_day", """
WITH od AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate <  TIMESTAMP '1995-02-01'
  GROUP BY 1),
sd AS (
  SELECT CAST(l_shipdate AS DATE) AS d,
         CAST(count(*) AS BIGINT) AS n_shipments
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1995-01-15'
    AND l_shipdate <  TIMESTAMP '1995-02-15'
  GROUP BY 1)
SELECT coalesce(od.d, sd.d) AS d, od.n_orders, sd.n_shipments
FROM od FULL OUTER JOIN sd ON od.d = sd.d
""")
def orders_vs_shipments_by_day(spark, sf_dir):
    """FULL OUTER join of two day-level aggregates over deliberately
    half-overlapping date windows, so the result exercises matched,
    left-only, and right-only rows (null-padded).  Both inputs shrink to
    ~30 rows before the join — aggregate-then-join, never join raw fact
    tables when only their rollups meet."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    od = (o.filter((F.col("o_orderdate") >= "1995-01-01") &
                   (F.col("o_orderdate") < "1995-02-01"))
          .groupBy(F.to_date("o_orderdate").alias("d"))
          .agg(F.count("*").alias("n_orders")))
    sd = (li.filter((F.col("l_shipdate") >= "1995-01-15") &
                    (F.col("l_shipdate") < "1995-02-15"))
          .groupBy(F.to_date("l_shipdate").alias("d"))
          .agg(F.count("*").alias("n_shipments")))
    return (od.join(sd, "d", "full_outer")
            .select("d", "n_orders", "n_shipments"))


# --------------------------------- 38. distribution windows (percentile)
@register("events_value_percentiles", """
WITH r AS (
  SELECT event_type, value,
         percent_rank() OVER (PARTITION BY event_type
                              ORDER BY value, event_id) AS pr,
         cume_dist() OVER (PARTITION BY event_type
                           ORDER BY value, event_id) AS cd
  FROM events WHERE value IS NOT NULL)
SELECT event_type,
       CAST(count(*) FILTER (WHERE pr >= 0.9) AS BIGINT) AS n_top_decile,
       CAST(round(CAST(
            CAST(sum(CAST(CASE WHEN isfinite(value) THEN value END
                          AS DECIMAL(27,9))) FILTER (WHERE pr >= 0.9)
                 AS DOUBLE)
            / count(CASE WHEN isfinite(value) THEN value END)
              FILTER (WHERE pr >= 0.9)
            AS DECIMAL(27,9)), 4) AS DOUBLE) AS avg_top_decile,
       CAST(round(CAST(max(cd) AS DECIMAL(27,9)), 6) AS DOUBLE)
         AS max_cume_dist
FROM r GROUP BY event_type
""")
def events_value_percentiles(spark, sf_dir):
    """percent_rank / cume_dist distribution windows per event type, then
    a top-decile rollup.  Partitioned by type so each window sorts only
    its own partition; the deterministic (value, event_id) order makes
    both engines agree on ties.

    NULL values are not values (the same convention as
    functions/quantiles.py): a distribution rank over a column with
    NULLs is engine-dependent — Spark's window sorts them FIRST
    (percent_rank ~0), DuckDB's LAST (percent_rank 1.0, silently
    claiming the whole top decile) — so both sides rank the non-null
    values only (round-12 dirty-corpus fuzz)."""
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    r = ev.select("event_type", "value",
                  F.percent_rank().over(w).alias("pr"),
                  F.cume_dist().over(w).alias("cd"))
    top = F.col("pr") >= 0.9
    # DECIMAL-routed rounds (round-15 tie audit): cume_dist is a count
    # ratio (rank/n — ties at 7 finite decimals split the engines'
    # DOUBLE rounds), and the top-decile avg is a value aggregate with
    # the same scale-4 exposure as the window-sum family.  The avg is
    # dec_avg-shaped (round-16 ADVICE): exact finite-only DECIMAL sum
    # cast to double ONCE, divided by the finite count — deterministic
    # across accumulation orders, unlike casting a double avg.  The
    # remaining full-precision casts (the quotient here, max(cd)) keep
    # the cast-tie residual documented at finite_or_null
    tv = F.when(top, finite_or_null("value"))
    return (r.groupBy("event_type")
            .agg(F.count(F.when(top, 1)).alias("n_top_decile"),
                 F.sum(tv.cast("decimal(27,9)")).alias("_s"),
                 F.count(tv).alias("_n"),
                 F.round(F.max("cd").cast("decimal(27,9)"), 6)
                 .cast("double").alias("max_cume_dist"))
            .select("event_type", "n_top_decile",
                    dec_round(F.try_divide(F.col("_s").cast("double"),
                                           F.col("_n")), 4)
                    .alias("avg_top_decile"),
                    "max_cume_dist"))


# --------------------------------------- 39. salted skew-resistant join
@register("salted_brand_revenue", f"""
SELECT p.p_brand,
       CAST(count(*) AS BIGINT) AS n_items,
       {_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
""")
def salted_brand_revenue(spark, sf_dir):
    """The same join as ``broadcast_join_brand_revenue`` executed through
    ``functions/skew.py::salted_join`` (replicate the dim 16x, salt the
    fact side) — the manual fallback when a hot key defeats AQE skew
    splitting and the dim is too big to broadcast.  The oracle is the
    PLAIN join: identical results prove the salt never leaks into
    semantics."""
    from ..functions.skew import salted_join
    li = t(spark, sf_dir, "lineitem")
    part = (t(spark, sf_dir, "part")
            .withColumnRenamed("p_partkey", "l_partkey"))
    joined = salted_join(li, part, "l_partkey", n_salts=16)
    return (joined.groupBy("p_brand")
            .agg(F.count("*").alias("n_items"),
                 dec_sum(F.col("l_extendedprice")
                         * (1 - F.col("l_discount"))).alias("revenue")))


# ==================================================================
# Remaining classic TPC-H query shapes (adapted to the trimmed driver
# schema: no partsupp table, no commit/receipt dates, no phone /
# container columns — each adaptation keeps the ORIGINAL query's
# optimizer shape and swaps only the column it predicates on).
# ==================================================================


# ------------------------------------ q6: full-pushdown single-row agg
@register("q6_forecast_revenue", f"""
SELECT {_dsum('l_extendedprice * l_discount')} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
""")
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6: every predicate pushes to the parquet scan; the agg is
    a map-side partial -> single-row final (no group keys, so the
    exchange carries one row per task regardless of data size)."""
    li = t(spark, sf_dir, "lineitem")
    return (li.filter((F.col("l_shipdate") >= "1996-01-01") &
                      (F.col("l_shipdate") < "1997-01-01") &
                      (F.col("l_discount") >= 0.05) &
                      (F.col("l_discount") <= 0.07) &
                      (F.col("l_quantity") < 24))
            .agg(dec_sum(F.col("l_extendedprice")
                         * F.col("l_discount")).alias("revenue")))


# --------------------------- q7: bidirectional nation-pair volume flow
@register("q7_volume_shipping", f"""
SELECT supp_nation, cust_nation, l_year, {_dsum('volume')} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l.l_shipdate) AS INT) AS l_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l.l_shipdate >= TIMESTAMP '1996-01-01'
    AND l.l_shipdate <= TIMESTAMP '1997-12-31'
) shipping
GROUP BY supp_nation, cust_nation, l_year
""")
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7: the nation dimension joins twice under different roles
    (supplier's vs customer's).  The nation-PAIR disjunction can't push
    below the joins as written, but its implication can: each side must
    be one of the two nations, so supplier and customer are restricted
    to 2/25 of their rows BEFORE they broadcast into the fact side —
    the inner joins then drop ~92 % of fact rows at probe time instead
    of carrying them to a post-join filter (measured 14.4×→ lower wall
    ratio at the 100× probe).  Only the cheap pair-exclusion (1-1, 2-2)
    remains post-join."""
    nations = ("NATION_1", "NATION_2")
    n1 = t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(*nations)).select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_name").alias("supp_nation"))
    n2 = t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(*nations)).select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("cust_nation"))
    s = (t(spark, sf_dir, "supplier")
         .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key")))
    c = (t(spark, sf_dir, "customer")
         .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key")))
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") &
        (F.col("l_shipdate") <= "1997-12-31"))
    o = t(spark, sf_dir, "orders")
    # prune BOTH sides of the orderkey shuffle before it happens:
    # li x broadcast(s) and o x broadcast(c) each keep ~2/25 of rows
    oc = o.join(F.broadcast(c), o.o_custkey == F.col("c_custkey"))
    j = (li.join(F.broadcast(s), li.l_suppkey == F.col("s_suppkey"))
         .join(oc, li.l_orderkey == F.col("o_orderkey"))
         .filter(F.col("supp_nation") != F.col("cust_nation")))
    return (j.withColumn("l_year",
                         F.year("l_shipdate").cast("int"))
            .groupBy("supp_nation", "cust_nation", "l_year")
            .agg(dec_sum(F.col("l_extendedprice")
                         * (1 - F.col("l_discount"))).alias("revenue")))


# ----------------------------- q8: market share (conditional ratio agg)
@register("q8_market_share", f"""
SELECT o_year,
       {_dround(_fin('mkt_raw'), 6)} AS mkt_share
FROM (
SELECT o_year,
       CAST(sum(CASE WHEN nation = 'NATION_3'
                THEN CAST({_fin('volume')} AS DECIMAL(27,9))
                ELSE CAST(0 AS DECIMAL(27,9)) END) AS DOUBLE)
       / CAST(sum(CAST({_fin('volume')} AS DECIMAL(27,9))) AS DOUBLE)
         AS mkt_raw
FROM (
  SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         n2.n_name AS nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
  JOIN region r ON n1.n_regionkey = r.r_regionkey
  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
    AND o.o_orderdate >= TIMESTAMP '1995-01-01'
    AND o.o_orderdate <= TIMESTAMP '1996-12-31'
) all_nations
GROUP BY o_year)
""")
def q8_market_share(spark, sf_dir):
    """TPC-H Q8: seven-table join where every dimension broadcasts and
    the one fact-side shuffle (lineitem->orders) is shared; market share
    is a conditional-sum / sum ratio in one aggregation pass.  The
    region restriction is applied INSIDE the customer dimension
    (customer ⋈ ASIA-nations ⋈ region) before it broadcasts, so
    non-ASIA order rows die at the broadcast probe instead of riding
    through every later join to a post-join filter."""
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") &
        (F.col("o_orderdate") <= "1996-12-31"))
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = (t(spark, sf_dir, "nation")
          .join(F.broadcast(r),
                F.col("n_regionkey") == F.col("r_regionkey"))
          .select(F.col("n_nationkey").alias("n1_key")))
    c = (t(spark, sf_dir, "customer")
         .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key")))
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("nation"))
    j = (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
         .join(o, li.l_orderkey == o.o_orderkey)
         .join(F.broadcast(c), o.o_custkey == F.col("c_custkey"))
         .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
         .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key")))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # exact DECIMAL numerator/denominator sums, ONE deterministic
    # double division (IEEE, identical in both engines), then the
    # dec_round route with a finite guard on the 0/0 edge (round 16)
    vdec = finite_or_null("volume").cast("decimal(27,9)")
    ratio = F.try_divide(F.col("_num").cast("double"),
                         F.col("_den").cast("double"))
    return (j.select(F.year("o_orderdate").cast("int").alias("o_year"),
                     vol.alias("volume"), "nation")
            .groupBy("o_year")
            .agg(F.sum(F.when(F.col("nation") == "NATION_3", vdec)
                       .otherwise(F.lit(0).cast("decimal(27,9)")))
                 .alias("_num"),
                 F.sum(vdec).alias("_den"))
            .select("o_year",
                    dec_round(finite_or_null(ratio), 6)
                    .alias("mkt_share")))


# ------------------------------------------- q10: returned-item ranking
@register("q10_returned_items", f"""
SELECT c.c_custkey, c.c_name,
       {_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       n.n_name, c.c_acctbal
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""")
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10: fact-side shuffle join + broadcast dims + grouped
    revenue + deterministic top-20 (integer custkey tie-break)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-10-01") &
        (F.col("o_orderdate") < "1997-01-01"))
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
            .agg(dec_sum(F.col("l_extendedprice")
                         * (1 - F.col("l_discount"))).alias("revenue"))
            .select("c_custkey", "c_name", "revenue", "n_name",
                    "c_acctbal")
            .orderBy(F.desc("revenue"), "c_custkey")
            .limit(20))


# ---------------- q12 shape: lateness band x priority CASE aggregation
@register("q12_late_priority_lines", """
SELECT ship_band,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM (
  SELECT CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
              THEN 'LATE' ELSE 'ONTIME' END AS ship_band,
         o.o_orderpriority
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
) bands
GROUP BY ship_band
""")
def q12_late_priority_lines(spark, sf_dir):
    """TPC-H Q12 shape (l_shipmode/commit/receipt don't exist in this
    schema, so the band is ship-lateness vs order date): join + derived
    band + two conditional counts in one aggregation."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .withColumn("ship_band",
                        F.when(F.col("l_shipdate") >
                               F.col("o_orderdate")
                               + F.expr("INTERVAL 60 DAY"),
                               "LATE").otherwise("ONTIME"))
            .groupBy("ship_band")
            .agg(F.sum(F.when(high, 1).otherwise(0)).cast("bigint")
                 .alias("high_line_count"),
                 F.sum(F.when(~high, 1).otherwise(0)).cast("bigint")
                 .alias("low_line_count")))


# ------------------------------------ q14: promo revenue ratio (1 row)
@register("q14_promo_revenue", f"""
SELECT {_dround(_fin('promo_raw'), 6)} AS promo_revenue
FROM (
SELECT 100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
             THEN CAST({_fin('l.l_extendedprice * (1 - l.l_discount)')}
                  AS DECIMAL(27,9))
             ELSE CAST(0 AS DECIMAL(27,9)) END) AS DOUBLE)
       / CAST(sum(CAST({_fin('l.l_extendedprice * (1 - l.l_discount)')}
                  AS DECIMAL(27,9))) AS DOUBLE) AS promo_raw
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
  AND l.l_shipdate < TIMESTAMP '1996-10-01')
""")
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14: broadcast join + conditional/total ratio collapsing to
    one row — the month filter prunes before the join.  Ratio-of-
    exact-DECIMAL-sums with one deterministic double division, like
    q8_market_share (round 16)."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-09-01") &
        (F.col("l_shipdate") < "1996-10-01"))
    p = t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    rdec = finite_or_null(rev).cast("decimal(27,9)")
    ratio = F.try_divide(100.0 * F.col("_num").cast("double"),
                         F.col("_den").cast("double"))
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .agg(F.sum(F.when(F.col("p_type") == "PROMO", rdec)
                       .otherwise(F.lit(0).cast("decimal(27,9)")))
                 .alias("_num"),
                 F.sum(rdec).alias("_den"))
            .select(dec_round(finite_or_null(ratio), 6)
                    .alias("promo_revenue")))


# --------------------- q15: top supplier (aggregate = scalar max of agg)
@register("q15_top_supplier", f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {_dsum('l_extendedprice * (1 - l_discount)')}
         AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
""")
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15: grouped revenue reused twice — once for the scalar max
    (one-row broadcast) and once for the equality probe.  Rounding to
    cents BEFORE the max makes the equality engine-portable."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") &
        (F.col("l_shipdate") < "1996-04-01"))
    rev = (li.groupBy(F.col("l_suppkey").alias("supplier_no"))
           .agg(dec_sum(F.col("l_extendedprice")
                        * (1 - F.col("l_discount")))
                .alias("total_revenue")))
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    s = t(spark, sf_dir, "supplier")
    return (rev.join(F.broadcast(mx),
                     rev.total_revenue == mx.max_revenue)
            .join(F.broadcast(s),
                  F.col("supplier_no") == s.s_suppkey)
            .select("s_suppkey", "s_name", "total_revenue"))


# -------------- q17: small-quantity lines vs per-part average (1 row)
@register("q17_small_quantity_revenue", f"""
SELECT {_dround(
    "CAST(sum(CAST(" + _fin('l.l_extendedprice')
    + " AS DECIMAL(27,9))) AS DOUBLE) / 7.0", 2)} AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN (SELECT l_partkey, {_davg('l_quantity', 6)} AS avg_qty
      FROM lineitem GROUP BY l_partkey) a
  ON a.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#11' AND l.l_quantity < 0.2 * a.avg_qty
""")
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17: the correlated per-part AVG subquery becomes a grouped
    aggregate co-partitioned with the probe join on l_partkey (one
    shuffle feeds both); the brand filter broadcasts.  The avg rides
    dec_avg (exact DECIMAL sum / count — deterministic in both
    engines) before the 0.2x threshold so summation order can't flip
    a borderline row; the yearly figure is the exact DECIMAL sum
    divided by 7 in IEEE, then dec_round (round 16)."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    avg_q = (li.groupBy(F.col("l_partkey").alias("a_partkey"))
             .agg(dec_avg("l_quantity", 6).alias("avg_qty")))
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .join(avg_q, li.l_partkey == F.col("a_partkey"))
            .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
            .agg(dec_round(
                F.sum(finite_or_null("l_extendedprice")
                      .cast("decimal(27,9)")).cast("double") / 7.0, 2)
                .alias("avg_yearly")))


# ------------------- q19: disjunction of conjunctive predicate blocks
@register("q19_disjunctive_revenue", f"""
SELECT {_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity >= 1 AND l.l_quantity <= 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity >= 10 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 20 AND l.l_quantity <= 30)
""")
def q19_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19: OR of conjunct blocks mixing columns from both sides.
    Catalyst extracts the common join key and the per-side residuals
    (brand/size prune the broadcast build; quantity bounds push to the
    lineitem scan as a derived range)."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    b = [((F.col("p_brand") == "Brand#12") &
          F.col("p_size").between(1, 5) &
          F.col("l_quantity").between(1, 11)),
         ((F.col("p_brand") == "Brand#2") &
          F.col("p_size").between(1, 10) &
          F.col("l_quantity").between(10, 20)),
         ((F.col("p_brand") == "Brand#3") &
          F.col("p_size").between(1, 15) &
          F.col("l_quantity").between(20, 30))]
    return (j.filter(b[0] | b[1] | b[2])
            .agg(dec_sum(F.col("l_extendedprice")
                         * (1 - F.col("l_discount"))).alias("revenue")))


# --------- q21 shape: sole-late-supplier on multi-supplier 'F' orders
@register("q21_waiting_suppliers", """
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY s.s_name
ORDER BY numwait DESC, s_name
LIMIT 10
""")
def q21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape (lateness = shipped >60 days after order date):
    the EXISTS / NOT-EXISTS pair over sibling lines becomes ONE grouped
    aggregate per order — distinct suppliers, distinct LATE suppliers,
    plus the late lines' suppliers as a per-order list (bounded by order
    width) — so the qualifying late lines explode straight out of the
    aggregate.  No join-back onto lineitem at all: one lineitem scan,
    one orderkey exchange pair, and the groupBy reuses the join's
    partitioning (round-1 probe had 2 scans + a second orderkey shuffle
    for the join-back; 10.1x wall at 100x was mostly that)."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = t(spark, sf_dir, "supplier")
    lo = (li.join(o, li.l_orderkey == o.o_orderkey)
          .select("l_orderkey", "l_suppkey",
                  (F.col("l_shipdate") > F.col("o_orderdate")
                   + F.expr("INTERVAL 60 DAY")).alias("late")))
    late_supp = F.when(F.col("late"), F.col("l_suppkey"))
    per_order = (lo.groupBy("l_orderkey")
                 .agg(F.countDistinct("l_suppkey").alias("n_supp"),
                      F.countDistinct(late_supp).alias("n_late_supp"),
                      # one entry per LATE LINE (collect_list drops the
                      # NULLs of on-time lines) — preserves Q21's
                      # count-of-l1-rows multiplicity without a join-back
                      F.collect_list(late_supp).alias("late_lines")))
    return (per_order.filter((F.col("n_supp") > 1) &
                             (F.col("n_late_supp") == 1))
            .select(F.explode("late_lines").alias("l_suppkey"))
            .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
            .groupBy("s_name")
            .agg(F.count("*").cast("bigint").alias("numwait"))
            .orderBy(F.desc("numwait"), "s_name")
            .limit(10))


# ------- q22 shape: above-average idle customers by name-digit cohort
@register("q22_idle_customers", f"""
SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
       {_dsum('c_acctbal')} AS totacctbal
FROM (
  SELECT substring(c_name, 18, 1) AS cntrycode, c_acctbal, c_custkey
  FROM customer
  WHERE substring(c_name, 18, 1) IN ('1', '3', '5', '7', '9')
    AND c_acctbal > (SELECT {_davg('c_acctbal', 6)} FROM customer
                     WHERE c_acctbal > 0.0
                       AND substring(c_name, 18, 1)
                           IN ('1', '3', '5', '7', '9'))
    AND NOT EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c_custkey
                      AND o.o_orderdate >= TIMESTAMP '2000-01-01')
) custsale
GROUP BY cntrycode
""")
def q22_idle_customers(spark, sf_dir):
    """TPC-H Q22 shape (cohort = last digit of the fixed-width c_name,
    standing in for the phone country code; 'idle' = no order since
    2000 — every synthetic customer has SOME order, so the literal
    no-orders-ever predicate would be vacuously empty): scalar-subquery
    average as a one-row broadcast, NOT EXISTS as a left-anti join on
    the date-pruned orders scan."""
    c = (t(spark, sf_dir, "customer")
         .withColumn("cntrycode", F.substring("c_name", 18, 1))
         .filter(F.col("cntrycode").isin("1", "3", "5", "7", "9")))
    avg_bal = (c.filter(F.col("c_acctbal") > 0.0)
               .agg(dec_avg("c_acctbal", 6).alias("avg_bal")))
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "2000-01-01")
    return (c.join(F.broadcast(avg_bal),
                   c.c_acctbal > F.col("avg_bal"))
            .join(o, c.c_custkey == o.o_custkey, "left_anti")
            .groupBy("cntrycode")
            .agg(F.count("*").cast("bigint").alias("numcust"),
                 dec_sum("c_acctbal").alias("totacctbal")))


# ---------------------------------------------------------------------------
# q2/q9/q11/q16/q20 shapes.  The driver schema has no partsupp table
# (TESTDATA.md), so the supplier-part relation is DERIVED from lineitem:
# ps(partkey, suppkey, supplycost=min extendedprice ever charged).  The
# derivation is one grouped aggregate, shared verbatim by the DuckDB
# oracles, and preserves exactly the plan shapes that make these five
# queries distinct from the rest of the suite.

_PS_SQL = f"""
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         {_dagg('min', 'l_extendedprice')} AS ps_supplycost
  FROM lineitem GROUP BY l_partkey, l_suppkey
"""


def _derived_partsupp(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (li.groupBy(F.col("l_partkey").alias("ps_partkey"),
                       F.col("l_suppkey").alias("ps_suppkey"))
            .agg(dec_min("l_extendedprice").alias("ps_supplycost")))


# ---------------- q2 shape: min-cost supplier per part within a region
@register("q2_min_cost_supplier", f"""
WITH ps AS ({_PS_SQL}),
eligible AS (
  SELECT p.p_partkey, s.s_suppkey, s.s_name, s.s_acctbal, n.n_name,
         ps.ps_supplycost
  FROM part p
  JOIN ps ON ps.ps_partkey = p.p_partkey
  JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE p.p_size IN (19, 23, 29) AND p.p_type = 'LARGE'
    AND r.r_name = 'EUROPE')
SELECT e.s_acctbal, e.s_name, e.n_name, e.p_partkey, e.s_suppkey,
       e.ps_supplycost
FROM eligible e
JOIN (SELECT p_partkey AS m_partkey, min(ps_supplycost) AS min_cost
      FROM eligible GROUP BY p_partkey) m
  ON e.p_partkey = m.m_partkey AND e.ps_supplycost = m.min_cost
ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, e.p_partkey, e.s_suppkey
LIMIT 100
""")
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: the correlated MIN-cost subquery becomes a grouped
    min per part joined back onto the eligible rows — both consumers
    share one shuffle on partkey.  part/supplier/nation/region are all
    broadcast-sized, so the only exchange on the derived partsupp is its
    own aggregation; costs are rounded to cents before the equality so
    the min-probe is engine-portable.  (Reference has no joins at all —
    SURVEY.md §2.2; this is extension surface.)"""
    ps = _derived_partsupp(spark, sf_dir)
    # p_size IN a small set (not a single size): at the sf0.01 gate scale
    # a single-size filter leaves one part, which would verify the
    # min-cost-per-part group-back join on a trivial single-row result
    p = t(spark, sf_dir, "part").filter(
        F.col("p_size").isin(19, 23, 29) & (F.col("p_type") == "LARGE"))
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eligible = (ps.join(F.broadcast(p),
                        ps.ps_partkey == p.p_partkey)
                .join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
                .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
                .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
                .select("p_partkey", "s_suppkey", "s_name", "s_acctbal",
                        "n_name", "ps_supplycost"))
    min_cost = (eligible.groupBy(F.col("p_partkey").alias("m_partkey"))
                .agg(F.min("ps_supplycost").alias("min_cost")))
    return (eligible.join(F.broadcast(min_cost),
                          (F.col("p_partkey") == F.col("m_partkey")) &
                          (F.col("ps_supplycost") == F.col("min_cost")))
            .select("s_acctbal", "s_name", "n_name", "p_partkey",
                    "s_suppkey", "ps_supplycost")
            .orderBy(F.desc("s_acctbal"), "n_name", "s_name",
                     "p_partkey", "s_suppkey")
            .limit(100))


# ------------------- q9 shape: profit by supplier nation and order year
@register("q9_product_type_profit", f"""
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS INT) AS o_year,
       {_dsum('''l.l_extendedprice * (1 - l.l_discount)
                 - 0.1 * p.p_retailprice * l.l_quantity''')} AS profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%red%'
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""")
def q9_product_type_profit(spark, sf_dir):
    """TPC-H Q9 shape (supply cost modeled as 10% of retail price, and
    the year taken from o_orderdate since the schema has no ps table):
    the LIKE filter prunes the broadcast part build ahead of the fact
    scan, supplier/nation broadcast, and the one real shuffle is
    lineitem⋈orders on orderkey feeding the final (nation, year) agg."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    o = t(spark, sf_dir, "orders")
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
            .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .join(o, li.l_orderkey == o.o_orderkey)
            .groupBy(F.col("n_name").alias("nation"),
                     F.year("o_orderdate").cast("int").alias("o_year"))
            .agg(dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
                - 0.1 * F.col("p_retailprice") * F.col("l_quantity"))
                .alias("profit"))
            .orderBy("nation", F.desc("o_year")))


# --------------- q11 shape: parts above a global value-share threshold
@register("q11_important_parts", f"""
WITH val AS (
  SELECT l.l_partkey AS partkey,
         CAST(round(sum(CAST({_fin('l.l_extendedprice * l.l_quantity')}
                        AS DECIMAL(27,9))), 2) * 100 AS BIGINT) AS cents
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name IN ('NATION_3', 'NATION_7')
  GROUP BY l.l_partkey)
SELECT partkey, round(cents / 100.0, 2) AS part_value
FROM val
WHERE cents * 500 > (SELECT CAST(sum(cents) AS BIGINT) FROM val)
ORDER BY part_value DESC, partkey
""")
def q11_important_parts(spark, sf_dir):
    """TPC-H Q11 shape: group-sum per part, kept only when it exceeds a
    fraction of the GLOBAL sum — the scalar subquery is a one-row
    re-aggregation of the already-shuffled per-part sums, broadcast into
    the probe (the fact table is scanned and shuffled exactly once).
    The 0.2% threshold is applied by integer cross-multiplication on
    cent-rounded values (cents * 500 > total_cents) per the module's
    float-threshold convention — no double summation-order error can
    flip a borderline part between engines."""
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7"))
    val = (li.join(F.broadcast(s.join(F.broadcast(n),
                                      s.s_nationkey == n.n_nationkey)),
                   li.l_suppkey == F.col("s_suppkey"))
           .groupBy(F.col("l_partkey").alias("partkey"))
           .agg((F.round(F.sum(
               finite_or_null(F.col("l_extendedprice")
                              * F.col("l_quantity"))
               .cast("decimal(27,9)")), 2) * 100)
                .cast("bigint").alias("cents")))
    thresh = val.agg(F.sum("cents").cast("bigint").alias("total_cents"))
    return (val.join(F.broadcast(thresh),
                     val.cents * 500 > F.col("total_cents"))
            .select("partkey",
                    F.round(F.col("cents") / 100.0, 2).alias("part_value"))
            .orderBy(F.desc("part_value"), "partkey"))


# ------- q16 shape: supplier diversity per part attrs, excluding flagged
@register("q16_part_supplier_counts", """
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'MEDIUM'
  AND p.p_size IN (1, 9, 15, 22, 30, 44, 49)
  AND l.l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
""")
def q16_part_supplier_counts(spark, sf_dir):
    """TPC-H Q16 shape (negative account balance stands in for the
    'complaints' comment filter): NOT IN over a provably non-null key
    set is a left-anti broadcast join; count(DISTINCT suppkey) is the
    two-phase distinct aggregate on the (brand,type,size) shuffle."""
    li = t(spark, sf_dir, "lineitem")
    p = (t(spark, sf_dir, "part")
         .filter((F.col("p_brand") != "Brand#1") &
                 (F.col("p_type") != "MEDIUM") &
                 F.col("p_size").isin(1, 9, 15, 22, 30, 44, 49)))
    bad = t(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0).select("s_suppkey")
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey,
                  "left_anti")
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").cast("bigint")
                 .alias("supplier_cnt"))
            .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type",
                     "p_size"))


# ------------ q20 shape: suppliers who moved excess volume of a part set
@register("q20_excess_suppliers", f"""
SELECT s.s_suppkey, s.s_name
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name IN ('NATION_1', 'NATION_5')
  AND s.s_suppkey IN (
    SELECT l.l_suppkey
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_name LIKE 'small%'
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l.l_suppkey
    HAVING sum(CAST({_fin('l.l_quantity')} AS DECIMAL(27,9))) > 250)
ORDER BY s.s_suppkey
""")
def q20_excess_suppliers(spark, sf_dir):
    """TPC-H Q20 shape: the IN over an aggregated-with-HAVING subquery
    is a left-semi join from the (tiny) supplier dim into the grouped
    shipped-quantity totals; the part-name LIKE and the ship-date range
    both prune the fact scan BEFORE its one shuffle on suppkey.  The
    HAVING threshold compares an exact finite-only DECIMAL sum (round
    16): base quantities are integers, but a dirty corpus salts
    fractional ones and a double group sum right at the cutoff is
    accumulation-order-dependent."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") &
        (F.col("l_shipdate") < "1998-01-01"))
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    n = t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_5"))
    # threshold 250 (not 400): at the sf0.01 gate scale 400 leaves an
    # empty result, so the parity check would compare empty-vs-empty and
    # give no signal on the semi-join/HAVING semantics
    movers = (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
              .groupBy("l_suppkey")
              .agg(F.sum(finite_or_null("l_quantity")
                         .cast("decimal(27,9)")).alias("shipped"))
              .filter(F.col("shipped") > 250))
    s = t(spark, sf_dir, "supplier")
    return (s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .join(movers, s.s_suppkey == movers.l_suppkey, "left_semi")
            .select("s_suppkey", "s_name")
            .orderBy("s_suppkey"))


# ----------------- file sink round-trip (§2.3 #15, driver-checkable)
@register("parquet_sink_roundtrip", f"""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       {_dsum('o_totalprice')} AS total
FROM orders
WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""")
def parquet_sink_roundtrip(spark, sf_dir):
    """File-sink capability (SURVEY §2.3 #15) as a hash-checked driver
    row: write a filtered projection to a hive-partitioned parquet sink
    (`partitionBy` — the layout that makes downstream partition pruning
    possible at 100 TB), read the sink back, and aggregate the re-read
    data.  The oracle aggregates the source directly, so any loss or
    duplication in the write/read round-trip (or a partition-value
    encoding bug in the priority strings) breaks the hash match.

    SIDE EFFECT AT BUILD TIME (unavoidable for a write capability): the
    distributed write runs when the builder is invoked, not when the
    returned frame executes — plan-only sweeps trigger it too.  Each
    invocation writes to its own fresh temp dir (no shared fixed path,
    so concurrent gate/bench/ratchet runs cannot race) under the
    system temp root, which owns cleanup."""
    import tempfile
    out = tempfile.mkdtemp(prefix="spark_sink_roundtrip_")
    o = (t(spark, sf_dir, "orders")
         .filter(F.col("o_orderstatus") == "F")
         .select("o_orderkey", "o_orderpriority", "o_totalprice"))
    o.write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
    back = spark.read.parquet(out)
    return (back.groupBy("o_orderpriority")
            .agg(F.count("*").cast("bigint").alias("n"),
                 dec_sum("o_totalprice").alias("total"))
            .orderBy("o_orderpriority"))
