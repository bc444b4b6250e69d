"""Constructed half-cent trigger tests for the round-16 DECIMAL
conversion of the TPC-H monetary aggregate sites (VERDICT r15 item 1).

Each test builds a tiny corpus whose group aggregate lands EXACTLY on
a measured *splitting* decimal half — a value where Spark's
shortest-decimal-representation round and DuckDB's binary round
disagree (e.g. round(2.175, 2): Spark 2.18, DuckDB 2.17) — runs the
REAL registered query on it against the real oracle SQL, and asserts
(a) the two engines now agree and (b) the agreed value is the exact
HALF_UP result, proving the site rides the DECIMAL(27,9) route rather
than merely dodging the tie.  One test per converted family: group
sum, min/max, avg (sum/count), ratio-of-sums, the scaled cent cast +
floored division, and the HAVING threshold.
"""
import os
import sys

import duckdb
import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tools"))

import oracle_sweep as OS  # noqa: E402
from dask_relabeling_spark.plans.relational import REGISTRY  # noqa: E402

# Measured scale-2 splitters (round-16 probe: Spark rounds UP at the
# true half via the shortest-decimal rendering, DuckDB rounds DOWN on
# the below-half binary value).  2.175 is constructible as a lineitem
# revenue product: 4.35 * (1 - 0.75) = 1.0875, twice.
SPLIT2 = 2.175
SPLIT2_B = 0.145


def _mini_corpus(tmp_path, tables: dict) -> str:
    """Write per-table rows to parquet with the driver schemas."""
    ddl = {
        "lineitem": "SELECT CAST(col0 AS BIGINT) l_orderkey, CAST(col1 AS "
                    "BIGINT) l_partkey, CAST(col2 AS BIGINT) l_suppkey, "
                    "CAST(col3 AS INT) l_linenumber, CAST(col4 AS DOUBLE) "
                    "l_quantity, CAST(col5 AS DOUBLE) l_extendedprice, "
                    "CAST(col6 AS DOUBLE) l_discount, CAST(col7 AS DOUBLE) "
                    "l_tax, col8 l_returnflag, col9 l_linestatus, "
                    "CAST(col10 AS TIMESTAMP) l_shipdate",
        "orders": "SELECT CAST(col0 AS BIGINT) o_orderkey, CAST(col1 AS "
                  "BIGINT) o_custkey, col2 o_orderstatus, CAST(col3 AS "
                  "DOUBLE) o_totalprice, CAST(col4 AS TIMESTAMP) "
                  "o_orderdate, col5 o_orderpriority",
        "part": "SELECT CAST(col0 AS BIGINT) p_partkey, col1 p_name, col2 "
                "p_brand, col3 p_type, CAST(col4 AS INT) p_size, "
                "CAST(col5 AS DOUBLE) p_retailprice",
    }
    con = duckdb.connect()
    out = str(tmp_path)
    for name, rows in tables.items():
        vals = ", ".join(rows)
        con.execute(f"COPY ({ddl[name]} FROM (VALUES {vals})) TO "
                    f"'{out}/{name}.parquet' (FORMAT PARQUET)")
    con.close()
    return out


def _run_pair(spark, sf_dir, name):
    fn, oracle = REGISTRY[name]
    sdf = OS.normalize(fn(spark, sf_dir).toPandas())
    con = duckdb.connect()
    for t in ("lineitem", "orders", "part"):
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{p}')")
    odf = OS.normalize(con.execute(oracle).df())
    con.close()
    assert list(sdf.columns) == list(odf.columns), (sdf.columns,
                                                    odf.columns)
    assert OS.values_match(sdf, odf), (name, sdf, odf)
    return sdf


LI_ROW = ("({ok}, {pk}, {sk}, 1, {qty}, {price}, {disc}, 0.0, "
          "'{rf}', '{ls}', TIMESTAMP '1998-06-01 00:00:00')")


def test_group_sum_half_cent(spark, tmp_path):
    """dec_sum family (q1): two 4.35 x (1-0.75) products sum to the
    splitting half 2.175 -> exact DECIMAL HALF_UP gives 2.18 in BOTH
    engines (pre-conversion: Spark 2.18, DuckDB 2.17)."""
    rows = [LI_ROW.format(ok=1, pk=1, sk=1, qty=1.0875, price=4.35,
                          disc=0.75, rf="Z", ls="Z"),
            LI_ROW.format(ok=1, pk=1, sk=1, qty=1.0875, price=4.35,
                          disc=0.75, rf="Z", ls="Z")]
    sf = _mini_corpus(tmp_path, {"lineitem": rows})
    sdf = _run_pair(spark, sf, "q1_pricing_summary")
    row = sdf.iloc[0]
    assert row["sum_disc_price"] == 2.18, row["sum_disc_price"]
    assert row["sum_qty"] == 2.18, row["sum_qty"]


def test_min_max_half_cent(spark, tmp_path):
    """dec_min/dec_max family (q1): a salted sub-cent price 2.175 in
    its own group rounds HALF_UP to 2.18 as min, max, AND sum."""
    rows = [LI_ROW.format(ok=2, pk=1, sk=1, qty=1.0, price=SPLIT2,
                          disc=0.0, rf="Y", ls="Y")]
    sf = _mini_corpus(tmp_path, {"lineitem": rows})
    sdf = _run_pair(spark, sf, "q1_pricing_summary")
    row = sdf.iloc[0]
    assert (row["min_price"], row["max_price"],
            row["sum_base_price"]) == (2.18, 2.18, 2.18), row


def test_avg_sum_over_count(spark, tmp_path):
    """dec_avg family (q1 avg_qty): quantities 1.0000005 + 1.000001
    average exactly onto the scale-6 half 1.00000075 -> HALF_UP
    1.000001 in both engines (the quotient is one deterministic IEEE
    division of the exact DECIMAL sum)."""
    rows = [LI_ROW.format(ok=3, pk=1, sk=1, qty=1.0000005, price=1.00,
                          disc=0.0, rf="Z", ls="Z"),
            LI_ROW.format(ok=3, pk=1, sk=1, qty=1.0000010, price=1.00,
                          disc=0.0, rf="Z", ls="Z")]
    sf = _mini_corpus(tmp_path, {"lineitem": rows})
    sdf = _run_pair(spark, sf, "q1_pricing_summary")
    assert sdf.iloc[0]["avg_qty"] == 1.000001, sdf.iloc[0]["avg_qty"]


def test_plain_sum_and_filter_sum(spark, tmp_path):
    """Plain monetary sums (cube) + FILTERed sums (pivot) over orders:
    two 1.0875 totals sum to the splitting half -> 2.18 everywhere."""
    o = ("({k}, 1, '{st}', {tp}, TIMESTAMP '1996-03-15 00:00:00', "
         "'{pr}')")
    rows = [o.format(k=1, st="F", tp=1.0875, pr="9-TIE"),
            o.format(k=2, st="F", tp=1.0875, pr="9-TIE")]
    sf = _mini_corpus(tmp_path, {"orders": rows})
    cube = _run_pair(spark, sf, "cube_order_stats")
    tot = cube[cube["o_orderpriority"].notna()
               & cube["o_orderstatus"].notna()].iloc[0]["total"]
    assert tot == 2.18, tot
    piv = _run_pair(spark, sf, "pivot_status_by_priority")
    assert piv.iloc[0]["total_f"] == 2.18, piv.iloc[0]["total_f"]


def test_scaled_cent_cast_and_floored_division(spark, tmp_path):
    """orders_by_year_month: the 0.145 sub-cent price must reach the
    cent sum as 0.15 (DEC(27,9)->round->DEC(18,2); a direct
    double->DECIMAL(18,2) cast splits the engines), and a NEGATIVE
    month sum exercises the positive-mod floored division (Spark DIV
    truncates, DuckDB // floors — they differ below zero)."""
    o = ("({k}, 1, 'F', {tp}, TIMESTAMP '{d} 00:00:00', '1-URGENT')")
    rows = [o.format(k=1, tp=SPLIT2_B, d="1995-06-15"),
            o.format(k=2, tp=-0.01, d="1995-07-02"),
            o.format(k=3, tp=0.00, d="1995-07-10"),
            o.format(k=4, tp=0.00, d="1995-07-20")]
    sf = _mini_corpus(tmp_path, {"orders": rows})
    sdf = _run_pair(spark, sf, "orders_by_year_month")
    jun = sdf[sdf["mo"] == 6].iloc[0]
    # 0.145 -> cents 15 -> mean e4 = 1500
    assert jun["avg_price_e4"] == 1500, jun["avg_price_e4"]
    jul = sdf[sdf["mo"] == 7].iloc[0]
    # mean = -1 cent / 3 -> e4 = floor((2*-100 + 3) / 6) = -33;
    # a truncating DIV without the positive-mod would give -32
    assert jul["avg_price_e4"] == -33, jul["avg_price_e4"]


def test_ratio_of_exact_sums_zero_denominator(spark, tmp_path):
    """q14 ratio family: exact DECIMAL numerator/denominator with one
    deterministic division; an all-zero-revenue month (0/0) must be
    NULL in BOTH engines instead of NaN-vs-error."""
    li = [LI_ROW.format(ok=1, pk=1, sk=1, qty=1.0, price=0.0, disc=0.0,
                        rf="N", ls="O").replace("1998-06-01",
                                                "1996-09-10")]
    part = ["(1, 'zero part', 'Brand#9', 'PROMO', 1, 1.00)"]
    sf = _mini_corpus(tmp_path, {"lineitem": li, "part": part})
    sdf = _run_pair(spark, sf, "q14_promo_revenue")
    assert sdf.iloc[0].isna()["promo_revenue"], sdf


def test_having_threshold_exact_decimal(spark, tmp_path):
    """q18 HAVING family: a group summing to EXACTLY 150 (75.00 twice)
    is excluded by the exact DECIMAL > 150 compare in both engines; a
    group at 150.0001 is included."""
    li = [LI_ROW.format(ok=1, pk=1, sk=1, qty=75.0, price=1.00,
                        disc=0.0, rf="N", ls="O"),
          LI_ROW.format(ok=1, pk=1, sk=1, qty=75.0, price=1.00,
                        disc=0.0, rf="N", ls="O"),
          LI_ROW.format(ok=2, pk=1, sk=1, qty=150.0001, price=1.00,
                        disc=0.0, rf="N", ls="O")]
    o = "({k}, 1, 'F', 10.00, TIMESTAMP '1996-03-15 00:00:00', '1-URGENT')"
    orders = [o.format(k=1), o.format(k=2)]
    sf = _mini_corpus(tmp_path, {"lineitem": li, "orders": orders})
    sdf = _run_pair(spark, sf, "q18_large_volume_orders")
    assert list(sdf["o_orderkey"]) == [2], sdf


@pytest.mark.parametrize("val,scale,spark_raw,duck_raw,agreed", [
    (2.175, 2, 2.18, 2.17, 2.18),
    (-2.175, 2, -2.18, -2.17, -2.18),
    (0.145, 2, 0.15, 0.14, 0.15),
    (42.45195, 4, 42.452, 42.4519, 42.452),
])
def test_splitters_still_split_raw_and_agree_decimal(
        spark, val, scale, spark_raw, duck_raw, agreed):
    """Pin the measured splitter property itself: the RAW double round
    still disagrees between the engines (if an engine upgrade changes
    this, the trigger corpus needs re-measuring), while the DECIMAL
    route agrees on the exact HALF_UP value."""
    con = duckdb.connect()
    s_raw = spark.sql(
        f"SELECT round(CAST({val!r} AS DOUBLE), {scale})").first()[0]
    d_raw = con.execute(
        f"SELECT round({val!r}::DOUBLE, {scale})").fetchone()[0]
    assert (s_raw, d_raw) == (spark_raw, duck_raw), (s_raw, d_raw)
    dec = (f"CAST(round(CAST(CAST({val!r} AS DOUBLE) AS "
           f"DECIMAL(27,9)), {scale}) AS DOUBLE)")
    s_dec = spark.sql(f"SELECT {dec}").first()[0]
    d_dec = con.execute(f"SELECT {dec}").fetchone()[0]
    con.close()
    assert s_dec == d_dec == agreed, (s_dec, d_dec)
