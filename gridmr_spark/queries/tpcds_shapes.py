"""TPC-DS-shape queries over the existing catalog — proof the operator
surface composes beyond TPC-H's join/agg patterns. Each query reproduces a
canonical TPC-DS *plan shape* (the benchmark's tables don't exist in the
testdata, so semantics adapt to the TPC-H-ish schema):

- ds_store_sales_rollup : q47 — periodic rollup + moving-average window
  over the AGGREGATED frame (never windowing the fact table directly).
- ds_returns_anti       : q16/q69 — fact anti-join against a returns set.
- ds_date_star          : every-DS-query — star join through a DATE
  DIMENSION (derived here, broadcast), grouping by dim attributes.
- ds_customer_ltv_window: q74-ish — customer lifetime value + ntile
  segmentation over a global ranking.
- ds_channel_compare    : q78 — FULL OUTER join of two channel aggregates
  of the same fact, coalesced comparison columns.

Determinism conventions as everywhere else (see functions/numeric.py):
decimal-exact money sums cast to double at the end, deterministic
tie-breaks, identical aliases in the Spark plan and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gridmr_spark.catalog import load_table
from gridmr_spark.functions.numeric import dmoney
from gridmr_spark.queries import query

# ---------------------------------------------------------------------------
# ds_store_sales_rollup — monthly sales per nation + 3-month moving average
# ---------------------------------------------------------------------------

_ROLLUP_ORACLE = """
WITH monthly AS (
  SELECT n.n_name,
         CAST(date_trunc('month', o.o_orderdate) AS TIMESTAMP) AS month,
         SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS msum
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name, 2
)
SELECT n_name, month,
       CAST(msum AS DOUBLE) AS monthly_sales,
       CAST(CAST(SUM(msum) OVER w AS DOUBLE)
            / CAST(COUNT(msum) OVER w AS DOUBLE) AS DOUBLE) AS movavg_3m
FROM monthly
WINDOW w AS (PARTITION BY n_name ORDER BY month
             ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
"""


@query("ds_store_sales_rollup", oracle=_ROLLUP_ORACLE)
def ds_store_sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q47 shape: monthly sales per nation with a centered 3-month
    moving average. The window runs over the (nation x month) AGGREGATE —
    thousands of rows at any fact size — never over the fact table; the
    moving average is an exact decimal moving SUM divided once in double,
    so both engines produce the identical bits regardless of their window
    summation order. Plan: fact shuffles once for the group-by; nation and
    customer are broadcast."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    monthly = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name", F.date_trunc("month", F.col("o_orderdate")).alias("month"))
        .agg(F.sum(dmoney("o_totalprice", 2)).alias("msum"))
    )
    w = Window.partitionBy("n_name").orderBy("month").rowsBetween(-1, 1)
    return monthly.select(
        "n_name",
        "month",
        F.col("msum").cast("double").alias("monthly_sales"),
        (
            F.sum("msum").over(w).cast("double")
            / F.count("msum").over(w).cast("double")
        ).alias("movavg_3m"),
    )


# ---------------------------------------------------------------------------
# ds_returns_anti — orders with no returned line item
# ---------------------------------------------------------------------------

_RETURNS_ANTI_ORACLE = """
SELECT o.o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS clean_value
FROM orders o
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
)
GROUP BY o.o_orderpriority
"""


@query("ds_returns_anti", oracle=_RETURNS_ANTI_ORACLE)
def ds_returns_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q16/q69 shape: fact rows with NO matching row in a returns
    set — a LeftAnti join from orders to the 'R'-flagged line items, then a
    priority rollup. The returnflag predicate pushes into the lineitem scan
    and only (orderkey) survives to the anti side, so the join's build input
    is a fraction of the fact at any scale."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    returned = li.where(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        o.join(returned, o["o_orderkey"] == returned["l_orderkey"], "left_anti")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dmoney("o_totalprice", 2)).cast("double").alias("clean_value"),
        )
    )


# ---------------------------------------------------------------------------
# ds_date_star — star join through a derived (broadcast) date dimension
# ---------------------------------------------------------------------------

_DATE_STAR_ORACLE = """
WITH date_dim AS (
  SELECT DISTINCT o_orderdate AS d_date,
         EXTRACT(year FROM o_orderdate) AS d_year,
         EXTRACT(quarter FROM o_orderdate) AS d_quarter,
         EXTRACT(month FROM o_orderdate) AS d_month
  FROM orders
)
SELECT d.d_year, d.d_quarter,
       COUNT(*) AS n_lineitems,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))))
            AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN date_dim d ON o.o_orderdate = d.d_date
GROUP BY d.d_year, d.d_quarter
"""


@query("ds_date_star", oracle=_DATE_STAR_ORACLE)
def ds_date_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TPC-DS house style: every fact query goes through date_dim. The
    testdata has no date table, so the dimension is DERIVED (distinct order
    dates + calendar attributes — a few thousand rows for years of data)
    and explicitly broadcast; the fact then rolls up by dimension
    attributes. At 100 TB the derived-dim distinct is a narrow
    shuffle of dates only; the star join itself moves no fact rows."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    date_dim = (
        o.select(F.col("o_orderdate").alias("d_date")).distinct()
        .select(
            "d_date",
            F.year("d_date").alias("d_year"),
            F.quarter("d_date").alias("d_quarter"),
            F.month("d_date").alias("d_month"),
        )
    )
    one = F.lit(1).cast("decimal(18,2)")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(date_dim), o["o_orderdate"] == F.col("d_date"))
        .groupBy("d_year", "d_quarter")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.sum(
                dmoney("l_extendedprice", 2) * (one - dmoney("l_discount", 2))
            ).cast("double").alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# ds_customer_ltv_window — lifetime value + ntile segmentation
# ---------------------------------------------------------------------------

_LTV_ORACLE = """
WITH ltv AS (
  SELECT o_custkey AS c_custkey,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS ltv,
         CAST(date_trunc('month', MIN(o_orderdate)) AS TIMESTAMP) AS first_month
  FROM orders GROUP BY o_custkey
)
SELECT c_custkey, n_orders, ltv, first_month,
       NTILE(4) OVER (ORDER BY ltv DESC, c_custkey) AS segment
FROM ltv
"""


@query("ds_customer_ltv_window", oracle=_LTV_ORACLE)
def ds_customer_ltv_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q74 shape: per-customer lifetime value (exact decimal sum),
    order count, cohort month, and an NTILE(4) value segment over the
    global LTV ranking. The global window runs over the per-customer
    AGGREGATE (one row per customer); for a 100 TB fact with billions of
    customers, swap the single-partition ntile for precomputed
    approx-quantile boundaries joined broadcast-side — the aggregation
    below it is unchanged."""
    o = load_table(spark, sf_dir, "orders")
    ltv = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(dmoney("o_totalprice", 2)).cast("double").alias("ltv"),
        F.date_trunc("month", F.min("o_orderdate")).alias("first_month"),
    )
    # NTILE over every customer was an unpartitioned WindowExec — a
    # single-partition sort of the whole aggregate (guide §2). The
    # two-level global row number under the identical total order plus
    # the SQL-standard ntile split formula is row-identical (ntile is a
    # pure function of (row_number, n, buckets)) and sorts range
    # partitions in parallel.
    from gridmr_spark.functions.ranking import global_row_number, ntile_from_rn

    numbered, n = global_row_number(
        ltv, [F.desc("ltv"), F.asc("c_custkey")], out="_rn"
    )
    return numbered.select(
        "c_custkey", "n_orders", "ltv", "first_month",
        ntile_from_rn(F.col("_rn"), n, 4).alias("segment"),
    )


# ---------------------------------------------------------------------------
# ds_channel_compare — FULL OUTER join of two channel aggregates (q78)
# ---------------------------------------------------------------------------

_CHANNEL_ORACLE = """
WITH urgent AS (
  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS urgent_spend
  FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
  GROUP BY o_custkey
), other AS (
  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS other_spend
  FROM orders WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
  GROUP BY o_custkey
)
SELECT COALESCE(u.o_custkey, t.o_custkey) AS c_custkey,
       COALESCE(u.urgent_spend, 0.0) AS urgent_spend,
       COALESCE(t.other_spend, 0.0) AS other_spend
FROM urgent u FULL OUTER JOIN other t ON u.o_custkey = t.o_custkey
"""


@query("ds_channel_compare", oracle=_CHANNEL_ORACLE)
def ds_channel_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q78 shape: the same fact aggregated per 'channel' (order
    priority standing in for store/web), FULL OUTER joined on the entity
    key with coalesced comparison columns — customers active in either
    channel survive. Both aggregates partition on o_custkey, so AQE can
    plan the outer join shuffle-free on the shared partitioning."""
    o = load_table(spark, sf_dir, "orders")
    urgent_pred = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    urgent = (
        o.where(urgent_pred)
        .groupBy("o_custkey")
        .agg(F.sum(dmoney("o_totalprice", 2)).cast("double").alias("urgent_spend"))
        .select(F.col("o_custkey").alias("u_key"), "urgent_spend")
    )
    other = (
        o.where(~urgent_pred)
        .groupBy("o_custkey")
        .agg(F.sum(dmoney("o_totalprice", 2)).cast("double").alias("other_spend"))
        .select(F.col("o_custkey").alias("t_key"), "other_spend")
    )
    return (
        urgent.join(other, urgent["u_key"] == other["t_key"], "full_outer")
        .select(
            F.coalesce("u_key", "t_key").alias("c_custkey"),
            F.coalesce("urgent_spend", F.lit(0.0)).alias("urgent_spend"),
            F.coalesce("other_spend", F.lit(0.0)).alias("other_spend"),
        )
    )


# ---------------------------------------------------------------------------
# ds_time_band_counts — q88: many banded counts from ONE scan
# ---------------------------------------------------------------------------

_TIME_BANDS_ORACLE = """
SELECT
  COUNT(*) FILTER (WHERE l_quantity < 10)                        AS band_q_lt10,
  COUNT(*) FILTER (WHERE l_quantity >= 10 AND l_quantity < 25)   AS band_q_10_25,
  COUNT(*) FILTER (WHERE l_quantity >= 25 AND l_quantity < 40)   AS band_q_25_40,
  COUNT(*) FILTER (WHERE l_quantity >= 40)                       AS band_q_ge40,
  COUNT(*) FILTER (WHERE l_discount < 0.02)                      AS band_d_lo,
  COUNT(*) FILTER (WHERE l_discount >= 0.02 AND l_discount < 0.06) AS band_d_mid,
  COUNT(*) FILTER (WHERE l_discount >= 0.06)                     AS band_d_hi,
  COUNT(*) FILTER (WHERE l_returnflag = 'R')                     AS band_returned
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
"""


@query("ds_time_band_counts", oracle=_TIME_BANDS_ORACLE)
def ds_time_band_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q88 shape: eight banded counts answered from ONE scan of the
    fact (conditional aggregation), where the naive rendering is eight
    self-joined subqueries — at 100 TB the difference between one pass and
    eight. The date predicate still pushes to the parquet scan;
    tests/test_plans.py asserts the single-scan property."""
    li = load_table(spark, sf_dir, "lineitem")
    c = lambda pred, name: F.count(F.when(pred, 1)).alias(name)  # noqa: E731
    q = F.col("l_quantity")
    d = F.col("l_discount")
    return (
        li.where(F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        .agg(
            c(q < 10, "band_q_lt10"),
            c((q >= 10) & (q < 25), "band_q_10_25"),
            c((q >= 25) & (q < 40), "band_q_25_40"),
            c(q >= 40, "band_q_ge40"),
            c(d < 0.02, "band_d_lo"),
            c((d >= 0.02) & (d < 0.06), "band_d_mid"),
            c(d >= 0.06, "band_d_hi"),
            c(F.col("l_returnflag") == "R", "band_returned"),
        )
    )


_REPEAT_ORACLE = """
WITH urgent AS (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
), relaxed AS (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
), both_ch AS (
  SELECT o_custkey FROM urgent INTERSECT SELECT o_custkey FROM relaxed
)
SELECT o.o_custkey AS custkey,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
         AS n_urgent,
       CAST(SUM(CAST(FLOOR(o.o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS sum_cents
FROM orders o JOIN both_ch b ON o.o_custkey = b.o_custkey
GROUP BY 1
HAVING COUNT(*) >= 4
"""


@query("ds_repeat_buyers_intersect", oracle=_REPEAT_ORACLE)
def ds_repeat_buyers_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q14-flavor cross-channel INTERSECT: customers active in BOTH
    the urgent and the relaxed order channel (set intersection of distinct
    buyer keys), joined back to the fact table for per-customer channel
    mix and exact-cents revenue, kept at >= 4 lifetime orders. Exercises
    INTERSECT-as-semi-join + aggregate-after-setop — a distinct Catalyst
    path from the existing FULL OUTER channel compare. Scale shape: the
    channel key sets are distinct-aggregated (map-side combined, key-
    bounded) before the intersect; the join back is key-on-key."""
    orders = load_table(spark, sf_dir, "orders")
    hot = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    urgent = orders.where(hot).select("o_custkey").distinct()
    relaxed = orders.where(~hot).select("o_custkey").distinct()
    both_ch = urgent.intersect(relaxed)
    return (
        orders.join(both_ch, "o_custkey")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.when(hot, 1).otherwise(0)).cast("long").alias("n_urgent"),
            F.sum(F.floor(F.col("o_totalprice") * F.lit(100.0)).cast("long"))
            .cast("long")
            .alias("sum_cents"),
        )
        .where(F.col("n_orders") >= 4)
    )
