"""Extended TPC-H-shaped query pack (Q4/Q10/Q12/Q14/Q18/Q22 adaptations to
the synthetic schema) — breadth for the relational surface: EXISTS-agg,
top-k join aggregation, conditional aggregation over joins, ratio metrics,
HAVING, and anti-join + scalar subquery composition.

All follow the repo's determinism conventions: decimal-exact money sums,
deterministic top-k tiebreaks, engine-portable date arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gridmr_spark.catalog import load_table
from gridmr_spark.functions.numeric import dmoney, dsum
from gridmr_spark.queries import query

_REV = (
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) "
    "- CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)"
)


def _rev_col():
    one = F.lit(1).cast("decimal(12,2)")
    return (
        F.sum(
            dmoney("l_extendedprice", 2).cast("decimal(12,2)")
            * (one - dmoney("l_discount", 2).cast("decimal(12,2)"))
        ).cast("double")
    )


# --- Q4 shape: order priority checking (EXISTS with a lateness predicate) ---

_Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o_orderpriority
"""


@query("q4_priority_late_ship", oracle=_Q4_ORACLE)
def q4_priority_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders (one quarter) having >= 1 lineitem shipped 90+ days after the
    order date, counted per priority. EXISTS -> left-semi join; the
    correlated date predicate rides the join condition."""
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


# --- Q10 shape: returned-item revenue per customer, top 20 ---

_Q10_ORACLE = f"""
SELECT c_custkey, c_name, n_name, {_REV} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@query("q10_returned_items", oracle=_Q10_ORACLE)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue lost to returns per customer (half-year window), top 20 —
    join-heavy agg with a deterministic TakeOrdered tail."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_rev_col().alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --- Q12 shape: priority class counts per return flag (conditional agg) ---

_Q12_ORACLE = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_returnflag
"""


@query("q12_priority_classes", oracle=_Q12_ORACLE)
def q12_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --- Q14 shape: promo revenue ratio (two exact sums, one division) ---

_Q14_ORACLE = """
SELECT CAST(100.0 AS DOUBLE) * (
  CAST(SUM(CASE WHEN p_type = 'PROMO'
        THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
        ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
  /
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
"""


@query("q14_promo_revenue", oracle=_Q14_ORACLE)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promo revenue share: both numerator and denominator are exact decimal
    sums; the single double division at the end is deterministic. part is a
    broadcast dimension."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    one = F.lit(1).cast("decimal(12,2)")
    rev = dmoney("l_extendedprice", 2).cast("decimal(12,2)") * (
        one - dmoney("l_discount", 2).cast("decimal(12,2)")
    )
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(12,2)"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * (F.sum(promo).cast("double") / F.sum(rev).cast("double"))
            ).alias("promo_revenue_pct")
        )
    )


# --- Q18 shape: large-volume orders (HAVING over join agg) ---

_Q18_ORACLE = """
SELECT c_custkey, c_name, o_orderkey,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY c_custkey, c_name, o_orderkey
HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 180
ORDER BY total_qty DESC, o_orderkey
LIMIT 50
"""


@query("q18_large_volume", oracle=_Q18_ORACLE)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total quantity exceeds a threshold (HAVING = filter
    above the aggregate), top 50. The exact-decimal HAVING comparison keeps
    the boundary engine-portable."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.sum(dmoney("l_quantity", 2))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("c_custkey", "c_name", "o_orderkey")
        .agg(qty.alias("_qty"))
        .where(F.col("_qty") > 180)
        .select(
            "c_custkey", "c_name", "o_orderkey", F.col("_qty").cast("double").alias("total_qty")
        )
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(50)
    )


# --- Q22 shape: inactive big-balance customers (anti join + scalar subq) ---

_Q22_ORACLE = """
SELECT c_nationkey, COUNT(*) AS n_cust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM customer c
WHERE c_nationkey IN (1, 3, 5, 7, 9, 11)
  AND c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
    FROM customer WHERE c_acctbal > 0 AND c_nationkey IN (1, 3, 5, 7, 9, 11)
  )
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey
"""


@query("q22_inactive_customers", oracle=_Q22_ORACLE)
def q22_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-average-balance customers in selected nations with NO orders:
    scalar subquery (broadcast one-row join) + anti join + aggregate."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_Q22_ORACLE)
