"""TPC-H completion pack: the remaining query *shapes* (Q2, Q6, Q7, Q8, Q9,
Q11, Q13, Q15, Q16, Q17, Q19, Q20, Q21) adapted to the synthetic schema.

With tpch_more (Q4/Q10/Q12/Q14/Q18/Q22) and relational (Q1/Q3/Q5), every
TPC-H query shape is covered. The testdata schema has no partsupp table and
no l_commitdate/l_receiptdate, so the queries that depend on them keep their
*plan shape* with adapted semantics:
- Q2/Q9/Q11/Q16/Q20: the part-supplier relationship comes from the lineitem
  bridge (DISTINCT l_partkey, l_suppkey); supply cost proxies use
  p_retailprice.
- Q21: "late" = l_shipdate > o_orderdate + 60 days (no receipt/commit dates).

Determinism conventions as everywhere else: decimal-exact money sums cast to
double at the end, deterministic tie-breaks, identical column aliases in the
Spark plan and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gridmr_spark.catalog import load_table
from gridmr_spark.functions.numeric import dmoney
from gridmr_spark.queries import query

# Exact decimal revenue: sum(extendedprice * (1 - discount)) — the same
# formula/typing on both engines so the double result is bit-identical.
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


def _ts(s: str):
    return F.lit(s).cast("timestamp")


# --- Q6 shape: forecasting revenue change (pure scan-filter-agg) ----------

_Q6_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.02 AND 0.04
  AND l_quantity < 24
"""


@query("q6_forecast_revenue", oracle=_Q6_ORACLE)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The simplest TPC-H plan: one scan, three pushed-down predicates, one
    exact decimal sum — at 100 TB this is bounded purely by scan bandwidth
    (no shuffle at all beyond the final 1-row partial-agg merge)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
        & (F.col("l_discount").between(0.02, 0.04))
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(dmoney("l_extendedprice", 2) * dmoney("l_discount", 2))
        .cast("double")
        .alias("revenue")
    )


# --- Q7 shape: volume shipping between two nations ------------------------

_Q7_ORACLE = f"""
SELECT supp_nation, cust_nation, l_year, {_REV.replace('l_extendedprice', 'volume_price').replace('l_discount', 'volume_disc')} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
         l_extendedprice AS volume_price, l_discount AS volume_disc
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@query("q7_nation_volume", oracle=_Q7_ORACLE)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral trade volume: the two nation dimensions join twice (aliased)
    against the supplier and customer sides — both broadcast; the disjunctive
    nation-pair predicate prunes before the aggregate."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        supp.join(li, supp.s_suppkey == li.l_suppkey)
        .join(orders, orders.o_orderkey == li.l_orderkey)
        .join(cust, cust.c_custkey == orders.o_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(_rev_col().alias("revenue"))
    )


# --- Q8 shape: national market share ---------------------------------------

_Q8_ORACLE = """
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN vol_d ELSE CAST(0 AS DECIMAL(26,4)) END) AS DOUBLE)
       / CAST(SUM(vol_d) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(26,4)) AS vol_d,
         n2.n_name AS supp_nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    AND p_type = 'ECONOMY'
) all_nations
GROUP BY o_year
"""


@query("q8_market_share", oracle=_Q8_ORACLE)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One nation's share of a region's market for one part type, per year.
    Both the numerator and denominator are exact decimal sums over the SAME
    typed volume column; the final division is a single double op."""
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    one = F.lit(1).cast("decimal(12,2)")
    vol_d = (
        dmoney("l_extendedprice", 2).cast("decimal(12,2)")
        * (one - dmoney("l_discount", 2).cast("decimal(12,2)"))
    ).cast("decimal(26,4)")
    zero_d = F.lit(0).cast("decimal(26,4)")
    joined = (
        F.broadcast(part)
        .join(li, F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            vol_d.alias("vol_d"),
            "supp_nation",
        )
    )
    return joined.groupBy("o_year").agg(
        (
            F.sum(
                F.when(F.col("supp_nation") == "NATION_2", F.col("vol_d")).otherwise(zero_d)
            ).cast("double")
            / F.sum("vol_d").cast("double")
        ).alias("mkt_share")
    )


# --- Q9 shape: product-type profit by nation and year ----------------------

_Q9_ORACLE = """
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(26,4))
              - CAST(CAST(0.6 AS DECIMAL(4,2)) * CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(26,4))) AS DOUBLE) AS sum_profit
FROM part
JOIN lineitem ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%green%'
GROUP BY n_name, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)
"""


@query("q9_product_profit", oracle=_Q9_ORACLE)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit per supplier-nation per year for one product family. The
    schema has no partsupp, so supply cost is proxied as 60% of retail price
    — the five-way join + two-key aggregate plan shape is what Q9 tests."""
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%green%"))
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    one = F.lit(1).cast("decimal(12,2)")
    gross = (
        dmoney("l_extendedprice", 2).cast("decimal(12,2)")
        * (one - dmoney("l_discount", 2).cast("decimal(12,2)"))
    ).cast("decimal(26,4)")
    cost = (
        F.lit(0.6).cast("decimal(4,2)")
        * dmoney("p_retailprice", 2).cast("decimal(12,2)")
        * dmoney("l_quantity", 2).cast("decimal(12,2)")
    ).cast("decimal(26,4)")
    return (
        F.broadcast(part)
        .join(li, F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(gross - cost).cast("double").alias("sum_profit"))
    )


# --- Q11 shape: important part values (HAVING vs global scalar subquery) ---

_Q11_ORACLE = f"""
WITH partval AS (
  SELECT l_partkey, {_REV} AS value
  FROM lineitem
  GROUP BY l_partkey
)
SELECT l_partkey, value
FROM partval
WHERE value > (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) * 0.001 FROM lineitem)
"""


@query("q11_important_values", oracle=_Q11_ORACLE)
def q11_important_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose revenue exceeds a fraction of TOTAL revenue — the
    group-vs-global comparison (partsupp value replaced by lineitem revenue).
    The global total is a 1-row broadcast, not a window over all rows."""
    li = load_table(spark, sf_dir, "lineitem")
    partval = li.groupBy("l_partkey").agg(_rev_col().alias("value"))
    total = li.agg((_rev_col() * F.lit(0.001)).alias("threshold"))
    return (
        partval.join(F.broadcast(total))
        .where(F.col("value") > F.col("threshold"))
        .select("l_partkey", "value")
    )


# --- Q13 shape: customer order-count distribution (left join + double agg) --

_Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
"""


@query("q13_order_distribution", oracle=_Q13_ORACLE)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of orders-per-customer (customers with none included via
    the left join; COUNT(col) skips their NULLs). Two aggregations: the
    first shuffles on the high-cardinality customer key, the second on the
    tiny count domain."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# --- Q15 shape: top supplier(s) by quarterly revenue -----------------------

_Q15_ORACLE = f"""
WITH revenue0 AS (
  SELECT l_suppkey AS supplier_no, {_REV} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue0)
"""


@query("q15_top_supplier", oracle=_Q15_ORACLE)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) achieving the max quarterly revenue — the classic
    "rows equal to an aggregate of the same derived table" pattern; the max
    is a 1-row broadcast against the reused aggregate (computed once,
    consumed twice — Spark reuses the exchange)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _rev_col().alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        F.broadcast(supp)
        .join(rev, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --- Q16 shape: supplier counts per part attribute -------------------------

_Q16_ORACLE = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN ps ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#5'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
GROUP BY p_brand, p_type, p_size
"""


@query("q16_supplier_counts", oracle=_Q16_ORACLE)
def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-supplier counts per (brand, type, size) bucket, negated
    predicates included. The part-supplier bridge is DISTINCT(l_partkey,
    l_suppkey) — the lineitem stand-in for partsupp."""
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    )
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    return (
        F.broadcast(part)
        .join(ps, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# --- Q17 shape: small-quantity-order revenue (correlated AVG subquery) -----

_Q17_ORACLE = """
WITH avg_qty AS (
  SELECT l_partkey AS pk,
         0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(l_quantity) AS DOUBLE)) AS qty_bar
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN avg_qty ON pk = l_partkey
WHERE p_brand = 'Brand#23' AND l_quantity < qty_bar
"""


@query("q17_small_quantity", oracle=_Q17_ORACLE)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from lines below 20% of their part's average quantity — the
    correlated aggregate subquery decorrelated into a per-part aggregate +
    equi-join (what Catalyst does to the subquery form anyway, written
    explicitly). The threshold (0.2 * exact-decimal avg) is one double
    multiply — deterministic on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    avg_qty = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.lit(0.2)
            * (
                F.sum(dmoney("l_quantity", 2)).cast("double")
                / F.count("l_quantity").cast("double")
            )
        ).alias("qty_bar")
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(avg_qty, F.col("pk") == F.col("l_partkey"))
        .where(F.col("l_quantity") < F.col("qty_bar"))
        .agg(
            (F.sum(dmoney("l_extendedprice", 2)).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


# --- Q19 shape: disjunctive bracket predicates over a join -----------------

_Q19_ORACLE = f"""
SELECT {_REV} AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1  AND l_quantity <= 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 5  AND l_quantity >= 20 AND l_quantity <= 30)
"""


@query("q19_disjunctive_brackets", oracle=_Q19_ORACLE)
def q19_disjunctive_brackets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-ANDs across both join sides: the equi-join key still extracts
    (p_partkey = l_partkey), so this stays a broadcast hash join with a
    residual disjunctive filter — NOT a nested-loop join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    b = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .where(b)
        .agg(_rev_col().alias("revenue"))
    )


# --- Q20 shape: suppliers with significant shipments of a part family ------

_Q20_ORACLE = """
WITH shipped AS (
  SELECT l_suppkey
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE 'red%'
    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_suppkey
  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 50.0
)
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
  AND s_suppkey IN (SELECT l_suppkey FROM shipped)
"""


@query("q20_part_family_shippers", oracle=_Q20_ORACLE)
def q20_part_family_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers in one nation who shipped > 50 units of 'red%' parts in a
    year — the IN-subquery chain becomes aggregate -> HAVING -> left-semi
    join (partsupp availability replaced by shipped quantity)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").like("red%"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    shipped = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(dmoney("l_quantity", 2)).cast("double").alias("qty"))
        .where(F.col("qty") > 50.0)
        .select("l_suppkey")
    )
    return (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(shipped, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
    )


# --- Q21 shape: suppliers who alone delayed multi-supplier orders ----------

_Q21_ORACLE = """
WITH late AS (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
), all_ls AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
)
SELECT s_name, COUNT(*) AS numwait
FROM late l1
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE EXISTS (SELECT 1 FROM all_ls a
              WHERE a.l_orderkey = l1.l_orderkey AND a.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
"""


@query("q21_waiting_suppliers", oracle=_Q21_ORACLE)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who were the SOLE late shipper on multi-supplier orders
    ("late" = shipped 60+ days after order date; the schema has no
    commit/receipt dates). EXISTS -> left-semi on a non-equi pair condition,
    NOT EXISTS -> left-anti; both join on the order key with the supplier
    inequality as a residual."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    all_ls = li.select("l_orderkey", "l_suppkey").distinct()
    other_supplied = all_ls.select(
        F.col("l_orderkey").alias("o_k"), F.col("l_suppkey").alias("o_s")
    )
    other_late = late.select(
        F.col("l_orderkey").alias("x_k"), F.col("l_suppkey").alias("x_s")
    )
    return (
        late.join(
            other_supplied,
            (F.col("l_orderkey") == F.col("o_k")) & (F.col("l_suppkey") != F.col("o_s")),
            "left_semi",
        )
        .join(
            other_late,
            (F.col("l_orderkey") == F.col("x_k")) & (F.col("l_suppkey") != F.col("x_s")),
            "left_anti",
        )
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


# --- Q2 shape: min-acctbal supplier per part in a region -------------------

_Q2_ORACLE = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
cand AS (
  SELECT p_partkey, s_suppkey, s_acctbal, s_name, n_name
  FROM part
  JOIN ps ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA' AND p_size = 15 AND p_type = 'LARGE'
)
SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name
FROM cand c
WHERE s_acctbal = (SELECT min(s_acctbal) FROM cand c2 WHERE c2.p_partkey = c.p_partkey)
"""


@query("q2_min_cost_supplier", oracle=_Q2_ORACLE)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per part (one size/type bucket, one region): the supplier(s) with the
    minimum account balance among those who shipped it — Q2's correlated-min
    shape with acctbal standing in for ps_supplycost. The correlated
    subquery is a min window over the candidate set (one shuffle on
    p_partkey), not a rejoin."""
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "LARGE")
    )
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    cand = (
        F.broadcast(part)
        .join(ps, F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("p_partkey", "s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("min_bal", F.min("s_acctbal").over(w))
        .where(F.col("s_acctbal") == F.col("min_bal"))
        .select("p_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")
    )
