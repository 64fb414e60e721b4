"""Data-quality operators (Deequ/Great-Expectations-shaped): column
profiling, referential-integrity checks, and declarative constraint
violation counts. At 100 TB these run as ordinary aggregations — one scan
per table, partial aggregation map-side, a handful of result rows — so a
profiling pass costs the same as any full-table agg, not a per-rule scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gridmr_spark.catalog import load_table
from gridmr_spark.queries import query

# ---------------------------------------------------------------------------
# Column profile: null rate / distinct count / min / max per column
# ---------------------------------------------------------------------------

_PROFILE_COLS = ("o_orderstatus", "o_orderpriority", "o_totalprice", "o_custkey")

_PROFILE_ORACLE = """
SELECT 'o_orderstatus' AS col, COUNT(*) AS n_rows,
       COUNT(*) - COUNT(o_orderstatus) AS n_nulls,
       COUNT(DISTINCT o_orderstatus) AS n_distinct,
       CAST(MIN(o_orderstatus) AS VARCHAR) AS min_str,
       CAST(MAX(o_orderstatus) AS VARCHAR) AS max_str
FROM orders
UNION ALL
SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
       COUNT(DISTINCT o_orderpriority),
       CAST(MIN(o_orderpriority) AS VARCHAR), CAST(MAX(o_orderpriority) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice),
       COUNT(DISTINCT o_totalprice),
       CAST(MIN(o_totalprice) AS VARCHAR), CAST(MAX(o_totalprice) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_custkey', COUNT(*), COUNT(*) - COUNT(o_custkey),
       COUNT(DISTINCT o_custkey),
       CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
FROM orders
"""


@query("dq_profile_columns", oracle=_PROFILE_ORACLE)
def dq_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling in ONE scan: every per-column statistic (null count,
    distinct count, min, max) is an aggregate over the same pass, then the
    single wide row unpivots into one row per column — the oracle spells it
    as per-column SELECTs, but the Spark plan reads the table once, not
    once per column (the difference between 1 and C scans of 100 TB).
    min/max serialize to strings so numeric and categorical columns share
    one result schema. Doubles here are exact parquet values round-tripped
    through repr, not arithmetic — no cross-engine float concern."""
    orders = load_table(spark, sf_dir, "orders")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__rows, {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in _PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
        "(col, n_rows, n_nulls, n_distinct, min_str, max_str)"
    )


# ---------------------------------------------------------------------------
# Referential integrity: orphaned foreign keys per relationship
# ---------------------------------------------------------------------------

_ORPHAN_ORACLE = """
SELECT 'lineitem.l_orderkey->orders' AS relation,
       (SELECT COUNT(*) FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS n_orphans
UNION ALL
SELECT 'orders.o_custkey->customer',
       (SELECT COUNT(*) FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
UNION ALL
SELECT 'customer.c_nationkey->nation',
       (SELECT COUNT(*) FROM customer WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation))
"""


@query("dq_orphan_check", oracle=_ORPHAN_ORACLE)
def dq_orphan_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: count fact rows whose foreign key has no
    parent — one LEFT ANTI join per relationship (the dimension side
    broadcasts or the join shuffles on the key; never a row-by-row lookup),
    unioned into a per-relation violation report. Zero counts on healthy
    data are the point: the query is the regression tripwire a pipeline
    runs after every load."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    def orphans(child, key, parent, pkey, name):
        cnt = (
            child.select(key)
            .join(parent.select(F.col(pkey).alias(key)), key, "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
        )
        return cnt.select(F.lit(name).alias("relation"), "n_orphans")

    return (
        orphans(li, "l_orderkey", orders, "o_orderkey", "lineitem.l_orderkey->orders")
        .unionAll(orphans(orders, "o_custkey", cust, "c_custkey", "orders.o_custkey->customer"))
        .unionAll(orphans(cust, "c_nationkey", nation, "n_nationkey", "customer.c_nationkey->nation"))
    )


# ---------------------------------------------------------------------------
# Declarative constraint checks: violation counts per rule, one scan
# ---------------------------------------------------------------------------

_CONSTRAINT_ORACLE = """
SELECT 'o_totalprice_positive' AS rule,
       COUNT(*) FILTER (WHERE o_totalprice IS NULL OR o_totalprice <= 0) AS n_violations
FROM orders
UNION ALL
SELECT 'o_orderstatus_domain',
       COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('O', 'F', 'P'))
FROM orders
UNION ALL
SELECT 'o_orderdate_in_range',
       COUNT(*) FILTER (WHERE o_orderdate < TIMESTAMP '1990-01-01 00:00:00'
                           OR o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
FROM orders
UNION ALL
SELECT 'o_custkey_not_null',
       COUNT(*) FILTER (WHERE o_custkey IS NULL)
FROM orders
"""


@query("dq_constraint_check", oracle=_CONSTRAINT_ORACLE)
def dq_constraint_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative row-level constraints (positivity, value domain, date
    range, not-null) evaluated as conditional counts in ONE aggregation over
    one scan — adding a rule adds an aggregate column, never a pass. The
    wide row stacks to (rule, n_violations) so downstream alerting reads a
    uniform report regardless of rule count."""
    orders = load_table(spark, sf_dir, "orders")
    rules = {
        "o_totalprice_positive": F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0),
        "o_orderstatus_domain": ~F.col("o_orderstatus").isin("O", "F", "P"),
        "o_orderdate_in_range": (
            (F.col("o_orderdate") < F.lit("1990-01-01").cast("timestamp"))
            | (F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        ),
        "o_custkey_not_null": F.col("o_custkey").isNull(),
    }
    wide = orders.agg(
        *[F.sum(cond.cast("long")).alias(f"v_{i}") for i, cond in enumerate(rules.values())]
    )
    stack_args = ", ".join(f"'{name}', v_{i}" for i, name in enumerate(rules))
    return wide.selectExpr(
        f"stack({len(rules)}, {stack_args}) AS (rule, n_violations)"
    )


_KANON_ORACLE = """
SELECT c_nationkey, c_mktsegment,
       CAST(FLOOR(c_acctbal / 2000.0) AS BIGINT) AS bal_band,
       CAST(COUNT(*) AS BIGINT) AS group_size
FROM customer
GROUP BY 1, 2, 3
HAVING COUNT(*) < 5
"""


@query("dq_k_anonymity", oracle=_KANON_ORACLE)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (k=5) over the quasi-identifier tuple
    (nation, market segment, account-balance band): every combination
    shared by fewer than k individuals is a re-identification risk — the
    standard privacy gate before releasing or training on user-derived
    tables. One hash aggregation with map-side combine and a HAVING
    filter; output is bounded by the quasi-identifier cardinality, never
    the table. The generalization lattice step (coarsen bands until all
    groups pass) is just re-running with a wider FLOOR divisor — each
    probe is one cheap scan."""
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / F.lit(2000.0)).cast("long").alias("bal_band"),
        )
        .agg(F.count(F.lit(1)).alias("group_size"))
        .where(F.col("group_size") < 5)
    )


_SKEW_ORACLE = """
WITH per_key AS (
  SELECT o_custkey AS key, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM orders GROUP BY 1
), tot AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows, CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(MAX(cnt) AS BIGINT) AS max_cnt
  FROM per_key
)
SELECT key, cnt,
       CAST(FLOOR(CAST(cnt AS DOUBLE) / CAST(n_rows AS DOUBLE) * 1000000.0) AS BIGINT)
         AS share_microq,
       CAST(FLOOR(CAST(cnt AS DOUBLE) * CAST(n_keys AS DOUBLE)
                  / CAST(n_rows AS DOUBLE) * 1000.0) AS BIGINT) AS x_avg_milliq,
       rk, n_rows, n_keys
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY cnt DESC, key ASC) AS rk FROM per_key
) CROSS JOIN tot
WHERE rk <= 10
"""


@query("dq_skew_detector", oracle=_SKEW_ORACLE)
def dq_skew_detector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profiler for orders.o_custkey: the 10 hottest keys
    with their absolute counts, corpus share, and hotness relative to the
    average key (cnt * n_keys / n_rows — the number AQE's skew-join
    threshold reasons about). This is the diagnosis step BEFORE reaching
    for `join_salted_skew` / `agg_salted_skew`: run it on the join key,
    read x_avg off the top rows, and pick the salt fan-out (a key at
    x_avg ~ P deserves ~P salts). One map-side-combined aggregation whose
    output is key-cardinality bounded, a single-row stats broadcast, and a
    top-k — the profile costs one scan regardless of table size."""
    orders = load_table(spark, sf_dir, "orders")
    per_key = orders.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    tot = per_key.agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
    )
    # Global top-10 via TakeOrderedAndProject + a 10-row ranking window —
    # never an unpartitioned WindowExec over the key dictionary (guide §2).
    from gridmr_spark.functions.ranking import ranked_topk

    return (
        ranked_topk(per_key, [F.desc("cnt"), F.asc("key")], 10, out="rk")
        .crossJoin(F.broadcast(tot))
        .select(
            "key",
            "cnt",
            F.floor(F.col("cnt").cast("double") / F.col("n_rows").cast("double") * F.lit(1000000.0))
            .cast("long")
            .alias("share_microq"),
            F.floor(
                F.col("cnt").cast("double") * F.col("n_keys").cast("double")
                / F.col("n_rows").cast("double") * F.lit(1000.0)
            )
            .cast("long")
            .alias("x_avg_milliq"),
            "rk",
            "n_rows",
            "n_keys",
        )
    )


_LDIV_ORACLE = """
SELECT c_nationkey, c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS group_size,
       CAST(COUNT(DISTINCT CAST(FLOOR(c_acctbal / 2000.0) AS BIGINT)) AS BIGINT) AS n_sensitive
FROM customer
GROUP BY 1, 2
HAVING COUNT(DISTINCT CAST(FLOOR(c_acctbal / 2000.0) AS BIGINT)) < 3
"""


@query("dq_l_diversity", oracle=_LDIV_ORACLE)
def dq_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (l=3), k-anonymity's stronger sibling: a
    quasi-identifier group where everyone shares (nearly) the SAME
    sensitive value leaks that value even when the group is large enough
    to pass k-anonymity. Flag every (nation, segment) group whose
    account-balance band takes fewer than l distinct values. Same
    one-scan shape as dq_k_anonymity — a distinct-count aggregate bounded
    by quasi-identifier cardinality; the generalization loop (coarsen
    until every group passes BOTH k and l) composes the two audits over
    the same scan."""
    cust = load_table(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / F.lit(2000.0)).cast("long")
    return (
        cust.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("group_size"),
            F.countDistinct(band).cast("long").alias("n_sensitive"),
        )
        .where(F.col("n_sensitive") < 3)
    )
