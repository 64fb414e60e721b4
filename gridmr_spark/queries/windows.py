"""Window functions, sorts/limits, top-k (SURVEY.md §2.D rows 9-10).

Determinism rule: every window ORDER BY carries a unique tiebreaker column
(orderkey/event_id) so ranking output is identical across engines and runs —
ties broken arbitrarily would fail the value hash AND make production runs
non-reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gridmr_spark.catalog import load_table
from gridmr_spark.queries import query

# ---------------------------------------------------------------------------
# Ranking: top-k per group
# ---------------------------------------------------------------------------

_TOPK_GROUP_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) t
WHERE rn <= 3
"""


@query("window_topk_per_group", oracle=_TOPK_GROUP_ORACLE)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price. row_number + filter is the
    scalable top-k: Spark's WindowGroupLimit pushes the limit below the
    shuffle (partial top-k per map task) — no full sort of 100 TB."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


# ---------------------------------------------------------------------------
# Ranking family: rank / dense_rank / ntile
# ---------------------------------------------------------------------------

_RANKS_ORACLE = """
SELECT c_mktsegment, c_custkey,
       RANK()       OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rnk,
       DENSE_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS drnk,
       NTILE(4)     OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS quartile
FROM customer
WHERE c_acctbal > 9000
"""


@query("window_ranks", oracle=_RANKS_ORACLE)
def window_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").where(F.col("c_acctbal") > 9000)
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return cust.select(
        "c_mktsegment",
        "c_custkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


# ---------------------------------------------------------------------------
# Analytic: lag / lead (event deltas per user)
# ---------------------------------------------------------------------------

_LAG_ORACLE = """
SELECT user_id, event_id, ts,
       LAG(event_type)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
       LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type,
       CAST(date_diff('second', LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) AS BIGINT) AS gap_s
FROM events
WHERE user_id < 50
"""


@query("window_lag_lead", oracle=_LAG_ORACLE)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event sequencing: lag/lead + inter-event gap in seconds."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 50)
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)))
        .cast("bigint")
        .alias("gap_s"),
    )


# ---------------------------------------------------------------------------
# Frames: running / sliding aggregates
# ---------------------------------------------------------------------------

_FRAME_ORACLE = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS last3_spend
FROM orders
WHERE o_custkey < 100
"""


@query("window_frames", oracle=_FRAME_ORACLE)
def window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative and sliding 3-row frames per customer. Decimal accumulation
    again: a running double sum replays in partition order, but frames over
    decimals are exact and engine-agnostic."""
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 100)
    price = F.col("o_totalprice").cast("decimal(18,2)")
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(price).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double").alias("running_spend"),
        F.sum(price).over(w.rowsBetween(-2, 0)).cast("double").alias("last3_spend"),
    )


# ---------------------------------------------------------------------------
# Global sort + limit (top-k)
# ---------------------------------------------------------------------------

_TOPK_GLOBAL_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


@query("topk_global", oracle=_TOPK_GLOBAL_ORACLE)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10: Spark plans TakeOrderedAndProject — per-partition
    heap + driver merge of k rows, never a full sort. The only safe 'ORDER
    BY ... LIMIT k' at 100 TB."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Distribution/navigation windows: ntile + first/last/nth value with frames
# ---------------------------------------------------------------------------

_NTILE_NAV_ORACLE = """
SELECT s_suppkey,
       NTILE(4) OVER w AS bal_quartile,
       first_value(s_suppkey) OVER w AS poorest_key,
       last_value(s_suppkey) OVER (ORDER BY s_acctbal, s_suppkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS richest_key,
       nth_value(s_suppkey, 3) OVER (ORDER BY s_acctbal, s_suppkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS third_key
FROM supplier
WINDOW w AS (ORDER BY s_acctbal, s_suppkey)
"""


@query("window_ntile_nav", oracle=_NTILE_NAV_ORACLE)
def window_ntile_nav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile bucketing + first/last/nth_value navigation. last/nth use an
    explicit UNBOUNDED-UNBOUNDED frame: the default frame stops at CURRENT
    ROW, which silently turns last_value into current-row-value — the
    classic window-frame trap, pinned here identically on both engines."""
    supp = load_table(spark, sf_dir, "supplier")
    # Previously one unpartitioned WindowExec (single-partition sort of
    # the table, guide §2). Under the UNIQUE total order every navigation
    # value here is a CONSTANT of the ordered sequence — first_value over
    # the running frame is always row 1, last/nth over the full frame are
    # rows n and 3 — and ntile is a pure function of (row_number, n, 4);
    # so the query reduces to a two-level global row number (parallel
    # range-partition sort) plus three driver-collected scalar rows.
    from gridmr_spark.functions.ranking import global_row_number, ntile_from_rn

    numbered, n = global_row_number(
        supp, [F.asc("s_acctbal"), F.asc("s_suppkey")], out="_rn"
    )
    nav = {
        int(r["_rn"]): r["s_suppkey"]
        for r in numbered.where(F.col("_rn").isin(1, 3, n))
        .select("_rn", "s_suppkey")
        .collect()
    }
    key_t = supp.schema["s_suppkey"].dataType.simpleString()
    return numbered.select(
        "s_suppkey",
        ntile_from_rn(F.col("_rn"), n, 4).alias("bal_quartile"),
        F.lit(nav.get(1)).cast(key_t).alias("poorest_key"),
        F.lit(nav.get(n)).cast(key_t).alias("richest_key"),
        F.lit(nav.get(3)).cast(key_t).alias("third_key"),
    )


# ---------------------------------------------------------------------------
# Time-based RANGE frame: trailing-1h rolling aggregates per event
# ---------------------------------------------------------------------------

# RANGE (not ROWS) frame keyed on event time: every event sees the aggregate
# of its user's events in [t - 1h, t] — the per-event sliding window the ROWS
# frames above can't express (peers with equal ts share one frame, and the
# frame width is time, not row count). Ordering by epoch micros makes the
# frame bound an exact integer; the decimal window sum keeps the double
# bit-identical across engines regardless of each engine's sliding-sum
# implementation order.
_TIME_RANGE_ORACLE = """
WITH ev AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events
)
SELECT event_id, user_id,
       COUNT(*) OVER w AS n_1h,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS value_1h
FROM ev
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


@query("window_time_range", oracle=_TIME_RANGE_ORACLE)
def window_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-1-hour rolling count and spend per event via a RANGE frame
    over epoch-micros event time. One shuffle on user_id; the frame slides
    in event time so burst periods aggregate more rows — the per-event
    twin of the fixed-grid tumbling/sliding streaming windows."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_1h"),
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("value_1h"),
    )


# ---------------------------------------------------------------------------
# Numeric RANGE frame: peers by value distance, not row position
# ---------------------------------------------------------------------------

_RANGE_VALUE_ORACLE = """
SELECT s_suppkey, s_nationkey, s_acctbal,
       COUNT(*) OVER w AS n_within_500,
       CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) OVER w AS DOUBLE) AS bal_within_500
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal
             RANGE BETWEEN 500 PRECEDING AND 500 FOLLOWING)
"""


@query("window_value_range", oracle=_RANGE_VALUE_ORACLE)
def window_value_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric RANGE frame: each supplier's peer group is every same-nation
    supplier within +-500 account balance — frame membership by VALUE
    distance, not row offsets (the frame the ROWS/time variants can't
    express; peers at equal values share identical frames, so no tiebreak
    is needed for determinism). Decimal-exact windowed sum."""
    supp = load_table(spark, sf_dir, "supplier")
    w = (
        Window.partitionBy("s_nationkey")
        .orderBy("s_acctbal")
        .rangeBetween(-500, 500)
    )
    return supp.select(
        "s_suppkey",
        "s_nationkey",
        "s_acctbal",
        F.count(F.lit(1)).over(w).alias("n_within_500"),
        F.sum(F.col("s_acctbal").cast("decimal(18,2)")).over(w).cast("double").alias("bal_within_500"),
    )
