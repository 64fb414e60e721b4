"""User-defined extension surface: grouped-map UDAF (applyInPandas), Python
UDTF, and the salted-aggregation skew pattern. The reference's ENTIRE engine
was a binary-UDF harness (SURVEY.md §2.A A3/A4/A9); here user code slots into
typed, Arrow-batched seams instead of popen pipes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gridmr_spark.catalog import load_table
from gridmr_spark.functions.numeric import dsum
from gridmr_spark.operators.skew import salted_agg
from gridmr_spark.queries import query

# ---------------------------------------------------------------------------
# Grouped-map UDAF: per-customer order stats via applyInPandas
# ---------------------------------------------------------------------------

_UDAF_ORACLE = """
SELECT o_custkey,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
       CAST(MAX(o_totalprice) AS DOUBLE) AS max_order
FROM orders
WHERE o_custkey < 500
GROUP BY o_custkey
"""


@query("udaf_apply_in_pandas", oracle=_UDAF_ORACLE)
def udaf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary per-group logic via applyInPandas (the UDAF escape hatch —
    whole group as a pandas frame in, one summary frame out). The arithmetic
    here intentionally mirrors exact decimal/count/max semantics so even the
    pandas path hash-matches the oracle. Scoped to a key subset: per-group
    Python dispatch costs ~0.5 ms/group regardless of group size, so this
    seam is for heavy per-group logic (model scoring, curve fitting), NEVER
    for sums — built-ins are 100x cheaper. Groups must fit in task memory."""
    import pandas as pd

    def per_customer(pdf: pd.DataFrame) -> pd.DataFrame:
        # exact accumulation in integer cents (vectorized, order-independent
        # like dsum): values are 2dp money, so round(v*100) is the exact
        # cent count and cents/100.0 is the same double the decimal-sum
        # oracle produces
        cents = (pdf["o_totalprice"] * 100).round().astype("int64").sum()
        return pd.DataFrame(
            {
                "o_custkey": [pdf["o_custkey"].iloc[0]],
                "n_orders": [len(pdf)],
                "total_spend": [cents / 100.0],
                "max_order": [float(pdf["o_totalprice"].max())],
            }
        )

    orders = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 500)
    return orders.groupBy("o_custkey").applyInPandas(
        per_customer,
        schema="o_custkey long, n_orders long, total_spend double, max_order double",
    )


# ---------------------------------------------------------------------------
# Python UDTF: one row in, N rows out (table function)
# ---------------------------------------------------------------------------

_UDTF_ORACLE = """
SELECT doc_id, token FROM (
  SELECT doc_id,
         unnest(string_split(
           regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' ')) AS token
  FROM documents WHERE doc_id < 50
) t WHERE token <> ''
"""


@query("udtf_tokenize", oracle=_UDTF_ORACLE)
def udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4): lateral table function emitting one row per
    token. tests/test_udx.py asserts equality with the built-in
    explode(split(...)) rendering; the oracle is the same normalize+split
    in DuckDB (lower → strip non-alnum → whitespace split, drop empties)."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="token: string")
    class Tokenize:
        def eval(self, text: str):
            import re

            if text:
                for tok in re.sub(r"[^a-zA-Z0-9]+", " ", text.lower()).split():
                    yield (tok,)

    spark.udtf.register("gridmr_tokenize", Tokenize)
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    docs.createOrReplaceTempView("udtf_docs")
    return spark.sql(
        "SELECT doc_id, t.token FROM udtf_docs, LATERAL gridmr_tokenize(text) t"
    )


# ---------------------------------------------------------------------------
# Salted aggregation (skew pattern) — exact results, oracle-checked
# ---------------------------------------------------------------------------

_SALTED_ORACLE = """
SELECT l_returnflag,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY l_returnflag
"""


@query("agg_salted_skew", oracle=_SALTED_ORACLE)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a 3-value (maximally skewed) key.
    Same results as plain groupBy — the salt only reshapes the shuffle:
    phase 1 spreads each hot key over 16 tasks, phase 2 combines 16 partial
    rows per key. The pattern for hot-key aggs whose per-key state is big."""
    li = load_table(spark, sf_dir, "lineitem")
    return salted_agg(
        li,
        key_cols=["l_returnflag"],
        partial_aggs=[
            F.count("*").alias("_n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_sq"),
        ],
        final_aggs=[
            F.sum("_n").alias("n_items"),
            F.sum("_sq").cast("double").alias("sum_qty"),
        ],
        n_salts=16,
        salt_source="l_orderkey",
    )


# ---------------------------------------------------------------------------
# Salted join (skew pattern) — exact results, oracle-checked
# ---------------------------------------------------------------------------

_SALTED_JOIN_ORACLE = """
SELECT l_returnflag, o_orderpriority,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_returnflag, o_orderpriority
"""


@query("join_salted_skew", oracle=_SALTED_JOIN_ORACLE)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted shuffle join: lineitem (fact) x orders (dim) on l_orderkey with
    the dim side replicated 8 ways and the fact side salted by line number —
    a hot orderkey's rows land on 8 reduce tasks instead of one. The output
    is exactly the plain join (each fact row meets one dim copy), so the
    oracle is the unsalted SQL. At 100 TB this is the pre-planned skew
    answer where the dim is too big to broadcast and AQE's post-hoc split
    (sort-merge only) can't be assumed; operators/skew.py:salted_join."""
    from gridmr_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = salted_join(
        li.select(F.col("l_orderkey").alias("o_orderkey"), "l_returnflag", "l_extendedprice", "l_linenumber"),
        orders,
        on=["o_orderkey"],
        n_salts=8,
        salt_source="l_linenumber",
    )
    return joined.groupBy("l_returnflag", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sum_price"),
    )


# ---------------------------------------------------------------------------
# Polymorphic Python UDTF: output schema computed by analyze() from the call
# ---------------------------------------------------------------------------

_UDTF_ANALYZE_ORACLE = """
SELECT doc_id,
       COALESCE(ws[1], '') AS tok_0,
       COALESCE(ws[2], '') AS tok_1,
       COALESCE(ws[3], '') AS tok_2,
       COALESCE(ws[4], '') AS tok_3
FROM (
  SELECT doc_id,
         list_filter(string_split(lower(regexp_replace(text,'[^a-zA-Z0-9]+',' ','g')),' '), t -> t <> '') AS ws
  FROM documents WHERE doc_id < 50
)
"""


@query("udtf_analyze_firstk", oracle=_UDTF_ANALYZE_ORACLE)
def udtf_analyze_firstk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4 `analyze()`): the output schema —
    one tok_i column per requested position — is computed at plan time from
    the call's literal argument, the table-function equivalent of a dynamic
    pivot. Here k=4 leading tokens widen into 4 typed columns; calling with
    a different k re-plans with a different schema, no code change.
    Empty-padded so every row is schema-complete."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class FirstK:
        @staticmethod
        def analyze(text: AnalyzeArgument, k: AnalyzeArgument) -> AnalyzeResult:
            schema = StructType()
            for i in range(int(k.value)):
                schema = schema.add(f"tok_{i}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, text: str, k: int):
            import re

            toks = re.sub(r"[^a-zA-Z0-9]+", " ", (text or "").lower()).split()
            yield tuple((toks[i] if i < len(toks) else "") for i in range(k))

    spark.udtf.register("gridmr_firstk", udtf(FirstK))
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    docs.createOrReplaceTempView("udtf_docs_k")
    return spark.sql(
        "SELECT doc_id, t.* FROM udtf_docs_k, LATERAL gridmr_firstk(text, 4) t"
    )


# ---------------------------------------------------------------------------
# Arrow-native grouped map: applyInArrow (Spark 4)
# ---------------------------------------------------------------------------

_UDAF_ARROW_ORACLE = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(round_even(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0
         AS total_value,
       CAST(MIN(user_id) AS BIGINT) AS first_user
FROM events
GROUP BY event_type
"""


@query("udaf_apply_in_arrow", oracle=_UDAF_ARROW_ORACLE)
def udaf_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-NATIVE grouped map (Spark 4 ``applyInArrow``): the whole group
    arrives as a pyarrow.Table and one summary Table returns — the same
    escape hatch as applyInPandas minus the Arrow->pandas->Arrow
    conversion, which matters when the per-group payload is large binary
    or deeply nested (pandas materialization is the overhead). Arithmetic
    is exact integer cents via pyarrow.compute with round-half-to-even —
    the same rule as Spark rint() and DuckDB round_even(), so three
    engines produce bit-identical totals (the stream_stateful_totals
    precedent). Same dispatch economics as applyInPandas: per-group Python
    crossing, so for plain sums built-ins win 100x; this seam is for
    group-local logic Arrow kernels can vectorize."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def per_type(table: pa.Table) -> pa.Table:
        cents = pc.round(pc.multiply(table.column("value"), 100.0)).cast(pa.int64())
        return pa.table(
            {
                "event_type": [table.column("event_type")[0].as_py()],
                "n_events": [table.num_rows],
                "total_value": [pc.sum(cents).as_py() / 100.0],
                "first_user": [pc.min(table.column("user_id")).as_py()],
            }
        )

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").applyInArrow(
        per_type,
        schema="event_type string, n_events long, total_value double, first_user long",
    )


# Partitioned-input Python UDTF: TABLE(...) PARTITION BY, eval-per-row +
# terminate-per-partition — Spark 4's grouped table-function surface.

_UDTF_PART_ORACLE = """
SELECT lang, doc_id, n_chars, CAST(rnk AS INT) AS rnk FROM (
  SELECT lang, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC) AS rnk
  FROM documents
) WHERE rnk <= 3
"""


@query("udtf_partitioned_topk", oracle=_UDTF_PART_ORACLE)
def udtf_partitioned_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF over a PARTITIONED TABLE argument (Spark 4):
    `gridmr_topk(TABLE(docs) PARTITION BY lang ORDER BY ...)` streams each
    language's rows through one UDTF instance — eval() accumulates a
    bounded top-3 heap, terminate() emits it when the partition ends. This
    is the stateful-per-group table-function surface (the UDTF twin of
    applyInPandas), and the ORDER BY clause makes arrival order
    deterministic so the heap's tiebreaks are reproducible. State is
    O(k) per partition regardless of group size — the property that lets
    it run at 100 TB group sizes where collect-the-group operators OOM.
    Oracle: the plain window top-k."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="lang: string, doc_id: bigint, n_chars: bigint, rnk: int")
    class TopK:
        def __init__(self):
            self.rows = []
            self.lang = None

        def eval(self, row):
            # rows arrive ORDER BY n_chars DESC, doc_id ASC within the
            # partition; keep the first 3 — O(k) state
            self.lang = row["lang"]
            if len(self.rows) < 3:
                self.rows.append((row["doc_id"], row["n_chars"]))

        def terminate(self):
            for i, (doc_id, n_chars) in enumerate(self.rows, start=1):
                yield self.lang, doc_id, n_chars, i

    spark.udtf.register("gridmr_topk", TopK)
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("udtf_part_docs")
    return spark.sql(
        """
        SELECT lang, doc_id, n_chars, rnk
        FROM gridmr_topk(
          TABLE(SELECT doc_id, n_chars, lang FROM udtf_part_docs)
          PARTITION BY lang
          ORDER BY (n_chars DESC, doc_id ASC)
        )
        """
    )


# ---------------------------------------------------------------------------
# SQL UDFs (Spark 4 CREATE FUNCTION ... RETURN <expr>) — catalog-level,
# engine-optimizable scalar functions, unlike Python UDFs
# ---------------------------------------------------------------------------

_DP = (
    "(CAST(l_extendedprice AS DECIMAL(12,2)) * "
    "(CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))"
)

_SQL_UDF_ORACLE = f"""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM({_DP}) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CASE WHEN {_DP} > 75000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_high,
       CAST(SUM(CASE WHEN {_DP} > 25000 AND {_DP} <= 75000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_mid
FROM lineitem
GROUP BY l_returnflag
"""


@query("sql_udf_revenue", oracle=_SQL_UDF_ORACLE)
def sql_udf_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL UDFs (Spark 4 `CREATE FUNCTION ... RETURNS ... RETURN expr`):
    the discounted-price formula and a CASE band classifier defined ONCE
    in the catalog and composed in a query. Unlike a Python UDF, the body
    is inlined into the plan at resolution — Catalyst folds, pushes, and
    codegens straight through it (zero serialization boundary, zero
    black box), so a shared business definition costs nothing at 100 TB.
    The UDF is typed DECIMAL (exact money — the repo's aggregation
    convention applied at the function boundary), so the oracle's
    textually-expanded replay hash-matches bit-for-bit."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "sql_udf_lineitem"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION gridmr_disc_price("
        "p DOUBLE, d DOUBLE) RETURNS DECIMAL(14,4) RETURN "
        "CAST(p AS DECIMAL(12,2)) * "
        "(CAST(1 AS DECIMAL(12,2)) - CAST(d AS DECIMAL(12,2)))"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION gridmr_rev_band("
        "r DECIMAL(14,4)) RETURNS STRING "
        "RETURN CASE WHEN r > 75000 THEN 'high' "
        "WHEN r > 25000 THEN 'mid' ELSE 'low' END"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               COUNT(*) AS n_rows,
               CAST(SUM(gridmr_disc_price(l_extendedprice, l_discount))
                    AS DOUBLE) AS sum_disc_price,
               SUM(CASE WHEN gridmr_rev_band(
                     gridmr_disc_price(l_extendedprice, l_discount)) = 'high'
                   THEN 1 ELSE 0 END) AS n_high,
               SUM(CASE WHEN gridmr_rev_band(
                     gridmr_disc_price(l_extendedprice, l_discount)) = 'mid'
                   THEN 1 ELSE 0 END) AS n_mid
        FROM sql_udf_lineitem
        GROUP BY l_returnflag
        """
    )
