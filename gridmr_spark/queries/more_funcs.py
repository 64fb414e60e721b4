"""Additional function-surface queries: array aggregation (collect_list/set
with deterministic ordering), distribution window functions, edit-distance
fuzzy matching, and array set operations."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gridmr_spark.catalog import load_table
from gridmr_spark.queries import query

# ---------------------------------------------------------------------------
# Array aggregation: collect_list/collect_set made deterministic by sorting
# (collect order is partition-dependent; only the sorted form is comparable)
# ---------------------------------------------------------------------------

_COLLECT_ORACLE = """
SELECT n_regionkey,
       list_sort(list(n_name)) AS nations_sorted,
       len(list_distinct(list(n_regionkey))) AS n_distinct_keys
FROM nation
GROUP BY n_regionkey
"""


@query("agg_collect", oracle=_COLLECT_ORACLE)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list -> sort_array per group (array_agg). Raw collect order
    is partition-dependent — sorting is what makes it deterministic, at any
    parallelism, which is the only safe way to use it at 100 TB."""
    nation = load_table(spark, sf_dir, "nation")
    return nation.groupBy("n_regionkey").agg(
        F.sort_array(F.collect_list("n_name")).alias("nations_sorted"),
        F.size(F.array_distinct(F.collect_list("n_regionkey"))).alias("n_distinct_keys"),
    )


# ---------------------------------------------------------------------------
# Distribution window functions: percent_rank / cume_dist
# ---------------------------------------------------------------------------

_DIST_ORACLE = """
SELECT s_suppkey,
       PERCENT_RANK() OVER (ORDER BY s_acctbal, s_suppkey) AS bal_pct_rank,
       CUME_DIST()    OVER (ORDER BY s_acctbal, s_suppkey) AS bal_cume_dist
FROM supplier
"""


@query("window_distribution", oracle=_DIST_ORACLE)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank = (rank-1)/(n-1), cume_dist = rank/n — single integer
    division each, engine-deterministic. Unpartitioned window: fine for a
    dimension table; partition it for facts."""
    supp = load_table(spark, sf_dir, "supplier")
    w = Window.orderBy(F.asc("s_acctbal"), F.asc("s_suppkey"))
    return supp.select(
        "s_suppkey",
        F.percent_rank().over(w).alias("bal_pct_rank"),
        F.cume_dist().over(w).alias("bal_cume_dist"),
    )


# ---------------------------------------------------------------------------
# Fuzzy matching: Levenshtein edit-distance pairs
# ---------------------------------------------------------------------------

_FUZZY_ORACLE = """
SELECT a.s_suppkey AS id1, b.s_suppkey AS id2,
       levenshtein(a.s_name, b.s_name) AS dist
FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
WHERE levenshtein(a.s_name, b.s_name) <= 2
"""


@query("fuzzy_levenshtein_pairs", oracle=_FUZZY_ORACLE)
def fuzzy_levenshtein_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-identical name pairs by edit distance — the record-linkage
    primitive. All-pairs over a dimension table (broadcast); for facts,
    block first (prefix/phonetic key), then pair within blocks — same
    shape as the MinHash pipeline."""
    supp = load_table(spark, sf_dir, "supplier")
    a = supp.select(F.col("s_suppkey").alias("id1"), F.col("s_name").alias("n1"))
    b = supp.select(F.col("s_suppkey").alias("id2"), F.col("s_name").alias("n2"))
    return (
        a.join(F.broadcast(b), F.col("id1") < F.col("id2"))
        .select("id1", "id2", F.levenshtein("n1", "n2").alias("dist"))
        .where(F.col("dist") <= 2)
    )


# ---------------------------------------------------------------------------
# Array set operations (order-normalized for cross-engine comparison)
# ---------------------------------------------------------------------------

_ARRSET_ORACLE = """
WITH t AS (
  SELECT doc_id,
         list_sort(list_distinct(list_filter(
           string_split(lower(regexp_replace(text,'[^a-zA-Z0-9]+',' ','g')),' '), x -> x <> ''))) AS toks
  FROM documents WHERE doc_id < 20
)
SELECT doc_id,
       list_sort(list_intersect(toks, ['key','agg','row','scan','table'])) AS kw_hits,
       len(list_filter(toks, x -> NOT list_contains(['key','agg','row','scan','table'], x))) AS n_non_kw,
       list_contains(toks, 'spark') AS mentions_spark
FROM t
"""


@query("array_set_ops", oracle=_ARRSET_ORACLE)
def array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_intersect / array_except-style ops against a keyword list,
    sort-normalized (engines don't guarantee matching element order)."""
    from gridmr_spark.operators.dedup import normalize_tokens

    kw = F.array(*[F.lit(x) for x in ("key", "agg", "row", "scan", "table")])
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 20)
    toks = F.array_sort(F.array_distinct(normalize_tokens("text")))
    return docs.select(
        "doc_id",
        F.array_sort(F.array_intersect(toks, kw)).alias("kw_hits"),
        F.size(F.array_except(toks, kw)).alias("n_non_kw"),
        F.array_contains(toks, "spark").alias("mentions_spark"),
    )
