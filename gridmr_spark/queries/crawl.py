"""Crawl-frontier queries: URL canonicalization, URL-level dedup, and
per-host politeness scheduling — the stage between link extraction
(``text_html_links``) and fetch.

The reference has no crawl plane (text-only data plane,
cpp/worker/src/common/fs.cc:42-53); these queries serve the repo's north
star, the 100 TB Common-Crawl-shaped pipeline, where URL dedup is the
cheapest dedup gate (it prunes refetches before any bytes move) and the
politeness key (host) decides frontier partitioning.

Canonicalization lives in ``operators/urls.py`` as ONE shared spec
rendered into both a Spark Column fold and the equivalent DuckDB SQL, so
the hash oracle replays the whole pipeline bit-for-bit. The fixture
(same module) derives ~5 deterministic messy spellings per resource from
``doc_id``; the queries must collapse each group to one canonical URL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gridmr_spark.catalog import load_table
from gridmr_spark.operators import urls as U
from gridmr_spark.queries import query

_RAW_SQL = U.synth_url_sql("doc_id")
_CANON_SQL = U.canonical_url_sql("raw_url")

_URL_DEDUP_ORACLE = f"""
WITH raw AS (SELECT doc_id, {_RAW_SQL} AS raw_url FROM documents),
canon AS (SELECT doc_id, raw_url, {_CANON_SQL} AS canonical_url FROM raw)
SELECT canonical_url,
       CAST(COUNT(*) AS BIGINT) AS n_raw,
       CAST(COUNT(DISTINCT raw_url) AS BIGINT) AS n_spellings,
       MIN(doc_id) AS keeper_doc
FROM canon GROUP BY canonical_url
"""


@query("crawl_url_canonical_dedup", oracle=_URL_DEDUP_ORACLE)
def crawl_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup: canonicalize (lowercase scheme/host, strip
    fragment/default-port/tracking-params/dup-slashes/index-file/trailing
    slash, sort query params — operators/urls.py) and collapse to one row
    per resource, keeping the min doc_id as the fetch of record. The
    canonicalizer is a per-row codegen'd expression fold — no UDF — so
    the only shuffle is the group-by on the canonical key itself, exactly
    what a frontier must exchange at any scale; map-side partial
    aggregation collapses same-page spellings before the wire."""
    docs = load_table(spark, sf_dir, "documents")
    canon = docs.select(
        "doc_id",
        U.synth_url(F.col("doc_id")).alias("raw_url"),
    ).select(
        "doc_id",
        "raw_url",
        U.canonical_url(F.col("raw_url")).alias("canonical_url"),
    )
    return canon.groupBy("canonical_url").agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.count_distinct("raw_url").alias("n_spellings"),
        F.min("doc_id").alias("keeper_doc"),
    )


_POLITENESS_BATCH = 8

_POLITENESS_ORACLE = f"""
WITH raw AS (SELECT doc_id, {_RAW_SQL} AS raw_url FROM documents),
canon AS (SELECT DISTINCT {_CANON_SQL} AS canonical_url FROM raw),
keyed AS (
  SELECT canonical_url,
         {U.url_host_sql('canonical_url')} AS host,
         ROW_NUMBER() OVER (
           PARTITION BY {U.url_host_sql('canonical_url')}
           ORDER BY canonical_url
         ) AS rn
  FROM canon
)
SELECT host, canonical_url,
       CAST((rn - 1) // {_POLITENESS_BATCH} AS BIGINT) AS fetch_batch
FROM keyed
"""


@query("crawl_host_politeness", oracle=_POLITENESS_ORACLE)
def crawl_host_politeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Politeness scheduling over the deduped frontier: key each canonical
    URL by host and assign it a per-host fetch batch (row_number within
    host // batch size) — one host is fetched by one ordered queue, the
    crawl-delay contract. The window partitions by host, so frontier
    sharding is the SAME exchange a fetcher fleet needs; no global
    ordering anywhere. Composes canonicalization -> distinct -> window:
    three narrow, key-partitioned exchanges."""
    docs = load_table(spark, sf_dir, "documents")
    canon = (
        docs.select(U.synth_url(F.col("doc_id")).alias("raw_url"))
        .select(U.canonical_url(F.col("raw_url")).alias("canonical_url"))
        .distinct()
    )
    keyed = canon.select(
        U.url_host(F.col("canonical_url")).alias("host"), "canonical_url"
    )
    w = Window.partitionBy("host").orderBy("canonical_url")
    return keyed.select(
        "host",
        "canonical_url",
        F.floor((F.row_number().over(w) - 1) / _POLITENESS_BATCH)
        .cast("bigint")
        .alias("fetch_batch"),
    )


_FRONTIER_ORACLE = f"""
WITH raw AS (SELECT {U.synth_url_sql('event_id')} AS raw_url FROM events)
SELECT DISTINCT {U.canonical_url_sql('raw_url')} AS canonical_url FROM raw
"""


@query("stream_url_frontier", oracle=_FRONTIER_ORACLE)
def stream_url_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl frontier as a stream operator (batch mode of
    streaming/windows.url_frontier_dedup): canonicalize each discovered
    URL and emit it once, with dedup state bounded by the watermark
    horizon in streaming mode — the only exact URL gate that survives an
    unbounded link stream. Stream==batch equality is asserted in
    tests/test_streaming.py; here the builder runs over the events table
    (event_id -> fixture URL, ts as discovery time) so DuckDB can replay
    the canonical-distinct set."""
    from gridmr_spark.streaming.windows import url_frontier_dedup

    return url_frontier_dedup(load_table(spark, sf_dir, "events"))
