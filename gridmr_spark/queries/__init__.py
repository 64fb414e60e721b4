"""Query registry backing ``__spark_entry__.py``.

Every implemented operator from SURVEY.md §2 registers here as::

    @query("name", oracle="SELECT ...")      # oracle optional (rows-only)
    def _q(spark, sf_dir) -> DataFrame: ...

The driver compares the Spark result against the DuckDB oracle at sf=0.01
(row-count + schema + order-insensitive value hash), so:
- every computed column is aliased identically on both sides;
- double aggregations go through exact DECIMAL sums (see ``numeric.dsum``)
  so the value hash is bit-identical regardless of evaluation order.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => driver does a rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


# Driver-verification priority. The driver's correctness gate walks
# ``queries()`` in insertion order under a ~50-query budget (round 1
# recorded rows for exactly the first 50 registered), so queries that have
# never received a driver row — or whose round-1 row was broken — are listed
# here explicitly and served first; long-green queries re-verify with
# whatever budget remains. Update per round as rows come back green.
_DRIVER_PRIORITY: list[str] = [
    # --- round-12 priority (driver budget ~50; first rows first) ---
    # (a) round-12 additions (first driver rows ever).
    "catalog_sql_read", "table_wap_multi", "table_changefeed_rewrite",
    "table_compact_small", "stream_table_cdc_feed", "table_delete_vectors",
    # (b) freshness rotation: the 10 queries whose latest green driver
    # row is still round 5 — the round-11 budget ran out before reaching
    # them (VERDICT r11 item 3). wordcount is the flagship.
    "wordcount", "string_funcs", "string_collation_ci",
    "subquery_scalar_exists", "text_fingerprint", "text_lang_id",
    "text_quality", "text_quality_classifier", "text_token_count",
    "unpivot_status",
    # (c) queries whose CODE PATH changed this round: the ManifestTable
    # commit-time bloom/stats build moved executor-side, the atomic
    # publish went behind a backend seam (tables + refs + catalog), and
    # changefeed gained file-level lineage for rewrite ranges.
    "table_bloom_pruned_read", "table_stats_pruned_read",
    "table_metadata_agg", "table_changefeed_agg", "table_wap_publish",
    "table_sql_read", "catalog_txn_read", "merge_upsert_cdc",
    "table_merge_upsert", "table_time_travel", "stream_table_upsert_view",
    "pipeline_incremental_dedup_table",
    # (d) second-oldest cohort (latest row r5 in the 40-query rotation
    # that DID get r11 rows is now fresh; these are the r6-green set) —
    # re-verify with whatever budget remains, oldest first.
    "agg_percentiles", "cluster_kmeans_assign", "date_funcs",
    "dedup_clusters_cc", "dedup_embedding_cosine", "dedup_exact",
    "dedup_minhash_clusters", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "distinct_rows", "events_variant_props", "graph_degree_distribution",
    "graph_triangle_count", "join_bloom_runtime", "math_funcs",
    "multimodal_meta", "multimodal_wav_decode",
    "pandas_udf_revenue", "pipeline_training_data", "pivot_status",
    "q4_priority_late_ship", "q5_local_supplier_volume",
    "sample_stratified_cap", "similarity_near_pairs", "similarity_topk",
    "source_xml_roundtrip", "sql_pipe_syntax",
    # r6+-green queries follow in registration order with whatever
    # budget remains.
]


def load_all() -> dict[str, Query]:
    """Import every query module (idempotent) and return the registry,
    reordered so _DRIVER_PRIORITY names come first (see above)."""
    from gridmr_spark.queries import (  # noqa: F401
        crawl,
        html_pipeline,
        more_funcs,
        quality,
        relational,
        retrieval,
        scalar_funcs,
        selection,
        setsim,
        sources_io,
        streaming_batch,
        textops,
        tpcds_shapes,
        tpch_full,
        tpch_more,
        udx,
        vector,
        windows,
    )

    ordered: dict[str, Query] = {}
    for name in _DRIVER_PRIORITY:
        if name in REGISTRY:
            ordered[name] = REGISTRY[name]
    for name, q in REGISTRY.items():
        if name not in ordered:
            ordered[name] = q
    return ordered
