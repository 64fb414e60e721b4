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
    # --- round-8 priority (driver budget ~50; first rows first) ---
    # (a) the four queries that gained exact-regime oracles in round 7 but
    # whose driver rows are still stale no_oracle (r3-r6) — VERDICT r7
    # item 1: their first hash rows are this round's top evidence goal.
    "similarity_topk_gemm", "similarity_topk_gemm_blocked",
    "similarity_pq_persisted", "similarity_ivf_persisted",
    # (b) round-8 additions (first driver rows ever):
    "text_html_extract", "pipeline_warc_to_docs", "text_html_links",
    "crawl_url_canonical_dedup", "crawl_host_politeness", "dedup_semdedup",
    "variant_funcs", "similarity_hard_negatives", "sample_temperature_mixture",
    "stream_url_frontier", "pipeline_crawl_to_corpus", "sql_udf_revenue",
    "dedup_setsim_prefix", "search_eval_ndcg", "sample_dsir_importance",
    "table_time_travel", "table_incremental_read", "table_compact_expire",
    "stream_table_sink", "table_delete_rows", "vector_mrl_recall",
    "dq_skew_detector", "stream_table_changelog",
    "source_dynamic_partition_overwrite", "stream_table_upsert_view",
    "pipeline_dataset_card", "graph_sssp_weighted", "dq_l_diversity",
    "cluster_silhouette_eval", "sample_weighted_reservoir",
    "ds_repeat_buyers_intersect", "table_merge_upsert",
    "events_funnel_conversion_time", "text_trigram_lm_interpolated",
    "events_ltv_decay",
    # (c) freshness rotation: the 39 queries whose latest green driver row
    # is ROUND 3 (CORRECTNESS_r03 aggregation) — oldest evidence first.
    "dedup_contamination_check", "dedup_incremental_minhash", "dedup_simhash",
    "join_asof_forward", "join_full_outer", "join_null_safe",
    "join_salted_skew", "layout_compact_files", "map_funcs",
    "merge_scd2_history", "multimodal_decode", "multimodal_resize",
    "pipeline_domain_caps", "pipeline_token_batching", "q11_important_values",
    "q13_order_distribution", "q15_top_supplier", "q16_supplier_counts",
    "q17_small_quantity", "q19_disjunctive_brackets",
    "q20_part_family_shippers", "q21_waiting_suppliers",
    "q2_min_cost_supplier", "q6_forecast_revenue", "q7_nation_volume",
    "q8_market_share", "q9_product_profit", "source_schema_evolution",
    "stream_dedup_exact", "stream_interval_join", "stream_static_enrich",
    "text_chunk_windows", "text_corpus_freq_score", "text_repetition_filters",
    "text_tfidf_topterms", "try_funcs", "vector_quantize_int8",
    "window_lag_lead", "window_time_range",
    # (d) next-oldest (round 4) with whatever budget remains.
    "agg_distinct", "agg_equidepth_histogram", "agg_moments",
    "conditional_funcs", "dedup_containment_pairs", "dedup_exact_digest",
    "dedup_paragraphs", "ds_channel_compare", "ds_customer_ltv_window",
    "ds_date_star", "ds_returns_anti", "ds_store_sales_rollup",
    "ds_time_band_counts", "graph_pagerank", "join_range_bucketed",
    "join_star_revenue", "json_funcs", "merge_cdc_with_deletes",
    "merge_scd2_asof_lookup", "multimodal_arrow_byte_stats",
    "multimodal_audio_energy", "sample_importance_weighted",
    "source_dynamic_partition_pruning", "source_python_datasource",
    "stream_session_10m", "stream_sliding_1h_30m", "stream_stateful_totals",
    "stream_tumbling_1h", "text_token_entropy", "udtf_analyze_firstk",
    "window_value_range",
    # r5/r6/r7-green queries follow in registration order with whatever
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
