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
    # --- round-15 priority (driver budget ~50) ---
    # (a) queries whose CODE PATH changed this round, riskiest first:
    # the single-partition-window rewrites (two-level global ranks,
    # TakeOrdered top-ks, driver-side pareto prefix scan), the TWS-live
    # state-partition sizing, the IVF stats-artifact + one-exchange merge
    # tail, and the cosine_topk collect-guard's consumers.
    "agg_equidepth_histogram", "ds_customer_ltv_window",
    "window_distribution", "window_ntile_nav", "search_rrf_fusion",
    "text_token_drift", "dq_skew_detector", "sample_dsir_importance",
    "sample_weighted_reservoir", "skyline_pareto_front",
    "stream_tws_sessions_live", "stream_tws_first_seen_live",
    "similarity_ivf_append", "similarity_ivf_persisted",
    "similarity_ivf_exact_regime", "similarity_topk_gemm",
    "eval_1nn_f1", "eval_1nn_confusion", "eval_1nn_shortlist",
    # (b) the r14 perf-regressed rows (VERDICT r14 item 10): fresh oracle
    # rows alongside this round's perf work on them.
    "dedup_binary_hamming_pairs", "search_eval_ndcg",
    "table_metadata_agg_dv", "dedup_clusters_cc", "graph_pagerank",
    "similarity_pq_persisted", "stream_countmin_merge",
    "dedup_ngram_jaccard", "stream_dedup_minhash",
    "stream_table_cdc_feed", "stream_table_changelog",
    "source_stream_datasource",
    # (c) the rest of the streaming family (the r14 drift cohort).
    "stream_catalog_cdc_feed", "stream_tumbling_1h",
    "stream_sliding_1h_30m", "stream_session_10m", "stream_dedup_exact",
    "stream_static_enrich", "stream_tws_sessions",
    # (d) perf-suspect rows (incl. rows-only ANN paths) with what
    # remains of the budget.
    "similarity_pq_topk", "similarity_lsh_topk", "dedup_setsim_prefix",
    "dedup_minhash_lsh", "similarity_near_pairs", "dedup_keep_best",
    "pipeline_incremental_dedup_table", "dedup_incremental_clusters",
    "pipeline_leakage_safe_split", "dedup_simhash", "table_wap_multi",
    "dedup_minhash_clusters", "er_resolve_entities",
    # --- round-14 priority (kept below for registration-order stability
    # of whatever budget remains) ---
    # (a) round-14 additions (first driver rows ever): type-widening
    # schema evolution, partition-spec evolution without rewrite, and
    # the exact-regime IVF row that puts the ANN machinery under a full
    # hash oracle.
    "table_schema_widening", "table_partition_spec_evolution",
    "similarity_ivf_exact_regime", "table_rename_column",
    "table_drop_column", "table_add_files",
    # (b) freshness rotation (VERDICT r13 item 1): the 50-query cohort
    # whose latest green driver row is round 7 — the oldest rows in the
    # record; with (a) taking 3 slots the stragglers roll to round 15.
    "agg_collect", "agg_cube", "agg_grouping_sets", "agg_heavy_hitters",
    "agg_histogram", "agg_hll_mergeable", "agg_quantile_sketch",
    "agg_robust_mad", "agg_rollup", "agg_winsorize", "array_set_ops",
    "dq_constraint_check", "dq_orphan_check", "dq_profile_columns",
    "er_resolve_entities", "events_burst_detection",
    "events_cohort_retention", "events_funnel", "events_resample_locf",
    "events_sessionize", "events_subsequence_match",
    "events_transition_matrix", "filter_project", "fuzzy_blocked_pairs",
    "fuzzy_levenshtein_pairs", "join_anti", "join_asof",
    "join_asof_tolerance", "join_range_band", "join_semi",
    "multimodal_image_ahash_dedup", "q1_pricing_summary",
    "q3_shipping_priority", "set_ops", "source_csv_roundtrip",
    "source_json_roundtrip", "source_orc_roundtrip",
    "source_partition_pruning", "sql_api_revenue", "text_pii_redact",
    "text_top_token_share", "topk_global", "udaf_apply_in_pandas",
    "udtf_partitioned_topk", "udtf_tokenize", "window_distribution",
    "window_frames", "window_ntile_nav", "window_ranks",
    "window_topk_per_group",
    # (c) queries whose CODE PATH changed in round 14: every read/rewrite
    # seam now goes through _merged_read (widening), read_pruned grew the
    # per-cohort spec split, and the changelog/catalog streams learned
    # widened schemas + expire re-seeding.
    "table_partition_pruned_read", "table_changefeed_evolve",
    "table_changefeed_rewrite", "table_changefeed_agg",
    "stream_catalog_cdc_feed", "stream_table_cdc_feed",
    "table_delete_vectors", "table_merge_upsert", "table_compact_small",
    "table_stats_pruned_read", "table_zorder_pruned", "table_wap_multi",
    "table_time_travel", "table_metadata_agg", "table_metadata_agg_dv",
    # r8+-green queries follow in registration order with whatever
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
