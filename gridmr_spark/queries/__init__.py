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
    # --- round-6 priority (driver budget ~50; first rows first) ---
    # (a) behavior touched THIS round or after the r5 record was stamped:
    # the round-6 additions (registered below as they land), then the four
    # queries the r5 hardening commit (7400f03) and the round-6 rework
    # (watermark-gated tws emission, pyds overwrite cleanup, PQ fit fix)
    # postdate.
    "search_bm25_topk", "sketch_kmv_overlap", "skyline_pareto_front",
    "vector_jl_projection", "layout_zonemap_skip", "search_rrf_fusion",
    "text_token_drift", "graph_bfs_distance", "dq_k_anonymity",
    "agg_groupwise_ols", "er_resolve_entities", "incremental_join_view",
    "join_lateral_topk", "sql_recursive_cte", "url_funcs",
    "pipeline_observed_metrics", "text_bpe_tokenize", "text_cdc_chunks",
    "agg_incremental_merge", "dedup_duplicate_spans",
    "stream_interval_join_left", "udaf_apply_in_arrow",
    "sql_scripting_loop", "sql_parameterized", "ml_tree_inference",
    "source_warc_ingest", "similarity_pq_persisted", "similarity_ivf_persisted",
    "multimodal_jpeg_decode", "stream_tws_sessions_live",
    "stream_tws_first_seen_live", "text_bigram_lm_score",
    "stream_tws_sessions", "source_stream_datasource", "similarity_pq_topk",
    "multimodal_png_decode",
    # (b) freshness rotation: the 28 queries whose latest green driver row
    # is ROUND 2 — the final stale tail (VERDICT r5 §Next-1). Local oracle
    # parity is green at HEAD; this rotation gives every registered query
    # a driver row <= 2 rounds old.
    "agg_collect", "agg_salted_skew", "array_funcs", "array_set_ops",
    "layout_bucketed_join", "layout_zorder_key", "multimodal_frame_sample",
    "q10_returned_items", "q12_priority_classes", "q14_promo_revenue",
    "q18_large_volume", "q22_inactive_customers", "regex_funcs",
    "sample_train_val_test", "source_csv_roundtrip", "source_json_roundtrip",
    "source_orc_roundtrip", "source_partition_pruning", "sql_api_revenue",
    "text_pii_redact", "text_top_token_share", "topk_global",
    "udaf_apply_in_pandas", "udtf_tokenize", "window_frames",
    "window_ntile_nav", "window_ranks", "window_topk_per_group",
    # (c) next-oldest evidence (round 3) with remaining budget, heaviest-
    # reworked families first.
    "join_asof", "join_asof_tolerance", "join_range_band",
    "join_semi", "join_anti", "filter_project",
    # r3/r4/r5-green queries follow in registration order with whatever
    # budget remains.
]


def load_all() -> dict[str, Query]:
    """Import every query module (idempotent) and return the registry,
    reordered so _DRIVER_PRIORITY names come first (see above)."""
    from gridmr_spark.queries import (  # noqa: F401
        more_funcs,
        quality,
        relational,
        retrieval,
        scalar_funcs,
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
