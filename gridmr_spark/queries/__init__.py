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
    # --- round-5 priority (driver budget ~50; first rows first) ---
    # (a) new or materially changed this round — no driver row at current
    # semantics. agg_quantile_sketch gained an exact-regime oracle (was the
    # one no_oracle r4 row); text_lang_id's scorer was rebuilt as a
    # dictionary broadcast join (its only green row was r1).
    "agg_quantile_sketch", "text_lang_id",
    "source_stream_datasource", "stream_tws_sessions",
    "multimodal_png_decode", "cluster_kmeans_assign", "similarity_pq_topk",
    "join_bloom_runtime", "dedup_minhash_clusters", "text_quality_classifier",
    "events_variant_props", "sql_pipe_syntax", "string_collation_ci",
    "multimodal_wav_decode", "source_xml_roundtrip",
    # (b) freshness rotation: the 23 queries whose latest green driver row
    # is ROUND 1 — three rounds stale, several pre-date major reworks
    # (winsorize, tokenize-once, events loader). Local oracle parity is
    # green at HEAD; these need the hard driver signal refreshed.
    "agg_cube", "agg_grouping_sets", "agg_percentiles", "date_funcs",
    "dedup_exact", "dedup_ngram_jaccard", "distinct_rows", "math_funcs",
    "multimodal_meta", "pandas_udf_revenue", "pivot_status",
    "q3_shipping_priority", "q4_priority_late_ship",
    "q5_local_supplier_volume", "set_ops", "string_funcs",
    "subquery_scalar_exists", "text_fingerprint", "text_quality",
    "text_token_count", "unpivot_status", "wordcount",
    # (c) round-2-latest rows, oldest families first: the similarity/dedup/
    # graph stack (most reworked since r2), then the remaining r2 set. The
    # ~50-row budget cuts somewhere in here; round 6 rotates the tail in.
    "dedup_minhash_lsh", "dedup_clusters_cc", "dedup_embedding_cosine",
    "similarity_topk", "similarity_near_pairs", "similarity_topk_gemm",
    "similarity_lsh_topk", "similarity_ivf_topk",
    "graph_degree_distribution", "graph_triangle_count",
    "merge_upsert_cdc", "pipeline_training_data", "sample_stratified_cap",
    "sample_train_val_test", "text_pii_redact", "text_top_token_share",
    "agg_collect", "agg_salted_skew", "array_funcs", "array_set_ops",
    "layout_bucketed_join", "layout_zorder_key", "multimodal_frame_sample",
    "q10_returned_items", "q12_priority_classes", "q14_promo_revenue",
    "q18_large_volume", "q22_inactive_customers", "regex_funcs",
    "source_csv_roundtrip", "source_json_roundtrip", "source_orc_roundtrip",
    "source_partition_pruning", "sql_api_revenue", "topk_global",
    "udaf_apply_in_pandas", "udtf_tokenize", "window_frames",
    "window_ntile_nav", "window_ranks", "window_topk_per_group",
    # r3/r4-green queries follow in registration order with whatever
    # budget remains.
]


def load_all() -> dict[str, Query]:
    """Import every query module (idempotent) and return the registry,
    reordered so _DRIVER_PRIORITY names come first (see above)."""
    from gridmr_spark.queries import (  # noqa: F401
        more_funcs,
        quality,
        relational,
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
