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
    # --- round-10 priority (driver budget ~50; first rows first) ---
    # (a) round-10 additions (first driver rows ever).
    "dedup_binary_hamming_pairs", "eval_1nn_shortlist",
    "pipeline_leakage_safe_split", "source_jsonl_quarantine",
    # (b) queries whose CODE PATH changed this round — evidence must
    # track the change: keep_best's digest pre-collapse, the WARC
    # chunking re-price, and every table_* query (two-level manifests
    # replaced their storage layer wholesale).
    "dedup_keep_best", "source_warc_ingest", "pipeline_warc_to_docs",
    "table_stats_pruned_read", "table_zorder_pruned", "table_merge_upsert",
    "table_time_travel", "table_incremental_read", "table_compact_expire",
    "table_delete_rows",
    # (c) freshness rotation: the 36 queries whose latest green driver
    # row is round 3-4 — the oldest evidence on the board (computed from
    # CORRECTNESS_r01..r09; everything else is r5+).
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
    "stream_tumbling_1h", "text_tfidf_topterms", "text_token_entropy",
    "try_funcs", "udtf_analyze_firstk", "vector_quantize_int8",
    "window_lag_lead", "window_time_range", "window_value_range",
    # r5-r9-green queries follow in registration order with whatever
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
