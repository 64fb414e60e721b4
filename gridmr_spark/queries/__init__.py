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
    # --- round-3 priority (driver budget ~50; first rows first) ---
    # (a) r2 rows red on the events-loader regression, loader now fixed —
    # must re-prove first
    "events_funnel", "map_funcs", "window_lag_lead", "window_time_range",
    "events_sessionize", "agg_heavy_hitters", "stream_dedup_exact",
    "stream_interval_join",
    # (b) zero driver evidence of any kind across r1–r2 (dedup_simhash and
    # multimodal_decode gained oracles this round)
    "dedup_simhash", "agg_approx_distinct", "multimodal_decode",
    "multimodal_resize", "similarity_topk_gemm_blocked", "graph_pagerank",
    "agg_hll_mergeable",
    # (c) registered in r2 but never driver-checked (the 50-query budget
    # ran out): TPC-H completion pack + text/layout/pipeline additions
    "q2_min_cost_supplier", "q6_forecast_revenue", "q7_nation_volume",
    "q8_market_share", "q9_product_profit", "q11_important_values",
    "q13_order_distribution", "q15_top_supplier", "q16_supplier_counts",
    "q17_small_quantity", "q19_disjunctive_brackets",
    "q20_part_family_shippers", "q21_waiting_suppliers",
    "join_full_outer", "join_null_safe",
    "text_chunk_windows", "text_tfidf_topterms", "dedup_contamination_check",
    "pipeline_token_batching", "agg_histogram", "layout_compact_files",
    "source_schema_evolution",
    # (d) new in round 3 — no driver row yet
    "text_repetition_filters", "join_asof_tolerance", "join_asof_forward",
    "stream_static_enrich", "agg_winsorize", "vector_quantize_int8",
    "pipeline_domain_caps", "join_salted_skew", "events_burst_detection",
    "text_corpus_freq_score", "merge_scd2_history", "dedup_incremental_minhash",
    "try_funcs", "window_value_range", "events_transition_matrix",
    "dedup_exact_digest", "dq_profile_columns", "dq_orphan_check",
    "dq_constraint_check", "merge_scd2_asof_lookup", "agg_equidepth_histogram",
    "multimodal_audio_energy",
    # (e) events-dependent queries whose only green row is r1 (pre-regression
    # loader): re-prove under the new dtype-branch path with remaining
    # budget — they have historical green rows, so they yield to the
    # never-checked groups above
    "join_asof", "json_funcs", "conditional_funcs", "events_cohort_retention",
    "stream_tumbling_1h", "stream_sliding_1h_30m", "stream_session_10m",
    # long-green queries (r1/r2 hash-green) follow in registration order
    # with whatever budget remains.
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
