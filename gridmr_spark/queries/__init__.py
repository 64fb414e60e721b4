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
    # --- round-4 priority (driver budget ~50; first rows first) ---
    # (a) the 9 round-3 additions the r3 budget never reached (r3 recorded
    # exactly the first 50 priority entries; these were entries 51-59).
    # All are local-oracle green; each needs its first driver row.
    "window_value_range", "events_transition_matrix", "dedup_exact_digest",
    "dq_profile_columns", "dq_orphan_check", "dq_constraint_check",
    "merge_scd2_asof_lookup", "agg_equidepth_histogram",
    "multimodal_audio_energy",
    # (b) new in round 4 — no driver row yet; graph_pagerank re-listed
    # because it gained a real DuckDB oracle this round (was rows-only).
    "graph_pagerank",
    "fuzzy_blocked_pairs", "join_range_bucketed", "stream_stateful_totals",
    "dedup_paragraphs", "sample_importance_weighted",
    "source_python_datasource", "agg_robust_mad", "text_token_entropy",
    "events_resample_locf", "source_dynamic_partition_pruning",
    "agg_quantile_sketch", "merge_cdc_with_deletes",
    "multimodal_arrow_byte_stats", "ds_time_band_counts",
    "dedup_containment_pairs", "udtf_analyze_firstk",
    "events_subsequence_match",
    "ds_store_sales_rollup", "ds_returns_anti", "ds_date_star",
    "ds_customer_ltv_window", "ds_channel_compare",
    # (c) queries whose only green row is round 1 — stale by three rounds;
    # events-dependent ones first (they sat behind the r2 loader regression
    # and re-proved only via pytest), then registration order.
    "join_asof", "json_funcs", "conditional_funcs", "events_cohort_retention",
    "stream_tumbling_1h", "stream_sliding_1h_30m", "stream_session_10m",
    "window_distribution", "fuzzy_levenshtein_pairs",
    "q1_pricing_summary", "filter_project", "join_star_revenue",
    "join_semi", "join_anti", "join_range_band",
    "agg_distinct", "agg_moments", "agg_rollup", "agg_cube",
    "agg_grouping_sets", "set_ops", "distinct_rows",
    "q3_shipping_priority", "q5_local_supplier_volume", "pivot_status",
    "agg_percentiles", "subquery_scalar_exists", "pandas_udf_revenue",
    "string_funcs", "date_funcs", "math_funcs", "unpivot_status",
    "wordcount", "dedup_exact", "dedup_ngram_jaccard",
    "text_lang_id", "text_quality", "text_token_count", "text_fingerprint",
    "multimodal_meta", "q4_priority_late_ship",
    # r2/r3-green queries follow in registration order with whatever
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
