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
    # --- round-7 priority (driver budget ~50; first rows first) ---
    # (a) the ONLY two registered queries with no driver row in any round
    # (they postdate the round-6 correctness run; local oracle parity green):
    "multimodal_image_ahash_dedup", "udtf_partitioned_topk",
    # (b) round-7 additions register below as they land; freshly-oracled
    # exact-regime variants of former no_oracle queries next so the driver
    # records their first hash rows.
    # (c) freshness rotation: the 14 queries whose latest green driver row
    # is ROUND 2 (VERDICT r6 §Next-2) — oldest evidence first.
    "udaf_apply_in_pandas", "udtf_tokenize", "window_topk_per_group",
    "window_ranks", "window_frames", "topk_global", "source_csv_roundtrip",
    "source_json_roundtrip", "window_ntile_nav", "sql_api_revenue",
    "source_partition_pruning", "source_orc_roundtrip", "text_pii_redact",
    "text_top_token_share",
    # (d) next-oldest (round 3) with remaining budget, heaviest-reworked
    # families first.
    "join_asof", "join_asof_tolerance", "join_range_band",
    "join_semi", "join_anti", "filter_project",
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
    "agg_grouping_sets", "agg_cube", "agg_rollup",
    "set_ops", "set_ops_all",
    # r4/r5/r6-green queries follow in registration order with whatever
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
