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


def load_all() -> dict[str, Query]:
    """Import every query module (idempotent) and return the registry.

    ORDER MATTERS: the driver's correctness gate walks ``queries()`` in
    insertion order under a ~50-query budget (round 1 recorded rows for
    exactly the first 50 registered). Modules whose queries have NOT yet
    received a driver row (round 1: tpch_more tail, udx, windows, vector)
    are imported first so every query gets driver-verified at least once
    across rounds; the long-green relational tail gets re-verified last.
    """
    from gridmr_spark.queries import (  # noqa: F401
        tpch_more,
        udx,
        windows,
        vector,
        more_funcs,
        scalar_funcs,
        textops,
        streaming_batch,
        relational,
    )

    return REGISTRY
