"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``gridmr_spark.queries`` — the registry holds every
implemented operator from SURVEY.md §2 as (spark_fn, duckdb_oracle) pairs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from gridmr_spark.queries import load_all


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: word count over documents.text at sf0.001
    (reference parity — cpp/worker/map.cc:12-21 + cpp/worker/reduce.cc:10-22)."""
    reg = load_all()
    return reg["wordcount"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-checkable query; queries
    without an entry here get the driver's weaker rows-only check."""
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
