"""Arrow-backed construction of small driver-local DataFrames.

``spark.createDataFrame(list_of_tuples, schema)`` plans as a Python-RDD
scan: EVERY action that executes the plan round-trips through Python
workers (pickle each row, spawn/borrow a worker per partition), measured
at ~4-6 s per action in local[32] for a 45-row table — pure fixed
overhead (optimization guide §4.1: every Python path pays for moving
data JVM <-> Python). Routing the same rows through a pandas DataFrame
takes the Arrow fast path instead and plans as a JVM ``LocalTableScan``:
the data is embedded in the plan once and every subsequent action reads
it for free (~0.2 s for the same write, 27x less).

Use for every small non-empty driver-side table (centroids, codebooks,
dimension/band tables, query sets, single-row metric results). Empty
frames already plan as an empty LocalTableScan — no change needed there.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def local_df(spark: SparkSession, rows: Iterable[Any], schema) -> DataFrame:
    """Create a DataFrame from driver-local rows via the Arrow/pandas path.

    ``schema`` is a DDL string or StructType and is applied EXACTLY (the
    declared types, not pandas' inferred ones) — type fidelity matters
    because cogroup sites assert key-dtype equality. Row-value semantics
    (None handling included) are identical to the list path; only the
    physical plan changes (LocalTableScan instead of a Python-RDD scan).
    """
    sch = spark.createDataFrame([], schema).schema if isinstance(schema, str) else schema
    rows = list(rows)
    if not rows:
        return spark.createDataFrame([], sch)
    pdf = pd.DataFrame(
        [tuple(r) for r in rows], columns=[f.name for f in sch.fields], dtype=object
    )
    return spark.createDataFrame(pdf, schema=sch)
