"""File-format round-trip queries (SURVEY.md §2.D row 1 made driver-visible).

Round 1 proved the csv/json/text readers via pytest round-trips only; these
queries put the same fidelity claim through the driver's DuckDB gate: each
writes a table slice out through ``sources.write`` in the target format,
reads it back through the matching ``sources.read_*``, and returns the
re-read rows — the oracle is the straight SQL over the original parquet, so
a green row proves write+read is value-exact, not just "parses".

Scratch output goes under the system temp dir (same convention as
``streaming/windows.py``), keyed by sf_dir so concurrent SFs don't collide;
``mode=overwrite`` makes repeated invocations idempotent.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gridmr_spark import sources
from gridmr_spark.catalog import load_table
from gridmr_spark.queries import query


def _scratch(sf_dir: str, tag: str) -> str:
    key = hashlib.md5(f"{sf_dir}:{tag}".encode()).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"gridmr_io_{tag}_{key}")


_CSV_ORACLE = """
SELECT n_nationkey, n_name, n_regionkey FROM nation
"""


@query("source_csv_roundtrip", oracle=_CSV_ORACLE)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + source fidelity: write the nation dimension as headered
    CSV (directory-of-parts), read it back with an EXPLICIT schema (never
    inferSchema in production — it double-scans), return the re-read rows.
    Quoting is exercised too: n_name is free text."""
    path = _scratch(sf_dir, "csv")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    sources.write(nation, path, fmt="csv")
    return sources.read_csv(
        spark, path, schema="n_nationkey int, n_name string, n_regionkey int"
    )


_JSON_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment,
       CAST(c_acctbal AS DOUBLE) AS c_acctbal
FROM customer
WHERE c_custkey < 500
"""


@query("source_json_roundtrip", oracle=_JSON_ORACLE)
def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink + source fidelity, including a double column:
    Jackson's shortest-round-trip rendering guarantees the re-read double is
    bit-identical, which the value hash then proves. Explicit read schema,
    as JSON inference scans everything."""
    path = _scratch(sf_dir, "json")
    cust = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") < 500).select(
        "c_custkey", "c_name", "c_mktsegment", F.col("c_acctbal").cast("double").alias("c_acctbal")
    )
    sources.write(cust, path, fmt="json")
    return sources.read_json(
        spark, path,
        schema="c_custkey long, c_name string, c_mktsegment string, c_acctbal double",
    )
