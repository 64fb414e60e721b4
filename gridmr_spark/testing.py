"""Local replica of the driver's correctness gate.

The driver runs each ``queries()[name]`` on Spark and the matching
``oracle_sql()[name]`` on DuckDB over the same parquet, then compares
row-count + schema + order-insensitive value hash. This module reproduces
that comparison so parity is verified *before* the driver does.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import math

import duckdb
from pyspark.sql import DataFrame

from gridmr_spark.catalog import TABLES, table_path


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as a string (see gridmr_spark.plans for the full
    audit API)."""
    from gridmr_spark.plans import physical_plan

    return physical_plan(df, mode)


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


def _norm(v: object) -> str:
    """Canonical string form of a value for order-insensitive comparison."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, _decimal.Decimal):
        return _norm(float(v))
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return str(v)


def _spark_rows(df: DataFrame) -> tuple[list[str], list[list[object]]]:
    cols = df.columns
    rows = [[r[c] for c in cols] for r in df.collect()]
    return cols, rows


def _duckdb_rows(con: duckdb.DuckDBPyConnection, sql: str) -> tuple[list[str], list[list[object]]]:
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = [list(r) for r in cur.fetchall()]
    return cols, rows


def canonicalize(cols: list[str], rows: list[list[object]]) -> tuple[list[str], list[str]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    lines = sorted("\x1f".join(_norm(row[i]) for i in order) for row in rows)
    return sorted_cols, lines


def compare_query(
    df: DataFrame, con: duckdb.DuckDBPyConnection, oracle_sql: str, max_diff: int = 5
) -> list[str]:
    """Return a list of mismatch descriptions (empty == parity)."""
    problems: list[str] = []
    s_cols, s_rows = _spark_rows(df)
    d_cols, d_rows = _duckdb_rows(con, oracle_sql)
    sc, sl = canonicalize(s_cols, s_rows)
    dc, dl = canonicalize(d_cols, d_rows)
    if sc != dc:
        problems.append(f"schema mismatch: spark={sc} duckdb={dc}")
        return problems
    if len(sl) != len(dl):
        problems.append(f"row count mismatch: spark={len(sl)} duckdb={len(dl)}")
    if sl != dl:
        s_only = [line for line in sl if line not in set(dl)][:max_diff]
        d_only = [line for line in dl if line not in set(sl)][:max_diff]
        problems.append(
            f"value mismatch (cols={sc}): spark-only={s_only!r} duckdb-only={d_only!r}"
        )
    return problems
