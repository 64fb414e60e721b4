"""Replicates the driver's t2 correctness gate locally: every registered
query with an oracle must hash-match DuckDB at sf0.01 (row count + schema +
order-insensitive values)."""

from __future__ import annotations

import pytest

from gridmr_spark.queries import load_all
from gridmr_spark.testing import compare_query

REG = load_all()
ORACLE_NAMES = sorted(n for n, q in REG.items() if q.oracle is not None)
ROWS_ONLY_NAMES = sorted(n for n, q in REG.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, duck, sf_oracle, name):
    q = REG[name]
    df = q.fn(spark, sf_oracle)
    problems = compare_query(df, duck, q.oracle)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_query_runs(spark, sf_oracle, name):
    q = REG[name]
    df = q.fn(spark, sf_oracle)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    names = {f.name for f in df.schema.fields}
    assert names == {"word", "cnt"}


def test_contract_shape():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert "wordcount" in os_
