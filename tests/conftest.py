from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from gridmr_spark.session import get_spark

    s = get_spark("gridmr_spark_tests", cpus=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    from gridmr_spark.testing import duckdb_connect

    con = duckdb_connect(SF_ORACLE)
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_smoke() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_oracle() -> str:
    return SF_ORACLE
