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
    # round-4 timestamp queries
    "ds_store_sales_rollup",
    "ds_date_star",
    "events_resample_locf",
    "join_range_bucketed",
    "events_subsequence_match",
    # round-5 timestamp queries (tws sessions aggregate event timestamps;
    # the stream datasource generates and windows its own timestamps)
    "stream_tws_sessions",
    "source_stream_datasource",
    # round-6: the LIVE transformWithState runs stage events to parquet and
    # re-read them under the hostile session (watermarks + timers + sinks
    # all cross the timestamp boundary)
    "stream_tws_sessions_live",
    "stream_tws_first_seen_live",
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


# Order/partitioning-sensitive representatives: global ntile, grouped top-k,
# hash-bucketed sampling, LSH banding, decimal money sums, connected
# components. All must be partition-count-invariant by construction.
_PARTITION_SENSITIVE = [
    "agg_equidepth_histogram",
    "window_topk_per_group",
    "sample_train_val_test",
    "dedup_minhash_lsh",
    "q1_pricing_summary",
    "dedup_clusters_cc",
]


@pytest.mark.parametrize("name", _PARTITION_SENSITIVE)
def test_query_survives_hostile_shuffle_partitions(spark, duck, sf_oracle, name):
    """The driver's session may carry any spark.sql.shuffle.partitions;
    results must not depend on it (decimal sums, total-order tiebreaks,
    hash-keyed sampling are all partition-invariant by design — prove it)."""
    original = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        q = load_all()[name]
        problem = compare_query(q.fn(spark, sf_oracle), duck, q.oracle)
        assert not problem, f"{name} at 7 shuffle partitions: {problem}"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", original)
