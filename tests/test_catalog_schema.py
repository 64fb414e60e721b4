"""Schema canaries for the driver-generated testdata.

A testdata regeneration that changes a physical dtype (it happened to
events.ts: TIMESTAMP(NANOS) in round 1, plain TIMESTAMP(MICROS) in round 2)
should fail ONE named test here, not 55 downstream ones.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql.types import TimestampNTZType, TimestampType

from gridmr_spark.catalog import load_table

SF_DIRS = [
    d
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.isdir(d)
]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_ts_loads_as_timestamp(spark, sf_dir):
    dt = load_table(spark, sf_dir, "events").schema["ts"].dataType
    assert isinstance(dt, (TimestampType, TimestampNTZType)), (
        f"events.ts loaded as {dt} at {sf_dir}; _load_events must normalize "
        "it to a timestamp regardless of the parquet physical type"
    )
