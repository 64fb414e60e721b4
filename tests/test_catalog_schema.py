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


# Column names (and the type *family* of the key columns queries filter or
# join on) for every table — a regenerated testdata drop that renames or
# retypes a column should fail here by name, not as dozens of downstream
# AnalysisExceptions.
_EXPECTED_COLUMNS = {
    "region": ["r_regionkey", "r_name"],
    "nation": ["n_nationkey", "n_name", "n_regionkey"],
    "customer": ["c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal"],
    "supplier": ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    "part": ["p_partkey", "p_name", "p_type", "p_retailprice"],
    "orders": ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
               "o_orderdate", "o_orderpriority"],
    "lineitem": ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
                 "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus", "l_shipdate"],
    "events": ["event_id", "ts", "user_id", "event_type", "value", "props"],
    "documents": ["doc_id", "text", "lang", "source", "n_chars"],
    "embeddings": ["vec_id", "embedding", "label"],
}


@pytest.mark.parametrize("table", sorted(_EXPECTED_COLUMNS))
def test_table_columns_present(spark, sf_oracle, table):
    cols = set(load_table(spark, sf_oracle, table).columns)
    missing = [c for c in _EXPECTED_COLUMNS[table] if c not in cols]
    assert not missing, f"{table} is missing {missing} (has {sorted(cols)})"


def test_python_datasource_partition_planning(spark):
    """sources/pyds: partitions() must drive scan parallelism — requesting
    P partitions yields exactly P input splits, each covering its own row
    range (no overlap, no loss)."""
    from gridmr_spark.sources import pyds

    pyds.register(spark)
    df = (
        spark.read.format("synthlog")
        .option("rows", 1000).option("partitions", 16).load()
    )
    assert df.rdd.getNumPartitions() == 16
    assert df.count() == 1000
    ids = [r.row_id for r in df.select("row_id").collect()]
    assert sorted(ids) == list(range(1000))


def test_python_datasource_option_validation():
    """Degenerate options must not crash partition planning: partitions=0
    clamps to 1 (a hint, not a contract), rows=0 reads empty, rows<0 rejects."""
    import pytest

    from gridmr_spark.sources.pyds import SynthLogReader

    r = SynthLogReader({"rows": "100", "partitions": "0"})
    parts = r.partitions()
    assert len(parts) == 1 and (parts[0].start, parts[0].end) == (0, 100)
    assert SynthLogReader({"rows": "0"}).partitions() == []
    with pytest.raises(ValueError, match="rows must be >= 0"):
        SynthLogReader({"rows": "-5"})


def test_dq_skew_detector_semantics(spark, sf_smoke):
    from gridmr_spark.catalog import load_table
    from gridmr_spark.queries.quality import dq_skew_detector

    rows = sorted(dq_skew_detector(spark, sf_smoke).collect(), key=lambda r: r.rk)
    orders = load_table(spark, sf_smoke, "orders")
    assert rows[0].n_rows == orders.count()
    assert rows[0].n_keys == orders.select("o_custkey").distinct().count()
    cnts = [r.cnt for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    # share and hotness are consistent restatements of cnt
    for r in rows:
        assert r.share_microq == int(r.cnt / r.n_rows * 1_000_000)
        assert r.x_avg_milliq >= 1000 or r.cnt * r.n_keys < r.n_rows


def test_ltv_decay_bounded_by_raw_value(spark, sf_smoke):
    """Decay weights live in (0, 1], so each user's decayed total is
    positive and never exceeds their raw purchase value total."""
    from gridmr_spark.catalog import load_table
    from gridmr_spark.queries.more_funcs import events_ltv_decay
    from pyspark.sql import functions as F

    got = {r.user_id: r for r in events_ltv_decay(spark, sf_smoke).collect()}
    raw = {
        r.user_id: (r.n, r.s)
        for r in load_table(spark, sf_smoke, "events")
        .where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert set(got) == set(raw)
    for uid, r in got.items():
        assert r.n_events == raw[uid][0]
        assert 0 < r.decayed_q <= raw[uid][1] * 1e9 + r.n_events  # +floor slack
