"""Type-widening schema evolution (round 14): Iceberg's safe-promotion
matrix (int-chain widening, float->double, decimal precision increase at
equal scale) applied to the manifest table — old cohorts up-cast AT READ,
no rewrite. Reference parity: none (GridMR's data plane is bare files,
SURVEY §1.4); the public spec matched is Iceberg's schema-evolution
promotion matrix plus Spark's SPARK-40876 widened parquet reads."""

from __future__ import annotations

import decimal
import os

import pytest
from pyspark.sql import functions as F

from gridmr_spark.sources.table_format import (
    ManifestTable,
    _widen_ddl,
    _widen_type,
    register_changelog_source,
)


def _mk_widened(spark, tmp_path):
    """v1 int/float/decimal(5,2) -> v2 widened long/double/decimal(10,2)."""
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit(
        spark.createDataFrame(
            [(1, 1.5, decimal.Decimal("1.25")), (2, 2.5, decimal.Decimal("2.50"))],
            "k int, x float, d decimal(5,2)",
        )
    )
    t.commit(
        spark.createDataFrame(
            [(3_000_000_000, 3.5, decimal.Decimal("12345678.99"))],
            "k long, x double, d decimal(10,2)",
        )
    )
    return t


def test_widen_type_matrix():
    from pyspark.sql.types import (
        ByteType, DecimalType, DoubleType, FloatType, IntegerType, LongType,
        StringType,
    )

    assert isinstance(_widen_type(IntegerType(), LongType()), LongType)
    assert isinstance(_widen_type(LongType(), ByteType()), LongType)
    assert isinstance(_widen_type(FloatType(), DoubleType()), DoubleType)
    assert _widen_type(DecimalType(10, 2), DecimalType(5, 2)) == DecimalType(10, 2)
    # unsafe pairs refuse: scale change loses digits, int vs string is a rename
    assert _widen_type(DecimalType(5, 2), DecimalType(5, 1)) is None
    assert _widen_type(IntegerType(), StringType()) is None
    assert _widen_type(IntegerType(), FloatType()) is None
    assert _widen_ddl("int", "bigint") == "bigint"
    assert _widen_ddl("float", "double") == "double"
    assert _widen_ddl("decimal(5,2)", "decimal(10,2)") == "decimal(10,2)"
    assert _widen_ddl("decimal(5,2)", "decimal(10,1)") is None
    assert _widen_ddl("int", "string") is None


def test_read_across_widening_commit_upcasts_old_cohort(spark, tmp_path):
    t = _mk_widened(spark, tmp_path)
    df = t.read(spark, merge_schema=True)
    assert df.schema.simpleString() == (
        "struct<k:bigint,x:double,d:decimal(10,2)>"
    )
    got = sorted((r.k, r.x, r.d) for r in df.collect())
    assert got == [
        (1, 1.5, decimal.Decimal("1.25")),
        (2, 2.5, decimal.Decimal("2.50")),
        (3_000_000_000, 3.5, decimal.Decimal("12345678.99")),
    ]
    # time travel BEFORE the widening still reads the narrow shape
    assert (
        t.read(spark, 1, merge_schema=True).schema.simpleString()
        == "struct<k:int,x:float,d:decimal(5,2)>"
    )


def test_widening_plus_additive_in_one_history(spark, tmp_path):
    """Widening and add-column compose: the union schema carries the
    added column (null backfill) AND the widest types."""
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit(spark.createDataFrame([(1, 10)], "k int, n int"))
    t.commit(spark.createDataFrame([(2, 20, "x")], "k bigint, n int, tag string"))
    got = sorted(
        (r.k, r.n, r.tag) for r in t.read(spark, merge_schema=True).collect()
    )
    assert got == [(1, 10, None), (2, 20, "x")]


def test_incompatible_change_still_refuses(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit(spark.createDataFrame([(1, 10)], "k int, n int"))
    t.commit(spark.createDataFrame([(2, "oops")], "k int, n string"))
    with pytest.raises(ValueError, match="incompatible"):
        t.read(spark, merge_schema=True).collect()
    with pytest.raises(ValueError, match="INCOMPATIBLE"):
        t.changefeed(spark, 1, 2).collect()


def test_changefeed_crosses_widening_commit(spark, tmp_path):
    """A feed range crossing a widening commit aligns at the widest type:
    a COW delete after the widening emits its exact retract rows with the
    old cohort's values up-cast."""
    t = _mk_widened(spark, tmp_path)                        # v1 narrow, v2 wide
    t.delete_where(spark, F.col("k") == 1)                  # v3 partial COW
    feed = t.changefeed(spark, 1, 3)
    assert feed.schema["k"].dataType.simpleString() == "bigint"
    got = sorted((r["_op"], r.k, r.x) for r in feed.collect())
    assert got == [("D", 1, 1.5), ("I", 3_000_000_000, 3.5)]
    # the signed fold of the FULL feed reproduces the final snapshot
    full = t.changefeed(spark, 0, 3)
    folded = sorted(
        (r.k, r.x, r.d)
        for r in full.withColumn(
            "s", F.when(F.col("_op") == "I", 1).otherwise(-1)
        )
        .groupBy("k", "x", "d")
        .agg(F.sum("s").alias("n"))
        .where("n != 0")
        .select("k", "x", "d")
        .collect()
    )
    want = sorted(
        (r.k, r.x, r.d) for r in t.read(spark, merge_schema=True).collect()
    )
    assert folded == want


def test_rewrite_verbs_survive_widening(spark, tmp_path):
    """delete_where / merge_by_key / compact on a table whose files
    straddle a widening commit rewrite at the WIDEST schema with exact
    values — the seams that used mergeSchema and would have refused."""
    t = _mk_widened(spark, tmp_path)
    t.delete_where(spark, F.col("k") == 2)
    got = sorted((r.k, r.x) for r in t.read(spark, merge_schema=True).collect())
    assert got == [(1, 1.5), (3_000_000_000, 3.5)]
    t.merge_by_key(
        spark,
        spark.createDataFrame(
            [(1, 9.0, decimal.Decimal("0.01")), (7, 7.0, decimal.Decimal("7.77"))],
            "k long, x double, d decimal(10,2)",
        ),
        "k",
    )
    got = sorted((r.k, r.x, r.d) for r in t.read(spark, merge_schema=True).collect())
    assert got == [
        (1, 9.0, decimal.Decimal("0.01")),
        (7, 7.0, decimal.Decimal("7.77")),
        (3_000_000_000, 3.5, decimal.Decimal("12345678.99")),
    ]
    v = t.compact(spark)
    got2 = sorted((r.k, r.x, r.d) for r in t.read(spark, v).collect())
    assert got2 == got
    # post-compact the table is single-schema at the widest type
    assert t.read(spark, v).schema["k"].dataType.simpleString() == "bigint"


def test_changelog_stream_widens_declared_schema(spark, tmp_path):
    """The streaming source's footer-union schema resolves a widening
    conflict to the wider DDL; pre-widening files' rows up-convert at the
    reader and the signed fold reproduces the snapshot."""
    t = _mk_widened(spark, tmp_path)
    t.delete_where(spark, F.col("k") == 1)
    register_changelog_source(spark)
    run = str(tmp_path / "run")
    sink = os.path.join(run, "out")
    q = (
        spark.readStream.format("mtable_changelog")
        .option("path", t.root)
        .option("on_rewrite", "cdc")
        .load()
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, bid: df.write.mode("append").parquet(sink))
        .option("checkpointLocation", os.path.join(run, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    feed = spark.read.parquet(sink)
    assert feed.schema["k"].dataType.simpleString() == "bigint"
    assert feed.schema["d"].dataType.simpleString() == "decimal(10,2)"
    folded = sorted(
        (r.k, r.x, r.d)
        for r in feed.withColumn(
            "s", F.when(F.col("_op") == "I", 1).otherwise(-1)
        )
        .groupBy("k", "x", "d")
        .agg(F.sum("s").alias("n"))
        .where("n != 0")
        .select("k", "x", "d")
        .collect()
    )
    want = sorted(
        (r.k, r.x, r.d) for r in t.read(spark, merge_schema=True).collect()
    )
    assert folded == want
