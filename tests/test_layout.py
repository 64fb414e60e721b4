"""Z-order layout: the written files must be clustered on BOTH dimensions.

A single-column sort gives file-level pruning on that column only; the
Morton-key write must trade a little x-tightness for a lot of y-tightness
(data skipping reads per-file min/max, so "span of a file" is exactly what
a scan-time filter prunes against).
"""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from gridmr_spark.catalog import load_table
from gridmr_spark.operators.layout import morton_key, zorder_write


def _mean_file_span(spark, path: str, col: str) -> float:
    spans = []
    for f in glob.glob(path + "/part-*.parquet"):
        row = spark.read.parquet(f).agg(
            (F.max(col) - F.min(col)).alias("span")
        ).collect()[0]
        spans.append(row["span"])
    assert spans, f"no part files under {path}"
    return sum(spans) / len(spans)


def test_morton_key_reference_values(spark):
    # interleave(x=0b11, y=0b01) = x0 | y0<<1 | x1<<2 | y1<<3 = 1|2|4|0 = 7
    df = spark.createDataFrame([(3, 1)], "x long, y long").select(
        morton_key("x", "y", 4).alias("z")
    )
    assert df.collect()[0]["z"] == 7


def test_zorder_write_clusters_both_dims(spark, sf_oracle, tmp_path):
    orders = (
        load_table(spark, sf_oracle, "orders")
        .select(
            (F.col("o_custkey") % 1024).alias("bx"),
            (F.col("o_orderkey") % 1024).alias("by"),
        )
    )
    path_x = str(tmp_path / "sorted_x")
    path_z = str(tmp_path / "zorder")
    # baseline: cluster on bx only
    (
        orders.repartitionByRange(8, "bx")
        .sortWithinPartitions("bx")
        .write.mode("overwrite")
        .parquet(path_x)
    )
    zorder_write(orders, path_z, "bx", "by", bits=10, n_files=8)

    by_span_x = _mean_file_span(spark, path_x, "by")
    by_span_z = _mean_file_span(spark, path_z, "by")
    bx_span_z = _mean_file_span(spark, path_z, "bx")
    full = 1023.0
    # the whole point: y gets real pruning under z-order...
    assert by_span_z < 0.7 * by_span_x
    # ...while x stays clustered well below the unsorted full span
    assert bx_span_z < 0.7 * full


def test_zonemap_pruned_files_never_opened_sf1(spark, tmp_path):
    """Round-6/7 carried item: PROOF that pruning skips file OPENS, not
    just rows, at the sf1 scale tier. Method: build the zone map over sf1
    orders (~1.5M rows), then replace every NON-hit data file on disk
    with garbage bytes — if the pruned read planned, footer-probed, or
    scanned any pruned file it would crash; instead it must return the
    exact answer computed from the original table."""
    import os

    import pytest as _pytest

    from gridmr_spark.operators.layout import (
        zonemap_pruned_read,
        zonemap_write,
    )

    sf1 = "/root/repo/.scale/sf1"
    if not os.path.exists(os.path.join(sf1, "orders.parquet")):
        _pytest.skip("sf1 tiled dataset not generated (tools/gen_scale.py)")
    orders = spark.read.parquet(os.path.join(sf1, "orders.parquet")).select(
        "o_orderkey", F.col("o_totalprice").cast("double").alias("o_totalprice")
    )
    path = str(tmp_path / "zm_sf1")
    zonemap_write(orders, path, "o_totalprice", n_files=32)

    lo, hi = 400000.0, 420000.0
    stats = spark.read.parquet(path + "/zonestats").collect()
    hit = {
        r["file"] for r in stats if r["zmin"] <= hi and r["zmax"] >= lo
    }
    assert 1 <= len(hit) <= 6 < len(stats)  # pruning is real at this SF
    for r in stats:
        if r["file"] not in hit:
            local = r["file"].replace("file://", "").replace("file:", "")
            with open(local, "wb") as fh:
                fh.write(b"NOT A PARQUET FILE")  # poison pruned files

    df, n_hit, n_total = zonemap_pruned_read(spark, path, "o_totalprice", lo, hi)
    assert (n_hit, n_total) == (len(hit), len(stats))
    want = orders.where(
        (F.col("o_totalprice") >= lo) & (F.col("o_totalprice") <= hi)
    )
    assert df.count() == want.count()
    got = {r["o_orderkey"] for r in df.collect()}
    exp = {r["o_orderkey"] for r in want.collect()}
    assert got == exp  # exact answer despite every pruned file being garbage
