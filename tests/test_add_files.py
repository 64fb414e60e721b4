"""add_files: zero-copy adoption of external parquet into the manifest
table (Iceberg's add_files/migrate shape). Reference parity: none
(SURVEY §1.4); the public spec matched is Iceberg's add_files procedure
with the shallow-clone ownership contract for maintenance."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from gridmr_spark.sources.table_format import ManifestTable


def _external(spark, tmp_path, name, rows):
    d = str(tmp_path / name)
    spark.createDataFrame(rows, "k long, v string").coalesce(1).write.parquet(d)
    import glob

    return sorted(glob.glob(os.path.join(d, "*.parquet")))


def test_adopt_by_reference_with_stats(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string").coalesce(1)
    )
    ext = _external(spark, tmp_path, "ext", [(100, "x"), (101, "y")])
    v = t.add_files(spark, ext)
    # BY REFERENCE: the external paths appear verbatim in the manifest
    assert set(ext) <= set(t._manifest(v)["files"])
    got = sorted((r.k, r.v) for r in t.read(spark).collect())
    assert got == [(1, "a"), (2, "b"), (100, "x"), (101, "y")]
    # footer stats ride in: the adopted cohort prunes
    kept = t.pruned_files("k", 100, 200)
    assert set(kept) == set(ext)
    # metadata aggregates stay exact (row counts from footers)
    meta = t.metadata_agg()
    assert meta["n_rows"] == 4 and meta["columns"]["k"] == [1, 101]
    # incremental read sees the adoption as an ordinary append
    d = t.diff(spark, v - 1, v)
    assert sorted(r.k for r in d.collect()) == [100, 101]


def test_maintenance_never_touches_external_files(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit(spark.createDataFrame([(1, "a")], "k long, v string"))
    ext = _external(spark, tmp_path, "ext", [(9, "z")])
    t.add_files(spark, ext)
    # rewrite everything into table-owned files (the migration end-state)
    t.compact(spark)
    t.expire(keep_last=1)
    t.vacuum_orphans(min_age_seconds=0)
    for p in ext:
        assert os.path.exists(p), "external file deleted by maintenance"
    got = sorted(r.k for r in t.read(spark).collect())
    assert got == [1, 9]


def test_adopt_guards(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit(spark.createDataFrame([(1, "a")], "k long, v string"))
    ext = _external(spark, tmp_path, "ext", [(9, "z")])
    t.add_files(spark, ext)
    with pytest.raises(ValueError, match="double adoption"):
        t.add_files(spark, ext)
    with pytest.raises(ValueError, match="duplicate paths"):
        t.add_files(spark, [str(tmp_path / "x.parquet")] * 2)
    with pytest.raises(ValueError, match="no paths"):
        t.add_files(spark, [])
    fid = ManifestTable(str(tmp_path / "fid"))
    fid.commit(spark.createDataFrame([(1, "a")], "k long, v string"), field_ids=True)
    with pytest.raises(ValueError, match="field-ids"):
        fid.add_files(spark, _external(spark, tmp_path, "ext2", [(5, "q")]))
    # idempotent retry returns the same version
    ext3 = _external(spark, tmp_path, "ext3", [(7, "w")])
    v1 = t.add_files(spark, ext3, idempotency_key="adopt-7")
    import glob as _glob

    assert t.add_files(spark, ext3, idempotency_key="adopt-7") == v1


def test_adopt_into_partitioned_table_reads_exact(spark, tmp_path):
    """Adopted files carry no __pt: partition reads fall to the computed
    residual for them and stay EXACT; the table's own cohort still
    prunes by metadata."""
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit(
        spark.range(40).selectExpr("id as k", "concat('v', id) as v"),
        partition_by="k % 4",
    )
    ext = _external(spark, tmp_path, "ext", [(101, "e1"), (102, "e2")])
    t.add_files(spark, ext)
    assert t.partition_spec() == "k % 4"  # spec carried across the adopt
    exact, resid = t.pruned_files(preds={"__pt": (1, 1)}, _split=True)
    assert set(resid) == set(ext)
    got = sorted(r.k for r in t.read_pruned(spark, preds={"__pt": (1, 1)}).collect())
    assert got == [k for k in range(40) if k % 4 == 1] + [101]


def test_adopted_rows_flow_through_changefeed_and_stream(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit(spark.createDataFrame([(1, "a")], "k long, v string"))
    ext = _external(spark, tmp_path, "ext", [(9, "z")])
    v = t.add_files(spark, ext)
    feed = t.changefeed(spark, v - 1, v)
    assert sorted((r["_op"], r.k) for r in feed.collect()) == [("I", 9)]
