"""Column RENAME via stable field IDs (round 14 stretch): the manifest
tracks an id<->name mapping, every data file carries ``PARQUET:field_id``
per column (Spark's fieldId writers/readers), and rename_column is a
metadata-only snapshot — old cohorts resolve by ID under the current
names. Public specs matched: Iceberg schema evolution (rename by field
id) and Spark SPARK-38094/parquet field-id read support. Reference
parity: none (SURVEY §1.4)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from gridmr_spark.sources.table_format import (
    ManifestTable,
    register_changelog_source,
)


def _mk(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k int, name string, n int"
        ),
        field_ids=True,
    )
    return t


def test_rename_is_metadata_only_and_versioned(spark, tmp_path):
    t = _mk(spark, tmp_path)
    files_before = list(t._manifest(1)["files"])
    v = t.rename_column("name", "title")
    assert t._manifest(v)["files"] == files_before  # zero data movement
    assert list(t.column_ids()) == ["k", "title", "n"]
    got = sorted((r.k, r.title, r.n) for r in t.read(spark).collect())
    assert got == [(1, "a", 10), (2, "b", 20), (3, "c", 30)]
    # time travel reads the PRE-RENAME name
    assert t.read(spark, 1).columns == ["k", "name", "n"]


def test_rename_composes_with_widening_and_add_column(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.rename_column("name", "title")
    t.commit(
        spark.createDataFrame(
            [(3_000_000_000, "d", 40, 0.5)], "k long, title string, n int, w double"
        )
    )
    df = t.read(spark, merge_schema=True)
    assert df.schema.simpleString() == (
        "struct<k:bigint,title:string,n:int,w:double>"
    )
    got = sorted((r.k, r.title, r.n, r.w) for r in df.collect())
    assert got == [
        (1, "a", 10, None), (2, "b", 20, None), (3, "c", 30, None),
        (3_000_000_000, "d", 40, 0.5),
    ]
    # plain (non-merged) read is ALSO correct on a renamed table
    got2 = sorted((r.k, r.title) for r in t.read(spark).collect())
    assert [g[1] for g in got2] == ["a", "b", "c", "d"]


def test_rewrite_verbs_and_changefeed_cross_renames(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v_pre = t.current_version()
    t.rename_column("name", "title")
    t.delete_where(spark, F.col("title") == "a")        # predicate on NEW name
    t.merge_by_key(
        spark,
        spark.createDataFrame([(2, "B", 21), (9, "z", 90)], "k int, title string, n int"),
        "k",
    )
    got = sorted((r.k, r.title, r.n) for r in t.read(spark).collect())
    assert got == [(2, "B", 21), (3, "c", 30), (9, "z", 90)]
    # changefeed across the rename emits under the CURRENT names
    feed = t.changefeed(spark, v_pre, t.current_version())
    rows = sorted((r["_op"], r.k, r.title) for r in feed.collect())
    assert rows == [
        ("D", 1, "a"), ("D", 2, "b"), ("I", 2, "B"), ("I", 9, "z")
    ]
    # diff may CROSS the rename (zero rows of its own)
    t2 = ManifestTable(str(tmp_path / "t2"))
    t2.commit(spark.createDataFrame([(1, "x")], "k int, v string"), field_ids=True)
    rv = t2.rename_column("v", "val")
    t2.commit(spark.createDataFrame([(2, "y")], "k int, val string"))
    d = t2.diff(spark, 1, rv + 1)
    assert [(r.k, r.val) for r in d.collect()] == [(2, "y")]


def test_rename_guards(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.rename_column("name", "title")
    # retired names never recycle — as a commit column or a rename target
    with pytest.raises(ValueError, match="RETIRED"):
        t.commit(spark.createDataFrame([(9, "x", 1)], "k int, name string, n int"))
    with pytest.raises(ValueError, match="RETIRED"):
        t.rename_column("title", "name")
    with pytest.raises(ValueError, match="no column"):
        t.rename_column("nope", "x")
    with pytest.raises(ValueError, match="already"):
        t.rename_column("title", "n")
    with pytest.raises(ValueError, match="reserved"):
        t.rename_column("title", "__pt")
    # non-field-ids table refuses
    plain = ManifestTable(str(tmp_path / "plain"))
    plain.commit(spark.createDataFrame([(1, "a")], "k int, v string"))
    with pytest.raises(ValueError, match="field-ids"):
        plain.rename_column("v", "w")
    # field_ids can only be enabled on the FIRST commit
    with pytest.raises(ValueError, match="FIRST"):
        plain.commit(
            spark.createDataFrame([(2, "b")], "k int, v string"), field_ids=True
        )
    # renaming a column the partition spec references refuses
    pt = ManifestTable(str(tmp_path / "pt"))
    pt.commit(
        spark.range(10).selectExpr("id as k", "id % 2 as g"),
        field_ids=True,
        partition_by="g",
    )
    with pytest.raises(ValueError, match="partition spec"):
        pt.rename_column("g", "grp")
    pt.rename_column("k", "key")  # un-referenced column renames fine


def test_pruned_read_after_rename_is_exact(spark, tmp_path):
    """Stats of pre-rename cohorts are keyed by the as-written name;
    group `cols` stamps translate a current-name predicate to that key
    through the shared field id — so BOTH cohorts prune (skip-count
    asserted), and the result is exact. metadata_agg translates the
    same way, keeping MIN/MAX exact across the rename."""
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit(
        spark.range(100)
        .selectExpr("CAST(id AS INT) k", "id * 2 n")
        .repartitionByRange(4, "n"),
        field_ids=True,
    )
    t.rename_column("n", "metric")
    t.commit(
        spark.range(100, 200)
        .selectExpr("CAST(id AS INT) k", "id * 2 metric")
        .repartitionByRange(4, "metric")
    )
    all_files = t._manifest(t.current_version())["files"]
    old_files = set(t._manifest(1)["files"])
    kept = set(t.pruned_files("metric", 100, 240))
    # BOTH cohorts pruned: strictly fewer files kept on each side
    assert 0 < len(kept & old_files) < len(old_files)
    assert 0 < len(kept - old_files) < len(set(all_files) - old_files)
    got = sorted(
        r.k for r in t.read_pruned(spark, "metric", 100, 240).collect()
    )
    assert got == list(range(50, 121))
    # metadata MIN/MAX exact across the rename (translated per cohort)
    meta = t.metadata_agg()
    assert meta["columns"]["metric"] == [0, 398]
    assert meta["n_rows"] == 200


def test_changelog_stream_across_rename(spark, tmp_path):
    """The stream declares the CURRENT names (footer union folded by
    field id); pre-rename files' old-named columns feed them at the
    reader, and the signed fold reproduces the snapshot."""
    t = _mk(spark, tmp_path)
    t.rename_column("name", "title")
    t.commit(spark.createDataFrame([(4, "d", 40)], "k int, title string, n int"))
    t.delete_where(spark, F.col("title") == "b")
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
    assert set(feed.columns) == {"k", "title", "n", "_op"}
    folded = sorted(
        (r.k, r.title, r.n)
        for r in feed.withColumn(
            "s", F.when(F.col("_op") == "I", 1).otherwise(-1)
        )
        .groupBy("k", "title", "n")
        .agg(F.sum("s").alias("c"))
        .where("c != 0")
        .select("k", "title", "n")
        .collect()
    )
    want = sorted((r.k, r.title, r.n) for r in t.read(spark).collect())
    assert folded == want


def test_refs_and_clone_carry_the_mapping(spark, tmp_path):
    """Branch/WAP/clone/restore carry the column mapping like the
    partition spec: a branch cut after a rename writes under the renamed
    mapping, and the published/cloned/restored snapshots read exactly."""
    t = _mk(spark, tmp_path)
    t.rename_column("name", "title")
    b = t.create_branch("wap")
    b.commit(spark.createDataFrame([(7, "g", 70)], "k int, title string, n int"))
    assert sorted(r.title for r in b.read(spark).collect()) == ["a", "b", "c", "g"]
    t.publish_branch("wap")
    assert sorted(r.title for r in t.read(spark).collect()) == ["a", "b", "c", "g"]
    c = t.clone_to(str(tmp_path / "clone"))
    assert sorted(r.title for r in c.read(spark).collect()) == ["a", "b", "c", "g"]
    rv = t.restore(2)  # the rename snapshot's content, current names
    assert sorted(r.title for r in t.read(spark, rv).collect()) == ["a", "b", "c"]


def test_drop_column_is_metadata_only(spark, tmp_path):
    """DROP COLUMN: one metadata snapshot, zero data movement; reads stop
    projecting it, time travel still shows it, a new column never reuses
    the dropped field id, and the dropped NAME is retired."""
    t = _mk(spark, tmp_path)
    files_before = list(t._manifest(1)["files"])
    v = t.drop_column("name")
    assert t._manifest(v)["files"] == files_before
    assert list(t.column_ids()) == ["k", "n"]
    got = sorted((r.k, r.n) for r in t.read(spark).collect())
    assert got == [(1, 10), (2, 20), (3, 30)]
    assert "name" not in t.read(spark).columns
    assert t.read(spark, 1).columns == ["k", "name", "n"]  # time travel
    # new column takes a FRESH id (dropped id 2 never reused)
    t.commit(spark.createDataFrame([(4, 40, 0.5)], "k int, n int, w double"))
    assert t.column_ids()["w"] == 4
    df = t.read(spark, merge_schema=True)
    got = sorted((r.k, r.n, r.w) for r in df.collect())
    assert got == [(1, 10, None), (2, 20, None), (3, 30, None), (4, 40, 0.5)]
    # retired name never recycles; guards
    import pytest as _pytest

    with _pytest.raises(ValueError, match="RETIRED"):
        t.commit(spark.createDataFrame([(9, 9, 0.1, "x")], "k int, n int, w double, name string"))
    with _pytest.raises(ValueError, match="no column"):
        t.drop_column("name")
    plain = ManifestTable(str(tmp_path / "plain"))
    plain.commit(spark.createDataFrame([(1, "a")], "k int, v string"))
    with _pytest.raises(ValueError, match="field-ids"):
        plain.drop_column("v")


def test_drop_then_rename_compose_and_verbs_work(spark, tmp_path):
    """drop + rename in one history: rewrite verbs, changefeed, diff and
    the stream all operate under the final shape."""
    t = _mk(spark, tmp_path)
    t.drop_column("n")                                   # v2
    t.rename_column("name", "title")                     # v3
    t.commit(spark.createDataFrame([(4, "d")], "k int, title string"))  # v4
    t.delete_where(spark, F.col("title") == "a")         # v5 COW across all
    got = sorted((r.k, r.title) for r in t.read(spark).collect())
    assert got == [(2, "b"), (3, "c"), (4, "d")]
    feed = t.changefeed(spark, 1, t.current_version())
    rows = sorted((r["_op"], r.k, r.title) for r in feed.collect())
    assert rows == [("D", 1, "a"), ("I", 4, "d")]
    d = t.diff(spark, 3, 4)  # crosses nothing; plain append under new shape
    assert [(r.k, r.title) for r in d.collect()] == [(4, "d")]
    # the last-column and spec guards
    import pytest as _pytest

    with _pytest.raises(ValueError, match="last column"):
        t.drop_column("title"), t.drop_column("k")
    pt = ManifestTable(str(tmp_path / "pt"))
    pt.commit(
        spark.range(10).selectExpr("id as k", "id % 2 as g"),
        field_ids=True, partition_by="g",
    )
    with _pytest.raises(ValueError, match="partition spec"):
        pt.drop_column("g")


def test_stream_across_drop(spark, tmp_path):
    """The changelog stream's declared shape excludes the dropped column;
    pre-drop files' extra bytes are never decoded; fold == snapshot."""
    t = _mk(spark, tmp_path)
    t.drop_column("name")
    t.commit(spark.createDataFrame([(4, 40)], "k int, n int"))
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
    assert set(feed.columns) == {"k", "n", "_op"}
    got = sorted((r.k, r.n) for r in feed.where("_op = 'I'").collect())
    assert got == [(1, 10), (2, 20), (3, 30), (4, 40)]


def test_full_rewrite_restores_plain_read_path(spark, tmp_path):
    """compact()/replace() rewrite every file under the current names, so
    the by-ID read flag clears — plain scans are correct again — while
    retired names and dropped ids stay protected."""
    t = _mk(spark, tmp_path)
    t.rename_column("name", "title")
    t.drop_column("n")
    v = t.compact(spark)
    raw = t._raw(v)
    assert raw.get("renamed_ever") is False
    assert "name" in raw.get("retired_columns", [])
    got = sorted((r.k, r.title) for r in t.read(spark).collect())
    assert got == [(1, "a"), (2, "b"), (3, "c")]
    # retired/dropped discipline outlives the rewrite
    import pytest as _pytest

    with _pytest.raises(ValueError, match="RETIRED"):
        t.commit(spark.createDataFrame([(9, "x", "y")], "k int, title string, name string"))
    t.commit(spark.createDataFrame([(4, "d", 1.0)], "k int, title string, w double"))
    assert t.column_ids()["w"] == 4  # dropped id 3 still never reused


def test_restore_resurrects_renamed_name_and_verbs_work(spark, tmp_path):
    """RESTORE to a pre-rename snapshot brings the old column name back
    under its ORIGINAL field id (the restored manifest carries that
    snapshot's columns mapping), so later writes under that name are NOT
    recycled-name hazards and must be accepted — the Hypothesis model
    test's rename -> restore -> compact falsifying sequence. A retired
    name that is NOT live keeps being refused."""
    import pytest as _pytest

    t = _mk(spark, tmp_path)
    id_before = t.column_ids()["name"]
    t.rename_column("name", "title")
    t.restore(1)
    assert t.column_ids()["name"] == id_before  # same stable id, live again
    # the full-rewrite verb re-commits the restored names: must succeed
    t.compact(spark, target_partitions=2)
    got = sorted((r.k, r.name, r.n) for r in t.read(spark).collect())
    assert got == [(1, "a", 10), (2, "b", 20), (3, "c", 30)]
    # appends under the resurrected name also work, same id
    t.commit(spark.createDataFrame([(4, "d", 40)], "k int, name string, n int"))
    assert t.column_ids()["name"] == id_before
    # a retired name that is NOT live stays refused: rename again, then
    # try to append under the now-dead 'name' without restoring
    t.rename_column("name", "title2")
    with _pytest.raises(ValueError, match="RETIRED"):
        t.commit(spark.createDataFrame([(9, "x", 1)], "k int, name string, n int"))
