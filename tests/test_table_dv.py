"""Merge-on-read deletion vectors (delete_where(mode='dv')): zero data
movement on delete, exact reads everywhere (read / pruned / SQL /
changefeed / CDC stream / metadata), DV compaction through partial
rewrites, materialization on compact, GC of expired DV files."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from gridmr_spark.sources.table_format import ManifestTable


def _mk(spark, tmp_path, n=200, files=4):
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit(
        spark.range(n)
        .selectExpr("id as k", "concat('v', id) as v")
        .repartition(files)
    )
    return t


def _ks(df):
    return sorted(r.k for r in df.collect())


def test_dv_delete_moves_no_data_and_reads_exactly(spark, tmp_path):
    t = _mk(spark, tmp_path)
    before_files = t._manifest(1)["files"]
    v = t.delete_where(spark, F.col("k") % 10 == 3, mode="dv")
    assert v == 2
    # zero data movement: the file set is IDENTICAL
    assert t._manifest(2)["files"] == before_files
    assert t._raw(2)["operation"] == "delete_dv"
    assert _ks(t.read(spark)) == [k for k in range(200) if k % 10 != 3]
    # time travel unaffected
    assert _ks(t.read(spark, 1)) == list(range(200))
    # exact live deleted-row count in the manifest
    assert t._dv(2)["rows"] == 20


def test_dv_deletes_accumulate_and_appends_carry(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.delete_where(spark, F.col("k") == 7, mode="dv")
    t.delete_where(spark, F.col("k") == 8, mode="dv")
    assert t._dv(3)["rows"] == 2
    t.commit(spark.createDataFrame([(1000, "x")], "k long, v string"))
    assert _ks(t.read(spark)) == [k for k in range(200) if k not in (7, 8)] + [1000]
    # a second dv delete never re-records an already-deleted row
    t.delete_where(spark, F.col("k").isin(7, 9), mode="dv")
    assert t._dv(t.current_version())["rows"] == 3


def test_dv_no_match_publishes_clean_metadata_version(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v = t.delete_where(spark, F.col("k") == 10_000, mode="dv")
    assert t._dv(v)["rows"] == 0 and t._dv(v)["files"] == []
    assert _ks(t.read(spark)) == list(range(200))


def test_partial_cow_verbs_never_resurrect_dv_rows_and_compact_dv(spark, tmp_path):
    # key-clustered layout: one file per 100-key range, so partial COW
    # actually carries files (an unclustered layout would touch every
    # file and correctly materialize the whole DV set away)
    t = ManifestTable(str(tmp_path / "tbl"))
    for lo in (0, 100):
        t.commit(
            spark.range(lo, lo + 100)
            .selectExpr("id as k", "concat('v', id) as v")
            .coalesce(1)
        )
    t.delete_where(spark, F.col("k") % 10 == 3, mode="dv")          # v3 dv
    # COW delete confined to the HIGH file: the low file carries, and
    # its dv'd rows must stay gone
    t.delete_where(spark, F.col("k") == 150)                         # v4 cow
    assert _ks(t.read(spark)) == [
        k for k in range(200) if k % 10 != 3 and k != 150
    ]
    # the DV set was compacted: low-file entries carried (10), the
    # rewritten high file's entries re-materialized into its rewrite
    assert t._dv(4)["rows"] == 10
    # merge: updates on dv'd keys re-INSERT them (update-wins semantics)
    ups = spark.createDataFrame([(3, "UP"), (113, "UP")], "k long, v string")
    t.merge_by_key(spark, ups, "k")                                  # v5
    got = {r.k: r.v for r in t.read(spark).collect()}
    assert got[3] == "UP" and got[113] == "UP"
    assert 23 not in got and 123 not in got and 150 not in got


def test_compact_materializes_dv(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.delete_where(spark, F.col("k") < 50, mode="dv")
    v = t.compact(spark, target_partitions=2)
    assert t._dv(v)["files"] == []
    assert _ks(t.read(spark, v)) == list(range(50, 200))
    # metadata min/max come back after materialization
    agg = t.metadata_agg(v)
    assert agg["n_rows"] == 150 and agg["columns"]["k"] == [50, 199]


def test_compact_small_applies_and_compacts_dv(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit(
        spark.range(1000).selectExpr("id as k", "concat('v', id) as v").coalesce(1)
    )
    t.commit(spark.createDataFrame([(2000, "a"), (2001, "b")], "k long, v string").coalesce(1))
    t.delete_where(spark, F.col("k").isin(5, 2000), mode="dv")
    v = t.compact_small(spark, small_mb=0.005)
    got = _ks(t.read(spark, v))
    assert 5 not in got and 2000 not in got and 2001 in got
    # entry against the packed (small) file materialized away; entry
    # against the carried healthy file survives, count exact
    assert t._dv(v)["rows"] == 1


def test_metadata_agg_dv_aware_minmax(spark, tmp_path):
    """Round 13 (was: blanket unknown): MIN/MAX stay exact per column
    when the deleted rows' observed envelope is strictly inside the
    table's; a column whose extreme may have been deleted is omitted."""
    t = _mk(spark, tmp_path)
    t.delete_where(spark, F.col("k") >= 150, mode="dv")
    agg = t.metadata_agg()
    assert agg["n_rows"] == 150
    # k's max (199) was deleted -> unknown; v's extremes ("v0"/"v99" by
    # string order, i.e. k=0 and k=99) are both live -> still exact
    assert "k" not in agg["columns"]
    assert agg["columns"]["v"] == ["v0", "v99"]


def test_metadata_agg_exact_through_interior_dv_history(spark, tmp_path):
    """A history of interior DV deletes never degrades MIN/MAX; deleting
    an extreme degrades exactly that column side's column; materializing
    restores it."""
    t = _mk(spark, tmp_path)                               # k in [0,199]
    t.delete_where(spark, F.col("k").between(50, 59), mode="dv")
    t.delete_where(spark, F.col("k") == 120, mode="dv")
    agg = t.metadata_agg()
    assert agg["n_rows"] == 189
    assert agg["columns"]["k"] == [0, 199]                 # extremes live
    t.delete_where(spark, F.col("k") == 0, mode="dv")      # kill the min
    agg = t.metadata_agg()
    assert agg["n_rows"] == 188
    assert "k" not in agg["columns"]
    t.materialize_dv(spark, target_rows=0)                 # retire the DVs
    agg = t.metadata_agg()
    assert agg["n_rows"] == 188
    assert agg["columns"]["k"] == [1, 199]                 # re-derived exact


def test_read_pruned_and_sql_view_apply_dv(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit(
        spark.range(1000).selectExpr("id as k", "concat('u', id) as s"),
        bloom_cols=["k"],
    )
    t.delete_where(spark, F.col("k") == 123, mode="dv")
    assert t.read_pruned(spark, "k", 100, 130).count() == 30  # 123 gone
    assert t.read_pruned(spark, point={"k": 123}).count() == 0
    t.sql_view(spark, "dv_view")
    assert spark.sql("SELECT COUNT(*) c FROM dv_view").first().c == 999


def test_changefeed_exact_across_dv_delete_and_restore(spark, tmp_path):
    t = _mk(spark, tmp_path, n=100, files=2)
    t.delete_where(spark, F.col("k").isin(5, 6), mode="dv")   # v2
    feed = t.changefeed(spark, 1, 2)
    rows = sorted((r["_op"], r.k) for r in feed.collect())
    assert rows == [("D", 5), ("D", 6)]
    # restore to pre-dv: the rows come back as inserts
    t.restore(1)                                              # v3
    rows = sorted((r["_op"], r.k) for r in t.changefeed(spark, 2, 3).collect())
    assert rows == [("I", 5), ("I", 6)]
    # and the whole range nets to nothing
    assert t.changefeed(spark, 1, 3).count() == 0
    # mixed: dv delete + append in one range
    t.delete_where(spark, F.col("k") == 7, mode="dv")         # v4
    t.commit(spark.createDataFrame([(500, "x")], "k long, v string"))  # v5
    rows = sorted((r["_op"], r.k) for r in t.changefeed(spark, 3, 5).collect())
    assert rows == [("D", 7), ("I", 500)]


def test_changefeed_vs_full_compare_with_dv_and_rewrite(spark, tmp_path):
    """Hash-equality of the lineage feed against the unbounded
    snapshot-vs-snapshot compare on a history mixing DV deletes, a COW
    delete, and appends."""
    t = _mk(spark, tmp_path, n=300, files=3)
    t.delete_where(spark, F.col("k") % 7 == 0, mode="dv")   # v2
    t.commit(spark.createDataFrame([(900, "x")], "k long, v string"))  # v3
    t.delete_where(spark, F.col("k") % 11 == 1)             # v4 cow (partial)
    feed = t.changefeed(spark, 1, 4)
    got = sorted((r["_op"], r.k, r.v) for r in feed.collect())
    new, old = t.read(spark, 4), t.read(spark, 1)
    want = sorted(
        [("I", r.k, r.v) for r in new.exceptAll(old).collect()]
        + [("D", r.k, r.v) for r in old.exceptAll(new).collect()]
    )
    assert got == want


def test_cdc_stream_exact_across_dv_history(spark, tmp_path):
    from gridmr_spark.sources.table_format import register_changelog_source

    t = _mk(spark, tmp_path, n=100, files=2)
    t.delete_where(spark, F.col("k").isin(3, 4), mode="dv")        # v2
    t.commit(spark.createDataFrame([(700, "x")], "k long, v string"))  # v3
    t.delete_where(spark, F.col("k") == 5)                          # v4 cow
    t.restore(2)                                                    # v5

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
    folded = (
        feed.withColumn("w", F.when(F.col("_op") == "I", 1).otherwise(-1))
        .groupBy("k", "v")
        .agg(F.sum("w").alias("n"))
        .where(F.col("n") != 0)
    )
    got = sorted((r.k, r.v, r.n) for r in folded.collect())
    want = sorted((r.k, r.v, 1) for r in t.read(spark).collect())
    assert got == want


def test_expire_reclaims_dropped_dv_files_keeps_live(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.delete_where(spark, F.col("k") == 1, mode="dv")   # v2
    t.delete_where(spark, F.col("k") == 2, mode="dv")   # v3
    live = {os.path.realpath(p) for p in t._dv(3)["files"]}
    all_dv = {
        os.path.realpath(p)
        for p in glob.glob(os.path.join(t.root, "_deletes", "dv-*", "*.parquet"))
    }
    assert live <= all_dv
    t.compact(spark, target_partitions=1)               # v4 materializes
    t.expire(keep_last=1)
    left = {
        os.path.realpath(p)
        for p in glob.glob(os.path.join(t.root, "_deletes", "dv-*", "*.parquet"))
    }
    assert left == set()                                 # nothing references DVs now
    assert _ks(t.read(spark)) == [k for k in range(200) if k not in (1, 2)]


def test_branch_and_wap_carry_dv(spark, tmp_path):
    t = _mk(spark, tmp_path, n=50, files=1)
    t.delete_where(spark, F.col("k") == 9, mode="dv")
    b = t.create_branch("audit")
    assert _ks(b.read(spark)) == [k for k in range(50) if k != 9]
    b.commit(spark.createDataFrame([(100, "x")], "k long, v string"))
    v = t.publish_branch("audit")
    assert _ks(t.read(spark, v)) == [k for k in range(50) if k != 9] + [100]


def test_dv_mode_rejects_unknown(spark, tmp_path):
    t = _mk(spark, tmp_path, n=10, files=1)
    with pytest.raises(ValueError, match="cow|dv"):
        t.delete_where(spark, F.col("k") == 1, mode="nope")


def test_clone_carries_dv_and_detaches_on_compact(spark, tmp_path):
    t = _mk(spark, tmp_path, n=60, files=2)
    t.delete_where(spark, F.col("k") < 10, mode="dv")
    c = t.clone_to(str(tmp_path / "clone"))
    assert _ks(c.read(spark)) == list(range(10, 60))
    v = c.compact(spark, target_partitions=1)
    assert c._dv(v)["files"] == []              # materialized, detached
    assert _ks(c.read(spark)) == list(range(10, 60))
    # source untouched
    assert _ks(t.read(spark)) == list(range(10, 60))


def test_expire_never_touches_unreferenced_inflight_dv(spark, tmp_path):
    """expire()'s DV sweep mirrors the data-file rule: only DV files a
    DROPPED manifest referenced are reclaimed. A dv-* file on disk but in
    no manifest is indistinguishable from an in-flight delete_where(dv)
    whose publish hasn't landed yet — deleting it would let that publish
    succeed against missing files (ADVICE r12)."""
    import shutil

    t = _mk(spark, tmp_path, n=100, files=2)
    t.delete_where(spark, F.col("k") == 3, mode="dv")      # v2, real DV
    t.commit(spark.createDataFrame([(500, "x")], "k long, v string"))  # v3
    # simulate the in-flight racer: a DV parquet written, manifest not yet
    # published — copy the real DV's bytes under a fresh dv-* name
    real_part = t._dv(t.current_version())["files"][0]
    inflight = os.path.join(t.root, "_deletes", "dv-v99999-inflight")
    os.makedirs(inflight)
    shutil.copy(real_part, os.path.join(inflight, "part-00000.parquet"))
    lone = os.path.join(t.root, "_deletes", "dv-v99998-lonefile")
    shutil.copy(real_part, lone)
    t.expire(keep_last=1)
    # live DV survives, reads stay exact
    assert _ks(t.read(spark)) == [k for k in range(100) if k != 3] + [500]
    # the unreferenced (in-flight-shaped) DV artifacts were NOT swept
    assert os.path.exists(os.path.join(inflight, "part-00000.parquet"))
    assert os.path.exists(lone)


def test_expire_reclaims_dv_referenced_only_by_dropped_manifests(spark, tmp_path):
    """The positive half of the dropped-manifest rule: once a rewrite
    materializes the DV set and expire drops every manifest that
    referenced it, the DV files ARE reclaimed."""
    t = _mk(spark, tmp_path, n=100, files=2)
    t.delete_where(spark, F.col("k") == 3, mode="dv")      # v2 references DV
    dv_parts = set(t._dv(2)["files"])
    assert dv_parts
    t.compact(spark, target_partitions=1)                  # v3, DV materialized
    t.expire(keep_last=1)                                  # drops v1, v2
    for p in dv_parts:
        assert not os.path.exists(p)
    assert _ks(t.read(spark)) == [k for k in range(100) if k != 3]


def test_cow_delete_null_condition_keeps_rows_layout_independent(spark, tmp_path):
    """DELETE ... WHERE cond removes rows where cond is TRUE; a NULL
    condition keeps the row (SQL three-valued semantics). Before the r13
    fix, partial COW dropped NULL-cond rows from REWRITTEN files while
    carrying them forward in untouched files — result depended on
    physical layout and diverged from DV mode (ADVICE r12)."""
    rows = [(0, 10), (1, None), (2, 3), (3, None), (4, 20)]
    cond = F.col("x") < 5  # TRUE for k=2 only; NULL for k=1,3

    t_cow = ManifestTable(str(tmp_path / "cow"))
    # one file holds the TRUE match AND a NULL row; another holds only NULLs
    df = spark.createDataFrame(rows, "k long, x long").repartition(2, "k")
    t_cow.commit(df)
    t_cow.delete_where(spark, cond, mode="cow")
    t_dv = ManifestTable(str(tmp_path / "dv"))
    t_dv.commit(df)
    t_dv.delete_where(spark, cond, mode="dv")

    expect = [0, 1, 3, 4]  # only k=2 (cond TRUE) deleted
    assert _ks(t_cow.read(spark)) == expect
    assert _ks(t_dv.read(spark)) == expect


def test_dv_zero_row_parts_reclaimed_at_write(spark, tmp_path):
    """Zero-row DV part files are never referenced by any manifest, so
    the dropped-manifest expire rule can't reach them — they must be
    removed at write time (ADVICE r12); a no-match delete leaves no
    dv directory at all."""
    t = _mk(spark, tmp_path, n=200, files=8)
    t.delete_where(spark, F.col("k") == 7, mode="dv")   # 1 match, 8 partitions
    on_disk = {
        os.path.realpath(p)
        for p in glob.glob(os.path.join(t.root, "_deletes", "dv-*", "*.parquet"))
    }
    referenced = {os.path.realpath(p) for p in t._dv(t.current_version())["files"]}
    assert on_disk == referenced and len(on_disk) >= 1
    before_dirs = set(glob.glob(os.path.join(t.root, "_deletes", "dv-*")))
    t.delete_where(spark, F.col("k") == 10_000, mode="dv")  # no match
    assert set(glob.glob(os.path.join(t.root, "_deletes", "dv-*"))) == before_dirs


# -- DV growth discipline (round 13): materialize_dv + dv_max_rows ----------


def test_materialize_dv_rewrites_only_heaviest_files(spark, tmp_path):
    """Targeted MOR->COW conversion: greedy heaviest-first selection down
    to target_rows; lightly-hit files keep their (small) DVs and are NOT
    rewritten — write amplification tracks the deletes being retired."""
    t = ManifestTable(str(tmp_path / "tbl"))
    a = spark.range(100).selectExpr("id as k", "concat('v', id) as v").coalesce(1)
    b = spark.range(100, 200).selectExpr("id as k", "concat('v', id) as v").coalesce(1)
    t.commit(a)                                            # v1: file A
    t.commit(b)                                            # v2: files A,B
    t.delete_where(spark, F.col("k") < 10, mode="dv")      # 10 hits in A
    t.delete_where(spark, F.col("k") == 150, mode="dv")    # 1 hit in B
    base = t.current_version()
    file_a = t._manifest(1)["files"][0]
    file_b = [f for f in t._manifest(base)["files"] if f != file_a][0]
    v = t.materialize_dv(spark, target_rows=2)
    assert v == base + 1
    files_now = set(t._manifest(v)["files"])
    assert file_a not in files_now          # heaviest file rewritten
    assert file_b in files_now              # lightly-hit file carried verbatim
    assert t._dv(v)["rows"] == 1            # B's single DV entry survives
    assert t._raw(v)["operation"] == "overwrite"
    assert _ks(t.read(spark)) == [k for k in range(10, 200) if k != 150]
    # already under target -> no-op
    assert t.materialize_dv(spark, target_rows=2) is None


def test_dv_delete_auto_materializes_past_ceiling(spark, tmp_path):
    """A DV delete that leaves more than dv_max_rows live positions
    auto-materializes down to half the ceiling — the broadcast read path
    is bounded no matter how many small deletes accumulate."""
    t = _mk(spark, tmp_path, n=200, files=4)
    t.dv_max_rows = 10
    for lo in (0, 20, 40):                    # 3 deletes of 5 rows: 15 > 10
        t.delete_where(spark, F.col("k").between(lo, lo + 4), mode="dv")
    v = t.current_version()
    assert t._dv(v)["rows"] <= 5              # ceiling // 2
    assert t._raw(v)["operation"] == "overwrite"   # the auto-materialize
    gone = {k for lo in (0, 20, 40) for k in range(lo, lo + 5)}
    assert _ks(t.read(spark)) == [k for k in range(200) if k not in gone]
    # further deletes under the ceiling stay pure metadata
    v2 = t.delete_where(spark, F.col("k") == 100, mode="dv")
    assert t._raw(v2)["operation"] == "delete_dv"


def test_changefeed_exact_across_materialize_dv(spark, tmp_path):
    """Incremental readers cross a materialize like any partial rewrite:
    the feed over a range containing it equals the unbounded
    snapshot-vs-snapshot compare."""
    t = _mk(spark, tmp_path, n=120, files=3)
    t.delete_where(spark, F.col("k") % 5 == 0, mode="dv")   # v2
    t.materialize_dv(spark, target_rows=0)                  # v3
    t.commit(spark.createDataFrame([(900, "x")], "k long, v string"))  # v4
    feed = t.changefeed(spark, 1, 4)
    got = sorted((r["_op"], r.k, r.v) for r in feed.collect())
    new, old = t.read(spark, 4), t.read(spark, 1)
    want = sorted(
        [("I", r.k, r.v) for r in new.exceptAll(old).collect()]
        + [("D", r.k, r.v) for r in old.exceptAll(new).collect()]
    )
    assert got == want
    # materialize retired every DV entry
    assert t._dv(3) == {"files": [], "rows": 0}


def test_stats_pruning_still_skips_files_through_dv_history(spark, tmp_path):
    """File-skip counts survive a DV-delete history: per-file min/max
    stats cover deleted rows too (conservative, never wrong), so
    stats-pruned reads keep skipping non-matching files while the DV
    anti-join keeps the kept files' results exact."""
    t = ManifestTable(str(tmp_path / "tbl"))
    for i in range(4):  # 4 commits, tight disjoint key spans
        t.commit(
            spark.range(i * 100, (i + 1) * 100).selectExpr(
                "id as k", "concat('u', id) as s"
            ).coalesce(1)
        )
    assert len(t.pruned_files("k", 150, 180)) == 1
    t.delete_where(spark, F.col("k").isin(160, 161, 350), mode="dv")
    # pruning unchanged: still exactly 1 of 4 files opened
    kept = t.pruned_files("k", 150, 180)
    assert len(kept) == 1
    got = sorted(r.k for r in t.read_pruned(spark, "k", 150, 180).collect())
    assert got == [k for k in range(150, 181) if k not in (160, 161)]


# -- round-13 review fixes ---------------------------------------------------


def test_materialize_dv_carries_union_schema_across_evolution(spark, tmp_path):
    """materialize_dv on a schema-evolved table must rewrite with the
    UNION of its input schemas — before the fix a pre-evolution footer
    could win inference and permanently drop the added column."""
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string").coalesce(1))
    t.commit(
        spark.createDataFrame([(3, "c", 30.0)], "k long, v string, w double").coalesce(1)
    )
    t.delete_where(spark, F.col("k").isin(1, 3), mode="dv")
    t.materialize_dv(spark, target_rows=0)
    got = sorted(
        (r.k, r.v, r.w) for r in t.read(spark, merge_schema=True).collect()
    )
    assert got == [(2, "b", None)]
    # and with only the evolved row surviving, w must persist
    t2 = ManifestTable(str(tmp_path / "tbl2"))
    t2.commit(spark.createDataFrame([(1, "a")], "k long, v string").coalesce(1))
    t2.commit(
        spark.createDataFrame([(3, "c", 30.0)], "k long, v string, w double").coalesce(1)
    )
    t2.delete_where(spark, F.col("k") == 1, mode="dv")
    t2.materialize_dv(spark, target_rows=0)
    got = sorted((r.k, r.v, r.w) for r in t2.read(spark, merge_schema=True).collect())
    assert got == [(3, "c", 30.0)]


def test_changefeed_dv_only_delta_keeps_evolved_columns(spark, tmp_path):
    """A DV-only feed range whose delta rows live in a POST-evolution
    shared file must surface the added column (the probe includes
    DV-named shared files, not just the v_to anchor)."""
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit(spark.createDataFrame([(1, "a")], "k long, v string").coalesce(1))  # v1 anchor shape
    t.commit(
        spark.createDataFrame([(3, "c", 30.0)], "k long, v string, w double").coalesce(1)
    )                                                                     # v2 evolved
    t.delete_where(spark, F.col("k") == 3, mode="dv")                     # v3 DV-only
    rows = sorted(
        (r["_op"], r.k, r.v, r.w) for r in t.changefeed(spark, 2, 3).collect()
    )
    assert rows == [("D", 3, "c", 30.0)]


def test_vacuum_reclaims_orphaned_dv_artifacts(spark, tmp_path):
    """expire() refuses DV files no dropped manifest references (they are
    indistinguishable from in-flight writes); the age-guarded vacuum is
    their reclaimer — and never touches referenced DV files."""
    import shutil as _sh

    t = _mk(spark, tmp_path, n=50, files=1)
    t.delete_where(spark, F.col("k") == 3, mode="dv")
    live = t._dv(t.current_version())["files"][0]
    orphan_dir = os.path.join(t.root, "_deletes", "dv-v99999-torn")
    os.makedirs(orphan_dir)
    _sh.copy(live, os.path.join(orphan_dir, "part-00000.parquet"))
    lone = os.path.join(t.root, "_deletes", "dv-corphan.parquet")
    _sh.copy(live, lone)
    removed = t.vacuum_orphans(min_age_seconds=0)
    assert not os.path.exists(orphan_dir) and not os.path.exists(lone)
    assert os.path.exists(live)
    assert any("dv-" in p for p in removed)
    assert _ks(t.read(spark)) == [k for k in range(50) if k != 3]


def test_delete_on_emptied_table_raises_cleanly(spark, tmp_path):
    t = _mk(spark, tmp_path, n=10, files=1)
    t.delete_where(spark, F.lit(True))              # empties the table
    with pytest.raises(ValueError, match="empty"):
        t.delete_where(spark, F.col("k") == 1)
    with pytest.raises(ValueError, match="empty"):
        t.delete_where(spark, F.col("k") == 1, mode="dv")
