"""Per-file bloom index on the manifest table: pruning actually skips
files, never loses a row, and degrades conservatively."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gridmr_spark.sources.table_format import ManifestTable, _bloom_hashes


def _mk(spark, tmp_path, n_files=8, n_rows=4000):
    t = ManifestTable(str(tmp_path / "tbl"))
    df = spark.range(n_rows).select(
        F.col("id").alias("k"),
        F.concat(F.lit("u"), F.col("id")).alias("s"),
        (F.col("id") * 2).alias("v"),
    )
    t.commit(df.repartition(n_files), bloom_cols=["k", "s"])
    return t


def test_point_probe_skips_files_and_loses_nothing(spark, tmp_path):
    t = _mk(spark, tmp_path)
    total = len(t.pruned_files(preds={}))
    assert total == 8
    kept = t.pruned_files(point={"k": 1234})
    assert 0 < len(kept) < total
    got = t.read_pruned(spark, point={"k": 1234}).collect()
    want = t.read(spark).where(F.col("k") == 1234).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    # string-column bloom probes work the same way
    kept_s = t.pruned_files(point={"s": "u77"})
    assert 0 < len(kept_s) < total
    rows = t.read_pruned(spark, point={"s": "u77"}).collect()
    assert [r.k for r in rows] == [77]


def test_absent_value_prunes_everything_or_fp_only(spark, tmp_path):
    t = _mk(spark, tmp_path)
    kept = t.pruned_files(point={"k": 10_000_000})
    # all 8 blooms excluding the value is the expected case; a rare FP
    # keeps a file but the residual equality still yields zero rows
    assert len(kept) <= 1
    assert t.read_pruned(spark, point={"k": 10_000_000}).count() == 0


def test_unindexed_files_are_conservatively_kept(spark, tmp_path):
    t = _mk(spark, tmp_path, n_files=4)
    # second commit WITHOUT blooms: its files can never be bloom-pruned
    t.commit(
        spark.range(100).select(
            (F.col("id") + 50_000).alias("k"),
            F.lit("x").alias("s"),
            F.lit(0).cast("long").alias("v"),
        ).repartition(4)
    )
    kept = set(t.pruned_files(point={"k": 123}))
    v2_added = set(t._added_files(2))
    # a probe into v2's key range: its files carry no blooms, so only the
    # stats range keeps them — present-and-kept proves the conservative path
    kept2 = set(t.pruned_files(point={"k": 50_050}))
    assert v2_added & kept2  # unindexed files kept despite no bloom
    assert t.read_pruned(spark, point={"k": 50_050}).count() == 1
    assert kept  # v1 probe still returns candidates


def test_float_point_value_raises(spark, tmp_path):
    t = _mk(spark, tmp_path, n_files=2, n_rows=100)
    with pytest.raises(TypeError, match="int/str"):
        t.pruned_files(point={"k": 1.5})
    with pytest.raises(TypeError):
        _bloom_hashes(True, 1024)


def test_bloom_rides_restore_and_clone(spark, tmp_path):
    t = _mk(spark, tmp_path, n_files=4, n_rows=1000)
    t.commit(
        spark.range(10).select(
            (F.col("id") + 90_000).alias("k"), F.lit("y").alias("s"),
            F.lit(1).cast("long").alias("v"),
        )
    )
    t.restore(1)
    kept = t.pruned_files(point={"k": 500})
    assert 0 < len(kept) < 4
    c = t.clone_to(str(tmp_path / "clone"))
    assert 0 < len(c.pruned_files(point={"k": 500})) < 4


# -- metadata-only aggregates (metadata_agg) ---------------------------------


def test_metadata_agg_exact_and_zero_group_opens(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "m"))
    df1 = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 3).alias("v"))
    df2 = spark.range(50).select((F.col("id") + 1000).alias("k"), F.lit(7).cast("long").alias("v"))
    t.commit(df1.repartition(4))
    t.commit(df2)
    before = t.group_opens
    agg = t.metadata_agg()
    assert t.group_opens == before  # pure manifest-list read
    assert agg["n_rows"] == 150
    assert agg["columns"]["k"] == [0, 1049]
    # survives delete (rewrite re-derives counts) and manifest rewrite
    t.delete_where(spark, F.col("k") >= 1000)
    assert t.metadata_agg()["n_rows"] == 100
    t.rewrite_manifests()
    assert t.metadata_agg()["n_rows"] == 100
    assert t.metadata_agg()["columns"]["k"] == [0, 99]


def test_metadata_agg_nulls_total_for_unknown_groups(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "m"))
    t.commit(spark.range(10).select(F.col("id").alias("k")))
    # simulate a pre-rowcount group: strip the entry's n_rows
    import json as _json
    import os as _os

    mp = _os.path.join(t._mdir, "v00001.json")
    m = _json.load(open(mp))
    for g in m["groups"]:
        g.pop("n_rows", None)
    _os.remove(mp)
    with open(mp, "w") as f:
        _json.dump(m, f)
    t._rawcache.clear(); t._mcache.clear()
    agg = t.metadata_agg()
    assert agg["n_rows"] is None          # partial sums never read as exact
    assert agg["columns"]["k"] == [0, 9]  # envelopes still answer min/max


def test_rewrite_manifests_carries_blooms_forward(spark, tmp_path):
    t = _mk(spark, tmp_path, n_files=4, n_rows=1000)
    t.rewrite_manifests()
    kept = t.pruned_files(point={"k": 500})
    assert 0 < len(kept) < 4


def test_commit_metadata_built_executor_side(spark, tmp_path):
    """The commit-time bloom/stats/row-count build runs as ONE Spark job
    over the delta (one task per written file, _build_file_meta) — the
    driver never reads column data. Proven two ways: (a) the per-file
    task function, run standalone on one written file, reproduces exactly
    the meta the commit recorded (same code path executors execute);
    (b) a job-level listener sees a Spark job whose task count equals the
    delta's file count between the data write and the manifest publish."""
    from gridmr_spark.sources.table_format import _build_file_meta

    t = ManifestTable(str(tmp_path / "tbl"))
    df = spark.range(2000).select(
        F.col("id").alias("k"), F.concat(F.lit("u"), F.col("id")).alias("s")
    )
    tracker = spark.sparkContext.statusTracker()
    jobs_before = set(tracker.getJobIdsForGroup() or [])
    t.commit(df.repartition(4), bloom_cols=["k"])

    grp = t._load_group(t._groups_of(1)[0]["path"])
    files = grp["files"]
    assert len(files) == 4
    # (a) standalone task function == recorded manifest meta, per file
    for f in files:
        path, meta = _build_file_meta((f, ["k"]))
        assert path == f
        assert meta["stats"] == grp["stats"][f]
        assert meta["rows"] == grp["rows"][f]
        assert meta["blooms"] == grp["blooms"][f]
    # (b) some job in the commit ran with exactly one task per file and
    # zero shuffle (the parallelize+map meta build)
    jobs_after = set(tracker.getJobIdsForGroup() or [])
    new_jobs = jobs_after - jobs_before
    meta_jobs = []
    for jid in new_jobs:
        info = tracker.getJobInfo(jid)
        if info is None:
            continue
        for sid in info.stageIds:
            sinfo = tracker.getStageInfo(sid)
            if sinfo is not None and sinfo.numTasks == 4:
                meta_jobs.append(jid)
    assert meta_jobs, "no 4-task job found — meta build did not distribute"
