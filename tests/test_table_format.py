"""Manifest table format: commit atomicity, snapshot immutability,
incremental reads, orphan invisibility."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from gridmr_spark.sources.table_format import ManifestTable


def _mk(spark, tmp_path, batches):
    t = ManifestTable(str(tmp_path / "tbl"))
    for rows in batches:
        t.commit(spark.createDataFrame(rows, "k long, v string"))
    return t


def test_snapshots_are_immutable_and_cumulative(spark, tmp_path):
    t = _mk(spark, tmp_path, [[(1, "a")], [(2, "b"), (3, "c")], [(4, "d")]])
    assert t.versions() == [1, 2, 3]
    assert sorted(r.k for r in t.read(spark, 1).collect()) == [1]
    assert sorted(r.k for r in t.read(spark, 2).collect()) == [1, 2, 3]
    assert sorted(r.k for r in t.read(spark).collect()) == [1, 2, 3, 4]
    # reading v1 again AFTER later commits returns the identical rows
    assert sorted(r.k for r in t.read(spark, 1).collect()) == [1]


def test_diff_returns_exactly_the_delta(spark, tmp_path):
    t = _mk(spark, tmp_path, [[(1, "a")], [(2, "b")], [(3, "c")], [(4, "d")]])
    assert sorted(r.k for r in t.diff(spark, 1, 3).collect()) == [2, 3]
    assert sorted(r.k for r in t.diff(spark, 3, 4).collect()) == [4]
    with pytest.raises(ValueError):
        t.diff(spark, 2, 2)


def test_orphan_data_files_are_invisible(spark, tmp_path):
    """A crash between data write and manifest rename leaves data files no
    manifest references — readers at every version must not see them."""
    t = _mk(spark, tmp_path, [[(1, "a")]])
    orphan_dir = os.path.join(t.root, "data", "v00002")
    spark.createDataFrame([(99, "orphan")], "k long, v string").write.parquet(orphan_dir)
    assert glob.glob(os.path.join(orphan_dir, "*.parquet"))  # it IS on disk
    assert t.versions() == [1]
    assert sorted(r.k for r in t.read(spark).collect()) == [1]
    # and a leftover .tmp manifest is equally invisible
    with open(os.path.join(t._mdir, ".v00002.json.tmp"), "w") as f:
        f.write("{}")
    assert t.versions() == [1]


def test_empty_and_missing_versions_error_clearly(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "tbl"))
    with pytest.raises(ValueError, match="no committed snapshot"):
        t.read(spark)
    t.commit(spark.createDataFrame([(1, "a")], "k long, v string"))
    with pytest.raises(ValueError, match="no such snapshot"):
        t.read(spark, 7)


def test_commit_returns_dense_versions_and_exact_deltas(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "tbl"))
    v1 = t.commit(spark.createDataFrame([(1, "a")], "k long, v string"))
    v2 = t.commit(spark.createDataFrame([(2, "b")], "k long, v string"))
    assert (v1, v2) == (1, 2)
    m1, m2 = t._manifest(1), t._manifest(2)
    assert m1["files"] == m1["added"]
    assert m2["files"] == m1["files"] + m2["added"]
    assert set(m1["added"]).isdisjoint(m2["added"])


def test_aggregates_match_across_snapshot_and_diff(spark, tmp_path, sf_smoke):
    """End-to-end against real data: snapshot(v2) == snapshot(v1) + diff."""
    from gridmr_spark.catalog import load_table

    orders = load_table(spark, sf_smoke, "orders").select("o_orderkey")
    t = ManifestTable(str(tmp_path / "ord"))
    t.commit(orders.where(F.col("o_orderkey") % 2 == 0))
    t.commit(orders.where(F.col("o_orderkey") % 2 == 1))
    n1 = t.read(spark, 1).count()
    n2 = t.read(spark, 2).count()
    nd = t.diff(spark, 1, 2).count()
    assert n1 + nd == n2 == orders.count()


def test_compact_preserves_rows_and_diff_refuses_to_cross(spark, tmp_path):
    t = _mk(spark, tmp_path, [[(1, "a")], [(2, "b")], [(3, "c")]])
    before = sorted(r.k for r in t.read(spark).collect())
    v = t.compact(spark, target_partitions=1)
    assert v == 4
    assert sorted(r.k for r in t.read(spark).collect()) == before
    # pre-compaction snapshots still time-travel
    assert sorted(r.k for r in t.read(spark, 2).collect()) == [1, 2]
    # the compacted snapshot really is fewer files
    assert len(t._manifest(4)["files"]) < len(t._manifest(3)["files"])
    # incremental reads may not cross the rewrite
    with pytest.raises(ValueError, match="compact"):
        t.diff(spark, 1, 4)
    # ... but ranges on either side still work
    assert sorted(r.k for r in t.diff(spark, 1, 3).collect()) == [2, 3]


def test_expire_deletes_unreferenced_files_only(spark, tmp_path):
    t = _mk(spark, tmp_path, [[(1, "a")], [(2, "b")]])
    t.compact(spark, target_partitions=1)
    old_files = set(t._manifest(2)["files"])
    keep_files = set(t._manifest(3)["files"])
    removed = t.expire(keep_last=1)
    assert set(removed) == old_files - keep_files
    for f in removed:
        assert not os.path.exists(f)
    for f in keep_files:
        assert os.path.exists(f)
    assert t.versions() == [3]
    assert sorted(r.k for r in t.read(spark).collect()) == [1, 2]
    with pytest.raises(ValueError, match="no such snapshot"):
        t.read(spark, 1)


def test_idempotent_commit_is_exactly_once(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "tbl"))
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    v1 = t.commit(df, idempotency_key="batch-0")
    v_retry = t.commit(df, idempotency_key="batch-0")  # replay after "failure"
    assert v1 == v_retry == 1
    assert t.read(spark).count() == 1
    v2 = t.commit(df, idempotency_key="batch-1")
    assert v2 == 2
    assert t.read(spark).count() == 2


def test_stream_sink_restart_exactly_once(spark, tmp_path, sf_smoke):
    """Growing-source two-run test (the repo's checkpoint-restart pattern):
    run the foreachBatch ManifestTable sink availableNow, append more
    source rows, run AGAIN with the same checkpoint — the table must hold
    every source row exactly once."""
    from gridmr_spark.catalog import load_table
    from gridmr_spark.sources.table_format import ManifestTable

    ev = load_table(spark, sf_smoke, "events").select("event_id", "event_type")
    first = ev.where(F.col("event_id") % 2 == 0)
    second = ev.where(F.col("event_id") % 2 == 1)
    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    t = ManifestTable(str(tmp_path / "tbl"))

    def run():
        q = (
            spark.readStream.schema(ev.schema)
            .parquet(src)
            .writeStream.outputMode("append")
            .foreachBatch(lambda df, bid: t.commit(df, idempotency_key=f"batch-{bid}"))
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    first.write.mode("overwrite").parquet(src)
    run()
    n1 = t.read(spark).count()
    assert n1 == first.count()
    second.write.mode("append").parquet(src)
    run()
    got = t.read(spark)
    assert got.count() == ev.count()
    assert got.select("event_id").distinct().count() == ev.count()


def test_delete_where_is_cow_and_history_survives(spark, tmp_path):
    t = _mk(spark, tmp_path, [[(1, "a"), (2, "b"), (3, "c")]])
    v2 = t.delete_where(spark, F.col("k") == 2)
    assert v2 == 2
    assert sorted(r.k for r in t.read(spark).collect()) == [1, 3]
    # time travel still shows the deleted row (until expire)
    assert sorted(r.k for r in t.read(spark, 1).collect()) == [1, 2, 3]
    # the old file with row k=2 is still on disk ...
    old = set(t._manifest(1)["files"])
    assert all(os.path.exists(f) for f in old)
    # ... and expire makes the deletion physical
    t.expire(keep_last=1)
    assert all(not os.path.exists(f) for f in old - set(t._manifest(2)["files"]))
    with pytest.raises(ValueError, match="compact|overwrite"):
        t.diff(spark, 1, 2)  # deletes are not incremental appends


def test_delete_where_accepts_sql_string(spark, tmp_path):
    t = _mk(spark, tmp_path, [[(1, "a"), (2, "b")]])
    t.delete_where(spark, "k = 1")
    assert [r.k for r in t.read(spark).collect()] == [2]


def test_vacuum_removes_only_orphans(spark, tmp_path):
    t = _mk(spark, tmp_path, [[(1, "a")], [(2, "b")]])
    orphan_dir = os.path.join(t.root, "data", "v00099")
    spark.createDataFrame([(9, "x")], "k long, v string").write.parquet(orphan_dir)
    with open(os.path.join(t._mdir, ".v00099.json.tmp"), "w") as f:
        f.write("{}")
    live = set(t._manifest(2)["files"])
    removed = t.vacuum_orphans(min_age_seconds=0)
    assert removed  # the orphan parquet + tmp manifest
    assert all(os.path.exists(f) for f in live)
    assert not glob.glob(os.path.join(orphan_dir, "*.parquet"))
    assert sorted(r.k for r in t.read(spark).collect()) == [1, 2]
    assert t.vacuum_orphans(min_age_seconds=0) == []  # idempotent


def test_sql_surface_views_versions_history_files(spark, tmp_path):
    """register_sql exposes current/_vN/_history/_files; each data view is
    the exact snapshot and SQL time travel equals the Python API."""
    t = _mk(spark, tmp_path, [[(1, "a")], [(2, "b"), (3, "c")], [(4, "d")]])
    names = t.register_sql(spark, "sqlt")
    assert set(names) == {"sqlt", "sqlt_v1", "sqlt_v2", "sqlt_v3",
                          "sqlt_history", "sqlt_files"}
    assert sorted(r.k for r in spark.sql("SELECT k FROM sqlt").collect()) == [1, 2, 3, 4]
    assert sorted(r.k for r in spark.sql("SELECT k FROM sqlt_v2").collect()) == [1, 2, 3]
    hist = spark.sql(
        "SELECT version, operation FROM sqlt_history ORDER BY version"
    ).collect()
    assert [(r.version, r.operation) for r in hist] == [
        (1, "append"), (2, "append"), (3, "append")]
    files = spark.sql("SELECT file_path, column_stats FROM sqlt_files").collect()
    assert len(files) == len(t._manifest(3)["files"])
    assert all(os.path.exists(r.file_path) for r in files)


def test_sql_view_snapshot_isolation_and_timestamp_travel(spark, tmp_path):
    """A registered view pins the file list at registration: later commits
    never leak in (snapshot isolation); at_ts resolves like version_at."""
    t = _mk(spark, tmp_path, [[(1, "a")], [(2, "b")]])
    t.sql_view(spark, "iso_view")
    t.commit(spark.createDataFrame([(3, "c")], "k long, v string"))
    assert sorted(r.k for r in spark.sql("SELECT k FROM iso_view").collect()) == [1, 2]
    ts2 = t._raw(2)["ts"]
    t.sql_view(spark, "iso_asof", at_ts=(ts2 + t._raw(3)["ts"]) / 2.0)
    assert sorted(r.k for r in spark.sql("SELECT k FROM iso_asof").collect()) == [1, 2]
    import pytest

    with pytest.raises(ValueError, match="at most ONE"):
        t.sql_view(spark, "iso_bad", version=1, at_ts=ts2)


def test_sql_view_manifest_pruning_still_works(spark, tmp_path):
    """sql_view(preds=...) must scan ONLY the stats-overlapping files while
    returning results identical to the unpruned snapshot filter."""
    t = ManifestTable(str(tmp_path / "tbl"))
    for lo in (0, 100, 200):  # three commits with disjoint k ranges
        t.commit(
            spark.createDataFrame(
                [(lo + i, "x") for i in range(10)], "k long, v string"
            ).coalesce(1)
        )
    t.sql_view(spark, "pruned_view", preds={"k": (100, 109)})
    got = spark.sql("SELECT k FROM pruned_view ORDER BY k").collect()
    assert [r.k for r in got] == list(range(100, 110))
    scanned = spark.table("pruned_view").inputFiles()
    assert 0 < len(scanned) < len(t._manifest(3)["files"])


def test_vacuum_and_expire_survive_symlinked_root_spelling(spark, tmp_path):
    """GC liveness tests must be spelling-insensitive: a table written
    under its real path then maintained through a SYMLINKED root (or any
    other alternate spelling) must not mistake live group manifests or
    data dirs for orphans — that would destroy file lists and stats for
    every snapshot."""
    t = _mk(spark, tmp_path, [[(1, "a")], [(2, "b")]])
    link = str(tmp_path / "tbl_link")
    os.symlink(t.root, link)
    alias = ManifestTable(link)
    # nothing is orphaned: vacuum through the alias must reclaim NOTHING
    assert alias.vacuum_orphans(min_age_seconds=0) == []
    assert sorted(r.k for r in alias.read(spark).collect()) == [1, 2]
    assert sorted(r.k for r in t.read(spark).collect()) == [1, 2]
    # expire through the alias keeps the surviving snapshot intact
    alias.expire(keep_last=1)
    assert sorted(r.k for r in ManifestTable(t.root).read(spark).collect()) == [1, 2]


def _run_changelog(spark, t, run_dir):
    from gridmr_spark.sources.table_format import register_changelog_source

    register_changelog_source(spark)
    sink = os.path.join(run_dir, "out")
    q = (
        spark.readStream.format("mtable_changelog")
        .option("path", t.root)
        .load()
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, bid: df.write.mode("append").parquet(sink))
        .option("checkpointLocation", os.path.join(run_dir, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(sink)


def test_changelog_stream_restart_exactly_once(spark, tmp_path):
    """Version-offset checkpointing: a restarted stream emits only the
    versions committed since its checkpoint."""
    t = _mk(spark, tmp_path, [[(1, "a")], [(2, "b")]])
    run = str(tmp_path / "run")
    assert sorted(r.k for r in _run_changelog(spark, t, run).collect()) == [1, 2]
    t.commit(spark.createDataFrame([(3, "c")], "k long, v string"))
    got = _run_changelog(spark, t, run)  # SAME checkpoint
    assert sorted(r.k for r in got.collect()) == [1, 2, 3]
    assert got.count() == 3  # no re-emission of v1/v2


def test_changelog_stream_refuses_rewrites_by_default(spark, tmp_path):
    t = _mk(spark, tmp_path, [[(1, "a")], [(2, "b")]])
    t.compact(spark, target_partitions=1)
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import StreamingQueryException

    with pytest.raises((StreamingQueryException, Py4JJavaError)):
        _run_changelog(spark, t, str(tmp_path / "run"))


def test_changelog_stream_skips_rewrites_when_asked(spark, tmp_path):
    from gridmr_spark.sources.table_format import register_changelog_source

    t = _mk(spark, tmp_path, [[(1, "a")], [(2, "b")]])
    t.compact(spark, target_partitions=1)
    t.commit(spark.createDataFrame([(3, "c")], "k long, v string"))
    register_changelog_source(spark)
    run = str(tmp_path / "run")
    sink = os.path.join(run, "out")
    q = (
        spark.readStream.format("mtable_changelog")
        .option("path", t.root)
        .option("on_rewrite", "skip")
        .load()
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, bid: df.write.mode("append").parquet(sink))
        .option("checkpointLocation", os.path.join(run, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # appends stream; the compaction's rewritten files do not double-emit
    assert sorted(r.k for r in spark.read.parquet(sink).collect()) == [1, 2, 3]


def test_dynamic_vs_static_partition_overwrite(spark, tmp_path):
    """The control experiment for source_dynamic_partition_overwrite:
    static overwrite TRUNCATES untouched partitions, dynamic preserves
    them — same write, one option apart."""
    path_s, path_d = str(tmp_path / "static"), str(tmp_path / "dynamic")
    full = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "b")], "k long, p string"
    )
    patch = spark.createDataFrame([(9, "a")], "k long, p string")
    for path in (path_s, path_d):
        full.write.partitionBy("p").mode("overwrite").parquet(path)
    patch.write.partitionBy("p").mode("overwrite").parquet(path_s)
    (
        patch.write.partitionBy("p")
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(path_d)
    )
    assert sorted(r.k for r in spark.read.parquet(path_s).collect()) == [9]
    assert sorted(r.k for r in spark.read.parquet(path_d).collect()) == [3, 4, 9]


def test_replace_is_idempotent_overwrite(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    v2 = t.replace(spark.createDataFrame([(9, "z")], "k long, v string"),
                   idempotency_key="refresh-0")
    v_retry = t.replace(
        spark.createDataFrame([(999, "BOOM")], "k long, v string"),
        idempotency_key="refresh-0",
    )
    assert v2 == v_retry == 2
    assert [r.k for r in t.read(spark).collect()] == [9]  # retry was a no-op
    assert [r.k for r in t.read(spark, 1).collect()] != [9]  # history intact
    with pytest.raises(ValueError, match="overwrite"):
        t.diff(spark, 1, 2)


def test_upsert_view_replay_converges(spark, tmp_path, sf_smoke):
    """The materialized-view fold survives a REPLAYED batch: merging the
    same delta twice under the same idempotency key must leave the view
    equal to a single application (the failure mode the key prevents is
    double-counting)."""
    from pyspark.sql import functions as F

    from gridmr_spark.catalog import load_table
    from gridmr_spark.sources.table_format import ManifestTable

    ev = load_table(spark, sf_smoke, "events").select("event_type", "value")
    halves = [ev.where(F.col("value") < 50), ev.where(F.col("value") >= 50)]
    t = ManifestTable(str(tmp_path / "view"))

    def refresh(batch_df, batch_id):
        delta = batch_df.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )
        if t.current_version() is not None:
            cur = t.read(spark)
            merged = cur.join(
                delta.withColumnRenamed("n", "d"), "event_type", "full_outer"
            ).select(
                "event_type",
                (F.coalesce("n", F.lit(0)) + F.coalesce("d", F.lit(0))).cast("long").alias("n"),
            )
        else:
            merged = delta
        t.replace(merged.localCheckpoint(eager=True), idempotency_key=f"b-{batch_id}")

    refresh(halves[0], 0)
    refresh(halves[1], 1)
    refresh(halves[1], 1)  # replay
    got = {r.event_type: r.n for r in t.read(spark).collect()}
    want = {r.event_type: r.n for r in ev.groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n")).collect()}
    assert got == want


def test_read_merge_schema_surfaces_added_columns(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit(spark.createDataFrame([(1, "a")], "k long, v string"))
    t.commit(spark.createDataFrame([(2, "b", 7.5)], "k long, v string, extra double"))
    merged = t.read(spark, merge_schema=True)
    assert "extra" in merged.columns
    rows = {r.k: r for r in merged.collect()}
    assert rows[1].extra is None and rows[2].extra == 7.5
    # and the historical snapshot is untouched by evolution
    assert "extra" not in t.read(spark, 1, merge_schema=True).columns


def test_merge_by_key_update_insert_carryover(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit(spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, v string"))
    ups = spark.createDataFrame([(2, "B!"), (9, "new")], "k long, v string")
    v = t.merge_by_key(spark, ups, "k", idempotency_key="m-0")
    assert v == 2
    got = {r.k: r.v for r in t.read(spark).collect()}
    assert got == {1: "a", 2: "B!", 3: "c", 9: "new"}
    # replay under the same key is a no-op
    boom = spark.createDataFrame([(1, "BOOM")], "k long, v string")
    assert t.merge_by_key(spark, boom, "k", idempotency_key="m-0") == 2
    assert {r.k: r.v for r in t.read(spark).collect()} == got
    # pre-merge snapshot is intact
    assert {r.k: r.v for r in t.read(spark, 1).collect()} == {1: "a", 2: "b", 3: "c"}


# ---------------------------------------------------------------------------
# Round 9: optimistic concurrency, torn-commit recovery, interleaving soak
# ---------------------------------------------------------------------------


def test_two_writer_race_exactly_one_wins(spark, tmp_path):
    """Two writers that both resolve current_version()==1 and race to
    commit v2: exactly one manifest publish succeeds; the loser raises
    ConcurrentCommitError, its data files stay invisible, and vacuum
    reclaims them."""
    import threading

    from gridmr_spark.sources.table_format import ConcurrentCommitError

    root = str(tmp_path / "tbl")
    ManifestTable(root).commit(
        spark.createDataFrame([(1, "a")], "k long, v string")
    )
    barrier = threading.Barrier(2)

    class RacingTable(ManifestTable):
        # Hold both writers after the data write so both have computed the
        # SAME target version before either publishes a manifest.
        def _write_data(self, df, v, bloom_cols=None, **kw):
            files = super()._write_data(df, v, bloom_cols, **kw)
            barrier.wait(timeout=120)
            return files

    results = {}

    def writer(name, rows):
        t = RacingTable(root)
        try:
            results[name] = ("won", t.commit(
                spark.createDataFrame(rows, "k long, v string")))
        except ConcurrentCommitError:
            results[name] = ("lost", None)

    threads = [
        threading.Thread(target=writer, args=("A", [(2, "b")])),
        threading.Thread(target=writer, args=("B", [(3, "c")])),
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    outcomes = sorted(v[0] for v in results.values())
    assert outcomes == ["lost", "won"]
    winner = next(n for n, v in results.items() if v[0] == "won")
    assert results[winner][1] == 2
    t = ManifestTable(root)
    assert t.versions() == [1, 2]
    keys = sorted(r.k for r in t.read(spark).collect())
    assert keys in ([1, 2], [1, 3])  # winner's rows only, loser invisible
    # the loser's data directory is an orphan vacuum can reclaim
    removed = t.vacuum_orphans(min_age_seconds=0)
    assert removed
    assert sorted(r.k for r in t.read(spark).collect()) == keys
    assert t.vacuum_orphans(min_age_seconds=0) == []


def test_commit_succeeds_after_torn_write(spark, tmp_path):
    """A crash between data write and manifest publish must not brick the
    table: the retried commit lands in a fresh data dir, and vacuum
    removes the torn directory WHOLESALE (incl. _SUCCESS)."""
    t = _mk(spark, tmp_path, [[(1, "a")]])
    # simulate the crash: data for v2 written, no manifest published
    t._write_data(spark.createDataFrame([(99, "torn")], "k long, v string"), 2)
    v = t.commit(spark.createDataFrame([(2, "b")], "k long, v string"))
    assert v == 2
    assert sorted(r.k for r in t.read(spark).collect()) == [1, 2]
    assert t.vacuum_orphans(min_age_seconds=0)
    live_dirs = set()
    for ver in t.versions():
        live_dirs.update(os.path.dirname(f) for f in t._manifest(ver)["files"])
    on_disk = {d for d in glob.glob(os.path.join(t.root, "data", "*"))
               if os.path.isdir(d)}
    assert on_disk == live_dirs  # torn dir fully gone, no _SUCCESS residue
    assert sorted(r.k for r in t.read(spark).collect()) == [1, 2]


def test_reader_writer_interleaving_soak(spark, tmp_path):
    """Run the full maintenance verb set interleaved with readers at every
    surviving version: no reader ever sees a torn, drifted, or
    vacuumed-away snapshot."""
    t = ManifestTable(str(tmp_path / "tbl"))
    expected: dict[int, list[int]] = {}

    def check_all():
        for ver in t.versions():
            got = sorted(r.k for r in t.read(spark, ver).collect())
            assert got == expected[ver], f"v{ver}: {got} != {expected[ver]}"

    nxt = 0
    for _ in range(3):  # appends
        rows = [(nxt + i, "x") for i in range(3)]
        nxt += 3
        v = t.commit(spark.createDataFrame(rows, "k long, v string"))
        expected[v] = sorted(expected.get(v - 1, []) + [r[0] for r in rows])
        check_all()
    v = t.delete_where(spark, "k % 3 = 0")
    expected[v] = [k for k in expected[v - 1] if k % 3 != 0]
    check_all()
    v = t.compact(spark, target_partitions=1)
    expected[v] = expected[v - 1]
    check_all()
    v = t.rewrite_manifests(target_groups=1)  # metadata-only verb in the mix
    expected[v] = expected[v - 1]
    check_all()
    v = t.commit(spark.createDataFrame([(100, "y")], "k long, v string"))
    expected[v] = sorted(expected[v - 1] + [100])
    check_all()
    t.expire(keep_last=2)
    assert t.versions() == sorted(expected)[-2:]
    check_all()
    with pytest.raises(ValueError, match="no such snapshot"):
        t.read(spark, 1)
    live = {f for v in t.versions() for f in t._manifest(v)["files"]}
    removed = t.vacuum_orphans(min_age_seconds=0)
    # maintenance never disturbs live data: nothing reclaimed touches a
    # referenced file, and every referenced file still exists on disk
    assert not set(removed) & live
    assert all(os.path.exists(f) for f in live)
    check_all()


def test_changelog_reads_columns_by_name_across_order_drift(spark, tmp_path):
    """Same-typed columns written in a different physical order by a later
    commit must land in the right stream columns (by-name, not
    positional)."""
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit(spark.createDataFrame([("a1", "b1")], "a string, b string"))
    t.commit(spark.createDataFrame([("b2", "a2")], "b string, a string"))
    got = _run_changelog(spark, t, str(tmp_path / "run"))
    rows = {(r.a, r.b) for r in got.collect()}
    assert rows == {("a1", "b1"), ("a2", "b2")}


def test_changelog_null_fills_missing_columns(spark, tmp_path):
    """Round 13 (was: errors loudly): a file lacking a declared column is
    additive evolution, not a fault — the stream schema is the footer
    UNION of the snapshot and narrower files null-fill, the same typed-
    NULL alignment as the batch changefeed."""
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit(spark.createDataFrame([("a1", "b1")], "a string, b string"))
    t.commit(spark.createDataFrame([("a2",)], "a string"))
    got = sorted(
        (r.a, r.b) for r in _run_changelog(spark, t, str(tmp_path / "run")).collect()
    )
    assert got == [("a1", "b1"), ("a2", None)]


# ---------------------------------------------------------------------------
# Round 9: manifest-level column stats + file skipping
# ---------------------------------------------------------------------------


def _range_table(spark, tmp_path):
    """4 commits of 25 keys each, range-partitioned into 2 files per
    commit => 8 files with tight disjoint key spans."""
    t = ManifestTable(str(tmp_path / "tbl"))
    for i in range(4):
        rows = [(k, f"v{k}") for k in range(i * 25, (i + 1) * 25)]
        t.commit(
            spark.createDataFrame(rows, "k long, v string")
            .repartitionByRange(2, "k")
        )
    return t


def test_stats_recorded_per_file(spark, tmp_path):
    t = _range_table(spark, tmp_path)
    stats = t.snapshot_stats()
    assert len(stats) == 8
    for f, st in stats.items():
        assert "k" in st and "v" in st
        lo, hi = st["k"]
        assert 0 <= lo <= hi <= 99


def test_pruned_read_equals_filtered_read(spark, tmp_path):
    t = _range_table(spark, tmp_path)
    for lo, hi in [(10, 30), (0, 99), (None, 12), (95, None), (200, 300)]:
        import pyspark.sql.functions as F

        base = t.read(spark)
        if lo is not None:
            base = base.where(F.col("k") >= lo)
        if hi is not None:
            base = base.where(F.col("k") <= hi)
        want = sorted(r.k for r in base.collect())
        got = sorted(r.k for r in t.read_pruned(spark, "k", lo, hi).collect())
        assert got == want, (lo, hi)


def test_pruning_actually_skips_files(spark, tmp_path):
    t = _range_table(spark, tmp_path)
    all_files = t._manifest(t.current_version())["files"]
    assert len(all_files) == 8
    # a probe inside one commit's range touches at most 2 of 8 files
    assert len(t.pruned_files("k", 30, 40)) <= 2
    # disjoint probe touches zero
    assert t.pruned_files("k", 1000, 2000) == []
    # an unknown column is conservatively unprunable
    assert len(t.pruned_files("nope", 0, 1)) == 8
    # unbounded on both sides keeps everything
    assert len(t.pruned_files("k")) == 8


def test_pruned_read_empty_range_keeps_schema(spark, tmp_path):
    t = _range_table(spark, tmp_path)
    out = t.read_pruned(spark, "k", 1000, 2000)
    assert out.columns == ["k", "v"]
    assert out.count() == 0


def test_stats_survive_compact_and_merge(spark, tmp_path):
    t = _range_table(spark, tmp_path)
    t.compact(spark, target_partitions=2)
    stats = t.snapshot_stats()
    assert len(stats) == 2
    assert all("k" in st for st in stats.values())
    # pruning still correct after the rewrite
    got = sorted(r.k for r in t.read_pruned(spark, "k", 10, 20).collect())
    assert got == list(range(10, 21))


def test_timestamp_time_travel_and_history(spark, tmp_path):
    import time

    t = ManifestTable(str(tmp_path / "tbl"))
    marks = []
    for i in range(3):
        t.commit(spark.createDataFrame([(i, "x")], "k long, v string"))
        marks.append(time.time())
        time.sleep(0.02)
    # as-of each mark resolves to the version committed before it
    for i, m in enumerate(marks):
        v = t.version_at(m)
        assert v == i + 1
        assert sorted(r.k for r in t.read(spark, v).collect()) == list(range(i + 1))
    with pytest.raises(ValueError, match="no snapshot"):
        t.version_at(marks[0] - 3600)
    h = {r.version: r for r in t.history(spark).collect()}
    assert sorted(h) == [1, 2, 3]
    assert all(h[v].operation == "append" for v in h)
    assert h[1].ts <= h[2].ts <= h[3].ts
    assert h[3].n_files == h[1].n_added + h[2].n_added + h[3].n_added
    assert all(h[v].n_added >= 1 for v in h)
    t.compact(spark, target_partitions=1)
    h2 = {r.version: r for r in t.history(spark).collect()}
    assert h2[4].operation == "compact"


def test_zorder_compact_prunes_both_dimensions(spark, tmp_path):
    """After OPTIMIZE ZORDER, a 2-D range probe must skip files on BOTH
    columns, and multi-predicate pruned reads must equal the filtered
    full read."""
    import pyspark.sql.functions as F

    t = ManifestTable(str(tmp_path / "tbl"))
    rows = [(i, (i * 37) % 100, f"v{i}") for i in range(400)]
    df = spark.createDataFrame(rows, "a long, b long, v string")
    t.commit(df.repartitionByRange(8, "a"))  # clustered on a only
    before_files = t.pruned_files(preds={"b": (10, 20)})
    t.compact(spark, target_partitions=8, zorder_by=("a", "b"), zorder_bits=7)
    after_files = t.pruned_files(preds={"b": (10, 20)})
    # z-ordering tightens per-file b-ranges: strictly fewer files match
    assert len(after_files) < len(before_files)
    # 2-D predicate prunes at least as hard as either dimension alone
    both = t.pruned_files(preds={"a": (0, 100), "b": (10, 20)})
    assert len(both) <= len(after_files)
    # correctness: pruned read == full read + filters, at every probe
    for preds in [{"a": (0, 100), "b": (10, 20)}, {"a": (350, None)},
                  {"b": (None, 5)}, {"a": (900, 999)}]:
        base = t.read(spark)
        for c, (lo, hi) in preds.items():
            if lo is not None:
                base = base.where(F.col(c) >= lo)
            if hi is not None:
                base = base.where(F.col(c) <= hi)
        want = sorted(r.a for r in base.collect())
        got = sorted(r.a for r in t.read_pruned(spark, preds=preds).collect())
        assert got == want, preds
    # the rewrite is lossless
    assert t.read(spark).count() == 400


def test_vacuum_retention_protects_in_flight_commits(spark, tmp_path):
    """The concurrent-writer hazard: a data dir written but not yet
    manifest-published must survive a default-retention vacuum."""
    t = _mk(spark, tmp_path, [[(1, "a")]])
    t._write_data(spark.createDataFrame([(9, "inflight")], "k long, v string"), 2)
    assert t.vacuum_orphans() == []  # default window: fresh dir untouched
    dirs = [d for d in glob.glob(os.path.join(t.root, "data", "*")) if os.path.isdir(d)]
    assert len(dirs) == 2  # committed v1 + the in-flight attempt
    # explicit zero window (single-writer maintenance) reclaims it
    assert t.vacuum_orphans(min_age_seconds=0)


def test_commit_check_constraint_rejects_before_writing(spark, tmp_path):
    from gridmr_spark.sources.table_format import ConstraintViolation

    t = _mk(spark, tmp_path, [[(1, "a")]])
    bad = spark.createDataFrame([(2, "b"), (-5, "c")], "k long, v string")
    with pytest.raises(ConstraintViolation, match="1 written row"):
        t.commit(bad, check="k >= 0")
    # no manifest published: no new version, readers never see the rows,
    # and the rejected attempt's files are a vacuumable orphan
    assert t.versions() == [1]
    assert sorted(r.k for r in t.read(spark).collect()) == [1]
    assert t.vacuum_orphans(min_age_seconds=0)
    # the passing subset commits fine under the same constraint
    ok = spark.createDataFrame([(2, "b")], "k long, v string")
    assert t.commit(ok, check="k >= 0") == 2


def test_commit_enforce_schema_rejects_drift(spark, tmp_path):
    from gridmr_spark.sources.table_format import ConstraintViolation

    t = _mk(spark, tmp_path, [[(1, "a")]])
    drifted = spark.createDataFrame([(2, "b", 1.5)], "k long, v string, extra double")
    with pytest.raises(ConstraintViolation, match="schema drift"):
        t.commit(drifted, enforce_schema=True)
    retyped = spark.createDataFrame([(2, "b")], "k int, v string")
    with pytest.raises(ConstraintViolation, match="schema drift"):
        t.commit(retyped, enforce_schema=True)  # same names, narrower type
    # default stays permissive (the additive-evolution path)
    assert t.commit(drifted) == 2
    assert "extra" in t.read(spark, merge_schema=True).columns


def test_restore_is_metadata_only_rollback(spark, tmp_path):
    t = _mk(spark, tmp_path, [[(1, "a")], [(2, "b")]])
    t.delete_where(spark, "k = 1")  # v3: the "bad" change
    assert sorted(r.k for r in t.read(spark).collect()) == [2]
    n_dirs_before = len([d for d in glob.glob(os.path.join(t.root, "data", "*"))
                         if os.path.isdir(d)])
    v = t.restore(2)
    assert v == 4
    # rollback visible, zero data movement (no new data dirs)
    assert sorted(r.k for r in t.read(spark).collect()) == [1, 2]
    n_dirs_after = len([d for d in glob.glob(os.path.join(t.root, "data", "*"))
                        if os.path.isdir(d)])
    assert n_dirs_after == n_dirs_before
    # the bad version stays time-travelable; the log records the restore
    assert sorted(r.k for r in t.read(spark, 3).collect()) == [2]
    h = {r.version: r.operation for r in t.history(spark).collect()}
    assert h[4] == "restore"
    with pytest.raises(ValueError, match="overwrite|restore"):
        t.diff(spark, 2, 4)  # neither deletes nor restores are appends
    with pytest.raises(ValueError, match="restore"):
        t.diff(spark, 3, 4)  # the restore itself refuses incremental reads
    # expire keeps the restored snapshot intact
    t.expire(keep_last=1)
    assert sorted(r.k for r in t.read(spark).collect()) == [1, 2]


def test_shallow_clone_shares_files_and_diverges(spark, tmp_path):
    src = _mk(spark, tmp_path, [[(1, "a")], [(2, "b")]])
    dest = src.clone_to(str(tmp_path / "clone"))
    assert sorted(r.k for r in dest.read(spark).collect()) == [1, 2]
    # metadata-only: the clone references the SOURCE's files
    assert dest._manifest(1)["files"] == src._manifest(2)["files"]
    assert not os.path.isdir(os.path.join(dest.root, "data"))
    # stats came along: the clone prunes like the source (empty part
    # files carry no footer stats and stay conservatively unprunable)
    assert any("k" in st for st in dest.snapshot_stats().values())
    assert dest.pruned_files("k", 1, 1) == src.pruned_files("k", 1, 1)
    # writes diverge: the clone's commit doesn't touch the source
    dest.commit(spark.createDataFrame([(9, "z")], "k long, v string"))
    assert sorted(r.k for r in dest.read(spark).collect()) == [1, 2, 9]
    assert sorted(r.k for r in src.read(spark).collect()) == [1, 2]
    # non-empty destination refused
    with pytest.raises(ValueError, match="not empty"):
        src.clone_to(str(tmp_path / "clone"))
    # historical-version clone
    old = src.clone_to(str(tmp_path / "clone_v1"), version=1)
    assert sorted(r.k for r in old.read(spark).collect()) == [1]


def test_zorder_compact_guards_internal_column_collision(spark, tmp_path):
    """ADVICE r9: a user table with a column literally named ``_z`` must
    not have it silently replaced by the morton working key (and then
    dropped) during OPTIMIZE ZORDER — compact fails loudly instead, and
    plain compact (no zorder) still works on the same table."""
    t = ManifestTable(str(tmp_path / "tbl"))
    df = spark.createDataFrame([(1, 2, "keep")], "a long, b long, _z string")
    t.commit(df)
    with pytest.raises(ValueError, match="_z"):
        t.compact(spark, target_partitions=1, zorder_by=("a", "b"))
    v = t.compact(spark, target_partitions=1)  # non-zorder path unaffected
    rows = t.read(spark, v).collect()
    assert [(r.a, r.b, r._z) for r in rows] == [(1, 2, "keep")]


# ---------------------------------------------------------------------------
# Two-level manifests (round 10): metadata cost + group-granular pruning
# ---------------------------------------------------------------------------


def test_snapshot_manifest_is_a_manifest_list_not_a_file_list(spark, tmp_path):
    """The published snapshot JSON must stay O(#groups): no data-file
    paths inline, one group entry per commit, counts carried on the
    entries. This is the property that keeps commit metadata flat as the
    table grows — the single-level format rewrote the FULL cumulative
    file list every commit."""
    import json

    t = ManifestTable(str(tmp_path / "tbl"))
    for i in range(4):
        t.commit(
            spark.createDataFrame([(i, f"v{i}")], "k long, v string")
            .coalesce(1)
        )
    raw = json.load(open(os.path.join(t._mdir, "v00004.json")))
    assert raw["format"] == 2
    assert "files" not in raw and "added" not in raw
    assert len(raw["groups"]) == 4
    assert all(g["n_files"] >= 1 for g in raw["groups"])
    assert raw["added_groups"] == [raw["groups"][-1]["path"]]
    assert ".parquet" not in json.dumps(raw)  # no data paths at this level
    # group summaries carry the per-column envelope for pruning
    assert all("k" in g["summary"] for g in raw["groups"])
    # and the resolved view still honors the flat contract
    m = t._manifest(4)
    n = sum(g["n_files"] for g in raw["groups"])
    assert len(m["files"]) == n and len(m["added"]) == raw["groups"][-1]["n_files"]


def test_pruned_read_opens_only_intersecting_group_manifests(spark, tmp_path):
    """Group-summary skipping: a probe into one commit's key range must
    open exactly that group's manifest — O(matching groups) metadata,
    the two-level format's reason to exist."""
    t = ManifestTable(str(tmp_path / "tbl"))
    for base in (0, 1000, 2000, 3000):
        rows = [(base + i, f"v{base + i}") for i in range(50)]
        t.commit(
            spark.createDataFrame(rows, "k long, v string")
            .repartitionByRange(4, "k")
        )
    # fresh instance: no warm caches
    t2 = ManifestTable(t.root)
    files = t2.pruned_files("k", lo=2010, hi=2040)
    assert t2.group_opens == 1  # three groups skipped on summary alone
    assert files and all(os.path.exists(f) for f in files)
    got = sorted(r.k for r in t2.read_pruned(spark, "k", lo=2010, hi=2015).collect())
    assert got == list(range(2010, 2016))
    # a probe missing every group opens nothing
    t3 = ManifestTable(t.root)
    assert t3.pruned_files("k", lo=90000, hi=99999) == []
    assert t3.group_opens == 0


def test_expire_reclaims_unreferenced_group_manifests(spark, tmp_path):
    """Dropping versions must also garbage-collect group manifests no
    surviving snapshot references — and ONLY those (shared groups
    survive, a clone's source-owned groups survive)."""
    t = _mk(spark, tmp_path, [[(1, "a")], [(2, "b")]])
    t.compact(spark, target_partitions=1)  # v3 references only its own group
    g1 = {g["path"] for g in t._raw(1).get("groups", [])}
    g3 = {g["path"] for g in t._raw(3).get("groups", [])}
    t.expire(keep_last=1)
    assert all(not os.path.exists(p) for p in g1)  # v1/v2 groups reclaimed
    assert all(os.path.exists(p) for p in g3)
    assert sorted(r.k for r in t.read(spark).collect()) == [1, 2]
    # clone: expiring the CLONE never deletes source-owned group files
    src = _mk(spark, tmp_path / "srcdir", [[(7, "x")]])
    dest = src.clone_to(str(tmp_path / "clonedir"))
    dest.commit(spark.createDataFrame([(8, "y")], "k long, v string"))
    src_groups = {g["path"] for g in src._raw(1)["groups"]}
    dest.expire(keep_last=1)  # drops the cloned v1
    assert all(os.path.exists(p) for p in src_groups)
    assert sorted(r.k for r in src.read(spark).collect()) == [7]


def test_format1_manifests_stay_readable_and_upgrade_on_write(spark, tmp_path):
    """A table whose history predates two-level manifests (inline
    files/stats) must read, prune, and time-travel unchanged — and the
    first commit on top of it upgrades transparently (legacy snapshot
    wrapped into one group)."""
    import json

    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit(
        spark.createDataFrame([(1, "a"), (5, "b")], "k long, v string").coalesce(1)
    )
    # rewrite v1 as a FORMAT-1 manifest (what an old table has on disk)
    m = dict(t._manifest(1))
    m["stats"] = t.snapshot_stats(1)
    for g in t._raw(1)["groups"]:
        os.remove(g["path"])
    os.remove(os.path.join(t._mdir, "v00001.json"))
    with open(os.path.join(t._mdir, "v00001.json"), "w") as f:
        json.dump(m, f)
    t = ManifestTable(t.root)  # cold caches
    assert sorted(r.k for r in t.read(spark).collect()) == [1, 5]
    assert any("k" in st for st in t.snapshot_stats().values())
    assert t.pruned_files("k", lo=100, hi=200) == []
    v2 = t.commit(spark.createDataFrame([(9, "c")], "k long, v string"))
    raw2 = t._raw(v2)
    assert raw2["format"] == 2 and len(raw2["groups"]) == 2
    assert sorted(r.k for r in t.read(spark, v2).collect()) == [1, 5, 9]
    # the upgraded group carries the legacy stats forward
    assert any("k" in st for st in t.snapshot_stats(v2).values())


def test_clone_of_format1_source_survives_source_vacuum(spark, tmp_path):
    """Review-found hazard: cloning a format-1 (pre-two-level) source must
    NOT leave the upgrade group manifest in the SOURCE's groups dir where
    no source snapshot references it — the source's routine vacuum would
    reclaim it and brick the clone. The upgrade group belongs to the
    clone."""
    import json

    src = ManifestTable(str(tmp_path / "src"))
    src.commit(
        spark.createDataFrame([(1, "a"), (5, "b")], "k long, v string").coalesce(1)
    )
    # rewrite v1 as a format-1 manifest (an old table on disk)
    m = dict(src._manifest(1))
    m["stats"] = src.snapshot_stats(1)
    for g in src._raw(1)["groups"]:
        os.remove(g["path"])
    os.remove(os.path.join(src._mdir, "v00001.json"))
    with open(os.path.join(src._mdir, "v00001.json"), "w") as f:
        json.dump(m, f)
    src = ManifestTable(src.root)
    dest = src.clone_to(str(tmp_path / "dest"))
    # the clone's group manifest lives under DEST, not SRC
    gpaths = [g["path"] for g in dest._raw(1)["groups"]]
    assert all(p.startswith(dest._gdir + os.sep) for p in gpaths)
    # source maintenance cannot touch it
    src.vacuum_orphans(min_age_seconds=0)
    assert sorted(r.k for r in dest.read(spark).collect()) == [1, 5]
    assert any("k" in st for st in dest.snapshot_stats().values())


def test_rewrite_manifests_is_metadata_only_and_crossable(spark, tmp_path):
    """Iceberg's rewrite_manifests on this format: groups merge into
    balanced new group manifests, the logical snapshot is byte-identical
    with ZERO new data directories, pruning works off the recomputed
    summaries, incremental reads CROSS it (unlike compact/overwrite),
    and expire reclaims the superseded group files."""
    import glob as _glob

    t = ManifestTable(str(tmp_path / "tbl"))
    for base in (0, 1000, 2000, 3000, 4000, 5000):
        rows = [(base + i, f"v{base + i}") for i in range(20)]
        t.commit(
            spark.createDataFrame(rows, "k long, v string").repartitionByRange(2, "k")
        )
    before_files = t._manifest(6)["files"]
    data_dirs_before = set(_glob.glob(os.path.join(t.root, "data", "*")))
    old_groups = {g["path"] for g in t._raw(6)["groups"]}
    assert len(old_groups) == 6

    v = t.rewrite_manifests(target_groups=2)
    assert v == 7
    raw7 = t._raw(7)
    assert raw7["operation"] == "rewrite_manifests"
    assert len(raw7["groups"]) == 2 and raw7["added_groups"] == []
    # zero data movement: same files, same order, no new data dirs
    assert t._manifest(7)["files"] == before_files
    assert set(_glob.glob(os.path.join(t.root, "data", "*"))) == data_dirs_before
    assert sorted(r.k for r in t.read(spark).collect()) == sorted(
        r.k for r in t.read(spark, 6).collect()
    )
    # summaries recomputed: pruning still group-granular on a cold instance
    t2 = ManifestTable(t.root)
    pruned = t2.pruned_files("k", lo=5005, hi=5010)
    assert pruned and t2.group_opens == 1
    # incremental reads cross the rewrite (it contributes zero rows) ...
    t.commit(spark.createDataFrame([(9999, "x")], "k long, v string"))
    got = sorted(r.k for r in t.diff(spark, 6, 8).collect())
    assert got == [9999]
    # ... while a data rewrite still refuses
    t.compact(spark, target_partitions=1)
    with pytest.raises(ValueError, match="compact"):
        t.diff(spark, 6, 9)
    # expire reclaims the superseded group files (no survivor references)
    t.expire(keep_last=1)
    assert all(not os.path.exists(p) for p in old_groups)


def test_changelog_stream_crosses_rewrite_manifests(spark, tmp_path):
    """The changelog source must deliver rows around a rewrite_manifests
    snapshot without error even at on_rewrite=error (it is metadata-only:
    nothing was added, nothing was rewritten)."""
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit(spark.createDataFrame([("a1", "b1")], "a string, b string"))
    t.rewrite_manifests()
    t.commit(spark.createDataFrame([("a2", "b2")], "a string, b string"))
    got = _run_changelog(spark, t, str(tmp_path / "run"))
    rows = {(r.a, r.b) for r in got.collect()}
    assert rows == {("a1", "b1"), ("a2", "b2")}


def test_diff_over_pure_rewrite_range_is_empty_not_error(spark, tmp_path):
    """The crossability contract taken literally: a diff range containing
    ONLY rewrite_manifests snapshots added nothing — the incremental
    consumer gets an EMPTY frame with the snapshot schema, not a crash
    (routine maintenance must never break a polling reader)."""
    t = _mk(spark, tmp_path, [[(1, "a")]])
    t.rewrite_manifests()
    out = t.diff(spark, 1, 2)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["k", "v"]
    # and the genuinely-empty-range error is preserved for misuse
    with pytest.raises(ValueError, match="need 0 <= v_from < v_to"):
        t.diff(spark, 2, 2)


def test_rewrite_manifests_rejects_empty_snapshot(tmp_path):
    t = ManifestTable(str(tmp_path / "tbl"))
    with pytest.raises(ValueError, match="nothing to rewrite"):
        t.rewrite_manifests()


def test_partial_cow_delete_carries_untouched_files_by_reference(spark, tmp_path):
    """delete_where rewrites ONLY files containing a matching row;
    untouched files appear in the new snapshot under their ORIGINAL paths
    and untouched groups are carried as the SAME group manifest (zero
    writes for them) — write amplification is the delete's footprint."""
    t = ManifestTable(str(tmp_path / "tbl"))
    for lo in (0, 100, 200):
        t.commit(
            spark.range(lo, lo + 100)
            .selectExpr("id as k", "concat('v', id) as v")
            .coalesce(1)
        )
    before_files = t._manifest(3)["files"]
    before_groups = [e["path"] for e in t._groups_of(3)]
    t.delete_where(spark, (F.col("k") >= 150) & (F.col("k") < 160))
    after_files = set(t._manifest(4)["files"])
    after_groups = [e["path"] for e in t._groups_of(4)]
    touched = set(t._added_files(2))  # the middle commit's file(s)
    untouched = set(before_files) - touched
    assert untouched <= after_files                 # carried by path identity
    assert not (touched & after_files)              # affected files replaced
    # untouched groups carried verbatim (same manifest object)
    assert set(before_groups) - {before_groups[1]} <= set(after_groups)
    # rows are exactly the survivors
    got = sorted(r.k for r in t.read(spark).collect())
    assert got == [k for k in range(300) if not 150 <= k < 160]


def test_partial_cow_merge_carries_untouched_files_by_reference(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "tbl"))
    for lo in (0, 100):
        t.commit(
            spark.range(lo, lo + 100)
            .selectExpr("id as k", "concat('v', id) as v")
            .coalesce(1)
        )
    ups = spark.createDataFrame([(150, "UP"), (999, "NEW")], "k long, v string")
    t.merge_by_key(spark, ups, "k")
    after_files = set(t._manifest(3)["files"])
    untouched = set(t._added_files(1))
    touched = set(t._added_files(2))
    assert untouched <= after_files
    assert not (touched & after_files)
    got = {r.k: r.v for r in t.read(spark).collect()}
    assert got[150] == "UP" and got[999] == "NEW" and got[0] == "v0"
    assert len(got) == 201


def test_compact_small_bin_packs_only_small_files(spark, tmp_path):
    """compact_small rewrites only sub-threshold files; healthy files
    carry forward by path identity, rows survive exactly, and diff
    refuses to cross the rewrite like full compact."""
    t = ManifestTable(str(tmp_path / "tbl"))
    # v1: one "healthy" file (single part), v2+v3: small-file debt
    t.commit(
        spark.range(0, 1000).selectExpr("id as k", "concat('v', id) as v").coalesce(1)
    )
    t.commit(spark.createDataFrame([(2000, "a")], "k long, v string").coalesce(1))
    t.commit(spark.createDataFrame([(2001, "b")], "k long, v string").coalesce(1))
    healthy = set(t._added_files(1))
    debt = set(t._added_files(2)) | set(t._added_files(3))
    before = sorted(r.k for r in t.read(spark).collect())

    v = t.compact_small(spark, small_mb=0.005)  # healthy file ~13KB > 5KB
    after_files = set(t._manifest(v)["files"])
    assert healthy <= after_files                    # carried by reference
    assert not (debt & after_files)                  # debt rewritten
    assert len(after_files) == len(healthy) + 1      # packed into one file
    assert sorted(r.k for r in t.read(spark).collect()) == before
    with pytest.raises(ValueError, match="compact"):
        t.diff(spark, 1, v)
    # nothing small -> pure metadata snapshot, zero data movement
    v2 = t.compact_small(spark, small_mb=0.000001)
    assert set(t._manifest(v2)["files"]) == after_files


def test_merge_on_zordered_table_rewrites_only_overlapping_files(spark, tmp_path):
    """The stats-planned merge composes with clustering: after a z-order
    compact, files carry tight key ranges, so a narrow-key merge's
    candidate set (manifest min/max overlap) is a small fraction of the
    table — the production shape where partial COW pays off."""
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit(
        spark.range(4096).selectExpr("id as k", "id as k2", "concat('v', id) as v")
    )
    t.compact(spark, target_partitions=8, zorder_by=("k", "k2"), zorder_bits=6)
    n_files = len(t._manifest(2)["files"])
    assert n_files == 8
    ups = spark.createDataFrame([(5, 5, "UP"), (9, 9, "UP")], "k long, k2 long, v string")
    v = t.merge_by_key(spark, ups, "k")
    before = set(t._manifest(2)["files"])
    after = set(t._manifest(v)["files"])
    carried = before & after
    # low keys cluster into few files: most of the table is untouched
    assert len(carried) >= n_files - 2, (len(carried), n_files)
    got = {r.k: r.v for r in t.read(spark).collect()}
    assert got[5] == "UP" and got[9] == "UP" and got[0] == "v0"
    assert len(got) == 4096


def test_changelog_stream_cdc_mode_maintains_view_through_rewrites(spark, tmp_path):
    """on_rewrite=cdc: rewrites stream as signed I/D rows (file-set delta
    per version — the rewrite's footprint under partial COW). The feed is
    net-exact: folding it with the Z-set signed algebra reproduces the
    final snapshot's aggregate exactly through delete + merge + append."""
    from gridmr_spark.sources.table_format import register_changelog_source

    t = _mk(spark, tmp_path, [[(1, "a"), (2, "b"), (3, "c")], [(4, "d")]])
    t.delete_where(spark, F.col("k") == 2)                         # v3 rewrite
    t.merge_by_key(
        spark, spark.createDataFrame([(3, "C"), (5, "e")], "k long, v string"), "k"
    )                                                              # v4 rewrite
    t.commit(spark.createDataFrame([(6, "f")], "k long, v string"))  # v5 append

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
    # signed fold of the whole feed == the final snapshot, exactly
    folded = (
        feed.withColumn("w", F.when(F.col("_op") == "I", 1).otherwise(-1))
        .groupBy("k", "v")
        .agg(F.sum("w").alias("n"))
        .where(F.col("n") != 0)
    )
    got = sorted((r.k, r.v, r.n) for r in folded.collect())
    want = sorted((r.k, r.v, 1) for r in t.read(spark).collect())
    assert got == want
    # and the D side is bounded by the rewrites' true footprint: k=1 was
    # never touched by either rewrite (its file carried by reference), so
    # it must not appear with _op='D'
    assert feed.where((F.col("_op") == "D") & (F.col("k") == 1)).count() == 0


def test_expire_after_partial_delete_reclaims_only_replaced_files(spark, tmp_path):
    """Partial COW + expire: after a partial delete, expiring history
    must physically reclaim ONLY the replaced file — carried files are
    live members of the surviving snapshot."""
    t = ManifestTable(str(tmp_path / "tbl"))
    for lo in (0, 100):
        t.commit(
            spark.range(lo, lo + 100)
            .selectExpr("id as k", "concat('v', id) as v")
            .coalesce(1)
        )
    touched = set(t._added_files(2))
    carried = set(t._added_files(1))
    t.delete_where(spark, F.col("k") == 150)  # rewrites only commit 2's file
    removed = set(t.expire(keep_last=1))
    assert removed == touched
    for f in carried:
        assert os.path.exists(f)
    got = sorted(r.k for r in t.read(spark).collect())
    assert got == [k for k in range(200) if k != 150]


def test_changefeed_of_pure_metadata_range_is_empty(spark, tmp_path):
    t = _mk(spark, tmp_path, [[(1, "a"), (2, "b")]])
    t.rewrite_manifests()
    t.restore(1)
    feed = t.changefeed(spark, 1, 3)
    assert feed.count() == 0
    assert feed.columns[-1] == "_op"


def test_compact_small_packs_across_additive_schema_change(spark, tmp_path):
    """Slivers straddling an additive schema change pack with the UNION
    of their columns (older rows NULL-backfilled), not whichever schema
    the reader happened to sample."""
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit(spark.createDataFrame([(1, "a")], "k long, v string").coalesce(1))
    t.commit(
        spark.createDataFrame([(2, "b", 7)], "k long, v string, extra long").coalesce(1)
    )
    v = t.compact_small(spark, small_mb=1.0)
    got = t.read(spark, v, merge_schema=True)
    rows = {r.k: (r.v, r.extra) for r in got.collect()}
    assert rows == {1: ("a", None), 2: ("b", 7)}


# ---------------------------------------------------------------------------
# Round 13: hidden partitioning (partition_by transform -> __pt pruning)
# ---------------------------------------------------------------------------


def test_partition_by_prunes_before_any_file_stat(spark, tmp_path):
    """commit(partition_by=...) records one transform value per file;
    partition predicates prune at the group/file metadata level and the
    SCAN's actual file list (df.inputFiles()) never names a file outside
    the predicate."""
    t = ManifestTable(str(tmp_path / "tbl"))
    df = spark.range(1000).selectExpr("id as k", "id % 10 as bucket", "concat('v', id) as v")
    t.commit(df, partition_by="k % 10")
    all_files = t._manifest(1)["files"]
    assert len(all_files) == 10  # one file per partition value
    kept = t.pruned_files(preds={"__pt": (3, 4)})
    assert len(kept) == 2
    r = t.read_pruned(spark, preds={"__pt": (3, 4)})
    # plan-level: the scan lists ONLY in-partition files
    import os as _os

    scanned = {_os.path.realpath(p.replace("file:", "")) for p in r.inputFiles()}
    assert scanned == {_os.path.realpath(f) for f in kept}
    assert sorted(x.k for x in r.collect()) == sorted(
        k for k in range(1000) if k % 10 in (3, 4)
    )
    # reads keep source columns (no hive-discovery dependency)
    assert set(t.read(spark).columns) == {"k", "bucket", "v"}
    assert t.read(spark).count() == 1000


def test_partition_by_date_transform_and_mixed_history(spark, tmp_path):
    """A month() transform prunes a date-range probe; a later
    UNPARTITIONED append stays conservatively unprunable (kept for any
    partition predicate) and results remain exact."""
    t = ManifestTable(str(tmp_path / "tbl"))
    df = spark.sql(
        "SELECT id AS k, date_add(date'2024-01-01', CAST(id % 90 AS INT)) AS d "
        "FROM range(900)"
    )
    t.commit(df, partition_by="month(d)")
    assert t._raw(1)["partition_by"] == "month(d)"
    kept = t.pruned_files(preds={"__pt": (2, 2)})   # February only
    assert 0 < len(kept) < len(t._manifest(1)["files"])
    got = t.read_pruned(spark, preds={"__pt": (2, 2)})
    want = df.where("month(d) = 2")
    assert got.count() == want.count() > 0
    # mixed history: an EXPLICITLY unpartitioned append (partition_by="")
    # DROPS the table-level spec, so a bare __pt predicate has no spec to
    # build a residual from — the exact read refuses, naming the fix
    # (pt_preds), and partition_exact=False returns the superset. (With
    # the spec RETAINED, unstamped files get the computed residual
    # instead — test_partition_by_null_values_unprunable.)
    t.commit(spark.sql("SELECT 9999 AS k, date'2024-02-15' AS d"), partition_by="")
    kept2 = t.pruned_files(preds={"__pt": (2, 2)})
    assert len(kept2) == len(kept) + 1
    with pytest.raises(ValueError, match="partition_exact"):
        t.read_pruned(spark, preds={"__pt": (2, 2)})
    assert (
        t.read_pruned(spark, preds={"__pt": (2, 2)}, partition_exact=False)
        .where("month(d) = 2")
        .count()
        == want.count() + 1
    )
    # the explicit per-spec form rebuilds the residual and reads EXACT
    got2 = t.read_pruned(spark, pt_preds={"month(d)": (2, 2)})
    assert got2.count() == want.count() + 1
    assert got2.where("k = 9999").count() == 1


def test_partition_by_null_values_unprunable(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "tbl"))
    df = spark.sql(
        "SELECT id AS k, CASE WHEN id < 5 THEN NULL ELSE id % 3 END AS g "
        "FROM range(30)"
    )
    t.commit(df, partition_by="g")
    # the NULL partition's file has no __pt stat -> kept for any range;
    # the exact read (round 14) applies the computed residual over it, so
    # NULL-partition rows are excluded (a NULL transform value is not in
    # any range) and the result is exact without a caller-side filter
    kept = t.pruned_files(preds={"__pt": (1, 1)})
    got = sorted(r.k for r in t.read_pruned(spark, preds={"__pt": (1, 1)}).collect())
    assert got == sorted(k for k in range(30) if k >= 5 and k % 3 == 1)
    # the superset read still keeps the NULL file's rows for the caller
    sup = t.read_pruned(spark, preds={"__pt": (1, 1)}, partition_exact=False)
    assert sup.where("g IS NULL").count() == 5
    assert len(kept) == 2  # g=1 file + the null file


def test_vacuum_never_reclaims_live_partitioned_dirs(spark, tmp_path):
    """A hidden-partitioned commit nests its files one directory deeper;
    vacuum must mark the ANCESTOR version directory live (round-13 fix),
    while a torn partitioned write attempt is still reclaimed —
    recursively, markers and all."""
    import shutil as _sh

    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit(
        spark.range(100).selectExpr("id as k", "concat('v', id) as v"),
        partition_by="k % 4",
    )
    live = set(t._manifest(1)["files"])
    # simulate a torn partitioned write: copy a live version dir to an
    # unreferenced name (data written, manifest never published)
    vdir = os.path.dirname(os.path.dirname(next(iter(live))))
    orphan = os.path.join(os.path.dirname(vdir), "v99999-deadbeef")
    _sh.copytree(vdir, orphan)
    removed = t.vacuum_orphans(min_age_seconds=0)
    # live partitioned data untouched, reads exact
    assert all(os.path.exists(f) for f in live)
    assert sorted(r.k for r in t.read(spark).collect()) == list(range(100))
    # the orphan attempt is gone, its nested parquet files reported
    assert not os.path.exists(orphan)
    assert any(orphan in p for p in removed)


def test_compact_establishes_partition_spec(spark, tmp_path):
    """compact(partition_by=...) converts a mixed/unpartitioned table to
    hidden-partitioned in one transactional snapshot: every file carries a
    __pt value afterwards, partition reads are exact again (no
    partition_exact refusal), and DV deletes materialized on the way."""
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit(spark.range(100).selectExpr("id as k", "id % 5 as g"))
    t.commit(spark.range(100, 150).selectExpr("id as k", "id % 5 as g"))
    t.delete_where(spark, F.col("k") == 7, mode="dv")
    v = t.compact(spark, partition_by="g")
    assert t._raw(v)["operation"] == "compact"
    assert t._raw(v)["partition_by"] == "g"
    assert t._dv(v)["files"] == []            # DV materialized away
    assert len(t._manifest(v)["files"]) == 5  # one file per partition value
    got = sorted(
        r.k for r in t.read_pruned(spark, preds={"__pt": (2, 2)}).collect()
    )
    assert got == [k for k in range(150) if k % 5 == 2 and k != 7]


def test_partition_spec_inherited_by_writes_and_rewrites(spark, tmp_path):
    """Table-level spec semantics (Iceberg): once established, plain
    appends AND partial rewrites (cow delete, merge, bin-packing, DV
    materialize) write WITHIN the spec — partition reads stay exact
    through the table's whole maintenance life; compact() without a spec
    drops it (full rewrite to an explicit layout)."""
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit(
        spark.range(100).selectExpr("id as k", "id % 4 as g"), partition_by="g"
    )
    assert t.partition_spec() == "g"
    # plain append inherits: new files carry __pt, reads stay exact
    t.commit(spark.range(100, 140).selectExpr("id as k", "id % 4 as g"))
    assert t.partition_spec() == "g"
    got = sorted(r.k for r in t.read_pruned(spark, preds={"__pt": (1, 1)}).collect())
    assert got == [k for k in range(140) if k % 4 == 1]
    # partial COW delete rewrites within the spec
    t.delete_where(spark, F.col("k") == 5)
    assert t.partition_spec() == "g"
    got = sorted(r.k for r in t.read_pruned(spark, preds={"__pt": (1, 1)}).collect())
    assert got == [k for k in range(140) if k % 4 == 1 and k != 5]
    # merge rewrites within the spec
    t.merge_by_key(spark, spark.createDataFrame([(9, 1), (500, 0)], "k long, g long"), "k")
    assert t.partition_spec() == "g"
    got = sorted(r.k for r in t.read_pruned(spark, preds={"__pt": (0, 0)}).collect())
    assert 500 in got
    # dv delete (metadata-only) + materialize keep the spec
    t.delete_where(spark, F.col("k") == 8, mode="dv")
    assert t.partition_spec() == "g"
    t.materialize_dv(spark, target_rows=0)
    assert t.partition_spec() == "g"
    got = sorted(r.k for r in t.read_pruned(spark, preds={"__pt": (0, 0)}).collect())
    assert 8 not in got and 500 in got
    # plain compact drops the spec (documented full-rewrite layout verb)
    t.compact(spark, target_partitions=2)
    assert t.partition_spec() is None


def test_partition_splits_bound_file_size_within_values(spark, tmp_path):
    """partition_splits=K writes K files per partition value (the
    target-file-size dial: one file per value is a multi-TB file on a
    100-TB month); every split carries the same __pt, pruning and reads
    stay exact."""
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit(
        spark.range(600).selectExpr("id as k", "id % 2 as g"),
        partition_by="g",
        partition_splits=3,
    )
    files = t._manifest(1)["files"]
    stats = t.snapshot_stats(1)
    by_pt = {}
    for f in files:
        v = stats[f]["__pt"][0]
        by_pt.setdefault(v, []).append(f)
    # hash collisions can merge splits but never exceed them
    assert sorted(by_pt) == [0, 1]
    assert all(2 <= len(v) <= 3 for v in by_pt.values())
    kept = t.pruned_files(preds={"__pt": (1, 1)})
    assert set(kept) == set(by_pt[1])
    got = sorted(r.k for r in t.read_pruned(spark, preds={"__pt": (1, 1)}).collect())
    assert got == [k for k in range(600) if k % 2 == 1]


def test_string_partition_values_never_collapse_numerically(spark, tmp_path):
    """Round-trip-safe __pt coercion: string values '1' and '01' are
    distinct partitions; collapsing both onto int 1 would leak rows
    through the residual-less partition read."""
    t = ManifestTable(str(tmp_path / "tbl"))
    df = spark.createDataFrame(
        [(1, "1"), (2, "01"), (3, "2"), (4, "x")], "k long, s string"
    )
    t.commit(df, partition_by="s")
    stats = t.snapshot_stats(1)
    vals = sorted(str(st["__pt"][0]) for st in stats.values())
    assert vals == ["01", "1", "2", "x"]
    got = sorted(
        r.k for r in t.read_pruned(spark, preds={"__pt": ("1", "1")}).collect()
    )
    assert got == [1]  # '01' stays out


def test_merge_refuses_updates_missing_a_table_column(spark, tmp_path):
    """MERGE replaces whole rows, so an updates frame MISSING a table
    column (the misspelled-column failure) must raise instead of silently
    null-filling it on every updated/inserted row; EXTRA columns remain
    allowed (additive evolution, typed-null backfill on kept rows)."""
    import pytest as _pytest

    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit(spark.createDataFrame([(1, "a", 10), (2, "b", 20)], "k long, v string, n long"))
    with _pytest.raises(ValueError, match="missing table column"):
        t.merge_by_key(
            spark, spark.createDataFrame([(1, "A")], "k long, v string"), "k"
        )
    # nothing was committed by the refused merge
    assert t.current_version() == 1
    # additive extras still work: new column null-backfills kept rows
    v = t.merge_by_key(
        spark,
        spark.createDataFrame(
            [(2, "B", 21, 0.5)], "k long, v string, n long, w double"
        ),
        "k",
    )
    got = sorted(
        (r.k, r.v, r.n, r.w) for r in t.read(spark, v, merge_schema=True).collect()
    )
    assert got == [(1, "a", 10, None), (2, "B", 21, 0.5)]


def test_partition_splits_salt_skips_nested_map_columns(spark, tmp_path):
    """xxhash64 rejects MapType anywhere in the type tree: a map nested
    inside a struct must be excluded from the split salt just like a
    top-level map, or a partitioned partition_splits>1 commit crashes at
    analysis time (round-14 ADVICE)."""
    from pyspark.sql import functions as F

    t = ManifestTable(str(tmp_path / "tbl"))
    df = spark.range(40).selectExpr(
        "id as k",
        "id % 2 as g",
        "named_struct('m', map('a', id), 'x', id) as s",
    )
    v = t.commit(df, partition_by="g", partition_splits=2)
    got = sorted(r.k for r in t.read_pruned(spark, preds={"__pt": (1, 1)}).collect())
    assert got == [k for k in range(40) if k % 2 == 1]
    # round-trip: the nested struct (map included) survives the write
    row = t.read(spark, v).where(F.col("k") == 3).first()
    assert row.s.m == {"a": 3} and row.s.x == 3
