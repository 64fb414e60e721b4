"""Multi-table transactional catalog (sources/catalog_txn.py): staged
writes are invisible to catalog readers, publish is all-or-nothing, and
conflicts serialize."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gridmr_spark.sources.catalog_txn import TableCatalog
from gridmr_spark.sources.table_format import ConcurrentCommitError, ManifestTable


def _setup(spark, tmp_path):
    root = str(tmp_path / "cat")
    a = ManifestTable(f"{root}/a")
    b = ManifestTable(f"{root}/b")
    a.commit(spark.createDataFrame([(1, "a1")], "k long, v string"))
    b.commit(spark.createDataFrame([(1, "b1")], "k long, v string"))
    cat = TableCatalog(root)
    cat.create({"a": a, "b": b})
    return cat, a, b


def _ks(df):
    return sorted(r.k for r in df.collect())


def test_staged_writes_invisible_until_catalog_publish(spark, tmp_path):
    cat, a, b = _setup(spark, tmp_path)
    txn = cat.begin()
    txn.commit_table("a", spark.createDataFrame([(2, "a2")], "k long, v string"))
    # durable in the TABLE, invisible through the CATALOG
    assert _ks(a.read(spark)) == [1, 2]
    assert _ks(cat.read(spark, "a")) == [1]
    txn.commit_table("b", spark.createDataFrame([(2, "b2")], "k long, v string"))
    v2 = txn.commit()
    assert _ks(cat.read(spark, "a")) == [1, 2]
    assert _ks(cat.read(spark, "b")) == [1, 2]
    # catalog time travel restores the PAIR, not one table
    assert _ks(cat.read(spark, "a", at=1)) == [1]
    assert _ks(cat.read(spark, "b", at=1)) == [1]
    assert v2 == 2


def test_abandoned_txn_leaves_catalog_consistent(spark, tmp_path):
    cat, a, b = _setup(spark, tmp_path)
    txn = cat.begin()
    txn.commit_table("a", spark.createDataFrame([(9, "x")], "k long, v string"))
    del txn  # crash-equivalent: staged, never published
    assert _ks(cat.read(spark, "a")) == [1]
    assert _ks(cat.read(spark, "b")) == [1]
    # a later transaction proceeds normally from the consistent base —
    # and a later staging of table `a` builds on the PIN, so the
    # abandoned (9, "x") never leaks into published state
    t2 = cat.begin()
    t2.commit_table("a", spark.createDataFrame([(2, "a2")], "k long, v string"))
    t2.commit_table("b", spark.createDataFrame([(2, "b2")], "k long, v string"))
    t2.commit()
    assert _ks(cat.read(spark, "a")) == [1, 2]
    assert _ks(cat.read(spark, "b")) == [1, 2]


def test_conflicting_transactions_serialize(spark, tmp_path):
    cat, a, b = _setup(spark, tmp_path)
    t1, t2 = cat.begin(), cat.begin()
    t1.commit_table("a", spark.createDataFrame([(2, "a2")], "k long, v string"))
    t2.commit_table("b", spark.createDataFrame([(2, "b2")], "k long, v string"))
    t1.commit()
    # even a disjoint table set conflicts: catalog history is serialized
    with pytest.raises(ConcurrentCommitError):
        t2.commit()
    t3 = cat.begin()
    t3.commit_table("b", spark.createDataFrame([(2, "b2")], "k long, v string"))
    t3.commit()
    assert _ks(cat.read(spark, "a")) == [1, 2]
    assert _ks(cat.read(spark, "b")) == [1, 2]


def test_txn_rewrite_verbs_and_guards(spark, tmp_path):
    cat, a, b = _setup(spark, tmp_path)
    txn = cat.begin()
    txn.merge_table(
        "a", spark, spark.createDataFrame([(1, "A1"), (2, "a2")], "k long, v string"), "k"
    )
    txn.delete_where("b", spark, F.col("k") == 1)
    # a fully-deleted table version: read through catalog AFTER publish
    txn.commit_table("b", spark.createDataFrame([(5, "b5")], "k long, v string"))
    txn.commit()
    assert sorted((r.k, r.v) for r in cat.read(spark, "a").collect()) == [
        (1, "A1"),
        (2, "a2"),
    ]
    assert _ks(cat.read(spark, "b")) == [5]
    with pytest.raises(ValueError, match="no table"):
        cat.begin().commit_table("zzz", a.read(spark))
    with pytest.raises(ValueError, match="staged no table"):
        cat.begin().commit()


def test_publish_race_at_the_link_itself(spark, tmp_path):
    """Two transactions that both pass the base check and race the catalog
    manifest publish: the exclusive create (os.link) decides — second
    writer of the same version raises, nothing is torn."""
    cat, a, b = _setup(spark, tmp_path)
    pins = cat.pins()
    cat._publish(2, pins)
    with pytest.raises(ConcurrentCommitError):
        cat._publish(2, pins)
    # the catalog remains readable and consistent at both versions
    assert cat.versions() == [1, 2]
    assert _ks(cat.read(spark, "a", at=2)) == [1]


# -- catalog-wide SQL surface -------------------------------------------------


def test_catalog_register_sql_joins_a_consistent_savepoint(spark, tmp_path):
    cat, a, b = _setup(spark, tmp_path)
    tx = cat.begin()
    tx.commit_table("a", spark.createDataFrame([(2, "a2")], "k long, v string"))
    tx.commit_table("b", spark.createDataFrame([(2, "b2")], "k long, v string"))
    tx.commit()  # catalog v2
    # register catalog v1: both views must resolve the ORIGINAL pins,
    # even though both tables have advanced
    names = cat.register_sql(spark, at=1, prefix="v1_")
    assert sorted(names) == ["v1_a", "v1_b"]
    joined = spark.sql(
        "SELECT v1_a.k, v1_a.v AS av, v1_b.v AS bv FROM v1_a JOIN v1_b USING (k)"
    ).collect()
    assert [(r.k, r.av, r.bv) for r in joined] == [(1, "a1", "b1")]
    # current catalog: the post-txn savepoint
    cat.register_sql(spark, prefix="cur_")
    assert spark.sql("SELECT COUNT(*) c FROM cur_a").first().c == 2
    # views are snapshot-isolated: later commits don't leak in
    a.commit(spark.createDataFrame([(3, "a3")], "k long, v string"))
    assert spark.sql("SELECT COUNT(*) c FROM cur_a").first().c == 2


# -- cross-table write-audit-publish ------------------------------------------


def test_catalog_wap_publish_flips_all_tables_atomically(spark, tmp_path):
    cat, a, b = _setup(spark, tmp_path)
    wap = cat.begin_wap()
    wap.stage("a", spark.createDataFrame([(2, "a2")], "k long, v string"))
    wap.stage("b", spark.createDataFrame([(2, "b2")], "k long, v string"))
    # audit reads see the staged state; catalog readers see the old pins
    assert _ks(wap.read(spark, "a")) == [1, 2]
    assert _ks(cat.read(spark, "a")) == [1]
    v = wap.publish()
    assert v == 2
    assert _ks(cat.read(spark, "a")) == [1, 2]
    assert _ks(cat.read(spark, "b")) == [1, 2]
    # old savepoint intact
    assert _ks(cat.read(spark, "a", at=1)) == [1]
    # branches cleaned up
    assert a.branches() == [] and b.branches() == []


def test_catalog_wap_failed_audit_leaves_every_reader_at_old_state(spark, tmp_path):
    cat, a, b = _setup(spark, tmp_path)
    wap = cat.begin_wap()
    wap.stage("a", spark.createDataFrame([(2, "a2")], "k long, v string"))
    wap.stage("b", spark.createDataFrame([(-99, "bad")], "k long, v string"))
    # audit: negative keys are invalid -> abort instead of publish
    bad = wap.read(spark, "b").where(F.col("k") < 0).count()
    assert bad == 1
    wap.abort()
    assert cat.current_version() == 1
    assert _ks(cat.read(spark, "a")) == [1]
    assert _ks(cat.read(spark, "b")) == [1]
    assert a.branches() == [] and b.branches() == []
    # main tables untouched too (branch staging never advanced main)
    assert a.current_version() == 1 and b.current_version() == 1


def test_catalog_wap_check_constraint_fails_the_stage(spark, tmp_path):
    from gridmr_spark.sources.table_format import ConstraintViolation

    cat, a, b = _setup(spark, tmp_path)
    wap = cat.begin_wap()
    with pytest.raises(ConstraintViolation):
        wap.stage(
            "a",
            spark.createDataFrame([(-1, "bad")], "k long, v string"),
            check="k >= 0",
        )
    wap.abort()
    assert cat.current_version() == 1


def test_catalog_wap_conflict_guards(spark, tmp_path):
    cat, a, b = _setup(spark, tmp_path)
    wap = cat.begin_wap()
    wap.stage("a", spark.createDataFrame([(2, "a2")], "k long, v string"))
    # another txn wins the catalog race first
    tx = cat.begin()
    tx.commit_table("b", spark.createDataFrame([(7, "b7")], "k long, v string"))
    tx.commit()
    with pytest.raises(ConcurrentCommitError, match="advanced"):
        wap.publish()
    wap.abort()


def test_catalog_timestamp_as_of_travels_the_savepoint(spark, tmp_path):
    """version_at resolves the catalog version current at a wall-clock
    instant; reads at that version see every table's pins TOGETHER."""
    import os
    import time

    from gridmr_spark.sources.catalog_txn import TableCatalog
    from gridmr_spark.sources.table_format import ManifestTable

    root = str(tmp_path / "cat")
    t_a = ManifestTable(os.path.join(root, "a"))
    t_a.commit(spark.createDataFrame([(1,)], "k long"))
    cat = TableCatalog(root)
    cat.create({"a": t_a})                                  # cv1
    mid = time.time()
    time.sleep(0.05)
    txn = cat.begin()
    txn.commit_table("a", spark.createDataFrame([(2,)], "k long"))
    txn.commit()                                            # cv2
    assert cat.version_at(mid) == 1
    assert cat.version_at(time.time()) == 2
    assert sorted(
        r.k for r in cat.read(spark, "a", at=cat.version_at(mid)).collect()
    ) == [1]
    import pytest as _pt

    with _pt.raises(ValueError, match="no version"):
        cat.version_at(mid - 10_000)


def test_catalog_create_and_drop_table_transactional(spark, tmp_path):
    """CREATE/DROP TABLE at the catalog level: the pin change lands
    atomically with every other staged write; older catalog versions
    still time-travel to the dropped table; the catalog CDC stream emits
    the add as 'I' rows and the drop as 'D' rows on the right legs."""
    import os

    import pytest as _pt

    from gridmr_spark.sources.catalog_txn import TableCatalog
    from gridmr_spark.sources.table_format import (
        ManifestTable,
        register_changelog_source,
    )

    root = str(tmp_path / "cat")
    t_a = ManifestTable(os.path.join(root, "a"))
    t_a.commit(spark.createDataFrame([(1, "a1")], "k long, v string"))
    cat = TableCatalog(root)
    cat.create({"a": t_a})                                     # cv1
    # add table b + append to a, atomically
    t_b = ManifestTable(os.path.join(root, "b"))
    t_b.commit(spark.createDataFrame([(10, "b10")], "k long, v string"))
    txn = cat.begin()
    txn.create_table("b", t_b)
    txn.commit_table("a", spark.createDataFrame([(2, "a2")], "k long, v string"))
    cv2 = txn.commit()
    assert sorted(cat.pins(cv2)) == ["a", "b"]
    assert sorted(r.k for r in cat.read(spark, "b").collect()) == [10]
    with _pt.raises(ValueError, match="already exists"):
        cat.begin().create_table("b", t_b)
    # drop b: metadata only; older versions still read it
    txn = cat.begin()
    txn.drop_table("b")
    cv3 = txn.commit()
    assert sorted(cat.pins(cv3)) == ["a"]
    with _pt.raises(ValueError, match="no table"):
        cat.read(spark, "b")
    assert sorted(r.k for r in cat.read(spark, "b", at=cv2).collect()) == [10]
    assert t_b.current_version() == 1          # table data untouched
    # CDC stream over b: I leg at cv2 (added), D leg at cv3 (dropped)
    register_changelog_source(spark)
    run = str(tmp_path / "run")
    sink = os.path.join(run, "out")
    q = (
        spark.readStream.format("mcatalog_changelog")
        .option("path", root)
        .option("table", "b")
        .load()
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, bid: df.write.mode("append").parquet(sink))
        .option("checkpointLocation", os.path.join(run, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    feed = spark.read.parquet(sink)
    assert sorted((r["_op"], r.k) for r in feed.collect()) == [("D", 10), ("I", 10)]


def test_catalog_expire_drops_old_versions_only(spark, tmp_path):
    """Catalog expire reclaims version JSON only — tables, manifests, and
    data untouched; retained versions still time-travel, dropped ones
    refuse loudly."""
    import os

    import pytest as _pt

    from gridmr_spark.sources.catalog_txn import TableCatalog
    from gridmr_spark.sources.table_format import ManifestTable

    root = str(tmp_path / "cat")
    t_a = ManifestTable(os.path.join(root, "a"))
    t_a.commit(spark.createDataFrame([(1,)], "k long"))
    cat = TableCatalog(root)
    cat.create({"a": t_a})                                   # cv1
    for i in range(3):
        txn = cat.begin()
        txn.commit_table("a", spark.createDataFrame([(10 + i,)], "k long"))
        txn.commit()                                         # cv2..cv4
    dropped = cat.expire(keep_last=2)
    assert dropped == [1, 2]
    assert cat.versions() == [3, 4]
    # retained savepoints still read; table history fully intact
    assert sorted(r.k for r in cat.read(spark, "a", at=3).collect()) == [1, 10, 11]
    assert t_a.versions() == [1, 2, 3, 4]
    with _pt.raises(ValueError, match="no such catalog version"):
        cat.read(spark, "a", at=1)


def test_vacuum_dropped_reclaims_unpinned_tables(spark, tmp_path):
    """drop_table -> expire -> vacuum_dropped reclaims the dropped
    table's whole tree (round 14); a still-pinned table, a non-table
    directory, and an in-flight create inside the age window all
    survive."""
    import os
    import time

    root = str(tmp_path / "cat")
    t_a = ManifestTable(os.path.join(root, "a"))
    t_b = ManifestTable(os.path.join(root, "b"))
    t_a.commit(spark.createDataFrame([(1, "x")], "k long, v string"))
    t_b.commit(spark.createDataFrame([(2, "y")], "k long, v string"))
    cat = TableCatalog(root)
    cat.create({"a": t_a, "b": t_b})                 # cv1 pins both
    txn = cat.begin()
    txn.drop_table("b")
    txn.commit()                                     # cv2: b dropped
    os.makedirs(os.path.join(root, "notatable"))     # never touched
    # b is still pinned by retained cv1: vacuum must keep it
    assert cat.vacuum_dropped(min_age_seconds=0) == []
    cat.expire(keep_last=1)                          # cv1 gone -> b unpinned
    # age window: a fresh (just-written) unpinned table survives
    assert cat.vacuum_dropped(min_age_seconds=3600) == []
    assert os.path.isdir(t_b.root)
    # in-flight create: committed table, pin not yet published
    t_c = ManifestTable(os.path.join(root, "c"))
    t_c.commit(spark.createDataFrame([(3, "z")], "k long, v string"))
    # age the dropped table's tree past the (tiny) window; c stays fresh
    old = time.time() - 10
    for dirpath, dirnames, filenames in os.walk(t_b.root):
        os.utime(dirpath, (old, old))
        for f in filenames:
            os.utime(os.path.join(dirpath, f), (old, old))
    removed = cat.vacuum_dropped(min_age_seconds=5)
    assert removed == [t_b.root]
    assert not os.path.exists(t_b.root)
    assert os.path.isdir(t_c.root) and os.path.isdir(t_a.root)
    assert os.path.isdir(os.path.join(root, "notatable"))
    # the surviving pinned table still reads
    assert cat.read(spark, "a").count() == 1
    # publish c's pin: it is live from then on
    txn = cat.begin()
    txn.create_table("c", t_c)
    txn.commit()
    assert cat.vacuum_dropped(min_age_seconds=0) == []
