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
