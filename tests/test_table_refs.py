"""Branches, tags, write-audit-publish on the manifest table: ref
semantics, fast-forward conflicts, and — the part that can destroy data if
wrong — GC visibility of branch/tag references."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from gridmr_spark.sources.table_format import ConcurrentCommitError, ManifestTable


def _mk(spark, tmp_path, batches):
    t = ManifestTable(str(tmp_path / "tbl"))
    for rows in batches:
        t.commit(spark.createDataFrame(rows, "k long, v string"))
    return t


def _ks(df):
    return sorted(r.k for r in df.collect())


def test_branch_stages_invisibly_then_publishes(spark, tmp_path):
    t = _mk(spark, tmp_path, [[(1, "a")]])
    b = t.create_branch("audit")
    b.commit(spark.createDataFrame([(2, "b")], "k long, v string"))
    # staged rows invisible to main, visible on the branch
    assert _ks(t.read(spark)) == [1]
    assert _ks(b.read(spark)) == [1, 2]
    v = t.publish_branch("audit")
    assert _ks(t.read(spark, v)) == [1, 2]
    # appends-only branch publishes as a crossable append: diff sees the delta
    assert _ks(t.diff(spark, 1, v)) == [2]


def test_publish_requires_fast_forward(spark, tmp_path):
    t = _mk(spark, tmp_path, [[(1, "a")]])
    t.create_branch("audit")
    t.commit(spark.createDataFrame([(9, "z")], "k long, v string"))  # main moved
    with pytest.raises(ConcurrentCommitError):
        t.publish_branch("audit")
    # recovery: re-branch from the new head and replay
    b2 = t.create_branch("audit2")
    b2.commit(spark.createDataFrame([(2, "b")], "k long, v string"))
    v = t.publish_branch("audit2")
    assert _ks(t.read(spark, v)) == [1, 2, 9]


def test_rewrite_on_branch_makes_publish_non_crossable(spark, tmp_path):
    t = _mk(spark, tmp_path, [[(1, "a"), (2, "b")]])
    b = t.create_branch("fix")
    b.delete_where(spark, F.col("k") == 1)
    v = t.publish_branch("fix")
    assert _ks(t.read(spark, v)) == [2]
    with pytest.raises(ValueError, match="publish"):
        t.diff(spark, 1, v)


def test_tag_pins_version_and_is_immutable(spark, tmp_path):
    t = _mk(spark, tmp_path, [[(1, "a")], [(2, "b")]])
    t.create_tag("rel", version=1)
    t.commit(spark.createDataFrame([(3, "c")], "k long, v string"))
    assert _ks(t.read_tag(spark, "rel")) == [1]
    with pytest.raises(ValueError, match="immutable"):
        t.create_tag("rel", version=2)
    t.drop_tag("rel")
    with pytest.raises(ValueError):
        t.read_tag(spark, "rel")


def test_expire_keeps_tagged_versions(spark, tmp_path):
    t = _mk(spark, tmp_path, [[(1, "a")], [(2, "b")], [(3, "c")]])
    t.create_tag("rel", version=1)
    t.expire(keep_last=1)
    # v1 survives via the tag; v2's unique files are reclaimed
    assert t.versions() == [1, 3]
    assert _ks(t.read_tag(spark, "rel")) == [1]
    assert _ks(t.read(spark)) == [1, 2, 3]


def test_expire_and_vacuum_see_branch_references(spark, tmp_path):
    t = _mk(spark, tmp_path, [[(1, "a")]])
    b = t.create_branch("audit")
    b.commit(spark.createDataFrame([(2, "b")], "k long, v string"))
    # main-table maintenance while the branch is staged must not touch
    # branch-referenced files
    assert t.vacuum_orphans(min_age_seconds=0) == []
    t.commit(spark.createDataFrame([(9, "z")], "k long, v string"))
    t.expire(keep_last=1)
    assert _ks(b.read(spark)) == [1, 2]
    # dropping the branch orphanes its unique files; vacuum reclaims them
    t.drop_branch("audit")
    assert t.branches() == []
    removed = t.vacuum_orphans(min_age_seconds=0)
    assert any(p.endswith(".parquet") for p in removed)
    assert _ks(t.read(spark)) == [1, 9]


def test_branch_handle_refuses_maintenance_and_refs(spark, tmp_path):
    t = _mk(spark, tmp_path, [[(1, "a")]])
    b = t.create_branch("audit")
    for call in (
        lambda: b.expire(),
        lambda: b.vacuum_orphans(),
        lambda: b.create_branch("nested"),
        lambda: b.create_tag("x"),
        lambda: b.publish_branch("audit"),
        lambda: b.drop_branch("audit"),
    ):
        with pytest.raises(ValueError, match="MAIN table"):
            call()


def test_branch_audit_gate_rejects_bad_commit(spark, tmp_path):
    from gridmr_spark.sources.table_format import ConstraintViolation

    t = _mk(spark, tmp_path, [[(1, "a")]])
    b = t.create_branch("audit")
    with pytest.raises(ConstraintViolation):
        b.commit(
            spark.createDataFrame([(-5, "bad")], "k long, v string"),
            check="k >= 0",
        )
    # nothing staged, publish is a no-op fast-forward of the fork point
    assert _ks(b.read(spark)) == [1]
    v = t.publish_branch("audit")
    assert _ks(t.read(spark, v)) == [1]


def test_ref_name_validation(spark, tmp_path):
    t = _mk(spark, tmp_path, [[(1, "a")]])
    with pytest.raises(ValueError, match="ref name"):
        t.create_branch("../evil")
    with pytest.raises(ValueError, match="ref name"):
        t.create_tag("a/b")
    with pytest.raises(ValueError):
        t.branch("nope")
