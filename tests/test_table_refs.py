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
    # all-punctuation names would resolve INTO or ABOVE the refs dir:
    # ".." is the main _manifests namespace itself
    for bad in (".", "..", "...", "-", "_"):
        with pytest.raises(ValueError, match="ref name"):
            t.create_branch(bad)
        with pytest.raises(ValueError, match="ref name"):
            t.create_tag(bad)
    with pytest.raises(ValueError):
        t.branch("nope")


# -- row-level change feed (changefeed) --------------------------------------


def _feed(spark, t, v_from, v_to):
    return sorted(
        (r["_op"], r.k, r.v) for r in t.changefeed(spark, v_from, v_to).collect()
    )


def test_changefeed_crosses_rewrites_with_exact_rows(spark, tmp_path):
    t = _mk(spark, tmp_path, [[(1, "a"), (2, "b"), (3, "c")]])
    t.delete_where(spark, F.col("k") == 2)                       # v2
    t.merge_by_key(
        spark, spark.createDataFrame([(3, "C"), (4, "d")], "k long, v string"), "k"
    )                                                            # v3
    assert _feed(spark, t, 1, 3) == [
        ("D", 2, "b"),
        ("D", 3, "c"),
        ("I", 3, "C"),
        ("I", 4, "d"),
    ]
    # appends-only ranges agree with diff (all-I feed)
    t.commit(spark.createDataFrame([(5, "e")], "k long, v string"))  # v4
    assert _feed(spark, t, 3, 4) == [("I", 5, "e")]


def test_changefeed_from_zero_is_full_insert_feed(spark, tmp_path):
    t = _mk(spark, tmp_path, [[(1, "a")], [(2, "b")]])
    assert _feed(spark, t, 0, 2) == [("I", 1, "a"), ("I", 2, "b")]


def test_changefeed_preserves_duplicate_multiplicity(spark, tmp_path):
    # two identical rows in v1; v2 rewrites to ONE copy — a set-based diff
    # would emit nothing and the downstream signed count would drift
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit(spark.createDataFrame([(1, "a"), (1, "a")], "k long, v string"))
    t.replace(spark.createDataFrame([(1, "a")], "k long, v string"))
    assert _feed(spark, t, 1, 2) == [("D", 1, "a")]


def test_changefeed_feeds_cdc_partial_aggs(spark, tmp_path):
    from gridmr_spark.operators.incremental import (
        cdc_partial_aggs,
        finalize_aggs,
        merge_partial_aggs,
        partial_aggs,
    )

    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit(
        spark.createDataFrame(
            [("a", 10.0), ("a", 20.0), ("b", 5.0)], "g string, x double"
        )
    )
    t.delete_where(spark, F.col("g") == "b")
    t.merge_by_key(
        spark, spark.createDataFrame([("a", 20.0)], "g string, x double"), "g"
    )  # dedupes the two 'a' rows down to one via key merge
    stored = partial_aggs(t.read(spark, 1), ["g"], {"x": "x"})
    feed = t.changefeed(spark, 1, 3)
    got = finalize_aggs(
        merge_partial_aggs(
            [stored, cdc_partial_aggs(feed, ["g"], {"x": "x"}, op_col="_op")], ["g"]
        ),
        ["g"],
        drop_empty=True,
    )
    want = finalize_aggs(partial_aggs(t.read(spark, 3), ["g"], {"x": "x"}), ["g"])
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_sql_views_for_tags_and_branches(spark, tmp_path):
    t = _mk(spark, tmp_path, [[(1, "a")], [(2, "b")]])
    t.create_tag("rel-1", version=1)
    b = t.create_branch("audit")
    b.commit(spark.createDataFrame([(3, "c")], "k long, v string"))
    names = t.register_sql(spark, "reftbl")
    assert "reftbl_tag_rel_1" in names and "reftbl_branch_audit" in names
    assert [r.k for r in spark.sql("SELECT k FROM reftbl_tag_rel_1").collect()] == [1]
    assert sorted(
        r.k for r in spark.sql("SELECT k FROM reftbl_branch_audit").collect()
    ) == [1, 2, 3]
    # main view is unaffected by the staged branch
    assert sorted(r.k for r in spark.sql("SELECT k FROM reftbl").collect()) == [1, 2]
    with pytest.raises(ValueError, match="at most ONE"):
        t.sql_view(spark, "x", version=1, tag="rel-1")


def test_changefeed_aligns_additive_schema_change(spark, tmp_path):
    """Delta-CDF semantics (round 13): a feed crossing an add-column
    commit aligns the older shape with typed NULLs — the update that
    populated the new column reads as its exact retract+insert pair."""
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit(spark.createDataFrame([(1, "a")], "k long, v string"))
    t.replace(spark.createDataFrame([(1, "a", 5.0)], "k long, v string, w double"))
    rows = sorted(
        (r["_op"], r.k, r.v, r.w) for r in t.changefeed(spark, 1, 2).collect()
    )
    assert rows == [("D", 1, "a", None), ("I", 1, "a", 5.0)]
    # plain append of the widened shape: only the new rows, old-shape
    # deletes null-fill
    t.commit(spark.createDataFrame([(2, "b", 7.0)], "k long, v string, w double"))
    rows = sorted(
        (r["_op"], r.k, r.v, r.w) for r in t.changefeed(spark, 2, 3).collect()
    )
    assert rows == [("I", 2, "b", 7.0)]
    # whole-range feed equals the unbounded snapshot compare, aligned
    got = sorted((r["_op"], r.k, r.v, r.w) for r in t.changefeed(spark, 1, 3).collect())
    assert got == [("D", 1, "a", None), ("I", 1, "a", 5.0), ("I", 2, "b", 7.0)]


def test_changefeed_refuses_incompatible_type_change(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit(spark.createDataFrame([(1, "a")], "k long, v string"))
    t.replace(spark.createDataFrame([(1, 2.0)], "k long, v double"))
    with pytest.raises(ValueError, match="INCOMPATIBLE"):
        t.changefeed(spark, 1, 2)


def test_racing_publishers_get_exactly_one_winner(spark, tmp_path):
    """Two branches cut from the same fork race to publish: the snapshot
    manifest's exclusive create decides — exactly one fast-forward lands,
    the loser sees ConcurrentCommitError from the version collision (or
    from the fork-point check once it re-reads)."""
    t = _mk(spark, tmp_path, [[(1, "a")]])
    b1 = t.create_branch("day-a")
    b1.commit(spark.createDataFrame([(2, "b")], "k long, v string"))
    b2 = t.create_branch("day-b")
    b2.commit(spark.createDataFrame([(3, "c")], "k long, v string"))
    wins, losses = [], []
    for name in ("day-a", "day-b"):
        try:
            wins.append((name, t.publish_branch(name)))
        except ConcurrentCommitError:
            losses.append(name)
    assert len(wins) == 1 and len(losses) == 1
    assert _ks(t.read(spark)) == [1, 2] if wins[0][0] == "day-a" else [1, 3]
    # loser recovers by re-branching from the new head and replaying
    loser = losses[0]
    replay = t.create_branch(f"{loser}-replay")
    replay.commit(spark.createDataFrame([(9, "r")], "k long, v string"))
    v = t.publish_branch(f"{loser}-replay")
    assert 9 in _ks(t.read(spark, v))


def test_destructive_ref_verbs_validate_names(spark, tmp_path):
    """The round's worst-case bugs: '..' as a branch name resolves to the
    main _manifests dir (whose v*.json match the existence glob), and
    '../v00001' as a tag names a snapshot manifest — both delete verbs
    must refuse BEFORE touching the filesystem, and branch() must refuse
    before handing out a 'branch' whose namespace is main's."""
    t = _mk(spark, tmp_path, [[(1, "a")]])
    t.create_branch("real")  # branches/ and tags/ dirs exist
    t.create_tag("realtag")
    for bad in ("..", ".", "../v00001", "a/b"):
        with pytest.raises(ValueError, match="ref name"):
            t.drop_branch(bad)
        with pytest.raises(ValueError, match="ref name"):
            t.drop_tag(bad)
        with pytest.raises(ValueError, match="ref name"):
            t.branch(bad)
    # the table is fully intact afterwards
    assert t.versions() == [1]
    assert _ks(t.read(spark)) == [1]
    assert t.branches() == ["real"]
    assert "realtag" in t.tags()


def test_commit_timestamps_strictly_increase(spark, tmp_path, monkeypatch):
    """A coarse clock stamping two commits identically would make
    TIMESTAMP AS OF ambiguous; _write_manifest nudges by 1 us."""
    import time as _time

    frozen = _time.time()
    t = ManifestTable(str(tmp_path / "tbl"))
    monkeypatch.setattr(_time, "time", lambda: frozen)
    t.commit(spark.createDataFrame([(1, "a")], "k long, v string"))
    t.commit(spark.createDataFrame([(2, "b")], "k long, v string"))
    t.commit(spark.createDataFrame([(3, "c")], "k long, v string"))
    ts = [t._raw(v)["ts"] for v in (1, 2, 3)]
    assert ts[0] < ts[1] < ts[2]
    # the midpoint probe the SQL-read query uses is now unambiguous
    assert t.version_at((ts[1] + ts[2]) / 2.0) == 2


def test_changefeed_scan_bounded_by_rewrite_footprint(spark, tmp_path):
    """File-level lineage: files shared by both snapshots cancel out of
    the multiset diff, so the feed's SCAN SET is the rewrite's footprint,
    not the two full snapshots — and the rows still hash-equal the full
    snapshot-vs-snapshot compare."""
    t = ManifestTable(str(tmp_path / "tbl"))
    # three separate append commits -> three groups, distinct key ranges
    for lo in (0, 100, 200):
        t.commit(
            spark.range(lo, lo + 100).selectExpr("id as k", "concat('v', id) as v")
        )
    # rewrite touching ONLY the middle commit's rows
    t.delete_where(spark, (F.col("k") >= 150) & (F.col("k") < 160))  # v4
    feed = t.changefeed(spark, 3, 4)
    # exact rows: 10 deletes, nothing else
    rows = sorted((r["_op"], r.k) for r in feed.collect())
    assert rows == [("D", k) for k in range(150, 160)]
    # hash-equality vs the unbounded full-snapshot compare
    new, old = t.read(spark, 4), t.read(spark, 3)
    ref = sorted(
        [("I", r.k) for r in new.exceptAll(old).collect()]
        + [("D", r.k) for r in old.exceptAll(new).collect()]
    )
    assert rows == ref
    # scan set: only the middle commit's file(s) + their rewrite — the
    # commits at k<100 and k>=200 never enter the plan
    scanned = set(feed.inputFiles())
    untouched = set(t._added_files(1)) | set(t._added_files(3))
    assert scanned and not (scanned & untouched), (scanned, untouched)
    assert len(scanned) < len(set(t._manifest(3)["files"]) | set(t._manifest(4)["files"]))


def test_partition_spec_survives_branch_wap_and_clone(spark, tmp_path):
    """The hidden-partition spec is TABLE-LEVEL — a WAP cycle (branch ->
    commit -> publish) and a shallow clone must carry it, or branch
    commits silently write files without __pt stats and the published
    main loses the layout (round-14 ADVICE, table_format.py branch/WAP/
    clone extras)."""
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit(
        spark.range(40).selectExpr("id as k", "id % 4 as g"), partition_by="g"
    )
    # branch v1 inherits the fork version's spec; branch commits write __pt
    b = t.create_branch("wap")
    assert b.partition_spec() == "g"
    b.commit(spark.createDataFrame([(100, 1), (101, 2)], "k long, g long"))
    bstats = b.snapshot_stats(2)
    for f in b._added_files(2):
        assert "__pt" in bstats[f], f
    # the published main snapshot keeps the spec and partitioned reads work
    v = t.publish_branch("wap")
    assert t.partition_spec(v) == "g"
    got = sorted(r.k for r in t.read_pruned(spark, preds={"__pt": (1, 1)}).collect())
    assert got == [k for k in range(40) if k % 4 == 1] + [100]
    # a plain append AFTER the publish still inherits (the regression mode:
    # post-WAP appends silently writing unpartitioned)
    t.commit(spark.createDataFrame([(200, 1)], "k long, g long"))
    got = sorted(r.k for r in t.read_pruned(spark, preds={"__pt": (1, 1)}).collect())
    assert got == [k for k in range(40) if k % 4 == 1] + [100, 200]
    # shallow clone: the cloned snapshot's spec rides along
    c = t.clone_to(str(tmp_path / "clone"))
    assert c.partition_spec() == "g"
    got = sorted(r.k for r in c.read_pruned(spark, preds={"__pt": (2, 2)}).collect())
    assert got == [k for k in range(40) if k % 4 == 2] + [101]
    c.commit(spark.createDataFrame([(300, 2)], "k long, g long"))
    got = sorted(r.k for r in c.read_pruned(spark, preds={"__pt": (2, 2)}).collect())
    assert got == [k for k in range(40) if k % 4 == 2] + [101, 300]
