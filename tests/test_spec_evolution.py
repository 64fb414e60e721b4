"""Partition-spec evolution WITHOUT rewrite (round 14): the spec is
tracked per file cohort (group manifests carry a ``spec`` stamp), so
``commit(partition_by=new)`` changes the layout for NEW data at O(new
data) cost — old cohorts keep pruning under their own spec, exactly
Iceberg's spec-evolution contract. Reference parity: none (SURVEY §1.4);
the public spec matched is Iceberg partition spec evolution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gridmr_spark.sources.table_format import ManifestTable


def _mk_two_spec(spark, tmp_path):
    """v1: 900 rows over 90 days partitioned by month(d);
    v2: +900 rows partitioned by quarter(d) — months 4..6 == quarter 2."""
    t = ManifestTable(str(tmp_path / "tbl"))
    old = spark.sql(
        "SELECT id AS k, date_add(date'2024-01-01', CAST(id % 180 AS INT)) AS d "
        "FROM range(900)"
    )
    new = spark.sql(
        "SELECT id + 10000 AS k, "
        "date_add(date'2024-01-01', CAST(id % 180 AS INT)) AS d "
        "FROM range(900)"
    )
    t.commit(old, partition_by="month(d)")
    t.commit(new, partition_by="quarter(d)")
    return t, old.unionByName(new)


def test_spec_change_is_metadata_only(spark, tmp_path):
    """The spec change touches ZERO old files: v2 carries v1's files
    verbatim (same paths), writes only the new cohort, and stamps each
    group with its own spec."""
    t, _ = _mk_two_spec(spark, tmp_path)
    v1_files = set(t._manifest(1)["files"])
    v2_files = set(t._manifest(2)["files"])
    assert v1_files < v2_files  # every old file carried by reference
    specs = {g.get("spec") for g in t._groups_of(2)}
    assert specs == {"month(d)", "quarter(d)"}
    assert t.partition_spec() == "quarter(d)"  # NEW data's spec is current


def test_both_cohorts_prune_under_their_own_spec(spark, tmp_path):
    """pt_preds={spec: range, ...}: each cohort prunes by ITS OWN stamped
    spec — the scan set excludes out-of-range files of BOTH cohorts, and
    the result equals the full-scan filter exactly."""
    t, full = _mk_two_spec(spark, tmp_path)
    # months 4..6 == quarter 2: one logical interval in both spaces
    exact, resid = t.pruned_files(
        pt_preds={"month(d)": (4, 6), "quarter(d)": (2, 2)}, _split=True
    )
    assert not resid  # every kept file is metadata-qualified
    # BOTH cohorts pruned: kept strictly fewer files than either cohort
    # holds, and kept includes files from both cohorts
    v1_files = set(t._manifest(1)["files"])
    kept = set(exact)
    assert kept & v1_files and kept - v1_files
    assert len(kept & v1_files) < len(v1_files)
    assert len(kept - v1_files) < len(set(t._manifest(2)["files"]) - v1_files)
    got = sorted(
        r.k
        for r in t.read_pruned(
            spark, pt_preds={"month(d)": (4, 6), "quarter(d)": (2, 2)}
        ).collect()
    )
    want = sorted(r.k for r in full.where("quarter(d) = 2").collect())
    assert got == want and len(got) > 0


def test_bare_pt_predicate_covers_old_cohort_via_residual(spark, tmp_path):
    """preds={'__pt': range} under the CURRENT spec: the new cohort
    prunes by metadata, the old cohort (different spec) is kept and
    row-filtered by the computed residual — result exact, no caller
    filter needed."""
    t, full = _mk_two_spec(spark, tmp_path)
    exact, resid = t.pruned_files(preds={"__pt": (2, 2)}, _split=True)
    v1_files = set(t._manifest(1)["files"])
    assert set(resid) == v1_files          # old cohort: kept, needs residual
    assert set(exact) and not (set(exact) & v1_files)  # new cohort pruned
    got = sorted(
        r.k for r in t.read_pruned(spark, preds={"__pt": (2, 2)}).collect()
    )
    want = sorted(r.k for r in full.where("quarter(d) = 2").collect())
    assert got == want
    # superset mode: old cohort rows arrive unfiltered
    sup = t.read_pruned(spark, preds={"__pt": (2, 2)}, partition_exact=False)
    assert sup.count() > len(want)


def test_rewrite_verbs_preserve_cohort_specs(spark, tmp_path):
    """A partial COW delete on a mixed-spec table: rewritten files land
    under the CURRENT spec, untouched cohorts keep their stamps, and the
    per-spec read stays exact."""
    t, full = _mk_two_spec(spark, tmp_path)
    # matches only NEW-cohort rows (k >= 10000): the old cohort's files
    # contain no match, so partial COW leaves them — and their stamp —
    # untouched, while the rewritten files land under the current spec
    t.delete_where(spark, (F.col("k") >= 10000) & (F.col("k") % 10 == 3))
    specs = {g.get("spec") for g in t._groups_of(t.current_version())}
    assert "month(d)" in specs and "quarter(d)" in specs
    got = sorted(
        r.k
        for r in t.read_pruned(
            spark, pt_preds={"month(d)": (4, 6), "quarter(d)": (2, 2)}
        ).collect()
    )
    want = sorted(
        r.k
        for r in full.where(
            "quarter(d) = 2 AND NOT (k >= 10000 AND k % 10 = 3)"
        ).collect()
    )
    assert got == want


def test_rewrite_manifests_regroups_per_cohort(spark, tmp_path):
    """Manifest compaction must not mix cohorts into one group (that
    would destroy per-cohort pruning): after rewrite_manifests the groups
    still partition by spec and the evolved read is unchanged."""
    t, full = _mk_two_spec(spark, tmp_path)
    t.rewrite_manifests(target_groups=2)
    for g in t._groups_of(t.current_version()):
        assert g.get("spec") in ("month(d)", "quarter(d)")
    got = sorted(
        r.k
        for r in t.read_pruned(
            spark, pt_preds={"month(d)": (4, 6), "quarter(d)": (2, 2)}
        ).collect()
    )
    want = sorted(r.k for r in full.where("quarter(d) = 2").collect())
    assert got == want


def test_compact_collapses_to_single_spec(spark, tmp_path):
    """compact(partition_by=...) remains the full-rewrite path that
    RETIRES old cohorts: afterwards one spec governs every file and bare
    __pt reads are metadata-exact again."""
    t, full = _mk_two_spec(spark, tmp_path)
    t.compact(spark, partition_by="month(d)")
    specs = {g.get("spec") for g in t._groups_of(t.current_version())}
    assert specs == {"month(d)"}
    exact, resid = t.pruned_files(preds={"__pt": (2, 2)}, _split=True)
    assert not resid
    got = t.read_pruned(spark, preds={"__pt": (2, 2)})
    assert got.count() == full.where("month(d) = 2").count()


def test_uncovered_cohort_without_residual_refuses(spark, tmp_path):
    """pt_preds covering only ONE cohort: the other cohort still gets the
    covered specs' computed residual (exact), never a silent leak; and a
    no-spec snapshot with a bare __pt refuses as before."""
    t, full = _mk_two_spec(spark, tmp_path)
    got = sorted(
        r.k
        for r in t.read_pruned(spark, pt_preds={"quarter(d)": (2, 2)}).collect()
    )
    want = sorted(r.k for r in full.where("quarter(d) = 2").collect())
    assert got == want
    with pytest.raises(ValueError, match="partition_exact"):
        # drop the spec, then a bare __pt has nothing to key on
        t.commit(spark.sql("SELECT 1 AS k, date'2024-01-01' AS d"), partition_by="")
        t.read_pruned(spark, preds={"__pt": (2, 2)})
