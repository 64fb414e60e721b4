"""incremental_components: exactness vs full recompute + the no-reshuffle
plan contract for untouched components (VERDICT r10 item 3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gridmr_spark.operators.graph import (
    connected_components,
    incremental_components,
)


def _full_recompute(spark, asg_rows, new_ids, edge_rows):
    """Oracle: CC over old star edges (id—component) ∪ the day's edges."""
    verts = spark.createDataFrame(
        [(i,) for i, _ in asg_rows] + [(i,) for i in new_ids], "id long"
    )
    star = [(i, c) for i, c in asg_rows]
    edges = spark.createDataFrame(star + edge_rows, "src long, dst long")
    cc = connected_components(verts, edges)
    return sorted((r.id, r.component) for r in cc.collect())


ASG = [(1, 1), (2, 1), (3, 3), (4, 4), (10, 10), (11, 10), (12, 10)]
NEW = [0, 21, 22, 23]
# merges: {3,21,22}; new id 0 joins old comp 1 (new min!); 4–12 fuses two
# OLD components (4 and 10); 23 stays isolated.
EDGES = [(3, 21), (21, 22), (0, 1), (4, 12)]


def test_incremental_equals_full_recompute(spark):
    asg = spark.createDataFrame(ASG, "id long, component long")
    newv = spark.createDataFrame([(i,) for i in NEW], "id long")
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    got = sorted(
        (r.id, r.component)
        for r in incremental_components(asg, newv, edges).collect()
    )
    assert got == _full_recompute(spark, ASG, NEW, EDGES)
    # spot-check the tricky labels: new-min takeover and old-old fusion
    m = dict(got)
    assert m[1] == 0 and m[2] == 0 and m[0] == 0
    assert m[4] == 4 and m[10] == 4 and m[12] == 4 and m[11] == 4
    assert m[21] == 3 and m[22] == 3 and m[23] == 23


def test_incremental_no_day_without_merges_is_identity(spark):
    """A day whose pairs stay inside existing components (plus isolated
    new docs) must leave every old label untouched."""
    asg = spark.createDataFrame(ASG, "id long, component long")
    newv = spark.createDataFrame([(50,)], "id long")
    edges = spark.createDataFrame([(1, 2), (10, 11)], "src long, dst long")
    got = dict(
        (r.id, r.component)
        for r in incremental_components(asg, newv, edges).collect()
    )
    assert got == {**dict(ASG), 50: 50}


def test_reingested_ids_emit_one_row(spark):
    """An id present in BOTH the prior assignment and new_vertices (a
    re-ingested document) is an old vertex: exactly one output row, and
    its edges still merge components through the contraction."""
    asg = spark.createDataFrame(ASG, "id long, component long")
    newv = spark.createDataFrame([(3,), (21,)], "id long")  # 3 is re-ingested
    edges = spark.createDataFrame([(3, 21)], "src long, dst long")
    out = incremental_components(asg, newv, edges).collect()
    ids = [r.id for r in out]
    assert sorted(ids) == sorted(set(ids))  # no duplicates
    m = {r.id: r.component for r in out}
    assert m[3] == 3 and m[21] == 3  # merged through the re-ingested id
    assert m == _full_recompute_dict(spark, ASG, [21], [(3, 21)])


def _full_recompute_dict(spark, asg_rows, new_ids, edge_rows):
    return dict(_full_recompute(spark, asg_rows, new_ids, edge_rows))


def test_changed_only_returns_exactly_the_delta(spark):
    """changed_only=True emits precisely: members of relabeled components
    plus genuinely-new vertices — nothing from untouched components, so a
    keyed write-back is bounded by the day's blast radius."""
    asg = spark.createDataFrame(ASG, "id long, component long")
    newv = spark.createDataFrame([(i,) for i in NEW], "id long")
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    full = dict(
        (r.id, r.component)
        for r in incremental_components(asg, newv, edges).collect()
    )
    delta = dict(
        (r.id, r.component)
        for r in incremental_components(
            asg, newv, edges, changed_only=True
        ).collect()
    )
    prior = dict(ASG)
    want = {i: c for i, c in full.items() if prior.get(i) != c}
    assert delta == want
    assert 3 not in delta  # comp 3 keeps its label (merged INTO, min stays 3)
    # and applying the delta over the prior state reproduces the full result
    assert {**prior, **delta} == full


def test_untouched_components_are_not_reshuffled(spark):
    """The corpus-size assignment must reach the output through a
    broadcast relabel join with NO exchange on the assignment stream —
    untouched rows pass through map-side. A shuffle on `component` (or a
    sort-merge relabel join) would mean day-N cost scales with the corpus,
    which is the exact failure this operator exists to avoid."""
    asg = spark.createDataFrame(ASG, "id long, component long")
    newv = spark.createDataFrame([(i,) for i in NEW], "id long")
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    out = incremental_components(asg, newv, edges)
    out.collect()  # let AQE finalize the executed plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the relabel is a broadcast LEFT OUTER hash join building the tiny map
    assert "LeftOuter, BuildRight" in plan, plan
    # and nothing ever hash-partitions the assignment's component column
    # (the only shuffles allowed are on the day-sized helper frames)
    assert "hashpartitioning(component#" not in plan, plan
