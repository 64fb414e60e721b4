"""Iterative graph operators: connected components for dedup clustering.

Near-duplicate REMOVAL (keep lowest id of any pair) is an anti-join, but
near-duplicate CLUSTERING — "give every document the canonical id of its
duplicate group" — needs the transitive closure of the pair relation:
a~b and b~c put a,c in one group even when cos(a,c) is below threshold.
That is connected components, the one operator family in this engine that
is inherently iterative (SQL needs recursion for it; the DuckDB oracle uses
WITH RECURSIVE, Spark iterates a DataFrame fixpoint).

Algorithm: min-label propagation. Every vertex starts labeled with its own
id; each round every vertex takes the min of its label and its neighbors'
labels; converged when no label changes. Rounds needed = component
diameter — small for near-dup clusters (pairs are dense within a group).
Each round is one shuffle join + one shuffle agg on the edge partitioning.

Scale notes (100 TB posture):
- ``localCheckpoint`` after every round truncates the lineage — without it
  the plan doubles per iteration and the driver OOMs planning round ~15.
- The convergence probe is a ``limit(1).count()`` on the changed-labels
  frame — one cheap action per round, no data to the driver.
- For web-scale graphs with high-diameter components, use
  ``connected_components_two_phase`` below — the large-star/small-star
  algorithm (Kiveris et al., "Connected Components in MapReduce and
  Beyond", SoCC'14), same interface, O(log n) rounds; min-label (with
  pointer jumping) stays the default for dedup graphs where components are
  near-cliques with diameter ~2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label every vertex with the MIN vertex id reachable from it.

    vertices: DataFrame with ``id_col`` (one row per vertex; isolated
    vertices allowed). edges: DataFrame with ``src_col``/``dst_col``
    (undirected; direction and duplicates don't matter). Returns
    DataFrame[id, component].
    """
    # Symmetrize once and MATERIALIZE (localCheckpoint): the edge frame is
    # re-read every round, and without this the whole upstream edge
    # computation (for dedup graphs, a quadratic cosine join) re-executes
    # per iteration — the loop cost must be rounds x |E|, not
    # rounds x cost(edge derivation).
    fwd = edges.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d"))
    rev = edges.select(F.col(dst_col).alias("_s"), F.col(src_col).alias("_d"))
    e = fwd.union(rev).distinct().localCheckpoint()

    # ISOLATED vertices (no incident edge) can never receive a message and
    # never change label, yet the old loop shuffled, aggregated and
    # checkpointed them every round. For dedup graphs they are the vast
    # majority (most documents are not near-duplicates), so the iteration
    # runs over EDGE-ENDPOINT vertices only and singletons rejoin at the
    # end with component = id — identical output (a singleton's label is
    # its own id by definition of min-label propagation), but every round's
    # join/agg/checkpoint is sized by the dup graph, not the corpus.
    # Endpoints absent from `vertices` still enter through the message
    # aggregate exactly as before (they are never seeded with a self label).
    # ONE materialization serves both slices: the active/isolated split is
    # a single left join tagged into the seed checkpoint, so neither the
    # loop seed nor the final singleton union re-derives the vertex frame.
    v = vertices.select(F.col(id_col).alias("id"))
    ep = e.select(F.col("_s").alias("id")).distinct()  # symmetrized: every endpoint
    tagged = v.join(
        ep.select("id", F.lit(True).alias("_act")), "id", "left"
    ).localCheckpoint()
    labels = tagged.where("_act").select("id", F.col("id").alias("component"))
    isolated = tagged.where(F.col("_act").isNull()).select(
        "id", F.col("id").alias("component")
    )

    def _round(lbl: DataFrame) -> DataFrame:
        # Neighbor messages: each edge forwards the src's current label to dst.
        # Self rows are tagged so the round's aggregate can carry the OLD
        # label through for free: min(component) is the propagated label,
        # min(component) over self rows is the previous one — the change
        # flag then rides the checkpointed frame and the convergence probe
        # becomes a filter+limit over already-materialized blocks instead
        # of a second shuffle join per round (guide §2.4: the old probe was
        # an Exchange+join whose only output was one boolean).
        msgs = (
            e.join(lbl, e["_s"] == lbl["id"])
            .select(F.col("_d").alias("id"), "component", F.lit(False).alias("_self"))
        )
        prop = (
            lbl.select("id", "component", F.lit(True).alias("_self"))
            .union(msgs)
            .groupBy("id")
            .agg(
                F.min("component").alias("component"),
                F.min(F.when(F.col("_self"), F.col("component"))).alias("_old"),
            )
        )
        # Pointer jump: component <- label(component). Labels only take
        # vertex-id values, so the lookup is an equi-join against prop
        # itself; chasing the label of the label halves chain length each
        # round, turning O(diameter) convergence into O(log diameter)
        # (a 30-vertex path converges in ~6 rounds, not 29).
        mapping = prop.select(
            F.col("id").alias("component"), F.col("component").alias("_jump")
        )
        return prop.join(mapping, "component").select(
            "id",
            F.col("_jump").alias("component"),
            # Labels are monotonically nonincreasing, so < is change.
            # An id absent from the prior labels (edge endpoint outside
            # the vertex set) has NULL _old: the flag is NULL, counted
            # as unchanged — identical to the old inner-join probe,
            # which dropped such rows.
            (F.col("_jump") < F.col("_old")).alias("_chg"),
        )

    # One materialization + probe per round. NOT fused two-rounds-per-
    # checkpoint like pagerank: a CC round references its input twice
    # (self rows + messages), so fusing would re-compute the unmaterialized
    # prior round unless exchange reuse happens to fire — measured ~neutral
    # locally and a 2x-per-round-work risk at scale.
    for _ in range(max_iter):
        new_labels = _round(labels).localCheckpoint()  # cut lineage per round
        changed = new_labels.where("_chg").limit(1).count()
        labels = new_labels.select("id", "component")
        if changed == 0:
            break
    return labels.select("id", "component").unionByName(isolated)


def incremental_components(
    assignment: DataFrame,
    new_vertices: DataFrame,
    new_edges: DataFrame,
    id_col: str = "id",
    comp_col: str = "component",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
    changed_only: bool = False,
) -> DataFrame:
    """Day-N maintenance of a components assignment WITHOUT reclustering
    the corpus: given the prior full run's ``assignment`` (id ->
    component, where the component label is the MIN member id — the
    convention every CC in this module emits) and the day's
    ``new_edges`` (old x new and new x new pairs; any old x old pair the
    day discovers is fine too), recluster ONLY the affected components.

    Algorithm (quotient-graph contraction): every old endpoint of a new
    edge is replaced by its component label — valid because an old
    component is already internally connected, so for connectivity it IS
    one supernode — then connected components runs on the CONTRACTED
    graph, whose size is O(day's edges), never O(corpus). Because old
    labels are min member ids and min-label CC takes the min over the
    contracted nodes, the new label of a merged group equals the global
    min id — EXACTLY what a full recompute over (old pairs ∪ new pairs)
    yields (the registered query's oracle proves this by hash equality).

    Scale shape / what is NOT re-shuffled: the corpus-size ``assignment``
    is touched twice, both times shuffle-free — a broadcast LEFT-SEMI
    probe to pull the O(|edges|) affected rows, and the final relabel,
    a broadcast hash join of the tiny (old component -> new label) map
    against the streaming assignment scan. Untouched components' rows
    pass through map-side with their label unchanged (asserted on the
    physical plan by tests/test_graph_incremental.py). In production the
    relabel output feeds ``ManifestTable.merge_by_key`` with just the
    changed rows, so even the rewrite is bounded by the day's blast
    radius.

    Returns the updated full assignment: DataFrame[id, component]
    covering old ∪ new vertices. With ``changed_only=True`` it returns
    ONLY the rows whose label differs from (or is absent in) the prior
    assignment — the bounded update set a keyed table write-back
    (``ManifestTable.merge_by_key``) needs, selected with an INNER
    broadcast join against the relabel map so the day's blast radius,
    not the corpus, sizes the write.
    """
    asg = assignment.select(F.col(id_col).alias("id"), F.col(comp_col).alias("component"))
    edges = new_edges.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d"))

    # A re-ingested document (its id already in the prior assignment) is an
    # OLD vertex: its edges contract through its component like any other
    # old endpoint, and it must NOT also enter the contracted graph as a
    # raw node (that would emit a second — possibly conflicting — output
    # row for it). Probe the assignment with a broadcast semi (shuffle-
    # free) and keep only genuinely-new ids. All frames here are day-sized.
    new_v = new_vertices.select(F.col(id_col).alias("id")).distinct().localCheckpoint(
        eager=True
    )
    dup_ids = asg.join(F.broadcast(new_v), "id", "left_semi").select(
        "id"
    ).localCheckpoint(eager=True)
    new_v = new_v.join(F.broadcast(dup_ids), "id", "left_anti")

    # 1. Affected OLD rows: endpoints of new edges that exist in the prior
    #    assignment. Broadcast-semi probe — assignment streams, no shuffle.
    endpoints = (
        edges.select(F.col("_s").alias("id"))
        .union(edges.select(F.col("_d").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    touched = asg.join(F.broadcast(endpoints), "id", "left_semi").localCheckpoint(
        eager=True
    )  # O(|edges|) rows: (old id, old component)

    # 2. Contract edge endpoints through the touched map (new ids miss the
    #    map and stay themselves). Both sides of these joins are day-sized.
    s_map = touched.select(F.col("id").alias("_s"), F.col("component").alias("_sc"))
    d_map = touched.select(F.col("id").alias("_d"), F.col("component").alias("_dc"))
    contracted = (
        edges.join(F.broadcast(s_map), "_s", "left")
        .join(F.broadcast(d_map), "_d", "left")
        .select(
            F.coalesce(F.col("_sc"), F.col("_s")).alias("src"),
            F.coalesce(F.col("_dc"), F.col("_d")).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
    )

    # 3. CC on the contracted graph: supernodes (affected components'
    #    labels) + the day's new vertices.
    cverts = (
        touched.select("component").distinct().select(F.col("component").alias("id"))
        .union(new_v.select("id"))
        .distinct()
    )
    cc = connected_components(
        cverts, contracted, id_col="id", src_col="src", dst_col="dst",
        max_iter=max_iter,
    ).localCheckpoint(eager=True)  # day-sized

    # 4. Relabel map for affected old components only (id here is an old
    #    component label). Identity rows dropped: the broadcast map carries
    #    only components that actually changed.
    aff = touched.select(F.col("component").alias("_tc")).distinct()
    relabel = (
        cc.join(F.broadcast(aff), cc["id"] == F.col("_tc"), "left_semi")
        .where(F.col("id") != F.col("component"))
        .select(F.col("id").alias("_old_comp"), F.col("component").alias("_new_comp"))
    )

    # 5. Output: corpus scan + broadcast relabel (shuffle-free), plus the
    #    new vertices' labels straight from the contracted CC.
    new_rows = cc.join(F.broadcast(new_v), "id", "left_semi")
    if changed_only:
        relabeled = (
            asg.join(F.broadcast(relabel), asg["component"] == F.col("_old_comp"))
            .select("id", F.col("_new_comp").alias("component"))
        )
        return relabeled.unionByName(new_rows)
    old_rows = (
        asg.join(F.broadcast(relabel), asg["component"] == F.col("_old_comp"), "left")
        .select("id", F.coalesce(F.col("_new_comp"), F.col("component")).alias("component"))
    )
    return old_rows.unionByName(new_rows)


def pagerank(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iters: int = 10,
) -> DataFrame:
    """Power-iteration PageRank over a DIRECTED edge list (symmetrize first
    for undirected graphs). Returns DataFrame[id, rank], sum(rank) == 1.

    Per round: one broadcast-able join of ranks onto edges (ranks are
    O(|V|) narrow rows), one shuffle aggregate on dst, and the dangling
    mass (vertices with no out-edges leak their rank; the standard fix
    redistributes it uniformly) as a broadcast 1-ROW AGGREGATE cross-joined
    into the update — NO per-round driver action: the whole round stays one
    lazy plan that the localCheckpoint materializes (which also bounds plan
    growth, exactly like connected_components above). Fixed iteration count
    keeps the result deterministic — convergence-threshold loops make
    run-to-run output depend on float noise.
    """
    v = vertices.select(F.col(id_col).alias("id")).localCheckpoint()
    e = edges.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d")).localCheckpoint()
    n = v.count()
    outdeg = e.groupBy("_s").agg(F.count("*").alias("_deg"))

    ranks = v.select("id", F.lit(1.0 / n).alias("rank")).localCheckpoint()
    for it in range(iters):
        contrib_src = (
            ranks.join(outdeg, ranks["id"] == outdeg["_s"], "left")
            .select("id", "rank", "_deg")
        )
        dangling = (
            contrib_src.where(F.col("_deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
        )
        msgs = (
            e.join(contrib_src.where(F.col("_deg").isNotNull()), e["_s"] == contrib_src["id"])
            .select(F.col("_d").alias("id"), (F.col("rank") / F.col("_deg")).alias("_c"))
            .groupBy("id")
            .agg(F.sum("_c").alias("_in"))
        )
        # Same IEEE expression shape as the DuckDB oracle:
        # (1-d)/n + d*dm/n, then + d*coalesce(in, 0).
        base = (
            F.lit((1.0 - damping) / n)
            + F.lit(damping) * F.col("_dm") / F.lit(float(n))
        )
        ranks = v.join(msgs, "id", "left").crossJoin(F.broadcast(dangling)).select(
            "id",
            (base + F.lit(damping) * F.coalesce(F.col("_in"), F.lit(0.0))).alias("rank"),
        )
        # Checkpoint EVERY round: the round's output feeds TWO consumers in
        # the next plan (the dangling-mass aggregate and the message join),
        # so an un-materialized round recomputes 2x+ per reference —
        # measured as a heavy-tailed fused cadence (median 4.2 s with
        # 17.9 s outliers vs 3.9 s tight when materialized; the same
        # dual-reference hazard that reverted the CC probe fusion). At
        # scale, recomputing a skipped round would be far worse than one
        # extra scheduled job per iteration.
        ranks = ranks.localCheckpoint()
    return ranks


def connected_components_two_phase(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components via alternating large-star / small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — the O(log n)-round alternative to min-label propagation for
    adversarial high-diameter graphs. Same contract as
    ``connected_components``; that one stays the default for dedup graphs
    (near-cliques converge in 2-3 propagation rounds with less work per
    round).

    Round shape: each star operation is ONE groupBy over the symmetrized
    neighborhood (computing each node's minimum neighbor) followed by an
    edge rewrite — no joins at all, so a round costs two shuffles on the
    node key regardless of structure. Convergence: the edge multiset stops
    changing; checked with a cheap count+min aggregate fingerprint (exact
    stability detection would need a full anti-join; the fingerprint is a
    standard practical proxy and the iteration cap backstops it).
    """
    # Work on undirected edges as (u, v); keep self-loops out.
    e = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )

    def _nbrs(frame: DataFrame) -> DataFrame:
        return frame.unionAll(
            frame.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )

    def _large_star(frame: DataFrame) -> DataFrame:
        # For each u: m = min(Γ(u) ∪ {u}); connect every LARGER neighbor to m.
        nb = _nbrs(frame)
        m = nb.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        out = (
            nb.where(F.col("v") > F.col("u"))
            .join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        return out.localCheckpoint()

    def _small_star(frame: DataFrame) -> DataFrame:
        # For each u: m = min over SMALLER neighbors ∪ {u}; connect those
        # smaller neighbors AND u itself to m.
        nb = _nbrs(frame)
        smaller = nb.where(F.col("v") < F.col("u"))
        m = smaller.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        rewired = smaller.join(m, "u").select(
            F.col("v").alias("u"), F.col("m").alias("v")
        )
        self_edge = m.select(F.col("u"), F.col("m").alias("v"))
        out = (
            rewired.unionAll(self_edge)
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        return out.localCheckpoint()

    def _star(frame: DataFrame, large: bool) -> DataFrame:
        return _large_star(frame) if large else _small_star(frame)

    prev_fp = None
    for _ in range(max_iter):
        e = _star(e, large=True)
        e = _star(e, large=False)
        fp = e.agg(
            F.count("*"), F.coalesce(F.sum(F.col("u") + F.col("v")), F.lit(0))
        ).collect()[0]
        fp = (fp[0], fp[1])
        if fp == prev_fp:
            break
        prev_fp = fp

    # After convergence every surviving edge is (node, component-min).
    comp = e.select(F.col("u").alias("id"), F.col("v").alias("component"))
    # Re-attach isolated vertices (they lost all edges or never had any).
    v = vertices.select(F.col(id_col).alias("id"))
    return (
        v.join(comp, "id", "left")
        .select("id", F.coalesce(F.col("component"), F.col("id")).alias("component"))
        .groupBy("id")
        .agg(F.min("component").alias("component"))
    )
