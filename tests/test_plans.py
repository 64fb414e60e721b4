"""Physical-plan audits: correctness tests prove the right ANSWER; these
prove the right PLAN — the properties that decide whether a query survives a
100× scale-up (pushdown, pruning, broadcast vs shuffle, top-k short-circuit,
partial aggregation). A regression here is a performance bug even when every
value still matches."""

from __future__ import annotations

import pytest

import re

from gridmr_spark.queries import load_all
from gridmr_spark.testing import plan_string

REG = load_all()


def _plan(spark, sf_oracle, name):
    return plan_string(REG[name].fn(spark, sf_oracle))


def test_filter_project_pushes_predicates_to_scan(spark, sf_oracle):
    plan = _plan(spark, sf_oracle, "filter_project")
    assert "PushedFilters:" in plan
    pushed = plan.split("PushedFilters:", 1)[1].split("\n", 1)[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed down: {pushed}"


def test_filter_project_prunes_columns(spark, sf_oracle):
    plan = _plan(spark, sf_oracle, "filter_project")
    read_schema = plan.split("ReadSchema:", 1)[1].split("\n", 1)[0]
    assert "l_returnflag" not in read_schema  # unused column not scanned
    assert "l_extendedprice" in read_schema


def test_star_join_broadcasts_dimensions(spark, sf_oracle):
    plan = _plan(spark, sf_oracle, "join_star_revenue")
    assert plan.count("BroadcastHashJoin") >= 2  # nation + region at minimum
    assert "CartesianProduct" not in plan


def test_range_band_join_is_broadcast_not_cartesian(spark, sf_oracle):
    plan = _plan(spark, sf_oracle, "join_range_band")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_global_topk_avoids_full_sort(spark, sf_oracle):
    plan = _plan(spark, sf_oracle, "topk_global")
    assert "TakeOrderedAndProject" in plan  # per-partition heap, not global sort


def test_grouped_topk_uses_window_group_limit(spark, sf_oracle):
    plan = _plan(spark, sf_oracle, "window_topk_per_group")
    assert "WindowGroupLimit" in plan  # rank filter pushed below the shuffle


def test_wordcount_has_partial_aggregation(spark, sf_oracle):
    # Two HashAggregates (partial + final) = map-side combine, the thing
    # the reference lacks (every word\t1 crossed its shuffle; SURVEY §4.1).
    plan = _plan(spark, sf_oracle, "wordcount")
    assert len(re.findall(r"HashAggregate", plan)) >= 2


def test_semi_join_pushes_order_filter_below_join(spark, sf_oracle):
    plan = _plan(spark, sf_oracle, "join_semi")
    assert "LeftSemi" in plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln and "o_totalprice" in ln]
    assert pushed, "o_totalprice filter should reach the orders scan"


def test_q1_single_scan_no_join(spark, sf_oracle):
    plan = plan_string(REG["q1_pricing_summary"].fn(spark, sf_oracle), "simple")
    assert "Join" not in plan
    assert len(re.findall(r"Scan parquet", plan)) == 1


def test_partition_pruned_scan_filters_on_directory_names(spark, sf_oracle):
    """source_partition_pruning: the o_orderpriority predicate must land in
    PartitionFilters (directory pruning — zero I/O for other partitions),
    not in the data filters."""
    plan = _plan(spark, sf_oracle, "source_partition_pruning")
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters:", 1)[1].split("\n", 1)[0]
    assert "o_orderpriority" in pf and "1-URGENT" in pf, pf


def test_bucketed_join_plans_zero_exchange(spark, sf_oracle):
    """layout_bucketed_join: both sides are pre-bucketed on the join key, so
    the SortMergeJoin subtree must contain NO shuffle exchange (the agg
    above the join keeps its own exchange — that one is expected)."""
    plan = plan_string(REG["layout_bucketed_join"].fn(spark, sf_oracle), "simple")
    assert "SortMergeJoin" in plan
    below_join = plan.split("SortMergeJoin", 1)[1]  # tree prints children after parent
    assert "Exchange" not in below_join, below_join


@pytest.mark.slow
def test_queries_avoid_cartesian_products(spark, sf_oracle):
    """No registered query may plan a CartesianProduct — the instant
    scale-killer. (Intentional cross joins must be broadcast-side.)"""
    offenders = []
    for name in sorted(REG):
        plan = plan_string(REG[name].fn(spark, sf_oracle), "simple")
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert not offenders, f"cartesian products in: {offenders}"


def test_asof_join_is_single_shuffle_no_join_operator(spark, sf_oracle):
    """The union+window as-of plan: ONE Exchange (hash on the key), no join
    operator at all — the property that keeps it one pass at any right-table
    size. Holds for all three registered variants."""
    for name in ("join_asof", "join_asof_forward", "join_asof_tolerance"):
        plan = _plan(spark, sf_oracle, name)
        # count operator detail entries ("(9) Exchange"), not tree-summary
        # echoes of the same node
        n_exchange = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
        assert n_exchange == 1, f"{name}: expected 1 Exchange, got {n_exchange}\n{plan}"
        assert "Join" not in plan, f"{name}: unexpected join operator\n{plan}"


def test_blocked_gemm_is_cogrouped_single_plan(spark, sf_oracle):
    """The 2-D block grid must plan as ONE cogrouped-pandas operator — not a
    driver loop of per-block jobs (the pre-round-3 shape had no cogroup and
    issued one collect per block)."""
    plan = _plan(spark, sf_oracle, "similarity_topk_gemm_blocked")
    assert "FlatMapCoGroupsInPandas" in plan, plan


def test_blocked_gemm_plans_without_count_job(spark, sf_oracle, monkeypatch):
    """Grid sizing must come from parquet footer metadata (table_rows), not
    a queries.count() job — an extra full scan wave per invocation at scale.
    Building the registered query's plan with DataFrame.count poisoned must
    succeed."""
    from pyspark.sql import DataFrame

    from gridmr_spark.queries import load_all

    def _boom(self):
        raise AssertionError("count() job issued during plan construction")

    monkeypatch.setattr(DataFrame, "count", _boom)
    df = load_all()["similarity_topk_gemm_blocked"].fn(spark, sf_oracle)
    assert df.schema is not None


def test_simhash_signature_not_recomputed(spark, sf_oracle):
    """The simhash signature table feeds 2*blocks join legs; after the
    localCheckpoint it must appear as a materialized scan — zero parquet
    rescans of the documents table in the pair-join plan (audited regression:
    8 scans / 34 hash aggregates without it)."""
    plan = _plan(spark, sf_oracle, "dedup_simhash")
    assert plan.count("Scan parquet") == 0, plan


def test_profile_reads_table_once(spark, sf_oracle):
    """dq_profile_columns claims one scan for all per-column statistics —
    the 1-vs-C-scans property that matters at 100 TB. (Spark's Expand for
    multiple count-distincts multiplies rows, never rescans.)"""
    plan = _plan(spark, sf_oracle, "dq_profile_columns")
    n_scans = len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M))
    assert n_scans == 1, plan


def test_scd2_windows_share_one_sort(spark, sf_oracle):
    """Both SCD2 windows (lag-collapse, lead-close) sort on the same
    (key, ts, seq) — the plan must contain exactly one Exchange and at most
    two Sort operators over it, not a shuffle per window."""
    plan = _plan(spark, sf_oracle, "merge_scd2_history")
    n_exchange = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchange == 1, plan


def test_fuzzy_blocked_pairs_is_equi_join(spark, sf_oracle):
    """The symmetric-deletion matcher must plan as a hash EQUI-join on the
    deletion-variant key — never a nested loop over the pair space (the
    failure mode of theta-join fuzzy matching on fact tables)."""
    plan = _plan(spark, sf_oracle, "fuzzy_blocked_pairs")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "HashJoin" in plan, plan


def test_ds_date_star_broadcasts_derived_dim(spark, sf_oracle):
    """The derived date dimension must reach the fact join as a broadcast —
    the star join itself may move no fact rows."""
    plan = _plan(spark, sf_oracle, "ds_date_star")
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "CartesianProduct" not in plan


def test_ds_returns_anti_pushes_returnflag(spark, sf_oracle):
    """The 'R' predicate must reach the lineitem scan (the anti side builds
    from a filtered fraction, not the whole fact)."""
    plan = _plan(spark, sf_oracle, "ds_returns_anti")
    assert "LeftAnti" in plan, plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln and "l_returnflag" in ln]
    assert pushed, plan


def test_ds_rollup_windows_aggregate_not_fact(spark, sf_oracle):
    """The moving-average window must sit ABOVE the monthly aggregate: plan
    order is window after both partial+final hash aggregates (never a
    window over raw fact rows)."""
    import re as _re

    plan = plan_string(REG["ds_store_sales_rollup"].fn(spark, sf_oracle), "simple")
    win = plan.index("Window")
    aggs = [m.start() for m in _re.finditer("HashAggregate", plan)]
    # tree prints parents first: the window node must appear before (above)
    # the aggregates feeding it
    assert aggs and win < min(aggs), plan


def test_bucketed_interval_join_is_equi_join(spark, sf_oracle):
    """The binned range join must plan as a hash equi-join on the bucket id
    (+ residual filter) — the lossless replacement for a nested loop when
    the interval side outgrows a broadcast."""
    plan = _plan(spark, sf_oracle, "join_range_bucketed")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "HashJoin" in plan, plan


def test_dynamic_partition_pruning_in_fact_scan(spark, sf_oracle):
    """The DPP query's fact scan must carry a runtime dynamicpruning
    expression in PartitionFilters — the join-driven pruning that static
    pushdown cannot provide."""
    plan = _plan(spark, sf_oracle, "source_dynamic_partition_pruning")
    assert "dynamicpruning" in plan, plan


def test_time_band_counts_single_scan(spark, sf_oracle):
    """q88 shape: eight banded counts must come from ONE fact scan
    (conditional aggregation), never eight subquery scans."""
    import re as _re

    plan = _plan(spark, sf_oracle, "ds_time_band_counts")
    n_scans = len(_re.findall(r"^\(\d+\) Scan parquet", plan, _re.M))
    assert n_scans == 1, plan
    pushed = plan.split("PushedFilters:", 1)[1].split("\n", 1)[0]
    assert "l_shipdate" in pushed, pushed


def test_resample_spine_is_generated_not_scanned(spark, sf_oracle):
    """events_resample_locf: exactly ONE parquet scan feeds both the hourly
    aggregate and the spine bounds — the spine itself is generated
    (explode over sequence), never read from storage."""
    import re as _re

    plan = _plan(spark, sf_oracle, "events_resample_locf")
    n_scans = len(set(_re.findall(r"Location: InMemoryFileIndex \[[^\]]+\]", plan)))
    assert n_scans == 1, plan
    assert "Generate" in plan, plan  # the sequence explode


def test_cdc_deletes_window_over_log_not_target(spark, sf_oracle):
    """merge_cdc_with_deletes: the latest-op window must consume the change
    LOG (a union of filtered projections), and the target must reach the
    result only through a LeftAnti join — never through the window."""
    plan = _plan(spark, sf_oracle, "merge_cdc_with_deletes")
    assert "LeftAnti" in plan, plan
    assert "Window" in plan, plan


def test_subsequence_windows_aggregate_not_fact(spark, sf_oracle):
    """events_subsequence_match: both windows (LEADs, ranking) must sit
    above the hourly aggregate — the fact is scanned once and never
    windowed directly."""
    import re as _re

    plan = plan_string(REG["events_subsequence_match"].fn(spark, sf_oracle), "simple")
    win = plan.index("Window")
    aggs = [m.start() for m in _re.finditer("HashAggregate", plan)]
    assert aggs and win < min(aggs), plan


def test_bloom_filter_injected_under_production_sizes(spark, sf_oracle):
    """join_bloom_runtime must gain a runtime bloom filter pushed into the
    FACT side when the production size relationships hold. Locally the dim
    broadcasts (right plan at sf0.01), so the confs express the 100 TB
    shape: autoBroadcastJoinThreshold=-1 ("the dim is too big to
    broadcast") and applicationSideScanSizeThreshold=0 ("the fact scan is
    big enough to be worth guarding")."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = load_all()["join_bloom_runtime"].fn(spark, sf_oracle)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, "runtime bloom filter not injected"
        assert "bloom_filter_agg" in plan
        # The guard must sit on the fact (lineitem) side: the might_contain
        # call hashes the fact's join key.
        assert re.search(r"might_contain\(.*xxhash64\(l_orderkey", plan)
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join(spark):
    """At 100 TB the FIRST line of defense against a skewed join key is
    AQE's automatic skew-join split (manual salting — join_salted_skew —
    is the fallback for the cases AQE can't see). This proves the split
    actually fires: a 90%-hot key through a merge-hinted SMJ, thresholds
    scaled to local data volumes (the mechanism is identical at 256 MB
    defaults on a cluster), and the FINAL adaptive plan must show
    SortMergeJoin(skew=true) with a skewed AQEShuffleRead. The result must
    also stay correct: split partitions duplicate the other side's rows,
    never the join's output."""
    from gridmr_spark.plans import aqe_final_plan, skew_split_joins
    from pyspark.sql import functions as F

    overrides = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        left = spark.range(0, 300000, 1, 8).select(
            F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id") % 997).alias("k"),
            F.concat(F.lit("x" * 64), F.col("id")).alias("pay"),
        )
        right = spark.range(0, 997).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        # keep the fat payload in the output: Catalyst would otherwise
        # prune it and the hot partition drops under the (test-scaled)
        # skew threshold
        j = left.hint("merge").join(right, "k").select("k", "pay", "v")
        plan = aqe_final_plan(j)
        assert "isFinalPlan=true" in plan
        assert skew_split_joins(plan) >= 1, plan
        assert "AQEShuffleRead coalesced and skewed" in plan
        # correctness under the split: every left row joins exactly once
        assert j.count() == 300000
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# ---------------------------------------------------------------------------
# Round 13: schema-evolution feed, catalog CDC fold, hidden partitioning
# ---------------------------------------------------------------------------


def test_changefeed_evolve_reads_aligned_union_schema(spark, sf_oracle):
    """The evolution-crossing feed reads every delta file with ONE aligned
    nullable union schema (typed-NULL backfill), never a cartesian and
    never a positional mismatch; the compare stays bounded to the file-set
    delta (4 scans: added/removed x I/D exceptAll sides)."""
    from gridmr_spark.plans import audit

    df = REG["table_changefeed_evolve"].fn(spark, sf_oracle)
    rep = audit(df)
    assert not rep.has_cartesian
    # all 4 scans (added/removed x I/D) read the aligned union schema
    assert sum("o_orderstatus:string" in r for r in rep.read_schemas) == 4
    assert "CartesianProduct" not in plan_string(df)


def test_catalog_cdc_fold_joins_broadcast_with_pushdown(spark, sf_oracle):
    """The cross-table fold over the catalog feeds: the folded-state join
    broadcasts, join keys carry IsNotNull pushdown, and the feed parquet
    scans are column-complete (k/v/_op) with no cartesian anywhere."""
    plan = _plan(spark, sf_oracle, "stream_catalog_cdc_feed")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "IsNotNull(l_orderkey)" in plan and "IsNotNull(o_orderkey)" in plan


def test_partition_pruned_read_single_pruned_scan(spark, sf_oracle):
    """Hidden partitioning: the month-probe read is ONE scan whose
    ReadSchema is pruned to the aggregated column only (o_orderdate never
    decoded — the partition predicate was answered from the manifest, not
    the data)."""
    from gridmr_spark.plans import audit

    df = REG["table_partition_pruned_read"].fn(spark, sf_oracle)
    rep = audit(df)
    assert rep.n_scans == 1 and rep.joins == []
    # partition source column never read; only the aggregated measure is
    assert all("o_orderdate" not in r for r in rep.read_schemas)
    assert any("o_totalprice:double" in r for r in rep.read_schemas)


def test_metadata_agg_dv_result_is_metadata_only(spark, sf_oracle):
    """The DV-aware metadata query's RESULT plan reads zero files — the
    answers came from manifest JSON (the legs' audit scans happen
    in-harness, not in the returned plan)."""
    from gridmr_spark.plans import audit

    rep = audit(REG["table_metadata_agg_dv"].fn(spark, sf_oracle))
    assert rep.n_scans == 0 and rep.read_schemas == []
