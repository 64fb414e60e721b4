"""Incremental aggregate maintenance: mergeable partial-aggregate state.

The 100 TB pattern this encodes: a grouped aggregate over an append-only
fact table should never rescan history. Keep per-group PARTIAL state
(count + exact decimal sums — the commutative-monoid core of Spark's own
partial/final aggregation split), persist it, and on each refresh merge
the stored state with the partials of the new delta only. Cost per
refresh is O(delta + |groups|), independent of history size; the merge
itself is associative, so states from any number of increments (or
backfills arriving out of order) combine to the same result — the exact
property Spark relies on for map-side combine, lifted to cross-RUN
incrementality.

Sums accumulate in DECIMAL (functions/numeric.py rationale): merging is
then bit-exact and order-independent, so an incrementally-maintained
aggregate is indistinguishable from a full recompute — which is what the
registered query's oracle (full-recompute SQL over the union) proves.

Reference scope: GridMR recomputes every job from scratch (SURVEY §2.A);
incremental state is part of the warehouse surface this engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gridmr_spark.functions.numeric import dmoney

__all__ = ["partial_aggs", "cdc_partial_aggs", "merge_partial_aggs", "finalize_aggs"]


def partial_aggs(
    df: DataFrame,
    keys: list[str],
    sums: dict[str, str],
) -> DataFrame:
    """Per-group partial state: n_rows plus an exact DECIMAL(38,2) sum per
    entry in ``sums`` (out_name -> input double column). DECIMAL(38,2)
    accumulators leave ~20 integer digits of headroom — re-merging many
    increments cannot overflow at money-like magnitudes."""
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(dmoney(src, 2)).cast("decimal(38,2)").alias(out)
        for out, src in sums.items()
    ]
    return df.groupBy(*keys).agg(*aggs)


def cdc_partial_aggs(
    df: DataFrame,
    keys: list[str],
    sums: dict[str, str],
    op_col: str = "op",
) -> DataFrame:
    """Partial state of a CDC delta WITH RETRACTIONS — the Z-set/retract
    algebra (Flink retract streams, DBSP): an ``'I'`` row weights +1, a
    ``'D'`` row −1 (an update is encoded as D-old + I-new, the standard
    retract+insert pair), so n_rows is the signed count and each DECIMAL
    sum accumulates the signed value. The output merges with append-only
    states through the unchanged ``merge_partial_aggs`` — deletion support
    costs nothing in the monoid, only in the encoding. A group whose rows
    all vanished nets to n_rows == 0; render with
    ``finalize_aggs(drop_empty=True)`` so it disappears from the view.

    Unknown op codes fail the job loudly (raise_error) rather than
    silently weighting NULL — a malformed CDC feed must never corrupt
    maintained state."""
    w = (
        F.when(F.col(op_col) == "I", F.lit(1).cast("long"))
        .when(F.col(op_col) == "D", F.lit(-1).cast("long"))
        .otherwise(
            F.raise_error(
                F.concat(F.lit("cdc_partial_aggs: unknown op "), F.col(op_col))
            ).cast("long")
        )
    )
    weighted = df.withColumn("_w", w)
    aggs = [F.sum("_w").cast("long").alias("n_rows")] + [
        F.sum(
            F.when(F.col("_w") < 0, -dmoney(src, 2)).otherwise(dmoney(src, 2))
        )
        .cast("decimal(38,2)")
        .alias(out)
        for out, src in sums.items()
    ]
    return weighted.groupBy(*keys).agg(*aggs)


def merge_partial_aggs(states: list[DataFrame], keys: list[str]) -> DataFrame:
    """Merge any number of partial-state frames (stored base + fresh
    deltas): union, then re-sum per group. Associative and commutative —
    merge order and increment granularity cannot change the result."""
    unioned = states[0]
    for s in states[1:]:
        unioned = unioned.unionByName(s)
    sum_cols = [c for c in unioned.columns if c not in keys and c != "n_rows"]
    aggs = [F.sum("n_rows").cast("long").alias("n_rows")] + [
        F.sum(c).cast("decimal(38,2)").alias(c) for c in sum_cols
    ]
    return unioned.groupBy(*keys).agg(*aggs)


def finalize_aggs(
    state: DataFrame, keys: list[str], drop_empty: bool = False
) -> DataFrame:
    """Render merged state for consumers: sums and averages as doubles
    (single deterministic decimal->double cast / division per value).
    ``drop_empty=True`` removes groups whose signed count netted to zero —
    required after merging retraction deltas (``cdc_partial_aggs``), where
    a fully-deleted group leaves a zero-state tombstone rather than
    vanishing from the frame."""
    if drop_empty:
        state = state.where(F.col("n_rows") != 0)
    sum_cols = [c for c in state.columns if c not in keys and c != "n_rows"]
    out = [F.col(k) for k in keys] + [F.col("n_rows")]
    for c in sum_cols:
        out.append(F.col(c).cast("double").alias(c))
        out.append(
            (F.col(c).cast("double") / F.col("n_rows").cast("double")).alias(f"avg_{c}")
        )
    return state.select(*out)
