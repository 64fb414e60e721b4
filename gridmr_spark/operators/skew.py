"""Skew mitigation: salted two-phase aggregation.

A single hot key funnels its entire group through one reduce task — the
reference had exactly this failure mode with zero mitigation
(mapper.cc:91-93; SURVEY.md §4.2 skew row). AQE's skew-join splitting covers
joins; for AGGREGATIONS over hot keys the standard fix is salting:

  phase 1: groupBy(key, salt) with salt = pmod(hash-ish, n_salts)
           -> n_salts partial rows per hot key, spread across tasks
  phase 2: groupBy(key) combining the partials

Results are exactly the plain groupBy's (counts and decimal sums are
associative), so the salted path is oracle-checkable — not just a demo.
For Spark's built-in partial aggregation this is usually redundant; salting
matters when the DISTINCT-ish state per key is large (collect_set,
count_distinct re-aggregation) or when using size-limited accumulators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    n_salts: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-phase salted aggregation.

    partial_aggs: aggregates over (key, salt) — must be associative pieces.
    final_aggs: aggregates combining the partials back to per-key results.
    salt_source: column whose hash spreads rows (defaults to a per-row
    monotonic id substitute: xxhash64 of all key cols is NOT enough — the
    salt must differ WITHIN a key, so hash a high-cardinality column).
    """
    if salt_source is None:
        salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    else:
        salt = F.pmod(F.xxhash64(salt_source), F.lit(n_salts))
    phase1 = df.withColumn("_salt", salt).groupBy(*key_cols, "_salt").agg(*partial_aggs)
    return phase1.groupBy(*key_cols).agg(*final_aggs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    n_salts: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Skewed shuffle-join mitigation by salting: every fact row draws a salt
    in [0, n_salts); the dim side replicates n_salts ways (one copy per salt
    value); the join runs on (keys..., salt). A hot key's fact rows spread
    across n_salts reduce tasks instead of funneling through one, at the
    cost of shuffling the dim side n_salts times — the right trade when
    |dim| << |fact| but dim is still too large to broadcast.

    Exactness: each fact row joins the dim copy carrying its own salt and no
    other, so the output multiset equals the plain join's — oracle-checkable,
    not just a demo. (AQE's skew-join split covers sort-merge joins
    post-shuffle; explicit salting also covers hash joins, pre-planned
    partitioning, and engines/configs where AQE is off.)
    """
    if salt_source is None:
        salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    else:
        salt = F.pmod(F.xxhash64(salt_source), F.lit(n_salts))
    f = fact.withColumn("_salt", salt)
    d = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i).cast("long") for i in range(n_salts)]))
    )
    return f.join(d, [*on, "_salt"]).drop("_salt")
