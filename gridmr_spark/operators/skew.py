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
