"""Join operators Spark lacks natively: as-of join (time-series point-in-time
lookup). SURVEY.md §2.D row "As-of joins".

Implementation is the union+window trick — the scalable plan:
tag both sides, union, ONE shuffle on (key), per-key sort by (ts, side),
then `last(right_payload, ignorenulls=True)` over the preceding frame gives
every left row the most recent right row with right.ts <= left.ts. Cost is
one shuffle + one in-partition sort regardless of table sizes — no range
explosion, no per-row probe. (The pandas alternative, applyInPandas with
pd.merge_asof per group, materializes whole groups in Python; use it only
when group sizes are bounded.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    right_payload: list[str],
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the nearest right row per `on` key:
    direction='backward' (default) = latest right with right.ts <= left.ts;
    direction='forward' = earliest right with right.ts >= left.ts. Right rows
    at exactly equal ts DO match in both directions (ASOF >=/<= semantics).

    right_payload: right columns to carry (prefixed as-of values in output).
    tolerance: optional max lookback/lookahead (e.g. '1 hour') — matches
    farther away null out.

    Forward is the time-mirror of backward: sort descending and take the
    "last seen" right row, which is the earliest-at-or-after in real time —
    same one-shuffle one-sort cost, no second code path.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    fwd = direction == "forward"
    lcols = left.columns
    l = left.select(
        *lcols, F.lit(1).alias("_is_left"), *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_payload]
    )
    r = right.select(
        *[
            F.col(c) if c in (on, ts) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("_is_left"),
        *[F.col(c).alias(f"_r_{c}") for c in right_payload],
    )
    unioned = l.unionByName(r)
    # Right rows sort BEFORE left rows at equal ts (_is_left 0 < 1), so an
    # equal-timestamp right row is visible to the left row's frame. Forward
    # mode flips the ts order (desc): "preceding in sort order" then means
    # "at-or-after in time".
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).desc() if fwd else F.col(ts).asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    asof_ts = F.last(F.when(F.col("_is_left") == 0, F.col(ts)), ignorenulls=True).over(w)
    proj = [
        F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"asof_{c}")
        for c in right_payload
    ]
    out = unioned.select(*lcols, "_is_left", asof_ts.alias("asof_ts"), *proj).where(
        F.col("_is_left") == 1
    )
    if tolerance is not None:
        if fwd:
            within = F.col("asof_ts") <= F.col(ts) + F.expr(f"INTERVAL {tolerance}")
        else:
            within = F.col("asof_ts") >= F.col(ts) - F.expr(f"INTERVAL {tolerance}")
        out = out.select(
            *lcols,
            F.when(within, F.col("asof_ts")).alias("asof_ts"),
            *[F.when(within, F.col(f"asof_{c}")).alias(f"asof_{c}") for c in right_payload],
        )
    else:
        out = out.drop("_is_left")
    return out


def interval_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_seconds: int,
) -> DataFrame:
    """Point-in-interval join with NO equi key, as a bucketed EQUI-join —
    the both-sides-big range join (the broadcast-dim shape in
    join_range_band stops working when the interval side outgrows a
    broadcast). Time is partitioned into fixed buckets; every interval
    explodes into each bucket it overlaps, every point maps to exactly one
    bucket, and the join becomes an equi-join on bucket id followed by the
    exact residual predicate start <= point < end. Lossless: an interval
    covers every bucket its span touches, so each qualifying (point,
    interval) pair meets in exactly the point's bucket.

    Scale behavior: shuffle is hash(bucket) on both sides — linear, no
    nested loop. Replication factor on the interval side is
    ceil(span/bucket)+1, so pick bucket_seconds ~ the typical interval
    length (replication <= 2); per-bucket row volume is bounded by time
    locality, and a pathological hot bucket responds to AQE skew-join like
    any other equi-join — none of which is true of a BroadcastNestedLoop.

    Returns all point columns plus the interval columns (caller aliases
    to avoid collisions).
    """
    p_bucket = F.floor(F.unix_timestamp(F.col(point_ts)) / F.lit(bucket_seconds))
    i_lo = F.floor(F.unix_timestamp(F.col(start_ts)) / F.lit(bucket_seconds))
    i_hi = F.floor(F.unix_timestamp(F.col(end_ts)) / F.lit(bucket_seconds))
    p = points.withColumn("_bucket", p_bucket)
    i = intervals.withColumn("_bucket", F.explode(F.sequence(i_lo, i_hi)))
    return (
        p.join(i, "_bucket")
        .where((F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) < F.col(end_ts)))
        .drop("_bucket")
    )
