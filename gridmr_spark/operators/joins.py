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
