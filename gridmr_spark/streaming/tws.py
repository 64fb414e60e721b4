"""Arbitrary stateful streaming via transformWithStateInPandas (Spark 4's
successor to applyInPandasWithState): typed per-key state handles
(value/list/map), EVENT-TIME TIMERS, and optional state TTL, running on the
RocksDB state store.

Operator here: per-user gap sessionization with closed-session emission —
the canonical "built-in windows can't express it" stateful shape (a session
must close either when a LATER event reveals the gap, or when the WATERMARK
passes the gap horizon with no later event; the second needs timers).

State per user is ONE open-session accumulator (start/last/n/cents — four
longs), independent of history length, and every session is emitted exactly
once, so state size and output are both bounded — the property that lets
this run on an unbounded 100 TB ingest. Exact integer cents (banker's
rounding, matching Spark rint / DuckDB round_even) keep stream, batch twin,
and oracle bit-identical.

Stream==batch equality is asserted in tests/test_tws.py two ways: the
processor is driven DIRECTLY through a fake state handle (multi-batch
splits + timer expiry — no Spark plumbing needed, runs everywhere), and
end-to-end through a real readStream when the protobuf runtime is present
(transformWithState's Python<->JVM state server speaks protobuf, which this
container lacks — `has_protobuf()` gates that test, like PIL gated the
image codec before the stdlib decoder). The batch twin carries the DuckDB
gaps-and-islands oracle for the driver gate
(queries/streaming_batch.py:stream_tws_sessions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

GAP_US = 600_000_000  # 10 minutes, microsecond-exact


def has_protobuf() -> bool:
    """transformWithState's state-server protocol needs the google.protobuf
    runtime; absent, the driver-side schema worker crashes at query start."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False

_PROC_OUT = "user_id long, start_us long, end_us long, n_events long, cents long"


class SessionProcessor(StatefulProcessor):
    """Per-user 10-minute-gap sessionization.

    handleInputRows merges the batch's events (sorted by ts, event_id) into
    the open-session state, emits every session CLOSED by a later event's
    gap, and (re)registers an event-time timer at open.last + gap.
    handleExpiredTimer emits the still-open session once the watermark
    passes that horizon — the only way the final session of a quiet key
    ever closes on an unbounded stream."""

    def __init__(self, gap_us: int = GAP_US, ttl_ms: int | None = None):
        self.gap_us = gap_us
        self.ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        # Optional TTL: for ephemeral analytics a deployment may let idle
        # keys' state lapse instead of timer-flushing; default off because
        # TTL is processing-time and therefore non-deterministic.
        self.open = handle.getValueState(
            "open", "start long, last long, n long, cents long", ttlDurationMs=self.ttl_ms
        )

    def _emit(self, user_id, start, last, n, cents):
        import pandas as pd

        return pd.DataFrame(
            {
                "user_id": pd.Series([user_id], dtype="int64"),
                "start_us": pd.Series([start], dtype="int64"),
                "end_us": pd.Series([last], dtype="int64"),
                "n_events": pd.Series([n], dtype="int64"),
                "cents": pd.Series([cents], dtype="int64"),
            }
        )

    def handleInputRows(self, key, rows, timerValues: TimerValues):
        import numpy as np
        import pandas as pd

        pdf = pd.concat(list(rows), ignore_index=True)
        if pdf.empty:
            return
        pdf = pdf.sort_values(["ts_us", "event_id"], kind="mergesort")
        ts = pdf["ts_us"].to_numpy(dtype="int64")
        cents = np.rint(pdf["value"].to_numpy(dtype="float64") * 100).astype("int64")
        (user_id,) = key
        user_id = int(user_id)
        if self.open.exists():
            start, last, n, total = (int(x) for x in self.open.get())
        else:
            start, last, n, total = int(ts[0]), int(ts[0]) - 1, 0, 0
            # (last is a sentinel below the first event; the first gap test
            # against it can never close an empty session because n == 0)
        for i in range(len(ts)):
            if n > 0 and int(ts[i]) - last >= self.gap_us:
                yield self._emit(user_id, start, last, n, total)
                start, n, total = int(ts[i]), 0, 0
            # A late-but-in-watermark event (ts < last) extends the open
            # session BACKWARD, never regresses its high-water mark: with
            # last = ts[i] a later event could measure its gap from the
            # stale low point and emit an inverted (end < start) session
            # the batch twin never produces. min/max merging matches the
            # batch twin whenever watermark_delay <= gap (a later event
            # can then never belong to an already-closed earlier session),
            # which is the operator's documented operating range.
            if n == 0:
                start = int(ts[i])
            else:
                start = min(start, int(ts[i]))
            last = max(last, int(ts[i]))
            n += 1
            total += int(cents[i])
        self.open.update((start, last, n, total))
        # One live timer per key: the open session's close horizon. Ceil to
        # the ms grid — floor would fire up to 999us BEFORE last+gap and
        # close a session a just-inside-the-gap event should extend.
        for t in self.handle.listTimers():
            self.handle.deleteTimer(t)
        self.handle.registerTimer(-(-(last + self.gap_us) // 1000))

    def handleExpiredTimer(self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo):
        if self.open.exists():
            start, last, n, total = (int(x) for x in self.open.get())
            if n > 0:
                yield self._emit(int(key[0]), start, last, n, total)
            self.open.clear()

    def close(self) -> None:
        pass


def _finish(out: DataFrame) -> DataFrame:
    return out.select(
        "user_id",
        F.timestamp_micros("start_us").alias("session_start"),
        F.timestamp_micros("end_us").alias("session_end"),
        "n_events",
        (F.col("cents").cast("double") / 100.0).alias("total_value"),
    )


def user_sessions_tws(
    events: DataFrame, watermark_delay: str = "0 seconds", gap_us: int = GAP_US
) -> DataFrame:
    """Streaming form: watermarked events through the SessionProcessor.
    Requires the RocksDB state store provider
    (spark.sql.streaming.stateStore.providerClass).

    Operating range: watermark_delay must not exceed the session gap.
    Late events within the watermark merge into the open session via
    min/max (backward extension); a watermark longer than the gap could
    deliver an event belonging to a session the timer already closed,
    which no per-key single-session state can stitch back together."""
    proc_in = (
        events.withWatermark("ts", watermark_delay)
        .select("user_id", "event_id", "ts", F.unix_micros("ts").alias("ts_us"), "value")
    )
    out = proc_in.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=SessionProcessor(gap_us),
        outputStructType=_PROC_OUT,
        outputMode="Append",
        timeMode="EventTime",
    )
    return _finish(out)


def user_sessions_batch(events: DataFrame, gap_us: int = GAP_US) -> DataFrame:
    """Batch twin: classic gaps-and-islands with the identical ordering
    ((ts, event_id)) and identical integer-cents arithmetic. Equals the
    stream's output once the watermark has passed every session (the
    infinite-watermark limit)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ok = (
        F.lag("ts").over(w).isNull()
        | ((F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))) >= gap_us)
    )
    islands = events.select(
        "user_id",
        "ts",
        "value",
        F.sum(gap_ok.cast("long"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("sid"),
    )
    return islands.groupBy("user_id", "sid").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (
            F.sum(F.expr("CAST(rint(value * 100) AS BIGINT)")).cast("double") / 100.0
        ).alias("total_value"),
    ).drop("sid")
