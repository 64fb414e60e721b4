"""Arbitrary stateful streaming via transformWithStateInPandas (Spark 4's
successor to applyInPandasWithState): typed per-key state handles
(value/list/map), EVENT-TIME TIMERS, and optional state TTL, running on the
RocksDB state store.

Operator here: per-user gap sessionization with closed-session emission —
the canonical "built-in windows can't express it" stateful shape (a session
must close either when a LATER event reveals the gap, or when the WATERMARK
passes the gap horizon with no later event; the second needs timers).

Emission is WATERMARK-GATED, not eager: a session revealed as gap-closed by
a later in-batch event is buffered in a ListState and only emitted once the
watermark passes its close horizon (last + gap). Eager emission is unsound
under late data — after a split at S with session end L, an event with
L < ts < L + gap stays admissible whenever (S - L) - gap < watermark_delay,
and the batch twin merges it into the already-emitted session. Deferring
until the watermark proves no admissible event can extend a session makes
stream == batch over the ADMITTED events for ANY watermark delay (dropped
too-late rows are the only divergence, and that is the watermark contract
itself).

State per user is the list of not-yet-final sessions (each four longs:
start/last/n/cents); its length is bounded by the number of sessions that
fit inside one watermark delay, independent of history length, and every
session is emitted exactly once — the properties that let this run on an
unbounded 100 TB ingest. Exact integer cents (banker's rounding, matching
Spark rint / DuckDB round_even) keep stream, batch twin, and oracle
bit-identical.

Stream==batch equality is asserted in tests/test_tws.py two ways: the
processor is driven DIRECTLY through a fake state handle (multi-batch
splits + late events + timer expiry — no Spark plumbing needed, runs
everywhere), and end-to-end through a real readStream when the protobuf
runtime is importable (transformWithState's Python<->JVM state server
speaks protobuf; ``gridmr_spark.compat.pbshim`` makes a vendored runtime
importable when no site-packages protobuf exists). The batch twin carries
the DuckDB gaps-and-islands oracle for the driver gate
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
    runtime; absent, the driver-side schema worker crashes at query start.
    ``compat.pbshim`` can make a vendored runtime importable first."""
    try:
        from gridmr_spark.compat.pbshim import ensure_protobuf

        return ensure_protobuf()
    except ImportError:
        return False

_PROC_OUT = "user_id long, start_us long, end_us long, n_events long, cents long"


class SessionProcessor(StatefulProcessor):
    """Per-user 10-minute-gap sessionization with watermark-gated emission.

    handleInputRows merges the batch's events into the buffered session
    list (interval union with gap tolerance — the exact islands partition
    of the underlying events, independent of arrival order), emits every
    session whose close horizon (last + gap) the watermark has passed, and
    keeps one live timer at the earliest remaining horizon.
    handleExpiredTimer re-runs the same finalize step once the watermark
    fires it — the only way the final session of a quiet key ever closes
    on an unbounded stream."""

    def __init__(self, gap_us: int = GAP_US, ttl_ms: int | None = None):
        self.gap_us = gap_us
        self.ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        # Optional TTL: for ephemeral analytics a deployment may let idle
        # keys' state lapse instead of timer-flushing; default off because
        # TTL is processing-time and therefore non-deterministic.
        self.sessions = handle.getListState(
            "sessions", "start long, last long, n long, cents long", ttlDurationMs=self.ttl_ms
        )

    @staticmethod
    def _emit(user_id, finals):
        import pandas as pd

        return pd.DataFrame(
            {
                "user_id": pd.Series([user_id] * len(finals), dtype="int64"),
                "start_us": pd.Series([s[0] for s in finals], dtype="int64"),
                "end_us": pd.Series([s[1] for s in finals], dtype="int64"),
                "n_events": pd.Series([s[2] for s in finals], dtype="int64"),
                "cents": pd.Series([s[3] for s in finals], dtype="int64"),
            }
        )

    @staticmethod
    def _wm_us(timerValues: TimerValues | None) -> int | None:
        """Current watermark in us; None (fake-handle harness) means the
        batch isn't watermark-driven — finalize nothing here, everything at
        timer expiry (the harness's watermark -> infinity convention)."""
        if timerValues is None:
            return None
        wm_ms = timerValues.getCurrentWatermarkInMs()
        return wm_ms * 1000 if wm_ms is not None and wm_ms > 0 else 0

    def _merge(self, sessions, batch_islands):
        """Interval union with gap tolerance over buffered sessions + the
        batch's event islands, sorted by start. Equals the batch twin's
        islands partition of all underlying events regardless of how they
        were batched: two sessions merge iff next.start - prev.last < gap,
        which is exactly the consecutive-gap rule on the merged point set."""
        out = []
        for s in sorted(sessions + batch_islands):
            if out and s[0] - out[-1][1] < self.gap_us:
                p = out[-1]
                out[-1] = (min(p[0], s[0]), max(p[1], s[1]), p[2] + s[2], p[3] + s[3])
            else:
                out.append(tuple(s))
        return out

    def _finalize(self, user_id, sessions, wm_us):
        """Split sessions into (emitted finals, kept), update state and the
        single live timer, and yield the emission frame if any."""
        if wm_us is None:
            finals, kept = [], sessions
        else:
            finals = [s for s in sessions if s[1] + self.gap_us <= wm_us]
            kept = [s for s in sessions if s[1] + self.gap_us > wm_us]
        if kept:
            self.sessions.put(kept)
        else:
            self.sessions.clear()
        # One live timer per key: the earliest remaining close horizon.
        # Ceil to the ms grid — floor would fire up to 999us BEFORE
        # last+gap and close a session a just-inside-the-gap event
        # should extend.
        want = (
            {-(-(min(s[1] for s in kept) + self.gap_us) // 1000)} if kept else set()
        )
        for t in list(self.handle.listTimers()):
            if t not in want:
                self.handle.deleteTimer(t)
            else:
                want.discard(t)
        for t in want:
            self.handle.registerTimer(t)
        if finals:
            yield self._emit(user_id, finals)

    def handleInputRows(self, key, rows, timerValues: TimerValues):
        import numpy as np
        import pandas as pd

        pdf = pd.concat(list(rows), ignore_index=True)
        if pdf.empty:
            return
        pdf = pdf.sort_values(["ts_us", "event_id"], kind="mergesort")
        ts = pdf["ts_us"].to_numpy(dtype="int64")
        cents = np.rint(pdf["value"].to_numpy(dtype="float64") * 100).astype("int64")
        # Vectorized islands split of the batch's own events: boundaries
        # where the consecutive gap >= gap_us; one reduceat per aggregate
        # (no per-event Python loop).
        starts = np.flatnonzero(
            np.concatenate(([True], np.diff(ts) >= self.gap_us))
        )
        islands = [
            (
                int(ts[a]),
                int(ts[b - 1]),
                int(b - a),
                int(cents[a:b].sum()),
            )
            for a, b in zip(starts, np.append(starts[1:], len(ts)))
        ]
        buffered = [tuple(int(x) for x in s) for s in self.sessions.get()]
        merged = self._merge(buffered, islands)
        (user_id,) = key
        yield from self._finalize(int(user_id), merged, self._wm_us(timerValues))

    def handleExpiredTimer(self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo):
        buffered = [tuple(int(x) for x in s) for s in self.sessions.get()]
        if not buffered:
            self.sessions.clear()
            return
        # Fake-handle harness passes timerValues=None meaning watermark ->
        # infinity (flush everything); the real engine supplies the actual
        # watermark and only the passed horizons emit.
        wm_us = None if timerValues is None else self._wm_us(timerValues)
        yield from self._finalize(
            int(key[0]), buffered, float("inf") if wm_us is None else wm_us
        )

    def close(self) -> None:
        pass


_FIRST_SEEN_OUT = "user_id long, event_type string, first_us long"


class FirstSeenProcessor(StatefulProcessor):
    """Per-user FIRST occurrence of each event type — the MapState member
    of the typed-state family (sessions cover ListState; the r4 running
    totals cover ValueState). Emission is watermark-gated and therefore
    exactly-once-correct under late data: an entry (type -> min_ts) emits
    only once the watermark passes min_ts, and any still-admissible event
    of that type necessarily has ts >= watermark >= min_ts, so nothing can
    lower an emitted minimum. State per user is one map entry per DISTINCT
    type (bounded by type cardinality, not history), with emitted entries
    kept as tombstones (min=-1) so re-arrivals neither re-emit nor grow
    state."""

    def __init__(self):
        pass

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.seen = handle.getMapState(
            "seen", "event_type string", "min_us long, emitted smallint"
        )

    @staticmethod
    def _emit(user_id, rows):
        import pandas as pd

        return pd.DataFrame(
            {
                "user_id": pd.Series([user_id] * len(rows), dtype="int64"),
                "event_type": pd.Series([r[0] for r in rows], dtype=object),
                "first_us": pd.Series([r[1] for r in rows], dtype="int64"),
            }
        )

    def _finalize(self, user_id, wm_us):
        """Emit every unemitted entry whose min the watermark has passed;
        re-arm one timer at the earliest remaining horizon."""
        finals, pending = [], []
        for k, v in self.seen.iterator():
            (etype,) = k
            min_us, emitted = int(v[0]), int(v[1])
            if emitted:
                continue
            if wm_us is not None and min_us <= wm_us:
                finals.append((etype, min_us))
            else:
                pending.append(min_us)
        for etype, min_us in finals:
            self.seen.updateValue((etype,), (-1, 1))
        want = {-(-min(pending) // 1000)} if pending else set()
        for t in list(self.handle.listTimers()):
            if t not in want:
                self.handle.deleteTimer(t)
            else:
                want.discard(t)
        for t in want:
            self.handle.registerTimer(t)
        if finals:
            yield self._emit(user_id, finals)

    def handleInputRows(self, key, rows, timerValues: TimerValues):
        import pandas as pd

        pdf = pd.concat(list(rows), ignore_index=True)
        if pdf.empty:
            return
        mins = pdf.groupby("event_type")["ts_us"].min()
        for etype, ts in mins.items():
            k = (str(etype),)
            if self.seen.containsKey(k):
                cur_min, emitted = (int(x) for x in self.seen.getValue(k))
                if not emitted and int(ts) < cur_min:
                    self.seen.updateValue(k, (int(ts), 0))
            else:
                self.seen.updateValue(k, (int(ts), 0))
        (user_id,) = key
        yield from self._finalize(int(user_id), SessionProcessor._wm_us(timerValues))

    def handleExpiredTimer(self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo):
        wm_us = None if timerValues is None else SessionProcessor._wm_us(timerValues)
        yield from self._finalize(
            int(key[0]), float("inf") if wm_us is None else wm_us
        )

    def close(self) -> None:
        pass


def user_type_first_seen_tws(
    events: DataFrame, watermark_delay: str = "0 seconds"
) -> DataFrame:
    """Streaming form: watermarked events through FirstSeenProcessor."""
    proc_in = (
        events.withWatermark("ts", watermark_delay)
        .select("user_id", "ts", F.unix_micros("ts").alias("ts_us"), "event_type")
    )
    out = proc_in.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=FirstSeenProcessor(),
        outputStructType=_FIRST_SEEN_OUT,
        outputMode="Append",
        timeMode="EventTime",
    )
    return out.select(
        "user_id", "event_type", F.timestamp_micros("first_us").alias("first_ts")
    )


def user_type_first_seen_batch(events: DataFrame) -> DataFrame:
    """Batch twin: MIN(ts) per (user_id, event_type)."""
    return events.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("first_ts")
    )


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

    Late events within the watermark merge into buffered sessions (the
    emission is watermark-gated, so nothing a late admissible event could
    extend has been emitted yet); events later than the watermark are
    dropped by the engine — the only stream/batch divergence, at any
    delay."""
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
