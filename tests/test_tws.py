"""transformWithStateInPandas session operator (streaming/tws.py).

The processor's semantics are proven WITHOUT the Spark state server by
driving handleInputRows/handleExpiredTimer through a fake state handle —
multi-batch splits, restarts mid-session, and timer-driven final flushes
must reproduce the batch twin exactly. The live readStream path needs the
protobuf runtime; compat/pbshim makes one importable in this container
(round 6), so the end-to-end tests run here too — the skipif gate remains
for environments with neither an install nor a vendored runtime.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gridmr_spark.streaming.tws import (
    GAP_US,
    SessionProcessor,
    has_protobuf,
    user_sessions_batch,
    user_sessions_tws,
)


class _FakeValueState:
    def __init__(self):
        self.v = None

    def exists(self):
        return self.v is not None

    def get(self):
        return self.v

    def update(self, v):
        self.v = v

    def clear(self):
        self.v = None


class _FakeListState:
    def __init__(self):
        self.v = []

    def exists(self):
        return bool(self.v)

    def get(self):
        return iter(list(self.v))

    def put(self, vs):
        self.v = list(vs)

    def appendValue(self, v):
        self.v.append(v)

    def appendList(self, vs):
        self.v.extend(vs)

    def clear(self):
        self.v = []


class _FakeHandle:
    def __init__(self):
        self.states = {}
        self.timers = set()

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.states.setdefault(name, _FakeValueState())

    def getListState(self, name, schema, ttlDurationMs=None):
        return self.states.setdefault(name, _FakeListState())

    def listTimers(self):
        return iter(sorted(self.timers))

    def registerTimer(self, ts_ms):
        self.timers.add(ts_ms)

    def deleteTimer(self, ts_ms):
        self.timers.discard(ts_ms)


def _drive(events_by_batch, gap_us=GAP_US):
    """Run one key's events through the processor across micro-batches,
    then fire the pending timer (watermark -> infinity) and collect every
    emitted session as (start_us, end_us, n, cents)."""
    proc = SessionProcessor(gap_us)
    handle = _FakeHandle()
    proc.init(handle)
    out = []
    for batch in events_by_batch:
        if not batch:
            continue
        pdf = pd.DataFrame(
            {
                "user_id": [1] * len(batch),
                "event_id": [e[0] for e in batch],
                "ts_us": [e[1] for e in batch],
                "value": [e[2] for e in batch],
            }
        )
        out.extend(proc.handleInputRows((1,), iter([pdf]), None))
    for _t in list(handle.timers):
        out.extend(proc.handleExpiredTimer((1,), None, None))
    rows = pd.concat(out, ignore_index=True) if out else pd.DataFrame()
    return [
        (int(r.start_us), int(r.end_us), int(r.n_events), int(r.cents))
        for r in rows.itertuples()
    ]


MIN_US = 60_000_000  # one minute


def _ev(eid, minute, value):
    return (eid, minute * MIN_US, value)


def test_processor_single_batch_gap_split():
    got = _drive([[_ev(1, 0, 1.25), _ev(2, 5, 2.50), _ev(3, 20, 0.75)]])
    assert got == [
        (0, 5 * MIN_US, 2, 375),          # closed by the 15-min gap
        (20 * MIN_US, 20 * MIN_US, 1, 75),  # flushed by the timer
    ]


def test_processor_multi_batch_continuation_equals_single_batch():
    """A session spanning a micro-batch boundary must merge, not split."""
    events = [_ev(1, 0, 1.0), _ev(2, 5, 1.0), _ev(3, 9, 1.0), _ev(4, 30, 2.0)]
    whole = _drive([events])
    for cut in (1, 2, 3):
        assert _drive([events[:cut], events[cut:]]) == whole
    assert whole == [(0, 9 * MIN_US, 3, 300), (30 * MIN_US, 30 * MIN_US, 1, 200)]


def test_processor_unsorted_within_batch():
    """Events inside one batch arrive unordered; the processor sorts by
    (ts, event_id) before merging."""
    assert _drive([[_ev(2, 5, 1.0), _ev(1, 0, 1.0), _ev(3, 20, 1.0)]]) == _drive(
        [[_ev(1, 0, 1.0), _ev(2, 5, 1.0), _ev(3, 20, 1.0)]]
    )


def test_processor_timer_bookkeeping():
    proc = SessionProcessor(GAP_US)
    handle = _FakeHandle()
    proc.init(handle)
    pdf = pd.DataFrame({"user_id": [1], "event_id": [1], "ts_us": [0], "value": [1.0]})
    list(proc.handleInputRows((1,), iter([pdf]), None))
    assert handle.timers == {GAP_US // 1000}  # one timer at last + gap
    pdf2 = pd.DataFrame({"user_id": [1], "event_id": [2], "ts_us": [MIN_US], "value": [1.0]})
    list(proc.handleInputRows((1,), iter([pdf2]), None))
    assert handle.timers == {(MIN_US + GAP_US) // 1000}  # re-registered, old deleted
    list(proc.handleExpiredTimer((1,), None, None))
    assert not handle.states["sessions"].exists()  # state evicted after flush
    assert not handle.timers  # no sessions left -> no live timer


def test_processor_matches_batch_twin_on_events_table(spark, sf_smoke):
    """Fake-handle processor output over the real events table (split into 3
    ts-ordered micro-batches per user) == the batch twin DataFrame — the
    stream==batch equality, minus only the Spark transport."""
    ev = (
        spark.read.parquet(f"{sf_smoke}/events.parquet")
        .select("user_id", "event_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"), "value")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append((r.event_id, r.ts_us, r.value))
    got = []
    for uid, rows in by_user.items():
        rows.sort(key=lambda e: (e[1], e[0]))
        k = max(1, len(rows) // 3)
        batches = [rows[i : i + k] for i in range(0, len(rows), k)]
        for s in _drive(batches):
            got.append((uid, *s))
    twin = user_sessions_batch(
        spark.read.parquet(f"{sf_smoke}/events.parquet").withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
    ).collect()
    want = [
        (
            r.user_id,
            int(r.session_start.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000),
            int(r.session_end.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000),
            r.n_events,
            round(r.total_value * 100),
        )
        for r in twin
    ]
    assert sorted(got) == sorted(want) and len(want) > 0


@pytest.mark.skipif(not has_protobuf(), reason="transformWithState state server needs google.protobuf")
def test_tws_stream_equals_batch(spark, tmp_path):
    """End-to-end readStream run (requires protobuf): two availableNow runs
    over a growing directory; a far-future sentinel event advances the
    watermark so timers flush every real session."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    schema = "event_id long, user_id long, ts timestamp, value double"
    T0 = dt.datetime(2026, 1, 1)

    def t(m):
        return T0 + dt.timedelta(minutes=m)

    b1 = [(1, 1, t(0), 1.25), (2, 1, t(5), 2.50), (3, 1, t(20), 0.75),
          (4, 2, t(0), 10.00), (5, 2, t(3), 0.05)]
    b2 = [(6, 1, t(25), 1.00), (7, 2, t(30), 3.00), (8, 999, t(24 * 60), 0.01)]
    d, ck, sink = str(tmp_path / "in"), str(tmp_path / "ck"), str(tmp_path / "out")
    spark.createDataFrame(b1, schema).write.mode("overwrite").parquet(d)

    def run():
        src = spark.readStream.schema(schema).parquet(d)
        q = (
            user_sessions_tws(src).writeStream.outputMode("append")
            .foreachBatch(lambda df, bid: df.write.mode("append").parquet(sink))
            .option("checkpointLocation", ck).trigger(availableNow=True).start()
        )
        q.awaitTermination()

    run()
    spark.createDataFrame(b2, schema).write.mode("append").parquet(d)
    run()
    got = spark.read.parquet(sink).where(F.col("user_id") != 999)
    want = user_sessions_batch(
        spark.createDataFrame(b1 + b2, schema)
    ).where(F.col("user_id") != 999)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


@pytest.mark.skipif(not has_protobuf(), reason="transformWithState state server needs google.protobuf")
def test_tws_stream_late_merge_equals_batch(spark, tmp_path):
    """The round-5-advice unsoundness scenario, END TO END: batch 1 reveals
    a 25-min gap split (sessions [0] and [25]); with a 20-min watermark
    delay the late ts=7min event in batch 2 is still admissible
    (wm = 25-20 = 5min <= 7) and belongs to the FIRST session. Eager
    emission had already emitted [0,0] and could not stitch it back;
    watermark-gated emission matches the batch twin exactly."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    schema = "event_id long, user_id long, ts timestamp, value double"
    T0 = dt.datetime(2026, 1, 1)

    def t(m):
        return T0 + dt.timedelta(minutes=m)

    b1 = [(1, 1, t(0), 1.00), (2, 1, t(25), 2.00)]
    b2 = [(3, 1, t(7), 4.00), (4, 999, t(24 * 60), 0.01)]  # late + sentinel
    d, ck, sink = str(tmp_path / "in"), str(tmp_path / "ck"), str(tmp_path / "out")
    spark.createDataFrame(b1, schema).write.mode("overwrite").parquet(d)

    def run():
        src = spark.readStream.schema(schema).parquet(d)
        q = (
            user_sessions_tws(src, watermark_delay="20 minutes")
            .writeStream.outputMode("append")
            .foreachBatch(lambda df, bid: df.write.mode("append").parquet(sink))
            .option("checkpointLocation", ck).trigger(availableNow=True).start()
        )
        q.awaitTermination()

    run()
    spark.createDataFrame(b2, schema).write.mode("append").parquet(d)
    run()
    got = spark.read.parquet(sink).where(F.col("user_id") != 999)
    want = user_sessions_batch(
        spark.createDataFrame(b1 + b2, schema)
    ).where(F.col("user_id") != 999)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # the late event DID merge: first session spans 0..7min with 2 events
    spans = sorted((r.session_start, r.session_end, r.n_events) for r in got.collect())
    assert spans == [(t(0), t(7), 2), (t(25), t(25), 1)]


def test_processor_late_event_does_not_regress_session(spark=None):
    """A late-but-in-watermark event (earlier ts than the open session's
    high-water mark, arriving in a later micro-batch) must extend the
    session BACKWARD, not regress `last`: pre-fix, the next gap test
    measured from the stale low point and emitted an inverted
    (end < high-water) session the batch twin never produces."""
    events_in_order = [_ev(1, 1, 1.0), _ev(2, 5, 1.0), _ev(3, 9, 1.0), _ev(4, 18, 1.0)]
    whole = _drive([events_in_order])
    # min-5 event arrives late, in the second batch, after min-9; min-18 is
    # 9 min from the TRUE high-water mark (merge) but 13 min from the
    # regressed one (bogus split + inverted end pre-fix)
    late = _drive([[_ev(1, 1, 1.0), _ev(3, 9, 1.0)], [_ev(2, 5, 1.0), _ev(4, 18, 1.0)]])
    assert late == whole
    # gaps 4/4/9 min are all under the 10-min gap: one session, upright
    assert whole == [(1 * MIN_US, 18 * MIN_US, 4, 400)]
    for s, e, _, _ in late:
        assert s <= e


def test_processor_late_merge_into_gap_closed_session():
    """The eager-emission unsoundness (round-5 advice): a gap split revealed
    by a later in-batch event must NOT emit the closed session while a late
    admissible event could still merge into it. Batch 1 reveals the 25-min
    gap after ts=0; the late ts=5min event in batch 2 belongs to the FIRST
    session. Deferred (watermark-gated) emission makes the stream equal the
    batch twin regardless of which batch the late event lands in."""
    events = [_ev(1, 0, 1.0), _ev(2, 5, 1.0), _ev(3, 25, 1.0)]
    whole = _drive([events])
    late = _drive([[_ev(1, 0, 1.0), _ev(3, 25, 1.0)], [_ev(2, 5, 1.0)]])
    assert late == whole == [
        (0, 5 * MIN_US, 2, 200),
        (25 * MIN_US, 25 * MIN_US, 1, 100),
    ]


class _FakeTimerValues:
    def __init__(self, wm_ms):
        self._wm_ms = wm_ms

    def getCurrentWatermarkInMs(self):
        return self._wm_ms

    def getCurrentProcessingTimeInMs(self):
        return 0


def test_processor_watermark_gates_emission():
    """With a real watermark, a session emits exactly when the watermark
    passes last + gap — not before (a late event could merge), not never."""
    proc = SessionProcessor(GAP_US)
    handle = _FakeHandle()
    proc.init(handle)

    def feed(batch, wm_ms):
        pdf = pd.DataFrame(
            {
                "user_id": [1] * len(batch),
                "event_id": [e[0] for e in batch],
                "ts_us": [e[1] for e in batch],
                "value": [e[2] for e in batch],
            }
        )
        return list(proc.handleInputRows((1,), iter([pdf]), _FakeTimerValues(wm_ms)))

    # Batch 1: two sessions revealed by the in-batch gap; watermark still 0
    # -> nothing emits, both buffered.
    assert feed([_ev(1, 0, 1.0), _ev(2, 25, 1.0)], 0) == []
    assert len(handle.states["sessions"].v) == 2
    # Batch 2: watermark passes the first session's horizon (0 + gap) but
    # not the second's -> exactly the first session emits.
    out = feed([_ev(3, 60, 1.0)], (25 * MIN_US + GAP_US) // 1000 - 1)
    emitted = pd.concat(out, ignore_index=True)
    assert [(int(r.start_us), int(r.end_us)) for r in emitted.itertuples()] == [(0, 0)]
    assert len(handle.states["sessions"].v) == 2  # [25] still held + [60]
    # Timer expiry at infinite watermark flushes the rest.
    rest = pd.concat(list(proc.handleExpiredTimer((1,), None, None)), ignore_index=True)
    assert sorted(int(r.start_us) for r in rest.itertuples()) == [25 * MIN_US, 60 * MIN_US]
    assert not handle.timers


def test_processor_timer_ceils_to_ms_grid():
    """Timer must register at ceil((last+gap)/1000) ms: floor fires up to
    999us early and would close a session an in-gap event should extend."""
    proc = SessionProcessor(GAP_US)
    handle = _FakeHandle()
    proc.init(handle)
    pdf = pd.DataFrame({"user_id": [1], "event_id": [1], "ts_us": [500], "value": [1.0]})
    list(proc.handleInputRows((1,), iter([pdf]), None))
    assert handle.timers == {(500 + GAP_US + 999) // 1000}


class _FakeMapState:
    def __init__(self):
        self.m = {}

    def exists(self):
        return bool(self.m)

    def containsKey(self, k):
        return k in self.m

    def getValue(self, k):
        return self.m[k]

    def updateValue(self, k, v):
        self.m[k] = v

    def iterator(self):
        return iter(list(self.m.items()))

    def keys(self):
        return iter(list(self.m))

    def values(self):
        return iter(list(self.m.values()))

    def removeKey(self, k):
        self.m.pop(k, None)

    def clear(self):
        self.m = {}


def _first_seen_drive(batches_with_wm):
    """Drive FirstSeenProcessor: batches_with_wm = [(events, wm_ms)] where
    events = [(event_type, ts_us)]; returns emitted (etype, first_us)."""
    from gridmr_spark.streaming.tws import FirstSeenProcessor

    class _H(_FakeHandle):
        def getMapState(self, name, ks, vs, ttlDurationMs=None):
            return self.states.setdefault(name, _FakeMapState())

    proc = FirstSeenProcessor()
    handle = _H()
    proc.init(handle)
    out = []
    for events, wm_ms in batches_with_wm:
        pdf = pd.DataFrame(
            {
                "user_id": [1] * len(events),
                "ts_us": [e[1] for e in events],
                "event_type": [e[0] for e in events],
            }
        )
        out.extend(
            proc.handleInputRows((1,), iter([pdf]), _FakeTimerValues(wm_ms))
        )
    for _t in list(handle.timers):
        out.extend(proc.handleExpiredTimer((1,), None, None))
    rows = pd.concat(out, ignore_index=True) if out else pd.DataFrame()
    return [(r.event_type, int(r.first_us)) for r in rows.itertuples()]


def test_first_seen_watermark_gates_and_late_min_merges():
    """A late admissible event with an EARLIER ts must lower the pending
    minimum; once emitted, re-arrivals neither re-emit nor regress."""
    got = _first_seen_drive(
        [
            ([("click", 5_000_000), ("view", 9_000_000)], 0),      # nothing final
            ([("click", 2_000_000)], 3),                            # late click lowers min; wm 3ms
            ([("click", 7_000_000)], 10_000),                       # wm passes both mins
        ]
    )
    assert sorted(got) == [("click", 2_000_000), ("view", 9_000_000)]


def test_first_seen_exactly_once_across_batches():
    got = _first_seen_drive(
        [
            ([("a", 1_000)], 1_000_000),     # wm far past: emits immediately
            ([("a", 500_000)], 1_000_000),   # later arrival of same type: silence
            ([("b", 2_000)], 1_000_000),
        ]
    )
    assert sorted(got) == [("a", 1_000), ("b", 2_000)]
