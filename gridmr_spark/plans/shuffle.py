"""Measured shuffle volume per query — the runtime complement of the
static plan audit (``plans.audit``).

The static audit proves the plan SHAPE (broadcast vs shuffle join, no
CartesianProduct, filters pushed); this module measures what actually
crossed the wire: shuffle write/read bytes and records, summed over the
stages a query executed. That number is the one that decides 100 TB
behavior — a "narrow shuffle" claim (e.g. dedup keys on a 128-bit digest,
wordcount partial-aggregates before exchanging) is only real if the
recorded bytes say so, and tests/test_shuffle.py turns the central claims
into assertions.

Implementation: Spark's AppStatusStore (the store behind the UI) exposes
per-stage ``shuffleWriteBytes``/``shuffleReadBytes``/``...Records``.
Scala default arguments are not JVM overloads, so ``stageList`` must be
called with its full five-argument signature via py4j. Stages are diffed
by stage id around the measured action, so concurrent history in the
same session does not pollute the measurement (single-threaded caller
assumed — fine for tools and tests).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class ShuffleStats:
    write_bytes: int
    read_bytes: int
    write_records: int
    read_records: int
    n_stages: int

    def __str__(self) -> str:  # human-readable one-liner for tools
        return (
            f"stages={self.n_stages} write={self.write_bytes:,}B/"
            f"{self.write_records:,}r read={self.read_bytes:,}B/"
            f"{self.read_records:,}r"
        )


def _stage_list(spark):
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    jvm = sc._jvm
    return store.stageList(
        jvm.java.util.ArrayList(),            # statuses: all
        False,                                # details
        False,                                # withSummaries
        sc._gateway.new_array(jvm.double, 0), # unsortedQuantiles
        jvm.java.util.ArrayList(),            # taskStatus: all
    )


def _snapshot(spark) -> dict[int, tuple[int, int, int, int]]:
    stages = _stage_list(spark)
    out = {}
    for i in range(stages.size()):
        s = stages.apply(i)
        out[s.stageId()] = (
            s.shuffleWriteBytes(),
            s.shuffleReadBytes(),
            s.shuffleWriteRecords(),
            s.shuffleReadRecords(),
        )
    return out


def measure_shuffle(spark, df) -> ShuffleStats:
    """Execute ``df`` through the noop sink and return the shuffle volume
    of exactly the stages that ran for it."""
    before = set(_snapshot(spark))
    df.write.format("noop").mode("overwrite").save()
    after = _snapshot(spark)
    new = [v for k, v in after.items() if k not in before]
    return ShuffleStats(
        write_bytes=sum(v[0] for v in new),
        read_bytes=sum(v[1] for v in new),
        write_records=sum(v[2] for v in new),
        read_records=sum(v[3] for v in new),
        n_stages=len(new),
    )
