"""Scalable global ordering primitives — no single-partition WindowExec.

``Window.orderBy(...)`` with no ``partitionBy`` moves the WHOLE input to one
task ("WindowExec: No Partition Defined" — the classic 100 TB scale-killer,
guide §2). The two shapes query code actually needs are both expressible
without it:

- global top-k WITH a rank column (``ranked_topk``): per-partition top-k +
  merge (TakeOrderedAndProject) bounds the data BEFORE any ranking, so the
  row_number window runs over <= k rows — a constant, not the table;
- a rank/ntile/percentile for EVERY row (``global_row_number``): the
  classic two-level scheme — range-repartition by the sort key, number
  rows within each partition, then add per-partition offsets. The only
  thing ever collected is one count per partition (bounded by the cluster's
  parallelism, never by data volume).

Both require the caller's order to be TOTAL (a unique tiebreak column):
every registered query already orders with one — that is what makes the
results hash-deterministic against the oracle in the first place, and it is
also exactly what makes the two-level rank invariant to where the range
partitioner happens to cut the sorted sequence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# monotonically_increasing_id() = (partition id << 33) | record index —
# documented layout; gives a zero-shuffle per-partition row index.
_MID_BITS = 33
_MID_MASK = (1 << _MID_BITS) - 1


def ranked_topk(
    df: DataFrame, order_cols: list[Column], k: int, out: str = "rk"
) -> DataFrame:
    """The global top-``k`` rows of ``df`` under ``order_cols`` with their
    1-based rank in ``out``.

    Replaces ``row_number().over(Window.orderBy(...)) ... WHERE rk <= k``:
    ``orderBy().limit(k)`` plans as TakeOrderedAndProject (each partition
    keeps its local top-k, one merge of k-row heaps — nothing global is
    sorted), and the rank over the surviving <= k rows needs no WindowExec
    at all: one partition (coalesce of a bounded frame is free), sorted,
    with the per-partition record index as the rank. (A constant-key
    window looked equivalent but the optimizer folds a literal partition
    spec away, resurrecting the unpartitioned-WindowExec warning this
    helper exists to kill.)"""
    top = (
        df.orderBy(*order_cols)
        .limit(k)
        .coalesce(1)
        .sortWithinPartitions(*order_cols)
    )
    return top.withColumn(
        out, (F.monotonically_increasing_id() + 1).cast("int")
    )


def global_row_number(
    df: DataFrame,
    order_cols: list[Column],
    out: str = "rn",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Exact global 1-based row_number under a TOTAL order, two-level.

    Range-repartition by the sort key (partition i's keys all precede
    partition j's for i < j), sort within partitions, take the local record
    index from monotonically_increasing_id (nondeterministic expression —
    the optimizer may not reorder it below the sort), then add the
    cumulative count of earlier partitions. The per-partition counts are
    one collect of <= num_partitions rows — driver work bounded by cluster
    parallelism, not by data. Returns ``(frame, n_total)``; n_total rides
    along free for percent_rank / cume_dist / ntile arithmetic.

    The frame is localCheckpoint'ed (it feeds both the count job and the
    caller's plan — and the checkpoint also pins the nondeterministic ids
    so both consumers see the same numbering)."""
    spark = df.sparkSession
    n_parts = num_partitions or spark.sparkContext.defaultParallelism or 1
    ranged = (
        df.repartitionByRange(n_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_mid", F.monotonically_increasing_id())
        .localCheckpoint(eager=True)
    )
    counts = {
        int(r["_pid"]): int(r["n"])
        for r in ranged.groupBy(F.shiftright("_mid", _MID_BITS).alias("_pid"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    if not counts:  # empty input: any constant offset typechecks
        off = F.lit(0).cast("long")
    else:
        off = F.element_at(
            F.create_map(
                *[
                    c
                    for pid, o in sorted(offsets.items())
                    for c in (F.lit(pid).cast("long"), F.lit(o).cast("long"))
                ]
            ),
            F.shiftright("_mid", _MID_BITS),
        )
    numbered = ranged.withColumn(
        out, (off + F.col("_mid").bitwiseAND(F.lit(_MID_MASK)) + F.lit(1)).cast("long")
    ).drop("_mid")
    return numbered, acc


def ntile_from_rn(rn: Column, n_total: int, buckets: int) -> Column:
    """NTILE(buckets) from a global row number and the total count — the
    SQL-standard split (first ``n mod b`` buckets get one extra row),
    identical to WindowExec's ntile given the same total order. CASE
    branches are lazily evaluated, so the q == 0 (n < buckets) shape never
    divides by zero."""
    q, r = divmod(int(n_total), int(buckets))
    head = r * (q + 1)
    if q == 0:
        return rn.cast("int")
    return (
        F.when(rn <= head, F.floor((rn - 1) / (q + 1)) + 1)
        .otherwise(F.lit(r) + F.floor((rn - head - 1) / q) + 1)
        .cast("int")
    )
