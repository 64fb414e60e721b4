"""Data-layout operators: Z-order (Morton) keys for multi-dimensional
clustering.

Why: parquet/lakehouse data skipping works off per-file min/max ranges. A
sort on ONE column gives perfect pruning on that column and none on any
other; interleaving the bits of two (or more) columns into a Morton key and
range-partitioning + sorting on it gives every co-sorted column *partially*
tight file ranges — the standard lakehouse answer (Delta/Iceberg Z-ORDER)
to "we filter on both customer and date". Pure integer bit-math, so the
key is engine-deterministic and oracle-checkable; the layout win itself is
asserted in tests/test_layout.py by measuring per-file min/max spans after
a write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key(x: Column | str, y: Column | str, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints: result bit
    2i is x's bit i, bit 2i+1 is y's bit i. Built as a balanced sum of
    shift/mask terms — all JVM-side integer ops inside whole-stage codegen
    (no UDF), identical arithmetic in any engine."""
    cx = (F.col(x) if isinstance(x, str) else x).cast("long")
    cy = (F.col(y) if isinstance(y, str) else y).cast("long")
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(cx, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(cy, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def morton_key_sql(x: str, y: str, bits: int = 16) -> str:
    """The same interleave as DuckDB SQL (for oracles): | of shift terms."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def zorder_write(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    bits: int = 16,
    n_files: int = 8,
) -> None:
    """Write ``df`` as parquet clustered on the (x, y) Morton curve:
    range-partition on the key (contiguous curve segments per file — hash
    partitioning would scatter the curve and void the clustering), sort
    within partitions, drop the key. Files then have partially tight
    min/max on BOTH x and y, which is what scan-time data skipping reads."""
    keyed = df.withColumn("_z", morton_key(x, y, bits))
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def zonemap_write(
    df: DataFrame,
    path: str,
    col: str,
    n_files: int = 16,
) -> None:
    """Write ``df`` as parquet range-clustered on ``col`` plus a file-level
    zone map (per-file min/max of ``col``) at ``path + "/zonestats"`` — the
    Delta/Iceberg file-statistics pattern reduced to its core. Range
    partitioning makes the zones DISJOINT, so a point/range predicate
    overlaps O(1) of the files instead of all of them; the stats table is
    one row per file (at 100 TB: millions of rows — still a trivially
    broadcastable/queryable parquet, exactly a transaction-log checkpoint)."""
    from pyspark.sql import functions as F

    (
        df.repartitionByRange(n_files, col)
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .parquet(path + "/data")
    )
    spark = df.sparkSession
    stats = (
        spark.read.parquet(path + "/data")
        .groupBy(F.input_file_name().alias("file"))
        .agg(F.min(col).alias("zmin"), F.max(col).alias("zmax"))
    )
    stats.coalesce(1).write.mode("overwrite").parquet(path + "/zonestats")


def zonemap_pruned_read(
    spark,
    path: str,
    col: str,
    lo,
    hi,
) -> tuple[DataFrame, int, int]:
    """Read back only the files whose [zmin, zmax] zone overlaps [lo, hi],
    then apply the exact predicate. Returns (df, n_files_read,
    n_files_total). The file-list selection reads the TINY stats parquet —
    never the data — so a selective predicate touches a constant number of
    files regardless of table size; the collect is bounded by the file
    count (the same driver-side footprint as Spark's own file-index
    listing, and at real scale the prune itself runs as a distributed
    filter over the stats table feeding a file-source relation)."""
    from pyspark.sql import functions as F

    stats = spark.read.parquet(path + "/zonestats")
    n_total = stats.count()
    if n_total == 0:
        # A zone map over ZERO files has no footer to probe for the data
        # schema — that's a broken/empty layout, not a selective predicate.
        raise ValueError(
            f"zone map at {path}/zonestats lists no files; "
            "build it with zonemap_write() before reading"
        )
    hit = [
        r["file"]
        for r in stats.where((F.col("zmin") <= hi) & (F.col("zmax") >= lo)).collect()
    ]
    if not hit:
        # Fully-selective predicate: no zone overlaps. Return an empty frame
        # with the DATA schema (probe one file's footer — metadata only, no
        # row groups are read) instead of crashing on a zero-path read.
        any_file = stats.select("file").first()["file"]
        schema = spark.read.parquet(any_file).schema
        return spark.createDataFrame([], schema), 0, n_total
    df = spark.read.parquet(*hit).where((F.col(col) >= lo) & (F.col(col) <= hi))
    return df, len(hit), n_total
