"""Order-independent numeric aggregation helpers.

Floating-point sums are not associative, so a distributed SUM(double) differs
in the last ulps between engines (and between runs with different partition
counts). The driver's correctness gate hashes values, so every double
aggregate in the query surface goes through an exact DECIMAL accumulation and
is cast back to double at the end: bit-identical on Spark and DuckDB, and
deterministic at any parallelism — which is exactly what a 1000-executor run
needs for reproducibility.

Money-ish inputs here all carry <= 2 fractional digits at < 1e12 magnitude,
so DECIMAL(18, s) per-row and a wide accumulator never overflow.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dmoney(col: Column | str, scale: int = 2) -> Column:
    """Cast a double column to an exact decimal with the given scale."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Exact, order-independent sum of a double column -> double."""
    return F.sum(dmoney(col, scale)).cast("double")


def davg(col: Column | str, scale: int = 2) -> Column:
    """Order-independent average: exact decimal sum / count, in double.

    A single double division of two deterministic operands is itself
    deterministic (IEEE-754), unlike a native AVG over doubles.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dmoney(c, scale)).cast("double") / F.count(c).cast("double")
