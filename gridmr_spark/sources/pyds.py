"""Custom connector via the Python DataSource API (Spark 4,
`pyspark.sql.datasource`) — the extension point for sources Spark has no
built-in reader for (internal REST services, bespoke binary formats,
feature stores). The reference's only ingestion path is files staged onto a
shared EFS mount (`tools/gridmr_submit.py` scp + `ControlServiceImpl`
chunking); a pluggable reader API is the Spark-native superset of that.

The demo source below is a deterministic synthetic-log generator:
- `partitions()` returns P independent row-range splits, so the scan is
  parallel and arbitrarily scalable (each executor materializes only its
  slice — nothing is staged centrally, unlike the reference's EFS copy).
- `read(partition)` yields plain tuples; all derived columns are modular
  arithmetic on the row id, so a SQL oracle (DuckDB generate_series) can
  re-derive every value exactly — the connector plumbing is what's under
  test, not randomness.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _RangeSplit(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SynthLogReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        if self.n_rows < 0:
            raise ValueError(f"synthlog: rows must be >= 0, got {self.n_rows}")
        # Clamp, don't raise: partitions is a parallelism hint, and 0 would
        # otherwise ZeroDivisionError in the ceil below.
        self.n_parts = max(1, int(options.get("partitions", 8)))

    def partitions(self):
        per = max(1, -(-self.n_rows // self.n_parts))  # ceil
        return [
            _RangeSplit(lo, min(lo + per, self.n_rows))
            for lo in range(0, self.n_rows, per)
        ]

    def read(self, partition):
        levels = ("debug", "info", "warn", "error")
        for i in range(partition.start, partition.end):
            yield (
                i,
                i % 97,                      # service id
                levels[(i * 7) % 4],         # level
                float((i * i) % 1000) / 10.0,  # latency_ms, exact in double
            )


class SynthLogDataSource(DataSource):
    """spark.read.format("synthlog").option("rows", N) — register with
    spark.dataSource.register(SynthLogDataSource)."""

    @classmethod
    def name(cls):
        return "synthlog"

    def schema(self):
        return "row_id bigint, service int, level string, latency_ms double"

    def reader(self, schema):
        return SynthLogReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the synthlog format on a session."""
    spark.dataSource.register(SynthLogDataSource)
