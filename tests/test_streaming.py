"""Streaming-mode == batch-mode equivalence, and watermark late-data policy.

The batch variants are oracle-checked against DuckDB in test_oracle_parity;
here the SAME aggregation builders run as a real Structured Streaming query
(file source, availableNow trigger, memory sink) and must produce identical
results — plus a watermark test demonstrating the late-data drop behavior.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gridmr_spark.catalog import load_table
from gridmr_spark.streaming.windows import (
    read_events_stream,
    run_stream_to_memory,
    session_agg,
    sliding_agg,
    tumbling_agg,
)


def _as_sorted_rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.mark.parametrize(
    "builder,name,cols",
    [
        (tumbling_agg, "t_tumble", ["window_start", "event_type", "n_events", "sum_value"]),
        (sliding_agg, "t_slide", ["window_start", "event_type", "n_events"]),
        (session_agg, "t_session", ["session_start", "user_id", "n_events", "sum_value"]),
    ],
)
def test_stream_equals_batch(spark, sf_oracle, builder, name, cols):
    batch = builder(load_table(spark, sf_oracle, "events"))
    stream = builder(read_events_stream(spark, sf_oracle))
    out = run_stream_to_memory(spark, stream, name, output_mode="complete")
    assert _as_sorted_rows(out, cols) == _as_sorted_rows(batch, cols)


def test_watermark_drops_late_events(spark, tmp_path):
    """Append-mode + watermark: an event arriving after the watermark passed
    its window is dropped (the late-data policy). Two micro-batches via two
    parquet files processed in order by availableNow."""
    import time

    d = str(tmp_path / "stream_in")
    schema = "event_id long, ts string, user_id long, event_type string, value double, props string"
    batch1 = spark.createDataFrame(
        [(1, "2024-01-01 00:05:00", 1, "click", 1.0, "{}"),
         (2, "2024-01-01 02:00:00", 1, "click", 1.0, "{}")],  # advances watermark far past hour 0
        schema,
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    batch2 = spark.createDataFrame(
        [(3, "2024-01-01 00:10:00", 1, "click", 1.0, "{}")],  # LATE: hour-0 window, watermark at ~01:50
        schema,
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    batch1.write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(batch1.schema).format("parquet")
        .option("maxFilesPerTrigger", "1").load(d)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    q = (stream.writeStream.outputMode("append").format("memory")
         .queryName("t_late").trigger(availableNow=True).start())
    q.awaitTermination()
    batch2.write.mode("append").parquet(d)
    q2 = (stream.writeStream.outputMode("append").format("memory")
          .queryName("t_late2").trigger(availableNow=True).start())
    q2.awaitTermination()
    # Micro-batch 1 (events 1,2) advances the watermark to 01:50 and emits
    # the hour-0 window with n=1 (event 1). Micro-batch 2's event 3 targets
    # hour 0 but is behind the watermark -> dropped. If the watermark did
    # NOT drop it, hour 0 would show n=2.
    res = {r.ws.isoformat(): r.n for r in spark.sql("SELECT * FROM t_late2").collect()}
    assert res.get("2024-01-01T00:00:00") == 1, f"late event not dropped: {res}"
