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


def test_stream_static_enrich_equals_batch(spark, sf_oracle):
    """Stream-static join (events x broadcast customer dim) + tumbling agg:
    streaming mode must equal batch mode. The static side re-broadcasts per
    micro-batch — stateless, no watermark on the dimension."""
    from gridmr_spark.streaming.windows import static_enrich_agg

    dim = load_table(spark, sf_oracle, "customer").select(
        F.col("c_custkey").alias("cust_id"), F.col("c_mktsegment").alias("segment")
    )
    cols = ["window_start", "segment", "n_events", "sum_value"]
    batch = static_enrich_agg(load_table(spark, sf_oracle, "events"), dim)
    stream = static_enrich_agg(read_events_stream(spark, sf_oracle), dim)
    out = run_stream_to_memory(spark, stream, "t_enrich", output_mode="complete")
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
    # A shared CHECKPOINT pins the processing order across two availableNow
    # runs (without it the file source's batch order is mtime-dependent):
    # run 1 sees only batch1 and persists watermark=01:50; run 2 then sees
    # batch2's late event with that watermark already in effect.
    ckpt = str(tmp_path / "ckpt")
    batch1.write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(batch1.schema).format("parquet").load(d)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    emitted: list = []

    def sink(df, _epoch):
        emitted.extend(df.collect())

    q = (stream.writeStream.outputMode("append").foreachBatch(sink)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    batch2.write.mode("append").parquet(d)
    q2 = (stream.writeStream.outputMode("append").foreachBatch(sink)
          .option("checkpointLocation", ckpt)
          .trigger(availableNow=True).start())
    q2.awaitTermination()
    # Watermark (01:50) finalized the hour-0 window with n=1 (event 1);
    # the late event 3 must have been dropped, not merged (n=2) and not
    # re-emitted as a new hour-0 row.
    hour0 = [r.n for r in emitted if r.ws.isoformat() == "2024-01-01T00:00:00"]
    assert hour0 == [1], f"late event not dropped: {emitted}"


def test_stateful_running_totals(spark, sf_oracle):
    """applyInPandasWithState running per-user totals must match the batch
    groupBy after all input is consumed (update mode: take the last emit
    per user)."""
    from pyspark.sql import functions as F
    from gridmr_spark.streaming.windows import (
        read_events_stream,
        running_user_totals_stateful,
    )

    stream = running_user_totals_stateful(read_events_stream(spark, sf_oracle))
    q = (stream.writeStream.outputMode("update").format("memory")
         .queryName("t_stateful").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM t_stateful").collect()
    }  # single availableNow pass -> one emit per user
    # rint = round-half-to-even, the same rule pandas .round() applies in
    # the stateful operator's cents accumulation (F.round would be HALF_UP).
    batch = load_table(spark, sf_oracle, "events").groupBy("user_id").agg(
        F.count("*").alias("n"),
        (F.sum(F.expr("CAST(rint(value * 100) AS BIGINT)")).cast("double") / 100.0).alias("t"),
    )
    want = {r.user_id: (r.n, r.t) for r in batch.collect()}
    assert got == want


def test_stream_stream_join_matches_batch(spark, sf_oracle):
    """Watermarked stream-stream inner join (clicks x purchases within 30
    minutes per user) must equal the same join computed in batch."""
    from gridmr_spark.streaming.windows import read_events_stream

    def split(ev):
        clicks = ev.where(F.col("event_type") == "click").select(
            F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"),
            F.col("event_id").alias("c_id"),
        )
        purchases = ev.where(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"),
            F.col("event_id").alias("p_id"),
        )
        return clicks, purchases

    def join(clicks, purchases):
        return clicks.join(
            purchases,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES")),
        ).select("c_id", "p_id")

    sc, sp = split(read_events_stream(spark, sf_oracle))
    stream = join(
        sc.withWatermark("c_ts", "1 hour"), sp.withWatermark("p_ts", "1 hour")
    )
    q = (stream.writeStream.outputMode("append").format("memory")
         .queryName("t_ssj").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r.c_id, r.p_id) for r in spark.sql("SELECT * FROM t_ssj").collect()}
    bc, bp = split(load_table(spark, sf_oracle, "events"))
    want = {(r.c_id, r.p_id) for r in join(bc, bp).collect()}
    assert got == want and len(want) > 0


def test_stream_dedup_within_watermark_equals_batch(spark, sf_oracle):
    """dropDuplicatesWithinWatermark (streaming, state bounded by the
    watermark horizon) must produce the same distinct key set as batch
    dropDuplicates when the whole input replays within the horizon."""
    from gridmr_spark.streaming.windows import dedup_within_watermark

    keys = ("user_id", "event_type", "value")
    batch = dedup_within_watermark(load_table(spark, sf_oracle, "events"), keys)
    stream = dedup_within_watermark(
        read_events_stream(spark, sf_oracle), keys, delay="365 days"
    )
    out = run_stream_to_memory(spark, stream, "t_dedup_wm", output_mode="append")
    assert _as_sorted_rows(out, list(keys)) == _as_sorted_rows(batch, list(keys))


def test_foreach_batch_sink_equals_batch(spark, sf_oracle, tmp_path):
    """foreachBatch sink: the tumbling aggregation lands through ordinary
    batch parquet writes (one directory per batch_id, overwritten on
    replay); re-reading the sink must equal batch mode. availableNow gives
    one micro-batch here, but the assertion holds for any batch split
    because complete mode rewrites the whole result each batch."""
    from gridmr_spark.streaming.windows import run_stream_foreach_batch

    sink = str(tmp_path / "fb_sink")
    cols = ["window_start", "event_type", "n_events", "sum_value"]
    batch = tumbling_agg(load_table(spark, sf_oracle, "events"))
    stream = tumbling_agg(read_events_stream(spark, sf_oracle))
    run_stream_foreach_batch(spark, stream, sink, output_mode="complete")
    out = spark.read.parquet(sink + "/batch=*")
    assert _as_sorted_rows(out, cols) == _as_sorted_rows(batch, cols)


def test_checkpoint_restart_exactly_once(spark, tmp_path):
    """File-source streaming with a checkpoint must resume after a restart
    WITHOUT reprocessing: two availableNow runs over a growing directory
    yield each input row exactly once in the sink — the recovery contract
    that makes an unbounded ingest restartable at any point."""
    import pyspark.sql.functions as SF

    src = tmp_path / "src"
    sink = tmp_path / "sink"
    ckpt = tmp_path / "ckpt"

    def run_once():
        stream = (
            spark.readStream.schema("id long, v double")
            .format("parquet").load(str(src))
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", str(sink))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    spark.range(0, 100).select(
        SF.col("id"), (SF.col("id") * 1.5).alias("v")
    ).coalesce(1).write.mode("overwrite").parquet(str(src))
    run_once()
    spark.range(100, 250).select(
        SF.col("id"), (SF.col("id") * 1.5).alias("v")
    ).coalesce(1).write.mode("append").parquet(str(src))
    run_once()

    got = spark.read.parquet(str(sink)).groupBy().agg(
        SF.count("*").alias("n"), SF.count_distinct("id").alias("d")
    ).collect()[0]
    assert (got.n, got.d) == (250, 250)  # no loss, no reprocessing


def test_stream_stream_left_join_matches_batch(spark, sf_oracle):
    """LEFT OUTER watermarked stream-stream join: unmatched clicks emit
    null-padded rows once the watermark passes their join horizon; the
    availableNow final no-data batch flushes the tail, so the stream's
    output must equal the batch left join exactly — including every
    no-purchase click."""
    from gridmr_spark.streaming.windows import read_events_stream

    def split(ev):
        clicks = ev.where(F.col("event_type") == "click").select(
            F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"),
            F.col("event_id").alias("c_id"),
        )
        purchases = ev.where(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"),
            F.col("event_id").alias("p_id"),
        )
        return clicks, purchases

    def join(clicks, purchases, how):
        return clicks.join(
            purchases,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES")),
            how,
        ).select("c_id", "p_id")

    sc, sp = split(read_events_stream(spark, sf_oracle))
    stream = join(
        sc.withWatermark("c_ts", "1 hour"), sp.withWatermark("p_ts", "1 hour"), "left"
    )
    q = (stream.writeStream.outputMode("append").format("memory")
         .queryName("t_ssj_left").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r.c_id, r.p_id) for r in spark.sql("SELECT * FROM t_ssj_left").collect()}
    ev = load_table(spark, sf_oracle, "events")
    bc, bp = split(ev)
    want = {(r.c_id, r.p_id) for r in join(bc, bp, "left").collect()}

    # Watermark semantics bound what CAN emit: null rows for a click need
    # watermark (= max_ts - 1h) past the click's join horizon (c_ts + 30m).
    # Clicks in the last ~90 minutes of the data stay pending forever in
    # availableNow — that unemitted tail IS the correctness contract, not a
    # bug, so assert it precisely instead of demanding the impossible.
    import datetime as dt

    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    c_ts = {r.c_id: r.c_ts for r in bc.collect()}
    finalized = {c for c, t in c_ts.items() if t + dt.timedelta(minutes=91) < max_ts}

    matched = {(c, p) for c, p in want if p is not None}
    assert matched <= got                     # inner results emit eagerly
    assert {(c, None) for c, p in want
            if p is None and c in finalized} <= got   # finalized nulls emit
    assert got <= want                        # nothing spurious
    pending = want - got
    assert all(p is None and c not in finalized for c, p in pending), pending
    # the outer tail is non-trivial: some clicks really had no purchase
    assert any(p is None for _, p in got)


def test_stream_url_frontier_equals_batch(spark, sf_oracle):
    """The streaming crawl frontier (canonicalize + dropDuplicatesWithin-
    Watermark) must emit exactly the batch DISTINCT canonical set when the
    whole input replays within the horizon."""
    from gridmr_spark.streaming.windows import url_frontier_dedup

    batch = url_frontier_dedup(load_table(spark, sf_oracle, "events"))
    stream = url_frontier_dedup(
        read_events_stream(spark, sf_oracle), delay="365 days"
    )
    out = run_stream_to_memory(spark, stream, "t_frontier", output_mode="append")
    assert _as_sorted_rows(out, ["canonical_url"]) == _as_sorted_rows(
        batch, ["canonical_url"]
    )
    assert batch.count() > 0
