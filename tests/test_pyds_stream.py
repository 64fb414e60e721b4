"""Python DataSource streaming reader + writer (sources/pyds.py):
micro-batch offsets with checkpointed exactly-once restarts, and the
manifest-committed sink's atomicity/idempotence contract."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from gridmr_spark.sources import pyds

_SCHEMA = "row_id long, service int, level string, latency_ms double"


def _stream_to_sink(spark, rows: int, path: str, ckpt: str) -> None:
    src = (
        spark.readStream.format("synthlog")
        .option("rows", rows)
        .option("partitions", 4)
        .load()
    )
    q = (
        src.writeStream.format("synthlog")
        .option("path", path)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_stream_read_matches_batch(spark):
    """availableNow drain of the stream reader == the batch reader on the
    same options (offset planning loses and duplicates nothing)."""
    pyds.register(spark)
    agg_cols = [
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("latency_ms").cast("decimal(18,1)")).cast("double").alias("s"),
    ]
    stream = (
        spark.readStream.format("synthlog").option("rows", 5000).load()
        .groupBy("service").agg(*agg_cols)
    )
    q = (
        stream.writeStream.outputMode("complete").format("memory")
        .queryName("t_pyds_parity").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {r.service: (r.n, r.s) for r in spark.table("t_pyds_parity").collect()}
    want = {
        r.service: (r.n, r.s)
        for r in spark.read.format("synthlog").option("rows", 5000).load()
        .groupBy("service").agg(*agg_cols).collect()
    }
    assert got == want and len(want) == 97


def test_stream_restart_exactly_once(spark, tmp_path):
    """A restarted query resumes from the checkpointed offset: re-running at
    the same high-watermark adds nothing; growing it adds only the delta —
    every row id exactly once across three runs."""
    pyds.register(spark)
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    _stream_to_sink(spark, 6000, sink, ckpt)
    assert pyds.read_committed(spark, sink, _SCHEMA).count() == 6000
    _stream_to_sink(spark, 6000, sink, ckpt)  # restart, no new data
    assert pyds.read_committed(spark, sink, _SCHEMA).count() == 6000
    _stream_to_sink(spark, 10000, sink, ckpt)  # restart, +4000
    df = pyds.read_committed(spark, sink, _SCHEMA)
    assert df.count() == 10000
    ids = df.agg(
        F.count_distinct("row_id").alias("d"),
        F.min("row_id").alias("lo"),
        F.max("row_id").alias("hi"),
    ).collect()[0]
    assert (ids.d, ids.lo, ids.hi) == (10000, 0, 9999)


def test_batch_writer_roundtrip(spark, tmp_path):
    """df.write.format('synthlog') stages JSON-lines files and commits them
    through a manifest; read_committed returns exactly the written rows."""
    pyds.register(spark)
    path = str(tmp_path / "out")
    src = spark.read.format("synthlog").option("rows", 500).option("partitions", 3).load()
    src.write.format("synthlog").mode("append").save(path)
    back = pyds.read_committed(spark, path, _SCHEMA)
    assert back.count() == 500
    assert back.select("row_id").distinct().count() == 500
    # second append batch-commits independently
    src.limit(0).write.format("synthlog").mode("append").save(path)
    assert pyds.read_committed(spark, path, _SCHEMA).count() == 500


def test_uncommitted_files_invisible(spark, tmp_path):
    """The sink's atomicity contract: staged data files without a manifest
    entry are invisible to readers."""
    path = str(tmp_path / "out")
    os.makedirs(os.path.join(path, "data"))
    with open(os.path.join(path, "data", "orphan.json"), "w") as fh:
        fh.write('{"row_id": 1, "service": 1, "level": "info", "latency_ms": 1.0}\n')
    assert pyds.read_committed(spark, path, _SCHEMA).count() == 0


def test_manifest_commit_idempotent(tmp_path):
    """A replayed commit for the same batch id is a no-op — the property
    that turns engine-side at-least-once batch retries into exactly-once
    visibility."""
    path = str(tmp_path / "out")
    os.makedirs(os.path.join(path, "data"))
    for fname in ("a.json", "b.json"):
        with open(os.path.join(path, "data", fname), "w") as fh:
            fh.write("{}\n")
    m1 = pyds._FileCommit("a.json", 1)
    m2 = pyds._FileCommit("b.json", 1)
    assert pyds._write_manifest(path, "streambatch-7", [m1]) is True
    assert pyds._write_manifest(path, "streambatch-7", [m1, m2]) is False  # replay
    assert pyds.committed_files(path) == [os.path.join(path, "data", "a.json")]


def test_overwrite_commit_is_atomic(spark, tmp_path):
    """mode('overwrite') replaces the table atomically: the new manifest
    lands FIRST, naming the manifests it supersedes, so at no instant does
    a reader see an empty or doubled table; cleanup then removes the
    superseded manifests and their data files."""
    pyds.register(spark)
    path = str(tmp_path / "out")
    src = spark.read.format("synthlog").option("rows", 300).option("partitions", 2).load()
    src.write.format("synthlog").mode("append").save(path)
    assert pyds.read_committed(spark, path, _SCHEMA).count() == 300
    src2 = spark.read.format("synthlog").option("rows", 120).option("partitions", 2).load()
    src2.write.format("synthlog").mode("overwrite").save(path)
    assert pyds.read_committed(spark, path, _SCHEMA).count() == 120
    # cleanup actually removed the superseded generation
    cdir = os.path.join(path, "_commits")
    assert len([f for f in os.listdir(cdir) if not f.startswith(".")]) == 1
    data = os.listdir(os.path.join(path, "data"))
    assert len(data) == 2  # only the overwrite's two partitions remain


def test_overwrite_crash_window_reads_old_or_new_never_empty(tmp_path):
    """The crash-window property directly: with old manifests still on disk
    NEXT TO the superseding manifest (writer died before cleanup), readers
    see exactly the new generation — and before the new manifest exists,
    exactly the old one."""
    path = str(tmp_path / "out")
    os.makedirs(os.path.join(path, "data"))
    for fname in ("old.json", "new.json"):
        with open(os.path.join(path, "data", fname), "w") as fh:
            fh.write("{}\n")
    assert pyds._write_manifest(path, "batch-old", [pyds._FileCommit("old.json", 1)])
    # pre-overwrite: old generation visible
    assert pyds.committed_files(path) == [os.path.join(path, "data", "old.json")]
    # overwrite manifest lands, old one NOT yet cleaned up (simulated crash)
    assert pyds._write_manifest(
        path, "batch-new", [pyds._FileCommit("new.json", 1)], supersedes=["batch-old"]
    )
    assert pyds.committed_files(path) == [os.path.join(path, "data", "new.json")]
