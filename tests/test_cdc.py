"""Content-defined chunking properties (operators/text.py: cdc_chunks):
the shift-robustness claim fixed windows can't make, chunk reassembly,
and determinism. Oracle correctness of the registered query is covered by
the registry-wide gates."""

from __future__ import annotations

import pyspark.sql.functions as F

from gridmr_spark.operators.text import cdc_chunks


def _chunk_multiset(df, doc_id):
    rows = df.where(F.col("doc_id") == doc_id).collect()
    return sorted((r["chunk_md5"], r["n_chars"]) for r in rows)


def test_chunks_reassemble_and_are_deterministic(spark):
    # aperiodic text: periodic input can legitimately never hit a boundary
    # (44 distinct windows, none == 0 mod 64), another reason production
    # CDC adds a max-size forced cut
    text = " ".join(f"tok{i * 7919 % 1000} word{i}" for i in range(220))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = cdc_chunks(docs)
    total = out.agg(F.sum("n_chars")).collect()[0][0]
    assert total == len(text)
    assert _chunk_multiset(out, 1) == _chunk_multiset(cdc_chunks(docs), 1)
    # mask 64 actually cuts: more than one chunk on ~1.8k chars
    assert out.count() > 1


def test_insertion_resynchronizes_boundaries(spark):
    """Insert one character near the front; all boundaries after the
    rolling window slides past the edit are unchanged, so the two chunk
    multisets share every chunk except the O(1) around the edit."""
    base = "key agg row scan slow fast table value part hash merge batch " * 30
    edited = base[:10] + "X" + base[10:]
    docs = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id long, text string"
    )
    out = cdc_chunks(docs)
    a = dict()
    for md5, n in _chunk_multiset(out, 1):
        a[(md5, n)] = a.get((md5, n), 0) + 1
    b = dict()
    for md5, n in _chunk_multiset(out, 2):
        b[(md5, n)] = b.get((md5, n), 0) + 1
    n_a = sum(a.values())
    shared = sum(min(a.get(k, 0), b.get(k, 0)) for k in a)
    # fixed windows would share ~0 chunks after the shift; CDC shares all
    # but the edited neighborhood
    assert shared >= n_a - 3, (n_a, shared)
    assert n_a > 10


def test_dup_count_counts_identical_chunks_across_docs(spark):
    text = " ".join(f"w{i * 31 % 97}x{i}" for i in range(200))
    docs = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"
    )
    out = cdc_chunks(docs)
    # every chunk of doc 1 recurs identically in doc 2
    assert out.count() > 4
    assert out.where(F.col("dup_count") < 2).count() == 0


def test_empty_document_yields_no_chunks(spark):
    """Spark split('','') returns [''] — the operator must not fabricate a
    phantom 1-char chunk for a 0-char document (the oracle yields none)."""
    docs = spark.createDataFrame(
        [(1, ""), (2, "some nonempty text " + "x" * 200)],
        "doc_id long, text string",
    )
    out = cdc_chunks(docs)
    assert out.where(F.col("doc_id") == 1).count() == 0
    assert out.where(F.col("doc_id") == 2).count() >= 1


def test_cdc_stream_crosses_additive_schema_evolution(spark, tmp_path):
    """A long-running changelog consumer survives an ALTER TABLE ADD
    COLUMN-shaped commit (round 13): the stream schema is the footer
    UNION of the current snapshot, pre-evolution files null-fill the
    added column, and the signed fold still reproduces the snapshot."""
    import os

    from pyspark.sql import functions as F

    from gridmr_spark.sources.table_format import (
        ManifestTable,
        register_changelog_source,
    )

    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit(
        spark.range(20).selectExpr("id as k", "concat('v', id) as v").coalesce(1)
    )                                                                   # v1
    t.commit(
        spark.createDataFrame(
            [(100, "a", 1.5), (101, "b", 2.5)], "k long, v string, w double"
        )
    )                                                                   # v2 +col
    t.delete_where(spark, F.col("k") == 5)                              # v3 cow
    register_changelog_source(spark)
    run = str(tmp_path / "run")
    sink = os.path.join(run, "out")
    q = (
        spark.readStream.format("mtable_changelog")
        .option("path", t.root)
        .option("on_rewrite", "cdc")
        .load()
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, bid: df.write.mode("append").parquet(sink))
        .option("checkpointLocation", os.path.join(run, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    feed = spark.read.parquet(sink)
    assert set(feed.columns) == {"k", "v", "w", "_op"}
    folded = (
        feed.withColumn("s", F.when(F.col("_op") == "I", 1).otherwise(-1))
        .groupBy("k", "v", "w")
        .agg(F.sum("s").alias("n"))
        .where(F.col("n") != 0)
    )
    got = sorted((r.k, r.v, r.w, r.n) for r in folded.collect())
    want = sorted(
        (r.k, r.v, r.w, 1)
        for r in t.read(spark, merge_schema=True).collect()
    )
    assert got == want


def test_catalog_cdc_stream_aligned_exactly_once(spark, tmp_path):
    """mcatalog_changelog: offsets are CATALOG versions, each table's leg
    is its pin-to-pin file delta (an unmoved pin contributes nothing),
    folds reproduce the published cross-table state, and a restarted
    stream on the same checkpoint emits only new catalog versions."""
    import os

    from pyspark.sql import functions as F

    from gridmr_spark.sources.catalog_txn import TableCatalog
    from gridmr_spark.sources.table_format import (
        ManifestTable,
        register_changelog_source,
    )

    root = str(tmp_path / "cat")
    t_o = ManifestTable(os.path.join(root, "o"))
    t_l = ManifestTable(os.path.join(root, "l"))
    t_o.commit(spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, p double"))
    t_l.commit(spark.createDataFrame([(1, 5), (2, 6)], "k long, q long"))
    cat = TableCatalog(root)
    cat.create({"o": t_o, "l": t_l})                         # cv1
    txn = cat.begin()
    txn.commit_table("o", spark.createDataFrame([(3, 30.0)], "k long, p double"))
    txn.commit_table("l", spark.createDataFrame([(3, 7)], "k long, q long"))
    txn.commit()                                             # cv2
    txn = cat.begin()
    txn.delete_where("o", spark, F.col("k") == 1)            # o only
    txn.commit()                                             # cv3

    register_changelog_source(spark)

    def run(table, run_dir):
        sink = os.path.join(run_dir, "out")
        q = (
            spark.readStream.format("mcatalog_changelog")
            .option("path", root)
            .option("table", table)
            .load()
            .writeStream.outputMode("append")
            .foreachBatch(lambda df, bid: df.write.mode("append").parquet(sink))
            .option("checkpointLocation", os.path.join(run_dir, "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(sink)

    fo = run("o", str(tmp_path / "ro"))
    fl = run("l", str(tmp_path / "rl"))
    # lineitem's cv3 leg (unmoved pin) contributed nothing: pure inserts
    assert sorted((r["_op"], r.k) for r in fl.collect()) == [
        ("I", 1), ("I", 2), ("I", 3)
    ]
    # orders: cv3's partial COW delete shows as the rewrite's D/I footprint
    def fold(f, cols):
        return sorted(
            tuple(r)
            for r in f.withColumn(
                "s", F.when(F.col("_op") == "I", 1).otherwise(-1)
            )
            .groupBy(*cols)
            .agg(F.sum("s").alias("n"))
            .where("n != 0")
            .select(*cols)
            .collect()
        )

    assert fold(fo, ["k", "p"]) == [(2, 20.0), (3, 30.0)]
    assert fold(fl, ["k", "q"]) == [(1, 5), (2, 6), (3, 7)]
    # exactly-once restart: a new catalog flip emits ONLY its delta
    txn = cat.begin()
    txn.commit_table("o", spark.createDataFrame([(9, 90.0)], "k long, p double"))
    txn.commit()                                             # cv4
    before = fo.count()
    fo2 = run("o", str(tmp_path / "ro"))                     # SAME checkpoint
    assert fo2.count() == before + 1
    assert [r.k for r in fo2.where("k = 9").collect()] == [9]


def test_catalog_cdc_fresh_stream_after_expire(spark, tmp_path):
    """After TableCatalog.expire dropped v1..vK, a FRESH mcatalog stream
    must still start: initialOffset is the oldest RETAINED catalog
    version minus one, so the first batch is the retained savepoint's
    full pinned state as 'I' rows, then ordinary pin-to-pin legs
    (round-14 ADVICE — the old hardcoded v0 bricked every new stream).
    A checkpoint that predates the retained range still fails loudly."""
    import os

    from pyspark.sql import functions as F

    from gridmr_spark.sources.catalog_txn import TableCatalog
    from gridmr_spark.sources.table_format import (
        ManifestTable,
        register_changelog_source,
    )

    root = str(tmp_path / "cat")
    t_o = ManifestTable(os.path.join(root, "o"))
    t_o.commit(spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, p double"))
    cat = TableCatalog(root)
    cat.create({"o": t_o})                                    # cv1
    txn = cat.begin()
    txn.commit_table("o", spark.createDataFrame([(3, 30.0)], "k long, p double"))
    txn.commit()                                              # cv2
    txn = cat.begin()
    txn.delete_where("o", spark, F.col("k") == 1)
    txn.commit()                                              # cv3
    assert cat.expire(keep_last=2) == [1]                     # retained: cv2, cv3

    register_changelog_source(spark)

    def run(run_dir):
        sink = os.path.join(run_dir, "out")
        q = (
            spark.readStream.format("mcatalog_changelog")
            .option("path", root)
            .option("table", "o")
            .load()
            .writeStream.outputMode("append")
            .foreachBatch(lambda df, bid: df.write.mode("append").parquet(sink))
            .option("checkpointLocation", os.path.join(run_dir, "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(sink)

    feed = run(str(tmp_path / "r1"))
    # first leg = cv2's full pinned state as 'I'; cv3's leg = the COW delete
    folded = sorted(
        (r.k, r.p)
        for r in feed.withColumn("s", F.when(F.col("_op") == "I", 1).otherwise(-1))
        .groupBy("k", "p").agg(F.sum("s").alias("n")).where("n != 0")
        .select("k", "p").collect()
    )
    assert folded == [(2.0, 20.0), (3.0, 30.0)] or folded == [(2, 20.0), (3, 30.0)]
    # startingVersion override: stream only FUTURE flips
    txn = cat.begin()
    txn.commit_table("o", spark.createDataFrame([(9, 90.0)], "k long, p double"))
    txn.commit()                                              # cv4
    sink2 = str(tmp_path / "r2" / "out")
    q = (
        spark.readStream.format("mcatalog_changelog")
        .option("path", root)
        .option("table", "o")
        .option("startingVersion", "3")
        .load()
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, bid: df.write.mode("append").parquet(sink2))
        .option("checkpointLocation", str(tmp_path / "r2" / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted((r["_op"], r.k) for r in spark.read.parquet(sink2).collect())
    assert got == [("I", 9)]
    # a checkpoint strictly inside the expired range fails with the
    # re-seed error, not a silent snapshot re-emit
    import pytest as _pytest

    from gridmr_spark.sources.table_format import _changelog_classes

    _, CatSrc = _changelog_classes()
    rdr = CatSrc(
        {"path": root, "table": "o"}
    ).streamReader(spark.read.parquet(sink2).schema)
    cat.expire(keep_last=2)                                   # retained: cv3, cv4
    with _pytest.raises(ValueError, match="predates the retained range"):
        rdr.partitions({"version": 0}, {"version": 4})
