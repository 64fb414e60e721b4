"""Model-based randomized check of the CATALOG verb algebra: random
sequences of cross-table transactions, single-table transactions, WAP
publish/abort, and table-level DV deletes run against a real TableCatalog
AND an in-memory {table: {k: v}} model; after every step every table's
catalog read must equal the model, every HISTORICAL catalog version must
still read as the model snapshot taken when it was current (cross-table
snapshot isolation), and at the end each table's catalog-offset CDC
stream folds to the model state. The randomized complement of
tests/test_catalog_txn.py's example-based coverage."""

from __future__ import annotations

import pytest

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from gridmr_spark.sources.catalog_txn import TableCatalog
from gridmr_spark.sources.table_format import (
    ManifestTable,
    register_changelog_source,
)

KEYS = st.integers(min_value=0, max_value=19)

_op = st.one_of(
    st.tuples(st.just("txn_both"), st.lists(KEYS, min_size=1, max_size=4, unique=True)),
    st.tuples(st.just("txn_one"), st.lists(KEYS, min_size=1, max_size=4, unique=True)),
    st.tuples(st.just("txn_delete"), st.tuples(KEYS, KEYS)),
    st.tuples(st.just("wap_publish"), st.lists(KEYS, min_size=1, max_size=3, unique=True)),
    st.tuples(st.just("wap_abort"), st.lists(KEYS, min_size=1, max_size=3, unique=True)),
    st.tuples(st.just("drop_then_recreate"), st.lists(KEYS, min_size=1, max_size=3, unique=True)),
)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_op, min_size=2, max_size=5))
@pytest.mark.slow
def test_random_catalog_sequences_match_model(spark, tmp_path_factory, ops):
    tmp = tmp_path_factory.mktemp("catmodel")
    root = str(tmp / "cat")

    def df_of(pairs):
        return spark.createDataFrame(
            [(int(k), v) for k, v in pairs], "k long, v string"
        )

    seed_a = [(k, f"a{k}") for k in range(0, 8)]
    seed_b = [(k, f"b{k}") for k in range(0, 8)]
    t_a = ManifestTable(os.path.join(root, "a"))
    t_b = ManifestTable(os.path.join(root, "b"))
    t_a.commit(df_of(seed_a))
    t_b.commit(df_of(seed_b))
    cat = TableCatalog(root)
    cat.create({"a": t_a, "b": t_b})
    model = {"a": dict(seed_a), "b": dict(seed_b)}
    history = {cat.current_version(): {n: dict(m) for n, m in model.items()}}
    stamp = 0

    def read_set(name, at=None):
        """Catalog read as a set; a missing pin or fully-deleted pinned
        snapshot reads as empty (the model's spelling of both)."""
        pins = cat.pins(at)
        if name not in pins:
            return set()
        t2, v2 = cat.table(name, at)
        if not t2._manifest(v2)["files"]:
            return set()
        return {(r.k, r.v) for r in t2.read(spark, v2).collect()}

    for op, arg in ops:
        stamp += 1
        if op == "txn_both":
            pairs = [(k + 100 * stamp, f"t{stamp}.{k}") for k in arg]
            txn = cat.begin()
            txn.commit_table("a", df_of(pairs))
            txn.commit_table("b", df_of(pairs))
            txn.commit()
            model["a"].update(pairs)
            model["b"].update(pairs)
        elif op == "txn_one":
            pairs = [(k + 100 * stamp, f"o{stamp}.{k}") for k in arg]
            txn = cat.begin()
            txn.commit_table("a", df_of(pairs))
            txn.commit()
            model["a"].update(pairs)
        elif op == "txn_delete":
            if not model["b"]:
                continue  # deleting from an emptied table raises by contract
            lo, hi = sorted(arg)
            txn = cat.begin()
            txn.delete_where("b", spark, (F.col("k") % 20 >= lo) & (F.col("k") % 20 <= hi))
            txn.commit()
            model["b"] = {
                k: v for k, v in model["b"].items() if not lo <= k % 20 <= hi
            }
        elif op in ("wap_publish", "wap_abort"):
            pairs = [(k + 100 * stamp, f"w{stamp}.{k}") for k in arg]
            wap = cat.begin_wap(f"wap{stamp}")
            wap.stage("a", df_of(pairs))
            wap.stage("b", df_of(pairs))
            # audit sees the staged state; catalog readers do not
            assert {(r.k, r.v) for r in wap.read(spark, "a").collect()} == set(
                model["a"].items()
            ) | set(pairs)
            assert {(r.k, r.v) for r in cat.read(spark, "a").collect()} == set(
                model["a"].items()
            )
            if op == "wap_publish":
                wap.publish()
                model["a"].update(pairs)
                model["b"].update(pairs)
            else:
                wap.abort()
        elif op == "drop_then_recreate":
            # DROP b (metadata-only, atomic), then CREATE it back from a
            # fresh table root in a second transaction — the CDC fold at
            # the end must net the D leg against the re-created I leg
            txn = cat.begin()
            txn.drop_table("b")
            txn.commit()
            history[cat.current_version()] = {
                "a": dict(model["a"]), "b": {}
            }
            pairs = [(k + 100 * stamp, f"r{stamp}.{k}") for k in arg]
            t_new = ManifestTable(os.path.join(root, f"b{stamp}"))
            t_new.commit(df_of(pairs))
            txn = cat.begin()
            txn.create_table("b", t_new)
            txn.commit()
            model["b"] = dict(pairs)
        history[cat.current_version()] = {n: dict(m) for n, m in model.items()}

        for name in ("a", "b"):
            assert read_set(name) == set(model[name].items()), f"after {op} ({name})"

    # cross-table snapshot isolation: every historical catalog version
    # still reads as the savepoint it was
    for cv, snap in history.items():
        for name in ("a", "b"):
            assert read_set(name, at=cv) == set(snap[name].items()), f"v{cv} ({name})"

    # each table's catalog-offset CDC stream folds to the model state
    register_changelog_source(spark)
    for name in ("a", "b"):
        run = str(tmp / f"run_{name}_{stamp}")
        sink = os.path.join(run, "out")
        q = (
            spark.readStream.format("mcatalog_changelog")
            .option("path", root)
            .option("table", name)
            .load()
            .writeStream.outputMode("append")
            .foreachBatch(lambda df, bid, s=sink: df.write.mode("append").parquet(s))
            .option("checkpointLocation", os.path.join(run, "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        feed = spark.read.parquet(sink)
        folded = (
            feed.withColumn("s", F.when(F.col("_op") == "I", 1).otherwise(-1))
            .groupBy("k", "v")
            .agg(F.sum("s").alias("n"))
            .where("n != 0")
        )
        got = {(r.k, r.v) for r in folded.collect()}
        assert got == set(model[name].items()), f"cdc fold ({name})"
