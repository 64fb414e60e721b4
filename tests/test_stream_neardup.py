"""Streaming MinHash near-dup (streaming/neardup.py): processor semantics
through a fake state handle, stateless-signature parity with the batch
aggregate form, and live stream==batch candidate equality."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gridmr_spark.streaming.neardup import (
    BandPairProcessor,
    minhash_bands_stateless,
    minhash_candidates_batch,
    stream_minhash_candidates,
)
from gridmr_spark.streaming.tws import has_protobuf

from test_tws import _FakeHandle


def _drive(batches, cap=None):
    proc = BandPairProcessor(cap)
    handle = _FakeHandle()
    proc.init(handle)
    out = []
    for ids in batches:
        pdf = pd.DataFrame({"id": pd.Series(ids, dtype="int64")})
        out.extend(proc.handleInputRows((0, 0), iter([pdf]), None))
    if not out:
        return set()
    rows = pd.concat(out, ignore_index=True)
    return {(int(r.id1), int(r.id2)) for r in rows.itertuples()}


def test_pairs_equal_bucket_self_join_across_batch_splits():
    want = {(1, 2), (1, 3), (2, 3), (1, 4), (2, 4), (3, 4)}
    assert _drive([[1, 2, 3, 4]]) == want
    assert _drive([[1], [2], [3], [4]]) == want
    assert _drive([[1, 2], [3, 4]]) == want


def test_pair_set_is_arrival_order_independent():
    want = {(1, 2), (1, 3), (2, 3)}
    assert _drive([[3], [1], [2]]) == want
    assert _drive([[2, 3], [1]]) == want


def test_redelivery_emits_nothing_new():
    assert _drive([[1, 2], [1, 2], [2]]) == {(1, 2)}


def test_cap_bounds_admission_but_still_compares():
    # cap=2: bucket admits 1,2; 3 and 4 each compare against {1,2} but are
    # not admitted, so (3,4) is the documented miss.
    got = _drive([[1], [2], [3], [4]], cap=2)
    assert got == {(1, 2), (1, 3), (2, 3), (1, 4), (2, 4)}


def test_stateless_bands_match_aggregate_signatures(spark, sf_smoke):
    from gridmr_spark.catalog import load_table
    from gridmr_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures

    docs = load_table(spark, sf_smoke, "documents")
    a = set(map(tuple, minhash_candidates_batch(docs).collect()))
    b = set(
        map(tuple, lsh_candidate_pairs(minhash_signatures(docs, "doc_id", "text")).collect())
    )
    assert a == b and a


@pytest.mark.skipif(not has_protobuf(), reason="transformWithState state server needs google.protobuf")
@pytest.mark.slow
def test_stream_candidates_equal_batch(spark, tmp_path, sf_smoke):
    """Two availableNow runs over a growing directory: the streaming band
    state carries bucket membership across restarts, and the distinct
    emitted pair set equals the batch twin on the union."""
    from gridmr_spark.catalog import load_table

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    b1 = docs.where(F.col("doc_id") % 2 == 0)
    b2 = docs.where(F.col("doc_id") % 2 == 1)
    d, ck, sink = str(tmp_path / "in"), str(tmp_path / "ck"), str(tmp_path / "out")
    b1.write.mode("overwrite").parquet(d)

    def run():
        src = spark.readStream.schema("doc_id long, text string").parquet(d)
        q = (
            stream_minhash_candidates(src)
            .writeStream.outputMode("append")
            .foreachBatch(lambda df, bid: df.write.mode("append").parquet(sink))
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    b2.write.mode("append").parquet(d)
    run()
    got = {(r.id1, r.id2) for r in spark.read.parquet(sink).collect()}
    want = {(r.id1, r.id2) for r in minhash_candidates_batch(docs).collect()}
    assert got == want and want


# -- cap dial recall telemetry (BASELINE.md §D) -------------------------------


def test_cap_recall_closed_form_matches_processor():
    """The §D cap-recall telemetry uses the rank closed form: with
    id-ordered arrival, pair (a, b), a<b, is emitted iff a's bucket
    arrival rank <= cap. Prove the closed form IS the processor's
    semantics on a hot 10-clique bucket, then pin the analytic recall."""
    n, cap = 10, 8
    got = _drive([[i] for i in range(1, n + 1)], cap=cap)
    exact = {(a, b) for a in range(1, n + 1) for b in range(a + 1, n + 1)}
    closed_form = {(a, b) for (a, b) in exact if a <= cap}  # rank == id here
    assert got == closed_form
    # analytic: misses only pairs among post-cap arrivals = C(n-cap, 2)
    assert len(got) == len(exact) - (n - cap) * (n - cap - 1) // 2
    assert len(got) / len(exact) == 44 / 45


def test_cap_recall_floors_on_hot_cliques():
    """Measured §D points (dup-dense sf1 tiling: 0.769 / 0.967 / 0.998 at
    cap 4/8/16) are driven by planted ~10-cliques; the floors below are
    the same regime reproduced deterministically: every bucket a
    10-clique, arrival order = id order."""
    n = 10
    exact = n * (n - 1) // 2
    # analytic per-clique values: 30/45 = 0.667, 44/45 = 0.978, 1.0 —
    # the measured tiling rows sit ABOVE these (0.769/0.967/0.998)
    # because not every tiling bucket is a full clique
    for cap, floor in ((4, 0.65), (8, 0.95), (16, 1.0)):
        got = _drive([[i] for i in range(1, n + 1)], cap=cap)
        assert len(got) / exact >= floor, (cap, len(got) / exact)


def test_cap_recall_exact_on_natural_buckets():
    """Buckets no larger than the cap lose nothing — the natural-corpus
    §D rows (recall 1.0 at cap>=4 on sf0.1) in miniature."""
    for ids in ([1, 2], [5, 6, 7], [1, 2, 3, 4]):
        want = {(a, b) for a in ids for b in ids if a < b}
        assert _drive([ids], cap=4) == want
