"""Persisted ANN index artifacts (operators/ann_index.py).

The two contracts under test:
1. FIDELITY — searching a persisted index returns exactly what the
   in-memory operator returns under the same parameters (parquet keeps
   doubles bit-exact; shortlist supersets make per-batch survivors
   batching-invariant), so the persisted path inherits the in-memory
   recall floors transitively.
2. SEPARATION — search performs ZERO fit work: no centroid fit, no
   codebook fit, no full-table encode. Asserted with a spy that makes any
   fit call raise.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gridmr_spark.operators import ann_index as AI
from gridmr_spark.operators.similarity import IVFIndex, ProductQuantizer


@pytest.fixture(scope="module")
def emb(spark, sf_oracle):
    return spark.read.parquet(f"{sf_oracle}/embeddings.parquet")


def _rows(df):
    return sorted(
        (r.qid, r.cid, r.rnk, round(r.cosine, 12)) for r in df.collect()
    )


def test_ivf_persisted_equals_inmemory(spark, emb, tmp_path):
    kw = dict(k=8, nprobe=3, assign_n=2, iters=2, seed=42)
    want = _rows(IVFIndex(**kw).topk(emb, "vec_id", "embedding", k=5))
    pidx = AI.PersistedIVF(**kw)
    path = str(tmp_path / "ivf")
    pidx.build(emb, "vec_id", "embedding", path)
    got = _rows(
        pidx.search(spark, emb.select("vec_id", "embedding"), "vec_id", "embedding", path, k=5)
    )
    assert got == want and len(got) > 0
    assert AI.read_meta(spark, path)["kind"] == "ivf"


def test_pq_persisted_equals_inmemory(spark, emb, tmp_path):
    want = _rows(
        ProductQuantizer().topk(emb, "vec_id", "embedding", k=5, query_bound=50)
    )
    pidx = AI.PersistedPQ()
    path = str(tmp_path / "pq")
    pidx.build(emb, "vec_id", "embedding", path)
    got = _rows(pidx.search(emb, "vec_id", "embedding", path, k=5, query_bound=50))
    assert got == want and len(got) > 0
    m = AI.read_meta(spark, path)
    assert m["kind"] == "pq" and m["m"] == 16 and m["ksub"] == 32


def test_search_triggers_zero_fit(spark, emb, tmp_path, monkeypatch):
    """After build, searching must never call a fit (or re-encode): any
    fit entry point raises inside search."""
    ivf_path, pq_path = str(tmp_path / "ivf"), str(tmp_path / "pq")
    AI.PersistedIVF(k=8, nprobe=2, iters=1).build(emb, "vec_id", "embedding", ivf_path)
    AI.PersistedPQ().build(emb, "vec_id", "embedding", pq_path)

    def boom(*a, **k):
        raise AssertionError("fit called during search")

    monkeypatch.setattr(IVFIndex, "fit_centroids", boom)
    monkeypatch.setattr(ProductQuantizer, "fit", boom)
    n1 = (
        AI.PersistedIVF(k=8, nprobe=2, iters=1)
        .search(spark, emb.select("vec_id", "embedding"), "vec_id", "embedding", ivf_path, k=5)
        .count()
    )
    n2 = AI.PersistedPQ().search(emb, "vec_id", "embedding", pq_path, k=5).count()
    assert n1 > 0 and n2 > 0


def test_pq_index_is_compact(spark, emb, tmp_path):
    """The codes artifact is the index: ~m bytes/vector, far smaller than
    the raw vectors it indexes (the property that lets a 100 TB corpus'
    index fit in cluster RAM)."""
    import os

    path = str(tmp_path / "pq")
    AI.PersistedPQ().build(emb, "vec_id", "embedding", path)

    def du(p):
        return sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(p)
            for f in fs
        )

    emb_bytes = du(os.path.dirname(emb.inputFiles()[0][7:]))  # strip file:
    codes_bytes = du(os.path.join(path, "codes.parquet"))
    assert codes_bytes < emb_bytes / 3


def test_ivf_postings_clustered_by_cell(spark, emb, tmp_path):
    """Postings are stored repartitioned by cell: every cell's rows live in
    one file, so a probed search reads contiguous data (at scale this is
    the difference between nprobe file-ranges and a full shuffle)."""
    path = str(tmp_path / "ivf")
    AI.PersistedIVF(k=8, nprobe=2, iters=1).build(emb, "vec_id", "embedding", path)
    post = spark.read.parquet(f"{path}/postings.parquet")
    per_cell_files = (
        post.select("cell", F.input_file_name().alias("f"))
        .distinct()
        .groupBy("cell")
        .count()
        .collect()
    )
    assert per_cell_files and all(r["count"] == 1 for r in per_cell_files)


def test_ivf_append_equals_union_build_fixed_centroids(spark, emb, tmp_path):
    """Incremental add contract: append(new) onto build(old) searches
    ROW-IDENTICALLY to a from-scratch build on old ∪ new when the
    centroids are held fixed (assignment is a pure function of vector ×
    centroids, and search reads postings without caring which file
    carried them)."""
    kw = dict(k=8, nprobe=3, assign_n=2, iters=2, seed=42)
    old = emb.where(F.col("vec_id") % 2 == 0)
    new = emb.where(F.col("vec_id") % 2 == 1)

    inc = AI.PersistedIVF(**kw)
    inc_path = str(tmp_path / "ivf_inc")
    inc.build(old, "vec_id", "embedding", inc_path)
    centroids = inc._stored_centroids(spark, inc_path)
    stats = inc.append(new, "vec_id", "embedding", inc_path)
    assert stats["added"] >= new.count()  # assign_n=2: >= one row per vector

    full = AI.PersistedIVF(**kw)
    full_path = str(tmp_path / "ivf_full")
    full.build(emb, "vec_id", "embedding", full_path, centroids=centroids)

    q = emb.select("vec_id", "embedding")
    got = _rows(inc.search(spark, q, "vec_id", "embedding", inc_path, k=5))
    want = _rows(full.search(spark, q, "vec_id", "embedding", full_path, k=5))
    assert got == want and len(got) > 0


def test_ivf_append_drift_guard_trips_on_skew(spark, emb, tmp_path):
    """A pile of near-identical vectors lands in one cell; the occupancy
    skew must cross the build-time threshold and flag a refit."""
    kw = dict(k=8, nprobe=3, assign_n=1, iters=2, seed=42)
    idx = AI.PersistedIVF(**kw)
    path = str(tmp_path / "ivf_drift")
    idx.build(emb, "vec_id", "embedding", path, refit_skew=3.0)
    (one,) = emb.where(F.col("vec_id") == 0).select("embedding").collect()
    n = emb.count()
    clones = spark.createDataFrame(
        [(100000 + i, one.embedding) for i in range(3 * n)],
        "vec_id long, embedding array<float>",
    )
    stats = idx.append(clones, "vec_id", "embedding", path)
    assert stats["occupancy_skew"] > 3.0 and stats["needs_refit"]
    # a benign append on the other hand must NOT flag
    benign = emb.select((F.col("vec_id") + 200000).alias("vec_id"), "embedding")
    path2 = str(tmp_path / "ivf_ok")
    AI.PersistedIVF(**kw).build(emb, "vec_id", "embedding", path2, refit_skew=3.0)
    stats2 = AI.PersistedIVF(**kw).append(benign, "vec_id", "embedding", path2)
    assert not stats2["needs_refit"]


def test_pq_append_codes_exact_and_drift_guard(spark, emb, tmp_path):
    """Appended codes are bit-identical to a from-scratch encode under the
    same codebooks (shared encode definition); search over the appended
    index equals search over a union build with those codebooks. A
    distribution-shifted batch trips the reconstruction-error guard."""
    old = emb.where(F.col("vec_id") % 2 == 0)
    new = emb.where(F.col("vec_id") % 2 == 1)
    inc = AI.PersistedPQ()
    path = str(tmp_path / "pq_inc")
    inc.build(old, "vec_id", "embedding", path)
    books = inc._stored_books(spark, path)
    stats = inc.append(new, "vec_id", "embedding", path)
    assert stats["added"] == new.count() and not stats["needs_refit"]
    stored = {
        r.cid: list(r.codes)
        for r in spark.read.parquet(f"{path}/codes.parquet").collect()
    }
    fresh = {
        r.cid: list(r.codes)
        for r in AI.PersistedPQ()._encode_df(emb, "vec_id", "embedding", books).collect()
    }
    assert stored == fresh and len(stored) == emb.count()
    # drift: vectors orthogonal-ish to the corpus (one-hot dims) quantize
    # far worse than the build baseline
    dim = len(emb.select("embedding").first().embedding)
    shifted = spark.createDataFrame(
        [
            (300000 + i, [100.0 if d == (i % dim) else 0.0 for d in range(dim)])
            for i in range(64)
        ],
        "vec_id long, embedding array<float>",
    )
    stats2 = inc.append(shifted, "vec_id", "embedding", path)
    assert stats2["recon_err"] > stats2["build_recon_err"]
    if stats2["recon_err"] > 2.0 * stats2["build_recon_err"]:
        assert stats2["needs_refit"]
