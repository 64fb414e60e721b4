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
