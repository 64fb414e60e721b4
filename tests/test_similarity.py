"""Similarity-search semantics: exact top-k sanity + LSH recall vs exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from gridmr_spark.operators.similarity import RandomHyperplaneLSH, cosine_topk


def _exact_topk_pairs(spark, sf_oracle, k=5):
    emb = spark.read.parquet(f"{sf_oracle}/embeddings.parquet")
    q = emb.select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    c = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    out = cosine_topk(q, c, k=k)
    return {(r.q_id, r.c_id) for r in out.collect()}, out


def test_exact_topk_shape(spark, sf_oracle):
    pairs, out = _exact_topk_pairs(spark, sf_oracle, k=5)
    n = spark.read.parquet(f"{sf_oracle}/embeddings.parquet").count()
    assert out.count() == n * 5
    assert all(q != c for q, c in pairs)  # self excluded
    sims = out.where("rnk = 1").select("cosine").collect()
    assert all(-1.0 <= r.cosine <= 1.0 for r in sims)


def test_lsh_recall_vs_exact(spark, sf_oracle):
    """Multi-probe hyperplane LSH top-5 should recover most of the exact
    top-5 neighbor pairs. Embeddings here are near-random (max cosine
    ~0.5), which is the WORST case for LSH — the 0.8 floor is calibrated to
    that (the registered occupancy-8/24-table config measures ~0.96 at
    sf0.1); on clustered real embeddings recall is far higher."""
    from gridmr_spark.queries import load_all

    exact, _ = _exact_topk_pairs(spark, sf_oracle, k=5)
    res = load_all()["similarity_lsh_topk"].fn(spark, sf_oracle)
    approx = {(r.qid, r.cid) for r in res.collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"LSH recall {recall:.3f} below floor"


def test_lsh_bucket_determinism(spark, sf_oracle):
    emb = spark.read.parquet(f"{sf_oracle}/embeddings.parquet")
    lsh = RandomHyperplaneLSH(dim=64, bits=6, tables=4, seed=42)
    a = {r.vec_id: r.bucket for r in lsh.bucketize(emb, "embedding").select("vec_id", "bucket").collect()}
    b = {r.vec_id: r.bucket for r in lsh.bucketize(emb.repartition(5), "embedding").select("vec_id", "bucket").collect()}
    assert a == b


def test_gemm_topk_matches_fold_topk(spark, sf_oracle):
    """The GEMM path must return the same neighbor SETS as the exact fold
    (cosine values differ only in the last ulps; rank flips are possible
    only on exact ties, which the random test vectors don't have)."""
    from gridmr_spark.operators.similarity import cosine_topk_gemm

    emb = spark.read.parquet(f"{sf_oracle}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    c = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    fold = {(r.q_id, r.c_id) for r in cosine_topk(q, c, k=5).collect()}
    gemm = {(r.q_id, r.c_id) for r in cosine_topk_gemm(q.toPandas(), c, k=5).collect()}
    assert fold == gemm


def test_ivf_recall_vs_exact(spark, sf_oracle):
    """IVF at the registered query's production tuning (k=ceil(sqrt(n)),
    nprobe=ceil(0.36k), iters=4, assign_n=2 cell overlap) on near-random
    vectors — the worst case for a centroid index — must reach recall >= 0.8
    of the exact top-5 (offline sweep measures ~0.90-0.94 across seeds at
    n=500 and n=2000) and be deterministic across partitionings."""
    import math

    from gridmr_spark.operators.similarity import IVFIndex

    exact, _ = _exact_topk_pairs(spark, sf_oracle, k=5)
    emb = spark.read.parquet(f"{sf_oracle}/embeddings.parquet")
    n = emb.count()
    k_cells = max(4, math.ceil(math.sqrt(n)))
    ivf = IVFIndex(
        k=k_cells, nprobe=max(2, math.ceil(0.36 * k_cells)), iters=4,
        seed=42, assign_n=2,
    )
    approx = {(r.qid, r.cid) for r in ivf.topk(emb, "vec_id", "embedding", k=5).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"IVF recall {recall:.3f}"
    approx2 = {(r.qid, r.cid) for r in ivf.topk(emb.repartition(7), "vec_id", "embedding", k=5).collect()}
    assert approx == approx2  # deterministic under repartitioning


def test_blocked_gemm_equals_single_block(spark, sf_oracle):
    """Union of per-block GEMM top-k must equal the single-collect GEMM
    top-k exactly (same pairs), at a block size that forces >= 3 blocks."""
    from pyspark.sql import functions as F
    from gridmr_spark.operators.similarity import cosine_topk_gemm, cosine_topk_gemm_blocked

    emb = spark.read.parquet(f"{sf_oracle}/embeddings.parquet")
    q = emb.select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    c = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    single = {(r.q_id, r.c_id) for r in cosine_topk_gemm(q.toPandas(), c, k=5).collect()}
    blocked = {(r.q_id, r.c_id)
               for r in cosine_topk_gemm_blocked(q, c, k=5, block_rows=180).collect()}
    assert blocked == single and len(single) == emb.count() * 5
    # Anchor against the fold path too: equality with another GEMM variant
    # can't mask a shared coverage defect (the cogroup key-type mismatch
    # lost ~40% of query×candidate coverage while both paths still
    # returned 5 rows/query).
    exact, _ = _exact_topk_pairs(spark, sf_oracle, k=5)
    assert blocked == exact


def test_pq_recall_vs_exact(spark, sf_oracle):
    """PQ-ADC shortlist + exact re-rank at the registered defaults
    (m=16, ksub=32, shortlist=96) on near-random vectors — the ANN worst
    case — must reach recall >= 0.85 of the exact top-5 (measures ~0.99 at
    sf0.01, ~0.97 at sf0.1) and be deterministic across partitionings."""
    from gridmr_spark.operators.similarity import ProductQuantizer

    exact, _ = _exact_topk_pairs(spark, sf_oracle, k=5)
    emb = spark.read.parquet(f"{sf_oracle}/embeddings.parquet")
    pq = ProductQuantizer()
    approx = {(r.qid, r.cid) for r in pq.topk(emb, "vec_id", "embedding", k=5).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.85, f"PQ recall {recall:.3f}"
    approx2 = {
        (r.qid, r.cid)
        for r in pq.topk(emb.repartition(7), "vec_id", "embedding", k=5).collect()
    }
    assert approx == approx2  # deterministic under repartitioning


def test_pq_rerank_scores_are_exact(spark, sf_oracle):
    """Stage-2 re-rank must emit TRUE cosines: every (qid, cid, cosine) the
    PQ path returns appears with the same pair in the exact all-pairs
    ranking with a matching cosine to 1e-12 (BLAS vs fold only differs in
    last ulps) — approximation may only cost recall, never score accuracy."""
    from gridmr_spark.operators.similarity import ProductQuantizer

    _, exact_df = _exact_topk_pairs(spark, sf_oracle, k=5)
    exact_cos = {
        (r.q_id, r.c_id): r.cosine for r in exact_df.collect()
    }
    emb = spark.read.parquet(f"{sf_oracle}/embeddings.parquet")
    res = ProductQuantizer().topk(emb, "vec_id", "embedding", k=5).collect()
    checked = 0
    for r in res:
        if (r.qid, r.cid) in exact_cos:
            assert abs(r.cosine - exact_cos[(r.qid, r.cid)]) < 1e-9
            checked += 1
    assert checked > 0


def test_mrl_recall_bounds_and_determinism(spark, sf_oracle):
    """vector_mrl_recall outputs one row per query with recall@5 in
    [0, 1e6], and reruns are bit-identical (rankings tie-break on id)."""
    from gridmr_spark.queries.vector import _MRL_K, _MRL_NQ, vector_mrl_recall

    a = {r.query_id: (r.n_overlap, r.recall_microq)
         for r in vector_mrl_recall(spark, sf_oracle).collect()}
    assert len(a) == _MRL_NQ
    for n, micro in a.values():
        assert 0 <= n <= _MRL_K
        assert micro == n * 1_000_000 // _MRL_K
    b = {r.query_id: (r.n_overlap, r.recall_microq)
         for r in vector_mrl_recall(spark, sf_oracle).collect()}
    assert a == b


def test_mrl_full_dims_recall_is_perfect(spark, sf_oracle):
    """Sanity anchor: truncating to the FULL dimensionality must reproduce
    the full ranking exactly (recall 1.0 for every query) — guards the
    slice/ranking plumbing independent of data."""
    from gridmr_spark.catalog import load_table
    from gridmr_spark.operators.similarity import cosine_topk
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_oracle, "embeddings")
    dims = len(emb.select("embedding").first()[0])
    q = emb.where(F.col("vec_id") < 4)

    def top(frame_q, frame_c):
        return {
            (r.query_id, r.neighbor_id, r.rnk)
            for r in cosine_topk(
                frame_q.select(F.col("vec_id").alias("query_id"), F.col("v").alias("q_vec")),
                frame_c.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("c_vec")),
                k=5, q_id="query_id", q_vec="q_vec", c_id="neighbor_id", c_vec="c_vec",
            ).collect()
        }

    full = top(q.select("vec_id", F.col("embedding").alias("v")),
               emb.select("vec_id", F.col("embedding").alias("v")))
    sliced = top(q.select("vec_id", F.slice("embedding", 1, dims).alias("v")),
                 emb.select("vec_id", F.slice("embedding", 1, dims).alias("v")))
    assert full == sliced


def test_silhouette_separates_planted_from_scrambled(spark):
    """Tight well-separated planted clusters score n_well == n_vecs with
    positive margins; the SAME points with scrambled labels score worse on
    both counts — the eval detects clustering quality, not just schema."""
    import random

    from pyspark.sql import functions as F

    from gridmr_spark.queries.vector import silhouette_eval

    rng = random.Random(7)
    rows = []
    for label in range(3):
        center = [10.0 * (label + 1) * ((-1) ** d) for d in range(8)]
        for i in range(20):
            rows.append(
                (label * 100 + i, label,
                 [c + rng.uniform(-0.5, 0.5) for c in center])
            )
    df = spark.createDataFrame(rows, "vec_id long, label long, embedding array<double>")
    good = silhouette_eval(df).collect()
    assert all(r.n_well == r.n_vecs for r in good)
    assert all(r.margin_sum_q > 0 for r in good)
    scrambled = df.withColumn("label", (F.col("vec_id") * 37) % 3)
    bad = silhouette_eval(scrambled).collect()
    assert sum(r.n_well for r in bad) < sum(r.n_vecs for r in bad)


def test_binary_hamming_two_stage_recall(spark, sf_oracle):
    """Binary-quantization two-stage search (Hamming shortlist -> exact
    cosine re-rank): recall@5 floor vs exact cosine top-5. Honest context
    for the floor: these synthetic 64-dim embeddings are near-uniform
    (max pairwise cosine ~0.5), the WORST case for 64-bit sign signatures
    — measured recall at 4x shortlist is 0.46 (sf0.01) / 0.32 (sf0.1);
    real corpora with cluster structure and 768+ dims sit far higher.
    The floor still catches a broken packing or ranking, which collapses
    recall to ~k/n (~0.01)."""
    from pyspark.sql import Window

    from gridmr_spark.catalog import load_table
    from gridmr_spark.functions.vectors import cosine_similarity
    from gridmr_spark.operators.similarity import binary_signature, hamming_topk

    emb = load_table(spark, sf_oracle, "embeddings")
    sigs = emb.select("vec_id", *binary_signature("embedding", 64))
    q = sigs.where(F.col("vec_id") < 200).withColumnRenamed("vec_id", "qid")
    c = sigs.withColumnRenamed("vec_id", "cid")
    shortlist = hamming_topk(q, c, k=20, n_words=2, q_id="qid", c_id="cid")
    qv = emb.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("q_vec"))
    cv = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("c_vec"))
    reranked = (
        shortlist.join(cv, "cid").join(qv, "qid")
        .withColumn("cos", cosine_similarity("q_vec", "c_vec"))
        .withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))
            ),
        )
        .where(F.col("r") <= 5)
    )
    got = {(r.qid, r.cid) for r in reranked.select("qid", "cid").collect()}
    exact = cosine_topk(
        emb.where(F.col("vec_id") < 200).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("q_vec")
        ),
        cv, k=5, q_id="qid", q_vec="q_vec", c_id="cid", c_vec="c_vec",
    )
    ex = {(r.qid, r.cid) for r in exact.collect()}
    assert len(got & ex) / len(ex) >= 0.25


def test_hamming_tracks_angle(spark, sf_oracle):
    """Structural soundness of the signature: true cosine top-5 pairs must
    have materially SMALLER mean Hamming distance than the all-pairs mean
    (E[hamming] = dim * theta / pi is monotone in angle)."""
    from gridmr_spark.catalog import load_table
    from gridmr_spark.functions.vectors import cosine_similarity
    from gridmr_spark.operators.similarity import binary_signature, hamming_topk

    emb = load_table(spark, sf_oracle, "embeddings").where(F.col("vec_id") < 300)
    sigs = emb.select("vec_id", *binary_signature("embedding", 64))
    q = sigs.withColumnRenamed("vec_id", "qid")
    c = sigs.withColumnRenamed("vec_id", "cid")
    all_pairs = hamming_topk(q, c, k=10**9, n_words=2, q_id="qid", c_id="cid")
    qv = emb.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("q_vec"))
    cv = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("c_vec"))
    with_cos = all_pairs.join(qv, "qid").join(cv, "cid").withColumn(
        "cos", cosine_similarity("q_vec", "c_vec")
    )
    stats = with_cos.agg(
        F.avg("hamming").alias("mean_all"),
        F.avg(F.when(F.col("cos") >= 0.3, F.col("hamming"))).alias("mean_close"),
    ).collect()[0]
    assert stats.mean_close < stats.mean_all - 3  # close pairs are bit-closer


def test_hamming_pairs_lossless_vs_brute_force(spark):
    """Banded self-join == brute-force all-pairs at the same radius, on
    signatures whose pair distances straddle the radius (pigeonhole
    guarantee exercised, not vacuous)."""
    import random

    from gridmr_spark.operators.similarity import hamming_pairs

    rng = random.Random(7)
    base = rng.getrandbits(60)
    rows = []
    for i in range(60):
        sig = base
        for _ in range(rng.randrange(0, 9)):  # 0..8 bit flips from base
            sig ^= 1 << rng.randrange(60)
        rows.append((i, sig & 0xFFFFFFFF, sig >> 32))
    df = spark.createDataFrame(rows, "id long, sig0 long, sig1 long")
    got = {
        (r.id_1, r.id_2, r.hamming)
        for r in hamming_pairs(
            df, "id", n_words=2, radius=4, total_bits=60, bands=5
        ).collect()
    }
    want = set()
    for i, a0, a1 in rows:
        for j, b0, b1 in rows:
            if i < j:
                h = bin((a0 ^ b0) | ((a1 ^ b1) << 32)).count("1")
                if h <= 4:
                    want.add((i, j, h))
    assert got == want and want  # equality, and the radius is non-trivial


def test_hamming_pairs_candidate_reduction_on_clusters(spark):
    """On planted clusters (the near-dup regime the operator exists for)
    the banded join must generate FAR fewer candidates than n^2/2, while
    still finding every within-radius pair."""
    import random

    from gridmr_spark.operators.similarity import (
        hamming_candidates,
        hamming_pairs,
    )

    rng = random.Random(11)
    rows = []
    i = 0
    for _c in range(40):  # 40 clusters x 5 near-copies
        center = rng.getrandbits(60)
        for _ in range(5):
            sig = center
            for _ in range(rng.randrange(0, 3)):
                sig ^= 1 << rng.randrange(60)
            rows.append((i, sig & 0xFFFFFFFF, sig >> 32))
            i += 1
    df = spark.createDataFrame(rows, "id long, sig0 long, sig1 long")
    n = len(rows)
    n_cand = hamming_candidates(df, "id", 2, 60, 5).count()
    n_pairs = hamming_pairs(df, "id", 2, radius=4, total_bits=60, bands=5).count()
    assert n_pairs >= 40 * 4  # every cluster's pairs found (>= spanning set)
    assert n_cand < 0.15 * n * (n - 1) / 2  # vs the 19900-pair n^2 floor
    assert n_pairs <= n_cand


def test_hamming_pairs_rejects_lossy_band_count(spark):
    import pytest

    from gridmr_spark.operators.similarity import hamming_pairs

    df = spark.createDataFrame([(1, 0, 0)], "id long, sig0 long, sig1 long")
    with pytest.raises(ValueError, match="LOSE"):
        hamming_pairs(df, "id", n_words=2, radius=5, total_bits=60, bands=5)


def test_band_exprs_rejects_total_bits_beyond_signature(spark):
    """total_bits > n_words*word_bits would band over a nonexistent (or
    unrelated) sig column — must fail fast with a clear contract error,
    not an opaque AnalysisException at execution."""
    import pytest

    from gridmr_spark.operators.similarity import hamming_pairs

    df = spark.createDataFrame([(1, 0, 0)], "id long, sig0 long, sig1 long")
    with pytest.raises(ValueError, match="exceeds the signature"):
        hamming_pairs(df, "id", n_words=2, radius=2, total_bits=80, bands=8)


def test_hamming_candidates_explode_is_narrow(spark):
    """Scale contract: the banded/exploded stream must NOT carry the
    signature words through the bands-way fan-out — words re-join by id
    after the distinct pair set exists (shuffle bytes stay O(n*bands*3
    cols), not O(n*bands*n_words))."""
    from gridmr_spark.operators.similarity import hamming_candidates

    df = spark.createDataFrame(
        [(i, i & 0xFFFFFFFF, 0) for i in range(8)],
        "id long, sig0 long, sig1 long",
    )
    import re

    plan = hamming_candidates(df, "id", 2, 60, 5)._jdf.queryExecution().toString()
    # the projections feeding the (_bid,_bval) band join must be exactly
    # the narrow (id, _bid, _bval) triple — no sig words folded through
    narrow = re.findall(
        r"Project \[_hid#\d+L AS id_[12]#\d+L, _b#\d+\.bid AS _bid#\d+, "
        r"_b#\d+\.bval AS _bval#\d+L\]",
        plan,
    )
    assert len(narrow) >= 2, plan
    # and the pair set is narrowed to (id_1, id_2) before dedup/verify
    assert re.search(r"Project \[id_1#\d+L, id_2#\d+L\]", plan), plan


def test_shortlisted_1nn_canary_and_recall(spark):
    """eval_1nn_shortlist contract: at m = |ref| the two-stage path must
    equal brute-force 1-NN BIT-FOR-BIT (exactness canary); at small m on
    clustered data the agreement stays high (the recall/compute dial)."""
    import random

    from gridmr_spark.queries.vector import (
        nn_confusion_from,
        nn_shortlist_confusion,
    )

    rng = random.Random(3)
    rows = []
    for i in range(200):
        label = i % 5
        center = [(1.0 if d == label else -0.3) for d in range(8)]
        vec = [c + rng.uniform(-0.4, 0.4) for c in center]
        rows.append((i, label, vec))
    emb = spark.createDataFrame(rows, "vec_id long, label long, embedding array<double>")
    brute = {tuple(r) for r in nn_confusion_from(emb, ref_cut=50).collect()}
    canary = {
        tuple(r)
        for r in nn_shortlist_confusion(emb, m=50, ref_cut=50, dim=8).collect()
    }
    assert canary == brute and brute
    # production-m regime: top-8 Hamming shortlist out of 50 refs still
    # agrees on the vast majority of assignments (clustered data)
    small = {
        tuple(r)
        for r in nn_shortlist_confusion(emb, m=8, ref_cut=50, dim=8).collect()
    }
    n_total = sum(n for (_, _, n) in brute)
    n_agree = sum(
        min(n, dict(((t, p), n2) for (t, p, n2) in small).get((t, p), 0))
        for (t, p, n) in brute
    )
    assert n_agree >= 0.9 * n_total


def test_cosine_topk_query_cap_guard(spark, sf_oracle, monkeypatch):
    """The driver-collect guard: a query side larger than the configured
    ceiling must raise instead of silently collecting it to the driver
    (guide §5 — the operator's 'small by contract' query side now has an
    enforced contract). The collect itself is bounded by limit(cap+1), so
    even the failing path never materializes more than cap+1 rows."""
    import pytest

    emb = spark.read.parquet(f"{sf_oracle}/embeddings.parquet")
    q = emb.select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    c = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    monkeypatch.setenv("SPARK_GRAFT_TOPK_MAX_QUERIES", "10")
    with pytest.raises(ValueError, match="query side exceeds 10 rows"):
        cosine_topk(q, c, k=2)
    # Under the cap the operator behaves exactly as before the guard.
    out = cosine_topk(q.where("q_id < 5"), c, k=2)
    assert out.count() == 5 * 2
