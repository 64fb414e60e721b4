#!/usr/bin/env python3
"""Measure the QUALITY metric of every rows-only (no-DuckDB-oracle) query —
the number that belongs next to its time in BASELINE.md §D.

For the approximate similarity paths the metric is recall@5 against the
exact fold-based top-5 computed fresh over the full table (the same
definition tests/test_similarity.py floors at 0.8). For the exact-GEMM
paths recall must be 1.0 (BLAS summation order only perturbs the cosine
VALUE, never the neighbor set on tie-free data). For the HLL paths the
metric is the max relative error of the estimate vs exact COUNT DISTINCT.

Usage:
    python tools/quality_metrics.py [SF_DIR]    # default /root/testdata/sf0.1
Prints one JSON object {query: {"metric": name, "value": x}}.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pairs(df, qcol, ccol):
    return {(r[qcol], r[ccol]) for r in df.select(qcol, ccol).collect()}


def recall(approx: set, exact: set) -> float:
    return len(exact & approx) / len(exact)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from gridmr_spark.operators.similarity import cosine_topk
    from gridmr_spark.queries import load_all
    from gridmr_spark.session import get_spark

    spark = get_spark("quality_metrics")
    reg = load_all()
    out: dict[str, dict] = {}

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_emb = emb.count()
    q = emb.select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    c = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    if n_emb <= 5000:
        exact_all = pairs(cosine_topk(q, c, k=5), "q_id", "c_id")
    else:
        # Big-SF path (the sf1 telemetry run): the column-expression fold
        # is O(n^2 * dim) scalar work with parallelism capped by the
        # candidate file's partitioning — at 20k vectors that's hours. The
        # blocked GEMM computes the same exact neighbor sets (proven
        # row-equal to the fold by the similarity_topk_gemm_blocked driver
        # hash row and test_blocked_gemm_equals_single_block) in numpy
        # BLAS, minutes not hours. Reference quality is unchanged: both
        # are exact; only similarity_topk_gemm* rows would be tautological
        # at this SF, and those stay canaries at the sf0.1 protocol point.
        from gridmr_spark.operators.similarity import cosine_topk_gemm_blocked

        exact_all = pairs(
            cosine_topk_gemm_blocked(
                q.repartition(32), c.repartition(32), k=5
            ),
            "q_id", "c_id",
        )

    out["similarity_lsh_topk"] = {
        "metric": "recall@5 vs exact",
        "value": round(recall(pairs(reg["similarity_lsh_topk"].fn(spark, sf_dir), "qid", "cid"), exact_all), 4),
    }
    out["similarity_ivf_topk"] = {
        "metric": "recall@5 vs exact",
        "value": round(recall(pairs(reg["similarity_ivf_topk"].fn(spark, sf_dir), "qid", "cid"), exact_all), 4),
    }
    # PQ and the single-collect GEMM both bound their query side to
    # vec_id < 1000 by the driver-fit contract — one shared reference set.
    exact_lt1000 = {(a, b) for a, b in exact_all if a < 1000}
    out["similarity_pq_topk"] = {
        "metric": "recall@5 vs exact",
        "value": round(recall(pairs(reg["similarity_pq_topk"].fn(spark, sf_dir), "qid", "cid"), exact_lt1000), 4),
    }

    # Persisted-index twins: since round 7 the REGISTERED queries run the
    # EXACT-REGIME parameter point (pq shortlist=n, ivf nprobe=k) and are
    # hash-checked against the brute-force oracle — so these recalls must
    # measure exactly 1.0, same canary contract as the GEMM rows. The
    # approximate-regime quality lives in the similarity_pq_topk /
    # similarity_ivf_topk rows (and tests/test_ann_index.py proves
    # persisted==in-memory row-for-row at that regime).
    out["similarity_pq_persisted"] = {
        "metric": "recall@5, exact regime (must be 1.0)",
        "value": round(recall(pairs(reg["similarity_pq_persisted"].fn(spark, sf_dir), "qid", "cid"), exact_lt1000), 4),
    }
    out["similarity_ivf_persisted"] = {
        "metric": "recall@5, exact regime (must be 1.0)",
        "value": round(recall(pairs(reg["similarity_ivf_persisted"].fn(spark, sf_dir), "qid", "cid"), exact_all), 4),
    }

    # Appended-state telemetry (round 11): the registered query runs the
    # exact regime over build(even)+append(odd) — its recall is a 1.0
    # canary like the other persisted rows. The PRODUCTION question is the
    # probed regime: does an appended index lose recall vs a from-scratch
    # build at the same (fitted-on-even vs fitted-on-all) centroids? Both
    # numbers recorded so §D shows the append penalty explicitly.
    out["similarity_ivf_append"] = {
        "metric": "recall@5, exact regime at appended state (must be 1.0)",
        "value": round(recall(pairs(reg["similarity_ivf_append"].fn(spark, sf_dir), "qid", "cid"), exact_all), 4),
    }
    import math as _math
    import shutil as _shutil
    import tempfile as _tempfile

    from gridmr_spark.operators.ann_index import PersistedIVF as _PIVF

    _k_cells = max(4, _math.ceil(_math.sqrt(max(n_emb, 1))))
    _probe_kw = dict(k=_k_cells, nprobe=3, iters=4, seed=42, assign_n=2)
    _qside = emb.select("vec_id", "embedding")
    _vals = {}
    for _name, _halved in (("appended", True), ("full_build", False)):
        _idx = _PIVF(**_probe_kw)
        _pth = _tempfile.mkdtemp(prefix=f"qm_ivf_{_name}_")
        try:
            if _halved:
                _idx.build(emb.where(F.col("vec_id") % 2 == 0), "vec_id", "embedding", _pth)
                _idx.append(emb.where(F.col("vec_id") % 2 == 1), "vec_id", "embedding", _pth)
            else:
                _idx.build(emb, "vec_id", "embedding", _pth)
            _got = pairs(
                _idx.search(spark, _qside, "vec_id", "embedding", _pth, k=5),
                "qid", "cid",
            )
            _vals[_name] = round(recall(_got, exact_all), 4)
        finally:
            _shutil.rmtree(_pth, ignore_errors=True)
    out["similarity_ivf_append@probed"] = {
        "metric": "recall@5, probed regime (nprobe=3): build(even)+append(odd) vs full build",
        "value": _vals["appended"],
        "full_build_value": _vals["full_build"],
    }

    # Exact GEMM paths: neighbor-set recall vs the fold path must be 1.0.
    # similarity_topk_gemm bounds its query side to vec_id < 1000 by
    # contract, so its reference is the fold top-5 restricted to those.
    out["similarity_topk_gemm"] = {
        "metric": "neighbor-set recall vs exact fold (must be 1.0)",
        "value": round(recall(pairs(reg["similarity_topk_gemm"].fn(spark, sf_dir), "q_id", "c_id"), exact_lt1000), 4),
    }
    out["similarity_topk_gemm_blocked"] = {
        "metric": "neighbor-set recall vs exact fold (must be 1.0)",
        "value": round(recall(pairs(reg["similarity_topk_gemm_blocked"].fn(spark, sf_dir), "q_id", "c_id"), exact_all), 4),
    }

    # Binary-quantization two-stage search: recall@5 of (Hamming top-20
    # shortlist -> exact cosine re-rank) vs exact cosine top-5. The
    # registered query (vector_binary_hamming) is hash-oracled — Hamming
    # ranking is its DEFINED output — so this row measures the OTHER
    # axis: how well 64-bit sign signatures approximate the cosine
    # neighbors on this corpus (near-uniform vectors = worst case).
    from pyspark.sql import Window as _W

    from gridmr_spark.functions.vectors import cosine_similarity as _cos
    from gridmr_spark.operators.similarity import binary_signature, hamming_topk

    sigs = emb.select("vec_id", *binary_signature("embedding", 64))
    bq_q = sigs.where(F.col("vec_id") < 200).withColumnRenamed("vec_id", "qid")
    bq_c = sigs.withColumnRenamed("vec_id", "cid")
    shortlist = hamming_topk(bq_q, bq_c, k=20, n_words=2, q_id="qid", c_id="cid")
    qv = emb.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("q_vec"))
    cv = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("c_vec"))
    rr = (
        shortlist.join(cv, "cid").join(qv, "qid")
        .withColumn("cos", _cos("q_vec", "c_vec"))
        .withColumn("r", F.row_number().over(
            _W.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))))
        .where(F.col("r") <= 5)
    )
    got_bq = {(r.qid, r.cid) for r in rr.select("qid", "cid").collect()}
    exact_lt200 = {(a, b) for a, b in exact_all if a < 200}
    out["vector_binary_hamming"] = {
        "metric": "two-stage recall@5 (Hamming top-20 -> exact re-rank) vs exact; registered query itself is hash-exact",
        "value": round(recall(got_bq, exact_lt200), 4),
    }

    # Companion telemetry (round 10): the row above measures sign
    # quantization at its WORST case (near-uniform synthetic vectors —
    # random directions put every pair near the Hamming mode). Real
    # embedding corpora are CLUSTERED, the regime binary quantization is
    # deployed in — measure the same two-stage recall on deterministic
    # planted clusters (20 centers x 50 members, dim 64, seeded) so §D
    # carries both ends of the operating range.
    import numpy as _np

    def _two_stage_on(cl):
        cq = cl.select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")).where(F.col("q_id") < 200)
        cc = cl.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
        exact_cl = pairs(cosine_topk(cq, cc, k=5), "q_id", "c_id")
        csigs = cl.select("vec_id", *binary_signature("embedding", 64))
        cbq = csigs.where(F.col("vec_id") < 200).withColumnRenamed("vec_id", "qid")
        cbc = csigs.withColumnRenamed("vec_id", "cid")
        cshort = hamming_topk(cbq, cbc, k=20, n_words=2, q_id="qid", c_id="cid")
        cqv = cl.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("q_vec"))
        ccv = cl.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("c_vec"))
        crr = (
            cshort.join(ccv, "cid").join(cqv, "qid")
            .withColumn("cos", _cos("q_vec", "c_vec"))
            .withColumn("r", F.row_number().over(
                _W.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))))
            .where(F.col("r") <= 5)
        )
        got_cl = {(r.qid, r.cid) for r in crr.select("qid", "cid").collect()}
        # cluster-hit: the axis quantization is DEPLOYED for — does the
        # shortlisted top-5 land in the query's true cluster? (50 members
        # per cluster: ids // 50 agree). Exact top-5's own cluster-hit is
        # the ceiling.
        hit = sum(1 for q, c in got_cl if q // 50 == c // 50) / max(1, len(got_cl))
        ceil = sum(1 for q, c in exact_cl if q // 50 == c // 50) / max(1, len(exact_cl))
        return round(recall(got_cl, exact_cl), 4), round(hit, 4), round(ceil, 4)

    sweep = {}
    for sigma in (0.5, 0.25, 0.1):
        rng = _np.random.default_rng(42)
        centers = rng.normal(size=(20, 64))
        pts = (centers[:, None, :] + sigma * rng.normal(size=(20, 50, 64))).reshape(-1, 64)
        cl = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(pts)],
            "vec_id long, embedding array<double>",
        ).localCheckpoint(eager=True)
        r5, hit, ceil = _two_stage_on(cl)
        sweep[f"sigma={sigma}"] = {
            "recall@5": r5, "cluster_hit@5": hit, "cluster_hit_exact": ceil
        }
    out["vector_binary_hamming_clustered"] = {
        "metric": "two-stage quality on planted clusters (20 centers x 50, dim 64, seeded) across tightness: recall@5 vs exact, plus cluster-hit@5 (fraction of returned top-5 in the query's true cluster; exact top-5's own rate is the ceiling) — sign bits resolve BETWEEN-cluster structure, not within-cluster micro-ranking, and cluster-hit is the deployed axis",
        "value": sweep,
    }

    # Shortlisted 1-NN eval at PRODUCTION m (the registered query runs
    # the m=|ref| exactness canary, hash-oracled): per-query assignment
    # AGREEMENT between the full scan and the Hamming top-32 shortlist on
    # the sf embeddings' held-out split — the recall/compute dial's
    # operating point (float folds drop |ref|/m = 15.6x at m=32).
    # Accuracy itself is near-chance on this near-uniform corpus, so
    # agreement (does the cheap path pick the same neighbor class?) is
    # the informative number.
    from gridmr_spark.queries.vector import nn_shortlist_predictions

    full = nn_shortlist_predictions(emb, m=500).select(
        "qid", F.col("pred_label").alias("pred_full")
    )
    m32 = nn_shortlist_predictions(emb, m=32).select(
        "qid", F.col("pred_label").alias("pred_m32")
    )
    agree = full.join(m32, "qid").select(
        F.avg((F.col("pred_full") == F.col("pred_m32")).cast("double")).alias("a")
    ).collect()[0].a
    out["eval_1nn_shortlist"] = {
        "metric": "per-query 1-NN assignment agreement, Hamming-shortlist m=32 vs full scan (registered query is the m=|ref| exactness canary, hash-exact)",
        "value": round(agree, 4) if agree is not None else None,
    }

    # HLL estimates: max relative error vs exact COUNT DISTINCT.
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact_li = {
        r.l_returnflag: (r.o, r.p)
        for r in li.groupBy("l_returnflag").agg(
            F.countDistinct("l_orderkey").alias("o"), F.countDistinct("l_partkey").alias("p")
        ).collect()
    }
    errs = []
    for r in reg["agg_approx_distinct"].fn(spark, sf_dir).collect():
        eo, ep = exact_li[r.l_returnflag]
        errs += [abs(r.approx_orders - eo) / eo, abs(r.approx_parts - ep) / ep]
    out["agg_approx_distinct"] = {"metric": "max relative error vs exact", "value": round(max(errs), 4)}

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    exact_cust = {
        r.o_orderpriority: r.c
        for r in orders.groupBy("o_orderpriority").agg(F.countDistinct("o_custkey").alias("c")).collect()
    }
    exact_cust["ALL"] = orders.select("o_custkey").distinct().count()
    errs = [
        abs(r.approx_customers - exact_cust[r.o_orderpriority]) / exact_cust[r.o_orderpriority]
        for r in reg["agg_hll_mergeable"].fn(spark, sf_dir).collect()
    ]
    out["agg_hll_mergeable"] = {"metric": "max relative error vs exact (incl. merged ALL)", "value": round(max(errs), 4)}

    # ---- Sketch-family accuracy rows (round 8): these queries are
    # hash-oracled (the oracle replays the sketch deterministically), so
    # the hash gate proves REPRODUCIBILITY; the rows below measure the
    # other axis — how close the sketch's ESTIMATE is to ground truth.

    # KMV: the registered query runs the exact regime at test SFs (k=64 >
    # |vocab|=31, and every language shares the SAME 31-token vocabulary,
    # so document-derived Jaccards are all trivially 1.0 — no estimator
    # error is exercisable from this data at any k). The estimator itself
    # is therefore measured on synthetic sets with CONTROLLED overlap:
    # 400-element universes at true Jaccard 0.1..0.9, the query's own
    # 60-bit md5 hash, k=64 — max |estimate - truth| across overlaps.
    import hashlib as _hl
    import itertools as _it

    def _h60(tok: str) -> int:
        return int(_hl.md5(tok.encode()).hexdigest()[:15], 16)

    KQ, N = 64, 400
    errs = []
    for tenth in range(1, 10):
        # |A|=|B|=N, |A&B| chosen so J = inter/(2N-inter) = tenth/10
        inter = int(round(2 * N * tenth / (10 + tenth)))
        sa = {f"s{i}" for i in range(N)}
        sb = {f"s{i}" for i in range(inter)} | {f"u{tenth}_{i}" for i in range(N - inter)}
        exact_j = len(sa & sb) / len(sa | sb)
        ka = sorted(_h60(t) for t in sa)[:KQ]
        kb = sorted(_h60(t) for t in sb)[:KQ]
        un = sorted(set(ka) | set(kb))[:KQ]
        isect = set(ka) & set(kb)
        est_j = len([h for h in un if h in isect]) / len(un)
        errs.append(abs(est_j - exact_j))
    out["sketch_kmv_overlap"] = {
        "metric": f"max |Jaccard est - truth|, synthetic sets n={N} J=0.1..0.9 at k={KQ} "
        "(registered query is exact-regime on test data: shared 31-token vocab)",
        "value": round(max(errs), 4),
    }

    # JL projection: distance-distortion of the registered 64->8
    # Rademacher projection over a bounded pair sample. For entries ±1,
    # E||Pv||^2 = out_dim * ||v||^2, so the scaled squared-distance ratio
    # concentrates at 1; report median and p90 |ratio - 1|.
    proj = {
        r.vec_id: [r[f"p{j}"] for j in range(8)]
        for r in reg["vector_jl_projection"].fn(spark, sf_dir).where(F.col("vec_id") < 100).collect()
    }
    orig = {
        r.vec_id: list(r.v)
        for r in emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .where(F.col("vec_id") < 100).collect()
    }
    ratios = []
    ids = sorted(orig)
    for a, b in _it.combinations(ids, 2):
        d_o = sum((x - y) ** 2 for x, y in zip(orig[a], orig[b]))
        d_p = sum((x - y) ** 2 for x, y in zip(proj[a], proj[b]))
        if d_o > 0:
            ratios.append(abs(d_p / (8.0 * d_o) - 1.0))
    ratios.sort()
    out["vector_jl_projection"] = {
        "metric": "pairwise sq-distance distortion |ratio-1| (median / p90), 4950 pairs",
        "value": [round(ratios[len(ratios) // 2], 4), round(ratios[int(len(ratios) * 0.9)], 4)],
    }

    # aHash dedup: cluster precision/recall vs ground-truth EXACT image
    # duplicates (identical source bytes => identical PNG => identical
    # pixels). Recall must be 1.0 (equal pixels hash equal); precision
    # measures perceptual-collision rate of the 64-bit hash at 16x16.
    from gridmr_spark.operators.multimodal import encode_png_media, image_ahash

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hashed = image_ahash(encode_png_media(docs.select("doc_id", "text"), "doc_id", "text", width=16))
    hrows = hashed.join(docs.select("doc_id", F.md5("text").alias("tmd5")), "doc_id").collect()
    from collections import Counter

    by_hash = Counter((r.ahash_hi, r.ahash_lo) for r in hrows)
    by_true = Counter(r.tmd5 for r in hrows)
    by_joint = Counter(((r.ahash_hi, r.ahash_lo), r.tmd5) for r in hrows)
    p_hash = sum(n * (n - 1) // 2 for n in by_hash.values())
    p_true = sum(n * (n - 1) // 2 for n in by_true.values())
    p_joint = sum(n * (n - 1) // 2 for n in by_joint.values())
    out["multimodal_image_ahash_dedup"] = {
        "metric": "pairwise precision / recall vs exact-duplicate images",
        "value": [
            round(p_joint / p_hash, 4) if p_hash else 1.0,
            round(p_joint / p_true, 4) if p_true else 1.0,
        ],
    }

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
