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
    q = emb.select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    c = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    exact_all = pairs(cosine_topk(q, c, k=5), "q_id", "c_id")

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

    # Persisted-index twins (round 6): search from on-disk artifacts is
    # row-exact to the in-memory operators (tests/test_ann_index.py), so
    # these recalls must match similarity_pq_topk / similarity_ivf_topk.
    out["similarity_pq_persisted"] = {
        "metric": "recall@5 vs exact",
        "value": round(recall(pairs(reg["similarity_pq_persisted"].fn(spark, sf_dir), "qid", "cid"), exact_lt1000), 4),
    }
    out["similarity_ivf_persisted"] = {
        "metric": "recall@5 vs exact",
        "value": round(recall(pairs(reg["similarity_ivf_persisted"].fn(spark, sf_dir), "qid", "cid"), exact_all), 4),
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

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
