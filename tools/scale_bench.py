#!/usr/bin/env python3
"""Measure per-query scaling exponents: run the N most expensive queries at
two scale factors and report alpha = log(t_hi / t_lo) / log(rows_hi/rows_lo).

alpha ~ 1 is linear scaling, < 1 sublinear (fixed overhead amortizing or
candidate-bounded plans), > 1 superlinear (a shuffle/candidate volume
growing faster than input — the thing to catch before 100 TB).

Usage:
    python tools/scale_bench.py LO_DIR HI_DIR RATIO [query ...]
    # default query set: the top-20 by BENCH_r04_local.json time
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "similarity_near_pairs", "similarity_lsh_topk", "graph_pagerank",
    "fuzzy_levenshtein_pairs", "dedup_clusters_cc", "dedup_incremental_minhash",
    "pipeline_training_data", "dedup_simhash", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "similarity_ivf_topk", "dq_profile_columns",
    "join_salted_skew", "layout_bucketed_join", "graph_triangle_count",
    "dedup_embedding_cosine", "agg_winsorize", "graph_degree_distribution",
    "text_repetition_filters", "q21_waiting_suppliers",
]


def main() -> None:
    lo_dir, hi_dir, ratio = sys.argv[1], sys.argv[2], float(sys.argv[3])
    names = sys.argv[4:] or DEFAULT_QUERIES

    from gridmr_spark.queries import load_all
    from gridmr_spark.session import get_spark

    spark = get_spark("scale_bench")
    registry = load_all()

    def timed(fn, sf_dir) -> float:
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm-up
        return statistics.median(
            _once(fn, sf_dir) for _ in range(3)
        )

    def _once(fn, sf_dir) -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    out = {}
    for name in names:
        fn = registry[name].fn
        t_lo = timed(fn, lo_dir)
        t_hi = timed(fn, hi_dir)
        alpha = math.log(t_hi / t_lo) / math.log(ratio)
        out[name] = {"t_lo": round(t_lo, 3), "t_hi": round(t_hi, 3), "alpha": round(alpha, 2)}
        print(f"{name:32s} lo={t_lo:7.3f}s hi={t_hi:7.3f}s alpha={alpha:5.2f}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
