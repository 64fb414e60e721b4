#!/usr/bin/env python3
"""Phase-level wall profile of similarity_ivf_append (VERDICT r14 item 3):
replicates the registered query with a timer around each stage so the
32-core contention can be located in the job timeline rather than the plan.
Usage: SPARK_GRAFT_CPUS=N python tools/r15_profile_ivf.py
"""

from __future__ import annotations

import hashlib
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import functions as F

    from gridmr_spark.catalog import load_table, table_rows
    from gridmr_spark.operators.ann_index import PersistedIVF
    from gridmr_spark.queries.vector import _fold_rerank
    from gridmr_spark.session import get_spark

    spark = get_spark("r15_profile_ivf")
    emb = load_table(spark, sf_dir, "embeddings")
    n = table_rows(sf_dir, "embeddings")
    k_cells = max(4, math.ceil(math.sqrt(max(n, 1))))
    key = hashlib.md5(f"{sf_dir}:ivfappend".encode()).hexdigest()[:12]
    path = os.path.join(tempfile.gettempdir(), f"gridmr_ivf_append_{key}")

    def run(tag: str) -> None:
        marks: list[tuple[str, float]] = []
        t0 = time.perf_counter()

        def mark(label: str) -> None:
            marks.append((label, time.perf_counter()))

        idx = PersistedIVF(k=k_cells, nprobe=k_cells, iters=4, seed=42, assign_n=2)
        shutil.rmtree(path, ignore_errors=True)
        mark("rmtree")
        centroids = idx.idx.fit_centroids(emb.where(F.col("vec_id") % 2 == 0), "embedding")
        mark("fit_centroids")
        idx.build(
            emb.where(F.col("vec_id") % 2 == 0), "vec_id", "embedding", path,
            centroids=centroids,
        )
        mark("build(assign+write)")
        idx.append(emb.where(F.col("vec_id") % 2 == 1), "vec_id", "embedding", path)
        mark("append")
        sel = idx.search(
            spark, emb.select("vec_id", "embedding"), "vec_id", "embedding", path, k=8
        )
        mark("search(plan)")
        _fold_rerank(sel, emb, k=5, q_col="qid", c_col="cid").write.format(
            "noop"
        ).mode("overwrite").save()
        mark("search+rerank exec")
        prev = t0
        print(f"--- {tag} (cpus={spark.sparkContext.defaultParallelism}) ---")
        for label, t in marks:
            print(f"{label:24s} {t - prev:7.3f}s")
            prev = t
        print(f"{'TOTAL':24s} {prev - t0:7.3f}s", flush=True)

    run("warmup")
    run("timed-1")
    run("timed-2")


if __name__ == "__main__":
    main()
