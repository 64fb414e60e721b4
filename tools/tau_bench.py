#!/usr/bin/env python3
"""Measure the tau (Jaccard threshold) dial for the survivorship/split
family on a DUP-DENSE corpus — the lever SCALING.md names for corpora
whose near-dup clique density grows with scale (VERDICT r10 item 6).

For each tau in {1/2, 4/5} and each SF dir, times (3-run median through
the noop sink, one discarded warm-up):
  - keep_best:   the full dedup_keep_best plan at that tau
  - leakage:     the pipeline_leakage_safe_split plan at that tau
and reports per-tau alphas = log(t_hi/t_lo) / log(ratio).

Usage:
    python tools/tau_bench.py LO_DIR HI_DIR RATIO
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TAUS = [(1, 2), (4, 5)]


def main() -> None:
    lo_dir, hi_dir, ratio = sys.argv[1], sys.argv[2], float(sys.argv[3])

    from pyspark.sql import functions as F

    from gridmr_spark.catalog import load_table
    from gridmr_spark.queries.setsim import (
        _near_dup_components,
        keep_best_survivorship,
    )
    from gridmr_spark.session import get_spark

    spark = get_spark("tau_bench")

    def split_plan(docs, tn, td):
        comp = _near_dup_components(docs, tau_num=tn, tau_den=td)
        h = (
            F.conv(F.substring(F.md5(F.col("cluster_id").cast("string")), 1, 15), 16, 10)
            .cast("long") % 10
        )
        return comp.select(
            F.col("id").alias("doc_id"), "cluster_id",
            F.when(h < 8, F.lit("train")).otherwise(F.lit("val")).alias("split"),
        )

    def timed(make, sf_dir) -> float:
        def once() -> float:
            docs = load_table(spark, sf_dir, "documents")
            t0 = time.perf_counter()
            make(docs).write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        once()  # warm-up, discarded
        return round(statistics.median(once() for _ in range(3)), 3)

    out: dict[str, dict] = {}
    for tn, td in TAUS:
        for name, make in (
            ("keep_best", lambda d, tn=tn, td=td: keep_best_survivorship(d, tau_num=tn, tau_den=td)),
            ("leakage_split", lambda d, tn=tn, td=td: split_plan(d, tn, td)),
        ):
            t_lo = timed(make, lo_dir)
            t_hi = timed(make, hi_dir)
            alpha = round(math.log(t_hi / t_lo) / math.log(ratio), 2)
            out[f"{name}@tau={tn}/{td}"] = {
                "t_lo": t_lo, "t_hi": t_hi, "alpha": alpha,
            }
            print(f"# {name} tau={tn}/{td}: lo={t_lo}s hi={t_hi}s alpha={alpha}",
                  file=sys.stderr)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
