#!/usr/bin/env python3
"""Round-15 optimization measurement harness.

Usage:
    python tools/r15_measure.py time NAME [NAME...]      # warm-up + 3-run
                                                         # median per query
    python tools/r15_measure.py plan SUFFIX NAME [...]   # write
                                                         # plans/r15/<name>_<SUFFIX>.txt
    python tools/r15_measure.py jobs NAME [NAME...]      # Spark job count
                                                         # per query run

`time` follows BASELINE.md §C's isolated protocol (noop sink, median of 3).
`plan` writes .explain("formatted") output; note that queries whose
construction runs eager actions (localCheckpoint loops) execute those
during capture — the recorded plan is the final composed plan, which is
what the driver's noop sink ultimately executes.
`jobs` counts jobs via the status tracker delta — the metric the round's
job-count optimizations (CC probe fusion etc.) move.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mode = sys.argv[1]
    if mode == "plan":
        suffix, names = sys.argv[2], sys.argv[3:]
    else:
        suffix, names = "", sys.argv[2:]

    from gridmr_spark.queries import load_all
    from gridmr_spark.session import get_spark

    spark = get_spark("r15_measure")
    registry = load_all()
    unknown = [n for n in names if n not in registry]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    def run_once(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    if mode == "time":
        for name in names:
            fn = registry[name].fn
            spark.sparkContext.setJobDescription(f"r15_time:{name}")
            run_once(fn)  # warm-up
            med = statistics.median(run_once(fn) for _ in range(3))
            print(f"{name} {med:.3f}", flush=True)
    elif mode == "plan":
        outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15")
        os.makedirs(outdir, exist_ok=True)
        for name in names:
            df = registry[name].fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(outdir, f"{name}_{suffix}.txt")
            with open(path, "w") as fh:
                fh.write(txt)
            print(f"wrote {path}", flush=True)
    elif mode == "jobs":
        sc = spark.sparkContext
        for name in names:
            fn = registry[name].fn
            run_once(fn)  # warm-up so lazy one-time init doesn't count
            group = f"r15jobs_{name}"
            sc.setJobGroup(group, name)
            run_once(fn)
            n_jobs = len(sc.statusTracker().getJobIdsForGroup(group) or [])
            sc.setJobGroup(None, None)
            print(f"{name} jobs={n_jobs}", flush=True)
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
