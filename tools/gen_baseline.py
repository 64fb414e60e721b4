#!/usr/bin/env python3
"""Regenerate BASELINE.md §C: the per-query performance reference table.

Protocol (stamped in §C): every registered query at sf0.1 on
local[$SPARK_GRAFT_CPUS], one discarded warm-up execution, then THREE timed
runs — the MEDIAN is recorded, which damps the transient scheduler/GC noise
a single-shot sweep exhibits (observed: isolated re-times of single-run
outliers routinely land at a third of the sweep number). Execution forces
the full plan through the noop sink; nothing is collected.

Usage:
    python tools/gen_baseline.py                 # full §C table to stdout
    python tools/gen_baseline.py NAME [NAME...]  # isolated re-time of just
                                                 # those queries (same
                                                 # warm-up + 3-run-median
                                                 # protocol) — the tool for
                                                 # re-stamping single rows
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from gridmr_spark.queries import load_all
    from gridmr_spark.session import get_spark

    spark = get_spark("gen_baseline")
    registry = load_all()

    def run_once(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    names = sys.argv[1:]
    unknown = [n for n in names if n not in registry]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    timings: dict[str, float] = {}
    for name in names or sorted(registry):
        fn = registry[name].fn
        run_once(fn)  # warm-up, discarded
        timings[name] = round(statistics.median(run_once(fn) for _ in range(3)), 3)
        print(f"# {name} {timings[name]}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    lines = ["| Query | sec (sf0.1, warm) |", "|---|---|"]
    lines += [f"| {n} | {t} |" for n, t in sorted(timings.items())]
    lines.append(f"| **TOTAL ({len(timings)} queries)** | **{total}** |")
    print("\n".join(lines))
    with open("/tmp/gen_baseline.json", "w") as fh:
        json.dump({"total": total, "queries": timings}, fh)


if __name__ == "__main__":
    main()
