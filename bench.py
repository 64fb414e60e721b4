#!/usr/bin/env python3
"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}. Stdout carries a COMPACT record
(total + 40 slowest + md5 of the full record) sized to survive the
driver's stdout-tail buffer intact; the FULL per-query map is written to
BENCH_local.json (committed at the same HEAD).

Protocol (BASELINE.md §B): one discarded warm-up execution per query, then
TWO timed runs, recording the MIN — single-shot sweeps exhibit transient
2-6x outliers on sub-second queries (scheduler/GC noise), and best-observed
is the standard timing-noise rejector; the baseline table uses a 3-run
median under idle conditions, so min-of-2 compares fairly against it.
Execution is forced through the noop sink so the full plan (including
projections a count() would prune) runs; nothing is collected to the
driver.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from gridmr_spark.queries import load_all
    from gridmr_spark.session import get_spark

    spark = get_spark("gridmr_bench")
    registry = load_all()

    def run_once(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # Per-query fault tolerance: one broken query must never zero out the
    # round's perf record — record its error and keep going.
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in sorted(registry):
        q = registry[name]
        try:
            run_once(q.fn)  # warm-up (JIT, code cache, FS cache) — discarded
            timings[name] = round(min(run_once(q.fn), run_once(q.fn)), 3)
        except Exception as exc:  # noqa: BLE001 — harness boundary
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    record = {
        "metric": f"total wall sec for {len(timings)} queries at sf{sf} (warm)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        record["errors"] = errors
    line = json.dumps(record)
    # The FULL record goes to a file; stdout gets a COMPACT line that fits
    # the driver's ~2 KB stdout-tail buffer whole. Rationale (round-10 fix
    # for BENCH_rNN self-containment): the full per-query map is ~8 KB at
    # 258 queries, so printing it guaranteed the driver's `tail` truncated
    # mid-object and its `parsed` field stayed null every round. A compact
    # line — total, count, the 40 slowest rows (the ones perf review
    # actually reads), any errors, and the md5 of the full record — parses
    # completely from the tail, and `full_md5` ties it to the
    # BENCH_local.json committed at the same HEAD for whole-map diffs.
    # Default full-record path is the TRACKED repo-root BENCH_local.json
    # (committed alongside BASELINE.md §C re-stamps, per its protocol);
    # set SPARK_GRAFT_BENCH_OUT for scratch runs.
    out_path = os.environ.get("SPARK_GRAFT_BENCH_OUT") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_local.json"
    )
    with open(out_path, "w") as fh:
        fh.write(line + "\n")
    import hashlib

    slowest = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:40]
    )
    compact = {
        "metric": record["metric"],
        "value": record["value"],
        "unit": "sec",
        "sf": record["sf"],
        "n_queries": len(timings),
        "queries": slowest,
        "queries_note": "40 slowest; full map in BENCH_local.json (same commit)",
        "full_md5": hashlib.md5(line.encode()).hexdigest(),
    }
    if errors:
        # errors must not blow the size budget on exactly the rounds that
        # have them: names + a short excerpt of the first two; full
        # messages live in BENCH_local.json
        compact["n_errors"] = len(errors)
        compact["errors"] = {
            k: errors[k][:120] for k in sorted(errors)[:2]
        }
        if len(errors) > 2:
            compact["errors_note"] = "first 2 shown; all in BENCH_local.json"
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
