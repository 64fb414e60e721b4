#!/usr/bin/env python3
"""Compare a bench.py JSON record against BASELINE.md's per-query rows.

Usage: python tools/bench_compare.py BENCH_r03_local.json

Prints queries exceeding the 2x regression bar (with >0.5 s absolute
slack to ignore sub-second jitter) and the total ratio. Exit code 1 if any
query trips the bar — wire into CI or run before committing perf-touching
changes.
"""

from __future__ import annotations

import json
import re
import sys


def baseline_rows(path: str = "BASELINE.md") -> dict[str, float]:
    rows: dict[str, float] = {}
    for line in open(path):
        m = re.match(r"\| (\w+) \| ([\d.]+) \|$", line.strip())
        if m:
            rows[m.group(1)] = float(m.group(2))
    return rows


def main() -> int:
    bench = json.load(open(sys.argv[1]))
    base = baseline_rows()
    bad = []
    for name, t in bench["queries"].items():
        b = base.get(name)
        if b and t > 2 * b and t - b > 0.5:
            bad.append((name, t, b, round(t / b, 2)))
    tot_base = sum(base.get(n, 0.0) for n in bench["queries"])
    print(f"queries: {len(bench['queries'])}  errors: {bench.get('errors')}")
    print(f"total: {bench['value']:.1f}s  baseline-sum: {tot_base:.1f}s  "
          f"ratio: {bench['value'] / tot_base:.3f}")
    for name, t, b, r in sorted(bad, key=lambda x: -x[3]):
        print(f"  REGRESSION {name}: {t:.2f}s vs baseline {b:.2f}s = {r}x")
    if not bad:
        print("no query exceeds the 2x bar")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
