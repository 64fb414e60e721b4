"""Measure ManifestTable METADATA cost as file count grows 10x at fixed
group count — the two-level-manifest scale claim (round 10).

Builds two tables with the same number of commits (groups) but 10x the
files per commit, then measures, on a COLD instance each time:

- snapshot_manifest_bytes: size of the latest published snapshot JSON —
  the metadata a commit must rewrite; O(#groups) by design, so it should
  be ~flat across the 10x file growth (the single-level format paid
  O(#files) here, growing 10x);
- probe_group_opens / probe_seconds: group manifests opened and wall time
  for a one-commit-range pruned_files probe — O(matching groups), flat;
- history_seconds: DESCRIBE HISTORY wall time — snapshot manifests only,
  flat;
- full_resolve_seconds: resolving the complete file list (what any FULL
  scan needs) — this one is honestly O(#files) and should grow ~10x; it
  is the floor any format pays to enumerate every file.

Usage: python tools/manifest_scale.py [workdir]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gridmr_spark.sources.table_format import ManifestTable  # noqa: E402

N_COMMITS = 12
ROWS_PER_COMMIT = 2000


def build(spark, root: str, files_per_commit: int) -> ManifestTable:
    t = ManifestTable(root)
    for c in range(N_COMMITS):
        base = c * ROWS_PER_COMMIT
        df = spark.range(base, base + ROWS_PER_COMMIT).withColumnRenamed("id", "k")
        t.commit(df.repartitionByRange(files_per_commit, "k"))
    return t


def measure(root: str) -> dict:
    t = ManifestTable(root)  # cold caches
    cur = t.current_version()
    mpath = os.path.join(t._mdir, f"v{cur:05d}.json")
    out = {"snapshot_manifest_bytes": os.path.getsize(mpath)}

    # probe inside commit 6's key range only
    lo = 6 * ROWS_PER_COMMIT + 10
    t_probe = ManifestTable(root)
    t0 = time.perf_counter()
    files = t_probe.pruned_files("k", lo=lo, hi=lo + 50)
    out["probe_seconds"] = round(time.perf_counter() - t0, 5)
    out["probe_group_opens"] = t_probe.group_opens
    out["probe_files"] = len(files)

    t_hist = ManifestTable(root)
    t0 = time.perf_counter()
    n = sum(1 for _ in t_hist.versions())
    for v in t_hist.versions():
        t_hist._raw(v)
    out["history_seconds"] = round(time.perf_counter() - t0, 5)
    out["n_versions"] = n

    t_full = ManifestTable(root)
    t0 = time.perf_counter()
    all_files = t_full._manifest(cur)["files"]
    out["full_resolve_seconds"] = round(time.perf_counter() - t0, 5)
    out["n_files"] = len(all_files)
    return out


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="mscale-")
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    res = {}
    for label, fpc in (("x1", 8), ("x10", 80)):
        root = os.path.join(work, f"tbl_{label}")
        if os.path.isdir(root):
            shutil.rmtree(root)
        build(spark, root, fpc)
        # best-of-3 for the timing fields (cold instance each run)
        runs = [measure(root) for _ in range(3)]
        best = dict(runs[0])
        for k in ("probe_seconds", "history_seconds", "full_resolve_seconds"):
            best[k] = min(r[k] for r in runs)
        res[label] = best
    res["manifest_bytes_ratio"] = round(
        res["x10"]["snapshot_manifest_bytes"] / res["x1"]["snapshot_manifest_bytes"], 3
    )
    res["probe_opens_ratio"] = (
        res["x10"]["probe_group_opens"] / max(1, res["x1"]["probe_group_opens"])
    )

    # rewrite_manifests demo: a LONG-LIVED table (many commits => many
    # group entries) before/after metadata compaction — the snapshot
    # manifest shrinks and a probe touches fewer group manifests, with
    # zero data movement.
    root = os.path.join(work, "tbl_longlived")
    if os.path.isdir(root):
        shutil.rmtree(root)
    t = ManifestTable(root)
    for c in range(120):
        base = c * 100
        t.commit(
            spark.range(base, base + 100).withColumnRenamed("id", "k").coalesce(1)
        )
    before = measure_probe(root, lo=6000 * 1 + 10)
    v = t.rewrite_manifests(target_groups=4)
    after = measure_probe(root, lo=6000 * 1 + 10)
    res["longlived_120_commits"] = {
        "before": before,
        "after_rewrite_manifests_4": after,
        "new_version": v,
    }
    print(json.dumps(res))


def measure_probe(root: str, lo: int) -> dict:
    t = ManifestTable(root)  # cold caches
    cur = t.current_version()
    mpath = os.path.join(t._mdir, f"v{cur:05d}.json")
    t0 = time.perf_counter()
    files = t.pruned_files("k", lo=lo, hi=lo + 50)
    return {
        "snapshot_manifest_bytes": os.path.getsize(mpath),
        "n_groups": len(t._raw(cur)["groups"]),
        "probe_group_opens": t.group_opens,
        "probe_seconds": round(time.perf_counter() - t0, 5),
        "probe_files": len(files),
    }


if __name__ == "__main__":
    main()
