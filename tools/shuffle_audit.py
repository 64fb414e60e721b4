#!/usr/bin/env python3
"""Record measured shuffle volume for headline queries (plans/shuffle.py).

Prints a markdown table (PLANS.md section "Measured shuffle volume") of
shuffle write bytes/records per query at $SPARK_GRAFT_SF_DIR (default
sf0.1). Byte counts are a property of the plan + data, not the machine,
so this is reproducible evidence — the runtime complement of the static
plan audit.

Usage: python tools/shuffle_audit.py [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "filter_project", "wordcount", "q1_pricing_summary",
    "join_star_revenue", "q3_shipping_priority",
    "dedup_exact", "dedup_exact_digest", "dedup_minhash_lsh",
    "similarity_lsh_topk", "dedup_semdedup",
    "crawl_url_canonical_dedup", "pipeline_crawl_to_corpus",
    "sample_temperature_mixture",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or DEFAULT

    from gridmr_spark.plans.shuffle import measure_shuffle
    from gridmr_spark.queries import load_all
    from gridmr_spark.session import get_spark

    spark = get_spark("shuffle_audit")
    registry = load_all()

    print("| Query | stages | shuffle write | records |")
    print("|---|---|---|---|")
    for name in names:
        df = registry[name].fn(spark, sf_dir)
        st = measure_shuffle(spark, df)
        print(
            f"| {name} | {st.n_stages} | {st.write_bytes:,} B "
            f"| {st.write_records:,} |"
        )


if __name__ == "__main__":
    main()
