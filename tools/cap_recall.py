#!/usr/bin/env python3
"""Measure the streaming near-dup ``cap`` dial's candidate-pair recall
(BASELINE.md §D): exact (cap=None) vs capped pair sets over the
`minhash_bands_stateless` buckets, using the rank closed form — with
id-ordered arrival, pair (a, b), a<b, is emitted iff a's bucket arrival
rank <= cap (proven equal to BandPairProcessor's semantics in
tests/test_stream_neardup.py::test_cap_recall_closed_form_matches_processor).

Usage:
    python tools/cap_recall.py [SF_DIR ...]       # default: sf0.1 + .scale/sf1
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CAPS = [4, 8, 16]


def measure(spark, sf_dir: str) -> dict:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gridmr_spark.catalog import load_table
    from gridmr_spark.streaming.neardup import minhash_bands_stateless

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    b = minhash_bands_stateless(docs, "doc_id", "text")
    w = Window.partitionBy("band_id", "band_hash").orderBy("id")
    ranked = b.withColumn("rk", F.row_number().over(w)).localCheckpoint()

    def npairs(cap: int | None) -> int:
        left = ranked.where(F.col("rk") <= cap) if cap else ranked
        right = ranked.select(
            F.col("band_id").alias("bb"),
            F.col("band_hash").alias("bh"),
            F.col("id").alias("id2"),
        )
        return (
            left.join(
                right,
                (F.col("band_id") == F.col("bb"))
                & (F.col("band_hash") == F.col("bh"))
                & (F.col("id2") > F.col("id")),
            )
            .select("id", "id2")
            .distinct()
            .count()
        )

    exact = npairs(None)
    out: dict = {"exact_pairs": exact}
    for c in CAPS:
        p = npairs(c)
        out[f"cap={c}"] = {"pairs": p, "recall": round(p / exact, 4) if exact else 1.0}
    return out


def main() -> None:
    from gridmr_spark.session import get_spark

    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", ".scale/sf1"]
    spark = get_spark("cap_recall")
    spark.sparkContext.setLogLevel("ERROR")
    import json

    for d in dirs:
        print(json.dumps({d: measure(spark, d)}))


if __name__ == "__main__":
    main()
