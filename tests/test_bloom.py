"""Bloom-filter corpus membership (operators/bloom.py): no false
negatives ever, false positives at the designed rate, mergeable builds."""

from __future__ import annotations

from pyspark.sql import functions as F

from gridmr_spark.operators.bloom import bloom_build, bloom_contains, bloom_merge

M, K = 2048, 3


def _keys(spark, lo, hi, tag=""):
    return spark.range(lo, hi).select(
        F.concat(F.lit(f"key{tag}-"), F.col("id").cast("string")).alias("k")
    )


def test_no_false_negatives(spark):
    members = _keys(spark, 0, 300)
    bloom = bloom_build(members, "k", M, K)
    out = bloom_contains(members, "k", bloom, M, K)
    assert out.where(~F.col("maybe_in_bloom")).count() == 0


def test_false_positive_rate_within_design(spark):
    members = _keys(spark, 0, 300)
    bloom = bloom_build(members, "k", M, K)
    probes = _keys(spark, 0, 3000, tag="out")  # fully disjoint key space
    fp = bloom_contains(probes, "k", bloom, M, K).where("maybe_in_bloom").count()
    # fill = 1-exp(-300*3/2048) ~ 0.356 => fp ~ 0.045; allow 3x headroom
    assert fp / 3000 <= 0.15
    # and the filter is not degenerate (some negatives resolve)
    assert fp < 3000


def test_merge_equals_whole_build(spark):
    a, b = _keys(spark, 0, 150), _keys(spark, 150, 300)
    merged = bloom_merge(bloom_build(a, "k", M, K), bloom_build(b, "k", M, K))
    whole = bloom_build(_keys(spark, 0, 300), "k", M, K)
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in whole.collect()}


def test_bitmap_is_bounded_and_words_in_range(spark):
    bloom = bloom_build(_keys(spark, 0, 500), "k", M, K)
    rows = bloom.collect()
    assert len(rows) <= M // 32
    assert all(0 <= r.word < M // 32 for r in rows)
    # 32-bit packing: every word value fits in the low 32 bits, positive
    assert all(0 <= r.bits < (1 << 32) for r in rows)


def test_membership_flag_is_deterministic(spark):
    members = _keys(spark, 0, 100)
    bloom = bloom_build(members, "k", M, K)
    probes = _keys(spark, 0, 1000, tag="x")
    r1 = {(r.k, r.maybe_in_bloom) for r in bloom_contains(probes, "k", bloom, M, K).collect()}
    r2 = {(r.k, r.maybe_in_bloom) for r in bloom_contains(probes, "k", bloom, M, K).collect()}
    assert r1 == r2


# -- count-min sketch ---------------------------------------------------------


def test_countmin_never_underestimates(spark):
    from gridmr_spark.operators.bloom import countmin_build, countmin_estimate

    # zipf-ish frequencies: key i appears (300 // (i+1)) times
    rows = [(f"k{i}",) for i in range(50) for _ in range(300 // (i + 1))]
    df = spark.createDataFrame(rows, "k string")
    exact = df.groupBy("k").count()
    for w, d in [(16, 2), (64, 4), (1024, 4)]:
        sk = countmin_build(df, "k", width=w, depth=d)
        est = countmin_estimate(exact, "k", sk, width=w, depth=d)
        bad = est.where(F.col("est") < F.col("count")).count()
        assert bad == 0, (w, d)


def test_countmin_wide_sketch_is_exact_and_bounded(spark):
    from gridmr_spark.operators.bloom import countmin_build, countmin_estimate

    rows = [(f"k{i % 20}",) for i in range(1000)]
    df = spark.createDataFrame(rows, "k string")
    exact = df.groupBy("k").count()
    sk = countmin_build(df, "k", width=4096, depth=4)
    est = countmin_estimate(exact, "k", sk, width=4096, depth=4)
    # 20 keys in 4096 columns: collisions essentially impossible => exact
    assert est.where(F.col("est") != F.col("count")).count() == 0
    # sketch size is bounded by geometry regardless of input size
    assert sk.count() <= 4096 * 4


def test_countmin_merge_equals_whole_build(spark):
    from gridmr_spark.operators.bloom import countmin_build

    rows = [(f"k{i % 7}",) for i in range(200)]
    df = spark.createDataFrame(rows, "k string")
    a = spark.createDataFrame(rows[:100], "k string")
    b = spark.createDataFrame(rows[100:], "k string")
    sa = countmin_build(a, "k", width=32, depth=3)
    sb = countmin_build(b, "k", width=32, depth=3)
    merged = (
        sa.unionByName(sb).groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))
    )
    whole = countmin_build(df, "k", width=32, depth=3)
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in whole.collect()}
