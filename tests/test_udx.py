"""UDX surface: UDTF vs built-in explode equality, salted agg vs plain
groupBy, and the bucketed-write co-located join (no shuffle before SMJ)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gridmr_spark.queries import load_all
from gridmr_spark.testing import plan_string

REG = load_all()


def test_udtf_matches_builtin_explode(spark, sf_oracle):
    udtf_rows = sorted(
        (r.doc_id, r.token) for r in REG["udtf_tokenize"].fn(spark, sf_oracle).collect()
    )
    docs = spark.read.parquet(f"{sf_oracle}/documents.parquet").where("doc_id < 50")
    builtin = docs.select(
        "doc_id",
        F.explode(
            F.split(F.lower(F.regexp_replace("text", "[^a-zA-Z0-9]+", " ")), " ")
        ).alias("token"),
    ).where("token <> ''")
    builtin_rows = sorted((r.doc_id, r.token) for r in builtin.collect())
    assert udtf_rows == builtin_rows


def test_salted_agg_equals_plain_groupby(spark, sf_oracle):
    li = spark.read.parquet(f"{sf_oracle}/lineitem.parquet")
    plain = {
        r.l_returnflag: (r.n, float(r.s))
        for r in li.groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("s"))
        .collect()
    }
    salted = {
        r.l_returnflag: (r.n_items, r.sum_qty)
        for r in REG["agg_salted_skew"].fn(spark, sf_oracle).collect()
    }
    assert plain == salted


def test_bucketed_join_skips_shuffle(spark, sf_oracle, tmp_path):
    """bucketBy co-location: a join between two tables bucketed on the same
    key plans WITHOUT a shuffle exchange on either side — the pre-shuffle
    strategy for repeated fact-fact joins at 100 TB."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        li = spark.read.parquet(f"{sf_oracle}/lineitem.parquet").select(
            "l_orderkey", "l_quantity"
        )
        orders = spark.read.parquet(f"{sf_oracle}/orders.parquet").select(
            "o_orderkey", "o_totalprice"
        )
        # external tables (explicit path) — warehouse.dir is a static conf
        li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey").option(
            "path", str(tmp_path / "b_li")
        ).saveAsTable("b_li")
        orders.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey").option(
            "path", str(tmp_path / "b_orders")
        ).saveAsTable("b_orders")
        joined = spark.table("b_li").join(
            spark.table("b_orders"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = plan_string(joined, "simple")
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan  # bucketing removed both shuffles
        assert joined.count() == spark.read.parquet(f"{sf_oracle}/lineitem.parquet").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.sql("DROP TABLE IF EXISTS b_li")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_quantile_sketch_error_bound(spark, sf_oracle):
    """approx_percentile estimates must fall within the sketch's rank
    guarantee (rank error <= n/accuracy) of the exact percentile, and be
    deterministic across partitionings (the GK merge is order-insensitive
    for a fixed input set)."""
    from gridmr_spark.queries import load_all

    fn = load_all()["agg_quantile_sketch"].fn
    got = {r.event_type: r for r in fn(spark, sf_oracle).collect()}
    ev = spark.read.parquet(f"{sf_oracle}/events.parquet")
    for et, row in got.items():
        vals = sorted(r.value for r in ev.where(ev.event_type == et).select("value").collect())
        n = len(vals)
        tol = max(1, n // 10000 + 1)
        for p, est in ((0.5, row.p50), (0.9, row.p90), (0.99, row.p99)):
            target = int(p * (n - 1))
            lo = vals[max(0, target - tol)]
            hi = vals[min(n - 1, target + tol)]
            assert lo <= est <= hi, (et, p, est, lo, hi)
