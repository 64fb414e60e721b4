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
