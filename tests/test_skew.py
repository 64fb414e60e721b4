"""Salted-join exactness: the salt must reshape the shuffle, never the
result. (agg_salted_skew's equality is oracle-covered; this is the join.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from gridmr_spark.catalog import load_table
from gridmr_spark.operators.skew import salted_join


def test_salted_join_equals_plain_join(spark, sf_oracle):
    li = load_table(spark, sf_oracle, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_linenumber", "l_extendedprice"
    )
    orders = load_table(spark, sf_oracle, "orders").select("o_orderkey", "o_orderpriority")
    plain = li.join(orders, "o_orderkey")
    salted = salted_join(li, orders, on=["o_orderkey"], n_salts=8, salt_source="l_linenumber")
    cols = sorted(set(plain.columns))
    as_rows = lambda df: sorted(map(tuple, df.select(*cols).collect()))  # noqa: E731
    assert as_rows(salted) == as_rows(plain)
    # different salt counts must not change the result either
    salted3 = salted_join(li, orders, on=["o_orderkey"], n_salts=3, salt_source="l_linenumber")
    assert as_rows(salted3) == as_rows(plain)
