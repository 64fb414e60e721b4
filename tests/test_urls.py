"""Unit tests for operators/urls.py: canonicalization rules on hand-written
edge cases (expected literals), plus Spark↔DuckDB renderer agreement on the
same inputs — the drift check the shared-spec design promises."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from gridmr_spark.operators import urls as U

# (raw, expected canonical) — one probe per rule
CASES = [
    # scheme+host lowercase, fragment dropped
    ("HTTP://WWW.Example.COM/a#frag", "http://www.example.com/a"),
    # trailing host dot
    ("http://example.com./a", "http://example.com/a"),
    # default ports strip; scheme-mismatched or odd ports survive
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:443/a", "http://example.com:443/a"),
    ("https://example.com:8443/a", "https://example.com:8443/a"),
    # path: dup slashes, index file, trailing slash, empty path
    ("http://example.com//a///b//", "http://example.com/a/b"),
    ("http://example.com/a/index.html", "http://example.com/a"),
    ("http://example.com/a/index.htm", "http://example.com/a"),
    ("http://example.com/index.html", "http://example.com/"),
    ("http://example.com", "http://example.com/"),
    ("http://example.com/", "http://example.com/"),
    # query: tracking filtered, params sorted, bare '?' dropped
    ("http://example.com/a?utm_source=x&b=2&a=1", "http://example.com/a?a=1&b=2"),
    ("http://example.com/a?gclid=1&fbclid=2&msclkid=3&ref=h&utm_x=1",
     "http://example.com/a"),
    ("http://example.com/a?", "http://example.com/a"),
    ("http://example.com/a?z=1&y=2&z=0", "http://example.com/a?y=2&z=0&z=1"),
    # fragment containing a '?' must not resurrect a query
    ("http://example.com/a#frag?fake=1", "http://example.com/a"),
    # index.html only strips as the LAST segment
    ("http://example.com/index.html/more", "http://example.com/index.html/more"),
]


@pytest.fixture(scope="module")
def canon_pairs(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], ["url"])
    rows = df.select(
        "url", U.canonical_url(F.col("url")).alias("canon")
    ).collect()
    return {r["url"]: r["canon"] for r in rows}


def test_spark_canonical_expected(canon_pairs):
    for raw, want in CASES:
        assert canon_pairs[raw] == want, raw


def test_duckdb_renderer_agrees(canon_pairs):
    con = duckdb.connect()
    for raw, want in CASES:
        lit = "'" + raw.replace("'", "''") + "'"
        got = con.sql(f"SELECT {U.canonical_url_sql(lit)}").fetchone()[0]
        assert got == want == canon_pairs[raw], raw


def test_url_host(spark):
    df = spark.createDataFrame(
        [("https://Sub.Example.COM.:8443/x?q=1#f",)], ["url"]
    )
    assert df.select(U.url_host(F.col("url"))).first()[0] == "sub.example.com"


def test_canonical_is_idempotent(spark, canon_pairs):
    """canonical(canonical(u)) == canonical(u) — the fixed-point property a
    frontier needs when re-ingesting its own output."""
    df = spark.createDataFrame([(c,) for c in set(canon_pairs.values())], ["url"])
    rows = df.select("url", U.canonical_url(F.col("url")).alias("c2")).collect()
    for r in rows:
        assert r["c2"] == r["url"]


def test_synth_fixture_collapses_groups(spark):
    """Every messy spelling of page p must canonicalize to ONE URL, and
    distinct pages must stay distinct (canonical key == page identity)."""
    ids = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    got = (
        ids.select(
            (F.col("doc_id") % 97).alias("p"),
            U.canonical_url(U.synth_url(F.col("doc_id"))).alias("canon"),
        )
        .groupBy("p")
        .agg(F.count_distinct("canon").alias("n"))
        .collect()
    )
    assert len(got) == 97
    assert all(r["n"] == 1 for r in got)
