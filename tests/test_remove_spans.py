"""ExactSubstr removal semantics (text_remove_duplicate_spans).

The measurement half (dedup_duplicate_spans) is oracle-gated; these tests pin
the REMOVAL contract on planted corpora where the expected cut is computable
by hand: the canonical first occurrence (min (doc_id, pos)) keeps its text,
every later occurrence of a repeated 10-gram loses the span.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F


def _run(spark, rows):
    import gridmr_spark.queries.textops as textops

    df = spark.createDataFrame(rows, "doc_id string, text string")
    df.createOrReplaceTempView("_rmspan_docs")

    # Re-run the query body against an in-memory frame by monkeypatching the
    # loader path: simplest is to inline the same pipeline via the public
    # function with a temp dir — instead we call the query fn's logic through
    # a tiny shim that swaps load_table.
    import gridmr_spark.catalog as catalog

    orig = catalog.load_table
    try:
        catalog.load_table = lambda s, d, t: df  # noqa: ARG005
        textops.load_table = catalog.load_table
        out = textops.text_remove_duplicate_spans(spark, "unused")
        return {r["doc_id"]: r.asDict() for r in out.collect()}
    finally:
        catalog.load_table = orig
        textops.load_table = orig


WORDS = "alpha bravo charlie delta echo foxtrot golf hotel india juliet".split()
DUP = " ".join(WORDS)  # exactly one 10-gram


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_keeper_is_min_doc_pos_and_later_occurrence_cut(spark):
    tail = "kilo lima mike november oscar papa quebec romeo sierra tango"
    rows = [("a", DUP), ("b", DUP + " " + tail)]
    got = _run(spark, rows)
    # doc a is the keeper (min doc_id): untouched
    assert got["a"]["removed_tokens"] == 0
    assert got["a"]["kept_digest"] == _md5(DUP)
    # doc b loses the duplicated 10-token span, keeps its unique tail...
    # but note b's text contains MORE repeated 10-grams than the planted one:
    # every 10-gram of b that also appears in a is just the one; windows
    # crossing the boundary are unique. So exactly tokens 0..9 are cut.
    assert got["b"]["removed_tokens"] == 10
    assert got["b"]["kept_digest"] == _md5(tail)


def test_within_doc_repeat_keeps_first(spark):
    rows = [("solo", DUP + " " + DUP)]
    got = _run(spark, rows)
    # 20 tokens; second occurrence of the 10-gram is cut. The crossing
    # windows (positions 1..10) are unique (wrap-around sequences), so the
    # removal is exactly positions 10..19 — EXCEPT the crossing windows
    # repeat nothing, but positions 1..10 windows like "bravo..alpha" occur
    # once. Removal = the 10-gram at pos 10 plus any other duplicated
    # window; windows at pos 1..9 appear once each, window at pos 10 is the
    # duplicate. Cut = [10, 20).
    assert got["solo"]["n_tokens"] == 20
    assert got["solo"]["removed_tokens"] == 10
    assert got["solo"]["kept_digest"] == _md5(DUP)


def test_short_docs_pass_through(spark):
    rows = [("x", "one two three"), ("y", "")]
    got = _run(spark, rows)
    assert got["x"]["removed_tokens"] == 0
    assert got["x"]["kept_digest"] == _md5("one two three")
    assert got["y"]["n_tokens"] == 0
    assert got["y"]["kept_digest"] == _md5("")


def test_overlapping_spans_union_not_double_counted(spark):
    # Three docs sharing an 11-token run: in doc c the two duplicated
    # 10-grams (pos 0 and pos 1) overlap; union coverage is 11, not 20.
    run11 = DUP + " kilo"
    uniq = "uniq1 uniq2 uniq3 uniq4 uniq5 uniq6 uniq7 uniq8 uniq9 uniq10"
    rows = [("a", run11), ("c", run11 + " " + uniq)]
    got = _run(spark, rows)
    assert got["a"]["removed_tokens"] == 0
    assert got["c"]["removed_tokens"] == 11
    assert got["c"]["kept_digest"] == _md5(uniq)
