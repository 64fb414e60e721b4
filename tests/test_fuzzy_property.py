"""Property tests (hypothesis) for the symmetric-deletion blocking
invariant that fuzzy_blocked_pairs / fuzzy_levenshtein_pairs rely on:

    lev(a, b) <= d  =>  deletion-neighborhood_d(a) ∩ neighborhood_d(b) != ∅

The Spark operator (operators/text.symdelete_fuzzy_pairs) is an equi-join
on these neighborhoods plus an exact DP verify, so this invariant IS its
completeness proof; the DuckDB oracle then re-proves it on real data. Here
hypothesis hammers the pure invariant over adversarial small strings
(short lengths + tiny alphabet maximize tricky indel alignments), and one
Spark round-trip checks an adversarial fixed set end-to-end."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _neigh(s: str, d: int) -> set[str]:
    out = {s}
    frontier = {s}
    for _ in range(d):
        nxt = set()
        for v in frontier:
            for i in range(len(v)):
                nxt.add(v[:i] + v[i + 1 :])
        out |= nxt
        frontier = nxt
    return out


short = st.text(alphabet="ab", min_size=0, max_size=8)


@settings(max_examples=300, deadline=None)
@given(short, short, st.integers(min_value=1, max_value=2))
def test_symdelete_neighborhood_covers_lev_pairs(a, b, d):
    if _lev(a, b) <= d:
        assert _neigh(a, d) & _neigh(b, d), (a, b, d)


@settings(max_examples=300, deadline=None)
@given(short, short)
def test_lev_triangle_and_symmetry(a, b):
    assert _lev(a, b) == _lev(b, a)
    assert _lev(a, b) >= abs(len(a) - len(b))


def test_symdelete_spark_matches_bruteforce_adversarial(spark):
    """End-to-end on an adversarial fixed set (indels, shifts, repeats):
    the Spark blocked matcher must return EXACTLY the brute-force dist<=2
    pair set."""
    from gridmr_spark.operators.text import symdelete_fuzzy_pairs

    names = [
        "abab", "abba", "aabb", "abb", "ab", "ba", "a", "b", "",
        "abcdefgh", "abcdefg", "bcdefgh", "abcdeXgh", "Xabcdefg",
        "aaaa", "aaa", "aaab", "baaa",
    ]
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "id long, name string"
    )
    got = {
        (r.id1, r.id2, r.dist)
        for r in symdelete_fuzzy_pairs(df, "id", "name", max_dist=2).collect()
    }
    want = {
        (i, j, _lev(a, b))
        for i, a in enumerate(names)
        for j, b in enumerate(names)
        if i < j and _lev(a, b) <= 2
    }
    assert got == want


def test_trigram_lm_interpolation_bounds(spark, sf_oracle):
    """The mixture is a convex combination of probabilities in (0, 1], so
    every per-doc average log-prob lies in (ln(0.05/N), 0]; and the score
    is deterministic across runs."""
    import math

    from pyspark.sql import functions as F

    from gridmr_spark.queries.textops import text_trigram_lm_interpolated

    df = text_trigram_lm_interpolated(spark, sf_oracle)
    rows = df.collect()
    assert rows
    n_total = df.agg(F.sum("n_trigrams")).collect()[0][0]
    lower = math.log(0.05 / n_total) * 1e9
    for r in rows:
        avg_q = r.sum_qlog / r.n_trigrams
        assert lower < avg_q <= 0
    again = {r.doc_id: r.sum_qlog for r in text_trigram_lm_interpolated(spark, sf_oracle).collect()}
    assert again == {r.doc_id: r.sum_qlog for r in rows}
