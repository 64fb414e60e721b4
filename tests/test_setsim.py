"""Prefix-filtered set-similarity join: losslessness, savings, edge cases."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from gridmr_spark.operators import setsim
from gridmr_spark.operators.dedup import word_shingles


def _brute_force(spark, docs, n, tau_num, tau_den):
    """The quadratic definition: all pairs, exact Jaccard, integer gate."""
    sh = word_shingles(docs, "doc_id", "text", n)
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("id").alias("id1"), "shingle")
    b = sh.select(F.col("id").alias("id2"), "shingle")
    common = (
        a.join(b, "shingle")
        .where(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.count("*").alias("c"))
    )
    j = common.join(
        sizes.select(F.col("id").alias("id1"), F.col("sz").alias("sz1")), "id1"
    ).join(sizes.select(F.col("id").alias("id2"), F.col("sz").alias("sz2")), "id2")
    union = F.col("sz1") + F.col("sz2") - F.col("c")
    return {
        (r.id1, r.id2, r.c)
        for r in j.where(F.col("c") * tau_den >= union * tau_num).collect()
    }


_DOCS = [
    # two exact duplicates
    (0, "alpha beta gamma delta epsilon zeta eta theta"),
    (1, "alpha beta gamma delta epsilon zeta eta theta"),
    # a near-dup of 0/1 (one word changed)
    (2, "alpha beta gamma delta epsilon zeta eta iota"),
    # unrelated
    (3, "one two three four five six seven eight nine ten"),
    # superset-ish overlap with 3 (prefix/suffix shared)
    (4, "one two three four five sixx seven eight nine ten"),
    # too short for 3-shingles
    (5, "just two"),
    # single shingle
    (6, "lone triple shingle"),
    (7, "lone triple shingle"),
]


@pytest.mark.parametrize("tau_num,tau_den", [(1, 2), (4, 5), (9, 10)])
def test_prefix_filter_equals_brute_force(spark, tau_num, tau_den):
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    got = {
        (r.id1, r.id2, r.n_common)
        for r in setsim.prefix_filter_pairs(
            docs, "doc_id", "text", n=3, tau_num=tau_num, tau_den=tau_den
        ).collect()
    }
    want = _brute_force(spark, docs, 3, tau_num, tau_den)
    assert got == want
    if (tau_num, tau_den) == (1, 2):
        # sanity on the fixture itself: dup pair, near-dup pairs, single-shingle
        # twins are all found; the unrelated doc pairs are not.
        ids = {(a, b) for a, b, _ in got}
        assert (0, 1) in ids and (6, 7) in ids and (0, 2) in ids
        assert (0, 3) not in ids


def test_prefix_postings_are_a_strict_subset(spark, sf_smoke):
    """The savings claim: at tau=0.5 the candidate join consumes ~half the
    postings the full inverted-index join shuffles (exactly
    sz - ceil(sz/2) + 1 per doc)."""
    from gridmr_spark.catalog import load_table

    docs = load_table(spark, sf_smoke, "documents")
    sh = word_shingles(docs, "doc_id", "text", 3)
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    total = sh.count()
    w = Window.partitionBy("id").orderBy(F.md5("shingle"), F.asc("shingle"))
    need = F.floor((F.col("sz") + 1) / 2).cast("long")
    n_prefix = (
        sh.withColumn("rn", F.row_number().over(w))
        .join(sizes, "id")
        .where(F.col("rn") <= F.col("sz") - need + 1)
        .count()
    )
    assert n_prefix < total
    assert n_prefix <= total * 0.6  # ~half plus the +1 per short doc


def test_exact_duplicates_score_full_jaccard(spark):
    docs = spark.createDataFrame(_DOCS[:2], "doc_id long, text string")
    rows = setsim.prefix_filter_pairs(docs, "doc_id", "text", 3, 1, 2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.id1, r.id2) == (0, 1)
    assert r.sz1 == r.sz2 == r.n_common
    assert r.jaccard_q == 1_000_000_000


@pytest.mark.parametrize("order", ["hash", "df"])
def test_prefix_filter_correct_under_both_orders(spark, order):
    """The prefix theorem holds for ANY fixed total order: both token
    orders must produce the identical verified pair set."""
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    got = {
        (r.id1, r.id2, r.n_common)
        for r in setsim.prefix_filter_pairs(
            docs, "doc_id", "text", n=3, tau_num=1, tau_den=2, order=order
        ).collect()
    }
    assert got == _brute_force(spark, docs, 3, 1, 2)


def test_df_ascending_order_prunes_candidates(spark, sf_smoke):
    """The AllPairs rarest-token-first heuristic must MEASURABLY shrink
    the unverified candidate set on the real documents corpus (hot tokens
    pushed out of prefixes => fewer posting-list collisions), while both
    orders verify to the same result."""
    from gridmr_spark.catalog import load_table

    docs = load_table(spark, sf_smoke, "documents")
    n_hash = setsim.candidate_pairs(docs, "doc_id", "text", 3, 1, 2, order="hash").count()
    n_df = setsim.candidate_pairs(docs, "doc_id", "text", 3, 1, 2, order="df").count()
    # The heuristic guarantee is "never worse"; the MAGNITUDE of the win is
    # corpus-dependent (any token order is equally correct), so the hard
    # assertion is <= and the measured margin on the fixed test corpus
    # (~0.17× at sf0.001) is recorded as a canary, not enforced.
    assert n_df <= n_hash
    if n_df > n_hash * 0.7:  # pragma: no cover - canary for corpus drift
        import warnings

        warnings.warn(
            f"df-order candidate reduction degraded: {n_df}/{n_hash} = "
            f"{n_df / max(n_hash, 1):.2f} (historical ~0.17 on the frozen "
            "test corpus) — regenerated corpus or ordering regression?"
        )
    verified = setsim.prefix_filter_pairs(docs, "doc_id", "text", 3, 1, 2).count()
    assert verified <= n_df  # candidates are a superset of the answer


def test_keep_best_digest_collapse_is_equivalent(spark):
    """Round-10 pre-collapse: on a corpus with planted EXACT-copy cliques
    plus genuine near-dups, survivorship with digest pre-collapse must
    equal the all-docs pair search bit-for-bit — the collapse changes
    cost, never the answer (copies share their representative's shingle
    set, so star edges re-derive every dropped edge transitively)."""
    from gridmr_spark.queries.setsim import keep_best_survivorship

    base = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta epsilon zeta eta iota",  # near-dup of [0]
        "one two three four five six seven eight nine",
        "totally different words appear in this document here",
    ]
    rows = []
    i = 0
    for text in base:
        for copy in range(4):  # 4 exact copies each => 4-cliques
            # copies are byte-identical; near-dups differ by a token
            rows.append((i, text))
            i += 1
    # the review-found edge: byte-identical docs BELOW the shingle size
    # (n=3 tokens) have empty shingle sets, so the definition (and the
    # oracle) keeps them as SEPARATE singletons — the collapse must not
    # merge them via star edges
    rows.append((i, "tiny doc")); i += 1
    rows.append((i, "tiny doc")); i += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fast = {
        tuple(r)
        for r in keep_best_survivorship(docs, collapse_exact=True).collect()
    }
    naive = {
        tuple(r)
        for r in keep_best_survivorship(docs, collapse_exact=False).collect()
    }
    assert fast == naive and fast
    # sanity: copies of [0] and [1] merged into ONE cluster of 8; the two
    # shingle-less twins stay singletons
    sizes = sorted(n for (_, n, _, _) in fast)
    assert sizes == [1, 1, 4, 4, 8]


def test_leakage_safe_split_never_splits_near_dups(spark):
    """The guarantee pipeline_leakage_safe_split exists for: every
    near-dup pair (incl. transitive) lands in ONE split, and the hash
    rule produces both splits on a plain corpus."""
    from gridmr_spark.queries.setsim import (
        _near_dup_components,
        pipeline_leakage_safe_split,
    )

    out = pipeline_leakage_safe_split(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert len(rows) == 500  # one assignment per document
    by_doc = {r.doc_id: (r.cluster_id, r.split) for r in rows}
    # cluster -> split is a FUNCTION (same cluster, same split) and both
    # splits occur
    from collections import defaultdict

    splits_per_cluster = defaultdict(set)
    for cid, sp in by_doc.values():
        splits_per_cluster[cid].add(sp)
    assert all(len(v) == 1 for v in splits_per_cluster.values())
    assert {sp for _, sp in by_doc.values()} == {"train", "val"}
    # and the clusters really are the near-dup relation: every verified
    # pair's endpoints share a cluster (hence a split)
    from gridmr_spark.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    pairs = setsim.prefix_filter_pairs(docs, "doc_id", "text", 3, 1, 2).collect()
    assert pairs  # non-vacuous on this corpus
    for p in pairs:
        assert by_doc[p.id1][1] == by_doc[p.id2][1]
