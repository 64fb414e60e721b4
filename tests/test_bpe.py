"""BPE tokenizer invariants (operators/bpe.py) — the sub-convergent regime
the exact-regime oracle (text_bpe_tokenize) does not reach, plus artifact
round-trip and determinism."""

from __future__ import annotations

import pyspark.sql.functions as F

from gridmr_spark.catalog import load_table
from gridmr_spark.operators.bpe import (
    _encode_word,
    encode_bpe,
    fit_bpe,
    load_bpe,
    save_bpe,
)


def test_fit_is_deterministic(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    assert fit_bpe(docs, num_merges=50) == fit_bpe(docs, num_merges=50)


def test_encode_word_is_rank_greedy():
    # rank 0 merges first even when a later merge could apply to the raw
    # chars: "abc" -> ab + c -> abc, not a + bc
    ranks = {("a", "b"): 0, ("ab", "c"): 1, ("b", "c"): 2}
    assert _encode_word("abc", ranks) == ["abc"]
    # unmergeable chars stay single symbols
    assert _encode_word("xyz", ranks) == ["x", "y", "z"]
    # every occurrence of the chosen pair merges in one pass
    assert _encode_word("abab", {("a", "b"): 0}) == ["ab", "ab"]


def test_subconvergent_invariants(spark, sf_smoke):
    """At 20 merges segmentation is partial: word_count <= n_tokens <=
    char_count, and detok still round-trips (subword concat restores every
    word at ANY merge count — losslessness does not depend on convergence)."""
    docs = load_table(spark, sf_smoke, "documents")
    merges = fit_bpe(docs, num_merges=20)
    enc = encode_bpe(docs, merges).alias("e")

    from gridmr_spark.operators.text import tokenize

    base = docs.select(
        "doc_id",
        F.filter(tokenize("text"), lambda w: w != "").alias("toks"),
    ).select(
        "doc_id",
        F.size("toks").alias("n_words"),
        F.aggregate("toks", F.lit(0), lambda acc, w: acc + F.length(w)).alias("n_chars"),
        F.array_join("toks", " ").alias("norm_text"),
    ).alias("b")

    joined = enc.join(base, "doc_id")
    assert joined.where(~F.col("n_tokens").between(F.col("n_words"), F.col("n_chars"))).count() == 0
    assert joined.where(F.col("detok") != F.col("norm_text")).count() == 0
    # genuinely sub-convergent: some word needed more than one token
    assert joined.where(F.col("n_tokens") > F.col("n_words")).count() > 0


def test_artifact_roundtrip_and_encode_identity(spark, sf_smoke, tmp_path):
    docs = load_table(spark, sf_smoke, "documents")
    merges = fit_bpe(docs, num_merges=40)
    path = str(tmp_path / "bpe_merges")
    save_bpe(spark, merges, path)
    assert load_bpe(spark, path) == merges

    from_fit = sorted(encode_bpe(docs, merges).collect())
    from_artifact = sorted(encode_bpe(docs, load_bpe(spark, path)).collect())
    assert from_fit == from_artifact


def test_vocab_cap_keeps_most_frequent(spark, sf_smoke):
    """max_vocab_words caps the fit table by frequency; a heavily capped fit
    still learns merges for the surviving head words."""
    docs = load_table(spark, sf_smoke, "documents")
    merges = fit_bpe(docs, num_merges=300, max_vocab_words=5)
    ranks = {p: i for i, p in enumerate(merges)}
    # the most frequent corpus words must encode to a single token
    top = (
        docs.select(F.explode(F.filter(F.split(F.lower("text"), " "), lambda w: w != "")).alias("w"))
        .groupBy("w").count().orderBy(F.col("count").desc(), "w").limit(3).collect()
    )
    for r in top:
        assert len(_encode_word(r["w"], ranks)) == 1, r["w"]
