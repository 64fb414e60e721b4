"""Language-ID: the inline expression gate and the dictionary broadcast join
must agree exactly — they compile the same DEFAULT_LANG_DICTIONARY."""

from __future__ import annotations

from pyspark.sql import functions as F

from gridmr_spark.operators import text as text_ops


def test_lang_id_expr_and_join_agree(spark, sf_oracle):
    docs = spark.read.parquet(f"{sf_oracle}/documents.parquet")
    expr = docs.select(
        "doc_id", text_ops.lang_id("text").alias("predicted_lang")
    )
    join = text_ops.lang_id_join(docs, "doc_id", "text")
    diff = (
        expr.alias("e")
        .join(join.alias("j"), "doc_id")
        .where(F.col("e.predicted_lang") != F.col("j.predicted_lang"))
    )
    assert diff.count() == 0
    assert join.count() == docs.count()


def test_lang_id_join_weighted_dictionary(spark):
    """Weights actually matter in the join path: a weight-3 French token must
    out-score two weight-1 English tokens; priority breaks exact ties."""
    docs = spark.createDataFrame(
        [
            (1, "the of une"),     # en 1+1 vs fr 3 -> fr
            (2, "the une"),        # en 1 vs fr 3 -> fr
            (3, "the of and une"), # en 3 vs fr 3 -> tie -> en (priority)
            (4, "zzz qqq"),        # no hits -> und
        ],
        "doc_id long, text string",
    )
    dic = spark.createDataFrame(
        [("the", "en", 1), ("of", "en", 1), ("and", "en", 1), ("une", "fr", 3)],
        "token string, lang string, weight int",
    )
    got = {
        r.doc_id: r.predicted_lang
        for r in text_ops.lang_id_join(docs, "doc_id", "text", dictionary=dic).collect()
    }
    assert got == {1: "fr", 2: "fr", 3: "en", 4: "und"}


def test_stopwords_derived_from_dictionary():
    toks = [t for t, _, _ in text_ops.DEFAULT_LANG_DICTIONARY]
    assert set(text_ops.STOPWORDS) == set(toks)
    assert len(text_ops.STOPWORDS) == len(set(toks))  # deduped
