"""Data-selection queries: DSIR-style importance resampling.

DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS 2023,
public literature) — selects pretraining documents whose hashed-n-gram
feature distribution looks like a TARGET corpus rather than the raw crawl:
each document scores sum over token occurrences of
log(p_target(bucket)/p_raw(bucket)), and the top-scoring documents are kept.
It is the standard cheap alternative to classifier-based quality filtering
(`text_quality_classifier`) when what you have is an exemplar corpus rather
than labels.

Engine shape: the ENTIRE model is a 64-row bucket table (two Laplace-
smoothed occurrence counts per bucket) — the canonical broadcast-dimension
pattern. One exploded token-count aggregation builds the model, a map-side
broadcast join scores every document in the same pass shape, and selection
is a bounded top-k. No Python boundary anywhere.

The reference (SebasUr/GridMR) has no selection/quality surface at all —
this is §2.D "beyond the reference" LLM-pipeline territory, sitting next to
`sample_importance_weighted` (user-given weights) and
`sample_temperature_mixture` (per-shard quotas): DSIR is the variant where
the weights are LEARNED from a target corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gridmr_spark.catalog import load_table
from gridmr_spark.queries import query

_DSIR_BUCKETS = 64
_DSIR_TOPK = 100

# Engine-portable feature hash: 60-bit md5 prefix mod n_buckets (same idiom
# as the KMV / simhash / sampling oracles).
_BUCKET_SQL = (
    "CAST(CAST(('0x' || substr(md5(tok), 1, 15)) AS UBIGINT) "
    f"% {_DSIR_BUCKETS} AS BIGINT)"
)

_DSIR_ORACLE = rf"""
WITH occ AS (
  SELECT doc_id, length(source) = 4 AS is_target, {_BUCKET_SQL} AS b
  FROM (
    SELECT doc_id, source,
           unnest(list_filter(string_split(lower(regexp_replace(text, '[^a-zA-Z0-9]+', ' ', 'g')), ' '),
                  w -> w <> '')) AS tok
    FROM documents
  )
), model AS (
  SELECT b,
         CAST(SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS ct,
         CAST(COUNT(*) AS BIGINT) AS cr
  FROM occ GROUP BY b
), tot AS (
  SELECT CAST(SUM(ct) AS BIGINT) AS tt, CAST(SUM(cr) AS BIGINT) AS tr FROM model
), wt AS (
  SELECT b,
         CAST(FLOOR(ln((CAST(ct + 1 AS DOUBLE) * CAST(tr + {_DSIR_BUCKETS} AS DOUBLE))
                       / (CAST(cr + 1 AS DOUBLE) * CAST(tt + {_DSIR_BUCKETS} AS DOUBLE)))
                    * 1000000000.0) AS BIGINT) AS lw
  FROM model CROSS JOIN tot
), scored AS (
  SELECT occ.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
         CAST(SUM(lw) AS BIGINT) AS score_q
  FROM occ JOIN wt USING (b)
  GROUP BY occ.doc_id
)
SELECT doc_id, n_tok, score_q, rk FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY score_q DESC, doc_id ASC) AS rk FROM scored
) WHERE rk <= {_DSIR_TOPK}
"""


@query("sample_dsir_importance", oracle=_DSIR_ORACLE)
def sample_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling: score every document by how much its
    hashed-unigram distribution favors the target corpus (here the
    srcX sources, length(source)==4 — the slot a curated exemplar corpus
    plugs into) over the raw corpus, keep the top 100.

    Per-bucket log weight ln(p_t/p_r) with +1 Laplace smoothing is ONE
    mirrored double expression over exact integer counts, nanolog-quantized
    before the per-document SUM (the `text_bigram_lm_score` idiom), so
    aggregation order cannot move the hash. A document's score is then a
    pure integer sum of its tokens' bucket weights.

    Scale shape at 100 TB: the model is {_DSIR_BUCKETS} rows (production
    uses 10k buckets of 2-gram features — still driver-trivial) built by
    one map-side-combined aggregation; scoring is a broadcast join folded
    into the same token-explode pass; selection is a global top-k
    (TakeOrdered-shaped; a threshold-on-score variant avoids even that).
    Resampling rather than top-k selection is one md5-Gumbel column away —
    the deterministic-sampling idiom `sample_importance_weighted` already
    implements."""
    docs = load_table(spark, sf_dir, "documents")
    scored = dsir_scores(docs.withColumn("is_target", F.length("source") == 4))
    # Global top-k via TakeOrderedAndProject + a k-row ranking window —
    # never an unpartitioned WindowExec over the corpus (guide §2).
    from gridmr_spark.functions.ranking import ranked_topk

    return ranked_topk(
        scored, [F.desc("score_q"), F.asc("doc_id")], _DSIR_TOPK, out="rk"
    ).select("doc_id", "n_tok", "score_q", "rk")


def dsir_scores(docs: DataFrame, n_buckets: int = _DSIR_BUCKETS) -> DataFrame:
    """(doc_id, n_tok, score_q) DSIR scores for a (doc_id, text, is_target)
    frame — the model-fit + scoring core of sample_dsir_importance, exposed
    so tests can run it on synthetic corpora with known distributions."""
    occ = docs.select(
        "doc_id",
        "is_target",
        F.explode(
            F.filter(
                F.split(F.lower(F.regexp_replace("text", "[^a-zA-Z0-9]+", " ")), " "),
                lambda w: w != "",
            )
        ).alias("tok"),
    ).select(
        "doc_id",
        "is_target",
        (F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long") % n_buckets).alias("b"),
    )
    model = occ.groupBy("b").agg(
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).cast("long").alias("ct"),
        F.count(F.lit(1)).cast("long").alias("cr"),
    )
    tot = model.agg(
        F.sum("ct").cast("long").alias("tt"), F.sum("cr").cast("long").alias("tr")
    )
    nb = F.lit(n_buckets)
    wt = model.crossJoin(F.broadcast(tot)).select(
        "b",
        F.floor(
            F.log(
                ((F.col("ct") + 1).cast("double") * (F.col("tr") + nb).cast("double"))
                / ((F.col("cr") + 1).cast("double") * (F.col("tt") + nb).cast("double"))
            )
            * F.lit(1000000000.0)
        )
        .cast("long")
        .alias("lw"),
    )
    return (
        occ.join(F.broadcast(wt), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tok"),
            F.sum("lw").cast("long").alias("score_q"),
        )
    )


# ---------------------------------------------------------------------------
# Dataset card: the one-pass corpus summary artifact
# ---------------------------------------------------------------------------

_CARD_ORACLE = """
WITH d AS (
  SELECT lang, source, md5(text) AS digest,
         CAST(len(list_filter(string_split(lower(regexp_replace(text, '[^a-zA-Z0-9]+', ' ', 'g')), ' '),
                  w -> w <> '')) AS BIGINT) AS n_tok,
         CAST(length(text) AS BIGINT) AS n_chars
  FROM documents
), dup AS (
  SELECT digest, CAST(COUNT(*) AS BIGINT) AS c FROM d GROUP BY digest
)
SELECT COALESCE(d.lang, 'ALL') AS lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(SUM(CASE WHEN dup.c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs
FROM d JOIN dup USING (digest)
GROUP BY GROUPING SETS ((d.lang), ())
"""


@query("pipeline_dataset_card", oracle=_CARD_ORACLE)
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset card in one pass: per-language and corpus-total document /
    token / character counts, source coverage, and exact-duplicate volume —
    the summary artifact every released training corpus ships (dataset
    cards / datasheets for datasets, Gebru et al. 2021). GROUPING SETS
    gives the per-lang rows and the 'ALL' rollup from ONE aggregation; the
    duplicate flag is the dedup_exact digest shape joined back as a
    per-digest count.

    Scale shape: one corpus scan; the digest group-by is the standard
    128-bit-key dedup shuffle (the narrow one); the grouping-sets
    aggregate is lang-cardinality bounded. Extending the card (quality
    histograms, length percentiles) composes more aggregates onto the same
    scan."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "lang",
        "source",
        F.md5("text").alias("digest"),
        F.size(
            F.filter(
                F.split(F.lower(F.regexp_replace("text", "[^a-zA-Z0-9]+", " ")), " "),
                lambda w: w != "",
            )
        )
        .cast("long")
        .alias("n_tok"),
        F.length("text").cast("long").alias("n_chars"),
    )
    dup = d.groupBy("digest").agg(F.count(F.lit(1)).cast("long").alias("c"))
    joined = d.join(dup, "digest")
    return (
        joined.groupingSets([["lang"], []], "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.sum("n_chars").cast("long").alias("n_chars"),
            F.countDistinct("source").cast("long").alias("n_sources"),
            F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).cast("long").alias("n_dup_docs"),
        )
        .select(
            F.coalesce("lang", F.lit("ALL")).alias("lang"),
            "n_docs", "n_tokens", "n_chars", "n_sources", "n_dup_docs",
        )
    )


# ---------------------------------------------------------------------------
# Weighted reservoir sampling without replacement (Efraimidis-Spirakis A-ES)
# ---------------------------------------------------------------------------

_RESERVOIR_K = 20

# u in (0, 1]: 8 md5 hex chars -> (h + 1) / 2^32, engine-portable.
_U_SQL = ("(CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) "
          "AS DOUBLE) + 1.0) / 4294967296.0")

_RESERVOIR_ORACLE = f"""
WITH d AS (
  SELECT doc_id, CAST(n_chars AS DOUBLE) AS w, {_U_SQL} AS u
  FROM documents WHERE n_chars > 0
), keyed AS (
  SELECT doc_id,
         CAST(FLOOR(ln(u) / w * 1000000000.0) AS BIGINT) AS key_q
  FROM d
)
SELECT doc_id, key_q, rk FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY key_q DESC, doc_id ASC) AS rk FROM keyed
) WHERE rk <= {_RESERVOIR_K}
"""


@query("sample_weighted_reservoir", oracle=_RESERVOIR_ORACLE)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement via the Efraimidis-Spirakis
    A-ES key (Inf. Proc. Letters 2006, public): each item draws
    u ~ U(0,1] and ranks by u^(1/w) — equivalently ln(u)/w, monotone and
    overflow-free — and the top-k keys are EXACTLY a weighted sample
    without replacement. The one-pass, mergeable formulation every
    distributed engine uses (per-partition top-k then merge, which is
    precisely what TakeOrdered/WindowGroupLimit compile to).

    Deterministic u comes from md5(doc_id) (the repo's sampling idiom), so
    re-runs and both engines agree; the key is nanolog-quantized before
    ranking (one ln + one division, mirrored). Weights here are document
    lengths — sample long documents preferentially, the curriculum/dedup
    use case. vs sample_importance_weighted (Bernoulli, random SIZE):
    A-ES returns exactly k rows, the contract a fixed training-budget
    draw needs."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    u = (
        (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
         .cast("double") + F.lit(1.0)) / F.lit(4294967296.0)
    )
    keyed = docs.select(
        "doc_id",
        F.floor(F.log(u) / F.col("n_chars").cast("double") * F.lit(1000000000.0))
        .cast("long")
        .alias("key_q"),
    )
    # Global top-k via TakeOrderedAndProject + a k-row ranking window —
    # the per-partition-top-k-then-merge formulation the docstring
    # describes, now explicit in the plan (guide §2).
    from gridmr_spark.functions.ranking import ranked_topk

    return ranked_topk(
        keyed, [F.desc("key_q"), F.asc("doc_id")], _RESERVOIR_K, out="rk"
    ).select("doc_id", "key_q", "rk")
