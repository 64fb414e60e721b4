"""Set-similarity join queries: prefix-filtered exact Jaccard pairs.

Completes the near-dup family's exact-algorithms corner: `dedup_ngram_jaccard`
is the full inverted-index join (ground truth, shuffles every posting),
`dedup_minhash_lsh` is the probabilistic banding path (linear shuffle, recall
< 1 in general), and `dedup_setsim_prefix` here is the EXACT sub-quadratic
middle — prefix filtering (AllPairs/PPJoin, Bayardo et al. WWW'07) shuffles
only the prefix postings yet provably finds every pair above the threshold.

The oracle is the quadratic Jaccard DEFINITION (same CTE chain as
dedup_ngram_jaccard's), so a green driver row is a machine-checked proof of
the lossless-filtering theorem on this corpus — not just a self-consistency
check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gridmr_spark.catalog import load_table
from gridmr_spark.operators import setsim
from gridmr_spark.queries import query

# Exact quadratic Jaccard >= 1/2 over distinct 3-word shingles — the
# definition, with sizes/intersection surfaced and the repo-standard
# nanoquantized score. The threshold gate is pure integer arithmetic
# (2*I >= U) so the boundary is engine-exact.
_SETSIM_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(lower(regexp_replace(text,'[^a-zA-Z0-9]+',' ','g')),' '), t -> t <> '') AS ws
  FROM documents
), sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(generate_series(1, len(ws)-2),
         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS shingle
  FROM toks
), sizes AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id
), common AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2, CAST(COUNT(*) AS BIGINT) AS c
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id1, id2, s1.sz AS sz1, s2.sz AS sz2, c AS n_common,
       CAST(FLOOR(CAST(c AS DOUBLE) / CAST(s1.sz + s2.sz - c AS DOUBLE)
                  * 1000000000.0) AS BIGINT) AS jaccard_q
FROM common
JOIN sizes s1 ON id1 = s1.doc_id
JOIN sizes s2 ON id2 = s2.doc_id
WHERE 2 * c >= s1.sz + s2.sz - c
"""


@query("dedup_setsim_prefix", oracle=_SETSIM_ORACLE)
def dedup_setsim_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-dup pairs (3-shingle Jaccard >= 0.5) via PREFIX-FILTERED
    set-similarity join: candidates come from equi-joining only each
    document's first ``sz - ceil(tau*sz) + 1`` shingles under a fixed
    pseudo-random global order, then exact verification on sorted shingle
    arrays. Provably lossless (prefix-filter theorem) — the oracle is the
    unfiltered quadratic definition, so hash-equality IS the proof.

    vs dedup_ngram_jaccard: same answer, but the candidate join moves only
    prefix postings (half at tau=0.5, ~10% at the tau=0.9 production
    regime) and hot shingles collide only when sampled into both prefixes.
    vs dedup_minhash_lsh: no recall loss, no signature computation; LSH
    still wins when tau is low and documents are huge (prefixes stay long).
    At 100 TB you run THIS for tau >= 0.8 contract-grade dedup and LSH for
    exploratory clustering — both are one `queries()` call apart here."""
    docs = load_table(spark, sf_dir, "documents")
    return setsim.prefix_filter_pairs(docs, "doc_id", "text", n=3, tau_num=1, tau_den=2)
