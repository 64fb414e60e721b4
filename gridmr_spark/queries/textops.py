"""Text-processing queries over ``documents`` — the reference's entire
de-facto query library (word count) plus the LLM-pipeline text analysis and
dedup surface (SURVEY.md §2.B, §2.D last row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gridmr_spark.catalog import load_table
from gridmr_spark.operators import text as text_ops
from gridmr_spark.queries import query

# ---------------------------------------------------------------------------
# Word count — the flagship. Faithful Spark rendering of the reference's only
# end-to-end workload: normalize (map.cc:12-16) -> tokenize+emit (map.cc:17-21)
# -> hash groupBy + sum (reduce.cc:10-22). Spark improves on the reference by
# doing map-side partial aggregation (the reference ships every `word\t1`
# across the shuffle — SURVEY.md §4.1).
# ---------------------------------------------------------------------------

WORDCOUNT_ORACLE = """
SELECT word, count(*) AS cnt
FROM (
  SELECT unnest(string_split(lower(regexp_replace(text, '[^a-zA-Z0-9]+', ' ', 'g')), ' ')) AS word
  FROM documents
) t
WHERE word <> ''
GROUP BY word
"""


@query("wordcount", oracle=WORDCOUNT_ORACLE)
def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count over documents.text (reference parity: cpp/worker/map.cc:12-21
    + cpp/worker/reduce.cc:10-22, composed per SURVEY.md §2.B B4)."""
    docs = load_table(spark, sf_dir, "documents")
    return text_ops.word_count(docs, "text")
