"""Byte-pair-encoding tokenizer: distributed fit, distributed encode,
persisted merge-table artifact.

The work splits the way a 100 TB tokenizer train must:

- **fit** — the only corpus-sized pass is a word-frequency aggregation
  (scan -> explode -> partial agg -> shuffle on word), the same shape as
  wordcount. The merge LOOP then runs driver-side over that table, which
  is VOCAB-bounded, not corpus-bounded: classic BPE training (Sennrich et
  al. 2016, "Neural Machine Translation of Rare Words with Subword Units")
  operates on the word->freq dict, so its cost is O(vocab * merges)
  regardless of corpus bytes. Real trainers cap the table (`max_vocab_words`
  by descending frequency, deterministic tie-break) exactly because Zipf
  mass concentrates: the tail a cap drops cannot win a merge vote anyway.
- **encode** — merge ranks broadcast to executors (the artifact is
  O(num_merges) strings — KB, not GB), applied via Arrow-batched
  mapInPandas with a per-batch word->tokens memo: Zipf again means almost
  every incoming word hits the memo, so the per-row cost is a dict lookup.
- **artifact** — merges persist as a tiny parquet (rank, left, right), the
  fit/search separation the ANN indexes use: train nightly, encode many
  times, no refit on the encode path.

Reference scope: GridMR's only tokenizer is whitespace split inside user
map binaries (cpp/worker/map.cc:17-21); subword tokenization is part of
the LLM-pipeline surface this engine adds on top.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gridmr_spark.operators.text import tokenize

__all__ = ["fit_bpe", "encode_bpe", "save_bpe", "load_bpe"]


def _word_frequencies(df: DataFrame, text_col: str, max_vocab_words: int) -> list[tuple[str, int]]:
    """Distributed word-frequency table, capped deterministically at
    max_vocab_words by (count DESC, word ASC). The collect() is bounded by
    the cap — the documented contract, same as the k-means centroid
    collect."""
    wf = (
        df.select(F.explode(tokenize(text_col)).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("word"))
        .limit(max_vocab_words)
        .collect()
    )
    return [(r["word"], int(r["freq"])) for r in wf]


def _merge_pair(sym: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i, n = 0, len(sym)
    while i < n:
        if i + 1 < n and sym[i] == pair[0] and sym[i + 1] == pair[1]:
            out.append(sym[i] + sym[i + 1])
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def fit_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 300,
    max_vocab_words: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Learn `num_merges` BPE merges from the corpus. Deterministic: the
    winning pair each round is max by (frequency, pair) — lexicographically
    largest pair on frequency ties — so two runs over the same data produce
    the same merge table. Returns the ordered merge list."""
    vocab: dict[tuple[str, ...], int] = {}
    for word, freq in _word_frequencies(df, text_col, max_vocab_words):
        vocab[tuple(word)] = vocab.get(tuple(word), 0) + freq

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for sym, f in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break  # every word is a single symbol: converged
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        vocab = {_merge_pair(sym, best): f for sym, f in vocab.items()}
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges greedily by rank (lowest rank first), merging every
    occurrence of the chosen pair left-to-right — the standard BPE encode."""
    sym: list[str] = list(word)
    while len(sym) > 1:
        best_rank, best_pair = None, None
        for a, b in zip(sym, sym[1:]):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (a, b)
        if best_pair is None:
            break
        sym = list(_merge_pair(tuple(sym), best_pair))
    return sym


def encode_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize each document with the learned merges. Output one row per
    document: (id, n_tokens, detok) where detok rejoins the subword tokens
    word-by-word with single spaces — equal to the whitespace-normalized
    input text whenever the merge table is applied correctly (the lossless
    round-trip property the oracle checks).

    Arrow-batched mapInPandas; `ranks` rides the closure (broadcast by
    task serialization — KBs). The word->tokens memo makes the per-row
    cost a dict hit on Zipf-distributed text."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    out_schema = f"{id_col} long, n_tokens long, detok string"

    def encode_batches(batches):
        import pandas as pd

        memo: dict[str, list[str]] = {}
        for pdf in batches:
            ids, n_toks, detoks = [], [], []
            for did, text in zip(pdf[id_col], pdf["__words"]):
                total = 0
                parts: list[str] = []
                for w in text:
                    toks = memo.get(w)
                    if toks is None:
                        toks = _encode_word(w, ranks)
                        memo[w] = toks
                    total += len(toks)
                    parts.append("".join(toks))
                ids.append(did)
                n_toks.append(total)
                detoks.append(" ".join(parts))
            yield pd.DataFrame({id_col: ids, "n_tokens": n_toks, "detok": detoks})

    words = df.select(
        id_col,
        F.filter(tokenize(text_col), lambda w: w != "").alias("__words"),
    )
    return words.mapInPandas(encode_batches, schema=out_schema)


def save_bpe(spark, merges: list[tuple[str, str]], path: str) -> None:
    """Persist the merge table as parquet (rank, left, right)."""
    from gridmr_spark.functions.localdata import local_df

    local_df(
        spark,
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, left string, right string",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_bpe(spark, path: str) -> list[tuple[str, str]]:
    rows = spark.read.parquet(path).orderBy("rank").collect()
    return [(r["left"], r["right"]) for r in rows]
