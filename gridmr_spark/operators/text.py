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


# ---------------------------------------------------------------------------
# LLM-pipeline text analysis (language ID, quality, token counts, fingerprint)
# ---------------------------------------------------------------------------

# Language-ID dictionary: (token, lang, weight) rows — DATA, not code. This
# is the production shape: a real deployment swaps in a fastText/CLD-scale
# lexicon (100k+ rows) through the same broadcast join without touching the
# operators. Weights are summed per (doc, lang); the default table carries
# unit weights.
DEFAULT_LANG_DICTIONARY: tuple[tuple[str, str, int], ...] = (
    ("the", "en", 1), ("a", "en", 1), ("of", "en", 1), ("and", "en", 1),
    ("is", "en", 1), ("to", "en", 1), ("in", "en", 1),
    ("der", "de", 1), ("die", "de", 1), ("das", "de", 1), ("und", "de", 1),
    ("ist", "de", 1), ("nicht", "de", 1),
    ("el", "es", 1), ("la", "es", 1), ("los", "es", 1), ("las", "es", 1),
    ("y", "es", 1), ("es", "es", 1), ("que", "es", 1),
    ("le", "fr", 1), ("la", "fr", 1), ("les", "fr", 1), ("et", "fr", 1),
    ("est", "fr", 1), ("que", "fr", 1), ("une", "fr", 1),
)
# Priority order for argmax ties (deterministic).
LANG_PRIORITY: tuple[str, ...] = ("en", "de", "es", "fr")

# Stopword list for quality scoring = the dictionary's distinct tokens (in
# first-appearance order) — one lexicon feeds both operators.
STOPWORDS: tuple[str, ...] = tuple(dict.fromkeys(t for t, _, _ in DEFAULT_LANG_DICTIONARY))

_CJK_PATTERN = "[\\u4e00-\\u9fff]"


def _tokens_col(text_col: str) -> Column:
    return F.filter(tokenize(text_col), lambda t: t != "")


def lang_dictionary_df(spark) -> DataFrame:
    """The default lexicon as a DataFrame — the broadcast side of
    lang_id_join. Callers substitute their own (token, lang, weight) table
    for real deployments."""
    from gridmr_spark.functions.localdata import local_df

    return local_df(
        spark, list(DEFAULT_LANG_DICTIONARY), "token string, lang string, weight int"
    )


def lang_id_join(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    dictionary: DataFrame | None = None,
) -> DataFrame:
    """Language ID via a dictionary-table broadcast join — the production
    pattern (the lexicon is a table, arbitrarily large relative to a
    when-chain, hot-swappable without a plan rebuild):

        explode(tokens) -> broadcast join on token -> SUM(weight) per
        (doc, lang) -> argmax with LANG_PRIORITY tie-break -> left join
        back (no match => 'und'); a CJK codepoint anywhere wins outright.

    Returns (id_col, predicted_lang). Scale shape: the dictionary join is
    broadcast (zero shuffle); per-(doc,lang) sums partial-aggregate
    map-side, so the only wide exchange carries <= |langs| rows per doc.

    For inline single-pass gates (filter without a join) see lang_id(),
    which compiles the SAME dictionary into a codegen'd expression."""
    spark = df.sparkSession
    dic = dictionary if dictionary is not None else lang_dictionary_df(spark)
    rank = F.create_map(
        *[x for i, lang in enumerate(LANG_PRIORITY) for x in (F.lit(lang), F.lit(i))]
    )
    toks = df.select(F.col(id_col), F.explode(_tokens_col(text_col)).alias("token"))
    best = (
        toks.join(F.broadcast(dic), "token")
        .groupBy(id_col, "lang")
        .agg(F.sum("weight").alias("score"))
        # argmax(score) with ties to the earliest LANG_PRIORITY entry:
        # max(struct) compares score first, then the negated rank.
        .groupBy(id_col)
        .agg(
            F.max(
                F.struct(
                    F.col("score"),
                    (-F.coalesce(rank[F.col("lang")], F.lit(99))).alias("neg_rank"),
                    F.col("lang"),
                )
            ).alias("m")
        )
        .select(F.col(id_col), F.col("m.lang").alias("_matched_lang"))
    )
    base = df.select(
        F.col(id_col), F.col(text_col).rlike(_CJK_PATTERN).alias("_has_cjk")
    )
    return base.join(best, id_col, "left").select(
        F.col(id_col),
        F.when(F.col("_has_cjk"), F.lit("zh"))
        .otherwise(F.coalesce(F.col("_matched_lang"), F.lit("und")))
        .alias("predicted_lang"),
    )


def _markers_by_lang() -> dict[str, tuple[str, ...]]:
    out: dict[str, list[str]] = {}
    for tok, lang, _w in DEFAULT_LANG_DICTIONARY:
        out.setdefault(lang, []).append(tok)
    return {lang: tuple(ms) for lang, ms in out.items()}


def lang_scores(text_col: str = "text") -> dict[str, Column]:
    """Dictionary-hit count per language as inline Columns (token-level,
    exact integers), compiled from DEFAULT_LANG_DICTIONARY. Unit weights
    only — weighted lexicons go through lang_id_join."""
    toks = _tokens_col(text_col)
    out: dict[str, Column] = {}
    for lang, markers in _markers_by_lang().items():
        marker_arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t)))
    return out


def lang_id(text_col: str = "text") -> Column:
    """Inline-expression variant of lang_id_join, compiled from the SAME
    dictionary: CJK presence wins outright, else dictionary-hit argmax in
    LANG_PRIORITY order; 'und' when nothing hits. Use this form inside
    single-pass gates (e.g. pipeline_training_data's language filter) where
    a join would add an exchange; use lang_id_join when the lexicon is
    table-sized. Both paths agree exactly on the default dictionary
    (pytest-enforced)."""
    scores = lang_scores(text_col)
    has_cjk = F.col(text_col).rlike(_CJK_PATTERN)
    pred = F.lit("und")
    # Build when-chain in reverse priority so earlier langs win ties.
    for lang in reversed(LANG_PRIORITY):
        others = [scores[o] for o in LANG_PRIORITY if o != lang]
        cond = (scores[lang] > 0) & (scores[lang] >= F.greatest(*others))
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    return F.when(has_cjk, F.lit("zh")).otherwise(pred)


def quality_keep(text_col: str = "text") -> Column:
    """The keep/drop gate of quality_features as ONE boolean column — for
    pipelines that only filter and must not pay a join back onto the scored
    frame (the whole gate stays inside the scan's codegen'd filter)."""
    toks = _tokens_col(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(text_col)
    n_punct = F.length(F.regexp_replace(text_col, "[a-zA-Z0-9\\s]+", ""))
    n_distinct = F.size(F.array_distinct(toks))
    avg_tok_len = F.when(
        n_tokens > 0,
        F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)).cast("double")
        / n_tokens.cast("double"),
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars.cast("double")).otherwise(F.lit(0.0))
    distinct_ratio = F.when(n_tokens > 0, n_distinct.cast("double") / n_tokens.cast("double")).otherwise(F.lit(0.0))
    return (
        (n_tokens >= 10)
        & (avg_tok_len >= 2.0)
        & (avg_tok_len <= 12.0)
        & (punct_ratio < 0.2)
        & (distinct_ratio > 0.1)
    )


def quality_features(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Per-document quality scoring: lengths, token stats, punctuation and
    stopword ratios, and a keep/drop flag — the standard pre-training filter
    set. All exact-integer or single-division arithmetic (deterministic)."""
    toks = _tokens_col(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(text_col)
    stop_arr = F.array(*[F.lit(m) for m in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_punct = F.length(F.regexp_replace(text_col, "[a-zA-Z0-9\\s]+", ""))
    n_distinct = F.size(F.array_distinct(toks))
    avg_tok_len = F.when(
        n_tokens > 0,
        F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)).cast("double")
        / n_tokens.cast("double"),
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, n_stop.cast("double") / n_tokens.cast("double")).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars.cast("double")).otherwise(F.lit(0.0))
    distinct_ratio = F.when(n_tokens > 0, n_distinct.cast("double") / n_tokens.cast("double")).otherwise(F.lit(0.0))
    keep = (
        (n_tokens >= 10)
        & (avg_tok_len >= 2.0)
        & (avg_tok_len <= 12.0)
        & (punct_ratio < 0.2)
        & (distinct_ratio > 0.1)
    )
    return df.select(
        F.col(id_col).alias("id"),
        n_chars.cast("bigint").alias("n_chars_calc"),
        n_tokens.cast("bigint").alias("n_tokens"),
        n_distinct.cast("bigint").alias("n_distinct_tokens"),
        avg_tok_len.alias("avg_token_len"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        distinct_ratio.alias("distinct_ratio"),
        keep.cast("int").alias("keep"),
    )


def token_count_cols(text_col: str) -> tuple[Column, Column]:
    """(whitespace_tokens, bpe_ish_tokens) as reusable column expressions —
    for callers that need the counts inside a wider select (e.g. the
    composed pipeline) without a second pass over the input."""
    ws = F.size(_tokens_col(text_col))
    bpe = F.size(F.regexp_extract_all(F.col(text_col), F.lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), 0))
    return ws, bpe


def token_counts(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish subword count (runs of letters,
    runs of digits, single other non-space chars — the GPT-2 pre-tokenizer
    shape, minus unicode categories)."""
    ws, bpe = token_count_cols(text_col)
    return df.select(
        F.col(id_col).alias("id"),
        ws.cast("bigint").alias("ws_tokens"),
        bpe.cast("bigint").alias("bpe_tokens"),
    )


def word_ngram_rows(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, gram) rows — ALL word n-gram occurrences per document, duplicates
    kept (unlike dedup.word_shingles, which distincts: repetition statistics
    need the multiplicity). Same explode-over-slices shape; short docs emit
    no rows."""
    toks = df.select(F.col(id_col).alias("id"), _tokens_col(text_col).alias("ws"))
    idx = F.when(
        F.size("ws") >= n, F.sequence(F.lit(1), F.size("ws") - n + 1)
    ).otherwise(F.array().cast("array<int>"))
    return toks.select(
        "id",
        F.explode(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(F.col("ws"), i, n)))
        ).alias("gram"),
    )


def repetition_features(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Gopher-style within-document repetition filters (Rae et al. 2021,
    §A1.1: "repetitious documents are filtered by the fraction of characters
    in the most common n-gram / in duplicated n-grams"):

    - ``top2_share``: characters covered by the single most frequent word
      2-gram (count × gram length, space included) over the document's
      normalized character count. Ties break on gram text for determinism.
    - ``dup3_frac``: tokens covered by 3-grams occurring >= 2 times
      (sum of count × 3) over the token count. Overlaps intentionally
      counted — exact de-overlap is O(n²) per doc for a filter heuristic.
    - ``keep``: both ratios under their thresholds.

    Distributed shape: explode n-grams to rows, two hash aggregations with
    map-side partials — per-executor state is one row per distinct
    (doc, gram), so a single pathological repetitive document cannot skew
    memory the way a collect_list per doc would. Ratios are integer
    numerators with one final division: bit-identical cross-engine."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.length(F.concat_ws(" ", _tokens_col(text_col))).cast("bigint").alias("n_chars_norm"),
        F.size(_tokens_col(text_col)).cast("bigint").alias("n_tokens"),
    )
    g2 = (
        word_ngram_rows(df, id_col, text_col, 2)
        .groupBy("id", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy(F.desc("cnt"), F.asc("gram"))
    top2 = (
        g2.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("id", (F.col("cnt") * F.length("gram")).cast("bigint").alias("top2_chars"))
    )
    dup3 = (
        word_ngram_rows(df, id_col, text_col, 3)
        .groupBy("id", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= 2)
        .groupBy("id")
        .agg(F.sum(F.col("cnt") * 3).cast("bigint").alias("dup3_tokens"))
    )
    out = (
        base.join(top2, "id", "left")
        .join(dup3, "id", "left")
        .select(
            "id",
            "n_chars_norm",
            "n_tokens",
            F.when(
                F.col("n_chars_norm") > 0,
                F.coalesce(F.col("top2_chars"), F.lit(0)).cast("double")
                / F.col("n_chars_norm").cast("double"),
            ).otherwise(F.lit(0.0)).alias("top2_share"),
            F.when(
                F.col("n_tokens") > 0,
                F.coalesce(F.col("dup3_tokens"), F.lit(0)).cast("double")
                / F.col("n_tokens").cast("double"),
            ).otherwise(F.lit(0.0)).alias("dup3_frac"),
        )
    )
    keep = (F.col("top2_share") <= 0.20) & (F.col("dup3_frac") <= 0.30)
    return out.withColumn("keep", keep.cast("int"))


def fingerprint(text_col: str = "text", mod: int = 2147483647, mult: int = 31) -> Column:
    """Polynomial rolling hash over the document's characters (codepoints):
    acc = (acc*31 + code) mod p. A sequential fold — deterministic,
    engine-portable (no impl-defined hash), cheap enough for 100 TB."""
    chars = F.regexp_extract_all(F.col(text_col), F.lit("."), 0)
    codes = F.transform(chars, lambda ch: F.ascii(ch).cast("long"))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * mult + c) % mod,
    )


def _deletion_variants(name, length):
    """Single-character-deletion variants of ``name`` (array<string>)."""
    return F.transform(
        F.sequence(F.lit(1), length),
        lambda i: F.concat(
            F.substring(name, F.lit(1), i - F.lit(1)),
            F.substring(name, i + F.lit(1), length),
        ),
    )


def symdelete_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_dist: int = 1,
    max_block_df: int | None = None,
) -> DataFrame:
    """Exact Levenshtein<=max_dist pairs via symmetric-deletion blocking
    (the SymSpell/FastSS construction): every string emits its depth-d
    deletion neighborhood (all variants with up to d characters removed) as
    block keys; two strings within edit distance d PROVABLY share a key, so
    the equi-join on the key finds every qualifying pair — no
    broadcast-nested-loop over the pair space, unlike a theta-join with a
    length-band prefilter.

    Cost model: C(len, <=d) key blowup on the emit side (len+1 keys at d=1,
    ~len²/2 at d=2), then one shuffle equi-join on the key — both linear in
    data size; the verify step runs the O(len^2) DP only on key-collision
    candidates. The storage-for-shuffle trade steepens with d — beyond d=2
    switch to n-gram/minhash blocking (operators/dedup.py).

    ``max_block_df`` drops stop-keys hotter than the threshold (skew
    guard for pathological inputs, e.g. a shared constant prefix of
    single-char strings); None keeps completeness.
    """
    if max_dist not in (1, 2):
        raise ValueError("symdelete blocking implemented for max_dist in {1, 2}")
    s = df.select(
        F.col(id_col).alias("id"),
        F.col(str_col).alias("name"),
        F.length(str_col).alias("len"),
    )
    d1 = _deletion_variants(F.col("name"), F.col("len"))
    variants = F.concat(F.array(F.col("name")), d1)
    if max_dist == 2:
        d2 = F.flatten(
            F.transform(d1, lambda v: _deletion_variants(v, F.col("len") - F.lit(1)))
        )
        variants = F.concat(variants, d2)
    # Keys stay as strings: at shuffle-join scale, substituting
    # xxhash64(variant) as the key narrows the shuffle ~2x (collisions only
    # add candidates, which the DP verify rejects) — but measured at sf0.1,
    # where AQE broadcasts the keyed side and no shuffle exists, the hash
    # costs more than it saves (3.9s vs 3.6s). Apply the hash when the
    # keyed side outgrows broadcast.
    # Keys travel WITHOUT the name payload: a string shares many deletion
    # keys with its neighbors, so the collision stream is many times the
    # input and carrying both names through it (and through the distinct)
    # multiplies the shuffled bytes ~4x. Decide with small rows — distinct
    # the bare (id1, id2) pairs — and re-attach names afterwards with two
    # joins against the input (guide §8; broadcast-sized for dims, a keyed
    # join at fact scale).
    keyed = s.select("id", F.explode(F.array_distinct(variants)).alias("v"))
    if max_block_df is not None:
        hot = (
            keyed.groupBy("v")
            .agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") > max_block_df)
            .select("v")
        )
        keyed = keyed.join(hot, "v", "left_anti")
    a = keyed.select(F.col("id").alias("id1"), "v")
    b = keyed.select(F.col("id").alias("id2"), "v")
    pairs = (
        a.join(b, "v")
        .where(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )
    names = s.select("id", "name")
    return (
        pairs.join(names.select(F.col("id").alias("id1"), F.col("name").alias("n1")), "id1")
        .join(names.select(F.col("id").alias("id2"), F.col("name").alias("n2")), "id2")
        .select("id1", "id2", F.levenshtein("n1", "n2").alias("dist"))
        .where(F.col("dist") <= max_dist)
    )


def cdc_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mask: int = 64,
) -> DataFrame:
    """Content-defined chunking: degree-7 polynomial rolling hash (base 31)
    over the character stream; a boundary closes a chunk wherever
    hash % ``mask`` == 0 (expected chunk length ~= mask chars). Returns one
    row per chunk: (id, chunk_idx, n_chars, chunk_md5, dup_count) with
    dup_count the corpus-wide count of content-identical chunks.

    Shift-robust by construction: the hash at position i depends only on
    the previous 8 characters, so an insertion/deletion perturbs boundary
    placement only until the window slides past the edit — downstream
    boundaries re-synchronize (tests/test_cdc.py pins this). Exact BIGINT
    arithmetic throughout (max term ~3.5e12 * 8 < 2^63), no Python in the
    plan. The exploded frame carries (id, pos, code) ONLY — the document
    text re-joins once per CHUNK for the substring, never riding the
    per-character shuffles (per-doc shuffle volume stays O(n), not O(n^2)
    bytes); the dedup-count window partitions on the md5 digest, so that
    exchange moves fixed 32-byte keys."""
    from pyspark.sql import Window

    # Guard empty documents: Spark's split('', '') returns [''] (one
    # phantom element), which would fabricate a 1-char chunk for a 0-char
    # doc; the oracle's generate_series(1, 0) correctly yields no rows.
    docs_ne = docs.where(F.length(text_col) > 0)
    chars = docs_ne.select(
        id_col,
        F.posexplode(
            F.expr(f"transform(split({text_col}, ''), c -> CAST(ascii(c) AS BIGINT))")
        ).alias("pos", "code"),
    ).select(id_col, F.col("pos").cast("long").alias("pos"), "code")

    w = Window.partitionBy(id_col).orderBy("pos")
    h = (
        F.col("code")
        + F.lit(31) * F.lag("code", 1, 0).over(w)
        + F.lit(961) * F.lag("code", 2, 0).over(w)
        + F.lit(29791) * F.lag("code", 3, 0).over(w)
        + F.lit(923521) * F.lag("code", 4, 0).over(w)
        + F.lit(28629151) * F.lag("code", 5, 0).over(w)
        + F.lit(887503681) * F.lag("code", 6, 0).over(w)
        + F.lit(27512614111) * F.lag("code", 7, 0).over(w)
    )
    hashed = chars.select(
        id_col, "pos",
        F.when((F.col("pos") >= 7) & (h % mask == 0), 1).otherwise(0).alias("flag"),
    )
    wcum = w.rowsBetween(Window.unboundedPreceding, -1)
    idx = hashed.select(
        id_col, "pos",
        F.coalesce(F.sum("flag").over(wcum), F.lit(0)).cast("long").alias("chunk_idx"),
    )
    spans = idx.groupBy(id_col, "chunk_idx").agg(
        F.min("pos").cast("int").alias("start"),
        F.count(F.lit(1)).alias("n_chars"),
    )
    chunks = spans.join(docs_ne.select(id_col, text_col), id_col).select(
        id_col, "chunk_idx", "n_chars",
        F.md5(
            F.substring(
                F.col(text_col), F.col("start") + F.lit(1), F.col("n_chars").cast("int")
            )
        ).alias("chunk_md5"),
    )
    return chunks.select(
        id_col, "chunk_idx", "n_chars", "chunk_md5",
        F.count(F.lit(1)).over(Window.partitionBy("chunk_md5")).cast("long").alias("dup_count"),
    )
