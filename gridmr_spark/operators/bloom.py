"""Engine-portable Bloom filter as a RELATION — corpus-membership dedup
for incremental ingest.

The production problem this solves at 100 TB: every day's new documents
must be checked against the full historical corpus for exact duplicates.
Joining the ingest batch against 100 TB of history shuffles the history's
keys every day; a Bloom filter of the history's digests is a few GB,
broadcastable, rebuilt incrementally (bitmaps OR together), and answers
"definitely new" with zero false negatives — only the small maybe-set
ever joins the real history for confirmation.

Representation: the filter is a DataFrame of ``(word, bits)`` rows — an
m-bit bitmap packed into 32-bit words carried in BIGINTs (same choice as
``operators/similarity.binary_signature``: no signed-overflow edge cases,
and any engine can replay the packing). Hash family is the repo's
portable 60-bit md5 idiom (``conv(substr(md5(key || ':' || i),1,15),16,10)
% m``) so the DuckDB oracle reconstructs the filter bit-for-bit.

Everything is relational and shuffle-bounded: the build is one explode +
groupBy(word) with ``bit_or`` (map-side combined, at most m/32 output
rows); the probe broadcasts the bitmap and needs no shuffle of the probe
side at all. Merging two filters of equal geometry is a union + the same
bit_or — the mergeability that makes per-partition / per-day builds
parallel.

Reference parity: SebasUr/GridMR has no membership structure of any kind
(its data plane is raw text lines, cpp/worker/src/common/fs.cc); this is
part of the beyond-the-reference LLM-pipeline surface (SURVEY.md §2.D).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


_INTERNAL = ("_bloom_i", "_bloom_pos", "_bloom_word", "_bloom_bits", "_bloom_hit")


def _guard_columns(df: DataFrame, fn: str) -> None:
    clash = [c for c in df.columns if c in _INTERNAL]
    if clash:
        raise ValueError(
            f"{fn}: input columns {clash} collide with internal working "
            "columns — rename them before probing"
        )


def _positions(df: DataFrame, key_col: str, m_bits: int, k_hashes: int) -> DataFrame:
    """One row per (input row, hash i): the bit position of hash_i(key)
    in ``_bloom_pos``. Portable hash: 60-bit md5 prefix of
    ``key || ':' || i`` mod m. Working columns carry a ``_bloom_``
    prefix (guarded) so they can never silently REPLACE a caller column
    of the same name — that failure mode multiplied probe rows per hash
    instead of ANDing the k bits."""
    _guard_columns(df, "_positions")
    return df.withColumn(
        "_bloom_i", F.explode(F.sequence(F.lit(0), F.lit(k_hashes - 1)))
    ).withColumn(
        "_bloom_pos",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col(key_col), F.lit(":"), F.col("_bloom_i").cast("string")
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % m_bits
        ),
    )


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = 2048, k_hashes: int = 3
) -> DataFrame:
    """Build the filter over ``df[key_col]`` (strings): returns
    ``(word long, bits long)`` — bit ``pos`` of the filter is bit
    ``pos % 32`` of the row with ``word == pos div 32``. Absent words are
    all-zero (the probe treats a missing word as no bits set)."""
    pos = _positions(df.select(key_col), key_col, m_bits, k_hashes)
    return (
        pos.select(
            F.expr("_bloom_pos div 32").cast("long").alias("word"),
            F.expr("shiftleft(1L, cast(_bloom_pos % 32 as int))").alias("b"),
        )
        .groupBy("word")
        .agg(F.bit_or("b").alias("bits"))
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR two filters of the SAME (m, k) geometry — the incremental-build
    primitive (yesterday's filter + today's batch filter)."""
    return a.unionByName(b).groupBy("word").agg(F.bit_or("bits").alias("bits"))


def bloom_contains(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m_bits: int = 2048,
    k_hashes: int = 3,
    out_col: str = "maybe_in_bloom",
) -> DataFrame:
    """``df`` plus a boolean ``out_col``: True iff ALL k hash bits of the
    key are set (maybe-present — false positives possible at the filter's
    designed rate, false negatives impossible). The bitmap (≤ m/32 rows)
    is broadcast; the probe side never shuffles.

    Rows are reassembled by grouping on ALL of ``df``'s columns, so
    exact duplicate rows collapse to one output row — probe with a
    distinct key set (the natural shape) or carry a row id. Probe
    columns named ``word``/``bits`` are fine (the bitmap joins under
    internal names); only the ``_bloom_*`` working names are reserved."""
    pos = _positions(df, key_col, m_bits, k_hashes)
    bm = bloom.select(
        F.col("word").alias("_bloom_word"), F.col("bits").alias("_bloom_bits")
    )
    checked = (
        pos.withColumn("_bloom_word", F.expr("_bloom_pos div 32").cast("long"))
        .join(F.broadcast(bm), "_bloom_word", "left")
        .withColumn(
            "_bloom_hit",
            F.coalesce(
                F.expr("_bloom_bits & shiftleft(1L, cast(_bloom_pos % 32 as int))")
                != 0,
                F.lit(False),
            ),
        )
    )
    keys = [c for c in df.columns]
    return (
        checked.groupBy(*keys)
        .agg(F.bool_and("_bloom_hit").alias(out_col))
    )


# ---------------------------------------------------------------------------
# Count-min sketch: mergeable frequency estimation, same portable hashing
# ---------------------------------------------------------------------------


def countmin_build(
    df: DataFrame, key_col: str, weight_col: str | None = None,
    width: int = 1024, depth: int = 4,
) -> DataFrame:
    """Build a count-min sketch over ``df[key_col]`` (strings): returns
    ``(row, col, cnt)`` — counter (i, h_i(key) % width) accumulates the
    key's weight (1 if ``weight_col`` is None) for each of the ``depth``
    hash rows. One explode + groupBy, map-side combined, at most
    width*depth output rows; two sketches of equal geometry merge by
    summed union (same algebra as bloom_merge) — the property that makes
    per-partition/per-day builds parallel and lets a 100 TB corpus's
    token-frequency table live in a few MB.

    Estimation guarantee (Cormode & Muthukrishnan 2005, public
    literature): estimate >= true count always (no underestimates), and
    overestimate <= 2N/width with probability 1 - (1/2)^depth. The repo's
    portable md5 hash family makes the sketch bit-identical across
    engines — the DuckDB oracle replays it."""
    w = F.lit(1).cast("long") if weight_col is None else F.col(weight_col).cast("long")
    pos = df.select(F.col(key_col).alias("_cm_k"), w.alias("_cm_w")).withColumn(
        "row", F.explode(F.sequence(F.lit(0), F.lit(depth - 1)))
    ).withColumn(
        "col",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("_cm_k"), F.lit("#"), F.col("row").cast("string"))),
                    1, 15,
                ),
                16, 10,
            ).cast("long")
            % width
        ),
    )
    return pos.groupBy("row", "col").agg(F.sum("_cm_w").alias("cnt"))


def countmin_estimate(
    keys: DataFrame, key_col: str, sketch: DataFrame,
    width: int = 1024, depth: int = 4, out_col: str = "est",
) -> DataFrame:
    """``keys`` plus the sketch's frequency estimate: min over the depth
    counters the key hashes into (absent counter = 0). The sketch
    (<= width*depth rows) broadcasts; the key side never shuffles beyond
    its own group-by. Same reassembly caveat as ``bloom_contains``:
    duplicate key rows collapse — probe with distinct keys. Key frames
    carrying columns named ``row``/``col``/``cnt`` are fine (the probe
    works entirely under ``_cm_*`` internal names, guarded)."""
    clash = [c for c in keys.columns if c.startswith("_cm_")]
    if clash:
        raise ValueError(
            f"countmin_estimate: input columns {clash} collide with internal "
            "working columns — rename them before probing"
        )
    pos = keys.withColumn(
        "_cm_row", F.explode(F.sequence(F.lit(0), F.lit(depth - 1)))
    ).withColumn(
        "_cm_col",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col(key_col), F.lit("#"), F.col("_cm_row").cast("string"))),
                    1, 15,
                ),
                16, 10,
            ).cast("long")
            % width
        ),
    )
    sk = sketch.select(
        F.col("row").alias("_cm_row"), F.col("col").alias("_cm_col"),
        F.col("cnt").alias("_cm_cnt"),
    )
    joined = pos.join(F.broadcast(sk), ["_cm_row", "_cm_col"], "left").withColumn(
        "_cm_c", F.coalesce(F.col("_cm_cnt"), F.lit(0).cast("long"))
    )
    return joined.groupBy(*keys.columns).agg(F.min("_cm_c").cast("long").alias(out_col))
