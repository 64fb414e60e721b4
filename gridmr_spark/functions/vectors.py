"""Vector column helpers for embedding similarity (array<float> columns).

Two renderings of the SAME float contract (sequential double fold,
bit-identical to DuckDB's list_reduce — verified by the similarity
family's hash oracles, not assumed):

- ``dot``/``l2_norm``/``cosine_similarity``: JVM higher-order-function
  expressions — zero Python boundary, the reference semantics.
- ``fold_cosine``: the Arrow-vectorized twin for pair-heavy stages. HOF
  lambdas are NOT codegen'd (they interpret per element), so at ~1e5+
  pairs the fold dominates the stage; the twin replays the identical
  per-pair operation sequence with one numpy ufunc per dimension across
  the whole batch — same bits, two orders of magnitude less overhead.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array<float|double> columns, accumulated in double."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            _c(a),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def fold_cosine(a: Column | str, b: Column | str, *, filter_safe: bool = False) -> Column:
    """Arrow-vectorized twin of ``cosine_similarity`` — bit-identical
    doubles, ~2 orders of magnitude faster per pair.

    The HOF fold is interpreted per element (Catalyst does not codegen
    lambda functions), which profiling shows dominates every exact-cosine
    pair stage. This twin keeps the EXACT per-pair IEEE operation
    sequence — cast each element to double, multiply (one rounding), then
    left-fold add in dimension order (one rounding per step), sqrt of the
    same-shaped self-fold, norm product, final divide — and vectorizes
    ACROSS pairs only: each numpy step is one elementwise ufunc per
    dimension (no FMA, no pairwise/BLAS reassociation), so every pair's
    result is the same double the JVM fold and DuckDB's list_reduce twin
    produce. The oracle hash gates of the similarity family verify this
    bit-for-bit on every run (guide §4.2: batch work belongs in
    vectorized native code; §4.1: only the two vector columns cross the
    boundary).

    ``filter_safe=True`` marks the UDF non-deterministic so a filter on
    the RESULT is not duplicated below its projection by filter pushdown
    (guide §4.4) — the function is pure; the flag only stops the
    optimizer from evaluating it twice per row. Use at call sites that
    filter on the returned cosine.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _fold_cos(q: pd.Series, c: pd.Series) -> pd.Series:
        if len(q) == 0:
            return pd.Series([], dtype="float64")
        Q = np.stack(q.to_numpy()).astype("float64")
        C = np.stack(c.to_numpy()).astype("float64")
        dot_ = np.zeros(len(Q))
        qq = np.zeros(len(Q))
        cc = np.zeros(len(Q))
        for d in range(Q.shape[1]):  # dimension-major: the fold's order
            qd = Q[:, d]
            cd = C[:, d]
            dot_ = dot_ + qd * cd
            qq = qq + qd * qd
            cc = cc + cd * cd
        with np.errstate(divide="ignore", invalid="ignore"):
            out = dot_ / (np.sqrt(qq) * np.sqrt(cc))
        return pd.Series(out)

    f = _fold_cos.asNondeterministic() if filter_safe else _fold_cos
    return f(_c(a), _c(b))
