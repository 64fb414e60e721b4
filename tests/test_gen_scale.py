"""Invariants of the sf-tiling generator (tools/gen_scale.py).

The scaling-exponent measurements in SCALING.md are only meaningful if the
tiled dataset preserves the source's distribution SHAPES: referential
integrity must hold across copies (join fan-outs unchanged) and identity-
like columns must stay unique (otherwise dedup/fuzzy families measure a
duplication artifact, not scaling — both bugs were caught live in round 5).
"""

from __future__ import annotations

import subprocess
import sys

import duckdb
import pytest

BASE = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tiled(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sfx2"))
    subprocess.run(
        [sys.executable, "tools/gen_scale.py", "2", out, BASE],
        check=True, capture_output=True, cwd="/root/repo",
    )
    return out


def test_row_counts_scale_by_k(tiled):
    con = duckdb.connect()
    for t in ("customer", "supplier", "part", "orders", "lineitem",
              "events", "documents", "embeddings"):
        n0 = con.execute(f"SELECT count(*) FROM read_parquet('{BASE}/{t}.parquet')").fetchone()[0]
        n1 = con.execute(f"SELECT count(*) FROM read_parquet('{tiled}/{t}.parquet')").fetchone()[0]
        assert n1 == 2 * n0, t
    for t in ("region", "nation"):  # fixed dims copy once
        n0 = con.execute(f"SELECT count(*) FROM read_parquet('{BASE}/{t}.parquet')").fetchone()[0]
        n1 = con.execute(f"SELECT count(*) FROM read_parquet('{tiled}/{t}.parquet')").fetchone()[0]
        assert n1 == n0, t


def test_referential_integrity_preserved(tiled):
    con = duckdb.connect()
    for fact, fk, dim, pk in [
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("events", "user_id", "customer", "c_custkey"),
    ]:
        orphans = con.execute(
            f"SELECT count(*) FROM read_parquet('{tiled}/{fact}.parquet') f "
            f"WHERE NOT EXISTS (SELECT 1 FROM read_parquet('{tiled}/{dim}.parquet') d "
            f"WHERE d.{pk} = f.{fk})"
        ).fetchone()[0]
        assert orphans == 0, (fact, fk)


def test_identity_columns_stay_unique(tiled):
    """The round-5 live catches: duplicated s_name made the fuzzy family
    quadratic in an artifact; duplicated doc text / identical embeddings
    would do the same to dedup/ANN."""
    con = duckdb.connect()
    for t, c in [
        ("supplier", "s_name"), ("customer", "c_name"),
        ("documents", "text"), ("orders", "o_orderkey"),
        ("embeddings", "vec_id"), ("documents", "doc_id"),
    ]:
        n, d = con.execute(
            f"SELECT count(*), count(DISTINCT {c}) FROM read_parquet('{tiled}/{t}.parquet')"
        ).fetchone()
        assert n == d, (t, c)


def test_embeddings_copies_not_identical(tiled):
    """Copy k>0 vectors are perturbed+renormalized: no 2-way cosine-1 ties
    between a vector and its tiled sibling (which would distort ANN recall
    denominators), and norms stay ~1."""
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(f"{tiled}/embeddings.parquet")
    vec = np.array(t.column("embedding").to_pylist(), dtype="float64")
    n0 = len(vec) // 2
    a, b = vec[:n0], vec[n0:]
    norms = np.linalg.norm(vec, axis=1)
    # base vectors are unit-normalized by the driver only approximately;
    # the perturbed copies are renormalized exactly
    assert np.all(np.abs(np.linalg.norm(b, axis=1) - 1.0) < 1e-6)
    cos = (a * b).sum(axis=1) / (np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1))
    assert np.all(cos < 0.9999), "tiled sibling is an exact duplicate"
