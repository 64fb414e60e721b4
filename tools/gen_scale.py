#!/usr/bin/env python3
"""Generate an sf1-scale dataset (~6M lineitem rows) for scaling
measurements, by tiling the driver's sf0.1 tables K times with consistent
key offsets.

Why tiling: TESTDATA.md forbids regenerating the driver's data and the
driver's generator isn't available, but a scaling EXPONENT only needs the
same schema and the same distribution *shapes* at 10x the rows. Tiling
preserves both exactly, and offsetting every key family by copy index
keeps referential integrity (copy k's lineitem references copy k's
orders/part/supplier) so join fan-outs and per-key densities match the
original — row counts scale, skew profile doesn't.

Three families need de-duplicating jitter:
- documents: each copy k>0 appends a ' c<k>' token, otherwise every doc
  gains 9 EXACT duplicates and the dedup family's candidate volume
  explodes unrealistically (near-dup structure across copies remains —
  one-token difference — which is the realistic hard case).
- embeddings: each copy is deterministically perturbed and re-normalized
  (seed = copy index), otherwise ANN queries see 10-way cosine-1 ties.
- key-derived names (s_name='Supplier#%09d', c_name likewise): rebuilt
  from the OFFSET key, exactly as the source generator would have named
  copy k's rows. Leaving them identical across copies gives every name 9
  exact clones, which turns the fuzzy-matching family quadratic in an
  artifact the real distribution doesn't have (names are unique per key).

Usage:
    python tools/gen_scale.py [K] [OUT_DIR]     # defaults: 10 /root/repo/.scale/sf1
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.1"

# key column -> (owning table, primary key) — the per-copy offset stride is
# max(pk)+1 MEASURED from the base (keys are dense 0..N-1 at every driver
# SF, but measuring keeps the tiler correct for any base). FK columns use
# their referenced table's stride so referential integrity holds per copy.
KEY_FAMILIES = {
    "c_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("customer", "c_custkey"),  # events.user_id joins c_custkey
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}
STRIDES: dict[str, int] = {}


def compute_strides(con, base: str) -> None:
    for col, (table, pk) in KEY_FAMILIES.items():
        STRIDES[col] = con.execute(
            f"SELECT max({pk}) + 1 FROM read_parquet('{base}/{table}.parquet')"
        ).fetchone()[0]


def tile_table(con, name: str, k_copies: int, out_dir: str) -> None:
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{BASE}/{name}.parquet')").fetchall()]
    selects = []
    for k in range(k_copies):
        exprs = []
        for c in cols:
            if c in STRIDES and k > 0:
                exprs.append(f"{c} + {k * STRIDES[c]} AS {c}")
            elif c == "text" and name == "documents" and k > 0:
                exprs.append(f"text || ' c{k}' AS text")
            elif c == "s_name" and k > 0:
                exprs.append(
                    f"'Supplier#' || lpad(CAST(s_suppkey + {k * STRIDES['s_suppkey']} AS VARCHAR), 9, '0') AS s_name"
                )
            elif c == "c_name" and k > 0:
                exprs.append(
                    f"'Customer#' || lpad(CAST(c_custkey + {k * STRIDES['c_custkey']} AS VARCHAR), 9, '0') AS c_name"
                )
            else:
                exprs.append(c)
        selects.append(
            f"SELECT {', '.join(exprs)} FROM read_parquet('{BASE}/{name}.parquet')"
        )
    con.execute(
        f"COPY ({' UNION ALL '.join(selects)}) TO '{out_dir}/{name}.parquet' (FORMAT PARQUET)"
    )


def tile_embeddings(k_copies: int, out_dir: str) -> None:
    t = pq.read_table(f"{BASE}/embeddings.parquet")
    vec = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    vid = t.column("vec_id").to_numpy()
    lab = t.column("label").to_pylist()
    parts = []
    for k in range(k_copies):
        if k == 0:
            v = vec
        else:
            rng = np.random.RandomState(k)
            v = vec + rng.normal(0, 0.05, vec.shape).astype(np.float32)
            v /= np.linalg.norm(v, axis=1, keepdims=True)
        parts.append(
            pa.table(
                {
                    "vec_id": pa.array(vid + k * STRIDES["vec_id"], type=pa.int64()),
                    "embedding": pa.array(v.tolist(), type=pa.list_(pa.float32())),
                    "label": pa.array(lab),
                }
            )
        )
    pq.write_table(pa.concat_tables(parts), f"{out_dir}/embeddings.parquet")


def main() -> None:
    global BASE
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scale/sf1"
    if len(sys.argv) > 3:
        BASE = sys.argv[3]
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    compute_strides(con, BASE)
    for name in ("region", "nation"):  # fixed-size dimensions: copy once
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{BASE}/{name}.parquet')) "
            f"TO '{out}/{name}.parquet' (FORMAT PARQUET)"
        )
    for name in ("customer", "supplier", "part", "orders", "lineitem", "events", "documents"):
        tile_table(con, name, k, out)
        print(f"{name}: tiled x{k}", file=sys.stderr)
    tile_embeddings(k, out)
    print(f"embeddings: tiled x{k}", file=sys.stderr)
    for name in ("lineitem", "orders", "events", "documents", "embeddings"):
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out}/{name}.parquet')").fetchone()[0]
        print(f"{name}: {n} rows", file=sys.stderr)


if __name__ == "__main__":
    main()
