"""Persisted ANN index artifacts — fit/search separation.

The in-memory IVF/PQ operators (similarity.py) refit on every call, which
is right for a one-shot query but wrong for production retrieval: at 100 TB
the index is built ONCE (nightly/offline) and searched many times, and the
build cost (centroid fit, codebook fit, full-table encode) must never be
paid at query time. This module writes each index as plain parquet
artifacts and searches from them with ZERO fit work:

IVF index layout (``PersistedIVF``)::

    <path>/meta.parquet       one row: k, nprobe, assign_n, kind
    <path>/centroids.parquet  (cell int, cvec array<double>)   [k rows]
    <path>/postings.parquet   (cell, cid, cvec), repartitioned by cell

PQ index layout (``PersistedPQ``)::

    <path>/meta.parquet       one row: m, ksub, shortlist, kind
    <path>/codebooks.parquet  (s, j, cvec array<double>)  [m*ksub rows]
    <path>/codes.parquet      (cid, codes array<int>)     [n rows, tiny]

Search reads only the artifacts plus — for PQ's exact re-rank — the raw
vectors of the |queries| x shortlist surviving pairs from the BASE TABLE
(codes are the index; raw vectors stay in the data lake, so the index is
m bytes/vector instead of 4·dim). Everything driver-side is bounded by
construction: k centroids, m*ksub codebook rows, the bounded query set.

Parquet keeps doubles bit-exact, so a persisted search returns EXACTLY the
rows the in-memory operator returns under the same parameters — asserted
in tests/test_ann_index.py, alongside a spy test proving search performs
no fit (reference parity: GridMR has no index artifacts at all; its only
persisted state is job outputs, ControlServiceImpl.java:397-427)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gridmr_spark.operators.similarity import IVFIndex, ProductQuantizer


def _p(path: str, name: str) -> str:
    return f"{path.rstrip('/')}/{name}"


def _write_meta(spark: SparkSession, path: str, **kv) -> None:
    pdf = pd.DataFrame({k: [v] for k, v in kv.items()})
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        _p(path, "meta.parquet")
    )


def read_meta(spark: SparkSession, path: str) -> dict:
    (row,) = spark.read.parquet(_p(path, "meta.parquet")).collect()
    return row.asDict()


class PersistedIVF:
    """Cell-overlap IVF with on-disk centroids + postings."""

    def __init__(self, k: int = 16, nprobe: int = 3, assign_n: int = 1, **fit_kw):
        self.idx = IVFIndex(k=k, nprobe=nprobe, assign_n=assign_n, **fit_kw)

    def build(self, df: DataFrame, id_col: str, vec_col: str, path: str) -> None:
        """Fit centroids, assign every base vector to its assign_n nearest
        cells, persist. Postings repartition BY CELL so each cell's rows are
        contiguous — at scale a probed search shuffles nothing on the base
        side (the cogroup's exchange is satisfied by the stored layout)."""
        spark = df.sparkSession
        idx = self.idx
        centroids = idx.fit_centroids(df, vec_col)
        spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
            "cell int, cvec array<double>",
        ).coalesce(1).write.mode("overwrite").parquet(_p(path, "centroids.parquet"))
        base = idx.assign_multi(
            df.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec")),
            "cvec",
            centroids,
        ).select("cell", "cid", "cvec")
        base.repartition("cell").write.mode("overwrite").parquet(
            _p(path, "postings.parquet")
        )
        _write_meta(
            spark, path, kind="ivf", k=idx.k, nprobe=idx.nprobe, assign_n=idx.assign_n
        )

    def search(
        self,
        spark: SparkSession,
        queries: DataFrame,
        qid_col: str,
        vec_col: str,
        path: str,
        k: int = 5,
    ) -> DataFrame:
        """Top-k from the stored index: NO centroid fit, NO base re-assign.
        Driver work is reading k centroid rows; everything else is the same
        cogrouped per-cell GEMM as the in-memory operator."""
        crows = spark.read.parquet(_p(path, "centroids.parquet")).collect()
        centroids = [
            [float(x) for x in r.cvec] for r in sorted(crows, key=lambda r: r.cell)
        ]
        qside = self.idx.probe_cells(
            queries.select(F.col(qid_col).alias("qid"), F.col(vec_col).alias("qvec")),
            "qvec",
            centroids,
        ).select("cell", "qid", "qvec")
        base = spark.read.parquet(_p(path, "postings.parquet"))
        return self.idx._cogroup_topk(qside, base, k)


class PersistedPQ:
    """Product quantization with on-disk codebooks + codes."""

    def __init__(self, **pq_kw):
        # identical defaults to the in-memory operator (m=16, ksub=32,
        # shortlist=96) so persisted and in-memory results are comparable
        self.pq = ProductQuantizer(**pq_kw)

    def build(self, df: DataFrame, id_col: str, vec_col: str, path: str) -> None:
        """Fit codebooks on the bounded sample, ENCODE THE WHOLE TABLE once
        (the expensive per-subspace argmin), persist codes. Search never
        encodes again — that is the entire point of the separation."""
        spark = df.sparkSession
        books = self.pq.fit(df, vec_col)  # (m, ksub, dsub) float64
        m, ksub, dsub = books.shape
        rows = [
            (s, j, [float(x) for x in books[s, j]])
            for s in range(m)
            for j in range(ksub)
        ]
        spark.createDataFrame(rows, "s int, j int, cvec array<double>").coalesce(
            1
        ).write.mode("overwrite").parquet(_p(path, "codebooks.parquet"))

        def encode(it):
            for pdf in it:
                if len(pdf) == 0:
                    continue
                C = np.stack(pdf["cvec"].to_list()).astype("float64")
                norms = np.linalg.norm(C, axis=1, keepdims=True)
                C /= np.maximum(norms, 1e-300)
                Cs = C.reshape(len(C), m, dsub)
                codes = np.empty((len(C), m), dtype="int32")
                for s in range(m):
                    d = ((Cs[:, s, None, :] - books[None, s, :, :]) ** 2).sum(axis=2)
                    codes[:, s] = d.argmin(axis=1)
                yield pd.DataFrame(
                    {"cid": pdf["cid"], "codes": list(codes)}
                )

        df.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec")).mapInPandas(
            encode, schema="cid long, codes array<int>"
        ).write.mode("overwrite").parquet(_p(path, "codes.parquet"))
        _write_meta(spark, path, kind="pq", m=m, ksub=ksub, shortlist=self.pq.shortlist)

    def search(
        self,
        df: DataFrame,
        id_col: str,
        vec_col: str,
        path: str,
        k: int = 5,
        query_bound: int = 1000,
    ) -> DataFrame:
        """ADC scan over STORED codes (gather-only — no encode, no fit),
        then the shared exact re-rank against the base table's raw vectors.
        ``df`` is the base table; it supplies the query set (ids under
        ``query_bound``, the family's contract) and the re-rank vectors."""
        spark = df.sparkSession
        brows = spark.read.parquet(_p(path, "codebooks.parquet")).collect()
        m = 1 + max(r.s for r in brows)
        ksub = 1 + max(r.j for r in brows)
        dsub = len(brows[0].cvec)
        books = np.zeros((m, ksub, dsub))
        for r in brows:
            books[r.s, r.j] = np.asarray(r.cvec, dtype="float64")
        qpdf = (
            df.where(F.col(id_col) < query_bound)
            .select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"))
            .toPandas()
        )
        if len(qpdf) == 0:
            return spark.createDataFrame([], "qid long, cid long, cosine double, rnk int")
        q_ids = qpdf["qid"].to_numpy()
        Q = np.stack(qpdf["qvec"].to_list()).astype("float64")
        Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
        lut = np.einsum("qsd,sjd->qsj", Qn.reshape(len(Qn), m, dsub), books)
        R = self.pq.shortlist

        def adc(it):
            for pdf in it:
                if len(pdf) == 0:
                    continue
                cids = pdf["cid"].to_numpy()
                codes = np.stack(pdf["codes"].to_list()).astype("int64")
                S = np.zeros((len(Qn), len(codes)))
                for s in range(m):
                    S += lut[:, s, codes[:, s]]
                S[:, :] = np.where(cids[None, :] == q_ids[:, None], -np.inf, S)
                rr = min(R, S.shape[1])
                order = np.lexsort(
                    (np.broadcast_to(cids[None, :], S.shape), -S), axis=1
                )[:, :rr]
                out = pd.DataFrame(
                    {
                        "qid": np.repeat(q_ids, rr),
                        "cid": np.take_along_axis(
                            np.broadcast_to(cids[None, :], S.shape), order, axis=1
                        ).ravel(),
                        "adc": np.take_along_axis(S, order, axis=1).ravel(),
                    }
                )
                yield out[out["adc"] != -np.inf]

        scored = (
            spark.read.parquet(_p(path, "codes.parquet"))
            .mapInPandas(adc, schema="qid long, cid long, adc double")
        )
        cand = df.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
        return self.pq._shortlist_rerank(scored, cand, Qn, q_ids, k)
