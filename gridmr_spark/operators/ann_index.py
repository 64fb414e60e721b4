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

from gridmr_spark.functions.localdata import local_df
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

    def build(
        self,
        df: DataFrame,
        id_col: str,
        vec_col: str,
        path: str,
        centroids: list[list[float]] | None = None,
        refit_skew: float = 4.0,
    ) -> None:
        """Fit centroids, assign every base vector to its assign_n nearest
        cells, persist. Postings repartition BY CELL so each cell's rows are
        contiguous — at scale a probed search shuffles nothing on the base
        side (the cogroup's exchange is satisfied by the stored layout).
        ``centroids`` injects a fixed codebook instead of fitting (the
        exactness contract of ``append`` is row-equality to a build on the
        union UNDER THE SAME CENTROIDS — this is how tests state it).
        ``refit_skew`` is persisted: the cell-occupancy ratio beyond which
        ``append`` reports the index needs a refit."""
        spark = df.sparkSession
        idx = self.idx
        if centroids is None:
            centroids = idx.fit_centroids(df, vec_col)
        local_df(
            spark,
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
        # Per-cell occupancy statistics, persisted WITH the index: `append`'s
        # drift guard needs full-index cell counts, and recomputing them
        # there meant re-scanning the ENTIRE postings table on every
        # nightly append (guide §1.2 — don't re-derive what an artifact can
        # carry). One column-pruned pass over the just-written postings at
        # build time (O(build), which already wrote them) makes every
        # append O(k + |new|) instead of O(index).
        self._write_stats(
            spark,
            path,
            {
                int(r["cell"]): int(r["n"])
                for r in spark.read.parquet(_p(path, "postings.parquet"))
                .groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
            },
        )
        _write_meta(
            spark, path, kind="ivf", k=idx.k, nprobe=idx.nprobe,
            assign_n=idx.assign_n, refit_skew=float(refit_skew),
        )

    @staticmethod
    def _write_stats(spark: SparkSession, path: str, counts: dict[int, int]) -> None:
        local_df(
            spark,
            [(c, n) for c, n in sorted(counts.items())],
            "cell int, n long",
        ).coalesce(1).write.mode("overwrite").parquet(_p(path, "stats.parquet"))

    def _stored_centroids(self, spark: SparkSession, path: str) -> list[list[float]]:
        crows = spark.read.parquet(_p(path, "centroids.parquet")).collect()
        return [[float(x) for x in r.cvec] for r in sorted(crows, key=lambda r: r.cell)]

    def append(self, df_new: DataFrame, id_col: str, vec_col: str, path: str) -> dict:
        """Incremental add: assign the NEW vectors to the STORED centroids
        (no refit — centroids held fixed) and append their postings. Cost
        is O(|new| * k) assignment + one append write; the existing
        postings are untouched (parquet append adds files; the by-cell
        clustering of old files is preserved, new files carry the delta).
        Because assignment is a pure function of (vector, centroids), the
        appended index is ROW-IDENTICAL to a from-scratch build on the
        union with the same centroids — tests prove search equality.

        Drift guard: appending shifts cell occupancy; when the max/mean
        cell-count ratio (over the FULL postings — a column-pruned count
        on the narrow `cell` column) exceeds the build-time ``refit_skew``
        threshold, the returned dict says so. The caller decides when to
        pay the rebuild; searches stay CORRECT either way (occupancy skew
        costs probe balance, never wrongness).

        Returns {"added", "occupancy_skew", "needs_refit"}."""
        spark = df_new.sparkSession
        centroids = self._stored_centroids(spark, path)
        meta = read_meta(spark, path)
        # assign with the INDEX'S persisted parameters, not this instance's
        # construction args: an append job configured differently from the
        # builder (e.g. default assign_n) must not give new vectors a
        # different posting multiplicity than the old ones — that would
        # break the row-equality-to-union-build contract silently.
        assigner = IVFIndex(
            k=int(meta["k"]), nprobe=int(meta["nprobe"]),
            assign_n=int(meta["assign_n"]),
        )
        new_posts = assigner.assign_multi(
            df_new.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec")),
            "cvec",
            centroids,
        ).select("cell", "cid", "cvec").localCheckpoint(eager=True)
        # localCheckpoint: the assignment runs ONCE, feeding both the
        # delta's per-cell counts and the append write (an uncached plan
        # would execute it twice). The counts double as `added` (their
        # sum), so the old separate count() job is gone.
        new_counts = {
            int(r["cell"]): int(r["n"])
            for r in new_posts.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        added = sum(new_counts.values())
        new_posts.repartition("cell").write.mode("append").parquet(
            _p(path, "postings.parquet")
        )
        # Drift guard from the persisted per-cell stats + the delta — an
        # O(k) merge instead of the former full re-scan of the postings
        # table (O(index) per nightly append). Indexes written before the
        # stats artifact existed fall back to the scan once; the updated
        # stats are persisted either way, so the fallback self-heals.
        import os as _os

        if _os.path.isdir(_p(path, "stats.parquet")):
            counts = {
                int(r["cell"]): int(r["n"])
                for r in spark.read.parquet(_p(path, "stats.parquet")).collect()
            }
            for c, n in new_counts.items():
                counts[c] = counts.get(c, 0) + n
        else:  # post-append scan: already includes the delta
            counts = {
                int(r["cell"]): int(r["n"])
                for r in spark.read.parquet(_p(path, "postings.parquet"))
                .groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
            }
        self._write_stats(spark, path, counts)
        skew = float(max(counts.values())) / max(
            float(sum(counts.values())) / len(counts), 1e-300
        )
        stored = meta.get("refit_skew")
        threshold = 4.0 if stored is None else float(stored)
        return {
            "added": int(added),
            "occupancy_skew": skew,
            "needs_refit": skew > threshold,
        }

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
        centroids = self._stored_centroids(spark, path)
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

    @staticmethod
    def _encode_df(df: DataFrame, id_col: str, vec_col: str, books: np.ndarray) -> DataFrame:
        """Per-subspace argmin encode of ``df`` against ``books`` — the one
        encode definition shared by build and append, so an appended
        vector's codes are bit-identical to what a from-scratch encode
        with the same codebooks yields."""
        m, _ksub, dsub = books.shape

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

        return df.select(
            F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec")
        ).mapInPandas(encode, schema="cid long, codes array<int>")

    @staticmethod
    def _recon_err(df: DataFrame, vec_col: str, books: np.ndarray, sample: int = 1024) -> float:
        """Mean squared reconstruction error of a bounded deterministic
        sample under ``books`` — the drift statistic. Driver-side numpy on
        <= sample rows (same hash-order sampling idiom as the fits)."""
        m, _ksub, dsub = books.shape
        rows = (
            df.select(
                F.col(vec_col).alias("v"),
                F.xxhash64(F.col(vec_col).cast("array<float>").cast("string")).alias("h"),
            )
            .orderBy("h")
            .limit(sample)
            .collect()
        )
        if not rows:
            return 0.0
        X = np.stack([np.asarray(r.v, dtype="float64") for r in rows])
        norms = np.linalg.norm(X, axis=1, keepdims=True)
        X = X[norms[:, 0] > 0] / np.maximum(norms[norms[:, 0] > 0], 1e-300)
        if len(X) == 0:
            return 0.0
        Xs = X.reshape(len(X), m, dsub)
        err = 0.0
        for s in range(m):
            d = ((Xs[:, s, None, :] - books[None, s, :, :]) ** 2).sum(axis=2)
            err += float(d.min(axis=1).sum())
        return err / len(X)

    def _stored_books(self, spark: SparkSession, path: str) -> np.ndarray:
        brows = spark.read.parquet(_p(path, "codebooks.parquet")).collect()
        m = 1 + max(r.s for r in brows)
        ksub = 1 + max(r.j for r in brows)
        books = np.zeros((m, ksub, len(brows[0].cvec)))
        for r in brows:
            books[r.s, r.j] = np.asarray(r.cvec, dtype="float64")
        return books

    def build(
        self,
        df: DataFrame,
        id_col: str,
        vec_col: str,
        path: str,
        refit_err_ratio: float = 2.0,
    ) -> None:
        """Fit codebooks on the bounded sample, ENCODE THE WHOLE TABLE once
        (the expensive per-subspace argmin), persist codes. Search never
        encodes again — that is the entire point of the separation. The
        build-time reconstruction error (bounded sample) is persisted as
        the drift baseline ``append`` compares against."""
        spark = df.sparkSession
        books = self.pq.fit(df, vec_col)  # (m, ksub, dsub) float64
        m, ksub, _dsub = books.shape
        rows = [
            (s, j, [float(x) for x in books[s, j]])
            for s in range(m)
            for j in range(ksub)
        ]
        local_df(spark, rows, "s int, j int, cvec array<double>").coalesce(
            1
        ).write.mode("overwrite").parquet(_p(path, "codebooks.parquet"))
        self._encode_df(df, id_col, vec_col, books).write.mode("overwrite").parquet(
            _p(path, "codes.parquet")
        )
        _write_meta(
            spark, path, kind="pq", m=m, ksub=ksub, shortlist=self.pq.shortlist,
            build_recon_err=self._recon_err(df, vec_col, books),
            refit_err_ratio=float(refit_err_ratio),
        )

    def append(self, df_new: DataFrame, id_col: str, vec_col: str, path: str) -> dict:
        """Incremental add: encode the NEW vectors with the STORED
        codebooks (no refit) and append their codes — bit-identical to
        what a from-scratch encode of the union under the same codebooks
        would produce, because ``_encode_df`` is the single encode
        definition. Drift guard: the append batch's reconstruction error
        (bounded sample) against the build-time baseline; a batch from a
        shifted distribution quantizes worse, and when the ratio exceeds
        the persisted ``refit_err_ratio`` the dict says a refit is due.
        ADC scores degrade gracefully in between — the exact re-rank stage
        keeps final scores exact regardless.

        Returns {"added", "recon_err", "build_recon_err", "needs_refit"}."""
        spark = df_new.sparkSession
        books = self._stored_books(spark, path)
        # localCheckpoint: the per-subspace argmin encode (the expensive
        # stage) runs ONCE for both the count and the append write
        encoded = self._encode_df(df_new, id_col, vec_col, books).localCheckpoint(
            eager=True
        )
        added = encoded.count()
        encoded.write.mode("append").parquet(_p(path, "codes.parquet"))
        meta = read_meta(spark, path)
        base_err = 0.0 if meta.get("build_recon_err") is None else float(meta["build_recon_err"])
        ratio = 2.0 if meta.get("refit_err_ratio") is None else float(meta["refit_err_ratio"])
        err = self._recon_err(df_new, vec_col, books)
        return {
            "added": int(added),
            "recon_err": err,
            "build_recon_err": base_err,
            "needs_refit": base_err > 0 and err > ratio * base_err,
        }

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
        books = self._stored_books(spark, path)
        m, _ksub, dsub = books.shape
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
