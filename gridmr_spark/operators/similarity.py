"""Similarity search over embedding columns (array<float>).

Two paths, per SURVEY.md §7.3 risk 4:
- ``cosine_topk``: brute-force exact — broadcast the (small) query set
  against all candidates; the correctness oracle and the right plan whenever
  |queries| is small (the common "find neighbors of these N items" shape).
- ``RandomHyperplaneLSH``: the scale path — sign-random-projection buckets
  with OR-amplification (L independent hash tables) + hamming-1 multi-probe.
  Sub-linear candidate generation; recall measured in tests against the
  exact path (on near-random vectors, the worst case for any LSH).

The dot product is a sequential double fold (F.aggregate over zip_with) —
codegen'd JVM expression, bit-identical to an equivalent sequential fold in
DuckDB, which is what makes the exact path oracle-checkable.
"""

from __future__ import annotations

import os
import random

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from gridmr_spark.functions.vectors import cosine_similarity, fold_cosine


def _dot(a: Column, b: Column) -> Column:
    """Sequential double fold over pre-cast double arrays."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def with_norm(df: DataFrame, vec_col: str, out_vec: str, out_norm: str) -> DataFrame:
    """Pre-cast the vector to double[] and precompute its L2 norm ONCE per
    row. cosine(a,b) = dot(va,vb)/(na*nb) is then one fold per pair instead
    of three — the dominant cost in all-pairs similarity. Bit-identical to
    computing the norms inline (same ops, same order, cast is exact)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return df.withColumn(out_vec, v).withColumn(
        out_norm,
        F.sqrt(F.aggregate(F.col(out_vec), F.lit(0.0), lambda acc, x: acc + x * x)),
    )


def cosine_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "c_id",
    c_vec: str = "c_vec",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    The query side is small by contract (the "find neighbors of these N
    items" shape) and is collected to a driver matrix shipped in the
    function closure — the ``cosine_topk_gemm`` layout — so the candidate
    table streams once through ONE ``mapInPandas`` and only (qid, cid,
    cosine) survivors come back; nothing per-pair ever crosses the Python
    boundary (guide §8: move decisions over small rows, not payloads; the
    earlier crossJoin shipped BOTH 64-dim vectors per pair — ~0.5 KB ×
    |Q|·|C| rows — which at the 1-NN eval shape cost more than the fold
    it replaced). Unlike the BLAS GEMM twin, scores here keep the exact
    sequential-fold IEEE operation order (dimension-major loop, each
    multiply/add/sqrt/divide individually rounded), so the output is
    bit-identical to the JVM fold and to DuckDB's list_reduce — the
    family's hash-oracle contract. Per-batch top-k with the family
    tiebreak (cosine desc, cid asc) makes the union a superset of the
    global top-k; the final window merge is therefore exact. Ranking ties
    break on candidate id for determinism.
    """
    # Driver-collect guard (guide §5): the query side is small BY CONTRACT,
    # but nothing used to enforce it — a misuse with a large query frame
    # OOM'd the driver silently. limit(cap+1) bounds the collect ITSELF
    # (never more than cap+1 rows cross to the driver, no extra job), and
    # row cap+1 arriving proves the contract was violated, so fail loudly.
    cap = int(os.environ.get("SPARK_GRAFT_TOPK_MAX_QUERIES", "65536"))
    qpdf = queries.select(q_id, q_vec).limit(cap + 1).toPandas()
    if len(qpdf) > cap:
        raise ValueError(
            f"cosine_topk: query side exceeds {cap} rows — this operator "
            "collects the query set to the driver and is only correct for a "
            "bounded query frame; use cosine_topk_gemm_blocked (neither side "
            "collected) or raise SPARK_GRAFT_TOPK_MAX_QUERIES deliberately"
        )
    spark = candidates.sparkSession
    if len(qpdf) == 0:
        return spark.createDataFrame(
            [], f"{q_id} long, {c_id} long, cosine double, rnk int"
        )
    q_ids = qpdf[q_id].to_numpy()
    Q = np.stack(qpdf[q_vec].to_numpy()).astype("float64")
    qq = np.zeros(len(Q))
    for d in range(Q.shape[1]):  # fold-order |q|^2: acc + x*x per dim
        qd = Q[:, d]
        qq = qq + qd * qd
    qn = np.sqrt(qq)
    out_schema = f"{q_id} long, {c_id} long, cosine double"

    def fold_topk_batches(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            C = np.stack(pdf[c_vec].to_numpy()).astype("float64")
            cids = pdf[c_id].to_numpy()
            nc, dim = C.shape
            dot = np.zeros((nc, len(Q)))
            cc = np.zeros(nc)
            for d in range(dim):  # dimension-major: the fold's order
                cd = C[:, d]
                dot = dot + cd[:, None] * Q[:, d][None, :]
                cc = cc + cd * cd
            with np.errstate(divide="ignore", invalid="ignore"):
                S = dot / (qn[None, :] * np.sqrt(cc)[:, None])
            if exclude_self:
                S[cids[:, None] == q_ids[None, :]] = -np.inf
            # Per-batch top-k, family tiebreak (cosine desc, cid asc).
            # NaN cosines (zero-norm vectors) sort LARGEST — matching
            # Spark's and DuckDB's NaN-greatest ordering in the merge.
            key = -S
            key[np.isnan(S)] = -np.inf
            kk = min(k, nc)
            order = np.lexsort(
                (np.broadcast_to(cids[:, None], S.shape), key), axis=0
            )
            top = order[:kk]
            out = pd.DataFrame(
                {
                    q_id: np.repeat(q_ids, kk),
                    c_id: cids[top].T.ravel(),
                    "cosine": np.take_along_axis(S, top, axis=0).T.ravel(),
                }
            )
            yield out[out["cosine"] != -np.inf]

    per_batch = candidates.select(c_id, c_vec).mapInPandas(
        fold_topk_batches, schema=out_schema
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("cosine"), F.asc(c_id))
    return per_batch.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= k)


def cosine_topk_gemm(
    queries_pdf,
    candidates: DataFrame,
    k: int = 5,
    c_id: str = "c_id",
    c_vec: str = "c_vec",
    exclude_self: bool = True,
) -> DataFrame:
    """High-throughput exact top-k: vectorized GEMM via mapInPandas.

    The query side arrives as a pandas DataFrame [id, vec] (it is small by
    contract); each Arrow batch of candidates becomes one numpy matrix
    multiply against the normalized query matrix — ~100x the scalar-fold
    throughput. Per batch only the local top-k per query survives, then one
    global window merge: union of per-batch top-k is a superset of the
    global top-k, so the result is exact.

    numpy's BLAS summation order differs from the sequential fold in the
    last ulps, so this variant is NOT oracle-hash-comparable — tests assert
    set-equality of the resulting pairs against cosine_topk instead. Use
    this one in production; keep the fold for cross-engine reproducibility.
    """
    import numpy as np
    import pandas as pd

    q_ids = queries_pdf.iloc[:, 0].to_numpy()
    Q = np.stack(queries_pdf.iloc[:, 1].to_list()).astype("float64")
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    out_schema = f"q_id long, {c_id} long, cosine double"

    def gemm_batches(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.stack(pdf[c_vec].to_list()).astype("float64")
            Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
            S = Cn @ Qn.T  # (batch, n_queries)
            cids = pdf[c_id].to_numpy()
            if exclude_self:
                S[cids[:, None] == q_ids[None, :]] = -np.inf
            kk = min(k, S.shape[0])
            top = np.argpartition(-S, kk - 1, axis=0)[:kk]  # per-query batch top-k
            rows = {
                "q_id": np.repeat(q_ids, kk),
                c_id: cids[top].T.ravel(),
                "cosine": np.take_along_axis(S, top, axis=0).T.ravel(),
            }
            out = pd.DataFrame(rows)
            yield out[out["cosine"] != -np.inf]

    per_batch = candidates.select(c_id, c_vec).mapInPandas(gemm_batches, schema=out_schema)
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc(c_id))
    return per_batch.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= k)


def cosine_topk_gemm_blocked(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    block_rows: int = 1024,
    cand_blocks: int | None = None,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "c_id",
    c_vec: str = "c_vec",
    exclude_self: bool = True,
    n_rows: int | None = None,
) -> DataFrame:
    """Block-matrix GEMM top-k: the scale shape of cosine_topk_gemm when
    NEITHER side fits the driver — a 2-D cogrouped grid, one Spark job, no
    driver-side loop.

    Queries hash into ceil(n/block_rows) row-blocks, candidates into
    `cand_blocks` column-blocks (default: the cluster's parallelism); each
    side is replicated across the other's block axis, cogrouped on
    (qblk, cblk), and every grid cell runs one numpy GEMM. All cells proceed
    in parallel. Replication cost is explicit and symmetric: each candidate
    row is shuffled n_qblocks times, each query row cand_blocks times — the
    2-D SUMMA trade, instead of the previous serial driver loop that scanned
    the candidate table once per block with zero inter-block parallelism.

    Exactness: the union of per-cell top-k is a superset of each query's
    global top-k (every candidate meets every query in exactly one cell),
    so the final window merge is exact.
    """
    import math

    # Grid sizing needs only an approximate row count; callers that know it
    # (parquet footer metadata via catalog.table_rows, a catalog statistic)
    # pass n_rows so planning costs zero jobs. The count() fallback exists
    # for ad-hoc frames only — at scale an extra scan wave per invocation.
    n = queries.count() if n_rows is None else n_rows
    if n == 0:
        return cosine_topk_gemm(
            queries.select(q_id, q_vec).limit(0).toPandas(), candidates, k,
            c_id=c_id, c_vec=c_vec, exclude_self=exclude_self,
        )
    n_qblk = max(1, math.ceil(n / block_rows))
    if cand_blocks is None:
        cand_blocks = max(1, queries.sparkSession.sparkContext.defaultParallelism)
    # Both grid keys must be the SAME type on both sides: pmod(xxhash64)
    # yields long while explode(array(lit(int))) yields int, and cogroup
    # groups each side independently — mismatched key types silently form
    # disjoint (long 2, int 2) cells whose other side is empty, losing
    # query×candidate coverage instead of failing loudly.
    qrep = queries.select(
        F.col(q_id).alias("q_id"),
        F.col(q_vec).alias("q_vec"),
        F.pmod(F.xxhash64(q_id), F.lit(n_qblk)).cast("int").alias("qblk"),
    ).withColumn("cblk", F.explode(F.array(*[F.lit(i) for i in range(cand_blocks)])))
    crep = candidates.select(
        F.col(c_id).alias("c_id"),
        F.col(c_vec).alias("c_vec"),
        F.pmod(F.xxhash64(c_id), F.lit(cand_blocks)).cast("int").alias("cblk"),
    ).withColumn("qblk", F.explode(F.array(*[F.lit(i) for i in range(n_qblk)])))

    def gemm_cell(qpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        if len(qpdf) == 0 or len(cpdf) == 0:
            return pd.DataFrame({"q_id": [], "c_id": [], "cosine": []})
        Q = np.stack(qpdf["q_vec"].to_list()).astype("float64")
        Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
        C = np.stack(cpdf["c_vec"].to_list()).astype("float64")
        Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
        S = Cn @ Qn.T  # (cell candidates, cell queries)
        q_ids = qpdf["q_id"].to_numpy()
        cids = cpdf["c_id"].to_numpy()
        if exclude_self:
            S[cids[:, None] == q_ids[None, :]] = -np.inf
        kk = min(k, S.shape[0])
        # Per-query cell top-k with the SAME tiebreak as the final window
        # merge (cosine desc, c_id asc): lexsort per column instead of
        # argpartition, whose arbitrary tie order could drop a survivor the
        # global merge expects when scores duplicate (e.g. repeated vectors).
        order = np.lexsort(
            (np.broadcast_to(cids[:, None], S.shape), -S), axis=0
        )
        top = order[:kk]
        out = pd.DataFrame(
            {
                "q_id": np.repeat(q_ids, kk),
                "c_id": cids[top].T.ravel(),
                "cosine": np.take_along_axis(S, top, axis=0).T.ravel(),
            }
        )
        return out[out["cosine"] != -np.inf]

    qkt = [qrep.schema[k].dataType for k in ("qblk", "cblk")]
    ckt = [crep.schema[k].dataType for k in ("qblk", "cblk")]
    assert qkt == ckt, f"cogroup key dtypes must match: {qkt} vs {ckt}"
    cells = (
        qrep.groupBy("qblk", "cblk")
        .cogroup(crep.groupBy("qblk", "cblk"))
        .applyInPandas(gemm_cell, schema="q_id long, c_id long, cosine double")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    merged = cells.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= k)
    return merged.select(F.col("q_id"), F.col("c_id").alias(c_id), "cosine", "rnk")


class IVFIndex:
    """Inverted-file (IVF) approximate search: partition the vector space by
    nearest-centroid, search only the `nprobe` closest cells per query.

    Centroids come from a deterministic seeded sample refined by a few
    Lloyd iterations — all as DataFrame jobs (no MLlib dependency, no
    driver-side loops over data; only the k centroids ever come to the
    driver). At 100 TB: k ~ sqrt(n) keeps cells balanced; the cell
    assignment is one broadcast-join pass; queries probe nprobe cells ->
    candidate volume ~ n * nprobe * assign_n / k per query batch.

    ``assign_n`` > 1 replicates each BASE vector into its assign_n nearest
    cells (cell-overlap / spill assignment, the SPANN-style boundary fix):
    a neighbor sitting just across a Voronoi boundary from the query's
    probed cells is still found via its second-nearest cell. Costs assign_n×
    index storage and candidate volume; buys the recall that nprobe alone
    can't reach on boundary-heavy (e.g. near-random) data.
    """

    def __init__(
        self,
        k: int = 16,
        nprobe: int = 3,
        iters: int = 2,
        seed: int = 42,
        assign_n: int = 1,
        fit_sample: int = 4096,
    ):
        self.k = k
        self.nprobe = nprobe
        self.iters = iters
        self.seed = seed
        self.assign_n = assign_n
        self.fit_sample = fit_sample

    def fit_centroids(self, df: DataFrame, vec_col: str) -> list[list[float]]:
        """Seeded deterministic init (orderBy xxhash64 sample) + Lloyd steps
        refined DRIVER-SIDE in numpy over the collected sample."""
        # Lloyd refinement runs over a deterministic hash-sample, not the
        # full table: at 100 TB a k-means fit is a sample-side estimation
        # problem (centroids from fit_sample >> k rows are statistically
        # indistinguishable from full-data centroids). The sample is
        # driver-bounded by construction (fit_sample x dim floats — the
        # SAME boundedness contract ProductQuantizer.fit already collects
        # under), so the refinement loop belongs on the driver: each
        # iteration was previously ~2 scheduled job waves (pandas-UDF
        # assign + posexplode shuffle + collect) over data the driver
        # already held — iters x that overhead bought nothing (guide
        # §1.2: fix the algorithm's job structure first). One collect,
        # zero per-iteration jobs. orderBy(h).limit(N) plans as
        # TakeOrdered — no full sort shuffle.
        rows = (
            df.select(
                F.col(vec_col).alias("v"),
                F.xxhash64(F.col(vec_col).cast("array<float>").cast("string")).alias("h"),
            )
            .orderBy("h")
            .limit(max(self.k, self.fit_sample))
            .collect()
        )
        X = np.stack([np.asarray(r.v, dtype="float64") for r in rows])
        C = X[: self.k].copy()  # h-order head: the same seeded init
        for _ in range(self.iters):
            # ||x-c||^2 up to the rank-constant |x|^2, (n, k) memory only
            d = -2.0 * (X @ C.T) + (C * C).sum(axis=1)[None, :]
            a = d.argmin(axis=1)  # first-index tiebreak, like the stable
            # argsort the distributed assign used
            for j in range(self.k):
                members = X[a == j]
                if len(members):
                    C[j] = members.mean(axis=0)
                # empty cell: keep the previous centroid (same rule as the
                # by_cell.get fallback the distributed fit applied)
        return [[float(x) for x in c] for c in C]

    def _nearest_cells_udf(self, centroids: list[list[float]], n: int):
        """Arrow-vectorized n-nearest-centroid computation: one numpy
        distance matrix per batch instead of k interpreted HOF folds per row
        (HOF lambdas are not codegen'd; profiling showed they dominate).
        ||v-c||^2 argmin/argsort with stable index tiebreak — same order the
        JVM struct-sort produced. Row results depend only on the row and the
        fixed centroid matrix: partition-invariant (asserted in tests)."""
        from pyspark.sql.functions import pandas_udf

        C = np.array(centroids, dtype="float64")  # (k, dim)
        Csq = (C * C).sum(axis=1)

        @pandas_udf("array<int>")
        def nearest(v: pd.Series) -> pd.Series:
            V = np.stack(v.to_list()).astype("float64")
            # full |v-c|^2 = |v|^2 - 2 v.c + |c|^2; |v|^2 is rank-constant
            d = -2.0 * (V @ C.T) + Csq[None, :]
            order = np.argsort(d, axis=1, kind="stable")[:, :n].astype("int32")
            return pd.Series(list(order))

        return nearest

    def assign(self, df: DataFrame, vec_col: str, centroids: list[list[float]]) -> DataFrame:
        """Nearest-centroid cell id per row (vectorized argmin per batch)."""
        nearest = self._nearest_cells_udf(centroids, 1)
        return df.withColumn("cell", nearest(F.col(vec_col))[0])

    def probe_cells(self, df: DataFrame, vec_col: str, centroids: list[list[float]]) -> DataFrame:
        """The nprobe nearest cells per query row (exploded)."""
        nearest = self._nearest_cells_udf(centroids, self.nprobe)
        return df.withColumn("cell", F.explode(nearest(F.col(vec_col))))

    def assign_multi(
        self, df: DataFrame, vec_col: str, centroids: list[list[float]]
    ) -> DataFrame:
        """The assign_n nearest cells per BASE row (exploded) — the
        cell-overlap index layout. assign_n=1 degenerates to assign()."""
        nearest = self._nearest_cells_udf(centroids, self.assign_n)
        return df.withColumn("cell", F.explode(nearest(F.col(vec_col))))

    def topk(self, df: DataFrame, id_col: str, vec_col: str, k: int = 5) -> DataFrame:
        """Approximate all-pairs top-k: one cogrouped GEMM per cell.

        Instead of exploding (qid, cid) candidate pairs and paying a
        per-pair dot product plus two vector joins (pair volume ~
        n²·nprobe·assign_n/k — near-quadratic row traffic), each cell's
        probing queries and resident base vectors cogroup once and a single
        numpy GEMM scores the whole cell; only per-cell top-k survivors
        (≤ k rows per query per cell) leave Python. Shuffled bytes are
        vectors × replication (assign_n + nprobe), never pairs. Per-cell
        survivors dedupe via max(cosine) — the same pair scored in two
        cells can differ in the last ulp between BLAS calls — then the
        global window merge ranks with the (cosine desc, cid asc) tiebreak,
        identical to the exact GEMM paths."""
        return self.topk_for_queries(df, df, id_col, vec_col, k)

    def topk_for_queries(
        self,
        queries: DataFrame,
        df: DataFrame,
        id_col: str,
        vec_col: str,
        k: int = 5,
    ) -> DataFrame:
        """Top-k of ``df`` for a SEPARATE query frame (same id/vec column
        names) — the bounded-query search shape, and the EXACT-REGIME
        entry point: with ``nprobe == self.k`` every query probes every
        cell, so each (query, base) pair shares at least one cell and the
        selection is provably identical to brute force — the cogrouped
        GEMM, cross-cell dedupe, and tiebreak machinery runs under a full
        equality oracle (`similarity_ivf_exact_regime`), while production
        settings (nprobe << k) keep the measured-recall contract. Queries
        never join base rows outside their probed cells, so cost is
        candidate volume, not n²... except in the exact regime, where
        probing all cells IS the n·|queries| scan, by design."""
        centroids = self.fit_centroids(df, vec_col)
        base = self.assign_multi(
            df.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec")),
            "cvec", centroids,
        ).select("cell", "cid", "cvec")
        qside = self.probe_cells(
            queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec")),
            "qvec", centroids,
        ).select("cell", "qid", "qvec")
        return self._cogroup_topk(qside, base, k)

    def _cogroup_topk(self, qside: DataFrame, base: DataFrame, k: int) -> DataFrame:
        """The search tail shared by the in-memory and persisted-index
        paths: per-cell cogrouped GEMM, cross-cell dedupe, global merge."""

        def gemm_cell(qpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
            if len(qpdf) == 0 or len(cpdf) == 0:
                return pd.DataFrame({"qid": [], "cid": [], "cosine": []})
            Q = np.stack(qpdf["qvec"].to_list()).astype("float64")
            Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
            C = np.stack(cpdf["cvec"].to_list()).astype("float64")
            Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
            S = Cn @ Qn.T  # (cell base rows, cell queries)
            q_ids = qpdf["qid"].to_numpy()
            cids = cpdf["cid"].to_numpy()
            S[cids[:, None] == q_ids[None, :]] = -np.inf  # self-pairs
            kk = min(k, S.shape[0])
            # Same tiebreak as the final merge: cosine desc, cid asc.
            order = np.lexsort(
                (np.broadcast_to(cids[:, None], S.shape), -S), axis=0
            )
            top = order[:kk]
            out = pd.DataFrame(
                {
                    "qid": np.repeat(q_ids, kk),
                    "cid": cids[top].T.ravel(),
                    "cosine": np.take_along_axis(S, top, axis=0).T.ravel(),
                }
            )
            return out[out["cosine"] != -np.inf]

        assert qside.schema["cell"].dataType == base.schema["cell"].dataType, (
            "cogroup key dtypes must match (mismatched types group disjointly)"
        )
        cells = (
            qside.groupBy("cell")
            .cogroup(base.groupBy("cell"))
            .applyInPandas(gemm_cell, schema="qid long, cid long, cosine double")
        )
        # ONE exchange for the whole merge tail (guide §2.4): hash-partition
        # the per-cell survivors by qid once — hashpartitioning(qid)
        # satisfies both the (qid, cid) dedupe aggregate's clustering (a
        # superset key is co-located by its subset) and the qid window's,
        # so the previous second exchange (agg keyed (qid,cid) → window
        # keyed (qid)) disappears; survivors are shuffled once, not twice.
        deduped = (
            cells.repartition("qid")
            .groupBy("qid", "cid")
            .agg(F.max("cosine").alias("cosine"))
        )
        w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
        return deduped.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= k)


class RandomHyperplaneLSH:
    """Sign-random-projection LSH for cosine similarity.

    L tables × b hyperplanes each (seeded, deterministic). Per table, a
    vector's b sign bits form its bucket; P[bit match] = 1 - theta/pi, so
    near vectors collide in at least one table with probability
    1 - (1 - p_table)^L (OR-amplification). Hamming-1 multi-probe on the
    query side adds b more probes per table without re-hashing.

    Tuning for 100 TB: bits controls bucket occupancy (candidates per
    partition ~ n/2^bits must fit executor memory); tables × probes buys
    recall linearly in compute. Both knobs are independent of data layout —
    the join is a plain equi-join on (table, bucket), shuffle-partitioned.
    """

    def __init__(self, dim: int, bits: int = 8, tables: int = 4, seed: int = 42):
        rng = random.Random(seed)
        self.dim = dim
        self.bits = bits
        self.tables = tables
        self.planes = [
            [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]
            for _ in range(tables)
        ]

    def _bucket_col(self, vec_col: str, table: int) -> Column:
        bucket = F.lit(0).cast("long")
        for j, plane in enumerate(self.planes[table]):
            lit_plane = F.array(*[F.lit(x) for x in plane])
            proj = F.aggregate(
                F.zip_with(F.col(vec_col), lit_plane, lambda v, p: v.cast("double") * p),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bit = F.when(proj >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
            bucket = bucket.bitwiseXOR(F.shiftleft(bit, j))
        return bucket

    def bucketize(self, df: DataFrame, vec_col: str, table: int = 0, out_col: str = "bucket") -> DataFrame:
        """Single-table bucket via JVM expressions (kept for plan-inspection
        and as the reference semantics for _tabled's vectorized twin)."""
        return df.withColumn(out_col, self._bucket_col(vec_col, table))

    def _tabled(self, df: DataFrame, id_alias: str, vec_alias: str) -> DataFrame:
        """One row per (vector, table) with that table's bucket id.

        Projections run as ONE Arrow-batched numpy GEMM per batch
        ((batch, dim) @ (dim, tables*bits)), not tables*bits interpreted
        higher-order-function folds per row: Spark does not codegen HOF
        lambdas, and profiling showed the projection stage — not the
        candidate join — dominates this operator's runtime. Each row's
        buckets depend only on that row and the fixed plane matrix, so the
        result is partition-invariant (asserted in tests)."""
        from pyspark.sql.functions import pandas_udf

        P = np.array(
            [plane for table in self.planes for plane in table], dtype="float64"
        )  # (tables*bits, dim)
        bits, tables = self.bits, self.tables
        weights = (1 << np.arange(bits)).astype("int64")

        @pandas_udf("array<long>")
        def table_buckets(v: pd.Series) -> pd.Series:
            V = np.stack(v.to_list()).astype("float64")
            signs = (V @ P.T >= 0).astype("int64")  # (batch, tables*bits)
            out = np.stack(
                [signs[:, t * bits : (t + 1) * bits] @ weights for t in range(tables)],
                axis=1,
            )  # (batch, tables)
            return pd.Series(list(out))

        return df.select(
            id_alias, vec_alias, F.posexplode(table_buckets(F.col(vec_alias))).alias("tbl", "bucket")
        )

    def topk_in_buckets(
        self,
        df: DataFrame,
        id_col: str,
        vec_col: str,
        k: int = 5,
        multiprobe: bool = True,
        max_bucket_members: int | None = None,
    ) -> DataFrame:
        """Approximate all-pairs top-k: equi-join on (table, bucket), union
        over tables via the exploded table column, exact cosine on the
        candidate set, dedupe, rank.

        ``max_bucket_members`` caps the BASE side of each (table, bucket) to
        that many members — the hot-key discipline the dedup family applies
        to shingles (max_shingle_df). bits targets an AVERAGE occupancy, but
        near-duplicate-dense data piles correlated vectors into the same
        buckets in every table, and candidate volume (hence runtime) grows
        with that density rather than with n — measured alpha 1.26 on the
        10x tiled corpus whose duplicate clusters are exactly such piles.
        The cap survivors are chosen by xxhash64(cid, tbl), so each table
        drops a DIFFERENT subset: with L tables a vector excluded from one
        hot bucket still meets its neighbors in the others, which is the
        same OR-amplification argument that gives LSH its recall in the
        first place (measured at the registered settings: recall 0.965 at
        sf0.1 — unchanged — and the sf0.1→sf1 scaling exponent fell from
        1.26 to 0.88, SCALING.md §Measured)."""
        # Bucket tables carry only (id, bucket) — vectors do NOT ride the
        # candidate-generation shuffle. The projection GEMM runs ONCE and is
        # materialized: base and qside are the same (id, tbl, bucket) frame
        # under different aliases, and without the checkpoint each side
        # re-runs the Arrow-batched projection over every vector — the stage
        # the class docstring identifies as dominating this operator.
        # Kept EAGER on measurement (r15 isolated A/B at sf0.1, 5 runs each,
        # 32 cores): eager 5.27 min / 5.52 med; lazy 5.57 / 6.89; no
        # checkpoint (the r13 shape) 5.79 / 6.05 — the r14 driver reading
        # that flagged this as a regression is not reproducible, and the
        # one-projection-pass property matters more as tables x corpus grows.
        tabled = self._tabled(
            df.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec")), "cid", "cvec"
        ).select("cid", "tbl", "bucket").localCheckpoint(eager=True)
        base = tabled
        if max_bucket_members is not None:
            wb = Window.partitionBy("tbl", "bucket").orderBy(
                F.xxhash64("cid", "tbl"), F.asc("cid")
            )
            base = (
                base.withColumn("_r", F.row_number().over(wb))
                .where(F.col("_r") <= max_bucket_members)
                .drop("_r")
            )
        qside = tabled.select(F.col("cid").alias("qid"), "tbl", "bucket")
        if multiprobe:
            probes = F.array(
                F.col("bucket"),
                *[F.col("bucket").bitwiseXOR(F.lit(1 << j).cast("long")) for j in range(self.bits)],
            )
            qside = qside.withColumn("bucket", F.explode(probes))
        # Dedupe candidate pairs BEFORE computing any cosine (multi-table +
        # multi-probe hits the same pair many times), then join the vectors
        # back and compute each pair's similarity exactly once.
        cand = (
            qside.join(base, ["tbl", "bucket"])
            .where(F.col("qid") != F.col("cid"))
            .select("qid", "cid")
            .distinct()
        )
        qvecs = df.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"))
        cvecs = df.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
        sims = (
            cand.join(qvecs, "qid")
            .join(cvecs, "cid")
            .select(
                "qid",
                "cid",
                # vectorized fold twin — bit-identical to the HOF fold
                fold_cosine("qvec", "cvec").alias("cosine"),
            )
        )
        w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
        return sims.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= k)


class ProductQuantizer:
    """Product quantization (PQ) ANN: the memory-compressed third leg of the
    approximate-similarity family, next to hyperplane LSH (hash buckets) and
    IVF (centroid cells).

    Vectors are split into ``m`` subvectors; each subspace gets a ``ksub``-
    centroid codebook (seeded numpy Lloyd over a deterministic hash-sample,
    driver-side — codebooks are m*ksub*dsub floats, always tiny). A vector
    is then stored as m byte-sized codes — 8 bytes instead of 256 for a
    64-dim float32 embedding, the 32x compression that lets a 100 TB corpus'
    index live in cluster RAM. Search is asymmetric distance computation
    (ADC): per query one (m, ksub) lookup table of subspace dot products;
    scoring a candidate is m table lookups, no float multiply. The ADC
    shortlist (top ``shortlist`` per query, merged across batches) is then
    re-ranked EXACTLY against the raw vectors — the standard two-stage
    pipeline, so PQ approximation error only costs recall when a true
    neighbor falls outside the shortlist, never final-score accuracy.

    Scale shape: codes stream through mapInPandas Arrow batches (candidate
    side never collected, shuffled bytes ~ n*m codes); per-batch top-R per
    query bounds what leaves Python; the exact re-rank touches only
    |queries| * shortlist rows. The query side is bounded by the same
    "fits the driver" contract as cosine_topk_gemm.
    """

    def __init__(
        self,
        m: int = 16,
        ksub: int = 32,
        iters: int = 10,
        seed: int = 7,
        fit_sample: int = 2048,
        shortlist: int = 96,
    ):
        self.m = m
        self.ksub = ksub
        self.iters = iters
        self.seed = seed
        self.fit_sample = fit_sample
        self.shortlist = shortlist

    def fit(self, df: DataFrame, vec_col: str) -> np.ndarray:
        """Per-subspace codebooks from a deterministic hash-sample.

        Returns (m, ksub, dsub) float64. Sampling mirrors IVFIndex: order by
        xxhash64 of the vector bytes, take fit_sample rows — a one-job,
        partition-invariant sample; Lloyd then runs in numpy on the driver
        (fit_sample x dim floats, bounded)."""
        rows = (
            df.select(
                F.col(vec_col).alias("v"),
                F.xxhash64(F.col(vec_col).cast("array<float>").cast("string")).alias("h"),
            )
            .orderBy("h")
            .limit(self.fit_sample)
            .collect()
        )
        X = np.stack([np.asarray(r.v, dtype="float64") for r in rows])
        # All-zero vectors have no direction: drop them from the fit sample
        # rather than dividing by zero into NaN codebooks (encoding still
        # handles them — a zero vector quantizes to whatever cell is nearest
        # to the origin, and its cosine is 0 against everything anyway).
        norms = np.linalg.norm(X, axis=1, keepdims=True)
        X = X[norms[:, 0] > 0] / np.maximum(norms[norms[:, 0] > 0], 1e-300)
        if len(X) == 0:
            raise ValueError("PQ fit sample contains only zero vectors")
        dim = X.shape[1]
        assert dim % self.m == 0, f"dim {dim} not divisible by m={self.m}"
        dsub = dim // self.m
        rng = np.random.RandomState(self.seed)
        # A codebook can't have more entries than fit rows (tiny tables):
        # shrink ksub LOCALLY rather than crash — codes stay valid, recall
        # if anything improves (quantization approaches identity). Never
        # write the shrunken value back to self: a reused instance must not
        # carry a tiny table's codebook size into later fits (topk derives
        # m/ksub from books.shape, so nothing downstream needs self.ksub).
        ksub = min(self.ksub, len(X))
        books = np.empty((self.m, ksub, dsub))
        for s in range(self.m):
            Xs = X[:, s * dsub : (s + 1) * dsub]
            C = Xs[rng.choice(len(Xs), ksub, replace=False)]
            for _ in range(self.iters):
                d = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
                a = d.argmin(axis=1)
                for j in range(ksub):
                    pts = Xs[a == j]
                    if len(pts):
                        C[j] = pts.mean(axis=0)
            books[s] = C
        return books

    def topk(
        self,
        df: DataFrame,
        id_col: str,
        vec_col: str,
        k: int = 5,
        query_bound: int = 1000,
    ) -> DataFrame:
        """Approximate top-k for the (bounded) query set against every row.

        Stage 1 — ADC: candidates are encoded and scored per Arrow batch
        against all queries at once via numpy gather (no per-row Python);
        per-batch top-``shortlist`` per query survives, the union's global
        top-``shortlist`` is the re-rank input (a superset argument makes
        the merge lossless w.r.t. the batch scores, same as the GEMM grid).
        Stage 2 — exact re-rank: shortlist pairs join back to raw candidate
        vectors; true cosine per pair; window top-k with the family's
        (cosine desc, cid asc) tiebreak."""
        qpdf = (
            df.where(F.col(id_col) < query_bound)
            .select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"))
            .toPandas()
        )
        if len(qpdf) == 0:
            # No queries under the bound (e.g. an id space starting above
            # it): empty result with the contract schema, not an np.stack
            # crash three layers down.
            return df.sparkSession.createDataFrame(
                [], "qid long, cid long, cosine double, rnk int"
            )
        books = self.fit(df, vec_col)
        m, ksub, dsub = books.shape
        q_ids = qpdf["qid"].to_numpy()
        Q = np.stack(qpdf["qvec"].to_list()).astype("float64")
        Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
        # LUT[q, s, j] = dot(q_sub_s, codebook[s, j]); ADC score of a coded
        # candidate approximates dot(q_unit, c_unit) = cosine.
        lut = np.einsum("qsd,sjd->qsj", Qn.reshape(len(Qn), m, dsub), books)
        R = self.shortlist

        def adc_batches(it):
            for pdf in it:
                if len(pdf) == 0:
                    continue
                cids = pdf["cid"].to_numpy()
                C = np.stack(pdf["cvec"].to_list()).astype("float64")
                C /= np.linalg.norm(C, axis=1, keepdims=True)
                Cs = C.reshape(len(C), m, dsub)
                # encode: per-subspace nearest codebook entry
                codes = np.empty((len(C), m), dtype="int64")
                for s in range(m):
                    d = (
                        (Cs[:, s, None, :] - books[None, s, :, :]) ** 2
                    ).sum(axis=2)
                    codes[:, s] = d.argmin(axis=1)
                # ADC gather: S[q, c] = sum_s lut[q, s, codes[c, s]]
                S = np.zeros((len(Qn), len(C)))
                for s in range(m):
                    S += lut[:, s, codes[:, s]]
                S[:, :] = np.where(
                    cids[None, :] == q_ids[:, None], -np.inf, S
                )  # self-pairs out
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

        cand = df.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
        scored = cand.mapInPandas(adc_batches, schema="qid long, cid long, adc double")
        return self._shortlist_rerank(scored, cand, Qn, q_ids, k)

    def _shortlist_rerank(self, scored, cand, Qn, q_ids, k: int) -> DataFrame:
        """Stage 2 shared by the in-memory and persisted-index paths:
        global top-``shortlist`` merge of the per-batch ADC survivors, then
        exact cosine re-rank over only |queries| x shortlist raw vectors."""
        R = self.shortlist
        wr = Window.partitionBy("qid").orderBy(F.desc("adc"), F.asc("cid"))
        short = (
            scored.withColumn("r", F.row_number().over(wr))
            .where(F.col("r") <= R)
            .select("qid", "cid")
        )
        # Exact re-rank: only |queries| * shortlist pairs touch raw vectors.
        rejoin = short.join(
            cand.withColumnRenamed("cvec", "v"), "cid"
        )

        def exact_rerank(it):
            for pdf in it:
                if len(pdf) == 0:
                    continue
                C = np.stack(pdf["v"].to_list()).astype("float64")
                C /= np.linalg.norm(C, axis=1, keepdims=True)
                qi = pdf["qid"].to_numpy()
                idx = {int(q): i for i, q in enumerate(q_ids)}
                rows = np.array([idx[int(q)] for q in qi])
                cos = (Qn[rows] * C).sum(axis=1)
                yield pd.DataFrame(
                    {"qid": pdf["qid"], "cid": pdf["cid"], "cosine": cos}
                )

        exact = rejoin.mapInPandas(exact_rerank, schema="qid long, cid long, cosine double")
        w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
        return (
            exact.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= k)
        )


# ---------------------------------------------------------------------------
# Binary (sign) quantization + Hamming search — the 32x-compression regime
# ---------------------------------------------------------------------------


def binary_signature(vec_col: str, dim: int, word_bits: int = 32) -> list[Column]:
    """Sign-quantize a float embedding into packed integer words: bit i of
    word w is 1 iff ``vec[w*word_bits + i] >= 0``. 32 bits per BIGINT word
    (not 63/64) keeps every packed value positive and small enough that
    the identical packing is expressible in any engine without signed-
    overflow edge cases — the DuckDB oracle replays it verbatim.

    Why this exists (Charikar's SimHash applied to model embeddings —
    public literature; also the "binary quantization" mode of every
    production vector store): a 64-dim float32 vector becomes 8 bytes, a
    32x compression, and Hamming distance (XOR + popcount, whole-stage
    codegen, no floats) approximates angle: E[hamming] = dim * theta/pi.
    The scale shape is two-stage: Hamming over signatures to a shortlist,
    exact cosine re-rank of the shortlist only — signatures for 1e9
    vectors fit in 8 GB where the floats need 256 GB.
    """
    n_words = -(-dim // word_bits)
    out = []
    for w in range(n_words):
        lo = w * word_bits
        bits = min(word_bits, dim - lo)
        out.append(
            F.expr(
                f"aggregate(sequence(0, {bits - 1}), 0L, "
                f"(acc, i) -> acc + IF({vec_col}[i + {lo}] >= 0.0, "
                f"shiftleft(1L, i), 0L))"
            ).alias(f"sig{w}")
        )
    return out


def hamming_topk(
    queries: DataFrame,
    cands: DataFrame,
    k: int,
    n_words: int,
    q_id: str = "q_id",
    c_id: str = "c_id",
) -> DataFrame:
    """Exact top-k by Hamming distance over packed signatures (columns
    ``sig0..sig{n_words-1}`` on both sides), ties by candidate id —
    integer-only, so fully deterministic across engines. The join is the
    bounded-query-side broadcast shape (|Q| << |C|, like cosine_topk);
    at corpus-x-corpus scale the production step is bucketing signatures
    by a word prefix (multi-index Hamming search) so only same-bucket
    pairs are compared — same banding algebra as the LSH path."""
    q = queries.select(q_id, *[F.col(f"sig{w}").alias(f"q_sig{w}") for w in range(n_words)])
    c = cands.select(c_id, *[F.col(f"sig{w}").alias(f"c_sig{w}") for w in range(n_words)])
    ham = None
    for w in range(n_words):
        term = F.bit_count(F.col(f"q_sig{w}").bitwiseXOR(F.col(f"c_sig{w}")))
        ham = term if ham is None else ham + term
    # explicit broadcast of the (bounded) query side, same as cosine_topk:
    # without it a bad size estimate degrades the non-equi join to a
    # two-sided CartesianProduct shuffle — the cost this shape exists to avoid
    joined = c.join(F.broadcast(q), F.col(q_id) != F.col(c_id)).withColumn(
        "hamming", ham.cast("long")
    )
    win = Window.partitionBy(q_id).orderBy(F.asc("hamming"), F.asc(c_id))
    return (
        joined.withColumn("rnk", F.row_number().over(win))
        .where(F.col("rnk") <= k)
        .select(q_id, c_id, "hamming", F.col("rnk").cast("long").alias("rnk"))
    )


def _band_exprs(
    n_words: int, total_bits: int, bands: int, word_bits: int = 32
) -> list[Column]:
    """One BIGINT expression per band: band j is the contiguous bit range
    [j*total_bits/b, (j+1)*total_bits/b) of the packed signature
    (columns ``sig0..sig{n_words-1}``, ``word_bits`` low bits each),
    re-packed into a single value. All shifts/masks are Python-computed
    literals, so the whole extraction is integer whole-stage codegen."""
    if not 1 <= bands <= total_bits:
        raise ValueError(
            f"hamming bands={bands} must be in [1, total_bits={total_bits}] "
            "(more bands than bits means zero-width bands)"
        )
    if total_bits > n_words * word_bits:
        raise ValueError(
            f"hamming total_bits={total_bits} exceeds the signature's "
            f"{n_words} words x {word_bits} bits = {n_words * word_bits}: "
            "a band would reference a nonexistent sig column (or band over "
            "unrelated columns and silently lose pairs)"
        )
    bounds = [round(j * total_bits / bands) for j in range(bands + 1)]
    out = []
    for j in range(bands):
        lo, hi = bounds[j], bounds[j + 1]
        if hi - lo > 60:
            raise ValueError(
                f"hamming band {j} spans {hi - lo} bits > 60: raise `bands` "
                "so each band packs into a positive BIGINT"
            )
        acc = None
        off = 0
        w0, w1 = lo // word_bits, (hi - 1) // word_bits
        for w in range(w0, w1 + 1):
            seg_lo = max(lo, w * word_bits)
            seg_hi = min(hi, (w + 1) * word_bits)
            width = seg_hi - seg_lo
            part = F.shiftright(F.col(f"sig{w}"), seg_lo - w * word_bits)
            part = part.bitwiseAND(F.lit((1 << width) - 1))
            shifted = part * F.lit(1 << off)
            acc = shifted if acc is None else acc + shifted
            off += width
        out.append(acc.alias(f"_hband{j}"))
    return out


def hamming_candidates(
    df: DataFrame,
    id_col: str,
    n_words: int,
    total_bits: int,
    bands: int,
    word_bits: int = 32,
) -> DataFrame:
    """Corpus x corpus candidate pairs by MULTI-INDEX banding over packed
    Hamming signatures: the signature's bits are partitioned into
    ``bands`` contiguous ranges; two signatures within Hamming radius
    r < bands must agree EXACTLY on at least one band (pigeonhole: <= r
    differing bits cannot touch all ``bands`` ranges), so only same-band
    same-value pairs are ever generated. One explode (b rows per
    signature) + one equi-join on (band_id, band_value) — a plain
    hash-shuffle join on a narrow key, no broadcast side needed, which is
    what makes the SELF-join feasible at 1e9 signatures where the
    broadcast-query shape of ``hamming_topk`` cannot go.

    Returns distinct ``(id_1, id_2, hamming)`` with id_1 < id_2 —
    UNVERIFIED candidates (hamming may exceed the caller's radius);
    ``hamming_pairs`` applies the radius filter. Exposed separately so
    tests can measure candidate reduction vs the n^2 floor.

    Shuffle shape: the exploded/banded stream carries ONLY
    ``(id, band_id, band_value)`` — the signature words are re-joined by
    id AFTER the distinct pair set exists. Folding the words through the
    explode would multiply shuffle bytes by ``bands`` (at 1e9 signatures
    the duplicated words, not the narrow band key, would dominate); the
    narrow shape pays instead two n-row equi-joins on id, which do NOT
    scale with ``bands``, and deduplicates pairs before the words are
    ever attached.
    """
    sigs = df.select(
        F.col(id_col).alias("_hid"),
        *[F.col(f"sig{w}") for w in range(n_words)],
    )
    banded = sigs.select(
        "_hid",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("bid"), e.alias("bval")
                    )
                    for j, e in enumerate(
                        _band_exprs(n_words, total_bits, bands, word_bits)
                    )
                ]
            )
        ).alias("_b"),
    ).select("_hid", F.col("_b.bid").alias("_bid"), F.col("_b.bval").alias("_bval"))
    pairs = (
        banded.select(F.col("_hid").alias("id_1"), "_bid", "_bval")
        .join(banded.select(F.col("_hid").alias("id_2"), "_bid", "_bval"),
              ["_bid", "_bval"])
        .where(F.col("id_1") < F.col("id_2"))
        .select("id_1", "id_2")
        .distinct()
    )
    lsig = sigs.select(
        F.col("_hid").alias("id_1"),
        *[F.col(f"sig{w}").alias(f"l_sig{w}") for w in range(n_words)],
    )
    rsig = sigs.select(
        F.col("_hid").alias("id_2"),
        *[F.col(f"sig{w}").alias(f"r_sig{w}") for w in range(n_words)],
    )
    ham = None
    for w in range(n_words):
        term = F.bit_count(F.col(f"l_sig{w}").bitwiseXOR(F.col(f"r_sig{w}")))
        ham = term if ham is None else ham + term
    return (
        pairs.join(lsig, "id_1")
        .join(rsig, "id_2")
        .select("id_1", "id_2", ham.cast("long").alias("hamming"))
    )


def hamming_pairs(
    df: DataFrame,
    id_col: str,
    n_words: int,
    radius: int,
    total_bits: int,
    bands: int | None = None,
    word_bits: int = 32,
) -> DataFrame:
    """All unordered pairs within Hamming ``radius`` over packed
    signatures — the corpus x corpus companion of ``hamming_topk``
    (which requires a bounded broadcastable query side). LOSSLESS by the
    pigeonhole guarantee as long as ``bands > radius`` (enforced); the
    driver oracle of ``dedup_binary_hamming_pairs`` proves it by hash
    equality against brute-force all-pairs.

    Scale shape: candidates are generated by one narrow-key equi-join
    (see ``hamming_candidates``); verification is XOR+popcount on the
    carried words. On clustered data (the near-dup regime this exists
    for) candidates track true-pair volume; as radius approaches the
    random-pair Hamming mode the bands necessarily thin out — the same
    s-curve economics as MinHash-LSH banding, measured in
    tests/test_similarity.py on planted clusters.
    """
    b = bands if bands is not None else radius + 1
    if b <= radius:
        raise ValueError(
            f"hamming_pairs: bands={b} <= radius={radius} would LOSE pairs "
            "(pigeonhole needs radius < bands); raise bands or lower radius"
        )
    if b > total_bits:
        raise ValueError(f"hamming_pairs: bands={b} > total_bits={total_bits}")
    cand = hamming_candidates(df, id_col, n_words, total_bits, b, word_bits)
    return cand.where(F.col("hamming") <= radius)
