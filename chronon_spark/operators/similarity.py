"""Similarity search over embedding columns (`array<float>`).

Two paths:
  * brute-force cosine top-k — exact baseline. The dot products run as a
    vectorized pandas UDF (numpy matmul over Arrow batches) with the query
    matrix BROADCAST to every executor: scan-shaped, no shuffle, scales
    linearly with the corpus.
  * LSH-bucketed ANN — random-hyperplane sign sketch (deterministic
    hyperplanes) bucket join for the 10^12-row path; exact cosine verifies
    within buckets.

Also exposes `cosine_expr` (pure Catalyst `F.zip_with`/`F.aggregate`
arithmetic) used wherever a JVM-side expression beats an Arrow hop
(e.g. verifying a small candidate set).
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
        )
    )


def cosine_expr(a: Column, b: Column) -> Column:
    # GREATEST guard: Spark 4 runs ANSI mode by default, so one all-zero
    # vector anywhere in the corpus would otherwise throw DIVIDE_BY_ZERO
    # and kill the job (the Arrow paths guard with max(norm, 1e-12) too)
    return dot_expr(a, b) / F.greatest(
        norm_expr(a) * norm_expr(b), F.lit(1e-12))


_M64 = (1 << 64) - 1


def _mix64(seed: int) -> float:
    """Deterministic uniform(-1,1) from an integer seed via the
    splitmix64 finalizer (engine-portable integer arithmetic). A single
    affine LCG step here is NOT enough: adjacent seeds produce heavily
    correlated outputs, which made the hyperplanes near-parallel
    (measured mean pairwise |cos| 0.43-0.67) — collapsing the effective
    sketch width and skewing bucket populations."""
    z = (seed * 0x9E3779B97F4A7C15 + 0x9E3779B97F4A7C15) & _M64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _M64
    z ^= z >> 31
    return (z / float(_M64)) * 2.0 - 1.0


def hyperplane_matrix(dim: int, planes: int) -> np.ndarray:
    """Fixed pseudo-random hyperplanes (planes x dim)."""
    return np.array(
        [[_mix64(p * 100_003 + d + 1) for d in range(dim)]
         for p in range(planes)],
        dtype=np.float64,
    )


def _valid_vec(vec_col: str, dim: int) -> Column:
    """Plan-side filter for embeddings the Arrow matmul paths can take:
    non-null, exactly `dim` elements, no null elements. One NULL or
    ragged row would otherwise crash the whole stage inside np.array."""
    c = F.col(vec_col)
    return (c.isNotNull() & (F.size(c) == dim)
            & F.forall(c, lambda x: x.isNotNull()))


def hyperplane_bits(vec: Column, dim: int, planes: int) -> Column:
    """Sign-bit sketch of a vector as a bigint.

    Arrow-batched pandas UDF doing ONE matmul per batch (n x dim @ dim x
    planes). The earlier Catalyst expression unrolled planes x dim nodes —
    fine at dim 8, a codegen blowup at dim 512-1024; the matmul is flat in
    plan size and faster per row. NULL/short vectors sketch to NULL."""
    H_T = hyperplane_matrix(dim, planes).T.copy()  # dim x planes
    weights = (np.int64(1) << np.arange(planes, dtype=np.int64))

    @F.pandas_udf("long")
    def _bits(s: pd.Series) -> pd.Series:
        if len(s) == 0:
            return pd.Series([], dtype="Int64")
        ok = np.array(
            [v is not None and len(v) == dim for v in s], dtype=bool
        )
        out = np.zeros(len(s), dtype=np.int64)
        if ok.any():
            M = np.array([list(v) for v, o in zip(s, ok) if o], dtype=np.float64)
            out[ok] = ((M @ H_T) >= 0).astype(np.int64) @ weights
        return pd.Series(out).mask(~ok, None).astype("Int64")

    return _bits(vec)


def brute_force_topk(
    corpus: DataFrame,
    queries: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k of each query vector against the corpus.

    queries: [(query_id, vector)] — a SMALL set, broadcast as a numpy
    matrix inside the UDF closure. One mapInPandas pass computes all
    query-corpus partial top-ks via matmul; a final tiny groupBy merges
    per-partition candidates (k * |queries| rows — trivial).

    NULL / wrong-dimension / null-element embeddings are dropped from
    the scan (same contract as hyperplane_bits sketching them to NULL).
    """
    out_schema = "query_id long, vec_id long, cosine double"
    if not queries:
        return corpus.sparkSession.createDataFrame(
            [], out_schema + ", rank int")
    qids = [q[0] for q in queries]
    Q = np.array([q[1] for q in queries], dtype=np.float64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    corpus = corpus.where(_valid_vec(vec_col, Q.shape[1]))

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
            sims = Qn @ Mn.T  # |queries| x batch
            top = min(k, sims.shape[1])
            idx = np.argpartition(-sims, top - 1, axis=1)[:, :top]
            rows = []
            ids = pdf[id_col].to_numpy()
            for qi in range(len(qids)):
                for j in idx[qi]:
                    rows.append((qids[qi], int(ids[j]), float(sims[qi, j])))
            yield pd.DataFrame(rows, columns=["query_id", "vec_id", "cosine"])

    partial = corpus.select(id_col, vec_col).mapInPandas(part, schema=out_schema)
    w = F.row_number().over(
        W.partitionBy("query_id")
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
    )
    return (
        partial.withColumn("rank", w)
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round(F.col("cosine") + 1e-9, 6).alias("cosine"), "rank")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    planes: int = 12,
    probes: int = 1,
) -> DataFrame:
    """ANN top-k: restrict the exact scoring to corpus rows whose
    hyperplane sketch matches the query's bucket (plus `probes`-bit
    neighboring buckets for recall). The bucket join replaces the full
    scan — at 10^12 rows the probe touches ~|corpus| / 2^planes rows."""
    if not queries:
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, vec_id long, cosine double, rank int")
    dim = len(queries[0][1])
    H = hyperplane_matrix(dim, planes)
    sketched = corpus.withColumn("bits", hyperplane_bits(F.col(vec_col), dim, planes))

    def q_buckets(vec: list[float]) -> list[int]:
        base = 0
        dots = H @ np.array(vec, dtype=np.float64)
        for p in range(planes):
            if dots[p] >= 0:
                base |= 1 << p
        buckets = {base}
        if probes >= 1:
            order = np.argsort(np.abs(dots))  # flip least-confident bits first
            for p in order[:probes]:
                buckets.add(base ^ (1 << int(p)))
        return sorted(buckets)

    spark = corpus.sparkSession
    qrows = [
        (qid, vec, b) for qid, vec in queries for b in q_buckets(vec)
    ]
    qdf = spark.createDataFrame(
        qrows, f"query_id long, qvec array<double>, bits long"
    )
    joined = sketched.join(F.broadcast(qdf), "bits")
    cos = cosine_expr(
        F.col(vec_col).cast("array<double>"), F.col("qvec")
    )
    # rank on the RAW cosine (rounding first let near-ties collapse and
    # be broken by vec_id, diverging from brute_force_topk's exact rank);
    # round only the reported value, like the exact path
    scored = joined.select(
        "query_id", F.col(id_col).alias("vec_id"), cos.alias("cos")
    ).distinct()
    w = F.row_number().over(
        W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    )
    return (
        scored.withColumn("rank", w)
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id",
                F.round(F.col("cos") + 1e-9, 6).alias("cosine"), "rank")
    )


def kmeans_centroids(
    X: np.ndarray, n_centroids: int, iters: int = 10, seed: int = 7
) -> np.ndarray:
    """Spherical k-means (cosine) on a driver-side training sample.

    Deterministic: seeded init, fixed Lloyd iteration count, ties broken
    by lowest centroid index (argmax). Returns L2-normalized centroids
    (n_centroids x dim). Empty clusters keep their previous centroid.
    """
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    n_centroids = min(n_centroids, len(Xn))
    C = Xn[rng.choice(len(Xn), size=n_centroids, replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(Xn @ C.T, axis=1)
        for c in range(n_centroids):
            members = Xn[assign == c]
            if len(members):
                m = members.sum(axis=0)
                norm = np.linalg.norm(m)
                if norm > 1e-12:
                    C[c] = m / norm
    return C


def kmeans_centroids_distributed(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int,
    train_n: int = 10_000,
    iters: int = 10,
    seed: int = 7,
) -> np.ndarray:
    """Spherical k-means trained WITHOUT collecting the sample: the
    driver only ever sees (a) n_centroids init rows and (b) one
    (partitions x n_centroids) partial-sum frame per Lloyd iteration.

    * training set: deterministic hash sample (salted xxhash64 of the id
      modulo 1e6 under train_n/|corpus|) — no global sort, no 100k-row
      collect; at any corpus size the sampled frame stays ~train_n rows.
    * init: the n_centroids sample rows with the smallest salted hash
      (tiny deterministic collect).
    * each Lloyd step is one Arrow pass emitting per-partition
      (cell, count, vec_sum) partials; the driver merges partitions x
      n_centroids rows in a fixed (cell, partition) order, so centroids
      are reproducible for a fixed input partitioning.
    """
    corpus = corpus.where(
        F.col(vec_col).isNotNull()
        & F.forall(F.col(vec_col), lambda x: x.isNotNull()))
    total = corpus.count()
    if total == 0:
        raise ValueError("cannot train IVF on an empty corpus")
    # hash threshold over the full 2^62 domain: a small fixed modulus
    # (e.g. 1e6) bottoms out at ratio 1/modulus, so at 10^12 rows the
    # "~train_n" sample would actually be ~10^6 rows
    dom = 1 << 62
    h = F.pmod(
        F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)), F.lit(dom)
    )
    sample = corpus.select(id_col, vec_col).withColumn("__h", h)
    if total > train_n:
        sample = sample.where(
            F.col("__h") < int(np.ceil(train_n / total * dom))
        )
    sample = sample.persist()
    init_rows = (
        sample.orderBy("__h", id_col).limit(n_centroids).collect()
    )
    dim0 = len(init_rows[0][vec_col])
    X0 = np.array([list(r[vec_col]) for r in init_rows
                   if len(r[vec_col]) == dim0], dtype=np.float64)
    C = X0 / np.maximum(np.linalg.norm(X0, axis=1, keepdims=True), 1e-12)
    k = len(C)
    # ragged rows (wrong dimension) can't enter the Lloyd matmuls
    sample = sample.where(F.size(F.col(vec_col)) == dim0)

    for _ in range(iters):
        Cb = C.copy()

        def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId() if TaskContext.get() else -1
            dim = Cb.shape[1]
            sums = np.zeros((k, dim), dtype=np.float64)
            cnts = np.zeros(k, dtype=np.int64)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                M = np.array(pdf[vec_col].tolist(), dtype=np.float64)
                Mn = M / np.maximum(
                    np.linalg.norm(M, axis=1, keepdims=True), 1e-12
                )
                a = np.argmax(Mn @ Cb.T, axis=1)
                order = np.argsort(a, kind="stable")
                bounds = np.searchsorted(a[order], np.arange(k + 1))
                np.add.at(cnts, np.arange(k), bounds[1:] - bounds[:-1])
                cum = np.vstack(
                    [np.zeros(dim), np.cumsum(Mn[order], axis=0)]
                )
                sums += cum[bounds[1:]] - cum[bounds[:-1]]
            nz = np.flatnonzero(cnts)
            yield pd.DataFrame(
                {
                    "pid": np.full(len(nz), pid, dtype=np.int64),
                    "cell": nz.astype(np.int32),
                    "cnt": cnts[nz],
                    "vsum": list(sums[nz]),
                }
            )

        partials = sample.mapInPandas(
            part, schema="pid long, cell int, cnt long, vsum array<double>"
        ).collect()
        sums = np.zeros_like(C)
        cnts = np.zeros(k, dtype=np.int64)
        for r in sorted(partials, key=lambda r: (r["cell"], r["pid"])):
            sums[r["cell"]] += np.asarray(r["vsum"])
            cnts[r["cell"]] += r["cnt"]
        for c in range(k):
            if cnts[c]:
                norm = np.linalg.norm(sums[c])
                if norm > 1e-12:
                    C[c] = sums[c] / norm
    sample.unpersist()
    return C


def ivf_assign_cells(
    corpus: DataFrame, centroids: np.ndarray, id_col: str, vec_col: str
) -> DataFrame:
    """One scan-shaped mapInPandas pass: nearest-centroid cell id per
    vector (batch matmul against the broadcast centroid matrix). The IVF
    analog of hyperplane_bits — flat plan size at any dim. Invalid
    embeddings (NULL / ragged / null elements) are dropped, matching the
    sketch path's NULL contract."""
    C = centroids.copy()
    corpus = corpus.where(_valid_vec(vec_col, C.shape[1]))

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(),
                    "vec": pdf[vec_col],
                    "cell": np.argmax(Mn @ C.T, axis=1).astype(np.int32),
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        part, schema="vec_id long, vec array<double>, cell int"
    )


def ivf_topk(
    corpus: DataFrame,
    queries: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_centroids: int = 64,
    nprobe: int = 8,
    train_n: int = 10_000,
    iters: int = 10,
    seed: int = 7,
) -> DataFrame:
    """IVF ANN top-k: coarse spherical-k-means quantizer + probe the
    nprobe nearest cells per query, exact cosine only on probed rows.

    The scale path alongside lsh_topk: training is fully distributed
    (kmeans_centroids_distributed — hash-sampled training set, driver
    sees only n_centroids init rows and partition x cell partial sums),
    cell assignment is one scan-shaped Arrow matmul pass, and the probe
    is a broadcast join on the cell id, so a query touches
    ~|corpus| * nprobe / n_centroids rows. With nprobe >= n_centroids
    every cell is probed and the result is EXACTLY brute_force_topk —
    the driver oracle pins that regime; recall at nprobe << n_centroids
    is pytest-measured.
    """
    spark = corpus.sparkSession
    if not queries:
        return spark.createDataFrame(
            [], "query_id long, vec_id long, cosine double, rank int")
    C = kmeans_centroids_distributed(
        corpus, id_col, vec_col, n_centroids,
        train_n=train_n, iters=iters, seed=seed,
    )

    cells = ivf_assign_cells(corpus, C, id_col, vec_col)

    qrows = []
    for qid, vec in queries:
        qn = np.array(vec, dtype=np.float64)
        qn = qn / max(np.linalg.norm(qn), 1e-12)
        order = np.argsort(-(C @ qn))[: min(nprobe, len(C))]
        for cell in order:
            qrows.append((qid, [float(x) for x in vec], int(cell)))
    qdf = spark.createDataFrame(
        qrows, "query_id long, qvec array<double>, cell int"
    )

    joined = cells.join(F.broadcast(qdf), "cell")
    cos = cosine_expr(F.col("vec").cast("array<double>"), F.col("qvec"))
    scored = joined.select("query_id", "vec_id", cos.alias("cos"))
    w = F.row_number().over(
        W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    )
    return (
        scored.withColumn("rank", w)
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "vec_id",
            F.round(F.col("cos") + 1e-9, 6).alias("cosine"),
            "rank",
        )
    )
