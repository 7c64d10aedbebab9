"""Similarity search over an embedding column (array<float>).

Two paths:

- **brute-force cosine top-k** — the exactness baseline. Query vectors are
  broadcast as one dense numpy matrix; each corpus partition computes a
  blocked matrix product (`mapInPandas`, Arrow batches) and keeps its local
  top-k, then a single global top-k window finishes. Shuffle volume is
  O(#queries · k · partitions), never O(N).
- **LSH-bucketed ANN** — random-hyperplane signatures (deterministic seed)
  bucket the corpus; queries probe their own bucket (+ optional multi-probe),
  exact cosine reranks candidates. The scale path when #queries is large.
- **IVF ANN** — deterministic k-means-lite coarse quantizer; queries search
  their nprobe nearest centroid buckets, exact rerank. Trades index build
  cost for tighter candidate sets than LSH on clustered corpora;
  nprobe == n_centroids degenerates to exhaustive (tested equal to brute).

Determinism: similarities are rounded to 6 dp and ties break on vec_id, so
results are stable across engines and partitionings.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TOPK_SCHEMA = T.StructType(
    [
        T.StructField("q_id", T.LongType(), False),
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("sim", T.DoubleType(), False),
    ]
)


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def brute_force_topk(
    spark: SparkSession,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "vec_id",
    include_self: bool = False,
) -> DataFrame:
    """Exact cosine top-k for each query vector.

    Output: (q_id, vec_id, sim, rank), rank 1..k by (sim desc, vec_id asc).
    """
    q = queries.select(q_id_col, vec_col).toPandas()
    q_ids = q[q_id_col].to_numpy(dtype=np.int64)
    q_mat = _normalize(np.stack(q[vec_col].to_numpy()).astype(np.float64))
    bc = spark.sparkContext.broadcast((q_ids, q_mat))

    def _partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        q_ids_l, q_mat_l = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = _normalize(np.stack(pdf[vec_col].to_numpy()).astype(np.float64))
            sims = q_mat_l @ mat.T  # (Q, B)
            if not include_self:
                mask = q_ids_l[:, None] == ids[None, :]
                sims = np.where(mask, -np.inf, sims)
            kk = min(k, sims.shape[1])
            # local top-k per query (argpartition: O(B) per query)
            part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rows_q = np.repeat(q_ids_l, kk)
            rows_v = ids[part.ravel()]
            rows_s = np.take_along_axis(sims, part, axis=1).ravel()
            keep = np.isfinite(rows_s)
            yield pd.DataFrame(
                {"q_id": rows_q[keep], "vec_id": rows_v[keep],
                 "sim": np.round(rows_s[keep], 6)}
            )

    partial = corpus.select(id_col, vec_col).mapInPandas(_partial, _TOPK_SCHEMA)
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_pairs_exact(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine ≥ threshold, via JVM-side array arithmetic
    (zip_with + aggregate — whole-stage codegen, no Python).

    O(N²) — the small-N oracle for the LSH path; embedding near-dup over a
    candidate set in practice.
    """
    def norm(c):
        return F.sqrt(F.aggregate(c, F.lit(0.0), lambda a, x: a + x * x))

    a = corpus.select(
        F.col(id_col).alias("a_id"),
        F.col(vec_col).cast("array<double>").alias("va"),
    )
    b = corpus.select(
        F.col(id_col).alias("b_id"),
        F.col(vec_col).cast("array<double>").alias("vb"),
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return (
        a.crossJoin(b)
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("sim", F.round(dot / (norm(F.col("va")) * norm(F.col("vb"))), 6))
        .filter(F.col("sim") >= threshold)
        .select("a_id", "b_id", "sim")
    )


def cosine_pairs_lsh(
    spark: SparkSession,
    corpus: DataFrame,
    threshold: float = 0.8,
    n_planes: int = 4,
    n_tables: int = 32,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Production near-dup pair mining: LSH candidates → exact rerank.

    The scale path for ``cosine_pairs_exact`` (which stays the small-N
    oracle): same-bucket self-join in any table produces candidates —
    bucket-local, never all-pairs — and an exact JVM-side cosine keeps only
    pairs ≥ threshold, so reported pairs are exact and LSH only bounds
    recall. With n_planes=4, n_tables=32 a pair at cos 0.8 is missed with
    probability (1-(1-θ/π)^4)^32 ≈ 8e-7 — below the 6-dp determinism noise
    floor, so at thresholds ≥0.8 the exact-pairs SQL is a valid oracle.
    """
    sig = hyperplane_signatures(
        spark, corpus, n_planes, n_tables, dim, seed, id_col, vec_col
    )
    a = sig.select(
        F.col(id_col).alias("a_id"),
        F.col(vec_col).cast("array<double>").alias("va"),
        "bucket",
    )
    b = sig.select(
        F.col(id_col).alias("b_id"),
        F.col(vec_col).cast("array<double>").alias("vb"),
        "bucket",
    )
    cand = (
        a.join(b, "bucket")
        .filter(F.col("a_id") < F.col("b_id"))
        .dropDuplicates(["a_id", "b_id"])
    )

    def norm(c):
        return F.sqrt(F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x))

    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return (
        cand.withColumn("sim", F.round(dot / (norm(F.col("va")) * norm(F.col("vb"))), 6))
        .filter(F.col("sim") >= threshold)
        .select("a_id", "b_id", "sim")
    )


def hyperplane_signatures(
    spark: SparkSession,
    df: DataFrame,
    n_planes: int = 8,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "bucket",
) -> DataFrame:
    """Multi-table random-hyperplane LSH: one row per (vector, table) with a
    bucket id packing (table, sign pattern). Deterministic in (seed,
    n_planes, n_tables, dim). Recall for a pair at angle θ is
    1 - (1 - (1-θ/π)^n_planes)^n_tables."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))
    bc = spark.sparkContext.broadcast(planes)
    schema = T.StructType(df.schema.fields + [T.StructField(out_col, T.LongType(), False)])

    def _buckets(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pl = bc.value
        tables, p, _ = pl.shape
        weights = (1 << np.arange(p, dtype=np.int64))[None, :]
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            outs = []
            for t in range(tables):
                signs = (mat @ pl[t].T) > 0  # (B, p)
                code = (signs * weights).sum(axis=1)
                out = pdf.copy()
                out[out_col] = (np.int64(t) << 32) | code
                outs.append(out)
            yield pd.concat(outs, ignore_index=True)

    return df.mapInPandas(_buckets, schema)


def ivf_centroids(
    spark: SparkSession,
    corpus: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Train IVF coarse centroids with distributed Lloyd iterations.

    Deterministic k-means-lite: seeds are the ``n_centroids`` corpus vectors
    with the smallest Fibonacci-Weyl selector of their id (reproducible, no
    RNG); each iteration assigns vectors to their nearest centroid in a
    vectorized Arrow pass (centroids broadcast — a centroid table is model
    state, O(k·d) floats, the one thing that SHOULD live on every node) and
    emits per-batch partial sums, so the shuffle carries k rows per
    partition, never vectors. The k×d mean update happens driver-side —
    that is the standard k-means topology, not a data collect.
    """
    from starchart_spark.operators.sampling import selector

    seeds = (
        corpus.select(id_col, vec_col)
        .orderBy(selector(id_col), F.col(id_col))
        .limit(n_centroids)
        .toPandas()
    )
    cents = _normalize(np.stack(seeds[vec_col].to_numpy()).astype(np.float64))
    sums_schema = T.StructType(
        [
            T.StructField("cid", T.IntegerType(), False),
            T.StructField("n", T.LongType(), False),
            T.StructField("sums", T.ArrayType(T.DoubleType(), False), False),
        ]
    )
    for _ in range(n_iters):
        bc = spark.sparkContext.broadcast(cents)

        def _partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            c = bc.value
            for pdf in batches:
                if not len(pdf):
                    continue
                mat = _normalize(np.stack(pdf[vec_col].to_numpy()).astype(np.float64))
                cid = np.argmax(mat @ c.T, axis=1)
                rows = []
                for ci in np.unique(cid):
                    sel = mat[cid == ci]
                    rows.append((int(ci), len(sel), sel.sum(axis=0).tolist()))
                yield pd.DataFrame(rows, columns=["cid", "n", "sums"])

        parts = corpus.select(vec_col).mapInPandas(_partials, sums_schema).toPandas()
        new = cents.copy()
        for ci, grp in parts.groupby("cid"):
            total = np.stack(grp["sums"].to_numpy()).sum(axis=0)
            n = grp["n"].sum()
            if n:
                new[ci] = total / n
        cents = _normalize(new)
    return cents


def ann_topk_ivf(
    spark: SparkSession,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize the corpus into centroid
    buckets, search only each query's ``nprobe`` nearest buckets, exact
    cosine rerank (reported sims are exact; IVF bounds recall/cost).

    The scale shape: the corpus is scanned once to tag each vector with its
    bucket (pure Arrow pass, centroids broadcast); the search is a
    bucket-equi-join that touches nprobe/n_centroids of the corpus per
    query. ``nprobe == n_centroids`` degenerates to exhaustive search —
    equal to ``brute_force_topk`` by construction (pytest asserts it).
    """
    cents = ivf_centroids(spark, corpus, n_centroids, n_iters, id_col, vec_col)
    bc = spark.sparkContext.broadcast(cents)

    assign_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("vc", T.ArrayType(T.DoubleType(), False), False),
            T.StructField("cid", T.IntegerType(), False),
        ]
    )

    def _assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            cid = np.argmax(_normalize(mat) @ c.T, axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(dtype=np.int64),
                    "vc": list(mat),
                    "cid": cid.astype(np.int32),
                }
            )

    tagged = corpus.select(id_col, vec_col).mapInPandas(_assign, assign_schema)

    q = queries.select(id_col, vec_col).toPandas()
    q_mat = _normalize(np.stack(q[vec_col].to_numpy()).astype(np.float64))
    probe_cids = np.argsort(-(q_mat @ cents.T), axis=1)[:, :nprobe]
    probes = spark.createDataFrame(
        [
            (int(q[id_col].iloc[i]), [float(x) for x in q[vec_col].iloc[i]], int(c))
            for i in range(len(q))
            for c in probe_cids[i]
        ],
        T.StructType(
            [
                T.StructField("q_id", T.LongType(), False),
                T.StructField("vq", T.ArrayType(T.DoubleType(), False), False),
                T.StructField("cid", T.IntegerType(), False),
            ]
        ),
    )

    def norm(c):
        return F.sqrt(F.aggregate(c, F.lit(0.0), lambda a, x: a + x * x))

    cand = (
        F.broadcast(probes)
        .join(tagged, "cid")
        .filter(F.col("q_id") != F.col("vec_id"))
    )
    dot = F.aggregate(
        F.zip_with("vq", "vc", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    scored = cand.withColumn(
        "sim", F.round(dot / (norm(F.col("vq")) * norm(F.col("vc"))), 6)
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return (
        scored.select("q_id", "vec_id", "sim")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ann_topk_lsh(
    spark: SparkSession,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: same-bucket candidates in any table, exact cosine
    rerank. n_planes trades bucket size vs selectivity; n_tables buys recall.
    Reported sims are exact for the returned candidates."""
    c_sig = hyperplane_signatures(
        spark, corpus, n_planes, n_tables, dim, seed, id_col, vec_col
    )
    q_sig = hyperplane_signatures(
        spark, queries, n_planes, n_tables, dim, seed, id_col, vec_col
    )

    def norm(c):
        return F.sqrt(F.aggregate(c, F.lit(0.0), lambda a, x: a + x * x))

    cand = q_sig.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).cast("array<double>").alias("vq"),
        "bucket",
    ).join(
        c_sig.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("vc"),
            "bucket",
        ),
        "bucket",
    ).filter(F.col("q_id") != F.col("vec_id")).dropDuplicates(["q_id", "vec_id"])
    dot = F.aggregate(
        F.zip_with("vq", "vc", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    scored = cand.withColumn(
        "sim", F.round(dot / (norm(F.col("vq")) * norm(F.col("vc"))), 6)
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return (
        scored.select("q_id", "vec_id", "sim")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
