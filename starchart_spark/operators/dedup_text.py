"""Document-level deduplication for training-data pipelines.

Five strategies, cheapest-first, all over ``documents(doc_id, text)``:

1. **exact** — hash-groupBy on the text; min doc_id survives. One shuffle on
   a 64-bit hash (never on the full text bytes at 100 TB).
2. **n-gram Jaccard (exact)** — token-shingle inverted index + self-join;
   quadratic only within shingle buckets. The *oracle* for the approximate
   methods.
3. **MinHash + LSH** — signature via k universal hashes over shingle hashes,
   banded into buckets; candidate pairs verified with exact Jaccard. The
   scale path: cost ~ O(N·k) + bucket-local joins, no all-pairs.
4. **SimHash** — 64-bit hyperplane sketch of the token multiset; near-dup =
   Hamming distance ≤ r, found via (d+1)-block exact-match banding.
5. **embedding cosine** — see operators/similarity.py; near-dup = cosine ≥ τ.

All thresholds/verifications happen on exact recomputation, so the
approximate stages control *recall/cost*, never correctness of reported
pairs (same probe-then-confirm contract as the bloom seen-filter).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SHINGLE_N = 3

# Mersenne prime 2^31-1: with a,b < p and x < p, a*x + b < 2^62 stays exact
# in JVM signed-64 arithmetic — so the universal hashes run as plain column
# expressions (whole-stage codegen), never in Python.
_P31 = (1 << 31) - 1


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Survivors of exact dedup: min id per identical text.

    Shuffles on xxhash64(text) (8 bytes/row); text itself stays columnar.
    A 64-bit collision at 10^10 docs is ~1e-3 likely across the whole corpus
    — acceptable for train-data dedup; use sha2-256 when it isn't.
    """
    return (
        df.select(F.col(id_col), F.xxhash64(F.col(text_col)).alias("__th"))
        .groupBy("__th")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )


def shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
             n: int = SHINGLE_N) -> DataFrame:
    """Distinct token n-gram shingles per document: (id, shingle).

    Windows build via ``text.sliding_ngrams`` (zip_with over slices —
    O(tokens)/doc; the previous transform+element_at lambda re-split the
    text per element per gram position, O(n·tokens²)/doc interpreted)."""
    from starchart_spark.operators import text as text_ops

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    sh = F.when(
        F.size(toks) >= n, text_ops.sliding_ngrams(toks, n)
    ).otherwise(F.array().cast("array<string>"))  # docs shorter than n: no shingles
    # explode(array_distinct(...)) already yields distinct shingles per doc
    # — the dropDuplicates([id, shingle]) this had was a logical no-op
    # costing a full exchange of every shingle string (guide §2.4 "a
    # distinct on data that is already unique")
    return text_ops.ensure_min_partitions(df).select(
        F.col(id_col), F.explode(F.array_distinct(sh)).alias("shingle")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = SHINGLE_N,
) -> DataFrame:
    """Exact Jaccard-similar pairs via shingle inverted index.

    Output: (a_id, b_id, jaccard) with a_id < b_id, jaccard rounded to 6dp
    for cross-engine comparability. Exact — this is the oracle the
    approximate methods are verified against. Every shingle participates,
    so hot shingles (stop phrases) blow up the bucket join at scale — use
    ``ngram_jaccard_pairs_prefix`` (result-identical, prefix-filtered) as
    the production path.
    """
    sh = shingles(df, id_col, text_col, n).persist()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("a_id"), "shingle")
    b = sh.select(F.col(id_col).alias("b_id"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed(id_col, "a_id").withColumnRenamed("n_sh", "na"), "a_id")
        .join(sizes.withColumnRenamed(id_col, "b_id").withColumnRenamed("n_sh", "nb"), "b_id")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )
    return out


def _verify_exact_jaccard(
    cands: DataFrame,
    df: DataFrame,
    threshold: float,
    id_col: str,
    text_col: str,
    n: int,
) -> DataFrame:
    """Exact-Jaccard verification of candidate (a_id, b_id) pairs: shingle
    only docs that appear in some candidate (semi-join pushes the filter to
    the scan), intersect along the candidate edges, keep pairs ≥ threshold.
    Output (a_id, b_id, jaccard) — reported pairs are always exact."""
    cand_ids = (
        cands.select(F.col("a_id").alias(id_col))
        .union(cands.select(F.col("b_id").alias(id_col)))
        .distinct()
    )
    sh = shingles(df.join(cand_ids, id_col, "left_semi"), id_col, text_col, n).persist()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("a_id"), "shingle")
    b = sh.select(F.col(id_col).alias("b_id"), "shingle")
    inter = (
        cands.join(a, "a_id")
        .join(b, ["b_id", "shingle"])
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed(id_col, "a_id").withColumnRenamed("n_sh", "na"), "a_id")
        .join(sizes.withColumnRenamed(id_col, "b_id").withColumnRenamed("n_sh", "nb"), "b_id")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


def ngram_jaccard_pairs_prefix(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = SHINGLE_N,
) -> DataFrame:
    """Exact Jaccard-similar pairs via PREFIX FILTERING (SSJoin/PPJoin
    family) — the scale path for ``ngram_jaccard_pairs``, result-identical
    at the same threshold.

    A pair with J(A,B) ≥ θ has |A∩B| ≥ ⌈θ·|A|⌉ and ≥ ⌈θ·|B|⌉, so with
    shingles in a global canonical order each side must expose an
    intersection element inside its first ``n_d − ⌈θ·n_d⌉ + 1`` shingles
    (prefix-filter lemma) — only those are indexed. Ordering by ascending
    document frequency puts stop-phrase shingles LAST, so the hot-shingle
    bucket explosion of the naive inverted-index join (its docstring's own
    caveat) never materializes: candidate generation cost tracks rare
    shingles. Candidates are then exact-verified, so reported pairs are
    exact regardless.

    The extra cost is one df-count aggregate and a per-doc rank window —
    both shuffle (shingle-hash, doc_id) narrow longs.
    """
    from pyspark.sql import Window

    sh = shingles(df, id_col, text_col, n)
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    ranked = (
        sh.join(dfreq, "shingle")
        .withColumn(
            "__r",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(F.asc("__df"), F.asc("shingle"))
            ),
        )
        .withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy(id_col)))
    )
    prefix = ranked.filter(
        F.col("__r") <= F.col("__n") - F.ceil(F.lit(threshold) * F.col("__n")) + 1
    ).select(F.col(id_col), "shingle", F.col("__n"))
    a = prefix.select(F.col(id_col).alias("a_id"), "shingle", F.col("__n").alias("na"))
    b = prefix.select(F.col(id_col).alias("b_id"), "shingle", F.col("__n").alias("nb"))
    cands = (
        a.join(b, "shingle")
        .filter(
            (F.col("a_id") < F.col("b_id"))
            # size filter: θ·max(na,nb) ≤ min(na,nb) is necessary for J ≥ θ
            & (F.ceil(F.lit(threshold) * F.greatest("na", "nb")) <= F.least("na", "nb"))
        )
        .select("a_id", "b_id")
        .dropDuplicates(["a_id", "b_id"])
        .persist()
    )
    return _verify_exact_jaccard(cands, df, threshold, id_col, text_col, n)


def _minhash_params(k: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _P31, size=k, dtype=np.int64)
    b = rng.integers(0, _P31, size=k, dtype=np.int64)
    return a, b


def minhash_signatures(
    spark: SparkSession,
    df: DataFrame,
    k: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = SHINGLE_N,
    seed: int = 42,
) -> DataFrame:
    """(id, sig array<long>[k]) MinHash signatures — entirely JVM-side.

    One hash-aggregate: ``groupBy(id).agg(min(h_0), …, min(h_{k-1}))`` over
    ``h_i(x) = (a_i·x + b_i) mod (2^31-1)`` with ``x = xxhash64(shingle) mod
    (2^31-1)``. Partial (map-side) aggregation collapses each doc's shingles
    before the exchange, so the shuffle carries k longs per doc — never the
    shingle set — and no Python worker runs at all (the previous
    ``applyInPandas`` formulation was the package's slowest stage at 100 TB
    shapes; this is the round-2 replacement, same verified-exact contract).
    """
    a, b = _minhash_params(k, seed)
    sh = shingles(df, id_col, text_col, n).select(
        F.col(id_col), F.pmod(F.xxhash64("shingle"), F.lit(_P31)).alias("__x")
    )
    aggs = [
        F.min((F.lit(int(a[i])) * F.col("__x") + F.lit(int(b[i]))) % F.lit(_P31)).alias(
            f"__h{i}"
        )
        for i in range(k)
    ]
    return (
        sh.groupBy(id_col)
        .agg(*aggs)
        .select(F.col(id_col), F.array(*[f"__h{i}" for i in range(k)]).alias("sig"))
    )


def minhash_lsh_pairs(
    spark: SparkSession,
    df: DataFrame,
    threshold: float = 0.8,
    k: int = 64,
    bands: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = SHINGLE_N,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding, verified with exact Jaccard.

    bands=16, rows=4 over k=64 ⇒ ~P(candidate) = 1-(1-j^4)^16: j=0.8 → 0.9996,
    j=0.3 → 0.12. Candidates then get exact Jaccard; only pairs ≥ threshold
    survive — reported pairs are exact, LSH only bounds recall/cost.
    """
    rows = k // bands
    sig = minhash_signatures(spark, df, k, id_col, text_col, n, seed)
    banded = sig.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bi: F.xxhash64(
                    F.concat_ws(
                        ",",
                        bi.cast("string"),
                        *[
                            F.element_at(F.col("sig"), (bi * rows + ri + 1).cast("int")).cast(
                                "string"
                            )
                            for ri in range(rows)
                        ],
                    )
                ),
            )
        ).alias("band", "bucket"),
    )
    cands = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bucket"])
        .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(F.col(f"x.{id_col}").alias("a_id"), F.col(f"y.{id_col}").alias("b_id"))
        .dropDuplicates(["a_id", "b_id"])
    )
    # exact verify on the candidate set only: shingle only docs that appear
    # in some candidate pair (semi-join pushes the filter into the scan)
    cands = cands.persist()
    return _verify_exact_jaccard(cands, df, threshold, id_col, text_col, n)


def simhash64(
    spark: SparkSession,
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """64-bit SimHash over token xxhash64s: (id, simhash long) — JVM-side.

    Per doc the sketch needs, for each bit j, the sign of ``Σ_tokens
    (2·bit_j - 1) = 2·Σ bit_j - n_tokens`` — so it is one hash-aggregate of
    64 conditional bit-count sums plus a count, then a 64-term constant-fold
    to reassemble the long (bit 63 contributes the two's-complement weight
    -2^63). Map-side partial aggregation, zero Python workers (round-2
    replacement of the per-doc ``applyInPandas`` formulation).
    """
    tok = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    ).withColumn("th", F.xxhash64("tok"))
    aggs = [
        F.sum(F.shiftrightunsigned(F.col("th"), j).bitwiseAND(F.lit(1))).alias(f"__s{j}")
        for j in range(64)
    ] + [F.count(F.lit(1)).alias("__n")]
    agg = tok.groupBy(id_col).agg(*aggs)
    weights = [-(1 << 63) if j == 63 else (1 << j) for j in range(64)]
    sim = None
    for j in range(64):
        term = F.when(
            (F.lit(2) * F.col(f"__s{j}")) > F.col("__n"), F.lit(weights[j]).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        sim = term if sim is None else sim + term
    return agg.select(F.col(id_col), sim.alias("simhash"))


def simhash_near_dupes(
    spark: SparkSession,
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pairs with SimHash Hamming distance ≤ r via block banding: split the
    64-bit hash into r+1 blocks — any pair within distance r matches exactly
    on ≥1 block (pigeonhole), so the join is equi, never all-pairs."""
    blocks = max_hamming + 1
    width = 64 // blocks
    sig = simhash64(spark, df, id_col, text_col)
    block_cols = [
        F.shiftrightunsigned(F.col("simhash"), bi * width).bitwiseAND(
            F.lit((1 << width) - 1)
        )
        for bi in range(blocks)
    ]
    banded = sig.select(
        F.col(id_col),
        "simhash",
        F.posexplode(F.array(*block_cols)).alias("block", "key"),
    )
    pairs = (
        banded.alias("x")
        .join(banded.alias("y"), ["block", "key"])
        .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("a_id"),
            F.col(f"y.{id_col}").alias("b_id"),
            F.bit_count(
                F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))
            ).alias("hamming"),
        )
        .dropDuplicates(["a_id", "b_id"])
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs
