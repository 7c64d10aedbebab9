"""Deterministic sampling for training-data pipelines.

``df.sample()`` / ``sampleBy()`` draw from a partition-seeded RNG: results
change whenever partitioning changes, which breaks reproducible corpus
construction and is untestable against an oracle. These operators instead
hash a key column through a fixed multiplicative congruential step —
sampling becomes a pure row-wise predicate: partition-invariant,
replayable, engine-portable (the exact same integer arithmetic runs in
DuckDB), and pushes down to the scan like any filter.

Selector: ``h(id) = (id mod p) * a + b mod p`` over the Mersenne prime
p = 2^31-1 — every intermediate < 2^62, so it is ANSI-safe signed-long
arithmetic with no wraparound (same discipline as the MinHash kernels).
Uniformity is the standard LCG argument; for adversarial key patterns pass
a pre-hashed column instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

P31 = (1 << 31) - 1
# Fibonacci/Weyl multiplier ⌊p·(√5−1)/2⌋: the golden-ratio rotation has
# provably optimal discrepancy over sequential keys (a "classic LCG"
# multiplier near p/2 clusters even ids into the low selector range —
# caught by the salt test)
_A = 1_327_217_885
_B = 12_345
_SALT_STEP = 40_503_551  # arbitrary odd stride folding the salt into the key


def selector(id_col: Column | str, salt: int = 0) -> Column:
    """Deterministic pseudo-uniform value in [0, p): the sampling key."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    x = F.pmod(c + F.lit(salt * _SALT_STEP), F.lit(P31))
    return F.pmod(x * F.lit(_A) + F.lit(_B), F.lit(P31))


def sample_fraction(
    df: DataFrame, fraction: float, id_col: str = "doc_id", salt: int = 0
) -> DataFrame:
    """Keep ≈fraction of rows, deterministically: h(id) < fraction·p.
    A plain filter — no shuffle, pushes to the scan, identical result on
    any cluster size or partitioning."""
    return df.filter(selector(id_col, salt) < F.lit(int(fraction * P31)))


def sample_stratified(
    df: DataFrame,
    fractions: DataFrame,
    strata_col: str,
    id_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Per-stratum deterministic fractions (e.g. language rebalancing).

    ``fractions``: (strata_col, fraction double). Broadcast-joined (a
    strata dim is tiny by definition), then the same scan-level predicate;
    strata missing from the dim are dropped (fraction 0).
    """
    dim = F.broadcast(
        fractions.select(
            strata_col, (F.col("fraction") * P31).cast("long").alias("__thresh")
        )
    )
    return (
        df.join(dim, strata_col)
        .filter(selector(id_col, salt) < F.col("__thresh"))
        .drop("__thresh")
    )


def priority_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: int = 0,
    priority_col: str = "priority",
) -> DataFrame:
    """Deterministic weighted sample of k rows: priority sampling
    (Duffield–Lund–Thorup, JACM 2007) — priority q = w/u with u uniform,
    keep the k largest priorities. Near-optimal variance for subset-sum
    estimation over the sampled rows; the standard weighted counterpart to
    :func:`sample_exact_k` for quality- or length-weighted corpus draws.

    Exactness discipline: u comes from :func:`selector` (integer LCG) and
    q = w·p/u uses only IEEE multiply/divide — correctly-rounded ops, so
    the value (and therefore the selection and any oracle) is bit-identical
    on every engine and partitioning, unlike the exponential-race variant
    whose ``ln`` differs per libm. Ties broken by id. Distributed top-k
    (per-partition heads), never a global sort.
    """
    u = selector(id_col, salt) + 1  # uniform integer in [1, p]
    q = F.col(weight_col).cast("double") * float(P31) / u.cast("double")
    return (
        df.withColumn(priority_col, q)
        .orderBy(F.desc(priority_col), F.asc(id_col))
        .limit(k)
    )


def sample_exact_k(
    df: DataFrame, k: int, id_col: str = "doc_id", salt: int = 0
) -> DataFrame:
    """Exactly k rows, uniform without replacement, reproducible: the k
    smallest selector values (ties broken by id). Distributed top-k —
    partial per-partition heads, never a global sort of everything."""
    return (
        df.withColumn("__sel", selector(id_col, salt))
        .orderBy(F.asc("__sel"), F.asc(id_col))
        .limit(k)
        .drop("__sel")
    )
