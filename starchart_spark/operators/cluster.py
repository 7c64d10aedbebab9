"""Connected components over near-duplicate pair graphs.

Dedup pipelines emit PAIRS (exact, MinHash-verified, SimHash, cosine) but
act on CLUSTERS: keep one representative per component, drop the rest. The
graph is degenerate by construction — components are near-clique clusters
of duplicates with tiny diameter — so plain min-label propagation converges
in a few rounds; the O(log n) large-star/small-star dance would buy nothing
here while tripling the shuffles per round.

Each round is two narrow shuffles of (node, label) longs: propagate the
current label across edges (both directions), take the min per node, and
stop when no label changed (one scalar agg per round — the loop is
driver-side control flow over fully distributed data, never a collect of
rows). ``max_iters`` bounds the adversarial worst case (a path graph);
hitting it raises rather than silently returning unconverged labels.

Iterative caveat: every round MUST truncate lineage (``localCheckpoint``),
not just cache — a persisted DataFrame keeps its full logical plan, so
plan size doubles per round and Catalyst optimization time grows
exponentially with iteration count. (Measured: the 8-round path-graph test
ran minutes with persist, seconds with checkpoint.) On a cluster with
flaky executors use ``spark.sparkContext.setCheckpointDir`` + reliable
``checkpoint`` instead; the round structure is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iters: int = 50,
) -> DataFrame:
    """(doc_id, cluster_id) for every doc in some pair; cluster_id = min doc
    id of its component (a pure function of the edge set — deterministic
    across partitionings, per the repo's ordering rule)."""
    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .union(pairs.select(F.col(b_col).alias("u"), F.col(a_col).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select("u")
        .distinct()
        .withColumn("label", F.col("u"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        # neighbor labels: for node u, the labels of everyone it touches
        prop = (
            edges.join(labels.withColumnRenamed("u", "v"), "v")
            .groupBy("u")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(prop, "u", "left")
            .select(
                "u",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "u")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select(
                F.col("u").alias("doc_id"), F.col("label").alias("cluster_id")
            )
    raise RuntimeError(f"connected_components did not converge in {max_iters} iters")


def dedup_keep_representative(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "a_id",
    b_col: str = "b_id",
) -> DataFrame:
    """Survivors of cluster-level dedup: the min-id representative of every
    duplicate cluster plus every unpaired doc. The standard last step of a
    training-data near-dup pass."""
    cc = connected_components(pairs, a_col, b_col)
    losers = cc.filter(F.col("doc_id") != F.col("cluster_id")).select(id_col)
    return df.join(losers, id_col, "left_anti")
