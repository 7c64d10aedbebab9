"""Exact-integer Lloyd k-means: semantics pinned against a pure-Python
recompute, and the reproducibility contract (bit-identical on ANY
partitioning) asserted directly — the property the float trainer
(similarity.ivf_centroids) cannot offer and the whole reason this variant
exists.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from starchart_spark.operators import kmeans as km


def _vec_df(spark, vecs, ids=None, partitions=None):
    ids = ids if ids is not None else range(len(vecs))
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("embedding", T.ArrayType(T.FloatType(), False), False),
        ]
    )
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(ids, vecs)], schema
    )
    return df.repartition(partitions) if partitions else df


def _py_kmeans(vecs, k, iters):
    """Brute-force reference in plain ints — the module's recurrence
    re-derived independently (no numpy, no Spark). Returns the final
    centroids and one extra assignment over them (what train_and_assign
    counts)."""
    import math

    q = [[math.floor(x * km.QSCALE + 0.5) + km.OFFSET for x in v] for v in vecs]
    cents = [list(q[i]) for i in range(k)]  # ids are 0..n-1 in order

    def assign_all():
        out = []
        for row in q:
            dists = [sum((a - b) ** 2 for a, b in zip(row, c)) for c in cents]
            out.append(dists.index(min(dists)))  # first min == lowest cid
        return out

    for _ in range(iters):
        assign = assign_all()
        for ci in range(k):
            members = [q[i] for i in range(len(q)) if assign[i] == ci]
            if members:
                cents[ci] = [
                    sum(col) // len(members) for col in zip(*members)
                ]  # non-negative floor-div
    return cents, assign_all()


def _collect_cents(df):
    return {(r["cid"], r["pos"]): r["c_u"] for r in df.collect()}


def test_matches_python_reference(spark):
    vecs = [
        [0.1, 0.2],
        [0.11, 0.19],
        [-0.5, 0.4],
        [-0.52, 0.41],
        [0.9, -0.3],
        [0.88, -0.31],
        [0.5, 0.5],
    ]
    got = _collect_cents(km.kmeans(_vec_df(spark, vecs), k=3, iters=4))
    cents, final_assign = _py_kmeans(vecs, k=3, iters=4)
    want = {
        (ci, pos + 1): cents[ci][pos] - km.OFFSET
        for ci in range(3)
        for pos in range(2)
    }
    assert got == want
    sizes = {
        r["cid"]: r["n_assigned"]
        for r in km.train_and_assign(_vec_df(spark, vecs), k=3, iters=4).collect()
    }
    want_sizes = {ci: final_assign.count(ci) for ci in set(final_assign)}
    assert sizes == want_sizes


def test_partitioning_invariance(spark):
    """The contract: identical output on 1 partition and on 7 — int64 sums
    are order-independent and every division is non-negative floor-div."""
    vecs = [[((i * 37 + j * 11) % 100) / 100.0 - 0.4 for j in range(8)] for i in range(60)]
    a = _collect_cents(km.kmeans(_vec_df(spark, vecs, partitions=1), k=5, iters=3))
    b = _collect_cents(km.kmeans(_vec_df(spark, vecs, partitions=7), k=5, iters=3))
    assert a == b


def test_tie_breaks_to_lowest_cid(spark):
    """A vector equidistant from two centroids must go to the lower cid on
    both the training and assignment paths."""
    # seeds: ids 0,1 -> centroids at -1.0 and +1.0; vector 2 at exactly 0
    vecs = [[-1.0], [1.0], [0.0]]
    sizes = {
        r["cid"]: r["n_assigned"]
        for r in km.train_and_assign(_vec_df(spark, vecs), k=2, iters=1).collect()
    }
    # round 1: v2 ties between c0(-1e6+OFF) and c1(1e6+OFF) -> cid 0;
    # c0 becomes mean(-1e6, 0)= -5e5, c1 stays 1e6. final assign: v0,v2->0, v1->1
    assert sizes == {0: 2, 1: 1}


def test_empty_cluster_carries_previous_centroid(spark):
    """A centroid that attracts nothing keeps its previous coordinates
    instead of NaN/dropping (the LEFT JOIN carry-over in the oracle)."""
    # seed 1 = [10.0] never wins after round 1 because every vector sits
    # near 0 except the seed itself... seed vec IS in the data, so it keeps
    # one member. Force true emptiness: duplicate coordinates so seed 1's
    # only potential member moves to cluster 0 on the round-1 tie.
    vecs = [[0.0], [0.0], [0.01], [0.02]]
    got = _collect_cents(km.kmeans(_vec_df(spark, vecs), k=2, iters=1))
    # seeds: c0=[0.0], c1=[0.0] (identical) -> every vector ties -> all go
    # to cid 0 in round 1; c0 moves to the 4-vector mean (7500 micro-units)
    # while empty c1 must keep its seed value 0
    assert got == {(0, 1): 7500, (1, 1): 0}
    # the carried-over centroid is live again on the next assignment: the
    # two exact-0.0 vectors now sit at distance 0 from c1 and leave c0
    sizes = {
        r["cid"]: r["n_assigned"]
        for r in km.train_and_assign(_vec_df(spark, vecs), k=2, iters=1).collect()
    }
    assert sizes == {0: 2, 1: 2}


def _py_farthest_seeds(vecs, k):
    import math

    q = [[math.floor(x * km.QSCALE + 0.5) + km.OFFSET for x in v] for v in vecs]
    chosen = [0]  # smallest id first (ids are 0..n-1 in order)
    while len(chosen) < k:
        best = None
        for i in range(len(q)):
            mind = min(
                sum((a - b) ** 2 for a, b in zip(q[i], q[c])) for c in chosen
            )
            # max min-dist, tie -> lowest id (strict > keeps earliest)
            if best is None or mind > best[0]:
                best = (mind, i)
        chosen.append(best[1])
    return chosen


def test_farthest_seeding_matches_reference(spark):
    """Farthest-first picks the max-min-distance vector each round (ties
    to lowest id), and the Lloyd rounds on top agree with the Python
    recurrence seeded the same way."""
    vecs = [
        [0.0, 0.0],
        [0.01, 0.0],
        [1.0, 1.0],
        [-1.0, 1.0],
        [0.99, 1.01],
        [-1.0, 0.98],
    ]
    import math

    seeds = _py_farthest_seeds(vecs, 3)
    # spread: the near-duplicate of seed 0 (index 1) is never picked
    assert 1 not in seeds and len(set(seeds)) == 3
    q = [[math.floor(x * km.QSCALE + 0.5) + km.OFFSET for x in v] for v in vecs]
    cents = [list(q[i]) for i in seeds]
    for _ in range(2):
        assign = []
        for row in q:
            dists = [sum((a - b) ** 2 for a, b in zip(row, c)) for c in cents]
            assign.append(dists.index(min(dists)))
        for ci in range(3):
            members = [q[i] for i in range(len(q)) if assign[i] == ci]
            if members:
                cents[ci] = [sum(col) // len(members) for col in zip(*members)]
    want = {
        (ci, pos + 1): cents[ci][pos] - km.OFFSET
        for ci in range(3)
        for pos in range(2)
    }
    got = _collect_cents(km.kmeans(_vec_df(spark, vecs), k=3, iters=2, seed="farthest"))
    assert got == want


def test_farthest_partitioning_invariance(spark):
    vecs = [[((i * 53 + j * 17) % 97) / 97.0 - 0.3 for j in range(6)] for i in range(40)]
    a = _collect_cents(
        km.kmeans(_vec_df(spark, vecs, partitions=1), k=4, iters=2, seed="farthest")
    )
    b = _collect_cents(
        km.kmeans(_vec_df(spark, vecs, partitions=7), k=4, iters=2, seed="farthest")
    )
    assert a == b


def test_requires_k_vectors(spark):
    with pytest.raises(ValueError, match="at least k"):
        km.kmeans(_vec_df(spark, [[0.1], [0.2]]), k=3, iters=1)


def test_range_guard(spark):
    with pytest.raises(ValueError, match="range"):
        km.kmeans(_vec_df(spark, [[5.0], [0.1]]), k=2, iters=1)
