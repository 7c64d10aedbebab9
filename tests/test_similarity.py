"""ANN / similarity-search operators over the embeddings table."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from starchart_spark.operators import similarity

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").persist()


def _numpy_topk(pdf, q_ids, k=5):
    ids = pdf["vec_id"].to_numpy()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    out = {}
    for q in q_ids:
        qv = mat[list(ids).index(q)]
        sims = np.round(mat @ qv, 6)
        order = sorted(zip(-sims, ids), key=lambda t: (t[0], t[1]))
        out[q] = [(int(v), float(-s)) for s, v in order if v != q][:k]
    return out


def test_brute_force_topk_exact(spark, emb):
    queries = emb.filter(F.col("vec_id") < 3)
    got_df = similarity.brute_force_topk(spark, emb, queries, k=5)
    got = {}
    for r in got_df.collect():
        got.setdefault(r["q_id"], []).append((r["rank"], r["vec_id"], r["sim"]))
    want = _numpy_topk(emb.toPandas(), [0, 1, 2], k=5)
    for q in (0, 1, 2):
        got_sorted = [(v, s) for _, v, s in sorted(got[q])]
        assert got_sorted == want[q]


def test_brute_force_partition_invariant(spark, emb):
    """Top-k must not depend on physical partitioning (local-topk merge)."""
    queries = emb.filter(F.col("vec_id") < 2)
    a = similarity.brute_force_topk(spark, emb.repartition(1), queries, k=5)
    b = similarity.brute_force_topk(spark, emb.repartition(13), queries, k=5)
    ka = sorted((r["q_id"], r["rank"], r["vec_id"]) for r in a.collect())
    kb = sorted((r["q_id"], r["rank"], r["vec_id"]) for r in b.collect())
    assert ka == kb


def test_cosine_pairs_exact_jvm(spark):
    rows = [
        (1, [1.0, 0.0]),
        (2, [1.0, 0.001]),
        (3, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {(r["a_id"], r["b_id"]) for r in similarity.cosine_pairs_exact(df, 0.99).collect()}
    assert out == {(1, 2)}


def test_ann_lsh_recall(spark, emb):
    """LSH ANN recall@5 vs brute force ≥ 0.6. The synthetic embeddings are
    near-orthogonal (top-1 cosine ≈ 0.33), the hardest case for hyperplane
    LSH — few planes + many tables is the right operating point."""
    queries = emb.filter(F.col("vec_id") < 10)
    brute = similarity.brute_force_topk(spark, emb, queries, k=5)
    ann = similarity.ann_topk_lsh(spark, emb, queries, k=5, n_planes=4, n_tables=16)
    b = {}
    for r in brute.collect():
        b.setdefault(r["q_id"], set()).add(r["vec_id"])
    a = {}
    for r in ann.collect():
        a.setdefault(r["q_id"], set()).add(r["vec_id"])
    recalls = [len(a.get(q, set()) & b[q]) / len(b[q]) for q in b]
    assert sum(recalls) / len(recalls) >= 0.6


def test_ann_ivf_exhaustive_equals_brute(spark, emb):
    """nprobe == n_centroids degenerates IVF to exhaustive search: identical
    (q_id, rank, vec_id) to brute force."""
    queries = emb.filter(F.col("vec_id") < 3)
    brute = similarity.brute_force_topk(spark, emb, queries, k=5)
    ivf = similarity.ann_topk_ivf(
        spark, emb, queries, k=5, n_centroids=8, nprobe=8
    )
    kb = sorted((r["q_id"], r["rank"], r["vec_id"]) for r in brute.collect())
    ki = sorted((r["q_id"], r["rank"], r["vec_id"]) for r in ivf.collect())
    assert kb == ki


def test_ann_ivf_recall(spark, emb):
    """IVF recall@5 vs brute at nprobe=4/16 on the near-orthogonal corpus
    (hardest case for a coarse quantizer too)."""
    queries = emb.filter(F.col("vec_id") < 10)
    brute = similarity.brute_force_topk(spark, emb, queries, k=5)
    ivf = similarity.ann_topk_ivf(spark, emb, queries, k=5, n_centroids=16, nprobe=4)
    b = {}
    for r in brute.collect():
        b.setdefault(r["q_id"], set()).add(r["vec_id"])
    a = {}
    for r in ivf.collect():
        a.setdefault(r["q_id"], set()).add(r["vec_id"])
    recalls = [len(a.get(q, set()) & b[q]) / len(b[q]) for q in b]
    assert sum(recalls) / len(recalls) >= 0.5


def test_brute_joined_equals_driver(spark, emb):
    """The DataFrame-joined exact formulation must reproduce the
    driver-broadcast BLAS one bit-for-bit (same rounding + tie-break)."""
    queries = emb.filter(F.col("vec_id") < 3)
    a = similarity.brute_force_topk(spark, emb, queries, k=7)
    b = similarity.brute_force_topk_joined(spark, emb, queries, k=7)
    ka = sorted((r["q_id"], r["rank"], r["vec_id"], r["sim"]) for r in a.collect())
    kb = sorted((r["q_id"], r["rank"], r["vec_id"], r["sim"]) for r in b.collect())
    assert ka == kb


def test_brute_joined_no_query_collect(spark, emb, monkeypatch):
    """Plan contract: the joined formulation never collects the query set
    to the driver (toPandas/collect on queries is the round-2 cliff)."""
    from pyspark.sql import DataFrame

    def boom(df):
        raise AssertionError("query set collected to driver")

    queries = emb.filter(F.col("vec_id") < 2)
    plan = similarity.brute_force_topk_joined(spark, emb, queries, k=3)
    monkeypatch.setattr(DataFrame, "toPandas", boom)
    # plan already declared; executing it must not need a driver collect
    assert plan.count() > 0


def test_ivf_index_build_once_search_many(spark, emb, tmp_path, monkeypatch):
    """Persisted index: two searches (and a reopen from disk) reuse ONE
    build — no centroid retraining, no corpus re-tagging per call."""
    idx = similarity.IvfIndex.build(
        spark, emb, str(tmp_path / "ivf"), n_centroids=8, n_iters=2
    )
    # one-shot path with identical params (deterministic training) is the
    # reference result
    queries = emb.filter(F.col("vec_id") < 3)
    want = sorted(
        (r["q_id"], r["rank"], r["vec_id"])
        for r in similarity.ann_topk_ivf(
            spark, emb, queries, k=5, n_centroids=8, nprobe=3, n_iters=2
        ).collect()
    )

    def no_retrain(*a, **kw):
        raise AssertionError("ivf_centroids retrained on a search call")

    monkeypatch.setattr(similarity, "ivf_centroids", no_retrain)
    got1 = sorted(
        (r["q_id"], r["rank"], r["vec_id"])
        for r in idx.search(spark, queries, k=5, nprobe=3).collect()
    )
    got2 = sorted(
        (r["q_id"], r["rank"], r["vec_id"])
        for r in similarity.ann_topk_ivf(
            spark, emb, queries, k=5, nprobe=3, index=idx
        ).collect()
    )
    reopened = similarity.IvfIndex.open(str(tmp_path / "ivf"))
    got3 = sorted(
        (r["q_id"], r["rank"], r["vec_id"])
        for r in reopened.search(spark, queries, k=5, nprobe=3).collect()
    )
    assert got1 == want and got2 == want and got3 == want


def test_ivf_index_incremental_add(spark, emb, tmp_path):
    """``add`` tags ONLY the appended vectors against the frozen quantizer:
    final assignment equals re-tagging those rows with the stored centroids,
    and re-adding is an idempotent merge."""
    base = emb.filter(F.col("vec_id") % 2 == 0)
    extra = emb.filter(F.col("vec_id") % 2 == 1)
    idx = similarity.IvfIndex.build(
        spark, base, str(tmp_path / "ivf2"), n_centroids=8, n_iters=2
    )
    n_base = idx.assign.read(spark).count()
    idx.add(spark, extra)
    allrows = idx.assign.read(spark)
    assert allrows.count() == emb.count()
    # appended rows must carry the same cid a fresh tag pass (same frozen
    # centroids) would give them
    cents = idx._load_cents(spark)
    want = {
        r["vec_id"]: r["cid"]
        for r in similarity._tag_assign(spark, extra, cents).collect()
    }
    got = {
        r["vec_id"]: r["cid"]
        for r in allrows.join(extra.select("vec_id"), "vec_id", "left_semi").collect()
    }
    assert got == want
    # idempotent re-add
    idx.add(spark, extra)
    assert idx.assign.read(spark).count() == n_base + len(want)


def test_ivf_search_no_query_collect(spark, emb, tmp_path, monkeypatch):
    """Joined-query IVF search: the query set is never collected to the
    driver (probe selection is a broadcast join against the centroid
    table, not a numpy argsort)."""
    from pyspark.sql import DataFrame

    idx = similarity.IvfIndex.build(
        spark, emb, str(tmp_path / "ivf3"), n_centroids=8, n_iters=2
    )
    queries = emb.filter(F.col("vec_id") < 2)
    plan = idx.search(spark, queries, k=3, nprobe=2)

    def boom(df):
        raise AssertionError("query set collected to driver")

    monkeypatch.setattr(DataFrame, "toPandas", boom)
    assert plan.count() > 0


def test_semantic_dedup_lsh_equals_exact_and_dominance(spark, emb):
    """The production LSH path and the O(N²) exact path agree on the kept
    set at the validated recall parameters, and the kept set satisfies the
    dominance rule: no kept vec has a lower-id kept-or-dropped neighbor at
    sim ≥ threshold (spot-checked via exact pairs)."""
    corpus = emb.filter(F.col("vec_id") < 300)
    kept_lsh = sorted(
        r.vec_id
        for r in similarity.semantic_dedup(
            spark, corpus, threshold=0.4, n_planes=2
        ).collect()
    )
    kept_exact = sorted(
        r.vec_id
        for r in similarity.semantic_dedup(
            spark, corpus, threshold=0.4, use_lsh=False
        ).collect()
    )
    assert kept_lsh == kept_exact
    # dominance: every dropped id has SOME lower-id neighbor >= t;
    # every kept id has NONE
    pairs = similarity.cosine_pairs_exact(corpus, 0.4).collect()
    has_lower = {p.b_id for p in pairs}
    all_ids = {r.vec_id for r in corpus.select("vec_id").collect()}
    assert set(kept_exact) == all_ids - has_lower


def test_semantic_dedup_bucketed_within_cell_reference(spark, emb):
    """The scale path (sign-bit cells, within-cell dominance) equals a
    hand-composed reference: exact pairs filtered to same-cell, dominance
    applied — cross-cell near pairs are KEPT by design (the SemDedup
    within-cluster semantic)."""
    corpus = emb.filter(F.col("vec_id") < 300)
    kept = sorted(
        r.vec_id
        for r in similarity.semantic_dedup_bucketed(
            corpus, threshold=0.4, sign_dims=4
        ).collect()
    )
    rows = corpus.select("vec_id", "embedding").collect()
    cell = {
        r.vec_id: tuple(x >= 0 for x in r.embedding[:4]) for r in rows
    }
    pairs = similarity.cosine_pairs_exact(corpus, 0.4).collect()
    dropped = {
        p.b_id for p in pairs if cell[p.a_id] == cell[p.b_id]
    }
    want = sorted(set(cell) - dropped)
    assert kept == want
    # and at least one cross-cell near pair exists, proving the variant
    # is genuinely within-cell (otherwise this test is vacuous)
    assert any(cell[p.a_id] != cell[p.b_id] for p in pairs)


def test_semantic_dedup_bucketed_partition_invariant(spark, emb):
    corpus = emb.filter(F.col("vec_id") < 200)
    a = sorted(
        r.vec_id
        for r in similarity.semantic_dedup_bucketed(corpus).collect()
    )
    b = sorted(
        r.vec_id
        for r in similarity.semantic_dedup_bucketed(
            corpus.repartition(7)
        ).collect()
    )
    assert a == b
