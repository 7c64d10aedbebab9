"""IVFADC: PQ books + residual codes integrated into the persisted IvfIndex
(VERDICT r3 "do this" #1/#4). Contracts:

- build once / search many: searches never retrain the coarse quantizer or
  the PQ codebooks and never re-encode the corpus (monkeypatch-asserted);
- nprobe=K with rerank ≥ corpus degenerates to exhaustive exact search —
  identical to brute force (the registry oracle configuration);
- approximate operating point (small nprobe/rerank) meets the recall bar;
- incremental ``add`` encodes ONLY appended vectors with the frozen books;
- the query set is never collected to the driver (joined-query ADC).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from starchart_spark.operators import pq, similarity

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").persist()


@pytest.fixture(scope="module")
def idx(spark, emb, tmp_path_factory):
    return similarity.IvfIndex.build(
        spark,
        emb,
        str(tmp_path_factory.mktemp("ivfpq") / "idx"),
        n_centroids=8,
        n_iters=2,
        pq_m=16,
        pq_ksub=64,
        pq_iters=2,
    )


def _keyset(df):
    return sorted((r["q_id"], r["rank"], r["vec_id"]) for r in df.collect())


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["q_id"], set()).add(r["vec_id"])
    return out


def test_ivfpq_exhaustive_equals_brute(spark, emb, idx):
    """nprobe=K + rerank ≥ corpus: the ADC shortlist covers every candidate
    and the exact rerank restores brute-force results bit for bit — the
    configuration the driver oracle gates."""
    queries = emb.filter(F.col("vec_id") < 3)
    brute = similarity.brute_force_topk(spark, emb, queries, k=5)
    got = idx.search(spark, queries, k=5, nprobe=8, rerank=10_000_000)
    assert _keyset(got) == _keyset(brute)


def test_ivfpq_build_once_search_many(spark, emb, idx, monkeypatch):
    """Two searches and a reopen-from-disk reuse ONE build: no coarse
    retrain, no PQ retrain, no corpus re-encode on any search call."""
    queries = emb.filter(F.col("vec_id") < 3)
    want = _keyset(idx.search(spark, queries, k=5, nprobe=8, rerank=10_000_000))

    def boom(*a, **kw):
        raise AssertionError("index rebuilt on a search call")

    monkeypatch.setattr(similarity, "ivf_centroids", boom)
    monkeypatch.setattr(similarity, "_tag_assign", boom)
    monkeypatch.setattr(pq, "pq_train", boom)
    monkeypatch.setattr(pq, "pq_encode", boom)
    got1 = _keyset(idx.search(spark, queries, k=5, nprobe=8, rerank=10_000_000))
    reopened = similarity.IvfIndex.open(idx.path)
    assert reopened.has_pq()
    got2 = _keyset(reopened.search(spark, queries, k=5, nprobe=8, rerank=10_000_000))
    assert got1 == want and got2 == want


def test_ivfpq_recall_at_approximate_point(spark, emb, idx):
    """nprobe=4/8, rerank=50: recall@10 vs brute ≥ 0.5 on the hardest
    (near-isotropic synthetic) corpus, and the reported sims are EXACT for
    every returned candidate (rerank property)."""
    queries = emb.filter(F.col("vec_id") < 5)
    want = _topk_sets(similarity.brute_force_topk(spark, emb, queries, k=10))
    got_rows = idx.search(spark, queries, k=10, nprobe=4, rerank=50).collect()
    got = {}
    for r in got_rows:
        got.setdefault(r["q_id"], set()).add(r["vec_id"])
    hits = sum(len(want[q] & got.get(q, set())) for q in want)
    recall = hits / sum(len(v) for v in want.values())
    assert recall >= 0.5, recall
    brute_sims = {
        (r["q_id"], r["vec_id"]): r["sim"]
        for r in similarity.brute_force_topk(spark, emb, queries, k=200).collect()
    }
    for r in got_rows:
        key = (r["q_id"], r["vec_id"])
        if key in brute_sims:
            assert abs(r["sim"] - brute_sims[key]) < 1e-6


def test_ivfpq_incremental_add_encodes_with_frozen_books(spark, emb, tmp_path):
    base = emb.filter(F.col("vec_id") % 2 == 0)
    extra = emb.filter(F.col("vec_id") % 2 == 1)
    idx2 = similarity.IvfIndex.build(
        spark, base, str(tmp_path / "idx2"), n_centroids=8, n_iters=2,
        pq_m=8, pq_ksub=16, pq_iters=2,
    )
    idx2.add(spark, extra)
    allrows = idx2.assign.read(spark)
    assert allrows.count() == emb.count()
    # appended rows carry codes equal to a fresh encode with the FROZEN
    # centroids + books
    cents = idx2._load_cents(spark)
    books = idx2._load_books(spark)
    want = {
        r["vec_id"]: (r["cid"], tuple(r["codes"]))
        for r in similarity._tag_assign(spark, extra, cents, books=books).collect()
    }
    got = {
        r["vec_id"]: (r["cid"], tuple(r["codes"]))
        for r in allrows.join(extra.select("vec_id"), "vec_id", "left_semi").collect()
    }
    assert got == want
    # idempotent re-add
    idx2.add(spark, extra)
    assert idx2.assign.read(spark).count() == emb.count()


def test_ivfpq_search_no_query_collect(spark, emb, idx, monkeypatch):
    """The query set is never collected to the driver: probe selection is a
    broadcast join, ADC LUTs are built inside the Arrow kernel from the
    batch's distinct queries. (Loading the model state — centroids/books —
    happens at plan declaration; executing the declared plan needs no
    driver collect.)"""
    from pyspark.sql import DataFrame

    queries = emb.filter(F.col("vec_id") < 2)
    plan = idx.search(spark, queries, k=3, nprobe=2, rerank=20)

    def boom(df):
        raise AssertionError("query set collected to driver")

    monkeypatch.setattr(DataFrame, "toPandas", boom)
    assert plan.count() > 0


def test_flat_pq_search_no_query_collect(spark, emb, monkeypatch):
    """The flat-ADC baseline (pq_search) is also joined-query now: declaring
    AND executing the plan performs no driver collect of the queries
    (round-3 version did queries.toPandas() — VERDICT r3 'do this' #4)."""
    from pyspark.sql import DataFrame

    books = pq.pq_train(spark, emb, m=8, k=16, n_iters=2)
    codes = pq.pq_encode(spark, emb, books)
    queries = emb.filter(F.col("vec_id") < 2)

    def boom(df):
        raise AssertionError("query set collected to driver")

    monkeypatch.setattr(DataFrame, "toPandas", boom)
    plan = pq.pq_search(spark, codes, queries, books, k=3)
    assert plan.count() > 0


def test_ivfpq_shuffle_probe_join_equals_broadcast(spark, emb, idx):
    """The massive-query-set topology (probe join shuffled on cid instead
    of broadcasting the probes) returns identical results."""
    queries = emb.filter(F.col("vec_id") < 4)
    a = _keyset(idx.search(spark, queries, k=5, nprobe=4, rerank=30))
    b = _keyset(
        idx.search(spark, queries, k=5, nprobe=4, rerank=30,
                   broadcast_probes=False)
    )
    assert a == b
