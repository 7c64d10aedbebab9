"""Product quantization: compression contract + recall vs brute force."""

from __future__ import annotations

import numpy as np
import os
import pytest
from pyspark.sql import functions as F

from starchart_spark.operators import pq, similarity

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").persist()


def test_codes_shape_and_size(spark, emb):
    """m bytes per vector — the 32x compression that makes 100 TB of fp32
    vectors fit in cluster RAM."""
    books = pq.pq_train(spark, emb, m=8, k=16, n_iters=2)
    assert books.shape == (8, 16, 8)  # dim 64 → 8 subspaces of 8
    codes = pq.pq_encode(spark, emb, books)
    rows = codes.collect()
    assert len(rows) == emb.count()
    assert all(len(r["codes"]) == 8 for r in rows)
    assert all(0 <= c < 16 for r in rows for c in r["codes"])


def test_pq_deterministic(spark, emb):
    """No RNG anywhere: training twice gives identical codebooks."""
    a = pq.pq_train(spark, emb, m=4, k=8, n_iters=2)
    b = pq.pq_train(spark, emb, m=4, k=8, n_iters=2)
    assert np.array_equal(a, b)


def _brute_topk_sets(spark, emb, queries, k):
    out = {}
    for r in similarity.brute_force_topk(spark, emb, queries, k=k).collect():
        out.setdefault(r["q_id"], set()).add(r["vec_id"])
    return out


def test_pq_recall_vs_brute(spark, emb):
    queries = emb.filter(F.col("vec_id") < 5)
    want = _brute_topk_sets(spark, emb, queries, k=10)
    got = {}
    for r in pq.ann_topk_pq(spark, emb, queries, k=10, m=16, ksub=64).collect():
        got.setdefault(r["q_id"], set()).add(r["vec_id"])
    hits = sum(len(want[q] & got.get(q, set())) for q in want)
    total = sum(len(v) for v in want.values())
    recall = hits / total
    # raw ADC on near-isotropic SYNTHETIC vectors is the worst case for PQ
    # (no cluster structure to exploit; measured 0.22@8x16 ... 0.64@16x64).
    # ADC's role is the cheap shortlist; the rerank test below is the
    # production configuration. Chance recall here is 10/500 = 0.02.
    assert recall >= 0.5, recall


def test_pq_rerank_improves_and_is_exact(spark, emb):
    """IVFADC-style refinement: exact re-scoring of the ADC shortlist. The
    reported sims must equal the exact cosine (oracle property), and
    recall@10 with a 50-candidate shortlist must beat raw ADC."""
    queries = emb.filter(F.col("vec_id") < 5)
    want = _brute_topk_sets(spark, emb, queries, k=10)
    rr = pq.ann_topk_pq(spark, emb, queries, k=10, m=16, ksub=64, rerank=50)
    got_rows = rr.collect()
    got = {}
    for r in got_rows:
        got.setdefault(r["q_id"], set()).add(r["vec_id"])
    hits = sum(len(want[q] & got.get(q, set())) for q in want)
    recall = hits / sum(len(v) for v in want.values())
    assert recall >= 0.8, recall

    # exactness of reported sims: compare against brute-force sims
    brute_sims = {
        (r["q_id"], r["vec_id"]): r["sim"]
        for r in similarity.brute_force_topk(spark, emb, queries, k=200).collect()
    }
    for r in got_rows:
        key = (r["q_id"], r["vec_id"])
        if key in brute_sims:
            assert abs(r["sim"] - brute_sims[key]) < 1e-6
