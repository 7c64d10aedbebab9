"""Vocabulary/encoding (operators/vocab.py) and BM25 (operators/ranking.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from starchart_spark.operators import ranking, vocab


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------- vocab ----


def test_vocab_rank_and_ties(spark):
    df = _docs(spark, [(1, "b b a a c"), (2, "a b d")])
    v = {r.tok: (r.tok_id, r["count"]) for r in vocab.build_vocab(df).collect()}
    # a:3 b:3 c:1 d:1 — count desc then token asc
    assert v["a"] == (1, 3) and v["b"] == (2, 3)
    assert v["c"] == (3, 1) and v["d"] == (4, 1)


def test_vocab_caps_and_min_count(spark):
    df = _docs(spark, [(1, "a a a b b c")])
    top = vocab.build_vocab(df, max_size=2).collect()
    assert sorted(r.tok for r in top) == ["a", "b"]
    floored = vocab.build_vocab(df, min_count=2).collect()
    assert sorted(r.tok for r in floored) == ["a", "b"]


def test_encode_order_and_oov(spark):
    df = _docs(spark, [(1, "a b a"), (2, "zzz a"), (3, "  ")])
    v = vocab.build_vocab(_docs(spark, [(9, "a a b")]))  # a->1, b->2
    enc = {r.doc_id: (r.ids, r.n_tokens) for r in vocab.encode(df, v).collect()}
    assert enc[1] == ([1, 2, 1], 3)
    assert enc[2] == ([0, 1], 2)  # OOV -> 0, order preserved
    assert 3 not in enc  # blank doc absent


def test_encode_order_survives_repartition(spark):
    rows = [(i, " ".join(f"t{(i * 7 + j) % 13}" for j in range(30))) for i in range(40)]
    df = _docs(spark, rows)
    v = vocab.build_vocab(df)
    a = {r.doc_id: r.ids for r in vocab.encode(df, v).collect()}
    b = {r.doc_id: r.ids for r in vocab.encode(df.repartition(9), v).collect()}
    assert a == b
    # spot-check one doc against the text order
    toks = rows[5][1].split()
    ids = a[5]
    vmap = {r.tok: r.tok_id for r in v.collect()}
    assert ids == [vmap[t] for t in toks]


# ----------------------------------------------------------------- bm25 ----


def _hand_bm25(rows, terms, k1=1.2, b=0.75):
    docs = {d: t.split() for d, t in rows if t.strip()}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    scores = {}
    for term in set(terms):
        df_t = sum(1 for t in docs.values() if term in t)
        if df_t == 0:
            continue
        idf = round(math.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5)), 6)
        for d, toks in docs.items():
            tf = toks.count(term)
            if tf == 0:
                continue
            s = idf * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * len(toks) / avgdl)
            )
            scores[d] = scores.get(d, 0) + round(s * 1e6)
    return {d: round(u / 1e6, 6) for d, u in scores.items()}


def test_bm25_matches_hand_computation(spark):
    rows = [
        (1, "spark spark join window table"),
        (2, "spark window"),
        (3, "table scan merge sort"),
        (4, "join join join spark"),
    ]
    got = {
        r.doc_id: r.score
        for r in ranking.bm25_scores(_docs(spark, rows), ["spark", "join"]).collect()
    }
    want = _hand_bm25(rows, ["spark", "join"])
    assert set(got) == set(want) == {1, 2, 4}
    for d in want:
        assert abs(got[d] - want[d]) <= 2e-6, (d, got[d], want[d])


def test_bm25_rare_term_outranks_common(spark):
    rows = [(i, "common words everywhere common") for i in range(1, 9)]
    rows += [(20, "common rare"), (21, "common words rare common")]
    top = ranking.bm25_topk(_docs(spark, rows), ["rare"], k=2).collect()
    assert sorted(r.doc_id for r in top) == [20, 21]
    # the shorter doc scores higher (length normalization)
    assert top[0].doc_id == 20


def test_bm25_topk_is_take_ordered(spark):
    df = _docs(spark, [(i, f"tok{i % 4} filler") for i in range(30)])
    plan = (
        ranking.bm25_topk(df, ["tok1"], k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
