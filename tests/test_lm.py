"""Bigram-LM cross-entropy semantics (operators/lm.py)."""

from __future__ import annotations

import math

from starchart_spark.operators import lm


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _hand_ce(rows, s=0.5, min_count=1):
    toks = {d: t.split() for d, t in rows if t and t.strip()}
    vocab = {w for ts in toks.values() for w in ts}
    bg: dict[tuple[str, str], int] = {}
    for ts in toks.values():
        for a, b in zip(ts, ts[1:]):
            bg[(a, b)] = bg.get((a, b), 0) + 1
    bg = {k: c for k, c in bg.items() if c >= min_count}
    ctx: dict[str, int] = {}
    for (a, _), c in bg.items():
        ctx[a] = ctx.get(a, 0) + c
    v = len(vocab)
    out = {}
    for d, ts in toks.items():
        if len(ts) < 2:
            continue
        lps = []
        for a, b in zip(ts, ts[1:]):
            if (a, b) in bg:
                lps.append(round(math.log((bg[(a, b)] + s) / (ctx[a] + s * v)), 6))
            else:
                lps.append(round(-math.log(v), 6))
        out[d] = (len(lps), round(-sum(lps) / len(lps), 6))
    return out


def test_ce_matches_hand_computation(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat ran"),
        (3, "zq zq zq"),      # repeated bigram → low surprise
        (4, "one"),            # single token → no bigrams → absent
        (5, "  "),             # blank → absent
    ]
    got = {
        r.doc_id: (r.n_bigrams, r.ce)
        for r in lm.lm_cross_entropy(_docs(spark, rows)).collect()
    }
    want = _hand_ce(rows)
    assert set(got) == set(want) == {1, 2, 3}
    for d in want:
        assert got[d][0] == want[d][0]
        assert abs(got[d][1] - want[d][1]) <= 2e-6, (d, got[d], want[d])


def test_repetition_scores_lower_than_novelty(spark):
    rows = [(1, "a b a b a b a b"), (2, "q w e r t y u i")]
    got = {r.doc_id: r.ce for r in lm.lm_cross_entropy(_docs(spark, rows)).collect()}
    assert got[1] < got[2]


def test_min_count_prune_hits_smoothing_floor(spark):
    # with min_count=2 every singleton bigram is pruned → unseen → -ln(V)
    rows = [(1, "a b c"), (2, "d e f")]
    got = {
        r.doc_id: (r.n_bigrams, r.ce)
        for r in lm.lm_cross_entropy(_docs(spark, rows), min_count=2).collect()
    }
    want = _hand_ce(rows, min_count=2)
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0]
        assert abs(got[d][1] - want[d][1]) <= 2e-6, (d, got[d], want[d])


def test_cross_corpus_model_scores_unseen(spark):
    # model trained on corpus A scores corpus B; B's unseen bigrams take
    # the floor, shared ones take the model probability
    a = _docs(spark, [(1, "the cat sat"), (2, "the cat ran")])
    b = _docs(spark, [(10, "the cat sat"), (11, "zz yy xx")])
    from pyspark.sql import functions as F

    toks = F.split(F.trim(F.col("text")), r"\s+")
    vdf = a.select(F.explode(toks).alias("tok")).agg(
        F.count_distinct("tok").alias("v")
    )
    model = lm.bigram_model(lm._doc_bigrams(a, "text", "doc_id"), vdf)
    got = {
        r.doc_id: r.ce
        for r in lm.lm_cross_entropy(b, model=model, vocab_size_df=vdf).collect()
    }
    # doc 10 is in-domain, doc 11 fully unseen → ce(11) = ln(V) exactly
    v = vdf.collect()[0].v
    assert abs(got[11] - round(math.log(v), 6)) <= 2e-6
    assert got[10] < got[11]
