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


def _hand_kn(train_rows, score_rows, d=0.75):
    """Independent KN recompute: counts from train, score score_rows."""
    bg: dict[tuple[str, str], int] = {}
    for _, t in train_rows:
        ts = t.split()
        for a, b in zip(ts, ts[1:]):
            bg[(a, b)] = bg.get((a, b), 0) + 1
    ctx_tot: dict[str, int] = {}
    ctx_fol: dict[str, int] = {}
    prec: dict[str, int] = {}
    for (a, b), c in bg.items():
        ctx_tot[a] = ctx_tot.get(a, 0) + c
        ctx_fol[a] = ctx_fol.get(a, 0) + 1
        prec[b] = prec.get(b, 0) + 1
    npp = len(bg)
    out = {}
    for did, t in score_rows:
        ts = t.split()
        if len(ts) < 2:
            continue
        lps = []
        for a, b in zip(ts, ts[1:]):
            pc = (prec[b] if b in prec else d) / npp
            if (a, b) in bg:
                p = (bg[(a, b)] - d) / ctx_tot[a] + (d * ctx_fol[a] / ctx_tot[a]) * pc
            elif a in ctx_tot:
                p = (d * ctx_fol[a] / ctx_tot[a]) * pc
            else:
                p = pc
            lps.append(round(math.log(p), 6))
        out[did] = (len(lps), round(-sum(lps) / len(lps), 6))
    return out


def test_kn_all_three_branches_match_hand_computation(spark):
    """Seen bigram / seen-context backoff / unseen-context continuation all
    fire in one scored corpus and match an independent recompute."""
    train = [(0, "a b a b a c"), (2, "b c b a")]
    score = [
        (10, "a b a c"),      # all bigrams seen
        (11, "a a b"),        # (a,a) unseen but context 'a' seen -> backoff
        (12, "z b z a"),      # context 'z' unseen -> continuation dist
        (13, "z q"),          # unseen w too -> D/npp floor inside pcont
    ]
    train_df = lm._doc_bigrams(_docs(spark, train), "text", "doc_id")
    pairs, ctx, cont, npp = lm.kn_model(train_df)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["ce"])
        for r in lm.kn_cross_entropy(
            _docs(spark, score), pairs, ctx, cont, npp
        ).collect()
    }
    assert got == _hand_kn(train, score)


def test_kn_probabilities_sum_below_one_per_context(spark):
    """For a trained context v, sum over seen w of P_KN(w|v) <= 1 (the
    discounted mass plus interpolation never over-allocates)."""
    train = [(0, "a b a b a c b c c a")]
    train_df = lm._doc_bigrams(_docs(spark, train), "text", "doc_id")
    pairs, ctx, cont, npp = lm.kn_model(train_df)
    # score every (v, w) pair in the vocab as 2-token docs
    vocab = ["a", "b", "c"]
    score = [
        (i * 10 + j, f"{v} {w}")
        for i, v in enumerate(vocab)
        for j, w in enumerate(vocab)
    ]
    rows = lm.kn_cross_entropy(
        _docs(spark, score), pairs, ctx, cont, npp
    ).collect()
    # ce of a 1-bigram doc is -logp, so p = exp(-ce)
    by_v: dict[str, float] = {}
    for r in rows:
        v = next(t for d, t in score if d == r["doc_id"]).split()[0]
        by_v[v] = by_v.get(v, 0.0) + math.exp(-r["ce"])
    for v, total in by_v.items():
        assert total <= 1.0 + 1e-4, (v, total)
