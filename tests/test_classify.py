"""Naive Bayes classifier semantics (operators/classify.py)."""

from __future__ import annotations

import math

from starchart_spark.operators import classify


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, label string")


def _hand_nb(rows, s=0.5):
    """Plain-Python multinomial NB over whitespace tokens."""
    labeled = [(d, t.split(), c) for d, t, c in rows if t.strip()]
    counts: dict[tuple[str, str], int] = {}
    for _, toks, c in labeled:
        for t in toks:
            counts[(t, c)] = counts.get((t, c), 0) + 1
    n_c: dict[str, int] = {}
    for (t, c), n in counts.items():
        n_c[c] = n_c.get(c, 0) + n
    v = len({t for t, _ in counts})
    dpc: dict[str, int] = {}
    for _, _, c in labeled:
        dpc[c] = dpc.get(c, 0) + 1
    total = sum(dpc.values())
    out = {}
    for d, toks, _ in labeled:
        best = None
        for c in sorted(dpc):
            u = round(math.log(dpc[c] / total) * 1e6)
            floor = round(math.log(s / (n_c[c] + s * v)) * 1e6)
            for t in toks:
                if (t, c) in counts:
                    u += round(
                        math.log((counts[(t, c)] + s) / (n_c[c] + s * v)) * 1e6
                    )
                else:
                    u += floor
            # ties: higher score wins, then smaller label
            if best is None or u > best[1]:
                best = (c, u)
        out[d] = (best[0], round(best[1] / 1e6, 6))
    return out


def test_classify_matches_hand_computation(spark):
    rows = [
        (1, "good clean prose text", "keep"),
        (2, "good clean text", "keep"),
        (3, "spam spam buy buy", "drop"),
        (4, "buy spam now", "drop"),
        (5, "clean prose buy", "keep"),
        (6, "   ", "keep"),
    ]
    df = _docs(spark, rows)
    model, classes = classify.nb_train(df)
    got = {
        r.doc_id: (r.predicted, r.score)
        for r in classify.nb_classify(df, model, classes).collect()
    }
    want = _hand_nb(rows)
    assert set(got) == set(want) == {1, 2, 3, 4, 5}  # blank doc absent
    for d in want:
        assert got[d][0] == want[d][0], (d, got[d], want[d])
        assert abs(got[d][1] - want[d][1]) <= 2e-6


def test_held_out_docs_score_with_floor(spark):
    train = _docs(
        spark,
        [
            (1, "alpha alpha beta", "a"),
            (2, "gamma gamma delta", "g"),
        ],
    )
    model, classes = classify.nb_train(train)
    # unseen doc with tokens from one class plus a fully-OOV token
    test = _docs(spark, [(10, "alpha beta zzz", "?")])
    pred = classify.nb_classify(test, model, classes).collect()
    assert len(pred) == 1 and pred[0].predicted == "a"


def test_score_emits_every_class(spark):
    df = _docs(
        spark,
        [(1, "x y", "a"), (2, "y z", "b"), (3, "x z", "c")],
    )
    model, classes = classify.nb_train(df)
    scored = classify.nb_score(df, model, classes)
    assert scored.count() == 9  # 3 docs x 3 classes
    assert set(scored.columns) == {"doc_id", "label", "score"}


def test_deterministic_under_repartition(spark):
    rows = [(i, f"tok{i % 5} tok{i % 3} tok{i % 2}", f"c{i % 2}") for i in range(40)]
    df = _docs(spark, rows)
    m1, c1 = classify.nb_train(df)
    m2, c2 = classify.nb_train(df.repartition(7))
    a = sorted(map(tuple, classify.nb_classify(df, m1, c1).collect()))
    b = sorted(map(tuple, classify.nb_classify(df.repartition(11), m2, c2).collect()))
    assert a == b


# -- positional phrase search (ranking.phrase_search) ------------------------

def test_phrase_search_overlap_and_repeats(spark):
    from starchart_spark.operators import ranking

    docs = spark.createDataFrame(
        [
            (1, "a a a"),          # 'a a' occurs TWICE (overlapping)
            (2, "the cat the cat sat"),
            (3, "cat the"),        # wrong order
            (4, "the cat"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    got = sorted(
        (r["doc_id"], r["start_pos"])
        for r in ranking.phrase_search(docs, ["a", "a"]).collect()
    )
    assert got == [(1, 1), (1, 2)]
    got2 = sorted(
        (r["doc_id"], r["start_pos"])
        for r in ranking.phrase_search(docs, "the cat").collect()
    )
    assert got2 == [(2, 1), (2, 3), (4, 1)]
    # repeated-term 3-phrase: 'the cat the' only in doc 2 at pos 1
    got3 = sorted(
        (r["doc_id"], r["start_pos"])
        for r in ranking.phrase_search(docs, "the cat the").collect()
    )
    assert got3 == [(2, 1)]


def test_proximity_search_minimal_window(spark):
    from starchart_spark.operators import ranking

    docs = spark.createDataFrame(
        [
            (1, "spark x x x the"),        # span 5
            (2, "the x spark"),            # span 3 (order-insensitive)
            (3, "the x x x x x spark x the spark"),  # tightest span 2 at the end
            (4, "the the the"),            # missing 'spark'
            (5, "spark"),                  # missing 'the'
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["best_span"]
        for r in ranking.proximity_search(docs, ["the", "spark"], window=5).collect()
    }
    assert got == {1: 5, 2: 3, 3: 2}
    tight = {
        r["doc_id"]: r["best_span"]
        for r in ranking.proximity_search(docs, ["the", "spark"], window=2).collect()
    }
    assert tight == {3: 2}
    # duplicate query terms collapse to the distinct set
    dup = {
        r["doc_id"]: r["best_span"]
        for r in ranking.proximity_search(docs, ["the", "the", "spark"], window=5).collect()
    }
    assert dup == got
