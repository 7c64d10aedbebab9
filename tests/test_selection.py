"""DSIR importance weighting semantics (operators/selection.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from starchart_spark.operators import selection


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _hand_weights(raw, target, s=0.5):
    """Reference implementation in plain Python over token lists."""
    raw_toks = {d: t.split() for d, t in raw if t.strip()}
    tgt_occ = [tok for d, t in target if t.strip() for tok in t.split()]
    c_raw: dict[str, int] = {}
    for toks in raw_toks.values():
        for t in toks:
            c_raw[t] = c_raw.get(t, 0) + 1
    c_tgt: dict[str, int] = {}
    for t in tgt_occ:
        c_tgt[t] = c_tgt.get(t, 0) + 1
    n_raw, n_tgt, v = sum(c_raw.values()), len(tgt_occ), len(c_raw)
    lr = {
        t: round(
            math.log((c_tgt.get(t, 0) + s) / (n_tgt + s * v))
            - math.log((c_raw[t] + s) / (n_raw + s * v)),
            6,
        )
        for t in c_raw
    }
    return {
        d: round(sum(lr[t] for t in toks), 6) for d, toks in raw_toks.items()
    }


def test_weights_match_hand_computation(spark):
    raw = [
        (1, "spark spark join window"),
        (2, "medical trial dosage"),
        (3, "spark medical mix"),
        (4, "   "),
    ]
    target = [(2, "medical trial dosage"), (3, "spark medical mix")]
    got = {
        r.doc_id: r.weight
        for r in selection.dsir_weights(
            _docs(spark, raw), _docs(spark, target)
        ).collect()
    }
    want = _hand_weights(raw, target)
    assert set(got) == set(want) == {1, 2, 3}  # blank doc 4 excluded
    for d in want:
        assert abs(got[d] - want[d]) <= 2e-6, (d, got[d], want[d])
    # in-domain docs outrank the out-of-domain one
    assert got[2] > got[1] and got[3] > got[1]


def test_target_lookalikes_win_selection(spark):
    raw = [(i, "common filler words here") for i in range(1, 6)]
    raw += [(10, "rare target jargon"), (11, "rare target jargon")]
    target = [(99, "rare target jargon rare target")]
    top = selection.dsir_select(
        _docs(spark, raw), _docs(spark, target), k=2
    ).collect()
    assert sorted(r.doc_id for r in top) == [10, 11]


def test_select_is_deterministic_under_ties(spark):
    raw = [(i, "same text") for i in range(20)]
    target = [(0, "same text")]
    ids1 = [r.doc_id for r in selection.dsir_select(_docs(spark, raw), _docs(spark, target), k=5).collect()]
    ids2 = [r.doc_id for r in selection.dsir_select(_docs(spark, raw).repartition(9), _docs(spark, target), k=5).collect()]
    assert ids1 == ids2 == [0, 1, 2, 3, 4]


def test_logratio_dim_broadcasts(spark):
    raw = _docs(spark, [(i, f"tok{i % 7} tok{i % 3}") for i in range(50)])
    target = _docs(spark, [(0, "tok1 tok2")])
    plan = (
        selection.dsir_weights(raw, target)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
