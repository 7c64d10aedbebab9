"""BPE tokenizer training (operators/bpe.py) vs a pure-Python reference."""

from __future__ import annotations

from collections import Counter

from starchart_spark.operators import bpe


# -- reference implementation (Sennrich et al. 2016 semantics) --------------

def _ref_words(texts):
    words: Counter = Counter()
    for t in texts:
        for w in t.split():
            words[w] += 1
    return words


def _ref_apply(s, x, y):
    out, i = [], 0
    while i < len(s):
        if i + 1 < len(s) and s[i] == x and s[i + 1] == y:
            out.append(x + y)
            i += 2
        else:
            out.append(s[i])
            i += 1
    return out


def _ref_train(texts, k):
    words = _ref_words(texts)
    syms = {w: list(w) + [bpe.EOW] for w in words}
    merges = []
    for _ in range(k):
        pc: Counter = Counter()
        for w, n in words.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += n
        pc = Counter({p: c for p, c in pc.items() if c >= 2})
        if not pc:
            break
        # count desc, then "x y" string asc — the engine's total order
        best = min(pc.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))
        x, y = best[0]
        merges.append((x, y))
        syms = {w: _ref_apply(s, x, y) for w, s in syms.items()}
    return merges, syms


TEXTS = [
    "low low low low low",
    "lower lower newest newest newest newest newest newest",
    "widest widest widest",
    "new new knew",
]


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_merges_match_reference(spark):
    ref_merges, ref_syms = _ref_train(TEXTS, 12)
    merges, syms = bpe.train(_docs(spark, TEXTS), 12)
    assert merges == ref_merges
    got = {r["word"]: list(r["syms"]) for r in syms.collect()}
    assert got == {w: s for w, s in ref_syms.items()}


def test_early_stop_when_no_repeated_pair(spark):
    # every word unique, every char distinct -> all pair counts are 1
    merges, _ = bpe.train(_docs(spark, ["ab cd ef"]), 5)
    assert merges == []


def test_overlap_merges_leftmost_first(spark):
    # 'aaaa' under merge (a,a): greedy leftmost -> [aa, aa, </w>], and the
    # next round can then learn (aa, aa)
    merges, syms = bpe.train(_docs(spark, ["aaaa aaaa aaaa"]), 2)
    ref_merges, ref_syms = _ref_train(["aaaa aaaa aaaa"], 2)
    assert merges == ref_merges
    got = {r["word"]: list(r["syms"]) for r in syms.collect()}
    assert got == {w: s for w, s in ref_syms.items()}


def test_encode_words_applies_merges_in_order(spark):
    merges, _ = bpe.train(_docs(spark, TEXTS), 8)
    # encode a word dim that includes an unseen word sharing subwords
    new = _docs(spark, ["lowest newest low"])
    enc = bpe.encode_words(bpe.word_counts(new), merges)
    got = {r["word"]: list(r["syms"]) for r in enc.collect()}
    ref_syms = {w: list(w) + [bpe.EOW] for w in got}
    for x, y in merges:
        ref_syms = {w: _ref_apply(s, x, y) for w, s in ref_syms.items()}
    assert got == ref_syms


def test_eow_suffix_merges_learnable(spark):
    # 'est</w>'-style suffix merges require the EOW marker to be a symbol
    merges, _ = bpe.train(_docs(spark, TEXTS), 12)
    assert any(y == bpe.EOW or y.endswith(bpe.EOW) for _, y in merges)
