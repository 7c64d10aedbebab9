"""Content-defined chunking dedup (operators/cdc.py)."""

from __future__ import annotations

import pytest

from starchart_spark.operators import cdc

DOC = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "near the warm stove and the mouse runs through the old wall"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _chunks(spark, rows, **kw):
    return sorted(
        (
            (r["doc_id"], r["chunk_id"], r["start_pos"], r["n_tokens"], r["chunk_text"])
            for r in cdc.chunk_tokens(_docs(spark, rows), **kw).collect()
        )
    )


@pytest.mark.parametrize("portable", [False, True])
def test_chunks_partition_token_stream_exactly(spark, portable):
    rows = [(1, DOC), (2, "a b"), (3, "single")]
    got = _chunks(spark, rows, portable=portable)
    for doc_id, text in rows:
        mine = [c for c in got if c[0] == doc_id]
        toks = text.split()
        assert sum(c[3] for c in mine) == len(toks)
        # contiguous coverage: start positions chain, texts reassemble
        mine.sort(key=lambda c: c[2])
        assert mine[0][2] == 1
        rebuilt = " ".join(c[4] for c in mine)
        assert rebuilt == " ".join(toks)
        # chunk ids dense from 0
        assert [c[1] for c in mine] == list(range(len(mine)))


def test_insertion_preserves_downstream_chunks(spark):
    """THE CDC property: an insertion near the head only perturbs chunks
    up to the next surviving boundary; later chunk texts still match."""
    a = _chunks(spark, [(1, DOC)])
    b = _chunks(spark, [(1, "INSERTED " + DOC)])
    a_texts = {c[4] for c in a}
    b_texts = {c[4] for c in b}
    shared = a_texts & b_texts
    # everything after the first boundary past the edit must survive:
    # at least all chunks of A except its head chunk should reappear
    assert len(shared) >= len(a_texts) - 1
    assert len(a_texts) >= 3  # the fixture actually chunks


def test_identical_docs_fully_duplicate(spark):
    chunks = cdc.chunk_tokens(_docs(spark, [(1, DOC), (2, DOC)]))
    stats = {
        r["doc_id"]: (r["dup_tokens"], r["n_tokens"], r["dup_ratio"])
        for r in cdc.doc_dup_stats(chunks).collect()
    }
    n = len(DOC.split())
    assert stats[1] == (0, n, 0.0)  # first occurrence keeps everything
    assert stats[2] == (n, n, 1.0)  # second is 100% duplicate


def test_partition_invariance(spark):
    df1 = _docs(spark, [(i, f"{DOC} tail{i % 3}") for i in range(20)])
    df2 = df1.repartition(13)
    a = sorted(
        tuple(r) for r in cdc.doc_dup_stats(cdc.chunk_tokens(df1)).collect()
    )
    b = sorted(
        tuple(r) for r in cdc.doc_dup_stats(cdc.chunk_tokens(df2)).collect()
    )
    assert a == b


def test_expected_chunk_length_tracks_divisor(spark):
    rows = [(i, " ".join(f"w{(i * 97 + j * 13) % 211}" for j in range(200)))
            for i in range(10)]
    small = cdc.chunk_tokens(_docs(spark, rows), divisor=4).count()
    large = cdc.chunk_tokens(_docs(spark, rows), divisor=32).count()
    assert small > large  # smaller divisor -> more boundaries -> more chunks
