"""BPE tokenizer training — byte-pair-encoding merges learned on-corpus.

Sennrich et al. 2016 (the GPT-2/Llama tokenizer-training recipe): start
from characters (plus an end-of-word marker), repeatedly merge the most
frequent adjacent symbol pair. At 100 TB the expensive part is exactly one
thing — counting weighted adjacent pairs over the corpus — and that is a
Spark hash aggregate. Everything else (argmax, applying one merge) runs on
the DISTINCT-WORD dim, which is millions of rows where the corpus is
billions, so the training loop's shape is:

    corpus --ONE explode+agg--> (word, n) dim        [big, once]
    k times:
        pair counts over the word dim (weighted by n)  [small agg]
        argmax pair (count desc, pair asc — total order, replayable)
        fold the merge into each word's symbol array   [small map]

The per-round argmax is a 1-row ``collect`` by design: the merge literal
must parameterize the NEXT round's plan, the same driver-loop shape as
graph.pagerank's round constants — k tiny jobs, never a per-row driver
loop. Symbol arrays stay Spark ``array<string>`` columns; the merge fold
is a HOF ``aggregate`` whose lambda touches only its accumulator and one
element (the O(tokens²) re-evaluation trap from BENCH.md round 5 applies
to captured EXPRESSIONS, not accumulators; words are ≤ tens of symbols, so
the per-element array copy is bounded and cheap).

Greedy-leftmost semantics are pinned against a pure-Python reference in
tests/test_bpe.py; the weighted pair-count aggregate (the 100 TB hot
path) is driver-gated with a DuckDB oracle (``bpe_pair_counts``).

End-of-word convention: each word contributes symbols ``[c1, ..., cn,
'</w>']`` — the marker is its own symbol (original Sennrich form), so
merges can learn suffixes like ``e</w>``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EOW = "</w>"


def word_counts(
    docs: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """(word, n) — whitespace-token counts over the corpus. The ONE pass
    over the big table; everything downstream runs on this dim."""
    from starchart_spark.operators.text import ensure_min_partitions

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    # spread before the explode (guide §2.5; no-op at scale)
    out = (
        ensure_min_partitions(docs.filter(F.trim(F.col(text_col)) != ""))
        .select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )
    if min_count > 1:
        out = out.filter(F.col("n") >= min_count)
    return out


def init_symbols(words: DataFrame) -> DataFrame:
    """(word, n, syms) — character symbols plus the end-of-word marker."""
    chars = F.expr("filter(split(word, ''), x -> x <> '')")
    return words.withColumn(
        "syms", F.concat(chars, F.array(F.lit(EOW)))
    )


def pair_counts(symbols: DataFrame) -> DataFrame:
    """(pair, cnt) — corpus-weighted adjacent-pair counts, ``"x y"`` keys.

    zip_with over two slices of the symbol array: the arrays evaluate once
    per row and the lambda only concatenates its arguments (the
    sliding_ngrams discipline from operators/text.py)."""
    pairs = F.zip_with(
        F.slice(F.col("syms"), 1, F.size("syms") - 1),
        F.slice(F.col("syms"), 2, F.size("syms") - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return (
        symbols.filter(F.size("syms") >= 2)
        .select(F.explode(pairs).alias("pair"), "n")
        .groupBy("pair")
        .agg(F.sum("n").alias("cnt"))
    )


def _merge_fold(x: str, y: str) -> Column:
    """Greedy leftmost non-overlapping merge of adjacent (x, y) → xy inside
    ``syms``, as a HOF fold: append each symbol, or replace the tail symbol
    when it is ``x`` and the incoming one is ``y``. A just-merged tail
    equals ``x+y`` ≠ ``x`` (symbols are never empty), so 'aaa' under (a,a)
    correctly yields [aa, a] — no overlap double-merge."""
    merged = F.lit(x + y)

    def step(acc: Column, s: Column) -> Column:
        tail_is_x = (F.size(acc) > 0) & (
            F.element_at(acc, -1) == F.lit(x)
        ) & (s == F.lit(y))
        return F.when(
            tail_is_x,
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(s)))

    return F.aggregate(
        F.col("syms"), F.array().cast("array<string>"), step
    )


def train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_count: int = 1,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``n_merges`` BPE merges on ``docs``. Returns the ordered merge
    list and the final (word, n, syms) symbol table.

    Stops early when no pair occurs twice (cnt >= 2) — merging a
    singleton pair never helps a tokenizer and keeps the loop replayable
    on tiny corpora. Each round localCheckpoints the word dim so plan
    lineage stays O(1) across rounds (the cluster.py lesson)."""
    syms = init_symbols(
        word_counts(docs, text_col=text_col, min_count=min_count)
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = (
            pair_counts(syms)
            .filter(F.col("cnt") >= 2)
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        x, y = best[0]["pair"].split(" ", 1)
        merges.append((x, y))
        syms = syms.withColumn("syms", _merge_fold(x, y)).localCheckpoint(
            eager=True
        )
    return merges, syms


def encode_words(words: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Apply an ordered merge list to a (word, ...) dim → adds ``syms``.
    k sequential folds over the distinct-word dim (the standard BPE encode
    order: merges apply in learned priority order, each exhaustively)."""
    out = init_symbols(words)
    for x, y in merges:
        out = out.withColumn("syms", _merge_fold(x, y))
    return out
