"""Duplicated-substring removal: position-free exact span dedup.

"Deduplicating Training Data Makes Language Models Better" (Lee et al.,
ACL 2022) removes every text span of ≥ L tokens that occurs more than once
in the corpus — duplicated substrings, not duplicated documents, catch
templated text that whole-doc and paragraph dedup both miss because the
copies sit at different offsets inside otherwise-distinct documents.

Their tool builds a corpus suffix array; the Spark-native equivalent here
is the fixed-L gram form: a span is removed iff it is covered by some
L-token window whose exact token sequence occurs ≥ ``min_count`` times in
the corpus. Overlapping frequent windows merge naturally (coverage is a
set of token positions), so any duplicated run of length ≥ L is removed
end-to-end, exactly like the suffix-array method for runs ≥ L.

One deliberate divergence, documented: ALL occurrences of a duplicated
span are removed (the conservative C4-style choice), not all-but-one —
"keep one canonical copy" needs a global arbitrary winner per span and
adds a corpus-wide argmin for no training-data benefit.

Plan shape (everything JVM-side):
- tokens and L-gram windows come from ONE posexplode each;
- window frequency is ONE hash aggregate on the gram key (count of
  OCCURRENCES — a doc repeating itself is a duplicate too);
- frequent windows join back (the frequent set is duplication-sized;
  broadcast when it fits, AQE decides otherwise), each hit fans out to
  its L covered positions, `distinct` merges overlaps;
- kept tokens = positions anti-join covered, reassembled in order by ONE
  doc-keyed aggregate.

100 TB notes: the L-gram explode is the inherently expensive part of this
operator family (Lee et al. spend a distributed suffix-array build on the
same cost); rows stay narrow — shuffle the 8-byte ``xxhash64(gram)``
instead of the gram string when L is large (same plan, one projection).
``min_count`` is the KenLM-style floor: raising it shrinks the frequent
dim super-linearly on natural text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def token_positions(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, pos, tok) — 0-based token positions; blank docs contribute
    nothing."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    return (
        df.filter(F.trim(F.col(text_col)) != "")
        .select(F.col(id_col), F.posexplode(toks).alias("pos", "tok"))
    )


def gram_windows(
    df: DataFrame, length: int, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, start, gram) — every L-token window, 0-based start; docs
    shorter than L have no windows."""
    from starchart_spark.operators import text as text_ops

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    return (
        text_ops.ensure_min_partitions(
            df.filter(F.trim(F.col(text_col)) != "").filter(
                F.size(toks) >= length
            )
        )
        .select(
            F.col(id_col),
            # zip_with-over-slices windows: O(tokens)/doc; the previous
            # transform lambda re-ran slice(split(text)) per position,
            # O(tokens²)/doc interpreted
            F.posexplode(text_ops.sliding_ngrams(toks, length)).alias(
                "start", "gram"
            ),
        )
    )


def remove_duplicated_substrings(
    df: DataFrame,
    length: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``(id, clean_text)`` for every non-blank doc: tokens covered by any
    L-window occurring ≥ ``min_count`` times corpus-wide are cut, the
    remainder rejoined in order (a fully-duplicated doc comes back ``''``)."""
    windows = gram_windows(df, length, text_col, id_col)
    freq = (
        windows.groupBy("gram")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_count)
        .select("gram")
    )
    covered = (
        windows.join(freq, "gram")
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(F.col("start"), F.col("start") + (length - 1))
            ).alias("pos"),
        )
        .distinct()
    )
    kept = token_positions(df, text_col, id_col).join(
        covered, [id_col, "pos"], "left_anti"
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("clean_text")
    )
    all_ids = df.filter(F.trim(F.col(text_col)) != "").select(id_col)
    return all_ids.join(rebuilt, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
    )


def suffix_ranks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int | None = None,
) -> DataFrame:
    """Distributed token-level corpus SUFFIX ARRAY by prefix doubling —
    the actual structure Lee et al. build (their `deduplicate-text-
    datasets` tool constructs a corpus suffix array to find arbitrary-
    length repeats; :func:`remove_duplicated_substrings` above is the
    fixed-L practical form, this is the general one).

    Returns ``(id, pos, srank)``: ``srank`` is the 1-based DENSE rank of
    the suffix ``tokens[pos:]`` among ALL suffixes of ALL documents,
    token-wise lexicographic with a shorter-prefix-sorts-first rule;
    identical suffixes (across documents) share a rank — exactly
    ``dense_rank() over (order by suffix)``, computable by any engine
    that can materialize the suffix strings, which is the oracle and
    precisely what this plan never does.

    Algorithm (Manber & Myers 1990 rank doubling, the Larsson–Sadakane
    formulation): round 0 ranks single tokens; round k re-ranks the pair
    ``(rank[pos], rank[pos + 2^k] or 0)`` — 0 is the end sentinel,
    smaller than every real rank, which encodes shorter-prefix-first.
    After ``ceil(log2(max_len))`` rounds the rank order equals full
    suffix order. Every round is ONE self-join at gap ``2^k`` plus ONE
    dense-rank of the distinct pair dim via the skew-proof two-pass
    ranker (``skew.ordered_prefix`` — a mega-document's suffixes span
    many range partitions; no single-task global sort anywhere), with a
    ``localCheckpoint`` truncating lineage per round. Early exit when
    all ranks are distinct (max rank == suffix count — ties can persist
    only while equal suffixes exist).

    100 TB shape: rows are three longs end-to-end (the suffix CONTENT is
    never shuffled — that is the whole point of rank doubling: Lee et
    al.'s single-node build tops out at RAM; this is O(log L) shuffles
    of 24-byte rows). ``max_tokens`` truncates documents first when only
    bounded-depth order is needed (suffixes then end at the truncation
    point on both engines).
    """
    from starchart_spark.operators import skew

    toks = token_positions(df, text_col, id_col)
    if max_tokens is not None:
        toks = toks.filter(F.col("pos") < max_tokens)
    toks = toks.select(
        F.col(id_col).alias("__id"),
        F.col("pos").cast("int").alias("pos"),
        "tok",
    )

    # round 0: dense rank of single tokens (distinct dim → skew-proof
    # global rank → join back; the dim carries each value once, so the
    # row rank IS the dense rank)
    tok_dim = toks.select("tok").distinct().withColumn("__one", F.lit(1))
    tok_ranked = skew.ordered_prefix(tok_dim, "tok", "__one", rank_col="__r").select(
        "tok", "__r"
    )
    cur = (
        toks.join(tok_ranked, "tok")
        .select("__id", "pos", F.col("__r").cast("long").alias("r"))
        .localCheckpoint(eager=True)
    )

    # two driver scalars, once: total suffixes (early-exit target) and the
    # doubling depth bound
    row = cur.agg(
        F.count(F.lit(1)).alias("n"), F.max("pos").alias("mx")
    ).collect()[0]
    n_suffixes, max_len = int(row["n"]), int(row["mx"]) + 1
    gap = 1
    while gap < max_len:
        partner = cur.select(
            "__id",
            (F.col("pos") - gap).cast("int").alias("pos"),
            F.col("r").alias("r2"),
        )
        pairs = cur.join(partner, ["__id", "pos"], "left").select(
            "__id", "pos", "r", F.coalesce("r2", F.lit(0)).alias("r2")
        )
        pair_dim = (
            pairs.select("r", "r2").distinct().withColumn("__one", F.lit(1))
        )
        pair_ranked = skew.ordered_prefix(
            pair_dim, ["r", "r2"], "__one", rank_col="__nr"
        ).select("r", "r2", "__nr")
        cur = (
            pairs.join(pair_ranked, ["r", "r2"])
            .select("__id", "pos", F.col("__nr").cast("long").alias("r"))
            .localCheckpoint(eager=True)
        )
        gap *= 2
        if gap < max_len:
            # ranks all distinct ⇒ order is final; equal suffixes keep
            # their shared rank to the end, so this can only fire early
            # when no full-suffix duplicates remain unresolved
            mx = cur.agg(F.max("r").alias("m")).collect()[0]["m"]
            if int(mx) == n_suffixes:
                break
    return cur.select(
        F.col("__id").alias(id_col), "pos", F.col("r").alias("srank")
    )
