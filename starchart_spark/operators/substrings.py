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
