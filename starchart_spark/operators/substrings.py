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
    from pyspark.sql import Window

    windows = gram_windows(df, length, text_col, id_col)
    # corpus-wide gram frequency as ONE window count over a single
    # gram-keyed exchange — the previous groupBy-then-join-back shape
    # shuffled the full window table twice (once into the frequency
    # aggregate, once into the join) and re-ran the explode subtree for
    # each branch (guide §2.4). count(*) OVER (PARTITION BY gram) ≥
    # min_count selects exactly the same windows.
    w_gram = Window.partitionBy("gram")
    # covered positions collapse to ONE int-set row per doc (collect_set
    # dedups, so no separate (id, pos) distinct exchange), and the doc is
    # rebuilt from its ORIGINAL token array with an indexed filter — the
    # previous shape re-exploded every token, anti-joined on (id, pos) and
    # re-assembled via collect_list + array_sort: three extra exchanges of
    # token-grain rows for the same clean_text (guide §2.4).
    cov = (
        windows.withColumn("__n", F.count(F.lit(1)).over(w_gram))
        .filter(F.col("__n") >= min_count)
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(F.col("start"), F.col("start") + (length - 1))
            ).alias("pos"),
        )
        .groupBy(id_col)
        .agg(F.collect_set("pos").alias("__cov"))
    )
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.filter(F.trim(F.col(text_col)) != "").select(
        F.col(id_col), toks.alias("__toks")
    )
    empty = F.array().cast("array<int>")
    return base.join(cov, id_col, "left").select(
        F.col(id_col),
        F.array_join(
            F.filter(
                F.col("__toks"),
                lambda x, i: ~F.array_contains(
                    F.coalesce(F.col("__cov"), empty), i
                ),
            ),
            " ",
        ).alias("clean_text"),
    )


def _prepped_tokens(
    df: DataFrame, text_col: str, id_col: str, max_tokens: int | None
) -> DataFrame:
    """(__id, pos:int, tok) — :func:`token_positions` with the optional
    truncation applied and columns named for the doubling rounds."""
    toks = token_positions(df, text_col, id_col)
    if max_tokens is not None:
        toks = toks.filter(F.col("pos") < max_tokens)
    return toks.select(
        F.col(id_col).alias("__id"),
        F.col("pos").cast("int").alias("pos"),
        "tok",
    )


def _suffix_rank_levels(toks: DataFrame) -> tuple[list[DataFrame], int, int]:
    """Prefix-doubling rank rounds, all levels kept.

    Returns ``(levels, n_suffixes, max_len)``: ``levels[k]`` is
    ``(__id, pos, r)`` where ``r`` is the 1-based dense rank of the
    CLIPPED prefix ``tokens[pos : pos + 2**k]`` (clipped at the document
    end; equal ranks ⇔ equal clipped token sequences, length included).
    The last level is full suffix order: either ``2**k >= max_len``, or
    the early exit fired — all ranks distinct at level ``j`` implies
    every pairwise suffix LCP is < ``2**j`` (a shared length-``2**j``
    prefix would be a shared rank), so higher levels can never order
    anything further AND the greedy LCP walk in
    :func:`longest_repeated_prefix` needs no level above ``j``.

    Each level is ``localCheckpoint``-ed (the walk re-reads every level;
    lineage must not re-run earlier rounds).
    """
    from starchart_spark.operators import skew

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
    levels = [cur]

    # two driver scalars, once: total suffixes (early-exit target) and the
    # doubling depth bound
    row = cur.agg(F.count(F.lit(1)).alias("n"), F.max("pos").alias("mx")).collect()[0]
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
        pair_dim = pairs.select("r", "r2").distinct().withColumn("__one", F.lit(1))
        pair_ranked = skew.ordered_prefix(
            pair_dim, ["r", "r2"], "__one", rank_col="__nr"
        ).select("r", "r2", "__nr")
        cur = (
            pairs.join(pair_ranked, ["r", "r2"])
            .select("__id", "pos", F.col("__nr").cast("long").alias("r"))
            .localCheckpoint(eager=True)
        )
        levels.append(cur)
        gap *= 2
        if gap < max_len:
            # ranks all distinct ⇒ order is final; equal suffixes keep
            # their shared rank to the end, so this can only fire early
            # when no full-suffix duplicates remain unresolved
            mx = cur.agg(F.max("r").alias("m")).collect()[0]["m"]
            if int(mx) == n_suffixes:
                break
    return levels, n_suffixes, max_len


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
    toks = _prepped_tokens(df, text_col, id_col, max_tokens)
    levels, _, _ = _suffix_rank_levels(toks)
    return levels[-1].select(
        F.col("__id").alias(id_col), "pos", F.col("r").alias("srank")
    )


def longest_repeated_prefix(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int | None = None,
) -> DataFrame:
    """Per suffix, the length of its longest prefix that occurs at ≥ 2
    distinct corpus positions — ``(id, pos, lrp)``. This is the quantity
    Lee et al.'s suffix-array dedup actually consumes: a duplicated run
    of length ℓ starts at position p iff ``lrp(p) = ℓ``, at ANY ℓ, with
    no fixed window parameter.

    Classically lrp(s) = max(LCP with the two suffix-order neighbors).
    Distributed form over the prefix-doubling levels (the per-level rank
    tables double as the LCP oracle — the textbook O(log n) LCP query,
    run data-parallel over all neighbor pairs at once):

    1. group the final ranks: duplicated ranks (cnt ≥ 2) are whole-suffix
       repeats — lrp = suffix length, no walk needed; every DISTINCT rank
       elects one representative (members of a rank are identical
       strings, so any representative's LCPs are the rank's).
    2. pair consecutive distinct ranks (dense ⇒ r, r+1 adjacent) and walk
       levels high→low: at level k, if both shifted positions
       ``pos + cur`` carry EQUAL level-k ranks (equal clipped
       length-``2**k`` prefixes), add ``2**k`` to ``cur``. Greedy binary
       decomposition ⇒ ``cur`` ends at the true LCP; the one absorbing
       case — both remainders identical-to-end — would mean the full
       suffixes were identical (impossible across distinct ranks), and
       ``least(cur, len_a, len_b)`` caps it anyway.
    3. per suffix: ``lrp = greatest(cnt≥2 ? len : 0, lcp(prev), lcp(next))``.

    Cost: the walk is 2 narrow left joins per level over the
    distinct-rank pair table — O(log L) shuffles of ~40-byte rows, same
    scaling class as the build itself; no suffix content is ever
    materialized or shuffled. Each level re-reads a checkpointed 24-byte
    rank table.
    """
    toks = _prepped_tokens(df, text_col, id_col, max_tokens)
    levels, _, _ = _suffix_rank_levels(toks)
    final = levels[-1]

    lens = final.groupBy("__id").agg((F.max("pos") + 1).alias("__dl"))
    fr = (
        final.join(lens, "__id")
        .withColumn("slen", (F.col("__dl") - F.col("pos")).cast("int"))
        .drop("__dl")
    )
    stats = (
        fr.groupBy("r")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min(F.struct("__id", "pos", "slen")).alias("rep"),
        )
        .select(
            "r",
            "cnt",
            F.col("rep.__id").alias("rid"),
            F.col("rep.pos").alias("rpos"),
            F.col("rep.slen").alias("rlen"),
        )
        .localCheckpoint(eager=True)
    )

    nxt = stats.select(
        (F.col("r") - 1).alias("r"),
        F.col("rid").alias("idb"),
        F.col("rpos").alias("posb"),
        F.col("rlen").alias("lenb"),
    )
    pairs = (
        stats.select(
            "r",
            F.col("rid").alias("ida"),
            F.col("rpos").alias("posa"),
            F.col("rlen").alias("lena"),
        )
        .join(nxt, "r")
        .withColumn("cur", F.lit(0).cast("int"))
        .localCheckpoint(eager=True)
    )

    for k in range(len(levels) - 1, -1, -1):
        step = 1 << k
        a = levels[k].select(
            F.col("__id").alias("__aid"),
            F.col("pos").alias("__apos"),
            F.col("r").alias("__ar"),
        )
        b = levels[k].select(
            F.col("__id").alias("__bid"),
            F.col("pos").alias("__bpos"),
            F.col("r").alias("__br"),
        )
        joined = (
            pairs.withColumn("__ka", F.col("posa") + F.col("cur"))
            .withColumn("__kb", F.col("posb") + F.col("cur"))
            .join(
                a,
                (F.col("ida") == F.col("__aid")) & (F.col("__ka") == F.col("__apos")),
                "left",
            )
            .join(
                b,
                (F.col("idb") == F.col("__bid")) & (F.col("__kb") == F.col("__bpos")),
                "left",
            )
        )
        hit = (
            F.col("__ar").isNotNull()
            & F.col("__br").isNotNull()
            & (F.col("__ar") == F.col("__br"))
        )
        pairs = joined.select(
            "r",
            "ida",
            "posa",
            "lena",
            "idb",
            "posb",
            "lenb",
            (F.col("cur") + F.when(hit, F.lit(step)).otherwise(F.lit(0)))
            .cast("int")
            .alias("cur"),
        ).localCheckpoint(eager=True)

    ln = pairs.select("r", F.least("cur", "lena", "lenb").alias("lcp_n"))
    lp = ln.select((F.col("r") + 1).alias("r"), F.col("lcp_n").alias("lcp_p"))
    return (
        fr.join(stats.select("r", "cnt"), "r")
        .join(ln, "r", "left")
        .join(lp, "r", "left")
        .select(
            F.col("__id").alias(id_col),
            "pos",
            F.greatest(
                F.when(F.col("cnt") >= 2, F.col("slen")).otherwise(F.lit(0)),
                F.coalesce("lcp_n", F.lit(0)),
                F.coalesce("lcp_p", F.lit(0)),
            )
            .cast("long")
            .alias("lrp"),
        )
    )


def repeated_spans(
    df: DataFrame,
    length: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int | None = None,
) -> DataFrame:
    """Token positions covered by SOME duplicated run of ≥ ``length``
    tokens — ``(id, pos)``, the suffix-array route to exactly the set
    :func:`remove_duplicated_substrings` cuts (at ``min_count=2``): a
    position is covered iff a suffix start s ≤ pos has
    ``lrp(s) ≥ length`` and ``pos < s + lrp(s)`` — the union of the
    ``[s, s + lrp)`` intervals, threshold applied per start.

    Interval union = one per-document running max of interval ends over
    ``pos`` ascending. The window is doc-keyed single-task per doc —
    fine because DOCUMENT LENGTH is bounded at 100 TB (the scale axis is
    document COUNT); the corpus-wide heavy lifting already happened in
    the rank rounds.

    Equivalence note (tested): a duplicated run of length ℓ ≥ L contains
    ℓ−L+1 duplicated L-grams whose windows tile it, so this set equals
    the duplicated-L-gram coverage — which is the independent oracle
    formulation.
    """
    from pyspark.sql import Window

    lrp_df = longest_repeated_prefix(df, text_col, id_col, max_tokens)
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run_end = F.max(
        F.when(F.col("lrp") >= length, F.col("pos") + F.col("lrp"))
    ).over(w)
    return (
        lrp_df.withColumn("__end", run_end)
        .filter(F.col("__end") > F.col("pos"))
        .select(id_col, "pos")
    )
