"""Text-analysis operators for training-data pipelines.

These run over a ``documents(doc_id, text, ...)`` corpus at 100 TB scale, so
everything is built from JVM-side ``pyspark.sql.functions`` (whole-stage
codegen; filters and projections push to the parquet scan). No Python in any
of these paths.

Design for oracle-parity: each operator's arithmetic is defined so the exact
same computation is expressible in ANSI SQL (DuckDB), making the operators
verifiable end-to-end — see ``__spark_entry__.oracle_sql``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT = r"\s+"

# tiny marker-word sets for the n-gram-free language-ID heuristic; scoring is
# |tokens ∩ markers| per language, argmax with lexicographic tiebreak
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "nicht", "ist", "ein", "mit"],
    "en": ["the", "a", "and", "of", "to", "is", "in", "that"],
    "es": ["el", "la", "los", "que", "y", "de", "un", "una"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不"],
}

STOPWORDS = ["the", "a", "an", "and", "of", "to", "is", "in", "that", "it"]

# rolling-hash fingerprint parameters (token-order sensitive)
FP_MULT = 1_000_003
FP_MOD = 2_147_483_647  # 2^31 - 1


def tokens(text_col: Column | str) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(F.trim(c), TOKEN_SPLIT)


def token_count(text_col: Column | str) -> Column:
    """Whitespace token count; empty/blank text counts 0."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.when(F.trim(c) == "", F.lit(0)).otherwise(F.size(tokens(c)))


def sliding_ngrams(toks: Column, n: int, sep: str = " ") -> Column:
    """All n-token windows of a token-array column, in order.

    O(tokens) per row. The construction matters: higher-order-function
    lambdas run INTERPRETED and re-evaluate any captured expression once
    PER ELEMENT — `transform(sequence(...), i -> element_at(split(text),
    i))` re-runs the regex split for every window position, O(len²) per
    document (measured: a 270k-token corpus spent 5.4 s in one explode).
    Here the windows build through n-1 `zip_with` passes whose ARRAY
    arguments (slices of the token array) evaluate once per row; the
    lambda itself only concatenates its two arguments.

    Caller contract: only evaluate on rows with size(toks) >= n (wrap in
    a filter or a when() guard) — shorter rows would hand slice() a
    non-positive length.
    """
    m = F.size(toks) - (n - 1)
    out = F.slice(toks, 1, m)
    for j in range(1, n):
        out = F.zip_with(
            out, F.slice(toks, 1 + j, m), lambda a, b: F.concat_ws(sep, a, b)
        )
    return out


def ensure_min_partitions(df: DataFrame) -> DataFrame:
    """Round-robin repartition ONLY when the scan is under-parallel.

    Token/shingle explodes multiply rows ~tokens-per-doc×; when the input
    is a single small file (the bench/test box), that CPU burn lands on
    one task. A real 100 TB corpus arrives as ~10^5 input splits and this
    is a no-op (guard: input partitions already ≥ half the cluster's
    parallelism) — the shuffle is bounded by construction to toy inputs,
    never the at-scale path.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() * 2 <= target:
        return df.repartition(target)
    return df


def normalize_text(text_col: Column | str) -> Column:
    """Canonical text form for dedup keys: lowercase, control characters
    and zero-width marks stripped, all whitespace runs collapsed to one
    space, trimmed. Pure JVM regexp (codegen); the standard cleanup before
    exact/near dedup so trivially-different bytes hash identically. (No
    Unicode NFC here — Spark has no built-in normalizer and a Python UDF
    in the dedup hot path is exactly what this module avoids; NFC belongs
    in ingest if sources mix compositions.)"""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    # strip NON-whitespace controls first (whitespace controls must become
    # spaces, not vanish); explicit whitespace class because Java \s and
    # RE2 \s disagree on \x0B — the oracle must byte-match
    cleaned = F.regexp_replace(
        c, r"[\x00-\x08\x0E-\x1F\x7F\x{200B}-\x{200D}\x{FEFF}]", ""
    )
    return F.trim(F.regexp_replace(F.lower(cleaned), "[ \t\n\x0B\f\r]+", " "))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features.

    All ratios are double arithmetic over counts, so bit-stable across
    engines. ``quality_score`` is a simple bounded combination used for
    threshold filtering of low-quality documents.
    """
    c = F.col(text_col)
    n_chars = F.length(c)
    n_tokens = token_count(c)
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[.,;:!?'\"()\[\]{}]", ""))
    toks = tokens(c)
    n_stop = F.size(F.array_intersect(toks, F.array(*[F.lit(s) for s in STOPWORDS])))
    # distinct stopwords present / tokens — deliberately set-based so the SQL
    # oracle (array intersect) is exact
    return (
        df.withColumn("n_chars_calc", n_chars.cast("long"))
        .withColumn("n_tokens", n_tokens.cast("long"))
        # rounded BEFORE quality_score composes it — the SQL oracle rounds
        # punct_ratio in its CTE, so an unrounded value here could flip
        # quality_score's 6th decimal on adversarial punct densities
        .withColumn(
            "punct_ratio",
            F.round(n_punct.cast("double") / F.greatest(n_chars, F.lit(1)), 6),
        )
        .withColumn(
            "mean_token_len",
            F.round(
                (F.length(F.regexp_replace(c, r"\s+", "")).cast("double"))
                / F.greatest(n_tokens, F.lit(1)),
                6,
            ),
        )
        .withColumn(
            "stopword_hits", n_stop.cast("long")
        )
        .withColumn(
            "quality_score",
            F.round(
                F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0)) * 0.5
                + F.least(F.col("stopword_hits") / F.lit(5.0), F.lit(1.0)) * 0.3
                + (1.0 - F.least(F.col("punct_ratio") * 10.0, F.lit(1.0))) * 0.2,
                6,
            ),
        )
    )


def lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Marker-word language ID: argmax over per-language hit counts,
    lexicographic language-code tiebreak, 'und' (undetermined) when all 0."""
    toks = tokens(F.col(text_col))
    scored = df
    for lang, markers in sorted(LANG_MARKERS.items()):
        hits = F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in markers])))
        scored = scored.withColumn(f"__score_{lang}", hits)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"__score_{la}") for la in langs])
    pick = F.lit("und")
    for la in reversed(langs):  # earlier language wins ties → apply in reverse
        pick = F.when(
            (F.col(f"__score_{la}") == best) & (best > 0), F.lit(la)
        ).otherwise(pick)
    out = scored.withColumn(out_col, pick)
    return out.drop(*[f"__score_{la}" for la in langs])


def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fp") -> DataFrame:
    """Order-sensitive rolling document fingerprint.

    h = fold(tokens, 0, (acc, t) -> (acc*FP_MULT + length(t)*131 + ascii(t)) % FP_MOD)

    Portable arithmetic (same fold runs in DuckDB via list_reduce), token-order
    sensitive (a permuted document fingerprints differently), and cheap: one
    pass, JVM-side ``aggregate`` — no shuffle at all.
    """
    toks = tokens(F.col(text_col))
    h = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * FP_MULT + F.length(t) * 131 + F.coalesce(F.ascii(t), F.lit(0)))
        % FP_MOD,
    )
    return df.withColumn(out_col, h)
