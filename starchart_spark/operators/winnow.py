"""MOSS winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003).

Local document fingerprinting for plagiarism/overlap detection — the
published guarantee: from every window of ``w`` consecutive k-gram hashes,
at least one is selected (rightmost minimum), so any shared substring of
length ≥ w+k-1 tokens between two documents shares at least one selected
fingerprint. The selected (hash, position) set is tiny (~2/(w+1) density)
and joins like any inverted index — the between-document matching step is
the same bucket join :mod:`dedup_text` already does on shingles.

Everything is relational and shuffle-shaped for scale:

1. positional token explode (one pass);
2. gram hash per start position via ``lead()`` windows — a degree-(k-1)
   polynomial in per-token values with literal coefficients, so the whole
   hash is whole-stage-codegen integer arithmetic (no char loops, no HOF
   re-evaluation hazard, NOTES.md round-5);
3. rightmost-min-per-window as ONE window ``min`` over an order-encoding
   key: ``key = gh·POSCAP + (POSCAP − pos)`` — minimizing key minimizes
   the hash and, on ties, maximizes the position, which IS the winnowing
   tie rule. The per-doc sort is the only shuffle after the explode.

Documents shorter than one full window (m < w grams) degenerate to a
single window over all grams — matching the paper's "every document with
at least one gram yields at least one fingerprint".

Hashing has two modes, same selection logic:
- ``portable=False`` (production): ``xxhash64`` per gram-start token run —
  strong 64-bit gram identity (folded to < 2^31 so the encode key stays in
  62 bits);
- ``portable=True`` (oracle parity): per-token arithmetic value
  ``(length·131 + ascii(first)·31 + ascii(last)) mod 2^31−1`` folded with
  :data:`text.FP_MULT` powers — the identical expression runs in DuckDB,
  so the driver gate hash-matches end to end (``winnow_fingerprint``).

Reference note: forgeflux-org/starchart has no fingerprinting layer; this
is a "beyond the reference" training-data operator (build brief: document
fingerprinting), in the standard published form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from starchart_spark.operators.text import FP_MOD, FP_MULT, ensure_min_partitions

# positions per document cap for the order-encoding key: gh < 2^31 and
# POSCAP = 2^20 keep gh·POSCAP + POSCAP < 2^52 — exact in longs AND in
# doubles, so the oracle may not silently round. 10^6 tokens/doc is far
# beyond any training-data shard; assert rather than corrupt.
POSCAP = 1 << 20


def _portable_token_value(tok) -> F.Column:
    """Per-token integer in [0, FP_MOD): engine-portable arithmetic only
    (length + first/last code points — same family as text.fingerprint)."""
    return (
        F.length(tok) * 131
        + F.coalesce(F.ascii(tok), F.lit(0)) * 31
        + F.coalesce(F.ascii(F.reverse(tok)), F.lit(0))
    ) % FP_MOD


def winnow_fingerprints(
    df: DataFrame,
    k: int = 4,
    w: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    portable: bool = False,
) -> DataFrame:
    """Selected fingerprints: (id, pos, gh) — winnowed k-gram hashes.

    ``pos`` is the 1-based token index of the gram start; ``gh`` the gram
    hash (< 2^31 in both modes). Output is distinct: one row per selected
    fingerprint, the paper's fingerprint set.
    """
    if k < 1 or w < 1:
        raise ValueError("k and w must be >= 1")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    # spread before the explode: a single-file scan would run the whole
    # per-token stage on one task (no-op at scale — guide §2.5)
    pos_tok = (
        ensure_min_partitions(df.filter(F.length(F.trim(F.col(text_col))) > 0))
        .select(F.col(id_col).alias("__id"), toks.alias("__t"))
        .select("__id", F.posexplode("__t").alias("__p0", "__tok"))
        .select("__id", (F.col("__p0") + 1).alias("pos"), "__tok")
    )
    order = Window.partitionBy("__id").orderBy("pos")
    if portable:
        base = pos_tok.withColumn(
            "__tv", _portable_token_value(F.col("__tok")).cast("long")
        )
        # degree-(k-1) polynomial with literal coefficient FP_MULT^j mod FP_MOD:
        # each term < 2^62, reduced immediately — ANSI-safe signed longs.
        coeffs = [pow(FP_MULT, k - 1 - j, FP_MOD) for j in range(k)]
        gh = None
        for j, c in enumerate(coeffs):
            term = (
                (F.lead("__tv", j).over(order) * F.lit(c)) % FP_MOD
            )
            gh = term if gh is None else (gh + term)
        gh = gh % FP_MOD
        valid = F.lead("__tv", k - 1).over(order).isNotNull()
    else:
        # production: strong 64-bit hash of the gram's token run, folded
        # below 2^31 so the same encode key fits exact integer range.
        base = pos_tok
        gram_str = F.concat_ws(
            " ", *[F.lead("__tok", j).over(order) for j in range(k)]
        )
        gh = F.pmod(F.xxhash64(gram_str), F.lit(FP_MOD))
        valid = F.lead("__tok", k - 1).over(order).isNotNull()
    grams = (
        base.withColumn("gh", gh.cast("long"))
        .withColumn("__valid", valid)
        .filter("__valid")
        .select("__id", "pos", "gh")
    )
    gwin = Window.partitionBy("__id").orderBy("pos")
    m = F.count(F.lit(1)).over(Window.partitionBy("__id"))
    key = F.col("gh") * POSCAP + (F.lit(POSCAP) - F.col("pos"))
    sel = (
        grams.withColumn("__m", m)
        .withColumn("__key", key)
        .withColumn(
            "__sel_key",
            F.min("__key").over(gwin.rowsBetween(0, w - 1)),
        )
        # window starts: every full window, or the single clipped window
        # for short documents (m < w)
        .filter(F.col("pos") <= F.greatest(F.col("__m") - (w - 1), F.lit(1)))
        .select(
            F.col("__id").alias(id_col),
            (F.lit(POSCAP) - F.pmod("__sel_key", F.lit(POSCAP))).alias("pos"),
            F.expr(f"__sel_key div {POSCAP}").alias("gh"),
        )
        .distinct()
    )
    return sel


def mirror_hosts(
    fps: DataFrame,
    host_col: str = "hostname",
    min_shared: int = 2,
    min_ratio: float = 0.8,
) -> DataFrame:
    """Mirror-host candidates from host-level fingerprint containment
    (Bharat & Broder's mirror detection by shingle overlap, WWW 1999 —
    winnowed fingerprints in the shingle role): hosts whose selected
    fingerprint sets overlap by ≥ ``min_ratio`` of the smaller set are
    likely mirrors, and a 10^10-URL frontier should crawl only one of them.

    Input: fingerprints with a host column (join your doc→host dim onto
    :func:`winnow_fingerprints` output first). Output: (a_host, b_host,
    shared_fps, containment) with a_host < b_host. The pair join is
    bucketed on gh — hot boilerplate hashes behave like hot shingles, cap
    them upstream as dedup_text's prefix filter does. ``containment`` is
    one IEEE division of exact longs — cross-engine deterministic.
    """
    hf = fps.select(host_col, "gh").distinct()
    sizes = hf.groupBy(host_col).agg(F.count(F.lit(1)).alias("n_fp"))
    a = hf.select(F.col(host_col).alias("a_host"), "gh")
    b = hf.select(F.col(host_col).alias("b_host"), "gh")
    shared = (
        a.join(b, "gh")
        .filter(F.col("a_host") < F.col("b_host"))
        .groupBy("a_host", "b_host")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
    )
    return (
        shared.join(
            sizes.select(F.col(host_col).alias("a_host"), F.col("n_fp").alias("na")),
            "a_host",
        )
        .join(
            sizes.select(F.col(host_col).alias("b_host"), F.col("n_fp").alias("nb")),
            "b_host",
        )
        .withColumn(
            "containment",
            F.col("shared_fps").cast("double")
            / F.least("na", "nb").cast("double"),
        )
        .filter(
            (F.col("shared_fps") >= min_shared)
            & (F.col("containment") >= min_ratio)
        )
        .select("a_host", "b_host", "shared_fps", "containment")
    )


def fingerprint_matches(
    fps: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Document pairs sharing ≥1 selected fingerprint hash, with the
    shared-fingerprint count — the standard winnowing match step (bucket
    join on gh; hot hashes are boilerplate and behave like hot shingles —
    cap or df-filter them upstream exactly as dedup_text's prefix filter
    does)."""
    a = fps.select(F.col(id_col).alias("a_id"), "gh")
    b = fps.select(F.col(id_col).alias("b_id"), "gh")
    return (
        a.join(b, "gh")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.countDistinct("gh").alias("shared_fps"))
    )
