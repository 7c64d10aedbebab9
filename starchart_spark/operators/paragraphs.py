"""Paragraph-level dedup: remove corpus-frequent paragraphs from documents.

The CCNet/RefinedWeb cleanup step below whole-document dedup (Wenzek et al.
2020 dedupe at paragraph granularity; Penedo et al. 2023 strip repeated
lines): a paragraph that appears in many documents is boilerplate (nav
text, license headers, cookie banners) and is cut from EVERY document it
appears in, preserving the order of what remains.

Spark-first shape, one pass each way:
- split → ``posexplode`` keeps (doc, position, paragraph) so reassembly is
  exact;
- document frequency is ONE aggregate over the exploded rows
  (``count_distinct(doc)`` runs partial per-key distinct map-side);
- the frequent set is tiny by construction (only paragraphs crossing the
  ``min_df`` floor survive the HAVING), so it broadcasts and removal is a
  broadcast anti-join — the corpus itself never shuffles for the decision;
- reassembly groups by doc and stitches the kept paragraphs back in
  position order (``array_sort`` on (pos, para) structs sorts by pos
  first), ONE shuffle keyed by doc_id.

100 TB notes: the only corpus-wide shuffle is the frequency aggregate, and
its rows can be narrowed to (xxhash64(para), doc_id) when paragraph strings
are long — the broadcast dim then carries the hash and the anti-join
matches on it (collision odds at 8 bytes are ~n²/2⁶⁵; acceptable for
boilerplate removal, not for exact claims — this module keeps the exact
string form so the DuckDB oracle is byte-identical). Reassembly's doc_id
shuffle carries only kept paragraphs, already thinned by the anti-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from starchart_spark.operators.text import ensure_min_partitions


def split_paragraphs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = r"\n",
) -> DataFrame:
    """``(id, pidx, para)`` — one row per non-blank paragraph, position
    preserved. Blank paragraphs (empty or whitespace-only between
    separators) are dropped here and therefore absent from reassembled
    text: the canonical form has no empty paragraphs."""
    # spread before the explode: a single-file scan would run the whole
    # per-paragraph stage on one task (no-op at scale — guide §2.5)
    return (
        ensure_min_partitions(df)
        .select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), sep)).alias("pidx", "para"),
        )
        .filter(F.trim(F.col("para")) != "")
    )


def chunk_paragraphs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 6,
) -> DataFrame:
    """Synthetic paragraph structure for flat corpora: fixed-size token
    windows as pseudo-paragraphs, ``(id, pidx, para)``.

    The testdata documents are single-line token streams (no ``\\n``), so
    the registry query exercises the real paragraph-dedup plan through
    this deterministic chunker; a real corpus uses
    :func:`split_paragraphs` instead. Same explode shape either way.

    The token array materializes as a COLUMN before the transform: a
    lambda capturing the raw split EXPRESSION re-runs the regex split
    once per chunk (the O(tokens²) HOF re-eval trap, BENCH.md round 5 —
    invisible on 40-token gate docs, ruinous on 10k-token real ones);
    capturing a bound column reference is an O(1) field read."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    # spread before the explode (guide §2.5; no-op at scale)
    base = ensure_min_partitions(df).select(F.col(id_col), toks.alias("__toks"))
    n_chunks = F.ceil(F.size("__toks") / F.lit(float(chunk_tokens))).cast("int")
    paras = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(
            F.slice(F.col("__toks"), i * chunk_tokens + 1, chunk_tokens), " "
        ),
    )
    return (
        base.select(F.col(id_col), F.posexplode(paras).alias("pidx", "para"))
        .filter(F.trim(F.col("para")) != "")
    )


def frequent_paragraphs(
    paras: DataFrame,
    min_df: int = 2,
    id_col: str = "doc_id",
    para_col: str = "para",
) -> DataFrame:
    """Paragraphs whose document frequency reaches ``min_df`` — the
    boilerplate set. One aggregate; the HAVING floor keeps the result
    broadcast-sized (a paragraph in only one doc can never appear here,
    and those are the overwhelming majority of a real corpus)."""
    return (
        paras.groupBy(para_col)
        .agg(F.count_distinct(F.col(id_col)).alias("df"))
        .filter(F.col("df") >= min_df)
        .select(para_col)
    )


def remove_frequent_paragraphs(
    paras: DataFrame,
    min_df: int = 2,
    id_col: str = "doc_id",
    para_col: str = "para",
    sep_out: str = "\n",
) -> DataFrame:
    """``(id, clean_text)`` — every document from ``paras``'s id space with
    its corpus-frequent paragraphs cut and the remainder rejoined in the
    original order. A document whose every paragraph was frequent comes
    back as ``''`` (kept as a row so row-count parity with the input holds
    for the docs that had any paragraph at all)."""
    # paras feeds THREE consumers (frequency dim, anti-join probe side,
    # id space); checkpoint once so the upstream split/chunk explode does
    # not re-execute per consumer (guide §2.4; plan-only, results equal)
    paras = paras.localCheckpoint(eager=True)
    freq = frequent_paragraphs(paras, min_df, id_col, para_col)
    kept = paras.join(F.broadcast(freq), para_col, "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pidx", para_col))),
                lambda s: s[para_col],
            ),
            sep_out,
        ).alias("clean_text")
    )
    all_ids = paras.select(id_col).distinct()
    return all_ids.join(rebuilt, id_col, "left").select(
        F.col(id_col), F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text")
    )


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = r"\n",
    min_df: int = 2,
    sep_out: str = "\n",
) -> DataFrame:
    """End-to-end: split on ``sep``, cut paragraphs with document
    frequency ≥ ``min_df``, reassemble — ``(id, clean_text)``."""
    return remove_frequent_paragraphs(
        split_paragraphs(df, text_col, id_col, sep),
        min_df=min_df,
        id_col=id_col,
        sep_out=sep_out,
    )


def host_template_paragraphs(
    paras: DataFrame,
    min_share_1000: int = 500,
    min_pages: int = 2,
    host_col: str = "hostname",
    id_col: str = "doc_id",
    para_col: str = "para",
) -> DataFrame:
    """(hostname, para) — a HOST's template paragraphs: text appearing on
    at least ``min_share_1000``/1000 of that host's pages (and on ≥
    ``min_pages`` absolutely). This is the nav/footer/sidebar cut a
    text-extraction pipeline makes BEFORE corpus-global dedup: a site
    template repeats on one host's every page but may be globally rare,
    so :func:`frequent_paragraphs`' corpus-wide document frequency never
    sees it at real corpus scale.

    Share compares in exact integer milli-units (``df·1000 ≥
    share·pages`` — no float ratio, engine-identical). Two aggregates +
    one broadcast host-dim join; the result dim is per-host-template-
    sized, made for a broadcast anti-join downstream."""
    pages = paras.groupBy(host_col).agg(
        F.count_distinct(F.col(id_col)).alias("__pages")
    )
    df_host = paras.groupBy(host_col, para_col).agg(
        F.count_distinct(F.col(id_col)).alias("__df")
    )
    return (
        df_host.join(F.broadcast(pages), host_col)
        .filter(
            (F.col("__df") >= min_pages)
            & (F.col("__df") * 1000 >= F.lit(int(min_share_1000)) * F.col("__pages"))
        )
        .select(host_col, para_col)
    )


def strip_host_template(
    paras: DataFrame,
    min_share_1000: int = 500,
    min_pages: int = 2,
    host_col: str = "hostname",
    id_col: str = "doc_id",
    para_col: str = "para",
    sep_out: str = "\n",
) -> DataFrame:
    """``(hostname, id, clean_text)`` — per-host template paragraphs cut,
    remainder rejoined in original order (the remove_frequent_paragraphs
    reassembly, anti-joined on (host, para) instead of para alone so one
    host's template never censors another host's genuine content)."""
    tmpl = host_template_paragraphs(
        paras, min_share_1000, min_pages, host_col, id_col, para_col
    )
    kept = paras.join(F.broadcast(tmpl), [host_col, para_col], "left_anti")
    rebuilt = kept.groupBy(host_col, id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pidx", para_col))),
                lambda s: s[para_col],
            ),
            sep_out,
        ).alias("clean_text")
    )
    all_ids = paras.select(host_col, id_col).distinct()
    return all_ids.join(rebuilt, [host_col, id_col], "left").select(
        host_col,
        F.col(id_col),
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
    )
