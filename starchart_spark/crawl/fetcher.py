"""Batched HTTP fetcher — the production fetch path for S3 (real mode).

The sandbox engine "fetches" by joining page URLs against the documents
table (the S3 stand-in, SURVEY.md §2.1). This module is the real-crawl
hook the engine docstring promised: an ``applyInPandas`` per HOST that
performs the batch's fetches for that host strictly in slot order,
sleeping until each fetch's politeness send time — the token-bucket slots
computed by operators/politeness.py ARE the send schedule; the worker just
honors it. Reference anchor: the per-host sequential fetch loop with rate
sleeps (/root/reference/forge/gitea/src/lib.rs:88-148,
/root/reference/src/spider.rs:65-122).

Transport contract: an injected picklable callable ``(url: str) -> spans |
None`` where ``spans`` is the interleaved span sequence (list of
``{kind, text, media_ref, offset}``) and ``None`` means missing page / 404
— the engine's termination sentinel. In the interleaved-document data
model the wire body IS the span sequence; a deployment fetching real
HTML/JSON parses the body into spans inside its transport. Tests inject
fakes: a recording transport asserting per-host call spacing ≥ rate, and a
corpus-backed transport proving engine end-state equality with the
documents-join path (tests/test_fetcher.py).

Scale shape: one task per host group — per-host fetches are inherently
sequential (politeness), hosts fan out across executors. The group columns
stay narrow (URLs + slots); bodies surface as the ``spans`` column, i.e.
the same shape the documents join produces, so everything downstream of
the fetch is identical between the two modes.
"""

from __future__ import annotations

import time
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from starchart_spark import tables

SPANS_TYPE = next(f for f in tables.DOCUMENTS.fields if f.name == "spans").dataType

Transport = Callable[[str], "list | None"]


def fetch_batch(
    scheduled: DataFrame,
    transport: Transport,
    slot_col: str = "slot_ms",
    host_col: str = "hostname",
    url_col: str = "doc_id",
) -> DataFrame:
    """Fetch every scheduled row, per host in slot order, honoring slots.

    Each host group establishes its own t0 when its task starts; fetch i
    sleeps until ``slot_ms[i]`` relative to that t0 before calling the
    transport, so consecutive calls to one host are spaced by at least the
    politeness rate (slots are cummax(prev + rate)). Output = input columns
    + ``spans`` (null for missing pages) + ``sent_at_ms`` (actual send time
    relative to the group t0, for audit/tests).
    """
    out_schema = T.StructType(
        scheduled.schema.fields
        + [
            T.StructField("spans", SPANS_TYPE, True),
            T.StructField("sent_at_ms", T.LongType(), False),
        ]
    )

    def _fetch(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(slot_col, kind="mergesort").reset_index(drop=True)
        t0 = time.monotonic()
        spans_out, sent = [], []
        for i in range(len(pdf)):
            target_s = float(pdf[slot_col].iloc[i]) / 1000.0
            now_s = time.monotonic() - t0
            if now_s < target_s:
                time.sleep(target_s - now_s)
            spans_out.append(transport(pdf[url_col].iloc[i]))
            sent.append(int((time.monotonic() - t0) * 1000))
        pdf["spans"] = spans_out
        pdf["sent_at_ms"] = sent
        return pdf

    return scheduled.groupBy(host_col).applyInPandas(_fetch, out_schema)


def corpus_transport(documents_rows: dict) -> Transport:
    """A transport backed by an in-memory doc_id → spans mapping — the
    sandbox stand-in for a live HTTP client, used to prove the real-fetch
    engine mode reproduces the documents-join mode exactly."""

    def _get(url: str):
        return documents_rows.get(url)

    return _get
