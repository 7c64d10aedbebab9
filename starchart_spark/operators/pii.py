"""PII scrubbing for LLM training corpora — pure-JVM regexp pipeline.

The standard pre-training redaction pass (emails, phone numbers, IPv4
addresses → typed placeholder tokens) as chained ``regexp_replace`` inside
whole-stage codegen — no Python in the path, and every pattern is written
in the RE2-compatible subset so the DuckDB oracle runs the byte-identical
regex (both engines anchor on ``\\b`` word boundaries; no lookaround, no
backreferences).

Order matters and is fixed: emails first (an email contains dot-runs an
aggressive IP pattern could clip), then IPs, then phones. Counts are taken
BEFORE scrubbing from the same patterns so ``pii_features`` is consistent
with what ``scrub_pii`` removes.

Reference note: forgeflux-org/starchart has no PII layer — this is one of
the "beyond the reference" training-data operators the build brief
mandates (alongside dedup/curation), following the public C4/CCNet-style
cleanup recipes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# RE2 ∩ java.util.regex subset — keep in lockstep with the SQL oracle in
# queries.py (SQL_PII_SCRUB): same pattern strings, same order.
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
# international-ish grouped digits: 2-3 digit country/area lead then 3-4
# digit groups separated by - or . (covers TPC-H c_phone '25-989-741-2988')
PHONE_RE = r"\b[0-9]{2,3}[-.][0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b"

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def scrub_pii(text_col: Column | str) -> Column:
    """Redact emails → ``<EMAIL>``, IPv4s → ``<IP>``, phones → ``<PHONE>``."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    c = F.regexp_replace(c, EMAIL_RE, EMAIL_TOKEN)
    c = F.regexp_replace(c, IPV4_RE, IP_TOKEN)
    c = F.regexp_replace(c, PHONE_RE, PHONE_TOKEN)
    return c


def pii_features(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc PII audit + scrub in ONE projection (zero shuffles):
    ``(id, n_emails, n_ipv4, n_phones, clean_text)``. At 100 TB this is a
    single codegen'd scan — the counts ride the same stage as the rewrite,
    so auditing costs nothing extra."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(c, F.lit(f"({EMAIL_RE})"), 1)).alias("n_emails"),
        F.size(F.regexp_extract_all(c, F.lit(f"({IPV4_RE})"), 1)).alias("n_ipv4"),
        F.size(F.regexp_extract_all(c, F.lit(f"({PHONE_RE})"), 1)).alias("n_phones"),
        scrub_pii(c).alias("clean_text"),
    )
