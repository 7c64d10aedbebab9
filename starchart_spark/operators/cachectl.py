"""HTTP cache semantics for the re-crawl loop — RFC 9111 freshness + the
conditional-GET decision.

A 100 TB re-crawl spends most of its bandwidth refetching things that did
not change. The standard machinery already exists in HTTP: servers hand
the crawler a freshness lifetime (``Cache-Control: max-age``), validators
(``ETag``, ``Last-Modified``), and opt-outs (``no-store`` / ``no-cache``).
This module turns a stored-response ledger into per-URL revisit decisions:

- ``fresh``       — inside the freshness lifetime: do not contact the host
                    at all (zero bandwidth, zero politeness budget);
- ``revalidate``  — stale but a validator exists: send a conditional GET
                    (``If-None-Match`` preferred over
                    ``If-Modified-Since``, RFC 9110 §13.1.2) and expect a
                    body-less 304 most of the time;
- ``fetch``       — ``no-store`` or nothing to validate with: full GET.

Decision precedence (RFC 9111 simplified to what a crawler stores):

1. ``no-store``            → fetch (response was never cacheable)
2. ``no-cache``            → revalidate if a validator exists, else fetch
3. ``age < lifetime``      → fresh, where lifetime is ``max-age`` when
   present, else the §4.2.2 heuristic ``(fetched − last_modified) / 10``
   when ``Last-Modified`` exists, else 0
4. stale                   → revalidate if a validator exists, else fetch

Everything is one codegen'd projection — integer epoch-second arithmetic,
``Cache-Control`` directives pulled with RE2∩Java-safe regexes (the pii.py
discipline) so the DuckDB oracle replays byte-identical rules. No shuffle:
this is a scan-level enrichment the scheduler's due-predicate composes
with (recrawl.due_hosts decides WHEN, this decides HOW).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# value-directive and flag-directive extraction. Directive names are
# case-insensitive tokens delimited by start/comma; values here are the
# integer forms a crawler stores (quoted forms are unquoted upstream at
# fetch time). RE2-safe: no lookaround, no backrefs.
_MAX_AGE_RX = r"(?i)(?:^|[,\s])max-age=([0-9]+)"
_NO_STORE_RX = r"(?i)(?:^|[,\s])no-store(?:$|[,\s])"
_NO_CACHE_RX = r"(?i)(?:^|[,\s])no-cache(?:$|[,\s])"


def max_age_s(cc: Column) -> Column:
    """``max-age`` seconds from a Cache-Control string, NULL when absent."""
    v = F.regexp_extract(cc, _MAX_AGE_RX, 1)
    return F.when(v != "", v.cast("long"))


def cache_decision(
    responses: DataFrame,
    now_s: int,
    etag_col: str = "etag",
    last_modified_col: str = "last_modified_s",
    cache_control_col: str = "cache_control",
    fetched_col: str = "fetched_s",
) -> DataFrame:
    """Adds ``age_s``, ``fresh_for_s``, ``decision``, ``cond_header``.

    ``decision`` ∈ {fresh, revalidate, fetch}; ``cond_header`` names the
    conditional request header to send (``if-none-match`` /
    ``if-modified-since``) and is NULL unless decision = revalidate.
    ``fresh_for_s`` is the computed freshness lifetime (0 when the
    response offers none) — exposed so schedulers can order revisits by
    time-to-stale. ``now_s`` is an injected clock, engine-style (N8)."""
    cc = F.coalesce(F.col(cache_control_col), F.lit(""))
    etag = F.col(etag_col)
    lm = F.col(last_modified_col)
    fetched = F.col(fetched_col)

    age = F.lit(int(now_s)) - fetched
    lifetime = F.coalesce(
        max_age_s(cc),
        # RFC 9111 §4.2.2 heuristic: a tenth of the distance between
        # Last-Modified and the fetch. Integer div — exact cross-engine.
        F.when(lm.isNotNull(), F.expr(f"({fetched_col} - {last_modified_col}) div 10")),
        F.lit(0),
    ).alias("fresh_for_s")

    no_store = cc.rlike(_NO_STORE_RX)
    no_cache = cc.rlike(_NO_CACHE_RX)
    has_validator = etag.isNotNull() | lm.isNotNull()

    decision = (
        F.when(no_store, F.lit("fetch"))
        .when(no_cache & has_validator, F.lit("revalidate"))
        .when(no_cache, F.lit("fetch"))
        .when(age < lifetime, F.lit("fresh"))
        .when(has_validator, F.lit("revalidate"))
        .otherwise(F.lit("fetch"))
    )
    cond = F.when(
        decision == "revalidate",
        F.when(etag.isNotNull(), F.lit("if-none-match")).otherwise(
            F.lit("if-modified-since")
        ),
    )
    return responses.select(
        "*",
        age.alias("age_s"),
        lifetime,
        decision.alias("decision"),
        cond.alias("cond_header"),
    )
