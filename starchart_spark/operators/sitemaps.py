"""Sitemap-protocol ingestion (sitemaps.org) — crawl discovery channel #2.

Link extraction finds what pages SAY exists; sitemaps are the host
TELLING the crawler what exists, with freshness hints (``lastmod``,
``changefreq``) and relative ``priority`` — a production frontier merges
both channels, and deep-site coverage (pagination islands, media
archives) usually arrives via sitemaps only. The reference discovers
work purely by paging a search API (src/spider.rs crawl loop); this is
the open-web generalization of that "host-provided work list".

Parsing is a tolerant regex scan, NOT a strict XML parse, and that is a
feature: real-world sitemaps are full of namespace soup, stray bytes
and truncations, and every production crawler scans for the protocol's
four child elements rather than validating documents. Everything stays
JVM-side (``regexp_extract_all`` → one explode → per-field
``regexp_extract`` inside whole-stage codegen); the DuckDB oracle runs
the same RE2-compatible patterns, so the tolerance rules themselves are
pinned cross-engine. Malformed entries (no ``<loc>``) drop; XML
entities in locs are unescaped (the five predefined ones, ``&amp;``
LAST so double-escapes stay literal — documented, mirrored in SQL).

Scale shape: one body row fans out to its entry count in-plan; nothing
shuffles until the caller aggregates. :func:`frontier_candidates`
dedups (host, loc) keeping the strongest hint — ONE map-side-combined
exchange — and its output feeds the same keep-first → seen-probe path
every other discovery channel uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# sitemaps.org: valid changefreq values; priority defaults to 0.5
CHANGEFREQS = ["always", "hourly", "daily", "weekly", "monthly", "yearly", "never"]
DEFAULT_PRIORITY_1000 = 500

_LOC_RE = r"(?s)<loc>\s*(.*?)\s*</loc>"
_LASTMOD_RE = r"<lastmod>\s*(\d{4}-\d{2}-\d{2})"
_FREQ_RE = r"(?s)<changefreq>\s*(\w+)\s*</changefreq>"
_PRI_RE = r"(?s)<priority>\s*(\d(?:\.\d{1,3})?)\s*</priority>"


def _unescape(col: F.Column) -> F.Column:
    # &amp; last: '&amp;lt;' must yield the literal '&lt;', not '<'
    for ent, ch in [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"), ("&amp;", "&")]:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def parse_sitemaps(
    bodies: DataFrame, host_col: str = "hostname", body_col: str = "body"
) -> DataFrame:
    """(``host_col``, kind, loc, lastmod_days, changefreq, priority_1000)
    per sitemap entry. kind = 'url' for ``<urlset>`` entries, 'sitemap'
    for ``<sitemapindex>`` references (the frontier enqueues those as
    further sitemap fetches). lastmod keeps the W3C date prefix as epoch
    days; priority is exact integer milli-units (spec default 500 for
    url entries); changefreq outside the spec vocabulary nulls out."""
    blocks = F.concat(
        F.transform(
            F.regexp_extract_all(body_col, F.lit(r"(?s)<url>(.*?)</url>"), 1),
            lambda b: F.struct(F.lit("url").alias("kind"), b.alias("b")),
        ),
        F.transform(
            F.regexp_extract_all(body_col, F.lit(r"(?s)<sitemap>(.*?)</sitemap>"), 1),
            lambda b: F.struct(F.lit("sitemap").alias("kind"), b.alias("b")),
        ),
    )
    e = bodies.select(host_col, F.explode(blocks).alias("e")).select(
        host_col, F.col("e.kind").alias("kind"), F.col("e.b").alias("b")
    )
    # one sitemap body fans out to ~10^4-10^5 entry rows, so after the
    # explode the input partitioning is meaningless — a handful of giant
    # bodies would leave the four per-entry regexes below running on as
    # many tasks as there were bodies. Rebalance to the cluster width
    # before the per-entry field extraction (guide §2.5 input skew).
    e = e.repartition(e.sparkSession.sparkContext.defaultParallelism)
    loc = _unescape(F.regexp_extract("b", _LOC_RE, 1))
    freq = F.regexp_extract("b", _FREQ_RE, 1)
    pri = F.regexp_extract("b", _PRI_RE, 1)
    out = e.select(
        host_col,
        "kind",
        loc.alias("loc"),
        F.datediff(
            F.to_date(F.nullif(F.regexp_extract("b", _LASTMOD_RE, 1), F.lit(""))),
            F.to_date(F.lit("1970-01-01")),
        ).alias("lastmod_days"),
        F.when(freq.isin(CHANGEFREQS), freq).alias("changefreq"),
        F.when(
            F.col("kind") == "url",
            F.coalesce(
                (F.nullif(pri, F.lit("")).cast("decimal(5,3)") * 1000).cast("long"),
                F.lit(DEFAULT_PRIORITY_1000),
            ),
        ).alias("priority_1000"),
    )
    return out.filter(F.length("loc") > 0)


def frontier_candidates(
    parsed: DataFrame, host_col: str = "hostname"
) -> DataFrame:
    """Dedup url entries per (host, loc) keeping the strongest hint —
    max priority, freshest lastmod — in ONE map-side-combined exchange.
    Output joins the frontier's keep-first → seen-probe path unchanged."""
    return (
        parsed.filter(F.col("kind") == "url")
        .groupBy(host_col, "loc")
        .agg(
            F.max("priority_1000").alias("priority_1000"),
            F.max("lastmod_days").alias("lastmod_days"),
        )
    )


def parse_sitemaps_sql(bodies_cte: str) -> str:
    """DuckDB oracle for :func:`parse_sitemaps` ∘ its input: ``bodies_cte``
    yields (hostname, body). Same RE2 patterns, same entity order, same
    decimal milli-unit arithmetic."""
    return f"""
WITH bodies AS ({bodies_cte}),
blocks AS (
  SELECT hostname, 'url' AS kind,
         unnest(regexp_extract_all(body, '(?s)<url>(.*?)</url>', 1)) AS b
  FROM bodies
  UNION ALL
  SELECT hostname, 'sitemap' AS kind,
         unnest(regexp_extract_all(body, '(?s)<sitemap>(.*?)</sitemap>', 1)) AS b
  FROM bodies
),
fields AS (
  SELECT hostname, kind,
         replace(replace(replace(replace(replace(
           regexp_extract(b, '(?s)<loc>\\s*(.*?)\\s*</loc>', 1),
           '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&apos;', ''''),
           '&amp;', '&') AS loc,
         nullif(regexp_extract(b, '<lastmod>\\s*(\\d{{4}}-\\d{{2}}-\\d{{2}})', 1), '') AS lastmod,
         regexp_extract(b, '(?s)<changefreq>\\s*(\\w+)\\s*</changefreq>', 1) AS freq,
         nullif(regexp_extract(b, '(?s)<priority>\\s*(\\d(?:\\.\\d{{1,3}})?)\\s*</priority>', 1), '') AS pri
  FROM blocks
)
SELECT hostname, kind, loc,
       date_diff('day', DATE '1970-01-01', CAST(lastmod AS DATE)) AS lastmod_days,
       CASE WHEN freq IN ('always','hourly','daily','weekly','monthly','yearly','never')
            THEN freq END AS changefreq,
       CASE WHEN kind = 'url' THEN
         COALESCE(CAST(CAST(pri AS DECIMAL(5,3)) * 1000 AS BIGINT),
                  {DEFAULT_PRIORITY_1000})
       END AS priority_1000
FROM fields
WHERE length(loc) > 0
"""


def recrawl_delta(
    entries: DataFrame,
    ledger: DataFrame,
    loc_col: str = "loc",
    lastmod_col: str = "lastmod_days",
    fetched_col: str = "fetched_day",
) -> DataFrame:
    """Sitemap-driven re-crawl delta — fetch only what the host says
    changed. Joins parsed url entries against the last-fetch ledger and
    labels each loc:

    - ``new``       — never fetched (absent from the ledger);
    - ``updated``   — ``lastmod`` strictly after the recorded fetch day
      (the host asserting staleness; trust it, it only costs a fetch);
    - ``unchanged`` — fetched on/after lastmod, OR no lastmod hint at all
      (absence proves nothing — those URLs stay with the change-rate TTL
      scheduler, operators/recrawl.py, and the cache validator path,
      operators/cachectl.py).

    ONE equi-join on the URL key (planner broadcasts the smaller side);
    callers filter ``status != 'unchanged'`` into the frontier. At 100 TB
    the ledger side is the big one — it is the url_seen/visit ledger the
    engine already bucket-partitions by host, and the join key carries
    the hostname prefix, so co-location survives."""
    led = ledger.select(
        F.col(loc_col).alias(loc_col),
        F.col(fetched_col).alias("__fetched"),
    )
    out = entries.join(led, loc_col, "left")
    status = (
        F.when(F.col("__fetched").isNull(), F.lit("new"))
        .when(
            F.col(lastmod_col).isNotNull()
            & (F.col(lastmod_col) > F.col("__fetched")),
            F.lit("updated"),
        )
        .otherwise(F.lit("unchanged"))
    )
    return out.select(
        *[c for c in entries.columns],
        F.col("__fetched").alias(fetched_col),
        status.alias("status"),
    )
