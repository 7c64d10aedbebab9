"""Canonical table schemas for the crawl engine.

The normalized data model reproduces the reference's SQLite migrations
(/root/reference/db/db-sqlx-sqlite/migrations/20220405113942_world_forges.sql:8-52)
and entity structs (/root/reference/db/db-core/src/lib.rs:91-180), re-laid-out
for columnar storage:

- FK chains (hostname_id, owner_id) are denormalized into natural-key columns
  — at 10^10 rows, join keys beat surrogate-id lookups and enable hash
  partitioning by host.
- the repo↔topic mapping table becomes a ``tags array<string>`` column
  (the reference's own in-memory form, forge/forge-core/src/lib.rs:160-180).
- the mandated input table ``documents(doc_id, spans)`` carries interleaved
  text + media spans; span order is the per-row invariant (BASELINE.json
  input_hint) and must be restored by ``offset`` after any explode.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Mandated input table (BASELINE.json input_hint)
# ---------------------------------------------------------------------------

SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),  # api_json | html | media
        T.StructField("text", T.StringType(), True),  # null for media spans
        T.StructField("media_ref", T.StringType(), True),  # null for text spans
        T.StructField("offset", T.IntegerType(), False),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),  # canonical page URL
        T.StructField("spans", T.ArrayType(SPAN), False),
        # layout helpers (hidden-partitioning stand-ins; Iceberg would use
        # bucket(B, hostname) transforms)
        T.StructField("hostname", T.StringType(), False),
        T.StructField("host_bucket", T.IntegerType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Frontier / seed (reference: starchart_forges, spider work queue)
# ---------------------------------------------------------------------------

SEED_FORGES = T.StructType(
    [
        T.StructField("forge_id", T.LongType(), False),  # insertion order; ORDER BY ID
        T.StructField("hostname", T.StringType(), False),  # clean_url'd
        T.StructField("forge_type", T.StringType(), False),
        T.StructField("verified_on", T.LongType(), True),
        T.StructField("last_crawl_on", T.LongType(), True),
        T.StructField("imported", T.BooleanType(), False),
        T.StructField("starchart_instance", T.StringType(), True),
    ]
)

# one row per fetchable URL; the 10^10-scale explicit frontier
FRONTIER = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("hostname", T.StringType(), False),
        T.StructField("host_bucket", T.IntegerType(), False),
        T.StructField("forge_id", T.LongType(), False),
        T.StructField("page", T.IntegerType(), False),
        T.StructField("kind", T.StringType(), False),  # search_page | topics
        T.StructField("priority", T.IntegerType(), False),
        T.StructField("url_hash", T.LongType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Consent / politeness directives (reference: DNS TXT, src/dns/mod.rs:20-59,
# src/verify.rs:44-70)
# ---------------------------------------------------------------------------

CONSENT = T.StructType(
    [
        T.StructField("hostname", T.StringType(), False),
        T.StructField("verified", T.BooleanType(), False),
        T.StructField("spidering", T.BooleanType(), False),
        T.StructField("rate_ms", T.LongType(), True),  # null => global default
    ]
)

# ---------------------------------------------------------------------------
# Output entity tables (reference shapes db/db-core/src/lib.rs:91-180)
# ---------------------------------------------------------------------------

FORGES = T.StructType(
    [
        T.StructField("hostname", T.StringType(), False),
        T.StructField("forge_type", T.StringType(), False),
        T.StructField("verified_on", T.LongType(), True),
        T.StructField("last_crawl_on", T.LongType(), True),
        T.StructField("imported", T.BooleanType(), False),
        T.StructField("starchart_instance", T.StringType(), True),
    ]
)

USERS = T.StructType(
    [
        T.StructField("hostname", T.StringType(), False),
        T.StructField("username", T.StringType(), False),
        T.StructField("html_link", T.StringType(), False),
        T.StructField("profile_photo", T.StringType(), True),
        T.StructField("imported", T.BooleanType(), False),
    ]
)

REPOSITORIES = T.StructType(
    [
        T.StructField("hostname", T.StringType(), False),
        T.StructField("owner", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("description", T.StringType(), True),
        T.StructField("website", T.StringType(), True),
        T.StructField("html_url", T.StringType(), False),
        T.StructField("tags", T.ArrayType(T.StringType()), True),
        T.StructField("imported", T.BooleanType(), False),
    ]
)

# golden visit order: pure function of (forge_id, page, in-page index) —
# SURVEY.md §3.1; never a function of task scheduling
CRAWL_ORDER = T.StructType(
    [
        T.StructField("hostname", T.StringType(), False),
        T.StructField("page", T.IntegerType(), False),
        T.StructField("idx_in_page", T.IntegerType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("seq", T.LongType(), False),
    ]
)

# per-partition lineage counters, appended atomically with every batch
# (north_rule: fetched, deduped, deferred-by-politeness; blocked_by_robots
# extends the mandated trio — RFC 9309 denials are neither fetched nor
# deferred, so they need their own ledger; media_discovered counts the
# interleaved media refs entering the frontier when discover_media is on)
LINEAGE = T.StructType(
    [
        T.StructField("batch_id", T.LongType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("fetched", T.LongType(), False),
        T.StructField("deduped", T.LongType(), False),
        T.StructField("deferred_by_politeness", T.LongType(), False),
        T.StructField("blocked_by_robots", T.LongType(), False),
        T.StructField("media_discovered", T.LongType(), False),
    ]
)

# media assets discovered from interleaved media spans (engine
# discover_media mode): one row per first sighting of a media URL — the
# media half of the "interleaved text + media documents" frontier. The
# seen gate is the SAME unified keep-first/bloom/anti-join pass the
# user/repo keys ride (key_kind='media'), so a 10^10-URL frontier pays no
# extra stages for media dedup.
MEDIA_ASSETS = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("hostname", T.StringType(), False),  # host of the media URL
        T.StructField("media_type", T.StringType(), False),
        T.StructField("host_bucket", T.IntegerType(), False),
    ]
)

# per-host HLL register LOG (engine track_host_distincts mode): each batch
# appends the registers of its NEW url_seen keys only — a key is "new"
# exactly once, and HLL registers are max-folds, so the read-side
# groupBy(hostname, hll_bucket).max(hll_rho) over the log equals the
# registers of the whole url_seen table EXACTLY (asserted in tests). No
# table read in the hot path, append-only rows, bounded growth (a bucket's
# rho can increase at most ~RMAX times ever).
HOST_HLL = T.StructType(
    [
        T.StructField("hostname", T.StringType(), False),
        T.StructField("hll_bucket", T.IntegerType(), False),
        T.StructField("hll_rho", T.IntegerType(), False),
    ]
)

# compiled per-host robots.txt rules (operators/robots.py), written once at
# init_state and broadcast-gated onto every batch's fetch URLs
ROBOTS_RULES = T.StructType(
    [
        T.StructField("hostname", T.StringType(), False),
        T.StructField("pos", T.LongType(), False),
        T.StructField("plen", T.IntegerType(), False),
        T.StructField("allow", T.BooleanType(), False),
        T.StructField("is_plain", T.BooleanType(), False),
        T.StructField("pattern", T.StringType(), False),
        T.StructField("rx", T.StringType(), False),
    ]
)

# URL-seen membership keys (SURVEY.md §2.2): three key families
URL_SEEN = T.StructType(
    [
        T.StructField("key_kind", T.StringType(), False),  # forge | user | repo
        T.StructField("key_hash", T.LongType(), False),
        T.StructField("hostname", T.StringType(), False),
        T.StructField("key1", T.StringType(), True),  # username / name
        T.StructField("key2", T.StringType(), True),  # owner (repo only)
        T.StructField("host_bucket", T.IntegerType(), False),
    ]
)

# wire schema of a Gitea repo-search page (subset we consume of
# /root/reference/forge/gitea/src/schema.rs:22-151)
GITEA_OWNER = T.StructType(
    [
        T.StructField("username", T.StringType(), False),
        T.StructField("avatar_url", T.StringType(), True),
        T.StructField("html_url", T.StringType(), True),
    ]
)

GITEA_REPO = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("description", T.StringType(), True),
        T.StructField("website", T.StringType(), True),
        T.StructField("html_url", T.StringType(), False),
        T.StructField("owner", GITEA_OWNER, False),
    ]
)

GITEA_SEARCH_RESULTS = T.StructType(
    [
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("data", T.ArrayType(GITEA_REPO), False),
    ]
)

GITEA_TOPICS = T.StructType(
    [T.StructField("topics", T.ArrayType(T.StringType()), False)]
)

# GitHub repository-search wire shape (public REST API GET /search/repositories:
# {total_count, incomplete_results, items:[{name, description, homepage,
# html_url, topics, owner:{login, avatar_url, html_url}}]}) — subset we consume
GITHUB_OWNER = T.StructType(
    [
        T.StructField("login", T.StringType(), False),
        T.StructField("avatar_url", T.StringType(), True),
        T.StructField("html_url", T.StringType(), True),
    ]
)

GITHUB_REPO = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("description", T.StringType(), True),
        T.StructField("homepage", T.StringType(), True),
        T.StructField("html_url", T.StringType(), False),
        T.StructField("topics", T.ArrayType(T.StringType()), True),
        T.StructField("owner", GITHUB_OWNER, False),
    ]
)

GITHUB_SEARCH_RESULTS = T.StructType(
    [
        T.StructField("total_count", T.LongType(), True),
        T.StructField("incomplete_results", T.BooleanType(), True),
        T.StructField("items", T.ArrayType(GITHUB_REPO), False),
    ]
)

# Sourcehut (sr.ht) legacy REST list shape (GET /api/repos:
# {next, results:[{name, description, visibility, owner:{canonical_name,
# name}}]}) — html_url derived as https://{host}/{canonical_name}/{name}
SOURCEHUT_OWNER = T.StructType(
    [
        T.StructField("canonical_name", T.StringType(), False),  # "~user"
        T.StructField("name", T.StringType(), True),
    ]
)

SOURCEHUT_REPO = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("description", T.StringType(), True),
        T.StructField("visibility", T.StringType(), True),
        T.StructField("owner", SOURCEHUT_OWNER, False),
    ]
)

SOURCEHUT_RESULTS = T.StructType(
    [
        T.StructField("next", T.StringType(), True),
        T.StructField("results", T.ArrayType(SOURCEHUT_REPO), False),
    ]
)
