"""Operator-level query registry for the driver's correctness gate.

Each entry maps one operator from SURVEY.md §2 (plus the training-data
pipeline suite) onto the driver-provided testdata tables, together with the
ANSI-SQL oracle DuckDB runs on the same parquet. Column names and value
arithmetic are chosen to be engine-portable (identical aliases both sides,
round() on derived doubles, deterministic tiebreaks on every top-k/window).

Registry shape: ``QUERIES[name] = (spark_fn, oracle_sql_or_None)``.
``oracle_sql=None`` marks genuinely approximate/non-SQL ops (LSH ANN,
SimHash) — the driver records a weaker rows-only check for those; their
exactness is covered by pytest against exact recomputation instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from starchart_spark.functions.urls import canonicalize_udf, hostname_udf
from starchart_spark.operators import (
    curation,
    dedup,
    dedup_text,
    pii,
    politeness,
    similarity,
    skew,
    text,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# a synthetic messy-URL column used by the D1/N7 parity queries: built from
# customer keys so both engines derive it identically
_URL_SQL = "'HTTPS://Forge-' || (c_custkey % 50) || '.Test:8443/p/' || c_custkey || '?q=1#f'"


def _url_col() -> F.Column:
    return F.concat(
        F.lit("HTTPS://Forge-"),
        (F.col("c_custkey") % 50).cast("string"),
        F.lit(".Test:8443/p/"),
        F.col("c_custkey").cast("string"),
        F.lit("?q=1#f"),
    )


# ---------------------------------------------------------------------------
# crawl-core operators (SURVEY.md §2)
# ---------------------------------------------------------------------------

def q_frontier_scan(spark, sf_dir):
    """S1: seed/frontier scan — filtered, insertion-ordered page of work."""
    return (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "MACHINERY")
        .orderBy("c_custkey")
        .limit(100)
        .select(
            F.col("c_custkey").alias("forge_id"), F.col("c_name").alias("hostname")
        )
    )


SQL_FRONTIER_SCAN = """
SELECT c_custkey AS forge_id, c_name AS hostname
FROM customer WHERE c_mktsegment = 'MACHINERY'
ORDER BY c_custkey LIMIT 100
"""


def q_url_canonicalize(spark, sf_dir):
    """D1: canonicalize-then-hash — the real vectorized pandas UDF path
    (clean_url semantics, db/db-core/src/lib.rs:81-89)."""
    return (
        _t(spark, sf_dir, "customer")
        .withColumn("url", _url_col())
        .select(
            "c_custkey", canonicalize_udf(F.col("url")).alias("canonical_url")
        )
    )


SQL_URL_CANONICALIZE = f"""
SELECT c_custkey,
       'https://' || lower('Forge-' || (c_custkey % 50) || '.Test') || ':8443/' AS canonical_url
FROM customer
"""


def q_hostname_extract(spark, sf_dir):
    """N7: get_hostname (federate/federate-core/src/lib.rs:100-102)."""
    return (
        _t(spark, sf_dir, "customer")
        .withColumn("url", _url_col())
        .select("c_custkey", hostname_udf(F.col("url")).alias("hostname"))
    )


SQL_HOSTNAME_EXTRACT = """
SELECT c_custkey, lower('Forge-' || (c_custkey % 50) || '.Test') AS hostname
FROM customer
"""


def q_seen_anti_join(spark, sf_dir):
    """D2-D4: exists-gate as left_anti join — customers never seen in orders."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return dedup.anti_join_seen(customer, orders, ["c_custkey"]).select(
        "c_custkey", "c_name"
    )


SQL_SEEN_ANTI_JOIN = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def q_keep_first_window(spark, sf_dir):
    """D5: deterministic keep-first (first event per user in event order) —
    row_number window, never dropDuplicates."""
    ev = _t(spark, sf_dir, "events")
    first = dedup.keep_first(ev, ["user_id"], ["ts", "event_id"])
    return first.select("user_id", "event_id", "event_type")


SQL_KEEP_FIRST_WINDOW = """
SELECT user_id, event_id, event_type FROM (
  SELECT user_id, event_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn = 1
"""


def q_in_batch_tag_dedup(spark, sf_dir):
    """D6: HashSet tag dedup — distinct sorted set per group."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.array_join(F.sort_array(F.collect_set("event_type")), ",").alias(
                "event_types"
            )
        )
    )


SQL_IN_BATCH_TAG_DEDUP = """
SELECT user_id,
       array_to_string(list_sort(list(DISTINCT event_type)), ',') AS event_types
FROM events GROUP BY user_id
"""


def q_collect_topics(spark, sf_dir):
    """J4: per-repo topics as ONE grouped join+collect (replaces the
    reference's N+1 per-repo lookup, db/db-sqlx-sqlite/src/lib.rs:774-795)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.array_join(
                F.sort_array(F.collect_set(F.col("l_partkey").cast("string"))), ","
            ).alias("parts")
        )
    )


SQL_COLLECT_TOPICS = """
SELECT l_orderkey,
       array_to_string(list_sort(list(DISTINCT l_partkey::VARCHAR)), ',') AS parts
FROM lineitem GROUP BY l_orderkey
"""


def q_broadcast_dims_join(spark, sf_dir):
    """J1/J2: tiny-dimension lookup as an explicit broadcast hash join."""
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("n_nationkey", "n_name", F.col("r_name").alias("region_name"))
    )


SQL_BROADCAST_DIMS_JOIN = """
SELECT n_nationkey, n_name, r_name AS region_name
FROM nation JOIN region ON n_regionkey = r_regionkey
"""


def q_three_way_join(spark, sf_dir):
    """J3: repositories⋈forges⋈users shape — 3-way equi-join + aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


SQL_THREE_WAY_JOIN = """
SELECT c_mktsegment, count(*) AS n_lineitems, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_merge_insert_new_keys(spark, sf_dir):
    """S5-S7 MERGE semantics: keys in the incoming batch absent from the
    seen set (first writer wins; later batch inserts only novel keys)."""
    o = _t(spark, sf_dir, "orders")
    seen = o.filter(F.col("o_orderdate") < "1995-01-01").select("o_custkey").distinct()
    incoming = o.filter(F.col("o_orderdate") >= "1995-01-01").select("o_custkey").distinct()
    return incoming.join(seen, "o_custkey", "left_anti").select(
        F.col("o_custkey").alias("new_custkey")
    )


SQL_MERGE_INSERT_NEW_KEYS = """
SELECT DISTINCT o_custkey AS new_custkey FROM orders
WHERE o_orderdate >= DATE '1995-01-01'
  AND o_custkey NOT IN (
    SELECT o_custkey FROM orders WHERE o_orderdate < DATE '1995-01-01')
"""


def q_mini_index(spark, sf_dir):
    """A1/D7: mini-index — unique words per source (case-sensitive), with
    count + lexicographic extremes (the full space-joined string, compactly)."""
    words = (
        text.ensure_min_partitions(
            _t(spark, sf_dir, "documents").select("source", "text")
        )
        .select("source", F.explode(F.split(F.trim("text"), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
    )
    return words.groupBy("source").agg(
        F.countDistinct("word").alias("n_words"),
        F.min("word").alias("first_word"),
        F.max("word").alias("last_word"),
    )


SQL_MINI_INDEX = r"""
SELECT source, count(DISTINCT word) AS n_words,
       min(word) AS first_word, max(word) AS last_word
FROM (
  SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS word
  FROM documents
) WHERE word <> '' GROUP BY source
"""


def q_sliding_limiter(spark, sf_dir):
    """P6/A4: leaky-bucket as a trailing range-window count (54 s, threshold
    50 — src/search.rs:78-90); report each user's max in-window count."""
    ev = _t(spark, sf_dir, "events")
    counted = politeness.sliding_limiter(ev, "user_id", "ts")
    return counted.groupBy("user_id").agg(
        F.max("window_count").alias("max_in_window"),
        F.max(F.col("over_limit").cast("int")).alias("ever_over"),
    )


SQL_SLIDING_LIMITER = """
SELECT user_id, max(cnt) AS max_in_window,
       max(CASE WHEN cnt > 50 THEN 1 ELSE 0 END) AS ever_over
FROM (
  SELECT user_id, count(*) OVER (
    PARTITION BY user_id ORDER BY epoch_ms(CAST(ts AS TIMESTAMP))
    RANGE BETWEEN 54000 PRECEDING AND CURRENT ROW) AS cnt
  FROM events
) GROUP BY user_id
"""


def q_politeness_slots(spark, sf_dir):
    """P1/P2: token-bucket slot assignment (rate 2000 ms) per host in crawl
    order — the window fast path of the scheduler."""
    ev = (
        _t(spark, sf_dir, "events")
        .withColumnRenamed("user_id", "hostname")
        .withColumn("effective_rate_ms", F.lit(2000).cast("long"))
    )
    out = politeness.assign_slots_window(ev, ["ts", "event_id"])
    return out.select(
        F.col("hostname").alias("user_id"), "event_id", "slot_ms"
    )


SQL_POLITENESS_SLOTS = """
SELECT user_id, event_id,
       (row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1) * 2000 AS slot_ms
FROM events
"""


def q_deferred_by_budget(spark, sf_dir):
    """Politeness deferral accounting: rows whose slot exceeds the batch
    budget (north_rule lineage counter), per host."""
    ev = (
        _t(spark, sf_dir, "events")
        .withColumnRenamed("user_id", "hostname")
        .withColumn("effective_rate_ms", F.lit(2000).cast("long"))
    )
    slotted = politeness.assign_slots_window(ev, ["ts", "event_id"])
    _, deferred = politeness.split_by_budget(slotted, budget_ms=100_000)
    return deferred.groupBy(F.col("hostname").alias("user_id")).agg(
        F.count(F.lit(1)).alias("n_deferred")
    )


SQL_DEFERRED_BY_BUDGET = """
SELECT user_id, count(*) AS n_deferred FROM (
  SELECT user_id,
         (row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1) * 2000 AS slot_ms
  FROM events
) WHERE slot_ms >= 100000 GROUP BY user_id
"""


def q_pagination_slice(spark, sf_dir):
    """§2.7: ORDER BY id LIMIT/OFFSET pagination as a window slice (page 3,
    10/page)."""
    c = _t(spark, sf_dir, "customer")
    w = Window.orderBy("c_custkey")
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") > 20) & (F.col("rn") <= 30))
        .select("c_custkey", "c_name")
    )


SQL_PAGINATION_SLICE = """
SELECT c_custkey, c_name FROM customer ORDER BY c_custkey LIMIT 10 OFFSET 20
"""


def q_wildcard_search(spark, sf_dir):
    """N9/J5: wildcarded contains-search over the corpus."""
    return (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").like("%window merge%"))
        .select("doc_id", "source")
    )


SQL_WILDCARD_SEARCH = """
SELECT doc_id, source FROM documents WHERE text LIKE '%window merge%'
"""


def q_search_users(spark, sf_dir):
    """FTS-users surface (db/db-sqlx-sqlite/src/lib.rs:201-210): wildcarded
    contains-match on the username column; customer names stand in."""
    from starchart_spark.crawl.search import search_users

    users = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), F.col("c_name").alias("username")
    )
    return search_users(users, "00001")


SQL_SEARCH_USERS = """
SELECT c_custkey AS user_id, c_name AS username
FROM customer WHERE c_name LIKE '%00001%'
"""


def q_search_topics(spark, sf_dir):
    """FTS-project-topics surface (db/db-sqlx-sqlite/src/lib.rs:243-252):
    wildcarded contains-match on the topic name; part types stand in."""
    from starchart_spark.crawl.search import search_topics

    topics = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("topic_id"), F.col("p_type").alias("name")
    )
    return search_topics(topics, "ECO")


SQL_SEARCH_TOPICS = """
SELECT p_partkey AS topic_id, p_type AS name
FROM part WHERE p_type LIKE '%ECO%'
"""


def q_empty_is_none(spark, sf_dir):
    """N3: empty_is_none — trim, ''→NULL (gitea/src/lib.rs:75-82), applied to
    a synthesized sometimes-empty column."""
    from starchart_spark.operators.normalize import empty_is_none

    d = _t(spark, sf_dir, "documents").withColumn(
        "website", F.when(F.col("doc_id") % 3 == 0, F.lit("  ")).otherwise(F.col("lang"))
    )
    return d.select("doc_id", empty_is_none(F.col("website")).alias("website"))


SQL_EMPTY_IS_NONE = """
SELECT doc_id, nullif(trim(CASE WHEN doc_id % 3 = 0 THEN '  ' ELSE lang END), '') AS website
FROM documents
"""


def q_props_parse(spark, sf_dir):
    """N10: k=v / wire-JSON config parse — typed extraction from the props
    payload (regex; identical pattern both engines)."""
    return (
        _t(spark, sf_dir, "events")
        .select(
            "event_id",
            F.regexp_extract("props", r'"k":\s*(\d+)', 1).cast("long").alias("k_val"),
        )
    )


SQL_PROPS_PARSE = """
SELECT event_id, CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT) AS k_val
FROM events
"""


def q_txt_consent(spark, sf_dir):
    """P4 upstream half: DNS TXT consent challenge + directive parse.

    Builds the challenge key ``starchart-{our_domain}.{host}``
    (src/verify.rs:45-57), verifies "any TXT answer equals our domain"
    (src/verify.rs:65-72), and parses a spidering-directive answer
    (``spidering=...,rate=...``, src/dns/mod.rs:26-59) into the consent
    table's ``(spidering, rate_ms)`` columns — all pure-JVM column ops
    over deterministic per-doc synthetic TXT answers (the resolver itself
    is driver-side I/O, out of engine scope like the reference's
    trust-dns call)."""
    from starchart_spark.operators import politeness as pol

    our = "starchart.example.org"
    d = (
        _t(spark, sf_dir, "documents")
        .withColumn("hostname", F.concat(F.col("source"), F.lit(".forge.example")))
        .withColumn(
            "txt_answer",
            F.when(F.col("doc_id") % 4 == 0, F.lit("spidering=true,rate=500"))
            .when(F.col("doc_id") % 4 == 1, F.lit("spidering=false"))
            .when(F.col("doc_id") % 4 == 2, F.lit(" spidering = true , rate = 200 "))
            .otherwise(F.lit("other=1")),
        )
        .withColumn(
            "answers",
            F.array(
                F.when(F.col("doc_id") % 2 == 0, F.lit(our)).otherwise(F.lit("nope")),
                F.lit("unrelated-txt"),
            ),
        )
    )
    return pol.parse_txt_directives(d, "txt_answer").select(
        "doc_id",
        pol.txt_challenge_key(our).alias("challenge_key"),
        pol.verify_txt_answers(F.col("answers"), our).alias("verified"),
        "spidering",
        "rate_ms",
    )


SQL_TXT_CONSENT = """
WITH d AS (
  SELECT doc_id,
    source || '.forge.example' AS hostname,
    regexp_replace(
      CASE doc_id % 4 WHEN 0 THEN 'spidering=true,rate=500'
                      WHEN 1 THEN 'spidering=false'
                      WHEN 2 THEN ' spidering = true , rate = 200 '
                      ELSE 'other=1' END,
      '\\s+', '', 'g') AS clean
  FROM documents
)
SELECT doc_id,
  'starchart-starchart.example.org.' || hostname AS challenge_key,
  (doc_id % 2 = 0) AS verified,
  coalesce(regexp_extract(clean, '(^|,)spidering=([^,]*)', 2) = 'true', FALSE)
    AS spidering,
  CAST(nullif(regexp_extract(clean, '(^|,)rate=([0-9]+)', 2), '') AS BIGINT)
    AS rate_ms
FROM d
"""


# --- robots.txt (north rule: "robots.txt honored") -------------------------
# Shared synthetic robots corpus: 5 per-host bodies keyed off region (both
# engines embed the SAME literals), exercising every RFC 9309 semantic the
# operator implements — group selection (specific beats *, consecutive UA
# headers, same-agent merge), longest-match-wins, allow-on-tie, * wildcard,
# $ anchor, orphan rules, empty patterns, comments/case/whitespace, repeated
# and non-numeric crawl-delays. The oracle is the IDENTICAL relational parse
# in DuckDB SQL (explode → window cumsum gids → group selection → compile →
# gate), not a closed-form inversion.
_ROBOTS_UA = "starchart"

_ROBOTS_BODIES = [
    # h0: specific group beats *, longest-match, allow-on-tie; a Sitemap
    # record BEFORE any group (global per sitemaps.org, not a group rule)
    "# robots for h0\n"
    "Sitemap: https://h0.test/sitemap.xml\n"
    "User-agent: starchart\n"
    "Disallow: /private/\n"
    "Allow: /private/pub/\n"
    "Allow: /tie\n"
    "Disallow: /tie\n"
    "\n"
    "User-agent: *\n"
    "Disallow: /\n",
    # h1: wildcard group applies (no specific); * and $ patterns; crawl-delay
    "User-agent: other\n"
    "Disallow: /\n"
    "\n"
    "User-agent: *\n"
    "Disallow: /*.json$\n"
    "Disallow: /tmp*/\n"
    "Crawl-delay: 2.5\n"
    "SiteMap: https://h1.test/s1.xml\n"
    "Sitemap: https://h1.test/s2.xml\n",
    # h2: consecutive UA headers share a group; same-agent groups merge;
    # repeated crawl-delays take the max
    "User-agent: gptbot\n"
    "User-agent: starchart\n"
    "Disallow: /a/\n"
    "\n"
    "User-agent: starchart\n"
    "Disallow: /b/\n"
    "Crawl-delay: 1\n"
    "Crawl-delay: 7\n"
    "Sitemap: https://h2.test/sm.xml\n"
    "Sitemap: https://h2.test/sm.xml\n",
    # h3: disallow-all
    "User-agent: *\nDisallow: /\n",
    # h4: orphan rules ignored, empty pattern dropped, case/whitespace mess,
    # inline comment, non-numeric crawl-delay ignored
    "Disallow: /orphan/\n"
    "USER-AGENT: STARCHART\n"
    "  disallow:\n"
    "\tDisAllow: /d/  # tail comment\n"
    "Crawl-delay: nope\n"
    "\tsitemap: https://h4.test/SM.xml  # tail comment\n",
]

_ROBOTS_PATHS = [
    "/private/x", "/private/pub/x", "/tie/x", "/a/x", "/b/x",
    "/data/f.json", "/data/f.json?v=1", "/tmp123/f", "/tmpfile",
    "/d/x", "/orphan/x", "/ok/x",
]


def _robots_bodies_df(spark, sf_dir):
    region = _t(spark, sf_dir, "region")
    body = F.lit(_ROBOTS_BODIES[-1])
    for i in range(len(_ROBOTS_BODIES) - 2, -1, -1):
        body = F.when(F.col("r_regionkey") == i, F.lit(_ROBOTS_BODIES[i])).otherwise(body)
    return region.select(
        F.concat(F.lit("h"), F.col("r_regionkey").cast("string")).alias("hostname"),
        body.alias("robots_txt"),
    )


def _robots_bodies_sql() -> str:
    cases = " ".join(
        f"WHEN {i} THEN '{b}'" for i, b in enumerate(_ROBOTS_BODIES)
    )
    return (
        "SELECT 'h' || r_regionkey AS hostname, "
        f"CASE r_regionkey {cases} END AS robots_txt FROM region"
    )


def _robots_chosen_sql() -> str:
    """The relational RFC 9309 parse, DuckDB formulation — CTE chain up to
    the chosen-group directive lines (mirrors robots._chosen_directives
    step for step)."""
    ua = _ROBOTS_UA
    return f"""
bodies AS ({_robots_bodies_sql()}),
lines AS (
  SELECT hostname,
         unnest(list_transform(string_split(robots_txt, chr(10)),
                               (x, i) -> {{'pos': i, 'raw': x}}),
                recursive := true)
  FROM bodies
),
fielded0 AS (
  SELECT hostname, pos,
         regexp_replace(regexp_replace(raw, '#.*', ''), '^\\s+|\\s+$', '', 'g')
           AS clean
  FROM lines
),
fielded AS (
  SELECT hostname, pos,
    lower(regexp_replace(regexp_extract(clean, '^([^:]+):', 1),
                         '^\\s+|\\s+$', '', 'g')) AS field,
    regexp_replace(regexp_extract(clean, '^[^:]+:(.*)$', 1),
                   '^\\s+|\\s+$', '', 'g') AS value
  FROM fielded0
),
directive AS (
  SELECT * FROM fielded
  WHERE field IN ('user-agent', 'allow', 'disallow', 'crawl-delay')
),
marked AS (
  SELECT *, CASE WHEN field = 'user-agent'
                  AND coalesce(lag(field) OVER (PARTITION BY hostname ORDER BY pos), '')
                      <> 'user-agent'
            THEN 1 ELSE 0 END AS is_new
  FROM directive
),
grouped AS (
  SELECT *, sum(is_new) OVER (PARTITION BY hostname ORDER BY pos
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gid
  FROM marked
),
sel AS (
  SELECT *,
    max(CASE WHEN field = 'user-agent' AND lower(value) = '{ua}' THEN 1 ELSE 0 END)
      OVER (PARTITION BY hostname, gid) AS g_spec,
    max(CASE WHEN field = 'user-agent' AND value = '*' THEN 1 ELSE 0 END)
      OVER (PARTITION BY hostname, gid) AS g_wild,
    max(CASE WHEN field = 'user-agent' AND lower(value) = '{ua}' THEN 1 ELSE 0 END)
      OVER (PARTITION BY hostname) AS h_spec
  FROM grouped
),
chosen AS (
  SELECT * FROM sel WHERE g_spec = 1 OR (h_spec = 0 AND g_wild = 1)
)"""


def _robots_rx_sql() -> str:
    """Pattern → regex compile chain, same replace order as
    robots._ESCAPES (imported, so the two can never drift)."""
    from starchart_spark.operators.robots import _ESCAPES

    esc = "base"
    for ch in _ESCAPES:
        esc = f"replace({esc}, '{ch}', '\\{ch}')"
    return (
        f"'^' || replace({esc}, '*', '.*') || "
        "CASE WHEN ends_with(pattern, '$') THEN '$' ELSE '' END"
    )


def q_robots_gate(spark, sf_dir):
    """RFC 9309 robots gate: per-URL allow/deny over per-host rule dims —
    parse → compile → broadcast gate (operators/robots.py; north rule
    "robots.txt honored"). Frontier paths synthesized from documents."""
    from starchart_spark.operators import robots as rob

    dim = rob.rules_dim(
        rob.compile_rules(rob.parse_robots(_robots_bodies_df(spark, sf_dir), _ROBOTS_UA))
    )
    path = F.lit(_ROBOTS_PATHS[-1])
    for i in range(len(_ROBOTS_PATHS) - 2, -1, -1):
        path = F.when(F.col("doc_id") % 12 == i, F.lit(_ROBOTS_PATHS[i])).otherwise(path)
    frontier = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit("h"), (F.col("doc_id") % 7).cast("string")).alias("hostname"),
        path.alias("path"),
    )
    return rob.robots_gate(frontier, dim).select(
        "doc_id", "hostname", "path", "robots_allowed"
    )


def _sql_robots_gate() -> str:
    path_cases = " ".join(
        f"WHEN {i} THEN '{p}'" for i, p in enumerate(_ROBOTS_PATHS)
    )
    return f"""
WITH {_robots_chosen_sql()},
rules AS (
  SELECT hostname, field = 'allow' AS allow, value AS pattern
  FROM chosen WHERE field IN ('allow', 'disallow') AND value <> ''
),
based AS (
  SELECT *, CASE WHEN ends_with(pattern, '$')
                 THEN substr(pattern, 1, length(pattern) - 1)
                 ELSE pattern END AS base
  FROM rules
),
compiled AS (
  SELECT hostname, allow, pattern, length(pattern) AS plen,
         NOT contains(pattern, '*') AND NOT ends_with(pattern, '$') AS is_plain,
         {_robots_rx_sql()} AS rx
  FROM based
),
frontier AS (
  SELECT doc_id, 'h' || (doc_id % 7) AS hostname,
         CASE doc_id % 12 {path_cases} END AS path
  FROM documents
),
matches AS (
  SELECT f.doc_id, f.hostname, f.path, c.plen, c.allow
  FROM frontier f LEFT JOIN compiled c
    ON f.hostname = c.hostname
   AND CASE WHEN c.is_plain THEN starts_with(f.path, c.pattern)
            ELSE regexp_matches(f.path, c.rx) END
)
SELECT doc_id, hostname, path,
  coalesce(max(plen * 2 + CASE WHEN allow THEN 1 ELSE 0 END) % 2 = 1, TRUE)
    AS robots_allowed
FROM matches GROUP BY doc_id, hostname, path
"""


def q_robots_crawl_delay(spark, sf_dir):
    """robots crawl-delay → politeness rate merge: per-host
    greatest(consent rate, crawl-delay), most-conservative on repeats,
    non-numeric delays ignored (operators/robots.py)."""
    from starchart_spark.operators import robots as rob

    delays = rob.parse_crawl_delay(_robots_bodies_df(spark, sf_dir), _ROBOTS_UA)
    region = _t(spark, sf_dir, "region")
    consented = region.select(
        F.concat(F.lit("h"), F.col("r_regionkey").cast("string")).alias("hostname"),
        (F.lit(1000) + F.col("r_regionkey") * 500).cast("long").alias("effective_rate_ms"),
    )
    return rob.merge_crawl_delay(consented, delays)


def _sql_robots_crawl_delay() -> str:
    return f"""
WITH {_robots_chosen_sql()},
delays AS (
  SELECT hostname,
         CAST(max(TRY_CAST(value AS DOUBLE)) * 1000 AS BIGINT) AS crawl_delay_ms
  FROM chosen
  WHERE field = 'crawl-delay' AND TRY_CAST(value AS DOUBLE) IS NOT NULL
  GROUP BY hostname
),
consented AS (
  SELECT 'h' || r_regionkey AS hostname,
         CAST(1000 + r_regionkey * 500 AS BIGINT) AS effective_rate_ms
  FROM region
)
SELECT c.hostname,
       greatest(c.effective_rate_ms, coalesce(d.crawl_delay_ms, 0))
         AS effective_rate_ms
FROM consented c LEFT JOIN delays d USING (hostname)
"""


def q_robots_sitemap_refs(spark, sf_dir):
    """Sitemap-record mining from robots.txt (robots.parse_sitemap_refs) —
    the standard discovery handoff into the sitemap channel. Global per
    sitemaps.org (valid before/inside/after groups), case-insensitive
    field with case-preserved URL value, duplicates collapsed."""
    from starchart_spark.operators import robots as rob

    return rob.parse_sitemap_refs(_robots_bodies_df(spark, sf_dir))


def _sql_robots_sitemap_refs() -> str:
    return f"""
WITH bodies AS ({_robots_bodies_sql()}),
lines AS (
  SELECT hostname, unnest(string_split(robots_txt, chr(10))) AS raw
  FROM bodies
),
clean AS (
  SELECT hostname,
         regexp_replace(regexp_replace(raw, '#.*', ''), '^\\s+|\\s+$', '', 'g')
           AS c
  FROM lines
)
SELECT DISTINCT hostname,
  regexp_replace(regexp_extract(c, '^[^:]+:(.*)$', 1), '^\\s+|\\s+$', '', 'g')
    AS sitemap_url
FROM clean
WHERE lower(regexp_replace(regexp_extract(c, '^([^:]+):', 1),
                           '^\\s+|\\s+$', '', 'g')) = 'sitemap'
  AND regexp_replace(regexp_extract(c, '^[^:]+:(.*)$', 1),
                     '^\\s+|\\s+$', '', 'g') <> ''
"""


SQL_ROBOTS_SITEMAP_REFS = _sql_robots_sitemap_refs()


SQL_ROBOTS_GATE = _sql_robots_gate()
SQL_ROBOTS_CRAWL_DELAY = _sql_robots_crawl_delay()


def q_priority_queue(spark, sf_dir):
    """North rule "salted-keyed priority queue over repartitioned host
    buckets" (operators/pqueue.py): per-host rank by (priority DESC, key
    ASC) via the skew-proof two-pass ranker, token-bucket slot from the
    rank, budget split — the scheduled half returned. Orders stand in as
    the frontier: priority = o_totalprice."""
    from starchart_spark.operators import pqueue

    frontier = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.concat(F.lit("h"), (F.col("o_custkey") % 5).cast("string")).alias("hostname"),
        F.col("o_totalprice").alias("priority"),
        F.lit(250).cast("long").alias("effective_rate_ms"),
    )
    scheduled, _deferred = pqueue.pq_schedule(
        frontier, budget_ms=2000, tiebreak_cols=("o_orderkey",)
    )
    return scheduled.select(
        "hostname",
        "o_orderkey",
        F.col(pqueue.RANK_COL).cast("long").alias("pq_rank"),
        "slot_ms",
    )


SQL_PRIORITY_QUEUE = """
WITH f AS (
  SELECT o_orderkey, 'h' || (o_custkey % 5) AS hostname,
         o_totalprice AS priority
  FROM orders
),
r AS (
  SELECT *, row_number() OVER (
      PARTITION BY hostname ORDER BY priority DESC, o_orderkey ASC
    ) AS pq_rank
  FROM f
)
SELECT hostname, o_orderkey, pq_rank, (pq_rank - 1) * 250 AS slot_ms
FROM r WHERE (pq_rank - 1) * 250 < 2000
"""


def q_epoch_days(spark, sf_dir):
    """N8: epoch timestamps → day buckets, counted."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


SQL_EPOCH_DAYS = """
SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n_events
FROM events GROUP BY 1
"""


def q_topk_orders(spark, sf_dir):
    """§2.7: deterministic top-k (no heap in the reference; Spark TakeOrdered)."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


SQL_TOPK_ORDERS = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""


def q_union_distinct(spark, sf_dir):
    """§2.8: INSERT OR IGNORE = union-distinct of two batches."""
    ev = _t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_id") % 2 == 0).select("user_id")
    b = ev.filter(F.col("value") > 0).select("user_id")
    return a.union(b).distinct()


SQL_UNION_DISTINCT = """
SELECT user_id FROM events WHERE event_id % 2 = 0
UNION
SELECT user_id FROM events WHERE value > 0
"""


def q_two_phase_count(spark, sf_dir):
    """A3 + skew: per-key counters via salted two-phase aggregation (partial
    per (key, salt), final per key) — same totals as a plain GROUP BY."""
    ev = _t(spark, sf_dir, "events")
    salted = skew.with_salt(ev, 16, ["event_id"])
    return skew.two_phase_count(salted, ["event_type"], count_col="n")


SQL_TWO_PHASE_COUNT = """
SELECT event_type, count(*) AS n FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# training-data pipeline operators
# ---------------------------------------------------------------------------

def q_exact_dedup(spark, sf_dir):
    """Exact dedup: min doc_id per identical text (hash-groupBy)."""
    return dedup_text.exact_dedup(_t(spark, sf_dir, "documents"))


SQL_EXACT_DEDUP = """
SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
"""

_SQL_JACCARD_PAIRS = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
), sh AS (
  SELECT DISTINCT doc_id, unnest(
    [t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN range(1, len(t) - 1)]
  ) AS shingle
  FROM toks WHERE len(t) >= 3
), sz AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT a_id, b_id, round(i * 1.0 / (sa.n_sh + sb.n_sh - i), 6) AS jaccard
FROM inter JOIN sz sa ON sa.doc_id = a_id JOIN sz sb ON sb.doc_id = b_id
WHERE i * 1.0 / (sa.n_sh + sb.n_sh - i) >= 0.8
"""


def q_ngram_jaccard_dupes(spark, sf_dir):
    """Exact token-3-gram Jaccard near-dup pairs (threshold 0.8)."""
    return dedup_text.ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), 0.8)


SQL_NGRAM_JACCARD_DUPES = _SQL_JACCARD_PAIRS


def q_ngram_jaccard_prefix(spark, sf_dir):
    """Prefix-filtered exact Jaccard pairs (SSJoin) — the production path:
    provably result-identical to the naive inverted-index join at the same
    threshold (so it shares its oracle) while hot shingles never enter the
    candidate index."""
    return dedup_text.ngram_jaccard_pairs_prefix(_t(spark, sf_dir, "documents"), 0.8)


SQL_NGRAM_JACCARD_PREFIX = _SQL_JACCARD_PAIRS


def q_normalize_text(spark, sf_dir):
    """Canonical text form before dedup keys: control-strip, lowercase,
    whitespace collapse — exercised on deterministically-messed input
    (upper + planted tabs/newlines) so the normalization does real work."""
    messy = F.concat(F.lit("  "), F.upper(F.col("text")), F.lit("\tX\n"))
    return _t(spark, sf_dir, "documents").select(
        "doc_id", text.normalize_text(messy).alias("norm_text")
    )


SQL_NORMALIZE_TEXT = r"""
SELECT doc_id,
       trim(regexp_replace(
         lower(regexp_replace('  ' || upper(text) || chr(9) || 'X' || chr(10),
                              '[\x00-\x08\x0E-\x1F\x7F\x{200B}-\x{200D}\x{FEFF}]',
                              '', 'g')),
         '[ \t\n\x0B\f\r]+', ' ', 'g')) AS norm_text
FROM documents
"""


_SEL_SQL = "((({col} % 2147483647) * 1327217885 + 12345) % 2147483647)"


def q_sample_fraction(spark, sf_dir):
    """Deterministic 10% corpus sample: hash-predicate, partition-invariant
    (df.sample() is partition-seeded and irreproducible), pushes to scan."""
    from starchart_spark.operators import sampling

    return sampling.sample_fraction(
        _t(spark, sf_dir, "documents"), 0.1
    ).select("doc_id", "source")


SQL_SAMPLE_FRACTION = f"""
SELECT doc_id, source FROM documents
WHERE {_SEL_SQL.format(col="doc_id")} < CAST(0.1 * 2147483647 AS BIGINT)
"""


def q_sample_stratified(spark, sf_dir):
    """Deterministic per-stratum fractions (corpus rebalancing by event
    type): tiny broadcast dim of thresholds + the same scan predicate."""
    from starchart_spark.operators import sampling

    ev = _t(spark, sf_dir, "events")
    fractions = (
        ev.select("event_type")
        .distinct()
        .withColumn("fraction", (F.length("event_type") % 3 + 1) * 0.1)
    )
    return sampling.sample_stratified(
        ev, fractions, "event_type", id_col="event_id"
    ).select("event_id", "event_type")


SQL_SAMPLE_STRATIFIED = f"""
SELECT event_id, event_type FROM events
WHERE {_SEL_SQL.format(col="event_id")}
      < CAST(((length(event_type) % 3 + 1) * 0.1) * 2147483647 AS BIGINT)
"""


def q_sample_topk(spark, sf_dir):
    """Exactly-k uniform sample without replacement, reproducible: k
    smallest selector values (distributed top-k, no global sort)."""
    from starchart_spark.operators import sampling

    return sampling.sample_exact_k(_t(spark, sf_dir, "documents"), 100).select(
        "doc_id", "lang"
    )


SQL_SAMPLE_TOPK = f"""
SELECT doc_id, lang FROM documents
ORDER BY {_SEL_SQL.format(col="doc_id")}, doc_id LIMIT 100
"""


def q_dup_clusters(spark, sf_dir):
    """Near-dup clustering: connected components (min-label propagation)
    over the exact Jaccard≥0.8 pair graph — the keep-one-per-cluster step
    of a training-data dedup pass. cluster_id = min doc_id of the component
    (pure function of the edge set)."""
    from starchart_spark.operators.cluster import connected_components

    pairs = dedup_text.ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), 0.8)
    return connected_components(pairs)


SQL_DUP_CLUSTERS = (
    "WITH RECURSIVE pairs AS (" + _SQL_JACCARD_PAIRS + """),
und AS (
  SELECT a_id AS u, b_id AS v FROM pairs
  UNION
  SELECT b_id, a_id FROM pairs
),
reach(u, v) AS (
  SELECT u, u FROM und
  UNION
  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u
)
SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u
"""
)


def q_minhash_lsh_dupes(spark, sf_dir):
    """MinHash(64)+LSH(16×4) candidates, exact-Jaccard-verified at 0.8 — the
    scale path; equals the exact pair set at this threshold (recall
    1-(1-j⁴)¹⁶ ≈ 1-1e-22 at j=0.99, and verification removes all false
    positives), so the exact-Jaccard SQL is its oracle."""
    return dedup_text.minhash_lsh_pairs(spark, _t(spark, sf_dir, "documents"), 0.8)


SQL_MINHASH_LSH_DUPES = _SQL_JACCARD_PAIRS


def q_simhash_dupes(spark, sf_dir):
    """SimHash(64) near-dups, Hamming ≤ 3 via block banding. Approximate by
    design → no SQL oracle; exactness properties covered in pytest."""
    return dedup_text.simhash_near_dupes(
        spark, _t(spark, sf_dir, "documents"), max_hamming=3
    ).select("a_id", "b_id", "hamming")


def q_token_count(spark, sf_dir):
    """Token counting (whitespace tokenizer)."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", text.token_count("text").cast("long").alias("n_tokens"))


SQL_TOKEN_COUNT = r"""
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\s+')) END::BIGINT AS n_tokens
FROM documents
"""


def q_quality_features(spark, sf_dir):
    """Quality scoring: length/punct/stopword features + bounded score."""
    d = text.quality_features(
        text.ensure_min_partitions(
            _t(spark, sf_dir, "documents").select("doc_id", "text")
        )
    )
    return d.select(
        "doc_id", "n_tokens", F.round("punct_ratio", 6).alias("punct_ratio"),
        "stopword_hits", "quality_score",
    )


_STOP_SQL = "['the','a','an','and','of','to','is','in','that','it']"

SQL_QUALITY_FEATURES = rf"""
WITH base AS (
  SELECT doc_id, text,
         regexp_split_to_array(trim(text), '\s+') AS toks,
         length(text) AS n_chars,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
         length(text) - length(regexp_replace(text, '[.,;:!?''"()\[\]{{}}]', '', 'g')) AS n_punct
  FROM documents
), feat AS (
  SELECT doc_id, n_tokens::BIGINT AS n_tokens,
         round(n_punct * 1.0 / greatest(n_chars, 1), 6) AS punct_ratio,
         len(list_intersect(toks, {_STOP_SQL}))::BIGINT AS stopword_hits
  FROM base
)
SELECT doc_id, n_tokens, punct_ratio, stopword_hits,
       round(least(n_tokens / 100.0, 1.0) * 0.5
             + least(stopword_hits / 5.0, 1.0) * 0.3
             + (1.0 - least(punct_ratio * 10.0, 1.0)) * 0.2, 6) AS quality_score
FROM feat
"""


def q_lang_id(spark, sf_dir):
    """Language ID: marker-word hit counts, argmax with lexicographic
    tiebreak."""
    # spread the marker-intersect work: a single-file corpus scan would
    # run it on one task (no-op at scale — guide §2.5)
    d = text.ensure_min_partitions(
        _t(spark, sf_dir, "documents").select("doc_id", "text")
    )
    return text.lang_id(d).select("doc_id", "lang_pred")


def _lang_sql() -> str:
    score_cols = ",\n         ".join(
        "len(list_intersect(toks, [{}])) AS s_{}".format(
            ",".join(f"'{m}'" for m in ms), la
        )
        for la, ms in sorted(text.LANG_MARKERS.items())
    )
    langs = sorted(text.LANG_MARKERS)
    best = "greatest({})".format(", ".join(f"s_{la}" for la in langs))
    case = "CASE " + " ".join(
        f"WHEN s_{la} = best AND best > 0 THEN '{la}'" for la in langs
    ) + " ELSE 'und' END"
    return rf"""
WITH toked AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
), scored AS (
  SELECT doc_id,
         {score_cols}
  FROM toked
), withbest AS (
  SELECT *, {best} AS best FROM scored
)
SELECT doc_id, {case} AS lang_pred FROM withbest
"""


SQL_LANG_ID = _lang_sql()


def q_fingerprint(spark, sf_dir):
    """Rolling-hash document fingerprint (order-sensitive)."""
    d = text.ensure_min_partitions(
        _t(spark, sf_dir, "documents").select("doc_id", "text")
    )
    return text.fingerprint(d).select("doc_id", "fp")


SQL_FINGERPRINT = rf"""
SELECT doc_id,
       list_reduce(
         list_prepend(0::BIGINT,
           list_transform(regexp_split_to_array(trim(text), '\s+'),
                          t -> (length(t) * 131 + coalesce(ascii(t), 0))::BIGINT)),
         (acc, x) -> (acc * {text.FP_MULT} + x) % {text.FP_MOD}
       ) AS fp
FROM documents
"""


def q_embedding_topk(spark, sf_dir):
    """Brute-force cosine top-10 for query vectors vec_id < 5 (exact ANN
    baseline; deterministic tiebreak on vec_id)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    out = similarity.brute_force_topk(spark, emb, queries, k=10)
    return out.select("q_id", "vec_id", F.col("rank").cast("long").alias("rank"))


SQL_EMBEDDING_TOPK = """
WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.q_id, e.vec_id,
         round(list_cosine_similarity(q.qv, e.embedding::DOUBLE[]), 6) AS sim
  FROM q JOIN embeddings e ON e.vec_id <> q.q_id
), ranked AS (
  SELECT q_id, vec_id,
         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT q_id, vec_id, rank FROM ranked WHERE rank <= 10
"""


# hard bound on the cartesian oracle's input: embeddings tables at every
# test sf sit well under it (2k rows at sf0.1), so results are unchanged,
# but the O(N²) shape can no longer be pointed at an arbitrarily large sf
# dir (VERDICT r2 "do this" #4). Deterministic predicate, not .limit() —
# limit on an unordered scan is nondeterministic and would break the oracle.
COSINE_PAIRS_CAP = 10_000


def q_cosine_pairs(spark, sf_dir):
    """Embedding near-dup pairs: exact cosine ≥ 0.3 via JVM-side array
    arithmetic (zip_with/aggregate, no Python). This is the SMALL-N ORACLE
    shape (a deliberate cartesian, capped at COSINE_PAIRS_CAP input rows);
    the production pair-mining path is `cosine_pairs_lsh` (bucketed
    candidates → exact rerank), registered alongside with the same oracle
    contract."""
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < COSINE_PAIRS_CAP)
    return similarity.cosine_pairs_exact(emb, 0.3)


SQL_COSINE_PAIRS = """
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE a.vec_id < 10000 AND b.vec_id < 10000
  AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.3
"""


def q_cosine_pairs_lsh(spark, sf_dir):
    """Scale path for embedding near-dup pair mining: LSH bucket candidates
    → exact JVM rerank. Threshold 0.4 / n_planes=2 so the testdata (max sim
    ≈0.51) yields pairs AND per-pair recall loss stays ≤1e-7 — the
    exact-pairs SQL is a valid oracle. The cartesian `cosine_pairs` stays
    the small-N oracle shape."""
    return similarity.cosine_pairs_lsh(
        spark, _t(spark, sf_dir, "embeddings"), threshold=0.4, n_planes=2
    )


SQL_COSINE_PAIRS_LSH = """
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
"""


def q_embedding_topk_joined(spark, sf_dir):
    """Same exact top-10 as embedding_topk, but with the query set kept as
    a DataFrame (broadcast-joined, JVM zip_with dot) — the formulation
    whose #queries is bounded by the cluster, not the driver. Shares
    embedding_topk's oracle: identical results by construction."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    out = similarity.brute_force_topk_joined(spark, emb, queries, k=10)
    return out.select("q_id", "vec_id", F.col("rank").cast("long").alias("rank"))


def q_ann_lsh_topk(spark, sf_dir):
    """Approximate top-10 via multi-table hyperplane LSH + exact rerank.
    Approximate by design → rows-only check; recall vs brute force asserted
    in pytest."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return similarity.ann_topk_lsh(
        spark, emb, queries, k=10, n_planes=4, n_tables=16
    ).select("q_id", "vec_id", F.col("rank").cast("long").alias("rank"))


def q_ann_ivf_topk(spark, sf_dir):
    """IVF top-10 through the FULL IVF plan (probe selection against the
    centroid table, bucket join, exact rerank) pinned at nprobe=K — which
    degenerates to exhaustive search, so the brute-force SQL is an exact
    oracle and the driver gate covers the plan end to end (VERDICT r3 "do
    this" #5). Approximate operating points (nprobe < K) are covered by
    pytest recall tests (tests/test_similarity.py)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return similarity.ann_topk_ivf(
        spark, emb, queries, k=10, n_centroids=16, nprobe=16
    ).select("q_id", "vec_id", F.col("rank").cast("long").alias("rank"))


def q_ann_pq_topk(spark, sf_dir):
    """IVFADC top-10 through a PERSISTED IvfIndex built with PQ (stored
    books + residual codes, nprobe-bucket ADC, exact rerank — VERDICT r3
    "do this" #1), pinned at nprobe=K with rerank ≥ corpus so the shortlist
    covers everything and the exact rerank makes the brute-force SQL an
    exact oracle over the full IVFADC plan. Approximate operating points
    (nprobe/rerank small) are covered by pytest (tests/test_ivfpq.py,
    tests/test_pq.py).

    The index is built ONCE per (process, sf_dir) under a deterministic
    cached path and ``open``-ed thereafter — a real deployment builds the
    index offline and searches the persisted tables, and rebuilding per
    invocation both distorts bench timings and leaks temp dirs on a tmpfs
    box (ADVICE r4 #3)."""
    import hashlib
    import os
    import tempfile

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    path = os.path.join(tempfile.gettempdir(), f"ivfpq_oracle_{tag}")
    done = os.path.join(path, "_BUILT")
    if os.path.exists(done):
        idx = similarity.IvfIndex(path)
    else:
        idx = similarity.IvfIndex.build(
            spark, emb, path, n_centroids=16, pq_m=16, pq_ksub=64,
        )
        with open(done, "w") as fh:
            fh.write("ok\n")
    return idx.search(
        spark, queries, k=10, nprobe=16, rerank=10_000_000
    ).select("q_id", "vec_id", F.col("rank").cast("long").alias("rank"))


def q_media_type_dispatch(spark, sf_dir):
    """Multimodal: typed dispatch of media refs (extension → modality) — the
    plumbing in operators/multimodal.py over synthesized refs."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("https://cdn.test/"),
            F.col("doc_id").cast("string"),
            F.element_at(
                F.array(F.lit(".png"), F.lit(".mp4"), F.lit(".ogg"), F.lit("")),
                (F.col("doc_id") % 4 + 1).cast("int"),
            ),
        ).alias("media_ref"),
    )
    ext = F.lower(F.regexp_extract("media_ref", r"\.([a-zA-Z0-9]+)$", 1))
    media_type = (
        F.when(ext.isin("png", "jpg", "jpeg", "gif", "webp"), "image")
        .when(ext.isin("mp3", "ogg", "wav", "flac"), "audio")
        .when(ext.isin("mp4", "webm", "mkv", "avi"), "video")
        .otherwise("unknown")
    )
    return d.withColumn("media_type", media_type)


SQL_MEDIA_TYPE_DISPATCH = """
SELECT doc_id,
       'https://cdn.test/' || doc_id ||
         (['.png', '.mp4', '.ogg', ''])[(doc_id % 4) + 1] AS media_ref,
       CASE (doc_id % 4)
         WHEN 0 THEN 'image' WHEN 1 THEN 'video' WHEN 2 THEN 'audio'
         ELSE 'unknown' END AS media_type
FROM documents
"""


def q_repetition_ratios(spark, sf_dir):
    """Gopher-style repetition signal: per-doc top-bigram and top-trigram
    coverage ratios, computed scan-local (zero shuffles — the n-gram
    multiset folds inside one codegen'd projection)."""
    return curation.repetition_ratios(_t(spark, sf_dir, "documents"))


SQL_REPETITION_RATIOS = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
), g2 AS (
  SELECT doc_id, unnest([t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))]) AS g
  FROM toks WHERE len(t) >= 2
), g3 AS (
  SELECT doc_id, unnest(
    [t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN range(1, len(t) - 1)]
  ) AS g
  FROM toks WHERE len(t) >= 3
), m2 AS (
  SELECT doc_id, round(max(c) * 1.0 / sum(c), 6) AS r
  FROM (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2) GROUP BY 1
), m3 AS (
  SELECT doc_id, round(max(c) * 1.0 / sum(c), 6) AS r
  FROM (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2) GROUP BY 1
)
SELECT d.doc_id, coalesce(m2.r, 0.0) AS top2_ratio,
       coalesce(m3.r, 0.0) AS top3_ratio
FROM documents d LEFT JOIN m2 USING (doc_id) LEFT JOIN m3 USING (doc_id)
"""


def q_contamination_hits(spark, sf_dir):
    """Benchmark decontamination: distinct shared 3-grams per corpus doc vs
    the held-out benchmark slice (doc_id % 10 == 0) — broadcast benchmark
    n-gram set, corpus side shuffles only the per-doc count."""
    return curation.contamination_hits(_t(spark, sf_dir, "documents"))


SQL_CONTAMINATION_HITS = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
), sh AS (
  SELECT DISTINCT doc_id, unnest(
    [t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN range(1, len(t) - 1)]
  ) AS shingle
  FROM toks WHERE len(t) >= 3
), bench AS (
  SELECT DISTINCT shingle FROM sh WHERE doc_id % 10 = 0
)
SELECT s.doc_id, count(*) AS n_shared
FROM sh s JOIN bench b ON s.shingle = b.shingle
WHERE s.doc_id % 10 <> 0
GROUP BY 1
"""


def q_boilerplate_coverage(spark, sf_dir):
    """Corpus-frequent-bigram coverage per doc (navbox/banner signal):
    one doc-frequency aggregation, broadcast boilerplate set back."""
    return curation.boilerplate_coverage(
        _t(spark, sf_dir, "documents"), n=2, min_frac=0.04
    )


SQL_BOILERPLATE_COVERAGE = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         unnest([t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))]) AS shingle
  FROM toks WHERE len(t) >= 2
), nd AS (
  SELECT count(*) AS n FROM documents
), dfq AS (
  SELECT shingle, count(*) AS df FROM sh GROUP BY 1
), boiler AS (
  SELECT shingle FROM dfq, nd WHERE df >= ceil(0.04 * n)
), per AS (
  SELECT s.doc_id, round(count(b.shingle) * 1.0 / count(*), 6) AS coverage
  FROM sh s LEFT JOIN boiler b ON s.shingle = b.shingle GROUP BY 1
)
SELECT d.doc_id, coalesce(per.coverage, 0.0) AS coverage
FROM documents d LEFT JOIN per USING (doc_id)
"""


def q_curated_corpus(spark, sf_dir):
    """Composed C4-style keep-filter: long-enough, non-repetitive,
    5-gram-decontaminated non-benchmark docs — one corpus scan for both
    scan-local signals plus one broadcast anti-join."""
    return curation.curated_corpus(
        _t(spark, sf_dir, "documents"),
        min_tokens=30,
        max_top2_ratio=0.06,
        contamination_n=5,
    )


SQL_CURATED_CORPUS = r"""
WITH toks AS (
  SELECT doc_id, trim(text) AS tt,
         regexp_split_to_array(trim(text), '\s+') AS t
  FROM documents
), g2 AS (
  SELECT doc_id, unnest([t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))]) AS g
  FROM toks WHERE len(t) >= 2
), m2 AS (
  SELECT doc_id, round(max(c) * 1.0 / sum(c), 6) AS r
  FROM (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2) GROUP BY 1
), g5 AS (
  SELECT DISTINCT doc_id, unnest(
    [t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]
     FOR i IN range(1, len(t) - 3)]
  ) AS shingle
  FROM toks WHERE len(t) >= 5
), bench AS (
  SELECT DISTINCT shingle FROM g5 WHERE doc_id % 10 = 0
), contam AS (
  SELECT DISTINCT s.doc_id FROM g5 s JOIN bench b ON s.shingle = b.shingle
  WHERE s.doc_id % 10 <> 0
)
SELECT tk.doc_id,
       CASE WHEN tt = '' THEN 0 ELSE len(t) END::BIGINT AS n_tokens,
       coalesce(m2.r, 0.0) AS top2_ratio
FROM toks tk LEFT JOIN m2 USING (doc_id)
WHERE tk.doc_id % 10 <> 0
  AND (CASE WHEN tt = '' THEN 0 ELSE len(t) END) >= 30
  AND coalesce(m2.r, 0.0) <= 0.06
  AND tk.doc_id NOT IN (SELECT doc_id FROM contam)
"""


def q_pii_scrub(spark, sf_dir):
    """PII audit + redaction in one codegen'd scan: synthesize PII-bearing
    text from customer (deterministic email / TPC-H-format phone / IPv4),
    then count and scrub each class — zero shuffles, zero Python."""
    # spread 8-byte keys BEFORE synthesizing text so the regex scrub runs
    # on every core (single-file scan = one task otherwise); the shuffle
    # moves only c_custkey
    c = text.ensure_min_partitions(_t(spark, sf_dir, "customer").select("c_custkey"))
    k = F.col("c_custkey")
    phone = F.concat(
        (k % 25 + 10).cast("string"),
        F.lit("-"),
        (k % 900 + 100).cast("string"),
        F.lit("-"),
        (k % 871 + 100).cast("string"),
        F.lit("-"),
        (k % 9000 + 1000).cast("string"),
    )
    txt = F.concat(
        F.lit("reach user."),
        k.cast("string"),
        F.lit("@mail-"),
        (k % 7).cast("string"),
        F.lit(".example.com or call "),
        phone,
        F.lit(" from 192.168."),
        (k % 256).cast("string"),
        F.lit("."),
        (k % 250).cast("string"),
        F.lit(" today"),
    )
    d = c.select(k.alias("doc_id"), txt.alias("text"))
    return pii.pii_features(d)


SQL_PII_SCRUB = r"""
WITH d AS (
  SELECT c_custkey AS doc_id,
         'reach user.' || c_custkey || '@mail-' || (c_custkey % 7) ||
         '.example.com or call ' ||
         (c_custkey % 25 + 10) || '-' || (c_custkey % 900 + 100) || '-' ||
         (c_custkey % 871 + 100) || '-' || (c_custkey % 9000 + 1000) ||
         ' from 192.168.' ||
         (c_custkey % 256) || '.' || (c_custkey % 250) || ' today' AS text
  FROM customer
)
SELECT doc_id,
  len(regexp_extract_all(text, '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}'))
    AS n_emails,
  len(regexp_extract_all(text,
      '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS n_ipv4,
  len(regexp_extract_all(text,
      '\b[0-9]{2,3}[-.][0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b')) AS n_phones,
  regexp_replace(
    regexp_replace(
      regexp_replace(text,
        '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
    '\b[0-9]{2,3}[-.][0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b', '<PHONE>', 'g')
    AS clean_text
FROM d
"""


def q_sessionize(spark, sf_dir):
    """Gap-based sessionization via Catalyst's native session_window
    aggregation (one user_id exchange, map-side partials) — the streaming-
    compatible form, vs the lag+cumsum two-pass the oracle runs."""
    from starchart_spark.operators import sessions

    return sessions.sessionize(_t(spark, sf_dir, "events"))


SQL_SESSIONIZE = """
WITH e AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w > INTERVAL 8 HOUR THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts, value,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM e
)
SELECT user_id,
       epoch_ms(min(ts)) AS session_start_ms,
       epoch_ms(max(ts) + INTERVAL 8 HOUR) AS session_end_ms,
       count(*) AS n_events,
       round(sum(CAST(round(value * 1e6) AS BIGINT)) / 1e6, 6) AS sum_value
FROM s GROUP BY user_id, sid
"""


def q_pack_sequences(spark, sf_dir):
    """GPT-style sequence packing: per-source concatenation order, cut
    every 512 tokens, docs assigned to the sequence their first token
    lands in — integer arithmetic end-to-end (window cumsum + DIV)."""
    from starchart_spark.operators import packing

    return packing.pack_sequences(
        _t(spark, sf_dir, "documents"), context_len=512
    )


SQL_PACK_SEQUENCES = r"""
WITH t AS (
  SELECT source, doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END::BIGINT
           AS n_tokens
  FROM documents
), c AS (
  SELECT source, doc_id, n_tokens,
         sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS start_off
  FROM t
)
SELECT source, start_off // 512 AS seq_id, count(*) AS n_docs,
       sum(n_tokens) AS n_tokens, min(doc_id) AS first_doc_id,
       max(doc_id) AS last_doc_id
FROM c GROUP BY source, start_off // 512
"""


# fixed mixture for the driver gate: absolute per-language token budgets
# (es deliberately absent → rate 0, dropped from the mixture)
_MIXTURE_TARGETS = [("en", 5000), ("de", 2000), ("fr", 1000), ("zh", 3000)]


def q_mixture_sample(spark, sf_dir):
    """Token-budget mixture sampling: one aggregate for per-language
    acceptance rates (min(1, target/total)), then a deterministic
    selector predicate behind a broadcast rate dim — row-exact."""
    from starchart_spark.operators import packing

    targets = spark.createDataFrame(
        _MIXTURE_TARGETS, "lang string, target_tokens long"
    )
    return packing.mixture_sample(
        _t(spark, sf_dir, "documents"), targets
    ).select("doc_id", "lang", "source")


SQL_MIXTURE_SAMPLE = rf"""
WITH tok AS (
  SELECT doc_id, lang, source,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END::BIGINT
           AS n_tokens
  FROM documents
), tot AS (
  SELECT lang, sum(n_tokens) AS total_tokens FROM tok GROUP BY lang
), r AS (
  SELECT lang,
         CAST(trunc(least(1.0,
           (CASE lang WHEN 'en' THEN 5000 WHEN 'de' THEN 2000
                      WHEN 'fr' THEN 1000 WHEN 'zh' THEN 3000
                      ELSE 0 END) * 1.0 / total_tokens) * 2147483647)
           AS BIGINT) AS thresh
  FROM tot
)
SELECT t.doc_id, t.lang, t.source
FROM tok t JOIN r USING (lang)
WHERE {_SEL_SQL.format(col="t.doc_id")} < r.thresh
"""


def q_quality_buckets(spark, sf_dir):
    """CCNet-style per-language quality bucketing (Wenzek et al. 2020 split
    each language by model score into head/middle/tail): ONE corpus scan
    computes quality_score + lang_pred together, then the exact
    percent_rank tercile split per predicted language. The registry runs
    the exact (oracle-checkable) form; `percentile_buckets_at_scale` is the
    100 TB path (broadcast approx thresholds, no per-stratum sort)."""
    from starchart_spark.operators import curation

    d = text.lang_id(
        text.quality_features(
            text.ensure_min_partitions(
                _t(spark, sf_dir, "documents").select("doc_id", "text")
            )
        )
    )
    return curation.percentile_buckets(
        d.select("doc_id", "lang_pred", "quality_score"),
        score_col="quality_score",
        by_col="lang_pred",
    )


def _quality_buckets_sql() -> str:
    """Quality + lang-id CTEs (same arithmetic as their own oracles) joined,
    then percent_rank terciles — percent_rank is (rank-1)/(n-1) in both
    engines, 0 for a single-row stratum, ties share a rank."""
    score_cols = ",\n         ".join(
        "len(list_intersect(toks, [{}])) AS s_{}".format(
            ",".join(f"'{m}'" for m in ms), la
        )
        for la, ms in sorted(text.LANG_MARKERS.items())
    )
    langs = sorted(text.LANG_MARKERS)
    best = "greatest({})".format(", ".join(f"s_{la}" for la in langs))
    case = "CASE " + " ".join(
        f"WHEN s_{la} = best AND best > 0 THEN '{la}'" for la in langs
    ) + " ELSE 'und' END"
    return rf"""
WITH base AS (
  SELECT doc_id, text,
         regexp_split_to_array(trim(text), '\s+') AS toks,
         length(text) AS n_chars,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
         length(text) - length(regexp_replace(text, '[.,;:!?''"()\[\]{{}}]', '', 'g')) AS n_punct
  FROM documents
), feat AS (
  SELECT doc_id, toks, n_tokens,
         round(n_punct * 1.0 / greatest(n_chars, 1), 6) AS punct_ratio,
         len(list_intersect(toks, {_STOP_SQL}))::BIGINT AS stopword_hits
  FROM base
), qual AS (
  SELECT doc_id, toks,
         round(least(n_tokens / 100.0, 1.0) * 0.5
               + least(stopword_hits / 5.0, 1.0) * 0.3
               + (1.0 - least(punct_ratio * 10.0, 1.0)) * 0.2, 6) AS quality_score
  FROM feat
), scored AS (
  SELECT doc_id, quality_score,
         {score_cols}
  FROM qual
), withbest AS (
  SELECT *, {best} AS best FROM scored
), joined AS (
  SELECT doc_id, {case} AS lang_pred, quality_score FROM withbest
), ranked AS (
  SELECT doc_id, lang_pred, quality_score,
         percent_rank() OVER (PARTITION BY lang_pred ORDER BY quality_score) AS pr
  FROM joined
)
SELECT doc_id, lang_pred, quality_score,
       CASE WHEN pr < 1.0/3 THEN 'tail'
            WHEN pr < 2.0/3 THEN 'middle'
            ELSE 'head' END AS bucket
FROM ranked
"""


SQL_QUALITY_BUCKETS = _quality_buckets_sql()


def q_paragraph_dedup(spark, sf_dir):
    """RefinedWeb/CCNet paragraph-level dedup: cut every paragraph whose
    document frequency ≥ 2, reassemble the remainder in order. The flat
    testdata corpus has no newlines, so deterministic 6-token chunks stand
    in as paragraphs (chunk_paragraphs) — the frequency/anti-join/
    reassembly plan under test is identical to the real-corpus form."""
    from starchart_spark.operators import paragraphs

    chunks = paragraphs.chunk_paragraphs(
        _t(spark, sf_dir, "documents"), chunk_tokens=6
    )
    return paragraphs.remove_frequent_paragraphs(chunks, min_df=2)


SQL_PARAGRAPH_DEDUP = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
), chunks AS (
  SELECT doc_id,
         unnest([array_to_string(list_slice(t, i*6+1, i*6+6), ' ')
                 FOR i IN range(CAST(ceil(len(t)/6.0) AS BIGINT))]) AS para,
         unnest(range(CAST(ceil(len(t)/6.0) AS BIGINT))) AS pidx
  FROM toks
), p AS (
  SELECT * FROM chunks WHERE trim(para) <> ''
), freq AS (
  SELECT para FROM p GROUP BY para HAVING count(DISTINCT doc_id) >= 2
), kept AS (
  SELECT p.* FROM p WHERE NOT EXISTS (SELECT 1 FROM freq f WHERE f.para = p.para)
), rebuilt AS (
  SELECT doc_id, string_agg(para, chr(10) ORDER BY pidx) AS clean_text
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id, coalesce(r.clean_text, '') AS clean_text
FROM (SELECT DISTINCT doc_id FROM p) d LEFT JOIN rebuilt r USING (doc_id)
"""


def q_dsir_weights(spark, sf_dir):
    """DSIR unigram importance weights (Xie et al. 2023): every document
    scored by Σ ln p̂_target/p̂_raw over its token occurrences; the
    in-domain target is the corpus's lang='en' slice, the raw pool is the
    whole corpus. Exact-token form (the hashed-bucket variant is the same
    plan behind a hash projection — selection.py module docstring)."""
    from starchart_spark.operators import selection

    docs = _t(spark, sf_dir, "documents")
    return selection.dsir_weights(docs, docs.filter(F.col("lang") == "en"))


SQL_DSIR_WEIGHTS = r"""
WITH rawt AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
  FROM documents WHERE trim(text) <> ''
), tgtt AS (
  SELECT r.doc_id, r.tok FROM rawt r
  JOIN documents d USING (doc_id) WHERE d.lang = 'en'
), rc AS (
  SELECT tok, count(*) AS c_raw FROM rawt GROUP BY tok
), tc AS (
  SELECT tok, count(*) AS c_tgt FROM tgtt GROUP BY tok
), tot AS (
  SELECT (SELECT sum(c_raw) FROM rc) AS n_raw,
         (SELECT count(*) FROM rc) AS v,
         (SELECT count(*) FROM tgtt) AS n_tgt
), lr AS (
  SELECT rc.tok,
         round(ln((coalesce(tc.c_tgt, 0) + 0.5) / (tot.n_tgt + 0.5 * tot.v))
               - ln((rc.c_raw + 0.5) / (tot.n_raw + 0.5 * tot.v)), 6) AS logratio
  FROM rc LEFT JOIN tc USING (tok), tot
)
SELECT r.doc_id,
       round(sum(CAST(round(l.logratio * 1e6) AS BIGINT)) / 1e6, 6) AS weight
FROM rawt r JOIN lr l USING (tok)
GROUP BY r.doc_id
"""


def q_substring_dedup(spark, sf_dir):
    """Lee et al. 2022 duplicated-substring removal, fixed-L form: every
    token covered by an 8-token window occurring ≥2 times corpus-wide is
    cut, remainders rejoined in order. Position-free — catches templated
    spans at different offsets that doc- and paragraph-dedup both miss."""
    from starchart_spark.operators import substrings

    return substrings.remove_duplicated_substrings(
        _t(spark, sf_dir, "documents"), length=8, min_count=2
    )


SQL_SUBSTRING_DEDUP = r"""
WITH base AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
  FROM documents WHERE trim(text) <> ''
), win AS (
  SELECT doc_id,
         unnest([array_to_string(list_slice(t, i + 1, i + 8), ' ')
                 FOR i IN range(0, len(t) - 7)]) AS gram,
         unnest(range(0, len(t) - 7)) AS start
  FROM base WHERE len(t) >= 8
), freq AS (
  SELECT gram FROM win GROUP BY gram HAVING count(*) >= 2
), covered AS (
  SELECT DISTINCT w.doc_id, w.start + u.o AS pos
  FROM win w JOIN freq USING (gram)
  CROSS JOIN (SELECT unnest(range(0, 8)) AS o) u
), tokpos AS (
  SELECT doc_id, unnest(t) AS tok, unnest(range(0, len(t))) AS pos FROM base
), kept AS (
  SELECT tp.* FROM tokpos tp WHERE NOT EXISTS (
    SELECT 1 FROM covered c WHERE c.doc_id = tp.doc_id AND c.pos = tp.pos)
), rebuilt AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text
  FROM kept GROUP BY doc_id
)
SELECT b.doc_id, coalesce(r.clean_text, '') AS clean_text
FROM base b LEFT JOIN rebuilt r USING (doc_id)
"""


def q_suffix_array(spark, sf_dir):
    """Distributed corpus SUFFIX ARRAY by prefix doubling (Manber & Myers
    1990 rank doubling) — the general structure behind Lee et al.'s
    arbitrary-length substring dedup. Output (doc_id, pos, srank):
    dense rank of the suffix tokens[pos:] over ALL suffixes of ALL docs;
    identical cross-doc suffixes share a rank. O(log L) shuffles of
    24-byte rows; the suffix CONTENT is never materialized — the oracle
    builds every suffix string and dense_ranks it, which is exactly the
    single-node cost this plan avoids."""
    from starchart_spark.operators import substrings

    return substrings.suffix_ranks(_t(spark, sf_dir, "documents"))


SQL_SUFFIX_ARRAY = r"""
WITH toks AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS t
  FROM documents WHERE trim(text) <> ''
),
suf AS (
  SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
         array_to_string(t[i:], chr(1)) AS s
  FROM toks, LATERAL unnest(generate_series(1, len(t))) AS u(i)
)
SELECT doc_id, pos, CAST(dense_rank() OVER (ORDER BY s) AS BIGINT) AS srank
FROM suf
"""


def q_repeated_prefix(spark, sf_dir):
    """Longest repeated prefix per suffix — the arbitrary-length quantity
    Lee et al.'s suffix-array dedup consumes (lrp(p) = length of the
    longest token run starting at p that occurs elsewhere in the corpus,
    including a second time in the same document). Spark: prefix-doubling
    rank levels as a data-parallel LCP oracle over rank-adjacent pairs —
    O(log L) narrow joins, suffix content never materialized. Oracle:
    materialize every suffix as a token LIST, dense-rank it, token-wise
    LCP against the lexicographic neighbors plus full length for
    duplicated suffixes — the textbook single-node formulation."""
    from starchart_spark.operators import substrings

    return substrings.longest_repeated_prefix(_t(spark, sf_dir, "documents"))


SQL_REPEATED_PREFIX = r"""
WITH toks AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS t
  FROM documents WHERE trim(text) <> ''
),
suf AS (
  SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, t[i:] AS s
  FROM toks, LATERAL unnest(generate_series(1, len(t))) AS u(i)
),
ranked AS (
  SELECT doc_id, pos, s,
         dense_rank() OVER (ORDER BY s) AS r,
         count(*) OVER (PARTITION BY s) AS cnt
  FROM suf
),
dist AS (SELECT r, s FROM ranked GROUP BY r, s),
nbr AS (SELECT r, s, lead(s) OVER (ORDER BY r) AS s2 FROM dist),
lcps AS (
  SELECT r,
         CASE WHEN s2 IS NULL THEN 0
              -- list_position yields 0 (not NULL) when no mismatch exists
              -- within the min length (one suffix prefixes the other)
              ELSE coalesce(
                nullif(list_position(
                  list_transform(generate_series(1, least(len(s), len(s2))),
                                 i -> s[i] <> s2[i]),
                  true), 0) - 1,
                least(len(s), len(s2)))
         END AS lcp_n
  FROM nbr
)
SELECT k.doc_id, k.pos,
       CAST(greatest(CASE WHEN k.cnt >= 2 THEN len(k.s) ELSE 0 END,
                     coalesce(ln.lcp_n, 0), coalesce(lp.lcp_n, 0)) AS BIGINT)
         AS lrp
FROM ranked k
LEFT JOIN lcps ln ON ln.r = k.r
LEFT JOIN lcps lp ON lp.r = k.r - 1
"""


def q_repeated_spans(spark, sf_dir):
    """Positions covered by some duplicated run of >= 8 tokens, computed
    the suffix-array way (lrp-interval union) and gated against the
    INDEPENDENT formulation: duplicated fixed-8-gram coverage (a run of
    length l >= L is tiled by its l-L+1 duplicated L-grams). Two different
    algorithms, one answer — the cross-formulation exactness gate."""
    from starchart_spark.operators import substrings

    return substrings.repeated_spans(_t(spark, sf_dir, "documents"), length=8)


SQL_REPEATED_SPANS = r"""
WITH toks AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS t
  FROM documents WHERE trim(text) <> ''
),
grams AS (
  SELECT doc_id, CAST(i - 1 AS INTEGER) AS start,
         array_to_string(t[i:i+7], chr(1)) AS g
  FROM toks, LATERAL unnest(generate_series(1, len(t) - 7)) AS u(i)
),
freq AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2)
SELECT DISTINCT doc_id, CAST(start + j AS INTEGER) AS pos
FROM grams JOIN freq USING (g),
     LATERAL unnest(generate_series(0, 7)) AS v(j)
"""


def q_lm_score(spark, sf_dir):
    """CCNet's quality signal, Spark-native: per-document bigram
    cross-entropy under an add-0.5-smoothed model trained on the corpus
    itself (CCNet uses KenLM perplexity; same role, feed to
    percentile_buckets for the head/middle/tail split)."""
    from starchart_spark.operators import lm

    return lm.lm_cross_entropy(_t(spark, sf_dir, "documents"))


def q_phrase_search(spark, sf_dir):
    """Positional-index phrase search (ranking.phrase_search): every
    occurrence of the exact token phrase "the spark" via the anchor join —
    postings filtered to the phrase vocabulary vote (pos − idx), a true
    occurrence collects all k distinct idx votes. Overlap-correct where
    regex replace counting is not."""
    from starchart_spark.operators import ranking

    return ranking.phrase_search(
        _t(spark, sf_dir, "documents"), ["the", "spark"]
    )


SQL_PHRASE_SEARCH = r"""
WITH base AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
  FROM documents WHERE trim(text) <> ''
), tok AS (
  SELECT doc_id,
         unnest([{'pos': i, 'tk': t[i]} FOR i IN range(1, len(t) + 1)],
                recursive := true)
  FROM base
), dim AS (
  SELECT * FROM (VALUES (0, 'the'), (1, 'spark')) AS v(idx, term)
), hits AS (
  SELECT doc_id, pos - idx AS start_pos, idx
  FROM tok JOIN dim ON tk = term
)
SELECT doc_id, start_pos FROM hits
GROUP BY doc_id, start_pos
HAVING count(DISTINCT idx) = 2 AND start_pos >= 1
"""


def q_proximity_search(spark, sf_dir):
    """NEAR/k proximity retrieval (ranking.proximity_search): docs where
    'the' and 'spark' co-occur within ≤ 6 tokens, plus the tightest
    window — the minimal-window sweep as k conditional running-max
    columns over one doc-keyed sort exchange."""
    from starchart_spark.operators import ranking

    return ranking.proximity_search(
        _t(spark, sf_dir, "documents"), ["the", "spark"], window=6
    )


SQL_PROXIMITY_SEARCH = r"""
WITH base AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
  FROM documents WHERE trim(text) <> ''
), tok AS (
  SELECT doc_id,
         unnest([{'pos': i, 'tk': t[i]} FOR i IN range(1, len(t) + 1)],
                recursive := true)
  FROM base
), hits AS (
  SELECT doc_id, pos, tk FROM tok WHERE tk IN ('spark', 'the')
), lat AS (
  SELECT doc_id, pos,
         max(CASE WHEN tk = 'spark' THEN pos END) OVER w AS l0,
         max(CASE WHEN tk = 'the' THEN pos END) OVER w AS l1
  FROM hits
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), sp AS (
  SELECT doc_id,
         CASE WHEN l0 IS NOT NULL AND l1 IS NOT NULL
              THEN pos - least(l0, l1) + 1 END AS span
  FROM lat
)
SELECT doc_id, min(span) AS best_span
FROM sp WHERE span IS NOT NULL
GROUP BY doc_id HAVING min(span) <= 6
"""


def q_cdc_dedup(spark, sf_dir):
    """Content-defined chunking dedup (operators/cdc.py, LBFS/FastCDC
    boundaries at token granularity): per-doc chunk stats + keep-first
    duplicate token mass, portable-hash mode so the oracle replays the
    boundary rule integer-for-integer. k=3 gram windows, divisor 8 ⇒
    ~8-token expected chunks over the gate corpus."""
    from starchart_spark.operators import cdc

    chunks = cdc.chunk_tokens(
        _t(spark, sf_dir, "documents"), k=3, divisor=8, portable=True
    )
    return cdc.doc_dup_stats(chunks)


def _sql_cdc_dedup() -> str:
    from starchart_spark.operators.text import FP_MOD, FP_MULT

    c0 = pow(FP_MULT, 2, FP_MOD)
    c1 = FP_MULT
    c2 = 1
    return rf"""
WITH base AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
  FROM documents WHERE trim(text) <> ''
), tok AS (
  SELECT doc_id,
         unnest([{{'pos': i, 'tk': t[i]}} FOR i IN range(1, len(t) + 1)],
                recursive := true)
  FROM base
), tv AS (
  SELECT doc_id, pos, tk,
         (length(tk) * 131 + coalesce(ascii(tk), 0) * 31
          + coalesce(ascii(reverse(tk)), 0)) % {FP_MOD} AS v
  FROM tok
), gr AS (
  SELECT doc_id, pos, tk,
         ((v * {c0}) % {FP_MOD}
          + (lead(v, 1) OVER w * {c1}) % {FP_MOD}
          + (lead(v, 2) OVER w * {c2}) % {FP_MOD}) % {FP_MOD} AS gh,
         lead(v, 2) OVER w IS NOT NULL AS complete
  FROM tv WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
), flg AS (
  SELECT doc_id, pos, tk,
         CASE WHEN pos > 1 AND complete AND gh % 8 = 0 THEN 1 ELSE 0 END
           AS bnd
  FROM gr
), cid AS (
  SELECT doc_id, pos, tk,
         sum(bnd) OVER (PARTITION BY doc_id ORDER BY pos) AS chunk_id
  FROM flg
), ch AS (
  SELECT doc_id, chunk_id, min(pos) AS start_pos,
         CAST(count(*) AS BIGINT) AS n_tokens,
         string_agg(tk, ' ' ORDER BY pos) AS chunk_text
  FROM cid GROUP BY doc_id, chunk_id
), mk AS (
  SELECT *,
         row_number() OVER (PARTITION BY chunk_text ORDER BY doc_id, chunk_id)
           > 1 AS is_dup
  FROM ch
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN is_dup THEN n_tokens ELSE 0 END) AS BIGINT)
         AS dup_tokens,
       round(CAST(sum(CASE WHEN is_dup THEN n_tokens ELSE 0 END) AS BIGINT)
             / CAST(sum(n_tokens) AS BIGINT), 6) AS dup_ratio
FROM mk GROUP BY doc_id
"""


SQL_CDC_DEDUP = _sql_cdc_dedup()


def q_unimax_mixture(spark, sf_dir):
    """UNIMAX capped-uniform budget apportionment
    (pqueue.waterfill_budget): an integer token/doc budget spreads evenly
    across languages except no language exceeds its corpus size — capped
    languages' unused share flows to the rest, exact-integer waterfilling.
    total=352 exercises every branch across both gate scales: immediate
    crossing + leftover extras at sf0.001; capped groups + mid-scan
    crossing + extras at sf0.01. Feeds packing.mixture_sample as its
    per-stratum target table."""
    from starchart_spark.operators import pqueue

    caps = (
        _t(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cap"))
    )
    return pqueue.waterfill_budget(caps, total=352)


SQL_UNIMAX_MIXTURE = """
WITH caps AS (
  SELECT lang AS g, CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY lang
), o AS (
  SELECT g, c,
         row_number() OVER (ORDER BY c, g) AS j,
         coalesce(sum(c) OVER (ORDER BY c, g
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS P
  FROM caps
), d AS (
  SELECT count(*) AS G, sum(c) AS S, max(c) AS cmax FROM caps
), x AS (
  SELECT (352 - o.P) // (d.G - o.j + 1) AS gt, o.j, o.c FROM o, d
), tsel AS (
  SELECT gt FROM x WHERE gt < c ORDER BY j LIMIT 1
), t AS (
  SELECT coalesce((SELECT gt FROM tsel), (SELECT cmax FROM d)) AS t
), lvl AS (
  SELECT g, c, least(c, t.t) AS lvl, c > t.t AS unc FROM caps, t
), r AS (
  SELECT 352 - sum(lvl) AS r FROM lvl
), ranked AS (
  SELECT *, row_number() OVER (ORDER BY unc DESC, g) AS er FROM lvl
)
SELECT g AS lang,
       CAST(lvl + CASE WHEN unc AND er <= r.r THEN 1 ELSE 0 END AS BIGINT)
         AS budget
FROM ranked, r
"""


def q_cache_policy(spark, sf_dir):
    """RFC 9111 revisit decisions (operators/cachectl.py): freshness from
    max-age or the §4.2.2 heuristic, no-store/no-cache opt-outs, validator
    preference (ETag over Last-Modified). Headers synthesize from orders
    so every decision branch appears: o_orderkey % 5 cycles the
    Cache-Control shape, % 3 the ETag, % 4 the Last-Modified."""
    from starchart_spark.operators import cachectl

    k = F.col("o_orderkey")
    resp = _t(spark, sf_dir, "orders").select(
        F.concat(
            F.lit("https://host"), (k % 50).cast("string"),
            F.lit(".test/page/"), k.cast("string"),
        ).alias("url"),
        F.when(k % 3 == 0, F.concat(F.lit('"e'), k.cast("string"), F.lit('"'))).alias(
            "etag"
        ),
        F.when(k % 4 < 2, F.lit(1_000_000) + (k % 1000) * 100).alias(
            "last_modified_s"
        ),
        F.when(k % 5 == 0, F.concat(F.lit("max-age="), ((k % 200) * 10).cast("string")))
        .when(k % 5 == 1, F.lit("no-cache, public"))
        .when(k % 5 == 2, F.lit("no-store"))
        .when(k % 5 == 3, F.lit("public"))
        .alias("cache_control"),
        (F.lit(2_000_000) + (k % 5000)).alias("fetched_s"),
    )
    return cachectl.cache_decision(resp, now_s=2_003_000)


def _cache_policy_sql(resp_cte: str, now_s: int, extra_cols: str = "") -> str:
    """The cache_decision oracle as a spliceable generator (same pattern as
    pagerank_cte): composition oracles (revisit_plan) reuse the identical
    decision CTEs instead of restating them. ``extra_cols`` carries
    passenger columns (e.g. hostname) through the explicit dec projection."""
    return rf"""
WITH resp AS ({resp_cte}
), d AS (
  SELECT *,
    {now_s} - fetched_s AS age_s,
    coalesce(
      CASE WHEN regexp_extract(coalesce(cache_control, ''),
                  '(?i)(?:^|[,\s])max-age=([0-9]+)', 1) <> ''
           THEN CAST(regexp_extract(coalesce(cache_control, ''),
                  '(?i)(?:^|[,\s])max-age=([0-9]+)', 1) AS BIGINT) END,
      CASE WHEN last_modified_s IS NOT NULL
           THEN (fetched_s - last_modified_s) // 10 END,
      0) AS fresh_for_s,
    regexp_matches(coalesce(cache_control, ''),
      '(?i)(?:^|[,\s])no-store(?:$|[,\s])') AS no_store,
    regexp_matches(coalesce(cache_control, ''),
      '(?i)(?:^|[,\s])no-cache(?:$|[,\s])') AS no_cache,
    (etag IS NOT NULL OR last_modified_s IS NOT NULL) AS has_validator
  FROM resp
), dec AS (
  SELECT {extra_cols}url, etag, last_modified_s, cache_control, fetched_s, age_s,
    fresh_for_s,
    CASE
      WHEN no_store THEN 'fetch'
      WHEN no_cache AND has_validator THEN 'revalidate'
      WHEN no_cache THEN 'fetch'
      WHEN age_s < fresh_for_s THEN 'fresh'
      WHEN has_validator THEN 'revalidate'
      ELSE 'fetch'
    END AS decision
  FROM d
)
SELECT *,
  CASE WHEN decision = 'revalidate' THEN
    CASE WHEN etag IS NOT NULL THEN 'if-none-match'
         ELSE 'if-modified-since' END
  END AS cond_header
FROM dec"""


_CACHE_RESP_CTE = r"""
  SELECT
    'https://host' || (o_orderkey % 50) || '.test/page/' || o_orderkey AS url,
    CASE WHEN o_orderkey % 3 = 0 THEN '"e' || o_orderkey || '"' END AS etag,
    CASE WHEN o_orderkey % 4 < 2
         THEN 1000000 + (o_orderkey % 1000) * 100 END AS last_modified_s,
    CASE o_orderkey % 5
      WHEN 0 THEN 'max-age=' || ((o_orderkey % 200) * 10)
      WHEN 1 THEN 'no-cache, public'
      WHEN 2 THEN 'no-store'
      WHEN 3 THEN 'public'
    END AS cache_control,
    2000000 + (o_orderkey % 5000) AS fetched_s
  FROM orders"""


SQL_CACHE_POLICY = _cache_policy_sql(_CACHE_RESP_CTE, 2_003_000)


def q_revisit_plan(spark, sf_dir):
    """The revisit COMPOSITION (recrawl.revisit_plan): RFC 9111 cache
    state × sitemap assertions × adaptive host TTL → one per-URL action
    (fetch / defer / skip / revalidate) + wake-up time. Same header
    synthesis as cache_policy (every decision branch), sitemap status on
    a %7 cycle, host schedule on a %8 cycle with hosts 40-49 absent
    (first-sighting ⇒ due) — all five actions and every precedence edge
    appear at both gate scales."""
    from starchart_spark.operators import recrawl

    k = F.col("o_orderkey")
    resp = _t(spark, sf_dir, "orders").select(
        F.concat(F.lit("host"), (k % 50).cast("string"), F.lit(".test")).alias(
            "hostname"
        ),
        F.concat(
            F.lit("https://host"), (k % 50).cast("string"),
            F.lit(".test/page/"), k.cast("string"),
        ).alias("url"),
        F.when(k % 3 == 0, F.concat(F.lit('"e'), k.cast("string"), F.lit('"'))).alias(
            "etag"
        ),
        F.when(k % 4 < 2, F.lit(1_000_000) + (k % 1000) * 100).alias(
            "last_modified_s"
        ),
        F.when(k % 5 == 0, F.concat(F.lit("max-age="), ((k % 200) * 10).cast("string")))
        .when(k % 5 == 1, F.lit("no-cache, public"))
        .when(k % 5 == 2, F.lit("no-store"))
        .when(k % 5 == 3, F.lit("public"))
        .alias("cache_control"),
        (F.lit(2_000_000) + (k % 5000)).alias("fetched_s"),
    )
    sitemap = (
        _t(spark, sf_dir, "orders")
        .filter(k % 7 < 4)
        .select(
            F.concat(
                F.lit("https://host"), (k % 50).cast("string"),
                F.lit(".test/page/"), k.cast("string"),
            ).alias("url"),
            F.when(k % 7 == 0, F.lit("updated"))
            .when(k % 7 == 1, F.lit("new"))
            .otherwise(F.lit("unchanged"))
            .alias("status"),
        )
    )
    schedule = spark.range(0, 40).select(
        F.concat(F.lit("host"), F.col("id").cast("string"), F.lit(".test")).alias(
            "hostname"
        ),
        (F.lit(2_001_000) + (F.col("id") % 8) * 400).alias("next_due"),
    )
    return recrawl.revisit_plan(resp, sitemap, schedule, now_s=2_003_000)


def _sql_revisit_plan() -> str:
    base = _cache_policy_sql(
        "\n  SELECT 'host' || (o_orderkey % 50) || '.test' AS hostname,"
        + _CACHE_RESP_CTE.replace("SELECT", "", 1),
        2_003_000,
        extra_cols="hostname, ",
    )
    return rf"""
WITH base AS ({base}
), sm AS (
  SELECT 'https://host' || (o_orderkey % 50) || '.test/page/' || o_orderkey
           AS url,
         CASE o_orderkey % 7 WHEN 0 THEN 'updated' WHEN 1 THEN 'new'
              ELSE 'unchanged' END AS status
  FROM orders WHERE o_orderkey % 7 < 4
), sch AS (
  SELECT 'host' || h || '.test' AS hostname,
         2001000 + (h % 8) * 400 AS next_due
  FROM (SELECT unnest(range(0, 40)) AS h)
), j AS (
  SELECT b.*, s.status AS sm, c.next_due
  FROM base b LEFT JOIN sm s USING (url) LEFT JOIN sch c USING (hostname)
)
SELECT hostname, url, decision, fresh_for_s, cond_header,
       coalesce(sm, 'none') AS sitemap_status,
       next_due AS host_next_due,
       CASE WHEN sm IN ('new', 'updated') THEN 'fetch'
            WHEN next_due IS NOT NULL AND 2003000 < next_due THEN 'defer'
            WHEN decision = 'fresh' THEN 'skip'
            WHEN decision = 'revalidate' THEN 'revalidate'
            ELSE 'fetch' END AS action,
       CAST(CASE WHEN sm IN ('new', 'updated') THEN 2003000
            WHEN next_due IS NOT NULL AND 2003000 < next_due THEN next_due
            WHEN decision = 'fresh' THEN fetched_s + fresh_for_s
            ELSE 2003000 END AS BIGINT) AS next_check_s
FROM j
"""


SQL_REVISIT_PLAN = _sql_revisit_plan()


def q_bpe_pair_counts(spark, sf_dir):
    """BPE training's 100 TB hot path (operators/bpe.py): corpus-weighted
    adjacent symbol-pair counts over char+end-of-word symbol arrays — ONE
    word-count aggregate over the corpus, then zip_with-over-slices pair
    windows on the distinct-word dim. Top 50 by (cnt desc, pair asc), a
    total order because pair is the group key. The k-round merge loop
    itself is pytest-pinned against a pure-Python reference
    (tests/test_bpe.py); this entry gates the aggregate every merge round
    re-runs."""
    from starchart_spark.operators import bpe

    words = bpe.word_counts(_t(spark, sf_dir, "documents"))
    return (
        bpe.pair_counts(bpe.init_symbols(words))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(50)
    )


SQL_BPE_PAIR_COUNTS = r"""
WITH w AS (
  SELECT word, count(*) AS n FROM (
    SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS word
    FROM documents WHERE trim(text) <> ''
  ) GROUP BY word
), syms AS (
  SELECT list_append([word[i] FOR i IN range(1, len(word) + 1)], '</w>') AS s,
         n
  FROM w
), pairs AS (
  SELECT unnest([s[i] || ' ' || s[i+1] FOR i IN range(1, len(s))]) AS pair, n
  FROM syms WHERE len(s) >= 2
)
SELECT pair, sum(n) AS cnt FROM pairs GROUP BY pair
ORDER BY cnt DESC, pair ASC LIMIT 50
"""


def q_lm_kn_score(spark, sf_dir):
    """Kneser–Ney-smoothed bigram cross-entropy — the smoothing KenLM
    actually ships (CCNet's scorer). Trained on the even-doc_id HALF of
    the corpus and scored over ALL docs, so the driver gate exercises all
    three probability branches (seen bigram / backoff through a seen
    context / unseen context → continuation distribution), not just the
    self-trained fast path."""
    from starchart_spark.operators import lm

    docs = _t(spark, sf_dir, "documents")
    train = lm._doc_bigrams(docs.filter(F.col("doc_id") % 2 == 0), "text", "doc_id")
    pairs, ctx, cont, npp = lm.kn_model(train)
    return lm.kn_cross_entropy(docs, pairs, ctx, cont, npp)


SQL_LM_KN_SCORE = r"""
WITH base AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
  FROM documents WHERE trim(text) <> ''
), bg AS (
  SELECT doc_id, unnest([t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))]) AS bigram
  FROM base WHERE len(t) >= 2
), train AS (
  SELECT bigram FROM bg WHERE doc_id % 2 = 0
), pairs AS (
  SELECT bigram, count(*) AS c_bg FROM train GROUP BY bigram
), ctx AS (
  SELECT split_part(bigram, ' ', 1) AS v, sum(c_bg) AS c_ctx,
         count(*) AS n_follow
  FROM pairs GROUP BY 1
), cont AS (
  SELECT split_part(bigram, ' ', 2) AS w, count(*) AS n_prec
  FROM pairs GROUP BY 1
), npp AS (
  SELECT count(*) AS npp FROM pairs
), scored AS (
  SELECT b.doc_id,
    round(ln(CASE
      WHEN p.c_bg IS NOT NULL THEN
        (p.c_bg - 0.75) / c.c_ctx
        + (0.75 * c.n_follow / c.c_ctx)
          * (coalesce(CAST(co.n_prec AS DOUBLE), 0.75) / n.npp)
      WHEN c.c_ctx IS NOT NULL THEN
        (0.75 * c.n_follow / c.c_ctx)
          * (coalesce(CAST(co.n_prec AS DOUBLE), 0.75) / n.npp)
      ELSE coalesce(CAST(co.n_prec AS DOUBLE), 0.75) / n.npp
    END), 6) AS logp
  FROM bg b
  LEFT JOIN pairs p USING (bigram)
  LEFT JOIN ctx c ON split_part(b.bigram, ' ', 1) = c.v
  LEFT JOIN cont co ON split_part(b.bigram, ' ', 2) = co.w
  CROSS JOIN npp n
)
SELECT doc_id, count(*) AS n_bigrams,
       round(-(sum(CAST(round(logp * 1e6) AS BIGINT)) / 1e6) / count(*), 6) AS ce
FROM scored GROUP BY doc_id
"""


SQL_LM_SCORE = r"""
WITH base AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
  FROM documents WHERE trim(text) <> ''
), bg AS (
  SELECT doc_id, unnest([t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))]) AS bigram
  FROM base WHERE len(t) >= 2
), counts AS (
  SELECT bigram, count(*) AS c_bg FROM bg GROUP BY bigram
), ctx AS (
  SELECT split_part(bigram, ' ', 1) AS ctx, sum(c_bg) AS c_ctx
  FROM counts GROUP BY 1
), vocab AS (
  SELECT count(DISTINCT tok) AS v FROM (
    SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
    FROM documents WHERE trim(text) <> ''
  )
), model AS (
  SELECT bigram, round(ln((c_bg + 0.5) / (c_ctx + 0.5 * v)), 6) AS logp
  FROM counts JOIN ctx ON split_part(counts.bigram, ' ', 1) = ctx.ctx, vocab
)
SELECT b.doc_id, count(*) AS n_bigrams,
       round(-(sum(CAST(round(m.logp * 1e6) AS BIGINT)) / 1e6) / count(*), 6) AS ce
FROM bg b JOIN model m USING (bigram)
GROUP BY b.doc_id
"""


def q_semantic_dedup(spark, sf_dir):
    """SemDedup-style embedding dedup through the PRODUCTION path: LSH
    bucket-local pair mining (threshold 0.4, n_planes=2 — the recall
    parameters already validated oracle-exact on cosine_pairs_lsh) → drop
    the higher id of every pair. The oracle is the NOT EXISTS dominance
    rule over exact cosine, so the full plan is verified end-to-end."""
    from starchart_spark.operators import similarity

    kept = similarity.semantic_dedup(
        spark, _t(spark, sf_dir, "embeddings"), threshold=0.4, n_planes=2
    )
    return kept.select("vec_id", "label")


SQL_SEMANTIC_DEDUP = """
SELECT e.vec_id, e.label FROM embeddings e
WHERE NOT EXISTS (
  SELECT 1 FROM embeddings a
  WHERE a.vec_id < e.vec_id
    AND round(list_cosine_similarity(a.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6) >= 0.4
)
"""


def q_semantic_dedup_scale(spark, sf_dir):
    """SemDedup in the paper's within-cluster form — the scale path:
    sign-bit cells (2^6), dominance inside a cell only. The oracle
    reproduces the bucketing itself, so the driver verifies the actual
    algorithm (cross-cell misses included), not a recall argument."""
    from starchart_spark.operators import similarity

    kept = similarity.semantic_dedup_bucketed(
        _t(spark, sf_dir, "embeddings"), threshold=0.4, sign_dims=6
    )
    return kept.select("vec_id", "label")


SQL_SEMANTIC_DEDUP_SCALE = """
WITH sig AS (
  SELECT vec_id, label, embedding,
         CAST(embedding[1] >= 0 AS BIGINT) * 32
         + CAST(embedding[2] >= 0 AS BIGINT) * 16
         + CAST(embedding[3] >= 0 AS BIGINT) * 8
         + CAST(embedding[4] >= 0 AS BIGINT) * 4
         + CAST(embedding[5] >= 0 AS BIGINT) * 2
         + CAST(embedding[6] >= 0 AS BIGINT) AS cell
  FROM embeddings
)
SELECT s.vec_id, s.label FROM sig s
WHERE NOT EXISTS (
  SELECT 1 FROM sig a
  WHERE a.cell = s.cell AND a.vec_id < s.vec_id
    AND round(list_cosine_similarity(a.embedding::DOUBLE[],
                                     s.embedding::DOUBLE[]), 6) >= 0.4
)
"""


def q_publiccode_roundtrip(spark, sf_dir):
    """N5/N6 federation gate: repo-shaped rows rendered to publiccode.yml
    (vectorized YAML) and ingested back — the projection through the real
    render+parse path must be the identity (schema.rs:100-162)."""
    from starchart_spark.crawl import federate

    p = _t(spark, sf_dir, "part")
    repos = p.select(
        F.concat(
            F.lit("https://forge-"),
            (F.col("p_partkey") % 7).cast("string"),
            F.lit(".test/"),
        ).alias("hostname"),
        F.col("p_brand").alias("owner"),
        F.concat(F.lit("part-"), F.col("p_partkey").cast("string")).alias("name"),
        F.col("p_name").alias("description"),
        F.when(
            F.col("p_size") % 2 == 0,
            F.concat(F.lit("https://w.test/"), F.col("p_partkey").cast("string")),
        ).alias("website"),
        F.concat(
            F.lit("https://x.test/"),
            F.col("p_brand"),
            F.lit("/part-"),
            F.col("p_partkey").cast("string"),
        ).alias("html_url"),
        F.split(F.col("p_type"), " ").alias("tags"),
    )
    back = federate.ingest_publiccode(
        federate.render_publiccode(repos).select("hostname", "yaml")
    )
    return back.select(
        "hostname", "owner", "name", "description", "website", "html_url",
        F.concat_ws("|", "tags").alias("tags_joined"),
    )


SQL_PUBLICCODE_ROUNDTRIP = """
SELECT 'https://forge-' || (p_partkey % 7) || '.test/' AS hostname,
       p_brand AS owner,
       'part-' || p_partkey AS name,
       p_name AS description,
       CASE WHEN p_size % 2 = 0 THEN 'https://w.test/' || p_partkey END AS website,
       'https://x.test/' || p_brand || '/part-' || p_partkey AS html_url,
       replace(p_type, ' ', '|') AS tags_joined
FROM part
"""


def q_mini_index_targeting(spark, sf_dir):
    """J6: federated search targeting — per-source mini-index (distinct
    words), wildcard-matched against a term, hit sources broadcast-joined to
    their instance URLs (db/db-sqlx-sqlite/src/lib.rs:111-139)."""
    d = _t(spark, sf_dir, "documents")
    words = d.select(
        "source", F.explode(F.split(F.trim("text"), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    hits = (
        words.filter(F.col("word").contains("data"))  # wildcarded *data* (N9)
        .groupBy("source")
        .agg(F.countDistinct("word").alias("n_matching_words"))
    )
    instances = d.select("source").distinct().select(
        "source",
        F.concat(F.lit("https://"), "source", F.lit(".starchart.test/")).alias(
            "instance_url"
        ),
    )
    return hits.join(F.broadcast(instances), "source")


SQL_MINI_INDEX_TARGETING = r"""
WITH words AS (
  SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS word
  FROM documents
)
SELECT source, count(DISTINCT word) AS n_matching_words,
       'https://' || source || '.starchart.test/' AS instance_url
FROM words WHERE word <> '' AND word LIKE '%data%'
GROUP BY source
"""


def q_import_forges_dedup(spark, sf_dir):
    """S12/D10: import a peer's forge list — insert-if-absent with
    imported=true + source-instance lineage (src/introduce.rs:59-87). Local
    rows win; only genuinely new hostnames land tagged."""
    n = _t(spark, sf_dir, "nation")
    mine = n.filter(F.col("n_nationkey") < 15).select(
        F.concat(F.lit("https://"), F.lower("n_name"), F.lit(".test/")).alias("hostname"),
        F.lit(False).alias("imported"),
        F.lit(None).cast("string").alias("starchart_instance"),
    )
    peer = n.filter(F.col("n_nationkey") >= 5).select(
        F.concat(F.lit("https://"), F.lower("n_name"), F.lit(".test/")).alias("hostname")
    )
    fresh = peer.join(mine.select("hostname"), "hostname", "left_anti").select(
        "hostname",
        F.lit(True).alias("imported"),
        F.lit("https://peer.starchart.test/").alias("starchart_instance"),
    )
    return mine.unionByName(fresh)


SQL_IMPORT_FORGES_DEDUP = """
WITH mine AS (
  SELECT 'https://' || lower(n_name) || '.test/' AS hostname,
         FALSE AS imported, CAST(NULL AS VARCHAR) AS starchart_instance
  FROM nation WHERE n_nationkey < 15
), peer AS (
  SELECT 'https://' || lower(n_name) || '.test/' AS hostname
  FROM nation WHERE n_nationkey >= 5
)
SELECT * FROM mine
UNION ALL
SELECT hostname, TRUE AS imported,
       'https://peer.starchart.test/' AS starchart_instance
FROM peer WHERE hostname NOT IN (SELECT hostname FROM mine)
"""


def q_nb_classify(spark, sf_dir):
    """Quality-classifier gate (fastText role, CCNet/GPT-3 appendix A):
    multinomial Naive Bayes trained on the corpus's lang labels, every
    document scored and argmax-classified. Training is pure counting, so
    train AND score verify against one closed-form SQL oracle."""
    from starchart_spark.operators import classify

    docs = _t(spark, sf_dir, "documents").withColumn("label", F.col("lang"))
    model, classes = classify.nb_train(docs, label_col="label")
    return classify.nb_classify(docs, model, classes)


SQL_NB_CLASSIFY = r"""
WITH base AS (
  SELECT doc_id, lang AS label, regexp_split_to_array(trim(text), '\s+') AS t
  FROM documents WHERE trim(text) <> ''
), toks AS (
  SELECT doc_id, label, unnest(t) AS tok FROM base
), counts AS (
  SELECT tok, label, count(*) AS c FROM toks GROUP BY 1, 2
), ctot AS (
  SELECT label, sum(c) AS n_c FROM counts GROUP BY 1
), vocab AS (
  SELECT count(DISTINCT tok) AS v FROM counts
), dpc AS (
  SELECT label, count(*) AS n_docs FROM base GROUP BY 1
), ntot AS (
  SELECT sum(n_docs) AS n_total FROM dpc
), model AS (
  SELECT tok, counts.label,
         CAST(round(ln((c + 0.5) / (n_c + 0.5 * v)) * 1e6) AS BIGINT) AS ll_u
  FROM counts JOIN ctot ON counts.label = ctot.label, vocab
), classes AS (
  SELECT dpc.label,
         CAST(round(ln(n_docs / n_total) * 1e6) AS BIGINT) AS prior_u,
         CAST(round(ln(0.5 / (n_c + 0.5 * v)) * 1e6) AS BIGINT) AS floor_u
  FROM dpc JOIN ctot ON dpc.label = ctot.label, ntot, vocab
), occ AS (
  SELECT doc_id, unnest(t) AS tok FROM base
), scored AS (
  SELECT occ.doc_id, c.label,
         any_value(c.prior_u) + sum(coalesce(m.ll_u, c.floor_u)) AS score_u
  FROM occ CROSS JOIN classes c
  LEFT JOIN model m ON m.tok = occ.tok AND m.label = c.label
  GROUP BY 1, 2
), ranked AS (
  SELECT doc_id, label, score_u,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score_u DESC, label ASC) AS rn
  FROM scored
)
SELECT doc_id, label AS predicted, round(score_u / 1e6, 6) AS score
FROM ranked WHERE rn = 1
"""


def q_vocab_encode(spark, sf_dir):
    """Tokenize-for-training: frequency-ranked 32-token vocabulary
    (deterministic ties) + every document encoded to its id sequence,
    OOV→0; the id array stringifies so the driver's value hash sees a
    scalar."""
    from starchart_spark.operators import vocab

    docs = _t(spark, sf_dir, "documents")
    v = vocab.build_vocab(docs, max_size=32)
    enc = vocab.encode(docs, v)
    return enc.select(
        "doc_id",
        "n_tokens",
        F.array_join(F.col("ids").cast("array<string>"), " ").alias("ids_str"),
    )


SQL_VOCAB_ENCODE = r"""
WITH base AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
  FROM documents WHERE trim(text) <> ''
), toks AS (
  SELECT doc_id, unnest(t) AS tok,
         unnest(range(1, len(t) + 1)) AS pos
  FROM base
), counts AS (
  SELECT tok, count(*) AS c FROM toks GROUP BY 1
), vocab AS (
  SELECT tok, row_number() OVER (ORDER BY c DESC, tok ASC) AS tok_id
  FROM counts QUALIFY tok_id <= 32
)
SELECT doc_id, count(*) AS n_tokens,
       string_agg(CAST(coalesce(v.tok_id, 0) AS VARCHAR), ' ' ORDER BY pos)
         AS ids_str
FROM toks LEFT JOIN vocab v USING (tok)
GROUP BY doc_id
"""


def q_bm25_rank(spark, sf_dir):
    """Scored full-text retrieval: BM25 (Lucene idf variant) top-15 for a
    3-term query over the documents corpus — the relevance-ranked form of
    the reference's FTS match surface (db/db-sqlx-sqlite/src/lib.rs FTS
    MATCH), expressed as two hash aggregates + broadcast dims."""
    from starchart_spark.operators import ranking

    docs = _t(spark, sf_dir, "documents")
    return ranking.bm25_topk(docs, ["spark", "vector", "hash"], k=15)


SQL_BM25_RANK = r"""
WITH base AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
  FROM documents WHERE trim(text) <> ''
), toks AS (
  SELECT doc_id, unnest(t) AS tok FROM base
), postings AS (
  SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2
), doclen AS (
  SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1
), stats AS (
  SELECT count(*) AS n_docs, sum(dl) AS total_len FROM doclen
), q AS (
  SELECT unnest(['spark', 'vector', 'hash']) AS tok
), dfreq AS (
  SELECT tok, count(*) AS df FROM postings JOIN q USING (tok) GROUP BY 1
), idf AS (
  SELECT tok, round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)), 6) AS idf
  FROM dfreq, stats
), term AS (
  SELECT p.doc_id,
         CAST(round(i.idf * (p.tf * (1.2 + 1.0))
                    / (p.tf + 1.2 * (1.0 - 0.75
                                     + 0.75 * d.dl
                                       / (s.total_len * 1.0 / s.n_docs)))
                    * 1e6) AS BIGINT) AS term_u
  FROM postings p JOIN idf i USING (tok) JOIN doclen d USING (doc_id), stats s
)
SELECT doc_id, round(sum(term_u) / 1e6, 6) AS score
FROM term GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 15
"""


def q_asof_join(spark, sf_dir):
    """As-of join (operator Spark lacks natively): every purchase event
    matched to the same user's most recent view at-or-before it —
    attribution's "last touch". UNION + running-last window: one shuffle,
    no inequality join, no Python."""
    from starchart_spark.operators import temporal

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "event_id", "ts"
    )
    out = temporal.asof_join(
        purchases, views, on="user_id", ts_col="ts", right_id_col="event_id"
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
        F.col("event_id_right").alias("view_event_id"),
        F.unix_millis(F.col("ts_right").cast("timestamp")).alias("view_ts_ms"),
    )


SQL_ASOF_JOIN = """
WITH v AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type = 'view'
), p AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
), u AS (
  SELECT user_id, ts, 0 AS is_left, event_id AS rid,
         event_id AS v_id, ts AS v_ts, NULL::BIGINT AS l_id
  FROM v
  UNION ALL
  SELECT user_id, ts, 1, NULL, NULL, NULL, event_id FROM p
), w AS (
  SELECT *,
         last_value(v_id IGNORE NULLS) OVER win AS matched_id,
         last_value(v_ts IGNORE NULLS) OVER win AS matched_ts
  FROM u
  WINDOW win AS (PARTITION BY user_id ORDER BY ts, is_left, rid
                 ROWS UNBOUNDED PRECEDING)
)
SELECT l_id AS event_id, user_id, epoch_ms(ts) AS ts_ms,
       matched_id AS view_event_id, epoch_ms(matched_ts) AS view_ts_ms
FROM w WHERE is_left = 1
"""


def q_range_join(spark, sf_dir):
    """Range join (operator Spark lacks natively): events into per-user
    maintenance windows — containment expressed as an EQUI-join on
    (key, time-bucket) with an exact post-filter, never a nested-loop
    inequality join."""
    from starchart_spark.operators import temporal

    DAY = 86_400_000
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
    )
    base = ev.groupBy("user_id").agg(F.min("ts_ms").alias("base"))
    intervals = base.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(9))).alias("i"),
        "base",
    ).select(
        "user_id",
        (F.col("user_id") * 100 + F.col("i")).alias("interval_id"),
        (F.col("base") + F.col("i").cast("long") * (3 * DAY)).alias("w_start"),
        (F.col("base") + F.col("i").cast("long") * (3 * DAY) + DAY).alias(
            "w_end"
        ),
    )
    out = temporal.range_join(
        ev,
        intervals,
        on="user_id",
        point_col="ts_ms",
        start_col="w_start",
        end_col="w_end",
        bucket_width=DAY,
    )
    return out.select("event_id", "user_id", "interval_id")


SQL_RANGE_JOIN = """
WITH ev AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms FROM events
), b AS (
  SELECT user_id, min(ts_ms) AS base FROM ev GROUP BY 1
), iv AS (
  SELECT user_id, user_id * 100 + i AS interval_id,
         base + i * 259200000 AS w_start,
         base + i * 259200000 + 86400000 AS w_end
  FROM b, (SELECT unnest(range(0, 10)) AS i)
)
SELECT e.event_id, e.user_id, iv.interval_id
FROM ev e JOIN iv ON e.user_id = iv.user_id
 AND e.ts_ms >= iv.w_start AND e.ts_ms < iv.w_end
"""


def q_host_pagerank(spark, sf_dir):
    """Host-graph PageRank (operators/graph.py): 5 exact-integer rounds
    over a link graph derived from orders — src domain h0..h36, dst domain
    h0..h40, so hosts h37..h40 exercise the dangling-mass path. Rank in
    BIGINT micro-units: exact, order-independent sums, oracle-unrollable."""
    from starchart_spark.operators import graph

    edges = _t(spark, sf_dir, "orders").select(
        F.concat(F.lit("h"), (F.col("o_custkey") % 37).cast("string")).alias("src"),
        F.concat(F.lit("h"), (F.col("o_orderkey") % 41).cast("string")).alias("dst"),
    ).distinct()
    return graph.pagerank(edges, iters=5)


def _sql_host_pagerank() -> str:
    from starchart_spark.operators import graph

    return graph.pagerank_sql(
        "SELECT DISTINCT 'h' || (o_custkey % 37) AS src,"
        " 'h' || (o_orderkey % 41) AS dst FROM orders",
        iters=5,
    )


SQL_HOST_PAGERANK = _sql_host_pagerank()


def q_opic_scores(spark, sf_dir):
    """OPIC online importance (graph.opic, Abiteboul et al. WWW 2003 —
    Nutch's default crawl scoring): 4 synchronous cash/history supersteps
    over the SAME orders-derived host graph as host_pagerank, so the
    online estimate is directly comparable to the offline signals. Exact
    BIGINT cash units; oracle unrolls the identical recurrence."""
    from starchart_spark.operators import graph

    edges = _t(spark, sf_dir, "orders").select(
        F.concat(F.lit("h"), (F.col("o_custkey") % 37).cast("string")).alias("src"),
        F.concat(F.lit("h"), (F.col("o_orderkey") % 41).cast("string")).alias("dst"),
    ).distinct()
    return graph.opic(edges, iters=4)


def _sql_opic_scores() -> str:
    from starchart_spark.operators import graph

    return graph.opic_sql(
        "SELECT DISTINCT 'h' || (o_custkey % 37) AS src,"
        " 'h' || (o_orderkey % 41) AS dst FROM orders",
        iters=4,
    )


SQL_OPIC_SCORES = _sql_opic_scores()


def q_host_hits(spark, sf_dir):
    """Host-graph HITS hubs/authorities (operators/graph.py): 4 exact-
    integer rounds over the SAME orders-derived link graph as
    host_pagerank, so the two priority signals are directly comparable.
    Hubs score hosts that DISCOVER (directory/link pages), authorities
    hosts worth FETCHING — the scheduler wants the pair, not either
    alone. Integer max-normalized scores, oracle-unrolled like
    pagerank_sql so the recurrence cannot drift between engines."""
    from starchart_spark.operators import graph

    edges = _t(spark, sf_dir, "orders").select(
        F.concat(F.lit("h"), (F.col("o_custkey") % 37).cast("string")).alias("src"),
        F.concat(F.lit("h"), (F.col("o_orderkey") % 41).cast("string")).alias("dst"),
    ).distinct()
    return graph.hits(edges, iters=4)


def _sql_host_hits() -> str:
    from starchart_spark.operators import graph

    return graph.hits_sql(
        "SELECT DISTINCT 'h' || (o_custkey % 37) AS src,"
        " 'h' || (o_orderkey % 41) AS dst FROM orders",
        iters=4,
    )


SQL_HOST_HITS = _sql_host_hits()


def q_trust_rank(spark, sf_dir):
    """Seed-personalized PageRank (graph.trustrank, Gyöngyi et al. VLDB
    2004) over the same orders-derived host graph: teleport + dangling
    mass return to curated seeds h0..h4 only, so hosts unreachable from
    the trusted web score a HARD integer zero — the spam/link-farm
    demotion signal the scheduler subtracts before budget allocation."""
    from starchart_spark.operators import graph

    edges = _t(spark, sf_dir, "orders").select(
        F.concat(F.lit("h"), (F.col("o_custkey") % 37).cast("string")).alias("src"),
        F.concat(F.lit("h"), (F.col("o_orderkey") % 41).cast("string")).alias("dst"),
    ).distinct()
    seeds = spark.range(5).select(
        F.concat(F.lit("h"), F.col("id").cast("string")).alias("host")
    )
    return graph.trustrank(edges, seeds, iters=5)


def _sql_trust_rank() -> str:
    from starchart_spark.operators import graph

    return graph.trustrank_sql(
        "SELECT DISTINCT 'h' || (o_custkey % 37) AS src,"
        " 'h' || (o_orderkey % 41) AS dst FROM orders",
        "SELECT 'h' || unnest(range(0, 5)) AS host",
        iters=5,
    )


SQL_TRUST_RANK = _sql_trust_rank()


_PSL_RULES = [
    "com", "co.uk", "uk", "ac.jp", "jp", "*.ck", "!www.ck", "blogspot.com",
]

# five host shapes exercising every PSL branch: multi-label rule, private
# suffix, wildcard, exception, default "*"
_SITE_HOST_SQL = """CASE c_custkey % 5
  WHEN 0 THEN 'shard' || (c_custkey % 13) || '.example' || (c_custkey % 7) || '.co.uk'
  WHEN 1 THEN 'u' || (c_custkey % 11) || '.blogspot.com'
  WHEN 2 THEN 'w' || (c_custkey % 3) || '.org.ck'
  WHEN 3 THEN 'www.ck'
  ELSE 'site' || (c_custkey % 17) || '.xyz' END"""


def q_site_rollup(spark, sf_dir):
    """Registrable-domain (eTLD+1) extraction (operators/domains.py):
    PSL-algorithm suffix match against a broadcast rule dim, then the
    site roll-up a frontier keys politeness/dedup on. Hosts derived from
    customer keys cover all five rule branches (normal, multi-label,
    private, wildcard, exception, default)."""
    from starchart_spark.operators import domains

    host = F.expr(_SITE_HOST_SQL)
    hosts = _t(spark, sf_dir, "customer").select(host.alias("hostname"))
    rules = spark.createDataFrame([(r,) for r in _PSL_RULES], ["rule"])
    return domains.registrable_domain(hosts, rules)


def _sql_site_rollup() -> str:
    from starchart_spark.operators import domains

    rules_vals = ", ".join(f"('{r}')" for r in _PSL_RULES)
    return domains.registrable_domain_sql(
        f"SELECT {_SITE_HOST_SQL} AS hostname FROM customer",
        f"SELECT * FROM (VALUES {rules_vals}) AS r(rule)",
    )


SQL_SITE_ROLLUP = _sql_site_rollup()


def q_anchor_terms(spark, sf_dir):
    """Inbound anchor-term profile per target host (operators/anchors.py):
    tokenize → DISTINCT linking-host weighting (a link farm counts once)
    → top-5 terms per target via the two-pass skew-proof ranker. Links
    derive from part: p_name supplies real multi-word anchor text with
    heavy cross-host term overlap (ties exercise the deterministic
    (n_hosts DESC, term ASC) order)."""
    from starchart_spark.operators import anchors

    links = _t(spark, sf_dir, "part").select(
        F.concat(F.lit("s"), (F.col("p_partkey") % 23).cast("string")).alias("src"),
        F.concat(F.lit("d"), (F.col("p_partkey") % 7).cast("string")).alias("dst"),
        F.col("p_name").alias("anchor"),
    )
    return anchors.anchor_terms(links, k=5)


def _sql_anchor_terms() -> str:
    from starchart_spark.operators import anchors

    return anchors.anchor_terms_sql(
        "SELECT 's' || (p_partkey % 23) AS src, 'd' || (p_partkey % 7) AS dst,"
        " p_name AS anchor FROM part",
        k=5,
    )


SQL_ANCHOR_TERMS = _sql_anchor_terms()


def q_sitemap_parse(spark, sf_dir):
    """Sitemap-protocol ingestion (operators/sitemaps.py): seven hosts'
    urlsets (optional lastmod/changefreq/priority by key mods, escaped
    entities in every loc) plus one sitemapindex host, assembled
    deterministically from orders and parsed back out — entry order,
    entity unescaping, date math and milli-unit priorities all pinned
    against the identical SQL-side assembly + parse."""
    from starchart_spark.operators import sitemaps

    o = _t(spark, sf_dir, "orders")
    ok = F.col("o_orderkey")
    host = F.concat(F.lit("h"), (F.col("o_custkey") % 7).cast("string"))
    lastmod = F.date_add(F.to_date(F.lit("1992-01-01")), (ok % 2000).cast("int"))
    snip = F.concat(
        F.lit("<url><loc>http://"), host, F.lit("/p"), ok.cast("string"),
        F.lit("?a=1&amp;b="), (ok % 5).cast("string"), F.lit("</loc>"),
        F.when(
            ok % 3 == 0,
            F.concat(F.lit("<lastmod>"), lastmod.cast("string"), F.lit("</lastmod>")),
        ).otherwise(F.lit("")),
        F.when(ok % 4 == 0, F.lit("<changefreq>daily</changefreq>")).otherwise(
            F.lit("")
        ),
        F.when(
            ok % 2 == 0,
            F.concat(F.lit("<priority>0."), (ok % 10).cast("string"), F.lit("</priority>")),
        ).otherwise(F.lit("")),
        F.lit("</url>"),
    )
    urlsets = (
        o.select(host.alias("hostname"), ok.alias("k"), snip.alias("s"))
        .groupBy("hostname")
        .agg(
            F.concat(
                F.lit("<urlset>"),
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("k", "s"))),
                        lambda x: x["s"],
                    ),
                    "",
                ),
                F.lit("</urlset>"),
            ).alias("body")
        )
    )
    idx_snip = F.concat(
        F.lit("<sitemap><loc>http://hidx/sm-"), ok.cast("string"),
        F.lit(".xml</loc></sitemap>"),
    )
    index = (
        o.filter(ok % 97 == 0)
        .select(ok.alias("k"), idx_snip.alias("s"))
        .groupBy()
        .agg(
            F.concat(
                F.lit("<sitemapindex>"),
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("k", "s"))),
                        lambda x: x["s"],
                    ),
                    "",
                ),
                F.lit("</sitemapindex>"),
            ).alias("body")
        )
        .select(F.lit("hidx").alias("hostname"), "body")
    )
    return sitemaps.parse_sitemaps(urlsets.unionByName(index))


def _sql_sitemap_parse() -> str:
    from starchart_spark.operators import sitemaps

    snip = """'<url><loc>http://h' || (o_custkey % 7) || '/p' || o_orderkey
      || '?a=1&amp;b=' || (o_orderkey % 5) || '</loc>'
      || CASE WHEN o_orderkey % 3 = 0 THEN '<lastmod>' ||
           CAST(DATE '1992-01-01' + INTERVAL ((o_orderkey % 2000)) DAY AS VARCHAR)
           || '</lastmod>' ELSE '' END
      || CASE WHEN o_orderkey % 4 = 0 THEN '<changefreq>daily</changefreq>' ELSE '' END
      || CASE WHEN o_orderkey % 2 = 0 THEN '<priority>0.' || (o_orderkey % 10)
           || '</priority>' ELSE '' END
      || '</url>'"""
    bodies = f"""
  SELECT 'h' || (o_custkey % 7) AS hostname,
         '<urlset>' || string_agg({snip}, '' ORDER BY o_orderkey) || '</urlset>' AS body
  FROM orders GROUP BY 1
  UNION ALL
  SELECT 'hidx' AS hostname,
         '<sitemapindex>' || string_agg(
           '<sitemap><loc>http://hidx/sm-' || o_orderkey || '.xml</loc></sitemap>',
           '' ORDER BY o_orderkey) || '</sitemapindex>' AS body
  FROM orders WHERE o_orderkey % 97 = 0
"""
    return sitemaps.parse_sitemaps_sql(bodies)


SQL_SITEMAP_PARSE = _sql_sitemap_parse()


def q_host_template_strip(spark, sf_dir):
    """Per-host template stripping (paragraphs.host_template_paragraphs /
    strip_host_template): a site's nav repeats on EVERY page of its host
    but is globally rare, so corpus-wide document frequency never sees it
    — the cut is host-local (df·1000 ≥ share·pages in exact milli-units).
    Paragraph rows synthesize per doc: a host-wide NAV (templates out), a
    unique body slice (survives), and a 1-in-3 PROMO (33% < the 50%
    share floor — survives)."""
    from starchart_spark.operators import paragraphs

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit("h"), (F.col("doc_id") % 7).cast("string")).alias(
            "hostname"
        ),
        F.expr("substring(text, 1, 40)").alias("body"),
    )
    paras = (
        d.select(
            "hostname", "doc_id", F.lit(0).alias("pidx"),
            F.concat(F.lit("NAV of "), F.col("hostname")).alias("para"),
        )
        .unionByName(
            d.select(
                "hostname", "doc_id", F.lit(1).alias("pidx"),
                F.col("body").alias("para"),
            )
        )
        .unionByName(
            d.filter(F.col("doc_id") % 3 == 0).select(
                "hostname", "doc_id", F.lit(2).alias("pidx"),
                F.lit("PROMO banner").alias("para"),
            )
        )
        .filter(F.trim(F.col("para")) != "")
    )
    return paragraphs.strip_host_template(paras)


SQL_HOST_TEMPLATE_STRIP = """
WITH d AS (
  SELECT doc_id, 'h' || (doc_id % 7) AS hostname,
         substr(text, 1, 40) AS body
  FROM documents
), paras AS (
  SELECT hostname, doc_id, 0 AS pidx, 'NAV of ' || hostname AS para FROM d
  UNION ALL
  SELECT hostname, doc_id, 1, body FROM d
  UNION ALL
  SELECT hostname, doc_id, 2, 'PROMO banner' FROM d WHERE doc_id % 3 = 0
), paras_nb AS (
  SELECT * FROM paras WHERE trim(para) <> ''
), pages AS (
  SELECT hostname, count(DISTINCT doc_id) AS pages FROM paras_nb GROUP BY 1
), dfh AS (
  SELECT hostname, para, count(DISTINCT doc_id) AS df
  FROM paras_nb GROUP BY 1, 2
), tmpl AS (
  SELECT d.hostname, d.para
  FROM dfh d JOIN pages p USING (hostname)
  WHERE d.df >= 2 AND d.df * 1000 >= 500 * p.pages
), kept AS (
  SELECT pn.* FROM paras_nb pn
  LEFT JOIN tmpl t ON pn.hostname = t.hostname AND pn.para = t.para
  WHERE t.para IS NULL
), rebuilt AS (
  SELECT hostname, doc_id,
         string_agg(para, chr(10) ORDER BY pidx) AS clean_text
  FROM kept GROUP BY hostname, doc_id
)
SELECT a.hostname, a.doc_id, coalesce(r.clean_text, '') AS clean_text
FROM (SELECT DISTINCT hostname, doc_id FROM paras_nb) a
LEFT JOIN rebuilt r USING (hostname, doc_id)
"""


def q_robots_refresh(spark, sf_dir):
    """RFC 9309 §2.3.1/§2.4 robots fetch-status semantics
    (robots.refresh_policy): 2xx rules, 4xx fail-OPEN, 5xx/unreachable
    fail-CLOSED with the cached-rules grace, 24 h cache window. States
    synthesize from customer: status by key % 6 (incl. NULL and 0
    unreachable forms), ages spanning the 86,400 s boundary, alternating
    cached-rules flag — every (decision, access) pair appears."""
    from starchart_spark.operators import robots as rob

    k = F.col("c_custkey")
    states = _t(spark, sf_dir, "customer").select(
        F.concat(F.lit("h"), k.cast("string")).alias("hostname"),
        F.when(k % 6 == 0, F.lit(200))
        .when(k % 6 == 1, F.lit(404))
        .when(k % 6 == 2, F.lit(403))
        .when(k % 6 == 3, F.lit(503))
        .when(k % 6 == 4, F.lit(None).cast("int"))
        .otherwise(F.lit(0))
        .alias("status"),
        (F.lit(100_000) - (k % 2000) * 60).alias("fetched_s"),
        (k % 2 == 0).alias("has_rules"),
    )
    return rob.refresh_policy(states, now_s=100_000)


SQL_ROBOTS_REFRESH = """
WITH states AS (
  SELECT 'h' || c_custkey AS hostname,
    CASE c_custkey % 6 WHEN 0 THEN 200 WHEN 1 THEN 404 WHEN 2 THEN 403
                       WHEN 3 THEN 503 WHEN 4 THEN NULL ELSE 0 END AS status,
    100000 - (c_custkey % 2000) * 60 AS fetched_s,
    c_custkey % 2 = 0 AS has_rules
  FROM customer
)
SELECT *,
  100000 - fetched_s AS age_s,
  CASE WHEN status IS NOT NULL AND status > 0
            AND 100000 - fetched_s < 86400 THEN 'use_cached'
       ELSE 'refetch' END AS decision,
  CASE WHEN status IS NOT NULL AND status > 0
            AND status >= 200 AND status < 300 THEN 'rules'
       WHEN status IS NOT NULL AND status > 0
            AND status >= 400 AND status < 500 THEN 'allow_all'
       WHEN has_rules THEN 'rules'
       ELSE 'deny_all' END AS access
FROM states
"""


def q_sitemap_recrawl_delta(spark, sf_dir):
    """Sitemap-driven re-crawl delta (sitemaps.recrawl_delta): the parsed
    urlset entries join the last-fetch ledger; locs label new / updated /
    unchanged (no-lastmod entries stay unchanged — absence proves
    nothing). The ledger derives deterministically from the same parse
    (even-length locs fetched; fetch day = lastmod −1/0/+1 by len % 3, or
    1000 when no lastmod) so all four label paths appear at gate scale."""
    from starchart_spark.operators import sitemaps

    # the parsed urlset feeds BOTH join sides (entries + ledger); without a
    # checkpoint the whole assemble+parse subtree — the expensive 7-group
    # collect_list/sort/concat — executes twice (guide §2.4 remove
    # duplicated subtrees; results identical, the checkpoint is plan-only)
    urls = (
        q_sitemap_parse(spark, sf_dir)
        .filter(F.col("kind") == "url")
        .localCheckpoint(eager=True)
    )
    llen = F.length("loc")
    ledger = urls.filter(llen % 2 == 0).select(
        "loc",
        F.when(
            F.col("lastmod_days").isNull(), F.lit(1000)
        ).otherwise(F.col("lastmod_days") + (llen % 3 - 1)).alias("fetched_day"),
    )
    return sitemaps.recrawl_delta(urls, ledger)


SQL_SITEMAP_RECRAWL_DELTA = f"""
WITH parsed AS ({SQL_SITEMAP_PARSE}),
urls AS (SELECT * FROM parsed WHERE kind = 'url'),
ledger AS (
  SELECT loc,
         CASE WHEN lastmod_days IS NULL THEN 1000
              ELSE lastmod_days + (length(loc) % 3 - 1) END AS fetched_day
  FROM urls WHERE length(loc) % 2 = 0
)
SELECT u.*, l.fetched_day,
  CASE WHEN l.loc IS NULL THEN 'new'
       WHEN u.lastmod_days IS NOT NULL AND u.lastmod_days > l.fetched_day
         THEN 'updated'
       ELSE 'unchanged' END AS status
FROM urls u LEFT JOIN ledger l USING (loc)
"""


# three alias shapes of one resource per customer key: case+default-port+
# userinfo noise, dot-segments, tracking/permuted query params
_DEEP_URL_SQL = """CASE c_custkey % 3
  WHEN 0 THEN 'HTTP://User@Forge-' || (c_custkey % 50) || '.Test:80/a//p'
       || (c_custkey % 200) || '/./x/../y?b=' || (c_custkey % 3)
       || '&utm_source=z&a=' || (c_custkey % 5) || '#f'
  WHEN 1 THEN 'http://forge-' || (c_custkey % 50) || '.test/a/p'
       || (c_custkey % 200) || '/y?a=' || (c_custkey % 5) || '&b=' || (c_custkey % 3)
  ELSE 'http://forge-' || (c_custkey % 50) || '.test/q/../a/p'
       || (c_custkey % 200) || '/y?b=' || (c_custkey % 3) || '&&a=' || (c_custkey % 5)
  END"""


def q_deep_url_dedup(spark, sf_dir):
    """Deep-URL normalization (functions/urls.py deep_url_normalize):
    RFC 3986 §6.2 syntax normalization + tracking-param strip + query
    sort, then the frontier roll-up — three alias shapes per resource
    collapse to ONE key with n_aliases = 3, proving the dedup effect the
    operator exists for. All rules are codegen'd JVM regexes replayed
    character-identically by the oracle."""
    from starchart_spark.functions import urls as urls_fn

    # spread the 8-byte keys before URL synthesis + the 8-pass dot-segment
    # regex normalization (single-file scan = one task otherwise)
    cust = text.ensure_min_partitions(
        _t(spark, sf_dir, "customer").select("c_custkey")
    ).select(F.expr(_DEEP_URL_SQL).alias("url"))
    return (
        cust.select(urls_fn.deep_url_normalize("url").alias("norm_url"))
        .groupBy("norm_url")
        .agg(F.count(F.lit(1)).alias("n_aliases"))
    )


def _sql_deep_url_dedup() -> str:
    from starchart_spark.functions import urls as _u

    norm = _u.deep_url_normalize_sql("url")
    return f"""
WITH raw AS (SELECT {_DEEP_URL_SQL} AS url FROM customer)
SELECT {norm} AS norm_url, CAST(COUNT(*) AS BIGINT) AS n_aliases
FROM raw GROUP BY 1
"""


SQL_DEEP_URL_DEDUP = _sql_deep_url_dedup()


def _redir_url(n: str) -> str:
    """URL of synthetic redirect node ``n`` — shared Spark/DuckDB text."""
    return f"'http://h' || (({n}) % 41) || '.test/r/' || ({n})"


# deterministic chain topology over customer keys: blocks of 8 with a
# chain edge pos->pos+1; every 5th block closes pos7 -> pos0 into an
# 8-cycle (block 0's closer targets key 0, which customer lacks — that
# block stays an ordinary terminating chain, identically in both engines)
_REDIR_EDGE_FILTER = "c_custkey % 8 < 7 OR (c_custkey - 7) % 40 = 0"
_REDIR_DST = (
    f"CASE WHEN c_custkey % 8 < 7 THEN {_redir_url('c_custkey + 1')} "
    f"ELSE {_redir_url('c_custkey - 7')} END"
)


def q_redirect_resolve(spark, sf_dir):
    """Redirect-chain resolution (operators/redirects.py): pointer doubling
    resolves every alias to its chain terminal in 3 self-joins (cap 2^3,
    chains here are ≤7 hops), cycles flagged with the 2^R-step witness.
    The oracle is a bounded recursive walk with the same cap — exact on
    resolved AND cycle rows (module-docstring invariants)."""
    from starchart_spark.operators import redirects

    edges = (
        _t(spark, sf_dir, "customer")
        .where(F.expr(_REDIR_EDGE_FILTER))
        .select(
            F.expr(_redir_url("c_custkey")).alias("src"),
            F.expr(_REDIR_DST).alias("dst"),
        )
    )
    return redirects.resolve_redirects(edges, rounds=3)


def _sql_redirect_resolve() -> str:
    from starchart_spark.operators import redirects

    edges_cte = f"""SELECT {_redir_url('c_custkey')} AS src,
       {_REDIR_DST} AS dst
  FROM customer WHERE {_REDIR_EDGE_FILTER}"""
    return redirects.resolve_redirects_sql(edges_cte, rounds=3)


SQL_REDIRECT_RESOLVE = _sql_redirect_resolve()


# canonical sorted-query URLs with one relevant always-on param (a), one
# irrelevant sometimes-absent param (sid), one relevant sometimes-absent
# param (z); the fingerprint is a pure function of (host, path, a, z) so
# the miner must promote exactly sid
_DUST_URL_SQL = """'http://h' || (o_custkey % 13) || '.test/p' || (o_orderkey % 97)
  || '?a=' || (o_orderkey % 5)
  || CASE WHEN o_orderkey % 3 > 0 THEN '&sid=' || (o_orderkey % 1000) ELSE '' END
  || CASE WHEN o_orderkey % 7 = 0 THEN '&z=' || (o_orderkey % 2) ELSE '' END"""
_DUST_FP_SQL = """(o_custkey % 13) * 1000000 + (o_orderkey % 97) * 1000
  + (o_orderkey % 5) * 10
  + CASE WHEN o_orderkey % 7 = 0 THEN 1 + (o_orderkey % 2) ELSE 0 END"""


def q_dust_params(spark, sf_dir):
    """DUST param-relevance mining (operators/dust.py): which query params
    never change content, per host — value-variants AND absent-variants
    grouped by the param-stripped residual URL, one high-cardinality hash
    aggregate + one URL equi-join. Expected promotion: sid only."""
    from starchart_spark.operators import dust

    obs = _t(spark, sf_dir, "orders").select(
        F.expr(_DUST_URL_SQL).alias("url"),
        F.expr(_DUST_FP_SQL).cast("long").alias("fingerprint"),
    )
    return dust.param_relevance(obs, min_support=2)


def _sql_dust_params() -> str:
    from starchart_spark.operators import dust

    obs_cte = (
        f"SELECT {_DUST_URL_SQL} AS url, CAST({_DUST_FP_SQL} AS BIGINT) AS fp "
        "FROM orders"
    )
    return dust.param_relevance_sql(obs_cte, min_support=2)


SQL_DUST_PARAMS = _sql_dust_params()


def q_winnow_fingerprint(spark, sf_dir):
    """MOSS winnowing fingerprints (operators/winnow.py, portable-hash
    parity mode): k=4 token grams, window w=5, rightmost-min selection via
    one order-encoded window min. Production mode swaps in xxhash64 gram
    identity; selection logic is identical (pytest-asserted guarantee)."""
    from starchart_spark.operators import winnow

    return winnow.winnow_fingerprints(
        _t(spark, sf_dir, "documents"), k=4, w=5, portable=True
    )


def _winnow_cte(source_sql: str) -> str:
    """CTE chain computing winnowed (doc_id, pos, gh) at k=4/w=5 from a
    source relation (doc_id, text) — shared by the fingerprint oracle and
    every oracle that composes winnowing (mirror detection), so the
    selection recurrence can never drift between uses."""
    from starchart_spark.operators.text import FP_MOD, FP_MULT
    from starchart_spark.operators.winnow import POSCAP

    c0, c1, c2, c3 = (pow(FP_MULT, e, FP_MOD) for e in (3, 2, 1, 0))
    return f"""base AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
  FROM ({source_sql}) WHERE length(trim(text)) > 0
),
toks AS (
  SELECT doc_id, unnest(t) AS tok, unnest(range(1, len(t) + 1)) AS pos FROM base
),
tv AS (
  SELECT doc_id, pos,
         (length(tok) * 131 + coalesce(ascii(tok), 0) * 31
          + coalesce(ascii(reverse(tok)), 0)) % {FP_MOD} AS tv
  FROM toks
),
leads AS (
  SELECT doc_id, pos, tv,
         lead(tv, 1) OVER w AS tv1, lead(tv, 2) OVER w AS tv2,
         lead(tv, 3) OVER w AS tv3
  FROM tv WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
grams AS (
  SELECT doc_id, pos,
         (((tv * {c0}) % {FP_MOD}) + ((tv1 * {c1}) % {FP_MOD})
          + ((tv2 * {c2}) % {FP_MOD}) + ((tv3 * {c3}) % {FP_MOD})) % {FP_MOD} AS gh
  FROM leads WHERE tv3 IS NOT NULL
),
keyed AS (
  SELECT doc_id, pos, gh,
         COUNT(*) OVER (PARTITION BY doc_id) AS m,
         MIN(gh * {POSCAP} + ({POSCAP} - pos)) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS sel_key
  FROM grams
),
starts AS (
  SELECT doc_id, sel_key FROM keyed WHERE pos <= greatest(m - 4, 1)
),
winnowed AS (
  SELECT DISTINCT doc_id,
         {POSCAP} - (sel_key % {POSCAP}) AS pos,
         sel_key // {POSCAP} AS gh
  FROM starts
)"""


SQL_WINNOW_FINGERPRINT = (
    "WITH "
    + _winnow_cte("SELECT doc_id, text FROM documents")
    + "\nSELECT doc_id, pos, gh FROM winnowed"
)


def q_priority_sample(spark, sf_dir):
    """Duffield–Lund–Thorup priority sampling (operators/sampling.py):
    deterministic weighted k-sample, priority w·p/u from the integer LCG —
    multiply/divide only, so bit-identical cross-engine (no libm ln)."""
    from starchart_spark.operators import sampling

    docs = _t(spark, sf_dir, "documents").withColumn(
        "weight", (F.col("doc_id") % 19 + 1).cast("long")
    )
    return sampling.priority_sample(docs, 200, "weight").select(
        "doc_id", "lang", "weight", "priority"
    )


SQL_PRIORITY_SAMPLE = f"""
WITH p AS (
  SELECT doc_id, lang, (doc_id % 19 + 1) AS weight,
         (CAST(doc_id % 19 + 1 AS DOUBLE) * 2147483647.0)
           / CAST({_SEL_SQL.format(col="doc_id")} + 1 AS DOUBLE) AS priority
  FROM documents
)
SELECT doc_id, lang, weight, priority FROM p
ORDER BY priority DESC, doc_id LIMIT 200
"""


def q_trap_filter(spark, sf_dir):
    """Crawl-trap URL flags (operators/traps.py): depth / repeated-segment
    / session-id / calendar / long-query heuristics over a synthesized
    frontier exercising each family. One codegen'd projection, RE2∩Java
    regexes (the pii.py discipline)."""
    from starchart_spark.operators import traps

    frontier = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(
            "CASE doc_id % 8"
            " WHEN 0 THEN '/repo/alpha/src/main'"
            " WHEN 1 THEN '/a/b/c/d/e/f/g/h/i/j/k/l/m'"
            " WHEN 2 THEN '/x/y/x/z/x/q'"
            " WHEN 3 THEN '/2021/05/12/post'"
            " WHEN 4 THEN '/2020/2021/2022/events'"
            " WHEN 5 THEN '/9999/01/page'"
            " WHEN 6 THEN '/cal/a/b'"
            " ELSE '/repo/beta/readme' END"
        ).alias("path"),
        F.expr(
            "CASE doc_id % 8"
            " WHEN 6 THEN 'sessionid=AbC123&x=1'"
            " WHEN 7 THEN 'f=' || repeat('v', 130)"
            " ELSE 'q=' || doc_id END"
        ).alias("query"),
    )
    return traps.trap_flags(frontier).select(
        "doc_id", "trap_depth", "trap_repeat", "trap_session",
        "trap_calendar", "trap_longqs", "is_trap",
    )


def _sql_trap_filter() -> str:
    from starchart_spark.operators.traps import (
        MAX_DEPTH,
        MAX_QUERY,
        SESSION_RE,
        YEAR_RANGE_RE,
        YEAR_SEG_RE,
    )

    return f"""
WITH f AS (
  SELECT doc_id,
    CASE doc_id % 8
      WHEN 0 THEN '/repo/alpha/src/main'
      WHEN 1 THEN '/a/b/c/d/e/f/g/h/i/j/k/l/m'
      WHEN 2 THEN '/x/y/x/z/x/q'
      WHEN 3 THEN '/2021/05/12/post'
      WHEN 4 THEN '/2020/2021/2022/events'
      WHEN 5 THEN '/9999/01/page'
      WHEN 6 THEN '/cal/a/b'
      ELSE '/repo/beta/readme' END AS path,
    CASE doc_id % 8
      WHEN 6 THEN 'sessionid=AbC123&x=1'
      WHEN 7 THEN 'f=' || repeat('v', 130)
      ELSE 'q=' || doc_id END AS query
  FROM documents
),
s AS (
  SELECT doc_id, path, query,
         list_filter(string_split(path, '/'), seg -> seg <> '') AS segs
  FROM f
),
flags AS (
  SELECT doc_id,
    len(segs) > {MAX_DEPTH} AS trap_depth,
    len(list_filter(segs,
        seg -> len(list_filter(segs, x -> x = seg)) >= 3)) > 0 AS trap_repeat,
    regexp_matches(lower(query), '{SESSION_RE}') AS trap_session,
    len(list_filter(segs, seg -> regexp_matches(seg, '{YEAR_SEG_RE}'))) >= 2
      OR len(list_filter(segs,
             seg -> regexp_matches(seg, '{YEAR_RANGE_RE}'))) > 0 AS trap_calendar,
    length(query) > {MAX_QUERY} AS trap_longqs
  FROM s
)
SELECT doc_id, trap_depth, trap_repeat, trap_session, trap_calendar,
       trap_longqs,
       trap_depth OR trap_repeat OR trap_session OR trap_calendar
         OR trap_longqs AS is_trap
FROM flags
"""


SQL_TRAP_FILTER = _sql_trap_filter()


# engine-identical media-ref host/type derivations, shared by the
# media_frontier query below (crawl/engine.py discover_media + multimodal)
_MEDIA_HOST_RX = r"^[A-Za-z0-9+.\-]+://([^/:?#]+)"


def q_media_frontier(spark, sf_dir):
    """Interleaved media-frontier expansion as a standalone pipeline (the
    engine's discover_media path over synthesized spans): explode media
    spans → first sighting per ref (keep-first in crawl order) → host/type
    derivation → anti-join the seen set. Two media spans per doc: a shared
    CDN asset (doc_id%40 — heavy dedup) and an avatar (doc_id%175)."""
    from starchart_spark.operators import multimodal

    ext = F.expr(
        "CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'mp4' ELSE 'bin' END"
    )
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("https://cdn"), (F.col("doc_id") % 5).cast("string"),
            F.lit(".test/img/"), (F.col("doc_id") % 40).cast("string"),
            F.lit("."), ext,
        ).alias("ref1"),
        F.concat(
            F.lit("https://forge"), (F.col("doc_id") % 7).cast("string"),
            F.lit(".test/avatars/u"), (F.col("doc_id") % 175).cast("string"),
            F.lit(".png"),
        ).alias("ref2"),
    )
    sightings = docs.select(
        "doc_id", F.lit(1).alias("offset"), F.col("ref1").alias("media_ref")
    ).unionByName(
        docs.select("doc_id", F.lit(2).alias("offset"), F.col("ref2").alias("media_ref"))
    )
    first = dedup.keep_first(sightings, ["media_ref"], ["doc_id", "offset"])
    seen = (
        docs.filter(F.col("doc_id") % 40 < 10)
        .select(F.col("ref1").alias("media_ref"))
        .distinct()
    )
    return (
        first.join(seen, "media_ref", "left_anti")
        .select(
            "media_ref",
            F.lower(F.regexp_extract("media_ref", _MEDIA_HOST_RX, 1)).alias("hostname"),
            multimodal.media_type_col("media_ref").alias("media_type"),
            F.col("doc_id").alias("first_doc_id"),
        )
    )


SQL_MEDIA_FRONTIER = f"""
WITH d AS (
  SELECT doc_id,
    'https://cdn' || (doc_id % 5) || '.test/img/' || (doc_id % 40) || '.'
      || (CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'mp4' ELSE 'bin' END)
      AS ref1,
    'https://forge' || (doc_id % 7) || '.test/avatars/u' || (doc_id % 175)
      || '.png' AS ref2
  FROM documents
),
sightings AS (
  SELECT doc_id, 1 AS off, ref1 AS media_ref FROM d
  UNION ALL
  SELECT doc_id, 2 AS off, ref2 AS media_ref FROM d
),
first AS (
  SELECT media_ref, min(doc_id) AS first_doc_id
  FROM sightings GROUP BY media_ref
),
seen AS (
  SELECT DISTINCT ref1 AS media_ref FROM d WHERE doc_id % 40 < 10
)
SELECT f.media_ref,
  lower(regexp_extract(f.media_ref, '{_MEDIA_HOST_RX}', 1)) AS hostname,
  CASE lower(regexp_extract(f.media_ref, '\\.([a-zA-Z0-9]+)$', 1))
    WHEN 'png' THEN 'image' WHEN 'jpg' THEN 'image' WHEN 'jpeg' THEN 'image'
    WHEN 'gif' THEN 'image' WHEN 'webp' THEN 'image'
    WHEN 'mp3' THEN 'audio' WHEN 'ogg' THEN 'audio' WHEN 'wav' THEN 'audio'
    WHEN 'flac' THEN 'audio'
    WHEN 'mp4' THEN 'video' WHEN 'webm' THEN 'video' WHEN 'mkv' THEN 'video'
    WHEN 'avi' THEN 'video'
    ELSE 'unknown' END AS media_type,
  f.first_doc_id
FROM first f LEFT JOIN seen s USING (media_ref)
WHERE s.media_ref IS NULL
"""


def _interleave_spans_df(spark, sf_dir):
    """Deterministic interleaved span docs from documents, three layouts
    by doc_id % 3: media-FIRST (NULL before_text), media-LAST (NULL
    after_text), single-media-between. Shared by interleave_pairs and
    multimodal_budget so their oracles replay ONE synthesis."""
    docs = _t(spark, sf_dir, "documents")
    t1 = F.expr("substring(text, 1, cast(floor(n_chars / 2) as int))")
    t2 = F.expr("substring(text, cast(floor(n_chars / 2) as int) + 1)")
    ext = F.expr(
        "CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'mp4' ELSE 'bin' END"
    )
    ref1 = F.concat(
        F.lit("https://cdn"), (F.col("doc_id") % 5).cast("string"),
        F.lit(".test/img/"), (F.col("doc_id") % 40).cast("string"),
        F.lit("."), ext,
    )
    ref2 = F.concat(
        F.lit("https://forge"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".test/avatars/u"), (F.col("doc_id") % 175).cast("string"),
        F.lit(".png"),
    )

    def text_span(txt, off):
        return F.struct(
            F.lit("text").alias("kind"),
            txt.alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            F.lit(off).cast("int").alias("offset"),
        )

    def media_span(ref, off):
        return F.struct(
            F.lit("media").alias("kind"),
            F.lit(None).cast("string").alias("text"),
            ref.alias("media_ref"),
            F.lit(off).cast("int").alias("offset"),
        )

    spans = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.array(
                media_span(ref1, 0), text_span(t1, 1),
                media_span(ref2, 2), text_span(t2, 3),
            ),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.array(
                text_span(t1, 0), media_span(ref1, 1),
                text_span(t2, 2), media_span(ref2, 3),
            ),
        )
        .otherwise(
            F.array(text_span(t1, 0), text_span(t2, 1), media_span(ref1, 2))
        )
    )
    return docs.select("doc_id", spans.alias("spans"))


def q_interleave_pairs(spark, sf_dir):
    """OBELICS/MMC4-style media↔text context pairing over interleaved span
    docs (operators/interleave.py): per media span, the nearest preceding
    and following text spans plus position signals — one explode + one
    doc-keyed window exchange. The shared three-layout synthesis
    (_interleave_spans_df) verifies both boundary semantics and the
    interior case."""
    from starchart_spark.operators import interleave

    return interleave.media_text_pairs(_interleave_spans_df(spark, sf_dir))


SQL_INTERLEAVE_PAIRS = r"""
WITH d AS (
  SELECT doc_id,
    substr(text, 1, CAST(floor(n_chars / 2) AS INT)) AS t1,
    substr(text, CAST(floor(n_chars / 2) AS INT) + 1) AS t2,
    'https://cdn' || (doc_id % 5) || '.test/img/' || (doc_id % 40) || '.'
      || (CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'mp4' ELSE 'bin' END)
      AS ref1,
    'https://forge' || (doc_id % 7) || '.test/avatars/u' || (doc_id % 175)
      || '.png' AS ref2
  FROM documents
), spans AS (
  SELECT doc_id, 'media' AS kind, NULL AS text, ref1 AS media_ref, 0 AS off
    FROM d WHERE doc_id % 3 = 0
  UNION ALL SELECT doc_id, 'text', t1, NULL, 1 FROM d WHERE doc_id % 3 = 0
  UNION ALL SELECT doc_id, 'media', NULL, ref2, 2 FROM d WHERE doc_id % 3 = 0
  UNION ALL SELECT doc_id, 'text', t2, NULL, 3 FROM d WHERE doc_id % 3 = 0
  UNION ALL SELECT doc_id, 'text', t1, NULL, 0 FROM d WHERE doc_id % 3 = 1
  UNION ALL SELECT doc_id, 'media', NULL, ref1, 1 FROM d WHERE doc_id % 3 = 1
  UNION ALL SELECT doc_id, 'text', t2, NULL, 2 FROM d WHERE doc_id % 3 = 1
  UNION ALL SELECT doc_id, 'media', NULL, ref2, 3 FROM d WHERE doc_id % 3 = 1
  UNION ALL SELECT doc_id, 'text', t1, NULL, 0 FROM d WHERE doc_id % 3 = 2
  UNION ALL SELECT doc_id, 'text', t2, NULL, 1 FROM d WHERE doc_id % 3 = 2
  UNION ALL SELECT doc_id, 'media', NULL, ref1, 2 FROM d WHERE doc_id % 3 = 2
), ctx AS (
  SELECT doc_id, kind, media_ref, off AS "offset",
    last_value(CASE WHEN kind = 'text' THEN text END IGNORE NULLS)
      OVER (PARTITION BY doc_id ORDER BY off
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS before_text,
    first_value(CASE WHEN kind = 'text' THEN text END IGNORE NULLS)
      OVER (PARTITION BY doc_id ORDER BY off
            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS after_text,
    CAST(coalesce(sum(CASE WHEN kind = 'text' THEN 1 ELSE 0 END)
      OVER (PARTITION BY doc_id ORDER BY off
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS INT)
      AS n_text_before,
    CAST(sum(CASE WHEN kind = 'media' THEN 1 ELSE 0 END)
      OVER (PARTITION BY doc_id) AS INT) AS n_media_in_doc
  FROM spans
)
SELECT doc_id, media_ref, "offset", before_text, after_text,
       n_text_before, n_media_in_doc
FROM ctx WHERE kind = 'media'
"""


def q_multimodal_budget(spark, sf_dir):
    """Sequence-packing cost of interleaved docs
    (interleave.multimodal_token_costs): text tokens + 64 per media span
    (vision-encoder patch-token budgets are a model constant, known
    before any decode). Same three span layouts as interleave_pairs."""
    from starchart_spark.operators import interleave

    docs = _interleave_spans_df(spark, sf_dir)
    return interleave.multimodal_token_costs(docs, media_token_cost=64)


SQL_MULTIMODAL_BUDGET = r"""
WITH d AS (
  SELECT doc_id,
    substr(text, 1, CAST(floor(n_chars / 2) AS INT)) AS t1,
    substr(text, CAST(floor(n_chars / 2) AS INT) + 1) AS t2,
    'https://cdn' || (doc_id % 5) || '.test/img/' || (doc_id % 40) || '.'
      || (CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'mp4' ELSE 'bin' END)
      AS ref1,
    'https://forge' || (doc_id % 7) || '.test/avatars/u' || (doc_id % 175)
      || '.png' AS ref2
  FROM documents
), spans AS (
  SELECT doc_id, 'media' AS kind, NULL AS text FROM d WHERE doc_id % 3 = 0
  UNION ALL SELECT doc_id, 'text', t1 FROM d WHERE doc_id % 3 = 0
  UNION ALL SELECT doc_id, 'media', NULL FROM d WHERE doc_id % 3 = 0
  UNION ALL SELECT doc_id, 'text', t2 FROM d WHERE doc_id % 3 = 0
  UNION ALL SELECT doc_id, 'text', t1 FROM d WHERE doc_id % 3 = 1
  UNION ALL SELECT doc_id, 'media', NULL FROM d WHERE doc_id % 3 = 1
  UNION ALL SELECT doc_id, 'text', t2 FROM d WHERE doc_id % 3 = 1
  UNION ALL SELECT doc_id, 'media', NULL FROM d WHERE doc_id % 3 = 1
  UNION ALL SELECT doc_id, 'text', t1 FROM d WHERE doc_id % 3 = 2
  UNION ALL SELECT doc_id, 'text', t2 FROM d WHERE doc_id % 3 = 2
  UNION ALL SELECT doc_id, 'media', NULL FROM d WHERE doc_id % 3 = 2
)
SELECT doc_id,
  CAST(sum(CASE WHEN text IS NOT NULL THEN
    CASE WHEN trim(text) = '' THEN 0
         ELSE len(regexp_split_to_array(trim(text), '\s+')) END
    ELSE 0 END) AS BIGINT) AS n_text_tokens,
  CAST(sum(CASE WHEN kind = 'media' THEN 1 ELSE 0 END) AS BIGINT) AS n_media,
  CAST(sum(CASE WHEN text IS NOT NULL THEN
    CASE WHEN trim(text) = '' THEN 0
         ELSE len(regexp_split_to_array(trim(text), '\s+')) END
    ELSE 0 END)
   + 64 * sum(CASE WHEN kind = 'media' THEN 1 ELSE 0 END) AS BIGINT)
    AS mm_tokens
FROM spans GROUP BY doc_id
"""


def q_crawl_budget(spark, sf_dir):
    """PageRank → crawl-quota bridge (pqueue.allocate_budget): Hamilton
    largest-remainder apportionment of a 100k-fetch budget across hosts
    proportional to their exact-integer PageRank — Σbudget == total
    exactly; the whole composition (5 PR rounds + apportionment) is one
    integer program replayed verbatim by the oracle."""
    from starchart_spark.operators import graph, pqueue

    edges = _t(spark, sf_dir, "orders").select(
        F.concat(F.lit("h"), (F.col("o_custkey") % 37).cast("string")).alias("src"),
        F.concat(F.lit("h"), (F.col("o_orderkey") % 41).cast("string")).alias("dst"),
    ).distinct()
    ranks = graph.pagerank(edges, iters=5)
    return pqueue.allocate_budget(
        ranks, total=100_000, host_col="host", weight_col="rank_u"
    )


def _sql_crawl_budget() -> str:
    from starchart_spark.operators import graph

    body, final = graph.pagerank_cte(
        "SELECT DISTINCT 'h' || (o_custkey % 37) AS src,"
        " 'h' || (o_orderkey % 41) AS dst FROM orders",
        iters=5,
    )
    return f"""
WITH {body},
w AS (SELECT host, greatest(rank_u, 0) AS wv FROM {final}),
tot AS (SELECT coalesce(SUM(wv), 0) AS Wraw, COUNT(*) AS n FROM w),
eff AS (
  SELECT host,
         CASE WHEN (SELECT Wraw FROM tot) = 0 THEN 1 ELSE wv END AS we,
         CASE WHEN (SELECT Wraw FROM tot) = 0 THEN (SELECT n FROM tot)
              ELSE (SELECT Wraw FROM tot) END AS W
  FROM w
),
based AS (
  SELECT host, (100000 * we) // W AS base,
         (100000 * we) % W AS rem
  FROM eff
),
lo AS (SELECT 100000 - coalesce(SUM(base), 0) AS L FROM based),
ranked AS (
  SELECT host, base,
         row_number() OVER (ORDER BY rem DESC, host ASC) AS rr
  FROM based
)
SELECT host, base + (CASE WHEN rr <= (SELECT L FROM lo) THEN 1 ELSE 0 END)
         AS budget
FROM ranked
"""


SQL_CRAWL_BUDGET = _sql_crawl_budget()


def q_mirror_hosts(spark, sf_dir):
    """Mirror-host detection (winnow.mirror_hosts, Bharat & Broder 1999):
    every document is duplicated onto a second synthetic host family
    ('h<i>' originals, 'm<i>' mirrors, i = doc bucket) — winnowed
    fingerprint containment must recover exactly the (h<i>, m<i>) pairs
    at containment 1.0, and any incidental cross-host gram overlap stays
    under the 0.8 bar identically in both engines (exact longs, one IEEE
    division)."""
    from starchart_spark.operators import winnow

    docs = _t(spark, sf_dir, "documents")
    both = docs.select(
        (F.col("doc_id") * 2).alias("doc_id"), "text"
    ).unionByName(docs.select((F.col("doc_id") * 2 + 1).alias("doc_id"), "text"))
    fps = winnow.winnow_fingerprints(both, k=4, w=5, portable=True)
    hosted = fps.withColumn(
        "hostname",
        F.concat(
            F.when(F.col("doc_id") % 2 == 0, F.lit("h")).otherwise(F.lit("m")),
            F.expr("(doc_id div 2) % 10").cast("string"),
        ),
    )
    return winnow.mirror_hosts(hosted, min_shared=2, min_ratio=0.8)


SQL_MIRROR_HOSTS = (
    "WITH "
    + _winnow_cte(
        "SELECT doc_id * 2 AS doc_id, text FROM documents "
        "UNION ALL SELECT doc_id * 2 + 1 AS doc_id, text FROM documents"
    )
    + """,
hf AS (
  SELECT DISTINCT
    (CASE WHEN doc_id % 2 = 0 THEN 'h' ELSE 'm' END) || ((doc_id // 2) % 10)
      AS host,
    gh
  FROM winnowed
),
sizes AS (SELECT host, COUNT(*) AS n_fp FROM hf GROUP BY host),
shared AS (
  SELECT a.host AS a_host, b.host AS b_host, COUNT(*) AS shared_fps
  FROM hf a JOIN hf b USING (gh)
  WHERE a.host < b.host
  GROUP BY 1, 2
)
SELECT s.a_host, s.b_host, s.shared_fps,
       CAST(s.shared_fps AS DOUBLE) / CAST(least(sa.n_fp, sb.n_fp) AS DOUBLE)
         AS containment
FROM shared s
JOIN sizes sa ON sa.host = s.a_host
JOIN sizes sb ON sb.host = s.b_host
WHERE s.shared_fps >= 2
  AND CAST(s.shared_fps AS DOUBLE) / CAST(least(sa.n_fp, sb.n_fp) AS DOUBLE)
      >= 0.8
"""
)


def q_recrawl_schedule(spark, sf_dir):
    """Adaptive re-crawl TTLs (operators/recrawl.py, Cho & Garcia-Molina
    revisit policy in exact-integer rational form): one hash aggregate over
    a synthesized visit/change log — ttl = clamp(base·n div (changes+1)),
    next_due = last_visit + ttl."""
    from starchart_spark.operators import recrawl

    visits = _t(spark, sf_dir, "events").select(
        F.concat(F.lit("h"), (F.col("user_id") % 25).cast("string")).alias("hostname"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts"),
        (F.col("event_id") % 3 == 0).alias("changed"),
    )
    return recrawl.recrawl_schedule(
        visits, base_ttl=86_400_000, min_ttl=3_600_000, max_ttl=30 * 86_400_000
    )


SQL_RECRAWL_SCHEDULE = """
WITH v AS (
  SELECT 'h' || (user_id % 25) AS hostname, epoch_ms(ts) AS ts,
         (event_id % 3 = 0) AS changed
  FROM events
),
agg AS (
  SELECT hostname, COUNT(*) AS n_visits,
         SUM(CASE WHEN changed THEN 1 ELSE 0 END) AS n_changes,
         MAX(ts) AS last_ts
  FROM v GROUP BY hostname
)
SELECT hostname, n_visits, n_changes, last_ts,
  least(greatest(86400000 * n_visits // (n_changes + 1), 3600000),
        2592000000) AS ttl,
  last_ts + least(greatest(86400000 * n_visits // (n_changes + 1), 3600000),
                  2592000000) AS next_due
FROM agg
"""


def q_hll_distinct(spark, sf_dir):
    """Per-host HyperLogLog distinct-URL estimate (operators/sketch.py):
    7 synthetic hosts over orders, key = o_orderkey, b=12 (±1.6%). Emits
    the INTEGER sketch core (present registers, scaled harmonic sum) plus
    the raw estimate — exact longs end to end, one final division, so the
    oracle replays the identical program with no float-sum ordering or
    libm dependence."""
    from starchart_spark.operators import sketch

    b = 12
    m = 1 << b
    rmax = sketch.HASH_BITS - b + 1
    alpha_num = sketch.hll_alpha(m) * m * m * float(1 << rmax)
    hosts = _t(spark, sf_dir, "orders").select(
        F.concat(F.lit("h"), (F.col("o_custkey") % 7).cast("string")).alias(
            "hostname"
        ),
        F.col("o_orderkey").alias("key"),
    )
    regs = sketch.hll_registers(hosts, "key", ["hostname"], b=b, portable=True)
    s = sketch.hll_sum(regs, ["hostname"], b=b)
    return s.select(
        "hostname",
        "present",
        "s_int",
        (F.lit(alpha_num) / F.col("s_int").cast("double")).alias("raw_est"),
    )


def _sql_hll_distinct() -> str:
    from starchart_spark.operators import sketch

    b = 12
    m = 1 << b
    rest_bits = sketch.HASH_BITS - b
    rmax = rest_bits + 1
    alpha_num = sketch.hll_alpha(m) * m * m * float(1 << rmax)
    return f"""
WITH keyed AS (
  SELECT 'h' || (o_custkey % 7) AS hostname,
         (((((o_orderkey % 2147483647) * (o_orderkey % 2147483647))
            % 2147483647) * 1327217885 + (o_orderkey % 2147483647))
          % 2147483647) AS h
  FROM orders
),
split AS (
  SELECT hostname, h % {m} AS bucket,
         CAST((h - (h % {m})) / {m} AS BIGINT) AS rest
  FROM keyed
),
regs AS (
  SELECT hostname, bucket,
         MAX(CASE WHEN rest = 0 THEN {rmax}
                  ELSE {rmax} - length(bin(rest)) END) AS rho
  FROM split GROUP BY hostname, bucket
),
s AS (
  SELECT hostname, CAST(COUNT(*) AS BIGINT) AS present,
         SUM(CAST({1 << rmax} AS BIGINT) >> rho)
           + ({m} - COUNT(*)) * CAST({1 << rmax} AS BIGINT) AS s_int
  FROM regs GROUP BY hostname
)
SELECT hostname, present, s_int,
       {alpha_num!r} / CAST(s_int AS DOUBLE) AS raw_est
FROM s
"""


SQL_HLL_DISTINCT = _sql_hll_distinct()


def q_cms_hot_hosts(spark, sf_dir):
    """Count-min heavy hitters (operators/sketch.py): fetch traffic where
    every third order hits one of 5 hot hosts and the rest spread over
    997 — the sketch (d=4 × w=2048 cells, fixed size at any input scale)
    must surface every true heavy hitter (one-sided guarantee). Pure
    integer counts — exact oracle match."""
    from starchart_spark.operators import sketch

    traffic = _t(spark, sf_dir, "orders").select(
        F.when(
            F.col("o_orderkey") % 3 == 0, (F.col("o_custkey") % 5).cast("long")
        )
        .otherwise((F.col("o_custkey") % 997 + 100).cast("long"))
        .alias("host_key")
    )
    return sketch.cms_heavy_hitters(
        traffic, "host_key", threshold=500, d=4, w=2048, portable=True
    )


SQL_CMS_HOT_HOSTS = """
WITH traffic AS (
  SELECT CASE WHEN o_orderkey % 3 = 0 THEN o_custkey % 5
              ELSE o_custkey % 997 + 100 END AS host_key
  FROM orders
),
rows_dim AS (SELECT UNNEST([0, 1, 2, 3]) AS row),
hashed AS (
  SELECT host_key, row,
         ((((x * x) % 2147483647) * 1327217885 + x) % 2147483647) AS h
  FROM (
    SELECT host_key, row,
           ((host_key + row * 40503551) % 2147483647) AS x
    FROM traffic, rows_dim
  )
),
sketch AS (
  SELECT row, h % 2048 AS cell, COUNT(*) AS cnt
  FROM hashed GROUP BY row, h % 2048
),
cands AS (SELECT DISTINCT host_key FROM traffic),
probes AS (
  SELECT c.host_key, r.row,
         (((((((c.host_key + r.row * 40503551) % 2147483647)
              * ((c.host_key + r.row * 40503551) % 2147483647))
             % 2147483647) * 1327217885
            + ((c.host_key + r.row * 40503551) % 2147483647))
           % 2147483647) % 2048) AS cell
  FROM cands c, rows_dim r
),
est AS (
  SELECT p.host_key, MIN(COALESCE(s.cnt, 0)) AS est
  FROM probes p LEFT JOIN sketch s ON p.row = s.row AND p.cell = s.cell
  GROUP BY p.host_key
)
SELECT host_key, est FROM est WHERE est >= 500
"""


def q_hrw_shards(spark, sf_dir):
    """Rendezvous-hash shard assignment (operators/sketch.py): every
    distinct customer key mapped to one of 8 scheduler shards by
    highest-random-weight argmax — the stable host→worker map that moves
    only ~1/(n+1) of hosts on resize (mod-hashing moves (n−1)/n). Exact
    integer argmax — oracle replays the encoded-max program."""
    from starchart_spark.operators import sketch

    hosts = (
        _t(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("host_key"))
        .distinct()
    )
    return sketch.hrw_assign(hosts, 8, portable=True)


SQL_HRW_SHARDS = """
WITH hosts AS (SELECT DISTINCT o_custkey AS host_key FROM orders),
shards AS (SELECT UNNEST([0, 1, 2, 3, 4, 5, 6, 7]) AS s),
scored AS (
  SELECT host_key, s,
         ((((x * x) % 2147483647) * 1327217885 + x) % 2147483647) AS score
  FROM (
    SELECT host_key, s,
           ((host_key + s * 40503551) % 2147483647) AS x
    FROM hosts, shards
  )
),
enc AS (
  SELECT host_key, MAX(score * 8 + (7 - s)) AS e
  FROM scored GROUP BY host_key
)
SELECT host_key, CAST(7 - (e % 8) AS INTEGER) AS shard FROM enc
"""


def q_theta_distinct(spark, sf_dir):
    """Per-host theta/bottom-k distinct-URL estimate
    (sketch.theta_registers/theta_estimate): the set-ALGEBRA companion to
    hll_distinct — same 7-host keying so the two sketches are directly
    comparable. Emits the exact integer core (n_kept sample size, theta
    threshold) plus the KMV estimate (k−1)·P31/theta — ONE float division
    per group, so the oracle replays the identical integer program."""
    from starchart_spark.operators import sketch

    hosts = _t(spark, sf_dir, "orders").select(
        F.concat(F.lit("h"), (F.col("o_custkey") % 7).cast("string")).alias(
            "hostname"
        ),
        F.col("o_orderkey").alias("key"),
    )
    regs = sketch.theta_registers(hosts, "key", ["hostname"], portable=True)
    return sketch.theta_estimate(regs, ["hostname"])


_THETA_HASH = (
    "(((({x} % 2147483647) * ({x} % 2147483647)) % 2147483647)"
    " * 1327217885 + ({x} % 2147483647)) % 2147483647"
)

SQL_THETA_DISTINCT = f"""
WITH keyed AS (
  SELECT 'h' || (o_custkey % 7) AS hostname,
         {_THETA_HASH.format(x="o_orderkey")} AS h
  FROM orders
),
regs AS (
  SELECT hostname, h % 16384 AS bucket, MIN(h) AS minh
  FROM keyed GROUP BY 1, 2
),
vals AS (SELECT DISTINCT hostname, minh FROM regs),
rk AS (
  SELECT hostname, minh,
         row_number() OVER (PARTITION BY hostname ORDER BY minh) AS rn
  FROM vals
),
s AS (
  SELECT hostname, CAST(COUNT(*) AS BIGINT) AS n_kept,
         MAX(CASE WHEN rn = 256 THEN minh END) AS kth
  FROM rk WHERE rn <= 256 GROUP BY hostname
)
SELECT hostname, n_kept,
       CAST(COALESCE(kth, 2147483647) AS BIGINT) AS theta,
       CASE WHEN kth IS NULL THEN CAST(n_kept AS DOUBLE)
            ELSE 255.0 * 2147483647.0 / CAST(kth AS DOUBLE) END AS est
FROM s
"""


def q_theta_intersect(spark, sf_dir):
    """Theta-sketch set intersection (sketch.theta_intersect) — the
    question HLL cannot answer: |A ∩ B| of two URL-seen ledgers from
    ~KiB of state each. A = even order keys, B = keys ≡ 0 (mod 3), true
    overlap = keys ≡ 0 (mod 6) ≈ n/6; both sketches run in the SAMPLED
    regime at sf0.01 (theta < P31), so the gate pins the estimator path,
    not just the exhaustive shortcut."""
    from starchart_spark.operators import sketch

    orders = _t(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").alias("key")
    )
    b = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_orderkey").alias("key")
    )
    ra = sketch.theta_registers(a, "key", portable=True)
    rb = sketch.theta_registers(b, "key", portable=True)
    return sketch.theta_intersect(ra, rb)


SQL_THETA_INTERSECT = f"""
WITH a AS (SELECT o_orderkey AS key FROM orders WHERE o_orderkey % 2 = 0),
b AS (SELECT o_orderkey AS key FROM orders WHERE o_orderkey % 3 = 0),
ra AS (
  SELECT h % 16384 AS bucket, MIN(h) AS minh FROM (
    SELECT {_THETA_HASH.format(x="key")} AS h FROM a
  ) GROUP BY 1
),
rb AS (
  SELECT h % 16384 AS bucket, MIN(h) AS minh FROM (
    SELECT {_THETA_HASH.format(x="key")} AS h FROM b
  ) GROUP BY 1
),
rka AS (
  SELECT minh, row_number() OVER (ORDER BY minh) AS rn
  FROM (SELECT DISTINCT minh FROM ra)
),
rkb AS (
  SELECT minh, row_number() OVER (ORDER BY minh) AS rn
  FROM (SELECT DISTINCT minh FROM rb)
),
sa AS (SELECT MAX(CASE WHEN rn = 256 THEN minh END) AS kth FROM rka WHERE rn <= 256),
sb AS (SELECT MAX(CASE WHEN rn = 256 THEN minh END) AS kth FROM rkb WHERE rn <= 256),
th AS (
  SELECT CAST(LEAST(COALESCE(sa.kth, 2147483647),
                    COALESCE(sb.kth, 2147483647)) AS BIGINT) AS theta
  FROM sa, sb
),
common AS (
  SELECT x.minh FROM (SELECT minh FROM rka WHERE rn <= 256) x
  JOIN (SELECT minh FROM rkb WHERE rn <= 256) y USING (minh)
),
cnt AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS matches
  FROM common c, th t
  WHERE c.minh < t.theta OR t.theta = 2147483647
)
SELECT c.matches, t.theta,
       CASE WHEN t.theta = 2147483647 THEN CAST(c.matches AS DOUBLE)
            ELSE CAST(c.matches AS DOUBLE) * 2147483647.0
                 / CAST(t.theta AS DOUBLE) END AS est_inter
FROM cnt c, th t
"""


def q_shuffle_positions(spark, sf_dir):
    """Deterministic global corpus shuffle (pretraining data-order
    randomization): position = global rank by (LCG(doc_id, salt=epoch),
    doc_id). Reproducible on any cluster size/partitioning — unlike
    df.orderBy(rand()) — and a new epoch salt gives an independent order.
    The rank is the two-pass skew-proof ranker (range-partition, local
    rank, broadcast offsets), so a 10^10-doc corpus never sorts in one
    task; the expensive sort is the range partitioner's (parallel,
    balanced)."""
    from starchart_spark.operators import sampling, skew

    keyed = (
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .withColumn("__k", sampling.selector("doc_id", salt=1))
        .withColumn("__all", F.lit(1))
    )
    return skew.ranked_by_host(
        keyed, "__all", ["__k", "doc_id"], out_col="position"
    ).select("doc_id", "position")


SQL_SHUFFLE_POSITIONS = f"""
SELECT doc_id,
       row_number() OVER (
         ORDER BY {_SEL_SQL.format(col="(doc_id + 40503551)")}, doc_id
       ) AS position
FROM documents
"""


def q_latency_quantiles(spark, sf_dir):
    """Per-event-type p50/p99 from the mergeable log2 histogram
    (sketch.log2_histogram / histogram_quantile): ≤64 buckets per group
    however many events, quantiles as pure integer bucket upper bounds
    (the 2× log-histogram guarantee) — the fetch-latency telemetry shape
    for 10^10 fetches."""
    from starchart_spark.operators import sketch

    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.floor("value").cast("long").alias("v")
    )
    hist = sketch.log2_histogram(ev, "v", ["event_type"])
    p50 = sketch.histogram_quantile(hist, 500, ["event_type"], "p50_upper")
    p99 = sketch.histogram_quantile(hist, 990, ["event_type"], "p99_upper")
    return p50.join(p99, "event_type")


SQL_LATENCY_QUANTILES = """
WITH ev AS (
  SELECT event_type, CAST(floor(value) AS BIGINT) AS v FROM events
),
hist AS (
  SELECT event_type,
         CASE WHEN v <= 0 THEN 0 ELSE length(bin(v)) END AS hbucket,
         COUNT(*) AS cnt
  FROM ev GROUP BY 1, 2
),
cum AS (
  SELECT event_type, hbucket, cnt,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY hbucket
                        ROWS UNBOUNDED PRECEDING) AS c,
         SUM(cnt) OVER (PARTITION BY event_type) AS n
  FROM hist
),
q AS (
  SELECT event_type,
         MIN(CASE WHEN c >= (n * 500 + 999) // 1000 THEN hbucket END) AS b50,
         MIN(CASE WHEN c >= (n * 990 + 999) // 1000 THEN hbucket END) AS b99
  FROM cum GROUP BY event_type
)
SELECT event_type,
       (CAST(1 AS BIGINT) << b50) - 1 AS p50_upper,
       (CAST(1 AS BIGINT) << b99) - 1 AS p99_upper
FROM q
"""


def q_retry_backoff(spark, sf_dir):
    """Per-host truncated-binary retry backoff (recrawl.failure_backoff):
    fetch-attempt log synthesized from events ('error' = failure),
    next_attempt = last_ts + base·2^min(trailing_failures, cap) — exact
    shift arithmetic, two host-keyed aggregates, no window."""
    from starchart_spark.operators import recrawl

    attempts = _t(spark, sf_dir, "events").select(
        F.concat(F.lit("h"), (F.col("user_id") % 20).cast("string")).alias(
            "hostname"
        ),
        F.col("event_id").alias("ts"),
        (F.col("event_type") != "error").alias("ok"),
    )
    return recrawl.failure_backoff(attempts, base_ms=60_000, cap=10)


SQL_RETRY_BACKOFF = """
WITH attempts AS (
  SELECT 'h' || (user_id % 20) AS hostname, event_id AS ts,
         (event_type <> 'error') AS ok
  FROM events
),
per_host AS (
  SELECT hostname,
         MAX(CASE WHEN ok THEN ts END) AS last_ok,
         MAX(ts) AS last_ts
  FROM attempts GROUP BY hostname
),
fails AS (
  SELECT a.hostname, COUNT(*) AS f
  FROM attempts a JOIN per_host p ON a.hostname = p.hostname
  WHERE NOT a.ok AND (p.last_ok IS NULL OR a.ts > p.last_ok)
  GROUP BY a.hostname
)
SELECT p.hostname,
       CAST(COALESCE(f.f, 0) AS BIGINT) AS fails_since_ok,
       p.last_ts,
       p.last_ts + 60000 * (CAST(1 AS BIGINT)
         << CAST(least(COALESCE(f.f, 0), 10) AS INTEGER)) AS next_attempt
FROM per_host p LEFT JOIN fails f ON p.hostname = f.hostname
"""


def q_aimd_rate(spark, sf_dir):
    """Per-host AIMD crawl-rate controller (operators/aimd.py, Chiu &
    Jain 1989): additive increase on success, floor-halving on failure,
    folded over a synthesized fetch-attempt log with JVM higher-order
    functions — exact integers end to end, replayed in the oracle via
    DuckDB's list_reduce."""
    from starchart_spark.operators import aimd

    attempts = _t(spark, sf_dir, "events").select(
        F.concat(F.lit("h"), (F.col("user_id") % 20).cast("string")).alias(
            "hostname"
        ),
        F.col("event_id").alias("ts"),
        (F.col("event_type") != "error").alias("ok"),
    )
    return aimd.aimd_rates(
        attempts, r0_mu=1_000, add_mu=50, min_mu=10, max_mu=10_000
    )


SQL_AIMD_RATE = """
WITH a AS (
  SELECT 'h' || (user_id % 20) AS hostname, event_id AS ts,
         CASE WHEN event_type <> 'error' THEN CAST(50 AS BIGINT)
              ELSE CAST(-1 AS BIGINT) END AS step
  FROM events
),
agg AS (
  SELECT hostname, COUNT(*) AS n_attempts,
         CAST(SUM(CASE WHEN step < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_fails,
         list(step ORDER BY ts) AS steps
  FROM a GROUP BY hostname
),
folded AS (
  SELECT hostname, n_attempts, n_fails,
         list_reduce(list_prepend(CAST(1000 AS BIGINT), steps),
           (acc, x) -> CASE WHEN x >= 0 THEN acc + x ELSE acc // 2 END)
           AS rate_mu
  FROM agg
)
SELECT hostname, n_attempts, n_fails, rate_mu,
       CAST(least(greatest(rate_mu, 10), 10000) AS BIGINT) AS applied_mu
FROM folded
"""


def q_jain_fairness(spark, sf_dir):
    """Jain's fairness index over the AIMD controller's applied rates,
    grouped into 4 host cohorts — exact-rational (one hash aggregate;
    j_num/j_den BIGINTs, only the display quotient touches floats). The
    post-epoch scheduler diagnostic from the same Chiu & Jain line as
    the controller itself."""
    from starchart_spark.operators import aimd

    attempts = _t(spark, sf_dir, "events").select(
        F.concat(F.lit("h"), (F.col("user_id") % 20).cast("string")).alias(
            "hostname"
        ),
        F.col("event_id").alias("ts"),
        (F.col("event_type") != "error").alias("ok"),
    )
    rates = aimd.aimd_rates(
        attempts, r0_mu=1_000, add_mu=50, min_mu=10, max_mu=10_000
    ).withColumn(
        "grp", F.substring("hostname", 2, 10).cast("int") % 4
    )
    return aimd.jain_fairness(rates, value_col="applied_mu", by="grp")


SQL_JAIN_FAIRNESS = """
WITH a AS (
  SELECT 'h' || (user_id % 20) AS hostname, event_id AS ts,
         CASE WHEN event_type <> 'error' THEN CAST(50 AS BIGINT)
              ELSE CAST(-1 AS BIGINT) END AS step
  FROM events
),
agg AS (
  SELECT hostname, list(step ORDER BY ts) AS steps FROM a GROUP BY hostname
),
rates AS (
  SELECT hostname,
         CAST(least(greatest(
           list_reduce(list_prepend(CAST(1000 AS BIGINT), steps),
             (acc, x) -> CASE WHEN x >= 0 THEN acc + x ELSE acc // 2 END),
           10), 10000) AS BIGINT) AS applied_mu
  FROM agg
),
g AS (
  SELECT CAST(CAST(substr(hostname, 2) AS INTEGER) % 4 AS VARCHAR) AS scope,
         applied_mu
  FROM rates
),
f AS (
  SELECT scope, COUNT(*) AS n,
         CAST(SUM(applied_mu) AS BIGINT) AS sum_x,
         CAST(SUM(applied_mu * applied_mu) AS BIGINT) AS sum_x2
  FROM g GROUP BY scope
)
SELECT scope, n, sum_x, sum_x2,
       sum_x * sum_x AS j_num, n * sum_x2 AS j_den,
       CASE WHEN n * sum_x2 <= 0 THEN NULL
            ELSE round(CAST(sum_x * sum_x AS DOUBLE) / (n * sum_x2), 6)
       END AS fairness
FROM f
"""


def q_temperature_mixture(spark, sf_dir):
    """Temperature-flattened language mixture (packing.temperature_rates,
    Arivazhagan et al. 2019 / XLM-R style, alpha=0.5 so the weight is an
    IEEE-exact sqrt): one corpus aggregate, one strata-sized window —
    p ∝ total_tokens^0.5, integer targets from a 1M-token global budget."""
    from starchart_spark.operators import packing

    return packing.temperature_rates(
        _t(spark, sf_dir, "documents"),
        alpha=0.5,
        budget_tokens=1_000_000,
        strata_col="lang",
    )


SQL_TEMPERATURE_MIXTURE = r"""
WITH tok AS (
  SELECT lang AS strata,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END::BIGINT
           AS n_tokens
  FROM documents
), tot AS (
  SELECT strata, sum(n_tokens) AS total_tokens FROM tok GROUP BY strata
), w AS (
  SELECT strata, total_tokens, sqrt(CAST(total_tokens AS DOUBLE)) AS w
  FROM tot
), pp AS (
  SELECT strata, total_tokens, round(w / sum(w) OVER (), 6) AS p FROM w
)
SELECT strata, total_tokens, p,
       CAST(round(p * 1000000, 0) AS BIGINT) AS target_tokens,
       round(CASE WHEN total_tokens <= 0 THEN 0.0
             ELSE least(1.0, CAST(round(p * 1000000, 0) AS BIGINT) * 1.0
                             / total_tokens) END, 6) AS rate
FROM pp
"""


def q_mixture_pack(spark, sf_dir):
    """The pretraining last mile END TO END: temperature-flattened
    sampling (α=0.5, 10k-token global budget — every language really
    downsamples at both gate scales) feeding GPT-style sequence packing.
    Gates the COMPOSITION: the sampler's broadcast-rate scan predicate
    must hand the packer exactly the rows whose window cumsum the oracle
    replays."""
    from starchart_spark.operators import packing

    sampled = packing.temperature_sample(
        _t(spark, sf_dir, "documents"), alpha=0.5, budget_tokens=10_000
    )
    return packing.pack_sequences(sampled, context_len=512)


SQL_MIXTURE_PACK = rf"""
WITH tok AS (
  SELECT doc_id, lang, source,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END::BIGINT
           AS n_tokens
  FROM documents
), tot AS (
  SELECT lang, sum(n_tokens) AS total_tokens FROM tok GROUP BY lang
), w AS (
  SELECT lang, total_tokens, sqrt(CAST(total_tokens AS DOUBLE)) AS w
  FROM tot
), pp AS (
  SELECT lang, total_tokens, round(w / sum(w) OVER (), 6) AS p FROM w
), r AS (
  SELECT lang,
         CAST(trunc(
           round(CASE WHEN total_tokens <= 0 THEN 0.0
                 ELSE least(1.0,
                   CAST(round(p * 10000, 0) AS BIGINT) * 1.0 / total_tokens)
                 END, 6) * 2147483647) AS BIGINT) AS thresh
  FROM pp
), s AS (
  SELECT t.source, t.doc_id, t.n_tokens
  FROM tok t JOIN r USING (lang)
  WHERE {_SEL_SQL.format(col="t.doc_id")} < r.thresh
), c AS (
  SELECT source, doc_id, n_tokens,
         sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS start_off
  FROM s
)
SELECT source, start_off // 512 AS seq_id, count(*) AS n_docs,
       sum(n_tokens) AS n_tokens, min(doc_id) AS first_doc_id,
       max(doc_id) AS last_doc_id
FROM c GROUP BY source, start_off // 512
"""


def q_kmeans_centroids(spark, sf_dir):
    """Exact-integer distributed Lloyd k-means (operators/kmeans.py): 3
    rounds, k=8, over the embeddings corpus in BIGINT micro-units — the
    lm_score/pagerank discipline applied to clustering, so the SAME
    centroids come out on any partitioning or cluster size (each round is
    one fused assign+partial-update Arrow pass; the shuffle carries
    ≤ batches·k·d narrow rows). Long (cid, pos, c_u) output so the gate
    hashes plain integers."""
    from starchart_spark.operators import kmeans

    return kmeans.kmeans(_t(spark, sf_dir, "embeddings"), k=8, iters=3)


def _sql_kmeans_centroids() -> str:
    from starchart_spark.operators import kmeans

    return kmeans.kmeans_sql(
        "SELECT vec_id, embedding FROM embeddings", k=8, iters=3
    )


SQL_KMEANS_CENTROIDS = _sql_kmeans_centroids()


def q_kmeans_sizes(spark, sf_dir):
    """Cluster sizes after the same 3 exact-integer Lloyd rounds plus one
    final assignment pass (kmeans.train_and_assign) — the composition a
    deterministic curriculum-bucket / embedding-shard consumer runs. The
    oracle extends the SAME kmeans_cte unroller by one assignment round,
    so the recurrence cannot drift between the two entries."""
    from starchart_spark.operators import kmeans

    return kmeans.train_and_assign(_t(spark, sf_dir, "embeddings"), k=8, iters=3)


def _sql_kmeans_sizes() -> str:
    from starchart_spark.operators import kmeans

    return kmeans.kmeans_sizes_sql(
        "SELECT vec_id, embedding FROM embeddings", k=8, iters=3
    )


SQL_KMEANS_SIZES = _sql_kmeans_sizes()


def q_kmeans_farthest(spark, sf_dir):
    """Same exact-integer Lloyd recurrence under deterministic
    farthest-first seeding (Gonzalez k-center heuristic — the k-means++
    spread without RNG): seed 0 = smallest id, each next seed maximizes
    the min int64 distance to the chosen set, ties to lowest id. k−1
    seeding scans, each a broadcast + 1-row TakeOrdered."""
    from starchart_spark.operators import kmeans

    return kmeans.kmeans(
        _t(spark, sf_dir, "embeddings"), k=6, iters=2, seed="farthest"
    )


def _sql_kmeans_farthest() -> str:
    from starchart_spark.operators import kmeans

    return kmeans.kmeans_sql(
        "SELECT vec_id, embedding FROM embeddings", k=6, iters=2, seed="farthest"
    )


SQL_KMEANS_FARTHEST = _sql_kmeans_farthest()


_QUANT_QS = [0, 100, 250, 500, 750, 900, 990, 1000]


def q_doclen_quantiles(spark, sf_dir):
    """Exact global order statistics of document length (operators/
    stats.py): the corpus cut points a curation contract pins ("drop below
    p10", "cap at p99") computed EXACTLY via the skew-proof two-pass
    ordered_prefix ranker — no single task ever sorts the corpus, unlike
    row_number() over (order by v). Rank selection (no interpolation)
    keeps every returned value one the corpus contains, bit-identical on
    any partitioning; percentile_approx would move between runs."""
    from starchart_spark.operators import stats

    return stats.exact_quantiles(
        _t(spark, sf_dir, "documents"), "n_chars", _QUANT_QS
    )


def _sql_doclen_quantiles() -> str:
    from starchart_spark.operators import stats

    return stats.exact_quantiles_sql(
        "SELECT n_chars FROM documents", "n_chars", _QUANT_QS
    )


SQL_DOCLEN_QUANTILES = _sql_doclen_quantiles()


def q_charmass_quantiles(spark, sf_dir):
    """Exact MASS quantiles (stats.weighted_quantiles): the cut point a
    token-budget policy needs — "half the corpus CHARACTERS live in docs
    shorter than X" weights each doc by its length, not by 1 (long docs
    carry more mass, so the weighted p500 sits above the row p500). One
    ordered_prefix pass — its exclusive-prefix half does the work — plus
    a broadcast straddle join (exactly one row per target)."""
    from starchart_spark.operators import stats

    return stats.weighted_quantiles(
        _t(spark, sf_dir, "documents"), "n_chars", "n_chars", _QUANT_QS
    )


def _sql_charmass_quantiles() -> str:
    from starchart_spark.operators import stats

    return stats.weighted_quantiles_sql(
        "SELECT n_chars FROM documents", "n_chars", "n_chars", _QUANT_QS
    )


SQL_CHARMASS_QUANTILES = _sql_charmass_quantiles()


def q_length_buckets(spark, sf_dir):
    """Curriculum length buckets (stats.quantile_buckets): every document
    assigned the band between exact tercile cut points — the quantile
    CONSUMER composition (cut selection + bucket assignment gated
    together). Cuts fold to a one-row broadcast array; the bucket count
    is a codegen'd array filter on a second scan — zero extra shuffles."""
    from starchart_spark.operators import stats

    return stats.quantile_buckets(
        _t(spark, sf_dir, "documents").select("doc_id", "n_chars"),
        "n_chars",
        [250, 500, 750],
    )


def _sql_length_buckets() -> str:
    from starchart_spark.operators import stats

    return stats.quantile_buckets_sql(
        "SELECT doc_id, n_chars FROM documents", "n_chars", [250, 500, 750]
    )


SQL_LENGTH_BUCKETS = _sql_length_buckets()


def q_lang_quantiles(spark, sf_dir):
    """Per-language exact length quantiles (stats.group_quantiles): the
    stratified form a per-language curation policy consumes. Per-group
    ranks ride the skew-proof per-host ranker, so a dominant language
    (lang='en' at 90% share) spans many range partitions instead of
    serializing one task; counts are one map-side-combined aggregate."""
    from starchart_spark.operators import stats

    return stats.group_quantiles(
        _t(spark, sf_dir, "documents"), "lang", "n_chars", [250, 500, 750]
    )


def _sql_lang_quantiles() -> str:
    from starchart_spark.operators import stats

    return stats.group_quantiles_sql(
        "SELECT lang, n_chars FROM documents", "lang", "n_chars", [250, 500, 750]
    )


SQL_LANG_QUANTILES = _sql_lang_quantiles()


def q_lang_charmass_quantiles(spark, sf_dir):
    """Per-language exact MASS quantiles (stats.group_weighted_quantiles)
    — the per-language token-budget cut point ("half of en's characters
    sit in docs shorter than X"), completing the module's matrix
    (global/grouped × count/mass). One grouped_ordered_prefix pass
    (mega-group safe), one per-group total aggregate, and the straddle
    join on (grp, mass-range)."""
    from starchart_spark.operators import stats

    return stats.group_weighted_quantiles(
        _t(spark, sf_dir, "documents"), "lang", "n_chars", "n_chars",
        [250, 500, 750],
    )


def _sql_lang_charmass_quantiles() -> str:
    from starchart_spark.operators import stats

    return stats.group_weighted_quantiles_sql(
        "SELECT lang, n_chars FROM documents", "lang", "n_chars", "n_chars",
        [250, 500, 750],
    )


SQL_LANG_CHARMASS_QUANTILES = _sql_lang_charmass_quantiles()


def q_hop_distance(spark, sf_dir):
    """BFS crawl depth from the seed set (graph.hop_distance): exact hop
    counts on the ≤4-hop ball of a sparse orders-derived host graph
    (src = orderkey mod 251, dst = orderkey div 7 mod 251 — avg degree is
    low enough that 4 rounds leave part of the graph honestly absent,
    exercising the silent-beyond-the-ball contract). Two seeds so the
    min-over-seeds combine is live. Joins pqueue as a priority column
    exactly like pagerank/opic."""
    from starchart_spark.operators import graph

    edges = (
        _t(spark, sf_dir, "orders")
        .select(
            F.concat(
                F.lit("h"), (F.col("o_orderkey") % 251).cast("string")
            ).alias("src"),
            F.concat(
                F.lit("h"),
                (F.expr("o_orderkey div 7") % 251).cast("string"),
            ).alias("dst"),
        )
        .distinct()
    )
    seeds = spark.createDataFrame([("h0",), ("h17",)], "host string")
    return graph.hop_distance(edges, seeds, max_hops=4)


def _sql_hop_distance() -> str:
    from starchart_spark.operators import graph

    return graph.hop_distance_sql(
        "SELECT DISTINCT 'h' || (o_orderkey % 251) AS src,"
        " 'h' || ((o_orderkey // 7) % 251) AS dst FROM orders",
        "SELECT 'h0' AS host UNION ALL SELECT 'h17' AS host",
        max_hops=4,
    )


SQL_HOP_DISTANCE = _sql_hop_distance()


def q_crawl_priority(spark, sf_dir):
    """Composed scheduler priority (graph.crawl_priority): PageRank
    authority discounted by BFS seed distance — rank_u div (1 + hops),
    beyond-the-4-hop-ball hosts discounted at max_hops+1. Gates that
    pagerank_cte and hop_distance_cte COMPOSE in one plan/oracle (the
    revisit_plan discipline applied to the frontier's priority column),
    over the same sparse orders graph + seeds as hop_distance."""
    from starchart_spark.operators import graph

    edges = (
        _t(spark, sf_dir, "orders")
        .select(
            F.concat(
                F.lit("h"), (F.col("o_orderkey") % 251).cast("string")
            ).alias("src"),
            F.concat(
                F.lit("h"),
                (F.expr("o_orderkey div 7") % 251).cast("string"),
            ).alias("dst"),
        )
        .distinct()
    )
    seeds = spark.createDataFrame([("h0",), ("h17",)], "host string")
    return graph.crawl_priority(edges, seeds, pr_iters=3, max_hops=4)


def _sql_crawl_priority() -> str:
    from starchart_spark.operators import graph

    return graph.crawl_priority_sql(
        "SELECT DISTINCT 'h' || (o_orderkey % 251) AS src,"
        " 'h' || ((o_orderkey // 7) % 251) AS dst FROM orders",
        "SELECT 'h0' AS host UNION ALL SELECT 'h17' AS host",
        pr_iters=3,
        max_hops=4,
    )


SQL_CRAWL_PRIORITY = _sql_crawl_priority()


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    # crawl-core (SURVEY.md §2)
    "frontier_scan": (q_frontier_scan, SQL_FRONTIER_SCAN),
    "url_canonicalize": (q_url_canonicalize, SQL_URL_CANONICALIZE),
    "hostname_extract": (q_hostname_extract, SQL_HOSTNAME_EXTRACT),
    "seen_anti_join": (q_seen_anti_join, SQL_SEEN_ANTI_JOIN),
    "keep_first_window": (q_keep_first_window, SQL_KEEP_FIRST_WINDOW),
    "in_batch_tag_dedup": (q_in_batch_tag_dedup, SQL_IN_BATCH_TAG_DEDUP),
    "collect_topics": (q_collect_topics, SQL_COLLECT_TOPICS),
    "broadcast_dims_join": (q_broadcast_dims_join, SQL_BROADCAST_DIMS_JOIN),
    "three_way_join": (q_three_way_join, SQL_THREE_WAY_JOIN),
    "merge_insert_new_keys": (q_merge_insert_new_keys, SQL_MERGE_INSERT_NEW_KEYS),
    "mini_index": (q_mini_index, SQL_MINI_INDEX),
    "sliding_limiter": (q_sliding_limiter, SQL_SLIDING_LIMITER),
    "politeness_slots": (q_politeness_slots, SQL_POLITENESS_SLOTS),
    "deferred_by_budget": (q_deferred_by_budget, SQL_DEFERRED_BY_BUDGET),
    "pagination_slice": (q_pagination_slice, SQL_PAGINATION_SLICE),
    "wildcard_search": (q_wildcard_search, SQL_WILDCARD_SEARCH),
    "search_users": (q_search_users, SQL_SEARCH_USERS),
    "search_topics": (q_search_topics, SQL_SEARCH_TOPICS),
    "empty_is_none": (q_empty_is_none, SQL_EMPTY_IS_NONE),
    "props_parse": (q_props_parse, SQL_PROPS_PARSE),
    "txt_consent": (q_txt_consent, SQL_TXT_CONSENT),
    "robots_gate": (q_robots_gate, SQL_ROBOTS_GATE),
    "robots_crawl_delay": (q_robots_crawl_delay, SQL_ROBOTS_CRAWL_DELAY),
    "robots_sitemap_refs": (q_robots_sitemap_refs, SQL_ROBOTS_SITEMAP_REFS),
    "robots_refresh": (q_robots_refresh, SQL_ROBOTS_REFRESH),
    "host_template_strip": (q_host_template_strip, SQL_HOST_TEMPLATE_STRIP),
    "priority_queue": (q_priority_queue, SQL_PRIORITY_QUEUE),
    "epoch_days": (q_epoch_days, SQL_EPOCH_DAYS),
    "topk_orders": (q_topk_orders, SQL_TOPK_ORDERS),
    "union_distinct": (q_union_distinct, SQL_UNION_DISTINCT),
    "two_phase_count": (q_two_phase_count, SQL_TWO_PHASE_COUNT),
    # training-data pipeline
    "exact_dedup": (q_exact_dedup, SQL_EXACT_DEDUP),
    "ngram_jaccard_dupes": (q_ngram_jaccard_dupes, SQL_NGRAM_JACCARD_DUPES),
    "ngram_jaccard_prefix": (q_ngram_jaccard_prefix, SQL_NGRAM_JACCARD_PREFIX),
    "dup_clusters": (q_dup_clusters, SQL_DUP_CLUSTERS),
    "normalize_text": (q_normalize_text, SQL_NORMALIZE_TEXT),
    "sample_fraction": (q_sample_fraction, SQL_SAMPLE_FRACTION),
    "sample_stratified": (q_sample_stratified, SQL_SAMPLE_STRATIFIED),
    "sample_topk": (q_sample_topk, SQL_SAMPLE_TOPK),
    "minhash_lsh_dupes": (q_minhash_lsh_dupes, SQL_MINHASH_LSH_DUPES),
    "simhash_dupes": (q_simhash_dupes, None),
    "token_count": (q_token_count, SQL_TOKEN_COUNT),
    "quality_features": (q_quality_features, SQL_QUALITY_FEATURES),
    "lang_id": (q_lang_id, SQL_LANG_ID),
    "fingerprint": (q_fingerprint, SQL_FINGERPRINT),
    "embedding_topk": (q_embedding_topk, SQL_EMBEDDING_TOPK),
    "embedding_topk_joined": (q_embedding_topk_joined, SQL_EMBEDDING_TOPK),
    "cosine_pairs": (q_cosine_pairs, SQL_COSINE_PAIRS),
    "cosine_pairs_lsh": (q_cosine_pairs_lsh, SQL_COSINE_PAIRS_LSH),
    "ann_lsh_topk": (q_ann_lsh_topk, None),
    "ann_ivf_topk": (q_ann_ivf_topk, SQL_EMBEDDING_TOPK),
    "ann_pq_topk": (q_ann_pq_topk, SQL_EMBEDDING_TOPK),
    "media_type_dispatch": (q_media_type_dispatch, SQL_MEDIA_TYPE_DISPATCH),
    "repetition_ratios": (q_repetition_ratios, SQL_REPETITION_RATIOS),
    "contamination_hits": (q_contamination_hits, SQL_CONTAMINATION_HITS),
    "boilerplate_coverage": (q_boilerplate_coverage, SQL_BOILERPLATE_COVERAGE),
    "curated_corpus": (q_curated_corpus, SQL_CURATED_CORPUS),
    "pii_scrub": (q_pii_scrub, SQL_PII_SCRUB),
    "sessionize": (q_sessionize, SQL_SESSIONIZE),
    "pack_sequences": (q_pack_sequences, SQL_PACK_SEQUENCES),
    "mixture_sample": (q_mixture_sample, SQL_MIXTURE_SAMPLE),
    "temperature_mixture": (q_temperature_mixture, SQL_TEMPERATURE_MIXTURE),
    "mixture_pack": (q_mixture_pack, SQL_MIXTURE_PACK),
    "quality_buckets": (q_quality_buckets, SQL_QUALITY_BUCKETS),
    "paragraph_dedup": (q_paragraph_dedup, SQL_PARAGRAPH_DEDUP),
    "dsir_weights": (q_dsir_weights, SQL_DSIR_WEIGHTS),
    "semantic_dedup": (q_semantic_dedup, SQL_SEMANTIC_DEDUP),
    "semantic_dedup_scale": (q_semantic_dedup_scale, SQL_SEMANTIC_DEDUP_SCALE),
    "lm_score": (q_lm_score, SQL_LM_SCORE),
    "lm_kn_score": (q_lm_kn_score, SQL_LM_KN_SCORE),
    "bpe_pair_counts": (q_bpe_pair_counts, SQL_BPE_PAIR_COUNTS),
    "cache_policy": (q_cache_policy, SQL_CACHE_POLICY),
    "unimax_mixture": (q_unimax_mixture, SQL_UNIMAX_MIXTURE),
    "cdc_dedup": (q_cdc_dedup, SQL_CDC_DEDUP),
    "phrase_search": (q_phrase_search, SQL_PHRASE_SEARCH),
    "proximity_search": (q_proximity_search, SQL_PROXIMITY_SEARCH),
    "substring_dedup": (q_substring_dedup, SQL_SUBSTRING_DEDUP),
    "suffix_array": (q_suffix_array, SQL_SUFFIX_ARRAY),
    "repeated_prefix": (q_repeated_prefix, SQL_REPEATED_PREFIX),
    "repeated_spans": (q_repeated_spans, SQL_REPEATED_SPANS),
    "nb_classify": (q_nb_classify, SQL_NB_CLASSIFY),
    "vocab_encode": (q_vocab_encode, SQL_VOCAB_ENCODE),
    "bm25_rank": (q_bm25_rank, SQL_BM25_RANK),
    "asof_join": (q_asof_join, SQL_ASOF_JOIN),
    "range_join": (q_range_join, SQL_RANGE_JOIN),
    "kmeans_centroids": (q_kmeans_centroids, SQL_KMEANS_CENTROIDS),
    "kmeans_sizes": (q_kmeans_sizes, SQL_KMEANS_SIZES),
    "kmeans_farthest": (q_kmeans_farthest, SQL_KMEANS_FARTHEST),
    "doclen_quantiles": (q_doclen_quantiles, SQL_DOCLEN_QUANTILES),
    "charmass_quantiles": (q_charmass_quantiles, SQL_CHARMASS_QUANTILES),
    "length_buckets": (q_length_buckets, SQL_LENGTH_BUCKETS),
    "lang_quantiles": (q_lang_quantiles, SQL_LANG_QUANTILES),
    "lang_charmass_quantiles": (
        q_lang_charmass_quantiles,
        SQL_LANG_CHARMASS_QUANTILES,
    ),
    "hop_distance": (q_hop_distance, SQL_HOP_DISTANCE),
    "crawl_priority": (q_crawl_priority, SQL_CRAWL_PRIORITY),
    "host_pagerank": (q_host_pagerank, SQL_HOST_PAGERANK),
    "opic_scores": (q_opic_scores, SQL_OPIC_SCORES),
    "host_hits": (q_host_hits, SQL_HOST_HITS),
    "trust_rank": (q_trust_rank, SQL_TRUST_RANK),
    "site_rollup": (q_site_rollup, SQL_SITE_ROLLUP),
    "anchor_terms": (q_anchor_terms, SQL_ANCHOR_TERMS),
    "sitemap_parse": (q_sitemap_parse, SQL_SITEMAP_PARSE),
    "sitemap_recrawl_delta": (q_sitemap_recrawl_delta, SQL_SITEMAP_RECRAWL_DELTA),
    "deep_url_dedup": (q_deep_url_dedup, SQL_DEEP_URL_DEDUP),
    "redirect_resolve": (q_redirect_resolve, SQL_REDIRECT_RESOLVE),
    "dust_params": (q_dust_params, SQL_DUST_PARAMS),
    "winnow_fingerprint": (q_winnow_fingerprint, SQL_WINNOW_FINGERPRINT),
    "priority_sample": (q_priority_sample, SQL_PRIORITY_SAMPLE),
    "trap_filter": (q_trap_filter, SQL_TRAP_FILTER),
    "media_frontier": (q_media_frontier, SQL_MEDIA_FRONTIER),
    "interleave_pairs": (q_interleave_pairs, SQL_INTERLEAVE_PAIRS),
    "multimodal_budget": (q_multimodal_budget, SQL_MULTIMODAL_BUDGET),
    "recrawl_schedule": (q_recrawl_schedule, SQL_RECRAWL_SCHEDULE),
    "revisit_plan": (q_revisit_plan, SQL_REVISIT_PLAN),
    "mirror_hosts": (q_mirror_hosts, SQL_MIRROR_HOSTS),
    "crawl_budget": (q_crawl_budget, SQL_CRAWL_BUDGET),
    "hll_distinct": (q_hll_distinct, SQL_HLL_DISTINCT),
    "cms_hot_hosts": (q_cms_hot_hosts, SQL_CMS_HOT_HOSTS),
    "hrw_shards": (q_hrw_shards, SQL_HRW_SHARDS),
    "theta_distinct": (q_theta_distinct, SQL_THETA_DISTINCT),
    "theta_intersect": (q_theta_intersect, SQL_THETA_INTERSECT),
    "shuffle_positions": (q_shuffle_positions, SQL_SHUFFLE_POSITIONS),
    "latency_quantiles": (q_latency_quantiles, SQL_LATENCY_QUANTILES),
    "retry_backoff": (q_retry_backoff, SQL_RETRY_BACKOFF),
    "aimd_rate": (q_aimd_rate, SQL_AIMD_RATE),
    "jain_fairness": (q_jain_fairness, SQL_JAIN_FAIRNESS),
    # federation surface (round 2: S8/S11/J6/S12 driver-gated)
    "publiccode_roundtrip": (q_publiccode_roundtrip, SQL_PUBLICCODE_ROUNDTRIP),
    "mini_index_targeting": (q_mini_index_targeting, SQL_MINI_INDEX_TARGETING),
    "import_forges_dedup": (q_import_forges_dedup, SQL_IMPORT_FORGES_DEDUP),
}
