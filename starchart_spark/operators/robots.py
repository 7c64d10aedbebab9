"""robots.txt (RFC 9309) parsing and per-URL gating, Spark-first.

The north rule names "robots" alongside the consent gate: the reference's
opt-in model (DNS TXT, src/verify.rs:44-70) decides *whether* a host may be
crawled at all; robots.txt decides *which paths* on a consenting host may be
fetched and (via the de-facto ``crawl-delay`` directive) how fast. This
module supplies the second half:

- :func:`parse_robots` / :func:`parse_crawl_delay` — RFC 9309 §2.2 group
  parsing as **pure-JVM DataFrame ops** (split → posexplode → window cumsum
  for group ids → aggregate group-matching). robots bodies are one row per
  HOST — dim-scale, millions of rows at worst — so the explode/window here
  never touches frontier volume, and because every step is relational the
  *identical formulation* runs in DuckDB as the driver-gate oracle (a real
  dual-engine parse parity check, not a closed-form inversion).
- :func:`compile_rules` — pattern → anchored regex translation (``*`` →
  ``.*``, trailing ``$`` → anchor) through a literal replace chain kept
  inside the Java∩RE2 regex subset (the pii.py portability rule), plus an
  ``is_plain`` flag so the overwhelmingly-common wildcard-free rule matches
  by ``startswith`` inside whole-stage codegen, never regex.
- :func:`rules_dim` / :func:`robots_gate` — per-host rules collapsed to one
  array row, broadcast onto the frontier, and decided per URL with ONE
  zero-shuffle projection: ``array_max`` over ``struct(match_len, allow)``
  implements RFC 9309 longest-match-wins with the allow-on-tie rule for
  free (struct ordering is lexicographic; ``true > false``). No rule
  matched / no rules for host / host absent ⇒ allowed (RFC: 404 ⇒
  unrestricted).
- :func:`merge_crawl_delay` — host-level ``greatest(consent rate,
  crawl-delay)`` so the politeness token bucket honors whichever is slower.

Scale shape: the only per-URL work is the broadcast hash join plus an array
fold over a handful of per-host rules — no shuffle, no Python, no regex on
the fast path. At 10^10 URLs the gate rides the same single stage as the
canonicalize/bloom projections.

Subset note (documented, deliberate): user-agent group selection is
exact-product-token vs ``*`` (RFC 9309 §2.2.1); the Google extension of
longest-prefix agent matching is out of scope. Only ``allow`` /
``disallow`` / ``crawl-delay`` directives are honored; empty-pattern rules
match nothing per RFC and are dropped at parse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# regex metacharacters escaped by the pattern → regex translation. ``*`` is
# deliberately absent (it is the robots wildcard, translated to ``.*``);
# backslash must be first so later escapes are not double-escaped.
_ESCAPES = ["\\", ".", "+", "?", "(", ")", "[", "]", "{", "}", "|", "^", "$"]


def _directive_lines(
    robots: DataFrame, host_col: str, body_col: str
) -> DataFrame:
    """body → one row per recognized directive line, with its group id.

    Group boundary (RFC 9309 §2.2): a ``user-agent`` line whose predecessor
    is not a ``user-agent`` line starts a new group (consecutive UA lines
    share one group header). Lines before any UA line get group id 0, which
    never carries a user-agent and therefore never matches — RFC's
    "rules outside a group are ignored" falls out for free.
    """
    lines = robots.select(
        F.col(host_col).alias("hostname"),
        F.posexplode(F.split(F.col(body_col), "\n")).alias("pos", "raw"),
    )

    # Spark's trim() strips spaces only — directive lines indented with tabs
    # must strip ALL whitespace (and DuckDB's trim matches Spark's space-only
    # behavior, so the regexp strip keeps both engines identical).
    def _strip(c):
        return F.regexp_replace(c, r"^\s+|\s+$", "")

    clean = _strip(F.regexp_replace(F.col("raw"), "#.*", ""))
    fielded = lines.select(
        "hostname",
        "pos",
        F.lower(_strip(F.regexp_extract(clean, "^([^:]+):", 1))).alias("field"),
        _strip(F.regexp_extract(clean, "^[^:]+:(.*)$", 1)).alias("value"),
    ).filter(F.col("field").isin("user-agent", "allow", "disallow", "crawl-delay"))
    w = Window.partitionBy("hostname").orderBy("pos")
    is_new = (
        (F.col("field") == "user-agent")
        & (F.coalesce(F.lag("field").over(w), F.lit("")) != "user-agent")
    ).cast("int")
    return fielded.withColumn(
        "gid",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def _chosen_directives(
    robots: DataFrame,
    user_agent: str,
    host_col: str = "hostname",
    body_col: str = "robots_txt",
) -> DataFrame:
    """Directive lines of the group(s) RFC 9309 selects for ``user_agent``.

    A group matches specifically if any of its UA tokens equals ours
    (case-insensitive); hosts with ≥1 specific group use ONLY those groups,
    otherwise the ``*`` groups apply. Multiple groups with the same
    selection merge (RFC: combinable groups).
    """
    d = _directive_lines(robots, host_col, body_col)
    wg = Window.partitionBy("hostname", "gid")
    wh = Window.partitionBy("hostname")
    is_ua = F.col("field") == "user-agent"
    g_specific = F.max(
        (is_ua & (F.lower(F.col("value")) == user_agent.lower())).cast("int")
    ).over(wg)
    g_wild = F.max((is_ua & (F.col("value") == "*")).cast("int")).over(wg)
    h_specific = F.max(g_specific).over(wh)
    return (
        d.withColumn("__g_spec", g_specific)
        .withColumn("__g_wild", g_wild)
        .withColumn("__h_spec", h_specific)
        .filter(
            (F.col("__g_spec") == 1)
            | ((F.col("__h_spec") == 0) & (F.col("__g_wild") == 1))
        )
        .drop("__g_spec", "__g_wild", "__h_spec")
    )


def parse_robots(
    robots: DataFrame,
    user_agent: str,
    host_col: str = "hostname",
    body_col: str = "robots_txt",
) -> DataFrame:
    """(hostname, robots_txt) → (hostname, pos, allow, pattern) rules.

    Only the chosen group's allow/disallow lines survive; empty patterns
    match nothing (RFC 9309 §2.2.2) and are dropped here.
    """
    return (
        _chosen_directives(robots, user_agent, host_col, body_col)
        .filter(F.col("field").isin("allow", "disallow") & (F.col("value") != ""))
        .select(
            "hostname",
            "pos",
            (F.col("field") == "allow").alias("allow"),
            F.col("value").alias("pattern"),
        )
    )


def parse_crawl_delay(
    robots: DataFrame,
    user_agent: str,
    host_col: str = "hostname",
    body_col: str = "robots_txt",
) -> DataFrame:
    """(hostname, crawl_delay_ms) from the chosen group, most-conservative
    (max) when repeated; non-numeric values are ignored via try-cast."""
    return (
        _chosen_directives(robots, user_agent, host_col, body_col)
        .filter(F.col("field") == "crawl-delay")
        .withColumn("__secs", F.col("value").try_cast("double"))
        .filter(F.col("__secs").isNotNull())
        .groupBy("hostname")
        .agg((F.max("__secs") * 1000).cast("long").alias("crawl_delay_ms"))
    )


def parse_sitemap_refs(
    robots: DataFrame,
    host_col: str = "hostname",
    body_col: str = "robots_txt",
) -> DataFrame:
    """(hostname, sitemap_url) — ``Sitemap:`` reference mining, the
    standard discovery handoff from robots.txt to the sitemap channel
    (operators/sitemaps.py ingests what these point at).

    ``Sitemap`` is the sitemaps.org extension record, NOT an RFC 9309
    group directive: it is valid anywhere in the file and global to the
    host, so this parse deliberately ignores group structure (no window —
    one explode + filter + distinct). Field matching is case-insensitive;
    the VALUE keeps its case (it is a URL). The field regex splits at the
    first colon, so the ``https://`` in the value survives intact.
    Repeated identical lines collapse via the distinct; a host may
    legitimately list many different sitemaps (one row each)."""
    lines = robots.select(
        F.col(host_col).alias("hostname"),
        F.explode(F.split(F.col(body_col), "\n")).alias("raw"),
    )

    def _strip(c):
        return F.regexp_replace(c, r"^\s+|\s+$", "")

    clean = _strip(F.regexp_replace(F.col("raw"), "#.*", ""))
    return (
        lines.select(
            "hostname",
            F.lower(_strip(F.regexp_extract(clean, "^([^:]+):", 1))).alias(
                "field"
            ),
            _strip(F.regexp_extract(clean, "^[^:]+:(.*)$", 1)).alias(
                "sitemap_url"
            ),
        )
        .filter((F.col("field") == "sitemap") & (F.col("sitemap_url") != ""))
        .select("hostname", "sitemap_url")
        .distinct()
    )


def compile_rules(rules: DataFrame, pattern_col: str = "pattern") -> DataFrame:
    """Add (plen, is_plain, rx) to a rules frame.

    ``plen`` is the RFC 9309 match-length tiebreak key (octets of the
    pattern). ``is_plain`` rules (no ``*``, no trailing ``$`` anchor) match
    by prefix — the codegen fast path. The regex for the rest anchors at
    ``^``, maps ``*`` → ``.*`` and keeps a trailing ``$`` as the
    end-anchor; every metachar escape is a literal replace, so the emitted
    regex stays inside the Java∩RE2 subset and the DuckDB oracle can apply
    the same chain.
    """
    p = F.col(pattern_col)
    anchored = p.endswith("$")
    base = F.when(anchored, F.expr(f"substring({pattern_col}, 1, length({pattern_col}) - 1)")).otherwise(p)
    esc = base
    for ch in _ESCAPES:
        esc = F.replace(esc, F.lit(ch), F.lit("\\" + ch))
    rx = F.concat(
        F.lit("^"),
        F.replace(esc, F.lit("*"), F.lit(".*")),
        F.when(anchored, F.lit("$")).otherwise(F.lit("")),
    )
    is_plain = ~p.contains("*") & ~anchored
    return (
        rules.withColumn("plen", F.length(p))
        .withColumn("is_plain", is_plain)
        .withColumn("rx", rx)
    )


def rules_dim(rules: DataFrame, host_col: str = "hostname") -> DataFrame:
    """Collapse compiled rules to ONE row per host carrying the rule array —
    the broadcastable shape :func:`robots_gate` consumes. Sorted by pos for
    determinism (the fold result is order-independent; the stored plan
    isn't)."""
    return rules.groupBy(host_col).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("pos"), F.col("plen"), F.col("allow"), F.col("is_plain"),
                    F.col("pattern"), F.col("rx"),
                )
            )
        ).alias("robots_rules")
    )


def robots_gate(
    frontier: DataFrame,
    dim: DataFrame,
    path_col: str = "path",
    host_col: str = "hostname",
    out_col: str = "robots_allowed",
) -> DataFrame:
    """Per-URL RFC 9309 decision as ONE broadcast join + ONE projection.

    For each URL: rules that match the path (prefix test for plain rules,
    anchored regex otherwise) are reduced with ``array_max`` over
    ``struct(plen, allow)`` — longest match wins, tie prefers allow. Empty
    match set or host without robots ⇒ allowed.
    """
    path = F.col(path_col)

    def _matches(r):
        return F.when(r["is_plain"], path.startswith(r["pattern"])).otherwise(
            F.regexp_like(path, r["rx"])
        )

    best = F.array_max(
        F.transform(
            F.filter(F.coalesce(F.col("robots_rules"), F.array()), _matches),
            lambda r: F.struct(r["plen"].alias("l"), r["allow"].alias("a")),
        )
    )
    return frontier.join(F.broadcast(dim), host_col, "left").withColumn(
        out_col, F.coalesce(best["a"], F.lit(True))
    ).drop("robots_rules")


def merge_crawl_delay(
    consented: DataFrame,
    delays: DataFrame,
    host_col: str = "hostname",
    rate_col: str = "effective_rate_ms",
) -> DataFrame:
    """Host-level rate = greatest(consent/default rate, robots crawl-delay).

    ``delays`` is dim-scale (≤ one row per host) — broadcast. Hosts without
    a crawl-delay keep their consent rate unchanged."""
    d = delays.select(F.col(host_col), F.col("crawl_delay_ms"))
    return (
        consented.join(F.broadcast(d), host_col, "left")
        .withColumn(
            rate_col,
            F.greatest(F.col(rate_col), F.coalesce(F.col("crawl_delay_ms"), F.lit(0))),
        )
        .drop("crawl_delay_ms")
    )


def refresh_policy(
    states: DataFrame,
    now_s: int,
    max_age_s: int = 86_400,
    host_col: str = "hostname",
    status_col: str = "status",
    fetched_col: str = "fetched_s",
    has_rules_col: str = "has_rules",
) -> DataFrame:
    """RFC 9309 §2.3.1 / §2.4 robots.txt fetch-status semantics — the
    part of the robots story the parser can't cover: what ACCESS the
    crawler has per host given the last fetch's HTTP status and age.

    Adds ``age_s``, ``decision`` (use_cached | refetch) and ``access``:

    - 2xx → ``rules``      (parse and apply, the robots_gate path)
    - 4xx → ``allow_all``  (§2.3.1.3: unavailable means UNRESTRICTED —
      fail-open; the counterintuitive half people get wrong)
    - 5xx / unreachable (status NULL or 0) → ``deny_all`` (§2.3.1.4:
      MUST assume complete disallow — fail-closed) — UNLESS a previously
      fetched rule set exists (``has_rules_col``), which §2.4 allows the
      crawler to keep using while the server is unreachable
      (``access = rules``, decision stays ``refetch`` so the transport
      keeps retrying).
    - 3xx is absent by construction: the transport resolves redirects
      (≤5 hops, then treated as unreachable) BEFORE recording status —
      operators/redirects.py owns chains; this table stores the terminal
      status.

    ``decision`` is ``use_cached`` while ``age < max_age_s`` (the §2.4
    24 h MAY-cache), else ``refetch``. One codegen'd projection, zero
    shuffles — composes with the consent gate and cachectl at the scan.
    """
    age = F.lit(int(now_s)) - F.col(fetched_col)
    status = F.col(status_col)
    reachable = status.isNotNull() & (status > 0)
    access = (
        F.when(reachable & (status >= 200) & (status < 300), F.lit("rules"))
        .when(reachable & (status >= 400) & (status < 500), F.lit("allow_all"))
        .when(F.col(has_rules_col), F.lit("rules"))
        .otherwise(F.lit("deny_all"))
    )
    decision = F.when(
        reachable & (age < F.lit(int(max_age_s))), F.lit("use_cached")
    ).otherwise(F.lit("refetch"))
    return states.select(
        "*", age.alias("age_s"), decision.alias("decision"), access.alias("access")
    )
