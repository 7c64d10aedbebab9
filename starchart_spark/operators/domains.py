"""Registrable-domain (eTLD+1) extraction against a public-suffix rule dim.

A production crawler groups politeness, seen-set sharding and dedup by
*site*, not raw hostname: ``a.blogspot.com`` and ``b.blogspot.com`` are
different registrants (blogspot.com is a public suffix) while
``www.example.co.uk`` and ``api.example.co.uk`` are the same site
(``example.co.uk``). The reference keys everything on raw hostname
(db/db-core stores ``hostname`` as the instance key) — correct for a
forge-federation spider where each instance IS a host, but at a
10^10-URL web frontier the site roll-up is what rate limits, dedups and
budget allocations must key on.

Semantics are the Public Suffix List algorithm (publicsuffix.org/list —
the published matching rules, not Mozilla's data file, which callers
supply as an ordinary DataFrame of rule strings):

1. a rule matches when its labels are a suffix of the host's labels; a
   wildcard rule ``*.ck`` matches any 2-label suffix ending in ``ck``;
2. among matching rules, an exception rule (``!www.ck``) prevails, else
   the rule with the MOST labels;
3. the public suffix is the prevailing rule's labels (for an exception,
   the rule minus its leftmost label); if nothing matches, the default
   rule ``*`` makes the last label the suffix;
4. the registrable domain is the suffix plus one more label — NULL when
   the host IS a public suffix (nothing is registered "at" co.uk).

Scale shape: rules are a broadcast dim (the real PSL is ~10k rows).
Candidate suffixes are generated in-plan — ≤ MAX_LABELS short rows per
host, pure JVM (split / slice / array_join inside codegen, no Python) —
then ONE broadcast join against the normalized rules and ONE
map-side-combined max per host (the only exchange, keyed on the same
hostname the caller already partitions by). No explode survives the
aggregate; output is one row per input host.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# deeper hosts than this keep only their last MAX_LABELS labels as suffix
# candidates — the PSL's own deepest rule is 5 labels, so 8 is safe slack
MAX_LABELS = 8


def normalize_rules(rules: DataFrame, rule_col: str = "rule") -> DataFrame:
    """(join_kind, join_key, cand_nlabels, rule_nlabels, is_exc, eff) from
    raw PSL rule strings. Normal and exception rules match a candidate
    suffix by full-string equality (kind 'F'); wildcard rules match by the
    candidate's tail-after-first-label (kind 'W') at exactly their label
    count. ``eff`` is the label count of the public suffix the rule
    implies (exception rules: one less than they match)."""
    r = rules.select(F.trim(F.lower(F.col(rule_col))).alias("rule")).filter(
        (F.length("rule") > 0) & ~F.col("rule").startswith("//")
    )
    is_exc = F.col("rule").startswith("!")
    body = F.when(is_exc, F.expr("substring(rule, 2)")).otherwise(F.col("rule"))
    r = r.select(
        is_exc.alias("is_exc"),
        body.alias("body"),
        F.size(F.split(body, r"\.")).alias("nlabels"),
    )
    wild = F.col("body").startswith("*.")
    return r.select(
        F.when(wild, F.lit("W")).otherwise(F.lit("F")).alias("join_kind"),
        F.when(wild, F.expr("substring(body, 3)")).otherwise(F.col("body")).alias(
            "join_key"
        ),
        F.col("nlabels").alias("cand_nlabels"),
        F.col("nlabels").alias("rule_nlabels"),
        "is_exc",
        F.when(F.col("is_exc"), F.col("nlabels") - 1)
        .otherwise(F.col("nlabels"))
        .alias("eff"),
    )


def site_mapping(
    hosts: DataFrame,
    rules: DataFrame,
    host_col: str = "hostname",
    rule_col: str = "rule",
    out_col: str = "site",
) -> DataFrame:
    """(``host_col``, public_suffix, ``out_col``) per DISTINCT host — the
    dim-sized mapping. ONE real exchange end-to-end: the distinct on
    hostname. The candidate explode emits both match forms (full suffix
    'F' and wildcard tail 'W') from a single generator so partitioning by
    hostname survives into the per-host max, which therefore needs no
    second shuffle; rules join as a broadcast LEFT join whose unmatched
    rows carry sentinel priority (-1, 0, eff=1) — the PSL default rule
    "*" — so no join-back against the input is ever needed.
    """
    norm = F.broadcast(normalize_rules(rules, rule_col))
    dim = hosts.select(host_col).distinct()
    labels = F.split(F.col(host_col), r"\.")
    n = F.size(labels)
    # per suffix length i: the 'F' form (full i-label suffix) always, the
    # 'W' form (tail after the first label, for wildcard rules) when i>1
    per_i = F.transform(
        F.sequence(F.lit(1), F.least(n, F.lit(MAX_LABELS))),
        lambda i: F.struct(
            i.alias("i"),
            F.array_join(F.slice(labels, -i, i), ".").alias("fkey"),
            F.when(
                i > 1, F.array_join(F.slice(labels, -(i - F.lit(1)), i - F.lit(1)), ".")
            ).alias("wkey"),
        ),
    )
    cands = (
        dim.select(host_col, F.explode(per_i).alias("c"))
        .select(
            host_col,
            F.col("c.i").alias("i"),
            F.explode(
                F.when(
                    F.col("c.wkey").isNotNull(),
                    F.array(
                        F.struct(F.lit("F").alias("k"), F.col("c.fkey").alias("key")),
                        F.struct(F.lit("W").alias("k"), F.col("c.wkey").alias("key")),
                    ),
                ).otherwise(
                    F.array(
                        F.struct(F.lit("F").alias("k"), F.col("c.fkey").alias("key"))
                    )
                )
            ).alias("m"),
        )
        .select(host_col, "i", F.col("m.k").alias("join_kind"), F.col("m.key").alias("join_key"))
    )
    matched = cands.join(
        norm,
        (cands["join_kind"] == norm["join_kind"])
        & (cands["join_key"] == norm["join_key"])
        & (cands["i"] == norm["cand_nlabels"]),
        "left",
    )
    # PSL precedence via ONE same-key max: exception > most matched labels;
    # unmatched candidates rank below every rule and encode the default "*"
    best = matched.groupBy(host_col).agg(
        F.max(
            F.struct(
                F.coalesce(F.col("is_exc").cast("int"), F.lit(-1)).alias("exc"),
                F.coalesce(F.col("rule_nlabels"), F.lit(0)).alias("rl"),
                F.coalesce(F.col("eff"), F.lit(1)).alias("eff"),
            )
        ).alias("b")
    )
    eff = F.col("b.eff")
    out_labels = F.split(F.col(host_col), r"\.")
    out_n = F.size(out_labels)
    return best.select(
        host_col,
        F.array_join(F.slice(out_labels, -eff, eff), ".").alias("public_suffix"),
        F.when(
            out_n > eff,
            F.array_join(F.slice(out_labels, -(eff + F.lit(1)), eff + F.lit(1)), "."),
        ).alias(out_col),
    )


def registrable_domain(
    hosts: DataFrame,
    rules: DataFrame,
    host_col: str = "hostname",
    rule_col: str = "rule",
    out_col: str = "site",
    broadcast_map: bool = True,
) -> DataFrame:
    """hosts + (public_suffix, ``out_col``) per the PSL algorithm.

    ``hosts`` must carry lowercase dotted hostnames (compose with
    :func:`starchart_spark.functions.urls.hostname_udf` upstream); rows
    whose host is itself a public suffix get ``out_col`` NULL. The fact
    table never shuffles: the PSL resolution runs on the distinct-host dim
    (:func:`site_mapping`, one exchange) and joins back as a BROADCAST —
    at a 10^10-URL frontier the mapping is ~10^6-10^8 short rows; pass
    ``broadcast_map=False`` past broadcast size (shuffle join on the dim,
    the fact side still moves only once).
    """
    m = site_mapping(hosts, rules, host_col, rule_col, out_col)
    return hosts.join(F.broadcast(m) if broadcast_map else m, host_col, "left")


def registrable_domain_sql(hosts_cte: str, rules_cte: str) -> str:
    """DuckDB oracle replaying the identical program: ``hosts_cte`` yields
    (hostname), ``rules_cte`` yields (rule). Single-reference CTE chain
    (the hits_sql lesson); DuckDB's list slicing is 1-based so suffixes
    index from ``n - i + 1``."""
    return f"""
WITH hosts AS ({hosts_cte}),
rules_raw AS ({rules_cte}),
norm AS (
  SELECT CASE WHEN body LIKE '*.%' THEN 'W' ELSE 'F' END AS join_kind,
         CASE WHEN body LIKE '*.%' THEN substring(body, 3) ELSE body END AS join_key,
         nlabels AS cand_nlabels, nlabels AS rule_nlabels,
         is_exc, CASE WHEN is_exc THEN nlabels - 1 ELSE nlabels END AS eff
  FROM (
    SELECT is_exc, body, len(string_split(body, '.')) AS nlabels FROM (
      SELECT rule LIKE '!%' AS is_exc,
             CASE WHEN rule LIKE '!%' THEN substring(rule, 2) ELSE rule END AS body
      FROM (SELECT trim(lower(rule)) AS rule FROM rules_raw)
      WHERE length(rule) > 0 AND rule NOT LIKE '//%'
    )
  )
),
cands AS (
  SELECT hostname, n, i,
         array_to_string(labels[n - i + 1 : n], '.') AS suffix
  FROM (
    SELECT hostname, string_split(hostname, '.') AS labels,
           len(string_split(hostname, '.')) AS n
    FROM hosts
  ), (SELECT unnest(range(1, {MAX_LABELS} + 1)) AS i)
  WHERE i <= n
),
keyed AS (
  SELECT hostname, n, i, 'F' AS join_kind, suffix AS join_key FROM cands
  UNION ALL
  SELECT hostname, n, i, 'W' AS join_kind,
         substring(suffix, instr(suffix, '.') + 1) AS join_key
  FROM cands WHERE i > 1
),
best AS (
  SELECT hostname,
         max(struct_pack(exc := CAST(r.is_exc AS INT), rl := r.rule_nlabels,
                         eff := r.eff)) AS b
  FROM keyed k JOIN norm r
    ON k.join_kind = r.join_kind AND k.join_key = r.join_key
   AND k.i = r.cand_nlabels
  GROUP BY hostname
),
eff AS (
  SELECT h.hostname, len(string_split(h.hostname, '.')) AS n,
         COALESCE(b.b['eff'], 1) AS eff
  FROM hosts h LEFT JOIN best b USING (hostname)
)
SELECT hostname,
       array_to_string(string_split(hostname, '.')[n - eff + 1 : n], '.')
         AS public_suffix,
       CASE WHEN n > eff THEN
         array_to_string(string_split(hostname, '.')[n - eff : n], '.')
       END AS site
FROM eff
"""
