"""Search surface: local FTS-style match + federated fan-out gating.

Reference behavior (/root/reference/src/search.rs:51-101):

- query wildcarding (N9, :56-60): no ``*`` in query → wrap as ``*q*`` —
  i.e. a contains match;
- local search (J5): FTS MATCH on repositories (name/description/html_url)
  then hydrate — one filter + join here, never N+1;
- federated fan-out (J6 + P6): peers whose mini-index contains the query
  word get proxied to, unless their leaky-bucket count is over threshold
  (>50 in 54 s, src/search.rs:78-90) — expressed as the sliding-window
  count in operators/politeness.sliding_limiter;
- result merge (§2.8): federated + local concatenated, NO dedup
  (src/search.rs:95-100) — a plain unionAll.

At our scale a LIKE/contains scan is the right physical plan (the corpus is
columnar and the filter pushes to the scan); a tokenized inverted-index
table is the upgrade path if search QPS ever warrants it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def wildcard(query: str) -> str:
    """N9: wrap bare queries; preserve explicit stars (src/search.rs:56-60)."""
    return query if "*" in query else f"*{query}*"


def _like_pattern(wildcarded: str) -> str:
    return wildcarded.replace("%", r"\%").replace("*", "%")


def search_repositories(repos: DataFrame, query: str) -> DataFrame:
    """Local repo search over name/description/html_url (the FTS columns,
    db/db-sqlx-sqlite/migrations/20230223063159_starchart_fts_repository.sql)."""
    pat = _like_pattern(wildcard(query))
    cond = (
        F.col("name").like(pat)
        | F.col("description").like(pat)
        | F.col("html_url").like(pat)
    )
    return repos.filter(cond)


def search_users(users: DataFrame, query: str, username_col: str = "username") -> DataFrame:
    """User search over the username FTS column — the reference maintains
    ``fts_users(username)`` insert-or-ignore beside the user table
    (db/db-sqlx-sqlite/src/lib.rs:201-210, migrations/20230223063159:14-16);
    the match semantics are the same wildcarded contains as repositories."""
    return users.filter(F.col(username_col).like(_like_pattern(wildcard(query))))


def search_topics(topics: DataFrame, query: str, name_col: str = "name") -> DataFrame:
    """Topic search over ``fts_project_topics(name)``
    (db/db-sqlx-sqlite/src/lib.rs:243-252, migrations/20230223063159:9-12)."""
    return topics.filter(F.col(name_col).like(_like_pattern(wildcard(query))))


def federated_targets(
    mini_indexes: DataFrame, query: str, instance_col: str = "starchart_instance"
) -> DataFrame:
    """J6: peers whose mini-index contains the (unwildcarded) query token.
    mini_indexes: (starchart_instance, mini_index string)."""
    q = query.strip().strip("*")
    return mini_indexes.filter(
        F.array_contains(F.split(F.col("mini_index"), " "), q)
    ).select(instance_col)


def merge_results(local: DataFrame, federated: DataFrame) -> DataFrame:
    """§2.8: concatenation, no dedup — matches src/search.rs:95-100."""
    cols = local.columns
    return local.unionAll(federated.select(*cols))
