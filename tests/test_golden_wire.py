"""Golden wire-fixture round-trip (VERDICT r4 "do this" #3, SURVEY §5 (3)).

The reference pins its Gitea wire schema against a REAL captured page set —
every line of tests/schema/gitea/git.batsense.net.json must deserialize
into ``SearchResults`` without panicking (forge/gitea/src/schema.rs:159-171).
The Spark equivalent: every line, wrapped as an api_json span document, must
flow through ``first_text_span`` → ``from_json(tables.GITEA_SEARCH_
RESULTS)`` → N2/N3 normalization with ZERO null parses, and the projected
owner/html_url/website fields must equal the JSON ground truth exactly —
schema-drift insurance the synthetic corpus (which mimics the shape but not
the ~45-field nullability quirks of a live Gitea) cannot give.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from starchart_spark import tables
from starchart_spark.operators import normalize

FIXTURE = "/root/reference/forge/gitea/tests/schema/gitea/git.batsense.net.json"

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIXTURE), reason="reference fixture not present"
)


def _pages():
    with open(FIXTURE) as fh:
        return [json.loads(line) for line in fh if line.strip()]


def _docs_df(spark):
    lines = open(FIXTURE).read().splitlines()
    rows = [
        (
            f"https://git.batsense.net/api/v1/repos/search?page={i + 1}&limit=50",
            "git.batsense.net",
            [("api_json", line, None, 0)],
        )
        for i, line in enumerate(lines)
        if line.strip()
    ]
    from pyspark.sql import types as T

    sch = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("hostname", T.StringType(), False),
            T.StructField("spans", T.ArrayType(tables.SPAN), False),
        ]
    )
    return spark.createDataFrame(rows, sch)


def test_golden_capture_parses_with_zero_nulls(spark):
    pages = _pages()
    n_repos = sum(len(p["data"]) for p in pages)
    assert n_repos > 0

    parsed = normalize.parse_gitea_search_pages(_docs_df(spark))
    rows = parsed.collect()
    assert len(rows) == n_repos, "every wire repo must survive the parse"
    for r in rows:
        # the reference's schema_doesnt_panic: no field that serde would
        # require may come back null from from_json (a null here means the
        # declared Spark schema drifted from the live wire shape)
        assert r["name"] is not None
        assert r["html_url"] is not None
        assert r["owner_username"] is not None
        assert r["page"] is not None and r["idx_in_page"] >= 1


def test_golden_capture_exact_projections(spark):
    pages = _pages()
    expect = []
    for i, p in enumerate(pages):
        for j, repo in enumerate(p["data"]):
            expect.append(
                (
                    i + 1,
                    j + 1,
                    repo["name"],
                    repo["html_url"],
                    repo["owner"]["username"],
                    repo["owner"]["avatar_url"],
                    repo.get("website") or None,
                )
            )

    parsed = normalize.parse_gitea_search_pages(_docs_df(spark))
    got = [
        (
            r["page"],
            r["idx_in_page"],
            r["name"],
            r["html_url"],
            r["owner_username"],
            r["owner_avatar_url"],
            r["website"] or None,
        )
        for r in parsed.orderBy("page", "idx_in_page").collect()
    ]
    assert got == expect


def test_golden_capture_normalizes(spark):
    """N2/N3 over the real capture: one user candidate per wire row, repo
    rows carry empty_is_none'd website and NULL tags (gitea topics arrive
    via the S4 second fetch, never inline)."""
    parsed = normalize.parse_gitea_search_pages(_docs_df(spark)).withColumn(
        "forge_url", F.concat(F.lit("https://"), F.col("hostname"), F.lit("/"))
    )
    pages = _pages()
    n_repos = sum(len(p["data"]) for p in pages)

    users = normalize.normalize_users(parsed)
    assert users.count() == n_repos
    assert users.filter(F.col("username").isNull()).count() == 0
    # profile link = instance URL + "/" + username (gitea/src/lib.rs:103-113)
    bad = users.filter(
        ~F.col("html_link").startswith("https://git.batsense.net/")
    ).count()
    assert bad == 0

    topics = normalize.parse_gitea_topics_pages(
        _docs_df(spark).limit(0)  # no topics docs in the capture
    )
    repos = normalize.normalize_repositories(parsed, topics)
    assert repos.count() == n_repos
    # empty_is_none: the capture has ""-website repos; none may survive as ''
    assert repos.filter(F.col("website") == "").count() == 0
