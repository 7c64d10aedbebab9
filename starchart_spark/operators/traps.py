"""Crawl-trap URL detection — pure-JVM heuristics for frontier hygiene.

Spider traps (calendar pages, session-id permutations, recursive path
loops, combinatorial facet filters) generate unbounded URL families that a
10^10-URL frontier must shed BEFORE the politeness scheduler wastes budget
on them. The reference relies on its fixed seed list and never meets traps
(src/spider.rs crawls enumerated pages); at the north rule's open-frontier
scale trap filtering is standard crawler hygiene (see e.g. Heritrix's
pathological-URI rules), so this module is a "beyond the reference"
operator with semantics pinned by the DuckDB oracle (``trap_filter``).

All five signals are one codegen'd projection over (hostname, path, query)
— regexes in the RE2 ∩ java.util.regex subset (no lookaround, no
backreferences — the :mod:`pii` discipline) so the oracle runs
byte-identical patterns, and the repeated-segment check is array algebra
instead of the backreference RE2 lacks:

- **depth**: more than ``max_depth`` path segments;
- **repeat**: some path segment occurs ≥3 times (recursive symlink /
  self-referencing relative-link loops);
- **session**: a session/tracking id in the query string (crawling these
  yields per-visitor duplicate families);
- **calendar**: two or more year-like segments, or any year outside a
  sane window (event calendars paginate to year 9999);
- **longqs**: query string longer than ``max_query`` (combinatorial facet
  explosions).

``is_trap`` = any of the above. Fits the engine as a frontier filter right
next to the robots gate (operators/robots.py) — a scan-level predicate,
no shuffle, pushes down like any filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_DEPTH = 12
MAX_QUERY = 120

# RE2 ∩ Java subset — keep in lockstep with queries.py SQL_TRAP_FILTER.
SESSION_RE = r"(^|[?&])(phpsessid|jsessionid|sessionid|sid|session)=[A-Za-z0-9]+"
YEAR_SEG_RE = r"^[1-9][0-9]{3}$"  # a whole path segment that looks like a year
YEAR_RANGE_RE = r"^(1[0-8][0-9]{2}|2[1-9][0-9]{2}|[3-9][0-9]{3})$"  # outside 1900-2099


def _segments(path: Column) -> Column:
    # split("/a/b/", "/") yields empty edge tokens; drop them so depth and
    # repeats count real segments only (identical list_filter in the oracle)
    return F.filter(F.split(path, "/"), lambda s: s != "")


def trap_flags(
    df: DataFrame,
    path_col: str = "path",
    query_col: str = "query",
    max_depth: int = MAX_DEPTH,
    max_query: int = MAX_QUERY,
) -> DataFrame:
    """Append trap_depth/trap_repeat/trap_session/trap_calendar/trap_longqs
    booleans and the combined ``is_trap`` — one projection, no shuffle."""
    path = F.col(path_col)
    qs = F.coalesce(F.col(query_col), F.lit(""))
    # bind the segment array as a real column: HOF lambdas that capture an
    # EXPRESSION re-evaluate it per element when interpreted (NOTES.md
    # round-5 lesson); a bound attribute evaluates once per row
    df = df.withColumn("__segs", _segments(path))
    segs = F.col("__segs")
    depth = F.size(segs) > max_depth
    # "some segment appears >= 3 times" without RE2-less backreferences:
    # O(s^2) per row on short arrays, still pure codegen
    repeat = F.exists(
        segs, lambda s: F.size(F.filter(segs, lambda x: x == s)) >= 3
    )
    session = F.lower(qs).rlike(SESSION_RE)
    # segment-level year tests (a regex count over the raw path undercounts
    # adjacent years: the trailing-slash match consumes the next one's lead)
    years = F.size(F.filter(segs, lambda s: s.rlike(YEAR_SEG_RE)))
    out_of_window = F.exists(segs, lambda s: s.rlike(YEAR_RANGE_RE))
    calendar = (years >= 2) | out_of_window
    longqs = F.length(qs) > max_query
    return (
        df.withColumn("trap_depth", depth)
        .withColumn("trap_repeat", repeat)
        .withColumn("trap_session", session)
        .withColumn("trap_calendar", calendar)
        .withColumn("trap_longqs", longqs)
        .withColumn(
            "is_trap",
            F.col("trap_depth") | F.col("trap_repeat") | F.col("trap_session")
            | F.col("trap_calendar") | F.col("trap_longqs"),
        )
        .drop("__segs")
    )


def drop_traps(
    df: DataFrame,
    path_col: str = "path",
    query_col: str = "query",
    max_depth: int = MAX_DEPTH,
    max_query: int = MAX_QUERY,
) -> DataFrame:
    """Frontier minus trap URLs — the engine-facing form (a filter, so it
    composes with the robots gate and pushes to the scan)."""
    flagged = trap_flags(df, path_col, query_col, max_depth, max_query)
    return flagged.filter(~F.col("is_trap")).drop(
        "trap_depth", "trap_repeat", "trap_session",
        "trap_calendar", "trap_longqs", "is_trap",
    )
