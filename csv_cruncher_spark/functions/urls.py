"""URL normalization and decomposition for web-page keyed pipelines.

The north-rule CDC engine keys pages by url; at Common-Crawl scale the
same page arrives under trivially different spellings (scheme case,
host case, default ports, fragments, trailing slashes), and un-normalized
keys fracture LWW dedup groups and skew salting decisions. These are all
JVM built-ins (`parse_url`, `regexp_replace`, codegen'd) — no Python.

`parse_url` is Spark's native URL decomposer; the normalization formula
is deliberately regex-expressible so the driver entry (url_host_stats)
can be oracle-checked in DuckDB with plain string SQL.

Reference parity: csv-cruncher has no URL functions; this is new-engine
surface for the webtext payload.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def url_host(url: str | Column) -> Column:
    """Lowercased host, default-port stripped (parse_url keeps the port
    in HOST only when nonstandard — strip :80/:443 defensively for
    inputs that spell them)."""
    c = F.col(url) if isinstance(url, str) else url
    host = F.lower(F.parse_url(c, F.lit("HOST")))
    return F.regexp_replace(host, ":(80|443)$", "")


def url_path(url: str | Column) -> Column:
    """Path with the trailing slash folded ('' and '/' both → '/'):
    /a/b/ and /a/b are the same resource for dedup keying."""
    c = F.col(url) if isinstance(url, str) else url
    p = F.parse_url(c, F.lit("PATH"))
    trimmed = F.regexp_replace(p, "/+$", "")
    return F.when(
        (p.isNull()) | (trimmed == ""), F.lit("/")
    ).otherwise(trimmed)


def url_domain(url: str | Column, levels: int = 2) -> Column:
    """Last ``levels`` labels of the host — the hot-DOMAIN skew key the
    CDC salting path groups by (a true public-suffix list is a lookup
    table join; last-2-labels is the deterministic approximation)."""
    host = url_host(url)
    parts = F.split(host, "\\.")
    n = F.size(parts)
    return F.when(n <= levels, host).otherwise(
        F.array_join(F.slice(parts, n - levels + 1, levels), ".")
    )


def normalize_url(url: str | Column) -> Column:
    """Canonical form for keying: lowercase scheme and host, strip
    fragment, strip default port, fold trailing slashes on the path,
    keep the query verbatim (query-param reordering changes semantics
    for many sites — not folded). NULL-safe: a null url stays null."""
    c = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.parse_url(c, F.lit("PROTOCOL")))
    query = F.parse_url(c, F.lit("QUERY"))
    return F.when(c.isNull(), F.lit(None)).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            url_host(c),
            url_path(c),
            F.when(query.isNull(), F.lit("")).otherwise(F.concat(F.lit("?"), query)),
        )
    )
