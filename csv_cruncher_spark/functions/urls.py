"""URL normalization and decomposition for web-page keyed pipelines.

The north-rule CDC engine keys pages by url; at Common-Crawl scale the
same page arrives under trivially different spellings (scheme case,
host case, default ports, fragments, trailing slashes), and un-normalized
keys fracture LWW dedup groups and skew salting decisions. These are all
JVM built-ins (`try_parse_url`, `regexp_replace`, codegen'd) — no Python.

`try_parse_url` is Spark's native URL decomposer (the `try_` form:
Spark 4 runs ANSI mode by default, where plain `parse_url` THROWS on a
malformed URL — a single bad row would fail a 100-TB scan; NULL-on-fail
plus the raw-input fallback below is the scale-safe posture); the
normalization formula
is deliberately regex-expressible so the driver entry (url_host_stats)
can be oracle-checked in DuckDB with plain string SQL.

Reference parity: csv-cruncher has no URL functions; this is new-engine
surface for the webtext payload.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _bare_host(c: Column) -> Column:
    """Lowercased host, no port (parse_url's HOST is Java URI getHost —
    it NEVER carries the port; the port lives in AUTHORITY)."""
    return F.lower(F.try_parse_url(c, F.lit("HOST")))


def url_host(url: str | Column) -> Column:
    """Lowercased host, keeping the port only when it differs from the
    scheme's OWN default (:80 for http, :443 for https). ``http://h:443``
    keeps its genuinely non-default port (round-4 advice: the old
    unconditional :80/:443 strip merged distinct keys — and was in fact
    doubly wrong, since HOST never carries the port at all: the port has
    to be recovered from AUTHORITY and re-attached)."""
    c = F.col(url) if isinstance(url, str) else url
    host = _bare_host(c)
    scheme = F.lower(F.try_parse_url(c, F.lit("PROTOCOL")))
    port = F.regexp_extract(F.try_parse_url(c, F.lit("AUTHORITY")), ":([0-9]+)$", 1)
    default = (
        F.when(scheme == "http", F.lit("80"))
        .when(scheme == "https", F.lit("443"))
        .otherwise(F.lit(""))
    )
    keep = host.isNotNull() & (port != "") & (port != default)
    return F.when(keep, F.concat(host, F.lit(":"), port)).otherwise(host)


def url_path(url: str | Column) -> Column:
    """Path with the trailing slash folded ('' and '/' both → '/'):
    /a/b/ and /a/b are the same resource for dedup keying."""
    c = F.col(url) if isinstance(url, str) else url
    p = F.try_parse_url(c, F.lit("PATH"))
    trimmed = F.regexp_replace(p, "/+$", "")
    return F.when(
        (p.isNull()) | (trimmed == ""), F.lit("/")
    ).otherwise(trimmed)


def url_domain(url: str | Column, levels: int = 2) -> Column:
    """Last ``levels`` labels of the host — the hot-DOMAIN skew key the
    CDC salting path groups by (a true public-suffix list is a lookup
    table join; last-2-labels is the deterministic approximation).
    Port-free: ``h:8080`` and ``h`` are the same domain for skew grouping."""
    c = F.col(url) if isinstance(url, str) else url
    host = _bare_host(c)
    parts = F.split(host, "\\.")
    n = F.size(parts)
    return F.when(n <= levels, host).otherwise(
        F.array_join(F.slice(parts, n - levels + 1, levels), ".")
    )


def normalize_url(url: str | Column) -> Column:
    """Canonical form for keying: lowercase scheme and host, strip
    fragment, strip the scheme's default port, fold trailing slashes on
    the path, keep the query verbatim (query-param reordering changes
    semantics for many sites — not folded). NULL-safe both ways: a null
    url stays null, and a non-null url that ``parse_url`` cannot
    decompose (no scheme/host) falls back to the RAW input instead of
    NULL — the old concat-over-NULL silently collapsed every malformed
    URL onto one NULL key, merging unrelated rows in keyed dedup
    (round-4 advice)."""
    c = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.try_parse_url(c, F.lit("PROTOCOL")))
    query = F.try_parse_url(c, F.lit("QUERY"))
    canonical = F.concat(
        scheme,
        F.lit("://"),
        url_host(c),
        url_path(c),
        F.when(query.isNull(), F.lit("")).otherwise(F.concat(F.lit("?"), query)),
    )
    # concat is NULL if scheme or host is NULL → coalesce keeps malformed
    # URLs as their own distinct raw-spelled keys
    return F.coalesce(canonical, c)


def surt_key(url: str | Column) -> Column:
    """SURT-form index key (Sort-friendly URI Reordering Transform —
    the key design of the Common Crawl / web-archive CDX index): host
    labels reversed and comma-joined so one domain's pages sort
    CONTIGUOUSLY, letting a range scan (or a range-partitioned shard
    layout) answer "everything under example.com" without a full pass.

        https://www.example.com/a?b=1  →  com,example)/a?b=1

    Formula: host via :func:`url_host` (lowercased, non-default port
    kept), one leading ``www.`` stripped (the archive convention — www
    and apex interleave in the index), labels reversed around commas
    with a kept port riding the LAST label (``com,example:8080)``),
    then ``)`` and the raw path+query (fragment dropped, empty path →
    ``/``; bytes otherwise untouched — SURT is a sort key, not a
    canonicalizer; pair with `operators.urlfilter.strip_params` for
    value folding). NULL/host-less urls → NULL key. Pure JVM
    expressions throughout.
    """
    c = F.col(url) if isinstance(url, str) else url
    host = url_host(c)
    name = F.regexp_replace(host, ":[0-9]+$", "")
    port_sfx = F.regexp_extract(host, "(:[0-9]+)$", 1)
    bare = F.regexp_replace(name, "^www\\.", "")
    rev = F.array_join(F.reverse(F.split(bare, "\\.")), ",")
    pathquery = F.regexp_extract(
        c, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)", 1
    )
    return F.when(
        host.isNotNull(),
        F.concat(
            rev,
            port_sfx,
            F.lit(")"),
            F.when(pathquery == "", F.lit("/")).otherwise(pathquery),
        ),
    )
