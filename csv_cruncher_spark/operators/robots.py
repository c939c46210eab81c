"""robots.txt-style crawl permissioning: longest-prefix-wins allow/deny.

The politeness half of the crawl loop (`operators/crawl.py`) decides
WHEN to fetch; this decides WHETHER fetching is permitted at all. Rules
follow the REP precedence the Google robots.txt spec fixes (RFC 9309
§2.2.2): among the rules of a url's host whose path-prefix matches the
url's path, the MOST SPECIFIC (longest prefix) wins; on a length tie
the allow rule wins; a url with no matching rule (or no rules for its
host, or an unparseable host) is allowed. Wildcards are out of scope —
prefix rules are the 99% case and keep the operator exactly
DuckDB-oracle-able.

Plan shape (10^10-url frontier): ONE equi-join on the host key against
the rule table (broadcast when the rule set is config-scale; plain
shuffle join for a full-web rules corpus — per-host rule counts bound
the amplification), a prefix filter, then a map-combinable MAX of a
(prefix_len, allow, prefix) struct per url — the winner selection never
sorts or windows, and ties break deterministically by the struct order.
The frontier payload rides only the final LEFT join back on the unique
url key.

Reference parity: csv-cruncher has no crawl surface; new-engine
screening for the webtext payload, the allow/deny companion to
`operators/urlfilter.py`'s host blocklist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urls import url_host

__all__ = ["robots_filter"]


def robots_filter(
    frontier: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    prefix_col: str = "path_prefix",
    allow_col: str = "allow",
) -> DataFrame:
    """Annotate ``frontier`` with the REP verdict of ``rules``.

    ``rules``: (host, path_prefix, allow:boolean). Returns the frontier
    columns plus (is_allowed, matched_prefix); ``matched_prefix`` is
    NULL when no rule matched (the allowed-by-default case). A url
    whose host cannot be parsed matches no rules and is allowed.
    """
    probe = frontier.select(
        F.col(url_col).alias("__rurl"),
        url_host(F.col(url_col)).alias("__rhost"),
        F.coalesce(
            F.nullif(F.try_parse_url(F.col(url_col), F.lit("PATH")), F.lit("")),
            F.lit("/"),
        ).alias("__rpath"),
    )
    r = rules.select(
        F.col(host_col).alias("__rhost"),
        F.col(prefix_col).alias("__rprefix"),
        F.col(allow_col).cast("boolean").alias("__rallow"),
    )
    verdicts = (
        probe.join(r, "__rhost")
        .filter(F.col("__rpath").startswith(F.col("__rprefix")))
        .groupBy("__rurl")
        .agg(
            F.max(
                F.struct(
                    F.length("__rprefix").alias("len"),
                    F.col("__rallow").alias("allow"),
                    F.col("__rprefix").alias("prefix"),
                )
            ).alias("__w")
        )
    )
    return (
        frontier.join(verdicts, frontier[url_col] == verdicts["__rurl"], "left")
        .withColumn(
            "is_allowed", F.coalesce(F.col("__w.allow"), F.lit(True))
        )
        .withColumn("matched_prefix", F.col("__w.prefix"))
        .drop("__rurl", "__w")
    )
