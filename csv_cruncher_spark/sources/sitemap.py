"""Sitemap source + recrawl planning: the pull half of crawl-driven CDC.

The change feed tells the engine what it already fetched; sitemaps
(sitemaps.org protocol) tell it what the site CLAIMS exists and when it
last changed. Parsing the ``<urlset>`` XML with JVM regex
(``regexp_extract_all`` over ``<url>`` blocks, field extracts inside
each block) keeps the whole path Python-free and — because the fields
are plain text — exactly DuckDB-oracle-able. A real-world sitemap fits
the regex subset (the protocol forbids nested ``<url>`` elements).

:func:`recrawl_plan` then joins the sitemap claims against the lake's
(url, warc_ts) state and classifies every url: ``new`` (claimed, never
fetched), ``stale`` (claimed lastmod is newer than the stored fetch),
``fresh`` (stored copy is current), ``unlisted`` (stored but no longer
claimed — a delete candidate). That classification IS the input the
crawl scheduler (`operators/crawl.py`) dispatches, closing the loop
sitemap → fetch plan → CDC batch → lake.

Scale shape: parsing is a projection + one explode (per-file map work);
the plan is ONE full-outer equi-join on the url key between two narrow
frames — state side carries (url, warc_ts), sitemap side (url,
lastmod). No windows, no skew (urls are unique on both sides).

Reference parity: csv-cruncher has no XML/sitemap surface; new-engine
source for the webtext payload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["parse_sitemap", "recrawl_plan"]

_URL_BLOCK = "(?s)<url>(.*?)</url>"


def _field(tag: str):
    return F.nullif(
        F.regexp_extract(F.col("__block"), f"<{tag}>\\s*([^<]*?)\\s*</{tag}>", 1),
        F.lit(""),
    )


def parse_sitemap(
    df: DataFrame,
    xml_col: str = "xml",
    source_col: str | None = None,
) -> DataFrame:
    """Explode sitemap XML into (loc, lastmod, lastmod_ts, changefreq,
    priority) rows — one per ``<url>`` block. ``lastmod`` is the raw
    W3C-datetime string; ``lastmod_ts`` parses the date or full form
    (NULL when absent/malformed — try_ semantics). ``source_col``
    (e.g. the sitemap's own url) is carried through when given;
    blocks without a ``<loc>`` drop."""
    carry = [F.col(source_col)] if source_col else []
    blocks = df.select(
        *carry,
        F.explode(
            F.regexp_extract_all(F.col(xml_col), F.lit(_URL_BLOCK), F.lit(1))
        ).alias("__block"),
    )
    lastmod = _field("lastmod")
    return blocks.select(
        *carry,
        _field("loc").alias("loc"),
        lastmod.alias("lastmod"),
        F.coalesce(
            F.try_to_timestamp(lastmod, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
            F.try_to_timestamp(lastmod, F.lit("yyyy-MM-dd")),
        ).alias("lastmod_ts"),
        _field("changefreq").alias("changefreq"),
        _field("priority").cast("double").alias("priority"),
    ).filter(F.col("loc").isNotNull())


def recrawl_plan(
    state: DataFrame,
    sitemap: DataFrame,
    url_col: str = "url",
    fetched_col: str = "warc_ts",
    loc_col: str = "loc",
    lastmod_col: str = "lastmod_ts",
) -> DataFrame:
    """Classify every url across lake state and sitemap claims.

    Returns (url, status, fetched_ts, lastmod_ts) with status ∈
    {new, stale, fresh, unlisted}: ``stale`` strictly newer lastmod
    than the stored fetch; a claimed url with NO lastmod is ``fresh``
    when stored (no evidence of change — the protocol's reading) and
    ``new`` when unstored. Duplicate sitemap claims collapse to the
    NEWEST lastmod; duplicate state urls are a caller bug (lake keys
    are unique by construction).
    """
    s = state.select(
        F.col(url_col).alias("url"), F.col(fetched_col).alias("fetched_ts")
    )
    m = (
        sitemap.select(
            F.col(loc_col).alias("url"), F.col(lastmod_col).alias("lastmod_ts")
        )
        .groupBy("url")
        .agg(F.max("lastmod_ts").alias("lastmod_ts"))
        # claim marker survives a NULL lastmod (claimed-without-date)
        .withColumn("__claimed", F.lit(1))
    )
    j = s.join(m, "url", "full_outer")
    status = (
        F.when(F.col("fetched_ts").isNull(), F.lit("new"))
        .when(F.col("__claimed").isNull(), F.lit("unlisted"))
        .when(
            F.col("lastmod_ts").isNotNull()
            & (F.col("lastmod_ts") > F.col("fetched_ts")),
            F.lit("stale"),
        )
        .otherwise(F.lit("fresh"))
    )
    return j.select("url", status.alias("status"), "fetched_ts", "lastmod_ts")
