"""WARC source: distributed, splittable reading of Common-Crawl-style
web archives into the engine's page frame.

The north rule's change feed is "Common-Crawl-style web pages"; the
wire format of Common Crawl IS WARC (ISO 28500): concatenated records
of ``WARC/1.0\\r\\n`` + header lines + blank line + payload, each
record terminated by two CRLFs. This reader maps that onto Spark's
text source with a multi-byte ``lineSep`` of the RECORD BOUNDARY
(``\\r\\n\\r\\nWARC/1.0\\r\\n``) — which means files SPLIT: Hadoop's
line reader scans for the delimiter from any byte offset, so a 1-GB
WARC fans out across executors with no driver-side parsing, and 10^5
WARC files fan out across both files and splits. Header fields are
pulled with JVM ``regexp_extract``; no Python touches a record.

Honest boundary (documented, tested): a payload that itself contains
the 16-byte record-boundary sentinel splits early — the same truncation
any delimiter-scan reader accepts. Real crawls store per-record-gzipped
WARC (payloads are opaque bytes) or escape-free text extracts; this
reader targets the uncompressed form the sandbox can generate. The
spec-exact alternative (sequential Content-Length walks) serializes the
whole file through one reader and is exactly what this avoids.

Writer twin: :func:`warc_record_text` composes spec-shaped records from
a page frame (Content-Length in BYTES via ``octet_length``), and
:func:`write_warc` emits them with the record terminator as the write
``lineSep`` — ``read_warc(write_warc(df))`` round-trips bit-exactly
(pinned in tests/test_warc.py).

Reference parity: csv-cruncher reads CSV/JSON only
(`/root/reference/README.md`); WARC is new-engine source surface for
the webtext payload, alongside its CSV/JSON change batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.urls import surt_key

__all__ = [
    "read_warc",
    "warc_record_text",
    "write_warc",
    "warc_to_change_batch",
    "cdx_index",
    "cdx_lookup",
]

RECORD_BOUNDARY = "\r\n\r\nWARC/1.0\r\n"


def _header(name: str):
    # header names are case-insensitive per ISO 28500 §4
    return F.nullif(
        F.regexp_extract(F.col("__headers"), f"(?im)^{name}:\\s*([^\\r\\n]*)", 1),
        F.lit(""),
    )


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read WARC file(s) into (url, warc_date, warc_ts, warc_type,
    content_length, payload).

    ``warc_date`` is the raw ISO-8601 header string; ``warc_ts`` its
    parsed timestamp. ``content_length`` is the declared byte count
    (reported, not used to cut — the payload is bounded by the record
    structure). Records without a WARC-Target-URI (warcinfo) keep a
    NULL url; callers filter on ``warc_type``.
    """
    raw = spark.read.option("lineSep", RECORD_BOUNDARY).text(path)
    rec = F.regexp_replace(F.col("value"), "^WARC/1\\.0\r\n", "")
    parsed = (
        raw.filter(F.length("value") > 0)
        .select(rec.alias("__rec"))
        .select(
            F.substring_index("__rec", "\r\n\r\n", 1).alias("__headers"),
            # payload = everything past the first blank line, minus the
            # final record's trailing terminator (interior records lost
            # theirs to the read lineSep)
            F.regexp_replace(
                F.col("__rec").substr(
                    F.length(F.substring_index("__rec", "\r\n\r\n", 1))
                    + F.lit(5),
                    F.length("__rec"),
                ),
                "\r\n\r\n$",
                "",
            ).alias("payload"),
        )
    )
    return parsed.select(
        _header("WARC-Target-URI").alias("url"),
        _header("WARC-Date").alias("warc_date"),
        # try_ form: ANSI mode (Spark 4 default) throws on a malformed
        # date — one bad record must not fail a crawl-dump scan
        F.try_to_timestamp(
            _header("WARC-Date"), F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'")
        ).alias("warc_ts"),
        _header("WARC-Type").alias("warc_type"),
        _header("Content-Length").cast("long").alias("content_length"),
        "payload",
    )


def warc_record_text(
    url_col: str = "url",
    date_col: str = "warc_date",
    payload_col: str = "payload",
    warc_type: str = "response",
) -> F.Column:
    """One spec-shaped WARC record (sans trailing terminator — the
    writer's lineSep supplies it) as a string column."""
    return F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: " + warc_type + "\r\nWARC-Target-URI: "),
        F.col(url_col),
        F.lit("\r\nWARC-Date: "),
        F.col(date_col),
        F.lit("\r\nContent-Length: "),
        F.octet_length(F.col(payload_col)).cast("string"),
        F.lit("\r\n\r\n"),
        F.col(payload_col),
    )


def write_warc(
    df: DataFrame,
    path: str,
    url_col: str = "url",
    date_col: str = "warc_date",
    payload_col: str = "payload",
) -> None:
    """Write a page frame as WARC response records (one part-file per
    partition — the distributed form; records never cross partitions)."""
    df.select(
        warc_record_text(url_col, date_col, payload_col).alias("value")
    ).write.option("lineSep", "\r\n\r\n").mode("overwrite").text(path)


def warc_to_change_batch(warc: DataFrame, op: str = "U") -> DataFrame:
    """WARC response records → the engine's op-coded change batch
    (op, url, warc_ts, html, lang): the adapter that lets
    ``lake.merge.apply_batch`` / the CDC pipeline ingest a crawl dump
    directly. Payload bytes become the ``html`` binary column; ``lang``
    is NULL (detection is a downstream operator). Non-response records
    and url-less records drop."""
    return warc.filter(
        (F.col("warc_type") == "response") & F.col("url").isNotNull()
    ).select(
        F.lit(op).alias("op"),
        "url",
        "warc_ts",
        F.encode("payload", "UTF-8").alias("html"),
        F.lit(None).cast("string").alias("lang"),
    )


def cdx_index(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    payload_col: str = "payload",
) -> DataFrame:
    """Build a CDX-style capture index over a page/WARC frame — the
    web-archive lookup structure (Common Crawl publishes one per
    crawl): one row per capture, keyed by the SURT form of the url
    (`functions.urls.surt_key`) so a domain's captures are contiguous
    under a range partitioning.

    Output (url-less rows drop — they cannot be looked up):

      surt          SURT key: com,example)/path?query
      ts            capture instant (int64 epoch seconds)
      url           the original url spelling
      digest        md5 of the payload (dedup / revisit detection)
      length_bytes  payload size in bytes (octet_length — byte-exact
                    vs DuckDB strlen)

    The frame comes back RANGE-partitioned on (surt, ts) and sorted
    within partitions — written to parquet, a min/max-pruned range scan
    answers a domain prefix lookup by touching only that domain's
    shards; at 10^10 captures nothing ever concentrates (SURT spreads
    by domain, ts splits giant domains).

    Reference parity: csv-cruncher has no archive-index surface; this
    is the query-side companion of `read_warc`/`write_warc`
    (`/root/reference/README.md` positions the tool over dumped files —
    the CDX is how web-scale dumps stay addressable).
    """
    idx = pages.filter(F.col(url_col).isNotNull()).select(
        surt_key(F.col(url_col)).alias("surt"),
        F.col(ts_col).cast("long").alias("ts"),
        F.col(url_col).alias("url"),
        F.md5(F.col(payload_col)).alias("digest"),
        F.octet_length(F.col(payload_col)).cast("bigint").alias(
            "length_bytes"
        ),
    )
    return idx.repartitionByRange("surt", "ts").sortWithinPartitions(
        "surt", "ts"
    )


def cdx_lookup(index: DataFrame, surt_prefix: str) -> DataFrame:
    """All captures under a SURT prefix (a domain or a subtree):
    ``startswith`` on the range-sort key — over a parquet-persisted
    index this prunes to the shards whose (min, max) surt straddles the
    prefix, the CDX range-scan contract."""
    return index.filter(F.col("surt").startswith(surt_prefix))
