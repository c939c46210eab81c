"""Host-level content diagnostics for a web crawl: mirror detection and
crawler-trap reporting.

Two failure modes waste most of a large crawl's budget, and both are
HOST-level phenomena the document-level dedup layer (operators/dedup.py)
cannot see:

  - **mirrors** — two hosts serving byte-identical content under
    different names (cdn.example.org vs www.example.org, country
    mirrors, scraped re-hosts). Page-level exact dedup removes the
    duplicate *pages*, but only a host-pair report lets the frontier
    stop *fetching* the mirror. This is the reference's files-as-tables
    dedup idea (csv-cruncher unifies same-schema files into one table,
    `Cruncher.kt:160`) lifted to hosts-sharing-content.
  - **traps** — one host generating an unbounded URL space over a
    bounded content set (calendar pages, faceted navigation, session
    ids). The symptom is a host whose distinct-URL count dwarfs its
    distinct-content count; the fix is a per-host fetch cap, which
    `crawl.crawl_schedule` already enforces once this report names the
    hosts.

Scale shape — both reports are built on the distinct (host,
content-fingerprint) frame, never on page payloads:

  1. fingerprint = md5(text) is computed in the map task that read the
     page; text is dropped before any exchange (the repo's payload-free
     shuffle discipline).
  2. the mirror self-join is an equi-join on fingerprint over the
     DISTINCT (host, fp) frame, with a **stop-fingerprint cap**
     (`max_hosts_per_fp`) exactly like dedup.py's stop-shingle cutoff:
     a fingerprint served by more than the cap's hosts (empty pages,
     standard error pages, "0" bodies) would contribute O(cap²) pairs
     of no mirror value — it is dropped, and the drop is auditable
     (`dropped_fp_hosts` in the pair report would be the audit column;
     here the cap is documented and tested instead of carried on every
     row, matching `ngram_jaccard_pairs`).
  3. the trap report is ONE map-combined aggregation per host — no
     joins at all.

Cross-engine: md5 hex is identical in Spark and DuckDB (the md5-twin
discipline, dedup.py:291), and every derived measure is integer
arithmetic (micro-ratios via floor division), so both driver entries
(`host_mirror_report`, `crawler_trap_report`) carry full value-hash
oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "host_mirror_pairs",
    "crawler_trap_report",
    "canonical_url_election",
    "soft_error_report",
    "soft_error_filter",
]

MICRO = 1_000_000


def host_mirror_pairs(
    pages: DataFrame,
    host_col: str,
    text_col: str,
    min_shared: int = 2,
    min_containment_micro: int = 500_000,
    max_hosts_per_fp: int = 50,
) -> DataFrame:
    """Pairs of hosts sharing enough identical content to be mirrors.

    For every unordered host pair (a < b lexicographically) sharing at
    least ``min_shared`` distinct content fingerprints, emit:

      host_a, host_b      the pair (host_a < host_b)
      shared              distinct fingerprints served by BOTH
      n_a, n_b            distinct fingerprints served by each host
      containment_micro   floor(1e6 * shared / min(n_a, n_b)) — the
                          Broder containment of the smaller host in the
                          larger one, as an exact int64 micro-ratio

    filtered to ``containment_micro >= min_containment_micro`` (default:
    the smaller host's content is ≥50% contained in the other's — the
    classic mirror/re-host signature).

    Pages with NULL text carry no content evidence and are excluded
    (a NULL fingerprint would otherwise equi-join with nothing anyway).
    A fingerprint served by more than ``max_hosts_per_fp`` distinct
    hosts is a stop-fingerprint (module docstring) and excluded from
    pairing — it also does not count toward n_a/n_b, so the containment
    denominator and numerator stay consistent.

    Scale: the exchange keys are (host, fp) and fp — both uniform
    (md5); the pair explosion is bounded by cap²·|stop-free fps|; no
    payload column ever shuffles.
    """
    if min_shared < 1:
        raise ValueError(f"min_shared must be >= 1, got {min_shared}")
    if max_hosts_per_fp < 2:
        raise ValueError(
            f"max_hosts_per_fp must be >= 2 (pairs need two hosts), "
            f"got {max_hosts_per_fp}"
        )
    hostfp = (
        pages.filter(F.col(text_col).isNotNull())
        .select(
            F.col(host_col).alias("__host"),
            F.md5(F.col(text_col)).alias("__fp"),
        )
        .distinct()
    )
    # stop-fingerprint screen: one narrow aggregation on the fp key
    fp_ok = (
        hostfp.groupBy("__fp")
        .agg(F.count(F.lit(1)).alias("__nh"))
        .filter(F.col("__nh") <= max_hosts_per_fp)
        .select("__fp")
    )
    live = hostfp.join(fp_ok, "__fp")
    sizes = live.groupBy("__host").agg(F.count(F.lit(1)).alias("__n"))
    a = live.select(F.col("__host").alias("host_a"), "__fp")
    b = live.select(F.col("__host").alias("host_b"), "__fp")
    pairs = (
        a.join(b, "__fp")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= F.lit(min_shared))
    )
    out = (
        pairs.join(sizes.withColumnsRenamed({"__host": "host_a", "__n": "n_a"}), "host_a")
        .join(sizes.withColumnsRenamed({"__host": "host_b", "__n": "n_b"}), "host_b")
        .withColumn(
            "containment_micro",
            F.floor(
                F.col("shared") * F.lit(MICRO) / F.least("n_a", "n_b")
            ).cast("bigint"),
        )
        .filter(F.col("containment_micro") >= F.lit(min_containment_micro))
    )
    return out.select(
        "host_a", "host_b", "shared", "n_a", "n_b", "containment_micro"
    )


def crawler_trap_report(
    pages: DataFrame,
    host_col: str,
    url_col: str,
    text_col: str,
    min_urls: int = 10,
    min_dup_ratio_micro: int = 500_000,
) -> DataFrame:
    """Per-host URL-space vs content-diversity report, flagging traps.

    For every host:

      host
      n_urls           distinct URLs crawled
      n_content        distinct content fingerprints served (NULL text
                       counts as one shared "no content" class — a trap
                       serving empty pages is still a trap)
      n_param_urls     distinct URLs carrying a query string ('?') —
                       the usual trap vector (faceted nav, session ids)
      dup_ratio_micro  floor(1e6 * (n_urls - n_content) / n_urls) —
                       fraction of the URL space that added no content
      is_trap          n_urls >= min_urls AND dup_ratio_micro >=
                       min_dup_ratio_micro

    ONE aggregation on the host key over the narrow (host, url, fp)
    projection — text never shuffles. Host skew is exactly the shape
    Spark's partial aggregation absorbs (count-distinct expands to a
    two-level agg; both levels map-combine). The report feeds
    `crawl.crawl_schedule`'s per-host budget and
    `urlfilter.blocklist_filter`'s list.
    """
    if min_urls < 1:
        raise ValueError(f"min_urls must be >= 1, got {min_urls}")
    narrow = pages.select(
        F.col(host_col).alias("host"),
        F.col(url_col).alias("__url"),
        F.coalesce(F.md5(F.col(text_col)), F.lit("__null__")).alias("__fp"),
    )
    agg = narrow.groupBy("host").agg(
        F.countDistinct("__url").alias("n_urls"),
        F.countDistinct("__fp").alias("n_content"),
        F.countDistinct(
            F.when(F.col("__url").contains("?"), F.col("__url"))
        ).alias("n_param_urls"),
    )
    return agg.select(
        "host",
        "n_urls",
        "n_content",
        "n_param_urls",
        F.floor(
            (F.col("n_urls") - F.col("n_content"))
            * F.lit(MICRO)
            / F.col("n_urls")
        )
        .cast("bigint")
        .alias("dup_ratio_micro"),
    ).withColumn(
        "is_trap",
        (F.col("n_urls") >= F.lit(min_urls))
        & (F.col("dup_ratio_micro") >= F.lit(min_dup_ratio_micro)),
    )


def canonical_url_election(
    pages: DataFrame,
    url_col: str,
    text_col: str,
) -> DataFrame:
    """Elect ONE canonical URL per distinct content — the
    content-addressed complement to `redirects.resolve_redirects` (which
    follows what servers declare) and `functions.urls.normalize_url`
    (which folds syntactic spellings): when the same bytes are served
    under several genuinely different URLs (mirrors, tracking-param
    variants, www/apex splits), downstream CDC keying should converge
    on one spelling.

    For every distinct (url, content-fingerprint) observation with
    non-NULL text, emit:

      url             the observed spelling
      canonical_url   the elected spelling for this content: the
                      SHORTEST url serving it, ties broken
                      lexicographically — deterministic, engine-neutral,
                      and the short-then-lex rule matches what humans
                      call canonical (no query string beats query
                      string, apex beats subdomain of equal path)
      n_spellings     how many distinct URLs serve this content

    Rows with NULL text carry no content evidence and are excluded
    (same contract as :func:`host_mirror_pairs`). A URL serving several
    distinct contents over the frame (it changed mid-crawl) gets one
    row PER content — feed LWW-deduped state (`lake.merge.lww_winners`)
    if one-row-per-url is required.

    Scale: everything runs on the distinct narrow (fp, url) frame; the
    election is ONE map-combined min-struct aggregation per fingerprint
    and one fp equi-join back — a hot fingerprint (boilerplate error
    page on 10^6 URLs) is a big group for a partial-aggregating MIN,
    not a window sort, and AQE handles the join-back skew.
    """
    obs = (
        pages.filter(F.col(text_col).isNotNull())
        .select(
            F.md5(F.col(text_col)).alias("__fp"),
            F.col(url_col).alias("url"),
        )
        .distinct()
    )
    elected = obs.groupBy("__fp").agg(
        F.min(F.struct(F.length("url").alias("l"), F.col("url").alias("u")))
        .alias("__win"),
        F.count(F.lit(1)).alias("n_spellings"),
    ).select(
        "__fp", F.col("__win.u").alias("canonical_url"), "n_spellings"
    )
    return obs.join(elected, "__fp").select(
        "url", "canonical_url", "n_spellings"
    )


def soft_error_report(
    pages: DataFrame,
    host_col: str,
    url_col: str,
    text_col: str,
    min_urls: int = 3,
    min_share_micro: int = 150_000,
    max_text_len: int = 256,
) -> DataFrame:
    """Detect soft errors — error/placeholder pages served with HTTP 200
    (`"soft 404s"`), which status-code screening can't catch: per host,
    find content groups where MANY URLs serve ONE short identical text
    (the "Not found" / "Access denied" / empty-template shape). Left in
    a corpus they poison dedup statistics and train the model on error
    boilerplate; flagged here they feed :func:`soft_error_filter` and
    the crawler's URL-space pruning (a URL serving the host's error
    template is a dead frontier branch).

    One row per (host, distinct content) with non-NULL text:

      host, fp          md5 of the exact text (cross-engine key)
      n_urls            distinct URLs of the host serving this text
      n_host_urls       distinct URLs of the host in total
      text_len          characters in the text
      share_micro       floor(1e6 * n_urls / n_host_urls)
      sample_url        lexicographically-smallest URL (inspection)
      is_soft_error     n_urls >= min_urls AND share_micro >=
                        min_share_micro AND text_len <= max_text_len —
                        a SHORT text DOMINATING the host's URL space

    The length gate is what separates an error template from a genuine
    popular page (mirrors of a real article are long); the share gate
    is what separates it from ordinary boilerplate fragments (those are
    screened line-level by `boilerplate.remove_boilerplate_lines`).

    Scale: two map-combined aggregations over the narrow (host, url,
    fp, len) distinct frame — the per-(host, fp) rollup and the
    per-host URL total (host-cardinality rows, broadcast back). A
    platform host with 10^8 URLs is a big GROUP for a partial
    aggregation, never a window sort; payloads reduce to md5+length in
    the scan that read them.
    """
    if min_urls < 1:
        raise ValueError(f"min_urls must be >= 1, got {min_urls}")
    obs = (
        pages.filter(F.col(text_col).isNotNull())
        .select(
            F.col(host_col).alias("host"),
            F.col(url_col).alias("url"),
            F.md5(F.col(text_col)).alias("fp"),
            F.length(F.col(text_col)).cast("bigint").alias("__len"),
        )
        .distinct()
    )
    by_group = obs.groupBy("host", "fp").agg(
        F.countDistinct("url").alias("n_urls"),
        F.min("__len").alias("text_len"),
        F.min("url").alias("sample_url"),
    )
    by_host = obs.groupBy("host").agg(
        F.countDistinct("url").alias("n_host_urls")
    ).withColumnRenamed("host", "__hhost")
    return (
        by_group.join(
            F.broadcast(by_host),
            F.col("host").eqNullSafe(F.col("__hhost")),
        )
        .drop("__hhost")
        .select(
            "host",
            "fp",
            "n_urls",
            "n_host_urls",
            "text_len",
            F.floor(F.col("n_urls") * F.lit(MICRO) / F.col("n_host_urls"))
            .cast("bigint")
            .alias("share_micro"),
            "sample_url",
        )
        .withColumn(
            "is_soft_error",
            (F.col("n_urls") >= F.lit(min_urls))
            & (F.col("share_micro") >= F.lit(min_share_micro))
            & (F.col("text_len") <= F.lit(max_text_len)),
        )
    )


def soft_error_filter(
    pages: DataFrame,
    host_col: str,
    url_col: str,
    text_col: str,
    keep: str = "allowed",
    min_urls: int = 3,
    min_share_micro: int = 150_000,
    max_text_len: int = 256,
) -> DataFrame:
    """Screen pages whose text IS their host's soft-error template
    (:func:`soft_error_report` decides which contents qualify).
    keep='allowed' returns surviving pages, keep='blocked' the screened
    ones, keep='flag' all pages plus a boolean ``soft_error`` column.
    NULL-text pages are never flagged (no content evidence — the
    conservative posture for a filter that feeds deletion).

    Scale: the flagged frame is (host × error-template) sized — tiny —
    and BROADCASTS to the pages; the payload never reshuffles.
    """
    if keep not in ("allowed", "blocked", "flag"):
        raise ValueError(f"keep must be allowed|blocked|flag, got {keep!r}")
    flagged = (
        soft_error_report(
            pages, host_col, url_col, text_col,
            min_urls=min_urls, min_share_micro=min_share_micro,
            max_text_len=max_text_len,
        )
        .filter(F.col("is_soft_error"))
        .select(
            F.col("host").alias("__fhost"),
            F.col("fp").alias("__ffp"),
            F.lit(True).alias("soft_error"),
        )
    )
    out = pages.join(
        F.broadcast(flagged),
        (F.col(host_col) == F.col("__fhost"))
        & (F.md5(F.col(text_col)) == F.col("__ffp")),
        "left",
    ).drop("__fhost", "__ffp").withColumn(
        "soft_error", F.coalesce("soft_error", F.lit(False))
    )
    if keep == "flag":
        return out
    if keep == "blocked":
        return out.filter(F.col("soft_error")).drop("soft_error")
    return out.filter(~F.col("soft_error")).drop("soft_error")
