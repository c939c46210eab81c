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
