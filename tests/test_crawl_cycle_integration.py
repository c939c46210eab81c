"""End-to-end crawl-cycle integration: every stage of the crawl loop
through the REAL machinery, chained the way a production deployment
chains them — no mocks, no shortcuts:

  1. crawl snapshot 0 (link-bearing HTML) lands as a CSV change batch
     → CdcPipeline bootstrap (real Arrow html→text extraction, real
     MOR merge, exactly-once checkpoint);
  2. MaintainedLinkGraph bootstraps off the lake and the discovered
     frontier (outlinks minus known urls) feeds trap-aware politeness
     scheduling → crawl-delay ETAs → the timeline audits itself clean
     under its own rate cap;
  3. recrawl snapshot 1 diffs against the lake state
     (snapshot_to_changes), applies as batch 2, the link graph
     refreshes INCREMENTALLY and equals a from-scratch recompute, and
     the host URL-churn report sees exactly the adds/deletes;
  4. re-running the same batch dir is a no-op (exactly-once fence:
     snapshot id does not advance).
"""

import base64
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from csv_cruncher_spark.cdc.pipeline import CdcPipeline  # noqa: E402
from csv_cruncher_spark.lake.links_view import (  # noqa: E402
    MaintainedLinkGraph,
    compute_link_graph,
)
from csv_cruncher_spark.lake.table import LakeTable  # noqa: E402
from csv_cruncher_spark.operators.crawl import (  # noqa: E402
    host_rate_audit,
    schedule_eta,
    trap_aware_schedule,
)
from csv_cruncher_spark.operators.links import discovered_frontier  # noqa: E402
from csv_cruncher_spark.operators.snapshot import (  # noqa: E402
    url_churn_report,
)

HOSTS = [f"h{i}.com" for i in range(3)]


def _html(i: int, links: list[str], body: str = "body") -> str:
    anchors = "".join(f'<a href="{u}">x</a>' for u in links)
    return f"<p>{body} {i}</p>{anchors}"


def _write_batch(path: str, rows: list[dict]) -> None:
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["op", "url", "warc_ts", "html", "lang"])
        w.writeheader()
        w.writerows(rows)


def _event(op: str, url: str, ts: str, html: str | None, lang: str = "en"):
    return {
        "op": op,
        "url": url,
        "warc_ts": ts,
        "html": base64.b64encode(html.encode()).decode() if html else "",
        "lang": lang if html else "",
    }


def test_full_crawl_cycle(spark, tmp_path):
    batches = str(tmp_path / "batches")
    os.makedirs(batches)
    lake = str(tmp_path / "lake")

    # --- snapshot 0: 12 pages across 3 hosts; each page links to its
    # neighbour and to one NOT-yet-crawled url on h9.com (the frontier)
    def url(h, i):
        return f"https://{HOSTS[h]}/{i}"

    rows0 = []
    for i in range(12):
        h = i % 3
        links = [url(h, i + 3), f"https://h9.com/new{i % 4}"]
        rows0.append(
            _event("I", url(h, i), "2026-01-01 00:00:%02d" % i,
                   _html(i, links))
        )
    _write_batch(os.path.join(batches, "b-000.csv"), rows0)

    pipe = CdcPipeline(lake, n_buckets=4)
    pipe.run(spark, batches)
    table = LakeTable.load(lake)
    state0 = table.read(spark)
    assert state0.count() == 12
    # real extraction ran: anchors are gone from text, body survives
    texts = {r.url: r.text for r in state0.collect()}
    assert texts[url(0, 0)].startswith("body 0")
    assert "<a" not in texts[url(0, 0)] and "href" not in texts[url(0, 0)]

    # --- maintained link graph bootstraps off the lake
    lg = MaintainedLinkGraph(lake, str(tmp_path / "links"))
    lg.bootstrap(spark)
    edges0 = {(r.src, r.dst) for r in lg.read(spark).collect()}
    assert (url(0, 0), "https://h9.com/new0") in edges0
    assert len(edges0) == 24  # 2 outlinks per page

    # --- frontier discovery: h9.com urls are linked but never crawled
    # (pages 9-11 also link one past-the-end neighbour on their own host)
    disc = {r.host: r.n_new_urls for r in
            discovered_frontier(state0, "url", "html").collect()}
    assert disc == {"h9.com": 4, "h0.com": 1, "h1.com": 1, "h2.com": 1}
    from csv_cruncher_spark.operators.links import extract_outlinks

    new_urls = (
        extract_outlinks(state0, "url", "html")
        .select("outlink").distinct()
        .join(state0.select(F.col("url").alias("outlink")).distinct(),
              "outlink", "left_anti")
    )
    assert {r.outlink for r in new_urls.collect()} == (
        {f"https://h9.com/new{k}" for k in range(4)}
        | {url(h, i) for h, i in ((0, 12), (1, 13), (2, 14))}
    )

    # --- schedule the frontier politely (trap report over crawled pages
    # finds no trap here — budgets stay default), then timeline + audit
    fr = new_urls.select(
        F.col("outlink").alias("url_id"),
        F.lit("h9.com").alias("host"),
        F.length("outlink").cast("long").alias("prio"),
    )
    sched = trap_aware_schedule(
        fr, "host", "prio", "url_id",
        state0.select("url", "text").withColumn(
            "host", F.regexp_extract("url", r"https://([^/]*)/", 1)
        ), "host", "url", "text",
        per_host_budget=2, trap_budget=1,
    )
    timeline = schedule_eta(sched, "host", default_delay_s=10, t0=1000)
    audit = host_rate_audit(
        timeline.select("host", F.col("eta_ts").alias("ts")),
        "host", "ts", window_s=10, max_per_window=2,
    )
    assert audit.agg(F.sum("n_violations")).head()[0] == 0

    # --- snapshot 1: page 0 changes, page 1 vanishes, one frontier url
    # arrives; diff against the LAKE STATE and apply through the pipeline
    from csv_cruncher_spark.operators.snapshot import snapshot_to_changes

    new_rows = []
    for i in range(12):
        if i == 1:
            continue  # deleted
        h = i % 3
        body = "body" if i != 0 else "edited"
        links = [url(h, i + 3), f"https://h9.com/new{i % 4}"]
        new_rows.append((url(h, i), _html(i, links, body).encode(),
                         "2026-01-02 00:00:00", "en"))
    new_rows.append(("https://h9.com/new0", b"<p>fresh</p>",
                     "2026-01-02 00:00:00", "en"))
    snap1 = spark.createDataFrame(
        new_rows, "url string, html binary, warc_ts string, lang string"
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))

    old = state0.select("url", "warc_ts", "html", "lang")
    # a recrawl bumps every warc_ts; only CONTENT decides changed-ness
    batch = snapshot_to_changes(
        old, snap1.select("url", "warc_ts", "html", "lang"),
        delete_ts="2026-01-02 00:00:01",
        compare_cols=["html", "lang"],
    )
    got_ops = {r["url"]: r["op"] for r in batch.collect()}
    assert got_ops[url(0, 0)] == "U"
    assert got_ops[url(1, 1)] == "D"
    assert got_ops["https://h9.com/new0"] == "I"
    assert len(got_ops) == 3  # unchanged pages emit nothing

    _write_batch(
        os.path.join(batches, "b-001.csv"),
        [
            _event(
                r["op"], r["url"],
                r["warc_ts"].strftime("%Y-%m-%d %H:%M:%S"),
                bytes(r["html"]).decode() if r["html"] is not None else None,
                r["lang"] or "",
            )
            for r in batch.collect()
        ],
    )
    pipe.run(spark, batches)
    state1 = LakeTable.load(lake).read(spark)
    assert state1.count() == 12  # 12 - 1 deleted + 1 new
    t1 = {r.url: r.text for r in state1.collect()}
    assert t1[url(0, 0)].startswith("edited 0")
    assert url(1, 1) not in t1
    assert t1["https://h9.com/new0"] == "fresh"

    # --- incremental link-graph refresh equals recompute from scratch
    lg.refresh(spark)
    maintained = {(r.src, r.dst) for r in lg.read(spark).collect()}
    recomputed = {
        (r.src, r.dst)
        for r in compute_link_graph(state1, "url", "html").collect()
    }
    assert maintained == recomputed
    assert not any(src == url(1, 1) for src, _ in maintained)  # edges died

    # --- churn report sees exactly the adds/deletes per host
    churn = {
        r.host: r
        for r in url_churn_report(
            old.withColumn("host", F.regexp_extract("url", r"https://([^/]*)/", 1)),
            state1.withColumn("host", F.regexp_extract("url", r"https://([^/]*)/", 1)),
            "host", "url",
        ).collect()
    }
    assert churn["h1.com"].n_removed == 1 and churn["h1.com"].n_added == 0
    assert churn["h9.com"].n_added == 1 and churn["h9.com"].n_old == 0
    assert churn["h0.com"].churn_micro == 0  # content changed, urls stable

    # --- exactly-once: replaying the same dir advances nothing
    snap_before = LakeTable.load(lake).snapshot()["snapshot_id"]
    pipe.run(spark, batches)
    assert LakeTable.load(lake).snapshot()["snapshot_id"] == snap_before
