"""Incrementally-maintained link graph (lake/links_view.py).

The load-bearing invariant, on pure-DataFrame diffs and against the
REAL table feed:

    apply_links_delta(compute_link_graph(pre), changes(pre->post))
        == compute_link_graph(post)

including edge death on delete, edge replacement on update, a page
losing all its links, and the durable MaintainedLinkGraph following a
multi-batch replay through the real merge path batch-by-batch.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from csv_cruncher_spark.lake import ivm, links_view
from csv_cruncher_spark.lake.table import LakeTable


def _edges(df):
    return {(r["src"], r["dst"]) for r in df.collect()}


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


A = '<a href="https://t.com/a">a</a>'
B = '<a href="https://t.com/b">b</a>'
C = '<a href="/local">c</a>'


def test_links_delta_fold_equals_recompute(spark):
    pre = _pages(
        spark,
        [
            ("https://s.com/1", A + B),
            ("https://s.com/2", A),
            ("https://s.com/3", C),
        ],
    )
    post = _pages(
        spark,
        [
            ("https://s.com/1", B),          # loses the a-edge
            ("https://s.com/2", A),          # unchanged
            ("https://s.com/4", A + C),      # /3 deleted, /4 inserted
        ],
    )
    changes = ivm.diff_states(pre, post, "url")
    got = links_view.apply_links_delta(
        links_view.compute_link_graph(pre), changes
    )
    want = links_view.compute_link_graph(post)
    assert _edges(got) == _edges(want)
    e = _edges(got)
    assert ("https://s.com/1", "https://t.com/a") not in e  # replaced
    assert ("https://s.com/3", "https://s.com/3/local") not in e  # deleted
    assert ("https://s.com/4", "https://s.com/local") in e  # root-relative


def test_links_delta_page_losing_all_links(spark):
    pre = _pages(spark, [("https://s.com/1", A)])
    post = _pages(spark, [("https://s.com/1", "<p>no links now</p>")])
    got = links_view.apply_links_delta(
        links_view.compute_link_graph(pre),
        ivm.diff_states(pre, post, "url"),
    )
    assert _edges(got) == set()


def test_maintained_linkgraph_follows_real_merges(spark, tmp_path):
    from csv_cruncher_spark.cdc.pipeline import PAGES_FIELDS
    from csv_cruncher_spark.lake.merge import apply_batch_mor

    lake = str(tmp_path / "lake")
    t = LakeTable.create(lake, PAGES_FIELDS, n_buckets=2)
    lv = links_view.MaintainedLinkGraph(lake, str(tmp_path / "store"))

    def batch(rows):
        df = spark.createDataFrame(
            rows, "op string, url string, html string"
        ).select(
            "op",
            "url",
            F.lit(datetime.datetime(2026, 1, 1)).alias("warc_ts"),
            F.encode("html", "UTF-8").alias("html"),
            F.lit("en").alias("lang"),
            F.monotonically_increasing_id().alias("row_idx"),
        )
        return df

    seq = [
        [("I", "https://s.com/1", A + B), ("I", "https://s.com/2", C)],
        [("U", "https://s.com/1", B), ("I", "https://s.com/3", A)],
        [("D", "https://s.com/2", ""), ("U", "https://s.com/3", "<p>none</p>")],
    ]
    for i, rows in enumerate(seq):
        apply_batch_mor(spark, t, batch(rows), epoch_id=i, batch_id=f"b{i}")
        t = LakeTable.load(lake)
        epoch = lv.refresh(spark)
        assert epoch == t.snapshot()["epoch_id"]
        want = links_view.compute_link_graph(t.read(spark))
        assert _edges(lv.read(spark)) == _edges(want), f"after batch {i}"
    # final state: /1 -> b only; /2 gone; /3 linkless
    assert _edges(lv.read(spark)) == {("https://s.com/1", "https://t.com/b")}
    # idempotent
    assert lv.refresh(spark) == epoch
