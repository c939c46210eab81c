"""Incrementally-maintained link graph over the change feed — the
CDC-side twin of ``operators.links.extract_outlinks``.

The crawl loop's graph analytics (`operators/graph.py` PageRank/HITS,
`operators/links.py` frontier discovery) want the (src, dst) edge list
to FOLLOW the lake table as change batches land, without re-parsing
every stored page's html per iteration. Unlike the vocabulary view
(counting algebra), edges are a PURE PER-KEY FUNCTION of the page:
maintenance is keyed replacement — drop every edge whose src appears in
the feed, re-extract edges from the feed's post-image html. No
retraction arithmetic, no pre-images needed.

Scale shape per refresh: html parsing touches ONLY the changed pages
(batch-sized map work — the whole point); the stored edge frame crosses
one LEFT ANTI equi-join on the src key against the batch's changed-key
set (broadcast when the batch is small — Spark decides) plus the
rewrite of the store. Never a corpus re-parse after bootstrap. The
equivalence suite (tests/test_links_view.py) pins maintained ≡
``extract_outlinks(table.read())`` after every refresh, including edge
death on delete and edge replacement on update.

The reference engine re-imports and recomputes per run
(``Cruncher.kt:59``); this is part of the from-scratch incremental
surface the north rule asks for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.links import extract_outlinks
from .ivm import MaintainedAggregate

__all__ = [
    "compute_link_graph",
    "apply_links_delta",
    "MaintainedLinkGraph",
]


def compute_link_graph(
    state: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Bootstrap (src, dst) from a full state read — exactly
    ``extract_outlinks`` with the edge-list column names."""
    return extract_outlinks(state, url_col, html_col).select(
        F.col("url").alias("src"), F.col("outlink").alias("dst")
    )


def apply_links_delta(
    edges: DataFrame,
    changes: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """Fold one change batch (the ``changes_between``/``diff_states``
    feed shape: ``__op`` + post columns, key always present) into a
    maintained edge frame: every fed key's old edges drop (delete,
    update, even a re-insert), post-image html re-extracts. Exact for
    any mix of I/U/D — the post-state edges of unchanged pages are
    untouched by construction."""
    changed = changes.select(F.col(url_col).alias("__ck")).distinct()
    kept = edges.join(
        changed, edges["src"] == changed["__ck"], "left_anti"
    )
    fresh = compute_link_graph(
        changes.filter(F.col("__op") != "D"), url_col, html_col
    )
    return kept.unionByName(fresh)


class MaintainedLinkGraph(MaintainedAggregate):
    """Durable incrementally-maintained link graph over a
    :class:`~csv_cruncher_spark.lake.table.LakeTable` — the operational
    contract of :class:`~csv_cruncher_spark.lake.ivm.MaintainedAggregate`
    (epoch-named parquet versions behind an atomically-swapped pointer,
    idempotent per epoch, tailer-loop compatible), with the maintained
    frame being the (src, dst) outlink edge list. Pre-images are NOT
    requested from the feed — keyed replacement needs only the post
    side."""

    def __init__(
        self,
        table_path: str,
        store_path: str,
        url_col: str = "url",
        html_col: str = "html",
    ):
        super().__init__(table_path, store_path, group_cols=["src"], sums={})
        self.url_col = url_col
        self.html_col = html_col

    def bootstrap(self, spark) -> int:
        from .table import LakeTable

        table = LakeTable.load(self.table_path)
        epoch = table.snapshot()["epoch_id"]
        edges = compute_link_graph(
            table.read(spark), self.url_col, self.html_col
        )
        self._persist(edges, epoch)
        return epoch

    def refresh(self, spark) -> int:
        from .table import LakeTable

        st = self.state()
        if st is None:
            return self.bootstrap(spark)
        table = LakeTable.load(self.table_path)
        cur = table.snapshot()["epoch_id"]
        last = st["epoch"]
        if cur == last:
            return last
        feed = table.changes_between(spark, from_epoch=last, to_epoch=cur)
        edges = apply_links_delta(
            self.read(spark), feed, self.url_col, self.html_col
        )
        self._persist(edges, cur)
        return cur
