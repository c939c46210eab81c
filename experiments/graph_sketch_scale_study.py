#!/usr/bin/env python
"""Scale-stress study for the wave-2/3 operators (pagerank_micro,
novelty_scores, pmi_collocations, count_min_build): 1x vs ~10x input,
interleaved reps, min per cell (BASELINE.md shared-box protocol).

Claims under test:
  - pagerank_micro: a PageRank iteration is one edges-by-src equi-join
    + one partial-combined SUM by dst + one left join — so marginal
    PER-ITERATION cost grows AT MOST linearly with the node/edge count
    (isolated by differencing t(4 iters) − t(1 iter) over 3, which
    cancels the edge-build and session fixed cost).
  - novelty_scores: explode + one MIN agg per shingle + one count agg
    per doc — whole-operator cost at most linear in corpus size even
    though verbatim replicas multiply every shingle's document
    frequency 10x (the hot shingle only ever carries (shingle, min_id)).
  - pmi_collocations: two counting aggregations over the token/bigram
    streams with a bounded post-floor join — at most linear.
  - count_min_build: the map-side combine collapses ANY input to ≤
    depth·width rows per task — at most linear scan cost, and the
    result stays ≤ depth·width rows at every scale (also asserted).

ngram_containment_pairs is deliberately NOT in this study: verbatim
replicas make every replica pair mutually contained (a quadratic
DATA artifact, not a plan property), and its plan is the same
inverted-index + stop-shingle class `experiments/dedup_scale_study.py`
already stress-covers with disjoint replicas.

Prints one JSON line (also to $GRAPHSCALE_OUT).
Run:  taskset -c 0-15 python experiments/graph_sketch_scale_study.py
Env:  GRAPHSCALE_SF_DIR (default /root/testdata/sf0.1),
      GRAPHSCALE_REPLICAS (default 10), GRAPHSCALE_REPS (default 2).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from csv_cruncher_spark.session import get_spark  # noqa: E402
from csv_cruncher_spark.operators import dedup, graph, sketch, textstats  # noqa: E402

SF_DIR = os.environ.get("GRAPHSCALE_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = int(os.environ.get("GRAPHSCALE_REPLICAS", "10"))
REPS = int(os.environ.get("GRAPHSCALE_REPS", "2"))


def _replicate_docs(spark, out_dir: str, replicas: int) -> str:
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    rep = docs.crossJoin(
        spark.range(replicas).withColumnRenamed("id", "rep")
    ).select(
        (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
        "text",
    )
    path = os.path.join(out_dir, f"docs_{replicas}x")
    rep.write.mode("overwrite").parquet(path)
    return path


def _time(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main() -> None:
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="graphscale_", dir=base)
    spark = get_spark(
        app_name="graph-sketch-scale-study",
        extra_conf={"spark.local.dir": os.path.join(work, "local")},
    )
    try:
        docs1 = os.path.join(SF_DIR, "documents.parquet")
        docsN = _replicate_docs(spark, work, REPLICAS)

        def pr_at(path: str, iters: int) -> float:
            df = spark.read.parquet(path)
            return _time(
                lambda: graph.pagerank_micro(
                    df, "doc_id", iterations=iters
                ).agg(F.sum("rank_micro")).collect()
            )

        def nov_at(path: str) -> float:
            df = spark.read.parquet(path)
            return _time(
                lambda: dedup.novelty_scores(df, "doc_id", "text")
                .agg(F.sum("n_novel")).collect()
            )

        def pmi_at(path: str) -> float:
            df = spark.read.parquet(path)
            return _time(
                lambda: textstats.pmi_collocations(
                    df, "text", min_count=5, top_k=50
                ).collect()
            )

        def cms_at(path: str) -> float:
            df = spark.read.parquet(path)
            rows = sketch.count_min_build(df, "text", depth=4, width=1024)
            t0 = time.perf_counter()
            n_cells = rows.count()
            cms_cells[path] = n_cells
            return time.perf_counter() - t0

        cms_cells: dict[str, int] = {}
        cells: dict[str, float] = {}
        for _ in range(REPS):
            for key, fn in [
                ("pr_1x_1i", lambda: pr_at(docs1, 1)),
                ("pr_Nx_1i", lambda: pr_at(docsN, 1)),
                ("pr_1x_4i", lambda: pr_at(docs1, 4)),
                ("pr_Nx_4i", lambda: pr_at(docsN, 4)),
                ("nov_1x", lambda: nov_at(docs1)),
                ("nov_Nx", lambda: nov_at(docsN)),
                ("pmi_1x", lambda: pmi_at(docs1)),
                ("pmi_Nx", lambda: pmi_at(docsN)),
                ("cms_1x", lambda: cms_at(docs1)),
                ("cms_Nx", lambda: cms_at(docsN)),
            ]:
                t = fn()
                cells[key] = min(cells.get(key, float("inf")), t)

        pr_iter_1x = (cells["pr_1x_4i"] - cells["pr_1x_1i"]) / 3
        pr_iter_Nx = (cells["pr_Nx_4i"] - cells["pr_Nx_1i"]) / 3

        def ratio(a: float, b: float) -> float | None:
            return round(b / a, 2) if a > 0 else None

        out = {
            "replicas": REPLICAS,
            "reps": REPS,
            "cells_sec": {k: round(v, 3) for k, v in cells.items()},
            "pagerank_iter_sec_1x": round(pr_iter_1x, 3),
            "pagerank_iter_sec_10x": round(pr_iter_Nx, 3),
            "pagerank_iter_ratio": ratio(pr_iter_1x, pr_iter_Nx),
            "novelty_ratio": ratio(cells["nov_1x"], cells["nov_Nx"]),
            "pmi_ratio": ratio(cells["pmi_1x"], cells["pmi_Nx"]),
            "cms_ratio": ratio(cells["cms_1x"], cells["cms_Nx"]),
            "cms_cells_1x": cms_cells.get(docs1),
            "cms_cells_10x": cms_cells.get(docsN),
            "cms_cells_bound": 4 * 1024,
        }
        line = json.dumps(out)
        print(line)
        dst = os.environ.get("GRAPHSCALE_OUT")
        if dst:
            with open(dst, "w") as f:
                f.write(line + "\n")
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
