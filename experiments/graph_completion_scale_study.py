#!/usr/bin/env python
"""Scale-stress study for the graph-completion wave (bfs_depth,
contract_host_graph, pagerank_weighted): 1x vs 10x input, interleaved
reps, min per cell (BASELINE.md shared-box protocol).

Claims under test:

  - bfs_depth: per-round cost is O(edges out of the frontier) — total
    work is bounded by the reached set's out-edges, so 10x nodes with
    the same seed DENSITY (node % 41) grows wall at most linearly;
  - contract_host_graph: a projection + ONE map-combined aggregation —
    linear in the edge count, with the output bounded by the host-pair
    space regardless of input size;
  - pagerank_weighted: per iteration ONE edges⋈ranks equi-join + one
    partial-agg — linear in |E| per iteration, the canonical
    Pregel-as-DataFrame bound (same shape pagerank_micro proved in
    experiments/graph_sketch_scale_study.py, now with the degree join).

Prints one JSON line (also to $GRAPHCOMP_OUT).
Run:  taskset -c 0-15 python experiments/graph_completion_scale_study.py
Env:  GRAPHCOMP_N (base node count, default 100000),
      GRAPHCOMP_REPS (default 2).
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
from csv_cruncher_spark.operators.graph import (  # noqa: E402
    bfs_depth,
    derive_link_graph,
    pagerank_weighted,
)
from csv_cruncher_spark.operators.links import contract_host_graph  # noqa: E402

BASE_N = int(os.environ.get("GRAPHCOMP_N", "100000"))
REPS = int(os.environ.get("GRAPHCOMP_REPS", "2"))


def _url_edges(spark, n: int, out_dir: str) -> str:
    """Deterministic url-level edge list: n src pages over 200 hosts,
    3 outlinks each onto 1000 hub hosts — the host-pair space is fixed
    while the edge count scales with n (the contraction's linear term)."""
    e = (
        spark.range(n)
        .crossJoin(spark.range(3).withColumnRenamed("id", "slot"))
        .select(
            F.concat(
                F.lit("https://src"),
                (F.col("id") % 200).cast("string"),
                F.lit(".example.com/p/"),
                F.col("id").cast("string"),
            ).alias("url"),
            F.concat(
                F.lit("https://hub"),
                ((F.col("id") * 3 + F.col("slot")) % 1000).cast("string"),
                F.lit(".example.org/x/"),
                ((F.col("id") + F.col("slot")) % 97).cast("string"),
            ).alias("outlink"),
        )
    )
    out = os.path.join(out_dir, f"edges_{n}")
    e.write.mode("overwrite").parquet(out)
    return out


def _time(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main() -> None:
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="graphcomp_", dir=base)
    spark = get_spark(
        app_name="graph-completion-scale-study",
        extra_conf={"spark.local.dir": os.path.join(work, "local")},
    )
    try:
        p1 = _url_edges(spark, BASE_N, work)
        pN = _url_edges(spark, BASE_N * 10, work)

        def bfs_at(n):
            docs = spark.range(n).select(F.col("id").alias("doc_id"))
            seeds = docs.select(F.col("doc_id").alias("seed")).where(
                F.col("doc_id") % 41 == 0
            )
            return _time(
                lambda: bfs_depth(docs, "doc_id", max_rounds=3, seeds=seeds)
                .agg(F.count("depth"))
                .collect()
            )

        def contract_at(path):
            df = spark.read.parquet(path)
            return _time(
                lambda: contract_host_graph(df)
                .agg(F.sum("n_links"))
                .collect()
            )

        def wpr_at(n):
            docs = spark.range(n).select(F.col("id").alias("doc_id"))
            e = derive_link_graph(docs, "doc_id", out_degree=3)
            return _time(
                lambda: pagerank_weighted(
                    e, nodes=spark.range(n), iterations=3
                )
                .agg(F.sum("rank_micro"))
                .collect()
            )

        cells: dict[str, float] = {}
        for _ in range(REPS):
            for key, fn in [
                ("bfs_1x", lambda: bfs_at(BASE_N)),
                ("bfs_10x", lambda: bfs_at(BASE_N * 10)),
                ("contract_1x", lambda: contract_at(p1)),
                ("contract_10x", lambda: contract_at(pN)),
                ("wpr_1x", lambda: wpr_at(BASE_N)),
                ("wpr_10x", lambda: wpr_at(BASE_N * 10)),
            ]:
                cells[key] = min(cells.get(key, float("inf")), fn())

        def ratio(a, b):
            return round(b / a, 2) if a > 0 else None

        out = {
            "study": "graph_completion_scale",
            "base_n": BASE_N,
            "cells_s": {k: round(v, 3) for k, v in sorted(cells.items())},
            "ratios_at_10x": {
                op: ratio(cells[f"{op}_1x"], cells[f"{op}_10x"])
                for op in ("bfs", "contract", "wpr")
            },
        }
        line = json.dumps(out)
        print(line)
        dest = os.environ.get("GRAPHCOMP_OUT")
        if dest:
            with open(dest, "w") as f:
                f.write(line + "\n")
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
