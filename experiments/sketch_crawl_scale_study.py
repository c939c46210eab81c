#!/usr/bin/env python
"""Scale-stress study for the wave-4 operators (hll_build,
crawl_schedule): 1x vs ~10x input, interleaved reps, min per cell
(BASELINE.md shared-box protocol).

Claims under test:
  - hll_build: ONE partial-combined aggregation whose key space is
    |groups|·m — build cost at most linear in input size, and the
    register count stays ≤ |groups|·m at EVERY scale (asserted, not
    assumed) — the bounded-memory property that makes a 10^10-URL
    distinct count hold in a few KB per group.
  - crawl_schedule: per-(host, priority) COUNT + cumulative offset over
    the aggregated frame + tie-class window, all narrow — at most
    linear even though replication multiplies every host's frontier 10x
    AND inflates tie classes 10x (replicas share n_chars, the priority,
    differing only in id — the worst case for the tie window).

Prints one JSON line (also to $SKETCHSCALE_OUT).
Run:  taskset -c 16-31 python experiments/sketch_crawl_scale_study.py
      (the BASELINE.md wave-4 table was recorded on cores 16-31; pin to
      the same half-socket to reproduce comparable 1x/10x ratios)
Env:  SKETCHSCALE_SF_DIR (default /root/testdata/sf0.1),
      SKETCHSCALE_REPLICAS (default 10), SKETCHSCALE_REPS (default 2).
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
from csv_cruncher_spark.operators import crawl, sketch  # noqa: E402

SF_DIR = os.environ.get("SKETCHSCALE_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = int(os.environ.get("SKETCHSCALE_REPLICAS", "10"))
REPS = int(os.environ.get("SKETCHSCALE_REPS", "2"))
M = 1024


def _replicate_docs(spark, out_dir: str, replicas: int) -> str:
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    rep = docs.crossJoin(
        spark.range(replicas).withColumnRenamed("id", "rep")
    ).select(
        (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
        "source",
        "n_chars",
        "text",
    )
    path = os.path.join(out_dir, f"docs_{replicas}x")
    rep.write.mode("overwrite").parquet(path)
    return path


def main() -> None:
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="sketchscale_", dir=base)
    spark = get_spark(
        app_name="sketch-crawl-scale-study",
        extra_conf={"spark.local.dir": os.path.join(work, "local")},
    )
    try:
        docs1 = os.path.join(SF_DIR, "documents.parquet")
        docsN = _replicate_docs(spark, work, REPLICAS)
        hll_regs: dict[str, int] = {}

        def hll_at(path: str) -> float:
            df = spark.read.parquet(path)
            toks = df.select(
                "source", F.explode(F.split("text", " ")).alias("tok")
            )
            regs = sketch.hll_build(toks, "tok", m=M, group_cols=("source",))
            t0 = time.perf_counter()
            hll_regs[path] = regs.count()
            return time.perf_counter() - t0

        def crawl_at(path: str) -> float:
            df = spark.read.parquet(path)
            frontier = df.select(
                "doc_id",
                F.col("source").alias("host"),
                F.col("n_chars").cast("double").alias("prio"),
                "text",
            )
            out = crawl.crawl_schedule(
                frontier, "host", "prio", "doc_id", per_host_budget=25
            )
            return_time = time.perf_counter()
            out.agg(F.max("slot"), F.count(F.lit(1))).collect()
            return time.perf_counter() - return_time

        cells: dict[str, float] = {}
        for _ in range(REPS):
            for key, fn in [
                ("hll_1x", lambda: hll_at(docs1)),
                ("hll_Nx", lambda: hll_at(docsN)),
                ("crawl_1x", lambda: crawl_at(docs1)),
                ("crawl_Nx", lambda: crawl_at(docsN)),
            ]:
                t = fn()
                cells[key] = min(cells.get(key, float("inf")), t)

        n_groups = (
            spark.read.parquet(docs1).select("source").distinct().count()
        )

        def ratio(a: float, b: float) -> float | None:
            return round(b / a, 2) if a > 0 else None

        out = {
            "replicas": REPLICAS,
            "reps": REPS,
            "cells_sec": {k: round(v, 3) for k, v in cells.items()},
            "hll_ratio": ratio(cells["hll_1x"], cells["hll_Nx"]),
            "crawl_ratio": ratio(cells["crawl_1x"], cells["crawl_Nx"]),
            "hll_regs_1x": hll_regs.get(docs1),
            "hll_regs_10x": hll_regs.get(docsN),
            "hll_regs_bound": n_groups * M,
            "hll_regs_invariant": hll_regs.get(docs1) == hll_regs.get(docsN),
        }
        assert hll_regs[docs1] <= n_groups * M
        assert hll_regs[docsN] <= n_groups * M
        line = json.dumps(out)
        print(line)
        dst = os.environ.get("SKETCHSCALE_OUT")
        if dst:
            with open(dst, "w") as f:
                f.write(line + "\n")
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
