#!/usr/bin/env python
"""Scale-stress study for the round-5 crawl-ops wave
(canonicalize_by_profile, soft_error_report, cdx_index,
url_churn_report, fetch_retry_plan, adaptive_recrawl_plan):
1x vs ~10x input, interleaved reps, min per cell (BASELINE.md
shared-box protocol).

Claims under test — every operator in the wave is a pure projection
plus one-to-three map-combined aggregations on keys that cannot
concentrate payloads, so whole-operator cost grows AT MOST linearly
with input size:

  - canonicalize_by_profile: ONE (host, param) profile aggregation +
    a zero-shuffle literal rewrite;
  - soft_error_report: two count-distinct aggregations on (host, fp) /
    (host) over the narrow md5+length projection;
  - cdx_index: a projection + one range repartition (the sort is
    within partitions whose count scales with input);
  - url_churn_report: join-free — union + two counting aggregations;
  - fetch_retry_plan: per-url head aggregation + trailing-count
    aggregation (the join key is the uniform url);
  - adaptive_recrawl_plan: the estimator aggregation + the schedule's
    decomposed payload-free rank.

Prints one JSON line (also to $CRAWLOPS_OUT).
Run:  taskset -c 0-15 python experiments/crawl_ops_scale_study.py
Env:  CRAWLOPS_SF_DIR (default /root/testdata/sf0.1),
      CRAWLOPS_REPLICAS (default 10), CRAWLOPS_REPS (default 2).
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
from csv_cruncher_spark.operators.crawl import (  # noqa: E402
    adaptive_recrawl_plan,
    fetch_retry_plan,
)
from csv_cruncher_spark.operators.mirrors import soft_error_report  # noqa: E402
from csv_cruncher_spark.operators.snapshot import url_churn_report  # noqa: E402
from csv_cruncher_spark.operators.urlfilter import (  # noqa: E402
    canonicalize_by_profile,
)
from csv_cruncher_spark.sources.warc import cdx_index  # noqa: E402

SF_DIR = os.environ.get("CRAWLOPS_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = int(os.environ.get("CRAWLOPS_REPLICAS", "10"))
REPS = int(os.environ.get("CRAWLOPS_REPS", "2"))


def _pages(spark, path: str, replicas: int, out_dir: str) -> str:
    docs = spark.read.parquet(path).crossJoin(
        spark.range(replicas).withColumnRenamed("id", "rep")
    ).select(
        (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
        "source",
        "text",
    )
    pages = docs.select(
        F.concat("source", F.lit(".example.com")).alias("host"),
        F.concat(
            F.lit("https://"), "source", F.lit(".example.com/"),
            F.col("doc_id").cast("string"),
            F.lit("?sid="), F.col("doc_id").cast("string"),
            F.lit("&page="), (F.col("doc_id") % 7).cast("string"),
        ).alias("url"),
        F.when(F.col("doc_id") % 7 == 0, F.lit("404 not found"))
        .otherwise(F.col("text")).alias("text"),
        (F.lit(1_700_000_000) + F.col("doc_id") % 100_000).cast("long")
        .alias("warc_ts"),
        (F.col("doc_id") % 5 != 0).alias("ok"),
    )
    out = os.path.join(out_dir, f"pages_{replicas}x")
    pages.write.mode("overwrite").parquet(out)
    return out


def _time(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main() -> None:
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="crawlops_", dir=base)
    spark = get_spark(
        app_name="crawl-ops-scale-study",
        extra_conf={"spark.local.dir": os.path.join(work, "local")},
    )
    try:
        src = os.path.join(SF_DIR, "documents.parquet")
        p1 = _pages(spark, src, 1, work)
        pN = _pages(spark, src, REPLICAS, work)

        def canon_at(path):
            df = spark.read.parquet(path)
            return _time(
                lambda: canonicalize_by_profile(df, "host", "url")
                .agg(F.count("canonical_url")).collect()
            )

        def soft_at(path):
            df = spark.read.parquet(path)
            return _time(
                lambda: soft_error_report(df, "host", "url", "text")
                .agg(F.sum(F.col("is_soft_error").cast("int"))).collect()
            )

        def cdx_at(path):
            df = spark.read.parquet(path)
            return _time(
                lambda: cdx_index(df, "url", "warc_ts", "text")
                .agg(F.sum("length_bytes")).collect()
            )

        def churn_at(path):
            df = spark.read.parquet(path)
            new = df.filter(F.col("ok"))
            return _time(
                lambda: url_churn_report(df, new, "host", "url")
                .agg(F.sum("churn_micro")).collect()
            )

        def retry_at(path):
            df = spark.read.parquet(path)
            return _time(
                lambda: fetch_retry_plan(df, "url", "warc_ts", "ok")
                .groupBy("state").count().collect()
            )

        def recrawl_at(path):
            df = spark.read.parquet(path)
            visits = df.select(
                "url", "warc_ts", (F.col("warc_ts") % 2 == 0).alias("ch")
            ).unionByName(
                df.select(
                    "url", (F.col("warc_ts") + 3600).alias("warc_ts"),
                    (F.col("warc_ts") % 3 == 0).alias("ch"),
                )
            )
            return _time(
                lambda: adaptive_recrawl_plan(
                    visits, "url", "warc_ts", "ch", now_ts=1_800_000_000
                ).agg(F.max("slot")).collect()
            )

        cells: dict[str, float] = {}
        for _ in range(REPS):
            for key, fn in [
                ("canon_1x", lambda: canon_at(p1)),
                ("canon_Nx", lambda: canon_at(pN)),
                ("soft_1x", lambda: soft_at(p1)),
                ("soft_Nx", lambda: soft_at(pN)),
                ("cdx_1x", lambda: cdx_at(p1)),
                ("cdx_Nx", lambda: cdx_at(pN)),
                ("churn_1x", lambda: churn_at(p1)),
                ("churn_Nx", lambda: churn_at(pN)),
                ("retry_1x", lambda: retry_at(p1)),
                ("retry_Nx", lambda: retry_at(pN)),
                ("recrawl_1x", lambda: recrawl_at(p1)),
                ("recrawl_Nx", lambda: recrawl_at(pN)),
            ]:
                cells[key] = min(cells.get(key, float("inf")), fn())

        def ratio(a, b):
            return round(b / a, 2) if a > 0 else None

        out = {
            "study": "crawl_ops_scale",
            "replicas": REPLICAS,
            "cells_s": {k: round(v, 3) for k, v in sorted(cells.items())},
            "ratios_at_%dx" % REPLICAS: {
                op: ratio(cells[f"{op}_1x"], cells[f"{op}_Nx"])
                for op in ("canon", "soft", "cdx", "churn", "retry",
                           "recrawl")
            },
        }
        line = json.dumps(out)
        print(line)
        dest = os.environ.get("CRAWLOPS_OUT")
        if dest:
            with open(dest, "w") as f:
                f.write(line + "\n")
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
