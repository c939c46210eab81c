#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

- headline queries from __spark_entry__.queries() at $SPARK_GRAFT_SF_DIR
  (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS];
- a CDC replay bench (the north-rule metric): synthesize a deterministic
  change log, replay it through CdcPipeline, report change-events/sec in
  the extra key "cdc_events_per_sec".

Usage:
  python bench.py                  # full bench
  python bench.py --cdc-only       # CDC replay only (for scaling runs)
  python bench.py --master local[8] --events 200000
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run_headline(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entrymod

    out: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        out[name] = round(time.perf_counter() - t0, 3)
        assert n >= 0
    return out


def run_cdc_bench(spark, n_events: int, n_urls: int, n_batches: int, n_buckets: int) -> dict:
    from csv_cruncher_spark.cdc.fixtures import ChangeLogSpec, generate_change_log
    from csv_cruncher_spark.cdc.pipeline import CdcPipeline

    work = tempfile.mkdtemp(prefix="cdc_bench_")
    try:
        spec = ChangeLogSpec(
            n_urls=n_urls,
            n_batches=n_batches,
            events_per_batch=n_events // n_batches,
            seed=42,
            out_dir=os.path.join(work, "batches"),
        )
        paths = generate_change_log(spec)
        total_events = spec.events_per_batch * n_batches
        pipe = CdcPipeline(os.path.join(work, "lake"), n_buckets=n_buckets)
        t0 = time.perf_counter()
        pipe.run(spark, os.path.dirname(paths[0]))
        elapsed = time.perf_counter() - t0
        return {
            "cdc_events": total_events,
            "cdc_seconds": round(elapsed, 3),
            "cdc_events_per_sec": round(total_events / elapsed, 1),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", default=None)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--events", type=int, default=120_000)
    ap.add_argument("--urls", type=int, default=20_000)
    ap.add_argument("--batches", type=int, default=6)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--cdc-only", action="store_true")
    ap.add_argument("--queries-only", action="store_true")
    args = ap.parse_args()

    from csv_cruncher_spark.session import get_spark

    spark = get_spark(app_name="csv-cruncher-bench", master=args.master)

    queries: dict[str, float] = {}
    t_start = time.perf_counter()
    if not args.cdc_only:
        queries = run_headline(spark, args.sf_dir)
    cdc: dict = {}
    if not args.queries_only:
        cdc = run_cdc_bench(spark, args.events, args.urls, args.batches, args.buckets)
    total = round(time.perf_counter() - t_start, 3)

    sf = args.sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline_queries_plus_cdc_replay_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        **cdc,
        "master": spark.sparkContext.master,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
