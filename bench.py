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


def _materialize(df) -> None:
    """Force FULL materialization of every output column via a noop-format
    write (round-1 verdict bench fix: ``count()`` let Catalyst prune
    unreferenced columns and drop sorts below the aggregation, so
    projection-heavy entries were partly timing a no-op)."""
    df.write.format("noop").mode("overwrite").save()


def run_headline(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    # one untimed warm query: JVM JIT / codegen / python-worker startup
    # land here instead of on the first timed entry
    _materialize(next(iter(qs.values()))(spark, sf_dir))
    out: dict[str, float] = {}
    for name, fn in qs.items():
        t0 = time.perf_counter()
        _materialize(fn(spark, sf_dir))
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def run_cdc_bench(
    spark,
    n_events: int,
    n_urls: int,
    n_batches: int,
    n_buckets: int,
    warmup: int = 1,
    batch_dir: str | None = None,
    timed_reps: int = 1,
) -> dict:
    """CDC replay throughput. ``warmup`` untimed replays (fresh lake each)
    precede the timed one: JVM JIT, python-worker pools, and the OS page
    cache of the input files all reach the steady state that a 10^10-event
    replay spends >99.9% of its time in — cold-start seconds are a
    constant, not a rate."""
    from csv_cruncher_spark.cdc.fixtures import ChangeLogSpec, generate_change_log
    from csv_cruncher_spark.cdc.pipeline import CdcPipeline

    work = tempfile.mkdtemp(prefix="cdc_bench_")
    try:
        if batch_dir is None:
            spec = ChangeLogSpec(
                n_urls=n_urls,
                n_batches=n_batches,
                events_per_batch=n_events // n_batches,
                seed=42,
                out_dir=os.path.join(work, "batches"),
            )
            generate_change_log(spec)
            batch_dir = os.path.join(work, "batches")
        total_events = (n_events // n_batches) * n_batches
        for w in range(warmup):
            lake = os.path.join(work, f"lake_warm{w}")
            CdcPipeline(lake, n_buckets=n_buckets).run(spark, batch_dir)
            shutil.rmtree(lake, ignore_errors=True)
        elapsed = None
        for r in range(max(1, timed_reps)):  # best-of-N damps ambient noise
            lake = os.path.join(work, f"lake_t{r}")
            t0 = time.perf_counter()
            CdcPipeline(lake, n_buckets=n_buckets).run(spark, batch_dir)
            el = time.perf_counter() - t0
            shutil.rmtree(lake, ignore_errors=True)
            elapsed = el if elapsed is None else min(elapsed, el)
        return {
            "cdc_events": total_events,
            "cdc_seconds": round(elapsed, 3),
            "cdc_events_per_sec": round(total_events / elapsed, 1),
            "cdc_warmup_runs": warmup,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def run_scaling_probe(events: int = 1_000_000, urls: int = 150_000, batches: int = 2) -> dict:
    """Two-parallelism-level CDC replay (the north rule's N vs 4N
    evidence): one shared pre-generated change log; per level one warm +
    best-of-2 timed replays in a subprocess (a JVM's core count is fixed
    at startup). Levels: cpus/8 and cpus/2 — the 4× ratio without
    saturating the whole machine, because each Spark core also runs an
    Arrow-UDF python worker (at cpus the box is 2×-oversubscribed and
    the probe measures contention, not scaling; BASELINE.md's controlled
    study documents this)."""
    import subprocess

    cpus = os.cpu_count() or 8
    hi = max(4, cpus // 2)
    lo = max(1, hi // 4)
    work = tempfile.mkdtemp(prefix="cdc_scale_")
    try:
        from csv_cruncher_spark.cdc.fixtures import ChangeLogSpec, generate_change_log

        bdir = os.path.join(work, "batches")
        generate_change_log(
            ChangeLogSpec(
                n_urls=urls,
                n_batches=batches,
                events_per_batch=events // batches,
                seed=42,
                out_dir=bdir,
            )
        )
        out: dict[int, float] = {}
        for level in (lo, hi):
            r = subprocess.run(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--cdc-only",
                    "--master",
                    f"local[{level}]",
                    "--events",
                    str(events),
                    "--urls",
                    str(urls),
                    "--batches",
                    str(batches),
                    "--warmup",
                    "1",
                    "--timed-reps",
                    "2",
                    "--batch-dir",
                    bdir,
                ],
                capture_output=True,
                text=True,
                timeout=1200,
            )
            line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else "{}"
            out[level] = json.loads(line).get("cdc_events_per_sec", 0.0)
        eff = round(out[hi] / (out[lo] * (hi / lo)), 3) if out.get(lo) else None
        return {
            "scaling_n_cores": lo,
            "scaling_n_events_per_sec": out.get(lo),
            "scaling_4n_cores": hi,
            "scaling_4n_events_per_sec": out.get(hi),
            "scaling_efficiency": eff,
            "scaling_events": events,
            "scaling_note": (
                "quick probe at small scale on a shared host; the controlled "
                "16M-event study (matched noise windows, best pairs 0.73-0.79, "
                "peak 674k ev/s) is in BASELINE.md 'Measured results'"
            ),
        }
    except Exception as e:  # scaling probe must never sink the bench
        return {"scaling_error": str(e)[:200]}
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", default=None)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--events", type=int, default=1_000_000)
    ap.add_argument("--urls", type=int, default=150_000)
    ap.add_argument("--batches", type=int, default=2)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--timed-reps", type=int, default=1)
    ap.add_argument("--batch-dir", default=None, help="reuse a pre-generated change log (--events/--urls/--batches must match its spec)")
    ap.add_argument("--max-partition-bytes", default="8m")
    ap.add_argument("--cdc-only", action="store_true")
    ap.add_argument("--queries-only", action="store_true")
    ap.add_argument("--no-scaling", action="store_true",
                    help="skip the two-parallelism-level scaling probe")
    args = ap.parse_args()

    from csv_cruncher_spark.session import get_spark

    spark = get_spark(
        app_name="csv-cruncher-bench",
        master=args.master,
        # split large binlog segments across tasks (read_change_batch's
        # row_idx stays order-correct under split-parallel scans)
        extra_conf={"spark.sql.files.maxPartitionBytes": args.max_partition_bytes},
    )

    queries: dict[str, float] = {}
    t_start = time.perf_counter()
    if not args.cdc_only:
        queries = run_headline(spark, args.sf_dir)
    cdc: dict = {}
    if not args.queries_only:
        cdc = run_cdc_bench(
            spark,
            args.events,
            args.urls,
            args.batches,
            args.buckets,
            args.warmup,
            args.batch_dir,
            args.timed_reps,
        )
    total = round(time.perf_counter() - t_start, 3)

    scaling: dict = {}
    if not args.no_scaling and not args.cdc_only and not args.queries_only:
        scaling = run_scaling_probe()

    sf = args.sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline_queries_plus_cdc_replay_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        **cdc,
        **scaling,
        "master": spark.sparkContext.master,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
