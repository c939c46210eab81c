#!/usr/bin/env python
"""Round-6 optimization sidecar bench (bench.py is FROZEN for measurement).

Times a chosen subset of __spark_entry__.queries() in isolation with the
same methodology as bench.py (noop sink, clearCache between reps,
best-of-N), and optionally dumps .explain("formatted") plans to
plans/r06/<query>_{before,after}.txt.

Usage:
  python bench_extra.py q1_pricing_summary knn_join_exact --reps 3
  python bench_extra.py knn_join_exact --explain plans/r06 --suffix before
  python bench_extra.py --all --reps 2          # whole surface
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def cdc_modes_bench(events: int = 1_000_000, urls: int = 150_000) -> None:
    """Replay the same change log plain vs with the quality/history layer
    (expectations + TOAST resolution) so the warehouse modes' overhead is
    a measured number (r5 verdict #6). Prints one JSON line."""
    import shutil
    import tempfile
    import time as _time

    from csv_cruncher_spark.cdc.expectations import Expectation
    from csv_cruncher_spark.cdc.fixtures import ChangeLogSpec, generate_change_log
    from csv_cruncher_spark.cdc.pipeline import CdcPipeline
    from csv_cruncher_spark.session import get_spark

    spark = get_spark(app_name="bench-extra-cdc-modes")
    work = tempfile.mkdtemp(prefix="cdc_modes_")
    out = {}
    try:
        bdir = os.path.join(work, "batches")
        generate_change_log(ChangeLogSpec(
            n_urls=urls, n_batches=2, events_per_batch=events // 2,
            seed=42, out_dir=bdir,
        ))
        modes = {
            "plain": {},
            "expect_toast": {
                "expectations": [
                    Expectation("https_only", "url LIKE 'https://%'", action="drop"),
                    Expectation(
                        "lang_known",
                        "lang IN ('en','de','cs','fr','es')",
                        action="warn",
                        applies_to=("I", "U"),
                    ),
                ],
                "partial_updates": "__debezium_unavailable_value",
            },
        }
        for name, kw in modes.items():
            best = None
            for rep in range(2):  # warmup + timed (fresh lake each)
                lake = os.path.join(work, f"lake_{name}_{rep}")
                t0 = _time.perf_counter()
                CdcPipeline(lake, n_buckets=32, **kw).run(spark, bdir)
                dt = _time.perf_counter() - t0
                shutil.rmtree(lake, ignore_errors=True)
                best = dt if best is None else min(best, dt)
            out[name] = {
                "seconds": round(best, 3),
                "events_per_sec": round(events / best, 1),
            }
        print(json.dumps({"cdc_modes": out, "events": events}, separators=(",", ":")))
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query names to time")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--explain", default=None, help="directory for plan dumps")
    ap.add_argument("--suffix", default="before", help="plan file suffix")
    ap.add_argument("--no-time", action="store_true", help="explain only")
    ap.add_argument("--cdc-modes", action="store_true",
                    help="measure warehouse-mode replay overhead instead of queries")
    args = ap.parse_args()

    if args.cdc_modes:
        cdc_modes_bench()
        return

    import __spark_entry__ as entrymod
    from csv_cruncher_spark.session import get_spark

    # mirror bench.py's session conf exactly (8m input splits + tmpfs
    # local dir) — isolated timings are only predictive of the frozen
    # bench if the scan split count and shuffle disk match
    extra_conf = {"spark.sql.files.maxPartitionBytes": "8m"}
    if os.path.isdir("/dev/shm"):
        import atexit
        import shutil as _shutil
        import tempfile as _tempfile

        local_dir = _tempfile.mkdtemp(prefix="spark_local_", dir="/dev/shm")
        atexit.register(_shutil.rmtree, local_dir, ignore_errors=True)
        extra_conf["spark.local.dir"] = local_dir
    spark = get_spark(app_name="bench-extra", extra_conf=extra_conf)
    qs = entrymod.queries()
    names = list(qs) if args.all else args.names
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    out: dict[str, float] = {}
    # one untimed warm query (mirrors bench.py)
    if not args.no_time:
        qs[names[0]](spark, args.sf_dir).write.format("noop").mode("overwrite").save()
    for name in names:
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = qs[name](spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.explain, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)
            spark.catalog.clearCache()
        if args.no_time:
            continue
        best = None
        for _ in range(max(1, args.reps)):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            qs[name](spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        print(f"{out[name]:8.3f}  {name}", file=sys.stderr)
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
