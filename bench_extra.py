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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query names to time")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--explain", default=None, help="directory for plan dumps")
    ap.add_argument("--suffix", default="before", help="plan file suffix")
    ap.add_argument("--no-time", action="store_true", help="explain only")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from csv_cruncher_spark.session import get_spark

    spark = get_spark(app_name="bench-extra")
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
