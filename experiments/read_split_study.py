#!/usr/bin/env python
"""Controlled study of the MOR read path (lake/table.py LakeTable.read):
a large compacted base + a small uncompacted delta pile is the steady
state the compaction triggers maintain, and it is exactly where
read-time resolution cost matters. Two legs per run:

  guards ON  (default) — broadcast resolution (dirty-key split / kill-key
                          anti-join, winner semi-join);
  guards OFF (forced)  — the non-broadcast fallback of the same mode.

Resolution is payload-adaptive (LakeTable.RESOLVE_MODE); set
SPLIT_STUDY_MODE=narrow|widefold to pin the plan family, and
SPLIT_STUDY_PAD to size payloads (bytes of deterministic filler per
page — Common-Crawl pages are ~100 KB, the raw fixture is ~400 B).
Numbers and the crossover analysis: BASELINE.md "MOR read path".

Prints one JSON line (also to $SPLIT_STUDY_OUT if set). Run:
  SPLIT_STUDY_PAD=8192 taskset -c 0-7 python experiments/read_split_study.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csv_cruncher_spark.cdc.fixtures import ChangeLogSpec, generate_change_log
from csv_cruncher_spark.cdc.pipeline import CdcPipeline
from csv_cruncher_spark.lake.table import LakeTable
from csv_cruncher_spark.session import get_spark


def build_lake(
    spark,
    work: str,
    base_events: int,
    delta_events: int,
    n_urls: int,
    html_pad_bytes: int = 0,
) -> str:
    """Base batch (compacted into base parquet) + one delta batch left
    uncompacted — the steady-state shape between compaction triggers.
    ``html_pad_bytes`` sizes payloads realistically (Common-Crawl pages
    are ~100 KB; the unpadded fixture is ~400 B)."""
    base_dir = os.path.join(work, "base_batches")
    generate_change_log(
        ChangeLogSpec(
            n_urls=n_urls, n_batches=1, events_per_batch=base_events,
            seed=42, out_dir=base_dir, html_pad_bytes=html_pad_bytes,
        )
    )
    delta_dir = os.path.join(work, "delta_batches")
    generate_change_log(
        ChangeLogSpec(
            n_urls=n_urls, n_batches=1, events_per_batch=delta_events,
            seed=43, out_dir=delta_dir, html_pad_bytes=html_pad_bytes,
        )
    )
    # rename the delta batch so it sorts AFTER the base batch in one dir
    merged = os.path.join(work, "batches")
    os.makedirs(merged)
    for f in sorted(os.listdir(base_dir)):
        shutil.copy(os.path.join(base_dir, f), os.path.join(merged, "a-" + f))
    for f in sorted(os.listdir(delta_dir)):
        shutil.copy(os.path.join(delta_dir, f), os.path.join(merged, "b-" + f))

    lake = os.path.join(work, "lake")
    pipe = CdcPipeline(lake, n_buckets=32, compact_every=10**6)
    pipe.run(spark, merged)
    t = LakeTable.load(lake)
    # compact ONLY the first batch's effects: run compaction after batch 1
    # would need pipeline hooks; instead compact everything, then apply the
    # delta batch again on top via a fresh pipeline pass over a copy dir.
    t.compact(spark)
    redo = os.path.join(work, "redo")
    os.makedirs(redo)
    for f in sorted(os.listdir(delta_dir)):
        shutil.copy(os.path.join(delta_dir, f), os.path.join(redo, "c-" + f))
    CdcPipeline(lake, n_buckets=32, compact_every=10**6).run(spark, redo)
    snap = LakeTable.load(lake).snapshot()
    assert any(f.get("kind") == "delta" for f in snap["files"]), "no deltas staged"
    return lake


def timed_read(spark, lake: str, reps: int = 3) -> float:
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        LakeTable.load(lake).read(spark).write.format("noop").mode("overwrite").save()
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    return best


def main() -> None:
    base_events = int(os.environ.get("SPLIT_STUDY_BASE", 4_000_000))
    delta_events = int(os.environ.get("SPLIT_STUDY_DELTA", 100_000))
    n_urls = int(os.environ.get("SPLIT_STUDY_URLS", 1_000_000))
    pad = int(os.environ.get("SPLIT_STUDY_PAD", 0))
    tmp_base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="read_split_", dir=tmp_base)
    local_dir = tempfile.mkdtemp(prefix="spark_local_", dir=tmp_base)
    try:
        spark = get_spark(
            app_name="read-split-study",
            master=os.environ.get("SPLIT_STUDY_MASTER", "local[8]"),
            extra_conf={
                "spark.sql.files.maxPartitionBytes": "16m",
                "spark.local.dir": local_dir,
            },
        )
        lake = build_lake(spark, work, base_events, delta_events, n_urls, pad)
        t = LakeTable.load(lake)
        rows = t.read(spark).count()  # warm page cache + JIT
        dirty = sum(1 for f in t.snapshot()["files"] if f.get("kind") == "delta")

        # resolution is payload-adaptive; pin a mode so both legs compare
        # the SAME plan family (default: whatever "auto" picks for this pad)
        mode = os.environ.get("SPLIT_STUDY_MODE")
        if mode:
            LakeTable.RESOLVE_MODE = mode

        split_s = timed_read(spark, lake)
        orig_rows = LakeTable.RESOLVE_SPLIT_DELTA_ROWS
        orig_bytes = LakeTable.RESOLVE_SPLIT_DELTA_BYTES
        try:
            # force the non-broadcast fallback (both guards fail)
            LakeTable.RESOLVE_SPLIT_DELTA_ROWS = -1
            LakeTable.RESOLVE_SPLIT_DELTA_BYTES = -1
            full_s = timed_read(spark, lake)
        finally:
            LakeTable.RESOLVE_SPLIT_DELTA_ROWS = orig_rows
            LakeTable.RESOLVE_SPLIT_DELTA_BYTES = orig_bytes

        result = json.dumps({
            "base_events": base_events,
            "delta_events": delta_events,
            "n_urls": n_urls,
            "html_pad_bytes": pad,
            "table_rows": rows,
            "delta_files": dirty,
            "resolve_mode": mode or LakeTable.RESOLVE_MODE,
            "read_split_seconds": round(split_s, 3),
            "read_fullfold_seconds": round(full_s, 3),
            "speedup": round(full_s / split_s, 2) if split_s else None,
            "master": spark.sparkContext.master,
        })
        print("\n" + result)
        out = os.environ.get("SPLIT_STUDY_OUT")
        if out:  # progress bars share stdout lines; a file survives filters
            with open(out, "w") as f:
                f.write(result + "\n")
    finally:
        shutil.rmtree(work, ignore_errors=True)
        shutil.rmtree(local_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
