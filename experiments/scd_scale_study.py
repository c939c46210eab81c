#!/usr/bin/env python
"""Scale-stress study for the SCD Type 2 wave (operators/scd.py):
1x vs ~10x input, interleaved reps, min per cell (BASELINE.md
shared-box protocol).

Claims under test:

  - scd2_history grows AT MOST linearly with the change-log size: it is
    ONE hash exchange on the key plus a per-key sort whose group size
    is versions-per-key (fixed here at 6 events/url as the log scales —
    the recrawl-cadence contract), never corpus-sized.
  - scd2_apply's cost is O(|batch| + versions-of-touched-keys) and FLAT
    in the stored history's size: applying the SAME batch to a 1x and a
    10x history must cost about the same wall, because the history only
    flows through broadcast anti/semi joins on the batch's key set.

Prints one JSON line (also to $SCD_OUT).
Run:  taskset -c 0-15 python experiments/scd_scale_study.py
Env:  SCD_URLS (default 40_000), SCD_REPLICAS (default 10),
      SCD_REPS (default 2).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from csv_cruncher_spark.operators.scd import scd2_apply, scd2_history  # noqa: E402
from csv_cruncher_spark.session import get_spark  # noqa: E402

URLS = int(os.environ.get("SCD_URLS", "40000"))
REPLICAS = int(os.environ.get("SCD_REPLICAS", "10"))
REPS = int(os.environ.get("SCD_REPS", "2"))
PAY = ["text", "lang"]

#: events per url: I, refetch, U, D, I, U — exercises every kernel path
EVENTS_PER_URL = 6


def _log(spark, n_urls: int, out_dir: str, tag: str) -> str:
    """Deterministic change log: n_urls keys x 6 versioned events each,
    ~200-byte payloads. Versions-per-key stays FIXED as the log scales —
    the axis that grows is the number of keys (how web corpora grow)."""
    base = spark.range(n_urls).select(
        F.concat(F.lit("https://d"), (F.col("id") % 997).cast("string"),
                 F.lit(".example.com/p"), F.col("id").cast("string")).alias("url"),
        F.col("id").alias("k"),
    )
    ev = base.crossJoin(
        spark.range(EVENTS_PER_URL).withColumnRenamed("id", "v")
    ).select(
        "url",
        (F.lit(1_700_000_000) + F.col("k") % 86_400 + F.col("v") * 3600).alias("ts"),
        F.when(F.col("v") == 3, F.lit("D")).otherwise(
            F.when(F.col("v").isin(0, 4), F.lit("I")).otherwise(F.lit("U"))
        ).alias("op"),
        F.when(F.col("v") == 3, F.lit(None)).otherwise(
            F.concat(
                F.lit("content v"),
                # v1 REPEATS v0's payload byte-for-byte so the
                # unchanged-collapse path actually collapses a run in
                # every key (a per-version marker would leave the
                # collapse machinery timed but never triggered)
                F.when(F.col("v") == 1, F.lit(0)).otherwise(F.col("v")).cast("string"),
                F.lit(" of "), F.col("url"), F.lit(" "),
                F.repeat(F.lit("x"), 160),
            )
        ).alias("text"),
        F.when(F.col("v") == 3, F.lit(None)).otherwise(
            F.element_at(F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
                         (F.col("k") % 3 + 1).cast("int"))
        ).alias("lang"),
        (F.col("k") * 10 + F.col("v")).alias("row_idx"),
    )
    out = os.path.join(out_dir, f"log_{tag}")
    ev.write.mode("overwrite").parquet(out)
    return out


def _time(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main() -> None:
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="scdscale_", dir=base)
    spark = get_spark(
        app_name="scd-scale-study",
        extra_conf={"spark.local.dir": os.path.join(work, "local")},
    )
    try:
        p1 = _log(spark, URLS, work, "1x")
        pN = _log(spark, URLS * REPLICAS, work, f"{REPLICAS}x")

        def build_at(path):
            df = spark.read.parquet(path)
            return _time(
                lambda: scd2_history(
                    df, "url", "ts", PAY, op_col="op", tiebreak_col="row_idx",
                    collapse_unchanged=True,
                ).agg(F.count(F.lit(1)), F.sum(F.col("is_current").cast("long")))
                .collect()
            )

        # materialized histories for the apply-flatness leg
        hists = {}
        for tag, path in (("1x", p1), (f"{REPLICAS}x", pN)):
            h = scd2_history(
                spark.read.parquet(path), "url", "ts", PAY,
                op_col="op", tiebreak_col="row_idx",
            )
            hp = os.path.join(work, f"hist_{tag}")
            h.write.mode("overwrite").parquet(hp)
            hists[tag] = hp

        # one batch touching 1% of the 1x key space — SAME batch both legs
        batch = spark.range(URLS // 100).select(
            F.concat(F.lit("https://d"), (F.col("id") * 100 % 997).cast("string"),
                     F.lit(".example.com/p"), (F.col("id") * 100).cast("string")).alias("url"),
            F.lit(1_700_900_000).alias("ts"),
            F.lit("U").alias("op"),
            F.concat(F.lit("fresh "), F.col("id").cast("string")).alias("text"),
            F.lit("en").alias("lang"),
            (F.lit(10_000_000_000) + F.col("id")).alias("row_idx"),
        )
        batch.persist().count()

        def apply_at(tag):
            h = spark.read.parquet(hists[tag])
            return _time(
                lambda: scd2_apply(
                    h, batch, "url", "ts", PAY, op_col="op",
                    tiebreak_col="row_idx",
                ).agg(F.count(F.lit(1))).collect()
            )

        cells: dict[str, list[float]] = {}
        for _ in range(REPS):  # interleaved reps, min per cell
            cells.setdefault("build_1x", []).append(build_at(p1))
            cells.setdefault(f"build_{REPLICAS}x", []).append(build_at(pN))
            cells.setdefault("apply_1x", []).append(apply_at("1x"))
            cells.setdefault(f"apply_{REPLICAS}x", []).append(
                apply_at(f"{REPLICAS}x")
            )

        m = {k: round(min(v), 3) for k, v in cells.items()}
        out = {
            "metric": "scd2_scale_study",
            "urls_1x": URLS,
            "events_per_url": EVENTS_PER_URL,
            "replicas": REPLICAS,
            "reps": REPS,
            **m,
            "build_ratio": round(m[f"build_{REPLICAS}x"] / m["build_1x"], 2),
            "apply_ratio_vs_history_size": round(
                m[f"apply_{REPLICAS}x"] / m["apply_1x"], 2
            ),
        }
        line = json.dumps(out)
        print(line)
        if os.environ.get("SCD_OUT"):
            with open(os.environ["SCD_OUT"], "w") as f:
                f.write(line + "\n")
    finally:
        spark.stop()
        import shutil

        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
