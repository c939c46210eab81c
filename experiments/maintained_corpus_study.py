"""Refresh-cost study for MaintainedCorpus: the design claim is that a
refresh costs O(changed fingerprint groups) — feed-sized work plus a
rewrite of only the feed-touched buckets — NOT O(table). Evidence: build
lake tables at 1x and 10x url counts, bootstrap the corpus store over
each, then apply ONE single-url change batch and time the refresh. If
the claim holds, refresh time is ~flat across the 10x size gap (both
pay fixed per-job overhead + one bucket rewrite whose size grows only
with table/n_buckets).

Protocol: interleaved reps (1x, 10x, 1x, 10x), best-of, load1 recorded.
  taskset -c 0-15 python experiments/maintained_corpus_study.py
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csv_cruncher_spark.cdc.fixtures import ChangeLogSpec, generate_change_log  # noqa: E402
from csv_cruncher_spark.cdc.pipeline import CdcPipeline  # noqa: E402
from csv_cruncher_spark.lake.corpus_view import MaintainedCorpus  # noqa: E402
from csv_cruncher_spark.session import get_spark  # noqa: E402

CFG = dict(min_tokens=2, splits={"train": 8.0, "val": 1.0, "test": 1.0},
           n_buckets=32)


def build(spark, work: str, label: str, n_urls: int) -> tuple[str, str]:
    batches = os.path.join(work, f"b_{label}")
    table = os.path.join(work, f"lake_{label}")
    generate_change_log(ChangeLogSpec(
        n_urls=n_urls, n_batches=2, events_per_batch=n_urls,
        seed=7, out_dir=batches,
    ))
    CdcPipeline(table, n_buckets=8).run(spark, batches)
    return batches, table


def one_url_batch(batches: str, seq: int) -> None:
    """A batch updating a single url (new text -> fingerprint moves)."""
    import base64
    import csv

    with open(os.path.join(batches, f"batch-{seq:05d}.csv"), "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["op", "url", "warc_ts", "html", "lang"])
        w.writeheader()
        w.writerow({
            "op": "U", "url": "https://d0.example/p0",
            "warc_ts": f"2024-06-01 00:00:{seq % 60:02d}",
            "html": base64.b64encode(
                f"<html><body>edited version {seq} of the page text body</body></html>".encode()
            ).decode(),
            "lang": "en",
        })


def run_study(spark, builder, cfg: dict, reps: int, work_prefix: str) -> None:
    """Shared protocol for the maintained-corpus refresh studies: build
    1x/10x lakes with ``builder``, bootstrap a store per size with
    ``cfg``, then interleave single-url refresh reps (1x, 10x, 1x, 10x)
    printing per-rep timings + load1 and a best-of summary. One copy of
    the protocol so the near-dup study's numbers stay comparable."""
    work = tempfile.mkdtemp(prefix=work_prefix)
    sizes = {"1x": 2_000, "10x": 20_000}
    env: dict[str, dict] = {}
    for label, n in sizes.items():
        batches, table = builder(spark, work, label, n)
        mc = MaintainedCorpus(table, os.path.join(work, f"store_{label}"), **cfg)
        t0 = time.monotonic()
        mc.refresh(spark)
        env[label] = {"batches": batches, "table": table, "mc": mc,
                      "bootstrap_s": round(time.monotonic() - t0, 3),
                      "corpus_rows": mc.read(spark).count(),
                      "refresh_s": []}
    for rep in range(reps):
        for label in ("1x", "10x"):
            e = env[label]
            seq = 100 + rep
            one_url_batch(e["batches"], seq)
            CdcPipeline(e["table"], n_buckets=8).run(spark, e["batches"])
            t0 = time.monotonic()
            e["mc"].refresh(spark)
            e["refresh_s"].append(round(time.monotonic() - t0, 3))
            print(json.dumps({label: {"rep": rep, "refresh_s": e["refresh_s"][-1],
                                      "load1": os.getloadavg()[0]}}), flush=True)
    print(json.dumps({
        "summary": {
            label: {
                "corpus_rows": e["corpus_rows"],
                "bootstrap_s": e["bootstrap_s"],
                "single_url_refresh_best_s": min(e["refresh_s"]),
            }
            for label, e in env.items()
        }
    }, indent=1))


def main() -> None:
    reps = int(os.environ.get("MC_STUDY_REPS", "3"))
    spark = get_spark(app_name="maintained-corpus-study")
    run_study(spark, build, CFG, reps, "mc_study_")


if __name__ == "__main__":
    main()
