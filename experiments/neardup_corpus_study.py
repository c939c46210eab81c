"""Refresh-cost study for MaintainedCorpus with near-dup screening ON.

The screen adds one piece of non-feed-sized work per refresh: a banded
LSH probe of the additions against the stored members' (url, signature)
columns — a narrow columnar scan of the member store (8·n_hashes bytes
+ url per member; parquet prunes text/fp/flags), never the lake table's
payloads. So the honest scale claim is WEAKER than the exact-dedup
store's O(changed fp groups): refresh = feed-sized work + touched-bucket
rewrite + an O(members·narrow) probe-join input. This study measures how
that term behaves across a 10x member gap, alongside the near_dup=False
baseline from maintained_corpus_study.py.

Protocol: interleaved reps (1x, 10x, 1x, 10x), best-of, load1 recorded.
  taskset -c 0-15 python experiments/neardup_corpus_study.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from experiments.maintained_corpus_study import run_study  # noqa: E402

from csv_cruncher_spark.cdc.pipeline import CdcPipeline  # noqa: E402
from csv_cruncher_spark.session import get_spark  # noqa: E402

CFG = dict(min_tokens=2, splits={"train": 8.0, "val": 1.0, "test": 1.0},
           n_buckets=32, near_dup=True)


def build_diverse(spark, work: str, label: str, n_urls: int) -> tuple[str, str]:
    """A lake of mutually DISSIMILAR docs (the fixture generator's
    templated html is near-dup-similar across urls, which collapses a
    near_dup store to a handful of members and voids the member-count
    gap this study needs): 16 tokens per doc drawn from the doc's own
    md5 stream — pairwise shingle Jaccard ~0."""
    import base64
    import csv
    import hashlib

    batches = os.path.join(work, f"b_{label}")
    table = os.path.join(work, f"lake_{label}")
    os.makedirs(batches, exist_ok=True)
    with open(os.path.join(batches, "batch-00000.csv"), "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["op", "url", "warc_ts", "html", "lang"])
        w.writeheader()
        for i in range(n_urls):
            toks = [
                "t" + hashlib.md5(f"{label}:{i}:{j}".encode()).hexdigest()[:6]
                for j in range(16)
            ]
            w.writerow({
                "op": "I",
                "url": f"https://d{i % 97}.example/p{i}",
                "warc_ts": f"2024-06-01 00:00:{i % 60:02d}",
                "html": base64.b64encode(
                    f"<html><body><p>{' '.join(toks)}</p></body></html>".encode()
                ).decode(),
                "lang": ("en", "de", "cs", "fr")[i % 4],
            })
    CdcPipeline(table, n_buckets=8).run(spark, batches)
    return batches, table


def main() -> None:
    reps = int(os.environ.get("MC_STUDY_REPS", "3"))
    spark = get_spark(app_name="neardup-corpus-study")
    run_study(spark, build_diverse, CFG, reps, "nd_study_")


if __name__ == "__main__":
    main()
