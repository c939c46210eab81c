"""10x scale-stress of the corpus-stage operators added late in round 4
(decontamination, boilerplate removal, temperature mix, epoch shuffle,
and the full corpus pipeline) — the bench at sf0.1 times them, but only
a controlled 1x-vs-10x run shows whether their cost scales with the
data (acceptable) or with something quadratic (a scale bug).

Data scaling reuses dedup_scale_study's replica construction: replica r
suffixes every 3rd word with _r{r}, so texts are distinct across
replicas while keeping the per-replica near-dup structure — hit counts
for the screens should scale ~linearly with replicas, never
quadratically (replicas share no n-grams).

Protocol (shared-noisy-box rules from BASELINE.md): both scales written
to parquet first, repetitions interleaved (1x, 10x, 1x, 10x), per-run
load1 recorded. Pin cores for a quieter read:

  taskset -c 0-15 python experiments/corpus_scale_study.py
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from csv_cruncher_spark.operators import (  # noqa: E402
    boilerplate,
    corpus,
    decontam,
    sampling,
    shuffle,
)
from csv_cruncher_spark.session import get_spark  # noqa: E402
from experiments.dedup_scale_study import build_scaled  # noqa: E402


def run_once(spark, d_path: str) -> dict:
    docs = spark.read.parquet(d_path)
    out: dict = {}

    # decontamination: every 40th doc is the benchmark
    bench = docs.filter(F.col("doc_id") % 40 == 0)
    t0 = time.monotonic()
    rep = decontam.contamination_report(docs, bench, "doc_id", "text", n=8)
    out["decontam_hits"] = rep.count()
    out["decontam_s"] = round(time.monotonic() - t0, 3)

    # boilerplate: deterministic 12-word chunk lines (the entry's shape)
    lined = docs.select(
        "doc_id",
        F.array_join(
            F.expr(
                "transform(sequence(1, int(ceil(size(split(text, ' ')) / 12.0))),"
                " i -> concat_ws(' ', slice(split(text, ' '), (i-1)*12 + 1, 12)))"
            ),
            "\n",
        ).alias("text"),
    )
    t0 = time.monotonic()
    bp = boilerplate.remove_boilerplate_lines(lined, "doc_id", "text", min_docs=3)
    out["boiler_removed"] = bp.agg(F.sum("n_removed_lines")).collect()[0][0]
    out["boiler_s"] = round(time.monotonic() - t0, 3)

    # temperature mix (langless replicas: synthesize a stratum)
    strat = docs.withColumn("lang", (F.col("doc_id") % 5).cast("string"))
    t0 = time.monotonic()
    mixed = sampling.temperature_sample(
        strat, "doc_id", "lang", alpha=0.5, target_fraction=0.5
    )
    out["mix_kept"] = mixed.count()
    out["mix_s"] = round(time.monotonic() - t0, 3)

    # epoch shuffle with global positions
    t0 = time.monotonic()
    sh = shuffle.epoch_shuffle(docs, "doc_id", epoch=1, n_shards=64)
    out["shuffle_max_pos"] = sh.agg(F.max("global_pos")).collect()[0][0]
    out["shuffle_s"] = round(time.monotonic() - t0, 3)

    # the full capstone pipeline
    t0 = time.monotonic()
    built = corpus.build_corpus(
        strat, "doc_id", "text", "lang",
        min_tokens=10,
        decontam={"bench": bench, "n": 8},
        temperature={"alpha": 0.5, "target_fraction": 0.5},
        splits={"train": 8, "val": 1, "test": 1},
    )
    out["corpus_rows"] = built.count()
    out["corpus_s"] = round(time.monotonic() - t0, 3)
    return out


def main() -> None:
    sf_dir = os.environ.get("CORPUS_SCALE_SF_DIR", "/root/testdata/sf0.1")
    replicas = int(os.environ.get("CORPUS_SCALE_REPLICAS", "10"))
    reps = int(os.environ.get("CORPUS_SCALE_REPS", "2"))
    spark = get_spark(app_name="corpus-scale-study")
    work = tempfile.mkdtemp(prefix="corpus_scale_")
    d1, _ = build_scaled(spark, sf_dir, 1, work)
    dN, _ = build_scaled(spark, sf_dir, replicas, work)
    results: dict = {"1x": [], f"{replicas}x": []}
    for _ in range(reps):
        for label, path in (("1x", d1), (f"{replicas}x", dN)):
            r = run_once(spark, path)
            r["load1_at_start"] = os.getloadavg()[0]
            results[label].append(r)
            print(json.dumps({label: r}), flush=True)
    best = {
        label: {
            k: min(r[k] for r in runs) if k.endswith("_s") else runs[0][k]
            for k in runs[0]
        }
        for label, runs in results.items()
    }
    print(json.dumps({"best_of": reps, "summary": best}, indent=1))


if __name__ == "__main__":
    main()
