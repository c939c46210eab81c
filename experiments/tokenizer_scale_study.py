#!/usr/bin/env python
"""Scale-stress study for the round-5 iterative trainers (bpe_train,
kmeans_fit_exact): the sf0.1 bench can't separate a trainer's
corpus-sized cost from its round cost, so this measures both at 1x and
~10x input and reports the marginal PER-ROUND wall time. Claims under
test:

  - bpe_train: after the single corpus-scale word-frequency
    aggregation, every merge round runs on the BOUNDED vocabulary —
    so per-round cost is ~FLAT as the corpus grows 10x with the same
    vocabulary. The fixture therefore replicates documents VERBATIM
    (corpus 10x, vocab 1x — the decoupling is exactly what's claimed;
    contrast the dedup study, which must keep replicas disjoint).
  - kmeans_fit_exact: each Lloyd round is one zero-shuffle projection
    + one n_centroids x dim hash aggregation over the vectors — so
    per-round cost grows AT MOST linearly with rows (sublinearly while
    fixed per-job cost dominates), never superlinearly, and the
    per-round driver collect stays k x dim rows at every scale.
    Replicas take the dedup study's sign-flip mask so cluster
    structure stays non-degenerate.

Marginal round cost is isolated by differencing: t(base+extra rounds)
- t(base), divided by the extra rounds — fixed session/agg cost
cancels. Repetitions interleave scales and report the MIN (BASELINE.md
shared-box protocol). Prints one JSON line (also to $TOKSCALE_OUT).
Run:  taskset -c 0-15 python experiments/tokenizer_scale_study.py
Env:  TOKSCALE_SF_DIR (default /root/testdata/sf0.1),
      TOKSCALE_REPLICAS (default 10), TOKSCALE_REPS (default 2).
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
from csv_cruncher_spark.operators.bpe import bpe_train  # noqa: E402
from csv_cruncher_spark.operators.similarity import kmeans_fit_exact  # noqa: E402

SF_DIR = os.environ.get("TOKSCALE_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = int(os.environ.get("TOKSCALE_REPLICAS", "10"))
REPS = int(os.environ.get("TOKSCALE_REPS", "2"))


def _replicate_docs(spark, out_dir: str, replicas: int) -> str:
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    rep = docs.crossJoin(
        spark.range(replicas).withColumnRenamed("id", "rep")
    ).select(
        (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
        "text",
    )
    path = os.path.join(out_dir, f"docs_{replicas}x")
    rep.write.mode("overwrite").parquet(path)
    return path


def _replicate_vecs(spark, out_dir: str, replicas: int) -> str:
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    rep = emb.crossJoin(
        spark.range(replicas).withColumnRenamed("id", "rep")
    ).select(
        (F.col("vec_id") + F.col("rep") * 10_000_000).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) ->"
            " if(pmod(hash(rep, i), 2) = 1, -x, x))"
        ).alias("embedding"),
    )
    path = os.path.join(out_dir, f"vecs_{replicas}x")
    rep.write.mode("overwrite").parquet(path)
    return path


def _time(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main() -> None:
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="tokscale_", dir=base)
    spark = get_spark(
        app_name="tokenizer-scale-study",
        extra_conf={"spark.local.dir": os.path.join(work, "local")},
    )
    try:
        docs1 = os.path.join(SF_DIR, "documents.parquet")
        docsN = _replicate_docs(spark, work, REPLICAS)
        vecs1 = os.path.join(SF_DIR, "embeddings.parquet")
        vecsN = _replicate_vecs(spark, work, REPLICAS)

        def bpe_at(path: str, n: int) -> float:
            df = spark.read.parquet(path)
            return _time(lambda: bpe_train(df, "text", n_merges=n).collect())

        def km_at(path: str, iters: int) -> float:
            df = spark.read.parquet(path)
            return _time(
                lambda: kmeans_fit_exact(
                    df, "vec_id", "embedding", n_centroids=8, iterations=iters
                ).collect()
            )

        # interleaved reps, min per cell
        cells: dict[str, float] = {}
        for _ in range(REPS):
            for key, fn in [
                ("bpe_1x_2r", lambda: bpe_at(docs1, 2)),
                ("bpe_Nx_2r", lambda: bpe_at(docsN, 2)),
                ("bpe_1x_12r", lambda: bpe_at(docs1, 12)),
                ("bpe_Nx_12r", lambda: bpe_at(docsN, 12)),
                ("km_1x_1i", lambda: km_at(vecs1, 1)),
                ("km_Nx_1i", lambda: km_at(vecsN, 1)),
                ("km_1x_4i", lambda: km_at(vecs1, 4)),
                ("km_Nx_4i", lambda: km_at(vecsN, 4)),
            ]:
                t = fn()
                cells[key] = min(cells.get(key, float("inf")), t)

        bpe_round_1x = (cells["bpe_1x_12r"] - cells["bpe_1x_2r"]) / 10
        bpe_round_Nx = (cells["bpe_Nx_12r"] - cells["bpe_Nx_2r"]) / 10
        km_round_1x = (cells["km_1x_4i"] - cells["km_1x_1i"]) / 3
        km_round_Nx = (cells["km_Nx_4i"] - cells["km_Nx_1i"]) / 3
        out = {
            "replicas": REPLICAS,
            "reps": REPS,
            "cells_sec": {k: round(v, 3) for k, v in cells.items()},
            "bpe_round_sec_1x": round(bpe_round_1x, 3),
            "bpe_round_sec_10x": round(bpe_round_Nx, 3),
            "bpe_round_ratio": round(bpe_round_Nx / bpe_round_1x, 2)
            if bpe_round_1x > 0
            else None,
            "kmeans_round_sec_1x": round(km_round_1x, 3),
            "kmeans_round_sec_10x": round(km_round_Nx, 3),
            "kmeans_round_ratio": round(km_round_Nx / km_round_1x, 2)
            if km_round_1x > 0
            else None,
        }
        line = json.dumps(out)
        print(line)
        dest = os.environ.get("TOKSCALE_OUT")
        if dest:
            with open(dest, "w") as f:
                f.write(line + "\n")
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
