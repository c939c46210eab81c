#!/usr/bin/env python
"""Scale-stress study for the iterative/sketch dedup operators (round-3
verdict #8): the sf0.1 bench cannot see a bad constant in the iterative
operators, so this runs the same pipelines at 1x and ~10x the sf0.1
documents/embeddings tables and reports per-stage wall time, edge
counts, and connected-components round counts. The claim under test:

  - pair mining / incremental screening / embedding banding cost grows
    ~linearly with rows (banded equi-joins, no all-pairs shape);
  - CC round count is FLAT as data grows (pointer halving bounds rounds
    by O(log diameter), and replicating the corpus does not deepen any
    component).

Scaling the corpus deterministically (seed-free, derived from the data):
  documents: replica r keeps doc_id + r*1_000_000 and REPLACES every
    3rd token t with t_r<r> (a JVM transform over the token array — no
    insertion). With k=3 shingles every window spans at least one
    replaced token, so cross-replica shingle sets are disjoint and
    near-dup EDGES scale linearly with replicas instead of
    quadratically — the honest shape for "10x more data", not "10x
    copies of the same data". Replacement (vs inserting marker tokens
    between words, the first cut of this study) matters: inserted
    markers create (marker, w, marker) shingles that depend on a single
    content word, which inflates within-replica shingle collision
    density ~40x and turns the candidate join superlinear — an artifact
    of the scaling transform, not of the operators.
  embeddings: replica r flips the sign of element i iff
    pmod(hash(r, i), 2) = 1 (elementwise +-1 mask). Sign-flip patterns
    decorrelate replicas (cosine structure within a replica is
    preserved up to reflection; across replicas vectors land in
    different LSH bucket families), so bucket occupancy — the banding
    join's cost driver — also scales linearly. Planted near-copies
    (every 50th vector, positively rescaled as in the
    embedding_near_dup_pairs entry) keep the rerank stage non-vacuous.

Both scales are written to parquet first so the operators see
file-backed frames (the production shape _spread sizes against).
Repetitions are interleaved across scales (1x, 10x, 1x, 10x) and the
per-stage MIN is reported — the shared-box protocol from BASELINE.md.

Prints one JSON line (also to $DEDUP_SCALE_OUT if set). Run:
  taskset -c 0-15 python experiments/dedup_scale_study.py
Env: DEDUP_SCALE_SF_DIR (default /root/testdata/sf0.1),
     DEDUP_SCALE_REPLICAS (default 10), DEDUP_SCALE_REPS (default 2).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from csv_cruncher_spark.operators import dedup, similarity
from csv_cruncher_spark.session import get_spark


def build_scaled(spark, sf_dir: str, replicas: int, out_dir: str) -> tuple[str, str]:
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    doc_parts, emb_parts = [], []
    for r in range(replicas):
        if r == 0:
            doc_parts.append(docs.select("doc_id", "text"))
        else:
            doc_parts.append(
                docs.select(
                    (F.col("doc_id") + F.lit(r * 1_000_000)).alias("doc_id"),
                    F.expr(
                        "array_join(transform(split(text, ' '), "
                        f"(x, i) -> if(i % 3 = 0, concat(x, '_r{r}'), x)), ' ')"
                    ).alias("text"),
                )
            )
        emb_parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(r * 1_000_000)).alias("vec_id"),
                F.expr(
                    "transform(embedding, (x, i) -> cast(x AS double) * "
                    f"cast(1 - 2 * pmod(hash({r}, i), 2) AS double))"
                ).alias("embedding"),
            )
        )
    d_out = os.path.join(out_dir, f"documents_x{replicas}")
    e_out = os.path.join(out_dir, f"embeddings_x{replicas}")
    union_docs = doc_parts[0]
    for p in doc_parts[1:]:
        union_docs = union_docs.unionByName(p)
    union_emb = emb_parts[0]
    for p in emb_parts[1:]:
        union_emb = union_emb.unionByName(p)
    union_docs.repartition(max(replicas, 4)).write.mode("overwrite").parquet(d_out)
    union_emb.repartition(max(replicas, 4)).write.mode("overwrite").parquet(e_out)
    return d_out, e_out


def run_once(spark, d_path: str, e_path: str) -> dict:
    docs = spark.read.parquet(d_path)
    emb = spark.read.parquet(e_path)
    out: dict = {}

    t0 = time.monotonic()
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", min_jaccard=0.4)
    out["mine_edges"] = pairs.count()
    out["mine_s"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    cc_stats: dict = {}
    groups = dedup.connected_components(
        pairs, vertices=docs.select("doc_id"), stats=cc_stats
    )
    out["cc_groups"] = groups.select("group_id").distinct().count()
    out["cc_s"] = round(time.monotonic() - t0, 3)
    out["cc_rounds"] = cc_stats.get("rounds")
    out["cc_edges"] = cc_stats.get("edges")
    dedup.release(pairs)

    t0 = time.monotonic()
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    inc = dedup.incremental_lsh_pairs(corpus, batch, "doc_id", "text")
    out["incremental_pairs"] = inc.count()
    out["incremental_s"] = round(time.monotonic() - t0, 3)
    dedup.release(inc)

    t0 = time.monotonic()
    planted = emb.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + F.lit(10_000_000)).alias("vec_id"),
        F.expr("transform(embedding, x -> cast(x AS double) * 1.5)").alias("embedding"),
    )
    both = emb.select(
        "vec_id", F.expr("transform(embedding, x -> cast(x AS double))").alias("embedding")
    ).unionByName(planted)
    epairs = similarity.pairwise_topk_within_buckets(
        both, "vec_id", "embedding", min_cosine=0.9
    )
    out["embedding_pairs"] = epairs.count()
    out["embedding_s"] = round(time.monotonic() - t0, 3)
    return out


def main() -> None:
    sf_dir = os.environ.get("DEDUP_SCALE_SF_DIR", "/root/testdata/sf0.1")
    replicas = int(os.environ.get("DEDUP_SCALE_REPLICAS", "10"))
    reps = int(os.environ.get("DEDUP_SCALE_REPS", "2"))
    spark = get_spark(app_name="dedup-scale-study")
    work = tempfile.mkdtemp(prefix="dedup_scale_")
    try:
        d1, e1 = build_scaled(spark, sf_dir, 1, work)
        dN, eN = build_scaled(spark, sf_dir, replicas, work)
        # warm-up: JIT/codegen/page-cache, result discarded
        run_once(spark, d1, e1)
        runs: dict[str, list[dict]] = {"x1": [], "xN": []}
        for _ in range(reps):  # interleaved reps — BASELINE.md protocol
            runs["x1"].append(run_once(spark, d1, e1))
            runs["xN"].append(run_once(spark, dN, eN))
        best: dict[str, dict] = {}
        for leg, rr in runs.items():
            agg = dict(rr[0])
            for r in rr[1:]:
                for k, v in r.items():
                    if k.endswith("_s"):
                        agg[k] = min(agg[k], v)
            best[leg] = agg
        ratios = {
            k[:-2]: round(best["xN"][k] / best["x1"][k], 2)
            for k in best["x1"]
            if k.endswith("_s") and best["x1"][k] > 0
        }
        result = {
            "study": "dedup_scale",
            "sf_dir": sf_dir,
            "replicas": replicas,
            "reps": reps,
            "x1": best["x1"],
            "xN": best["xN"],
            "time_ratio_xN_over_x1": ratios,
            "cc_rounds_flat": best["xN"]["cc_rounds"] <= best["x1"]["cc_rounds"] + 1,
        }
        line = json.dumps(result)
        print(line, flush=True)
        out_path = os.environ.get("DEDUP_SCALE_OUT")
        if out_path:
            with open(out_path, "w") as f:
                f.write(line + "\n")
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
