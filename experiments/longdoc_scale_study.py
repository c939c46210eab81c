#!/usr/bin/env python
"""Long-document scale study: token-array operators at constant corpus
size but growing PER-DOCUMENT length — the axis real web pages stress
(sf* fixture docs average ~300 chars; a Common-Crawl page is 10-100×
longer).

Claim under test: after the round-5 lambda-binding fix
(`dedup.shingles`, `repetition_stats` bigrams) and the row-window
winnowing design, per-token cost is FLAT in document length — the
pre-fix shingles measured 26× wall at 64× doc length on constant total
work (the O(tokens²) re-split inside the per-index lambda).

Cells: shingle mining (minhash signatures' first stage), repetition
stats, winnowing fingerprints — each at ~100k total tokens split into
(many short | medium | few long) documents. Prints one JSON line
(also to $LONGDOC_OUT).

Run:  taskset -c 0-15 python experiments/longdoc_scale_study.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from csv_cruncher_spark.operators.dedup import shingles  # noqa: E402
from csv_cruncher_spark.operators.textstats import (  # noqa: E402
    repetition_stats,
    winnowing_fingerprints,
)
from csv_cruncher_spark.session import get_spark  # noqa: E402

TOTAL_TOKENS = int(os.environ.get("LONGDOC_TOTAL_TOKENS", "200000"))
SHAPES = [(0, 100), (1, 1600), (2, 12800)]  # (tag idx, tokens per doc)
REPS = int(os.environ.get("LONGDOC_REPS", "2"))


def _mk(spark, tokens_per_doc: int):
    n_docs = max(TOTAL_TOKENS // tokens_per_doc, 4)
    word = F.expr(
        "concat('w', cast(pmod(id * 37 + pos, 97) as string), 'x', cast(pos as string))"
    )
    return (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.expr(
                f"array_join(transform(sequence(0, {tokens_per_doc - 1}), "
                f"pos -> concat('w', pmod(id * 37 + pos, 97), 'x', pos)), ' ')"
            ).alias("text"),
        )
    )


def _time(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark(app_name="longdoc-scale-study")
    try:
        frames = {}
        for _, tpd in SHAPES:
            df = _mk(spark, tpd)
            df.persist().count()  # build cost excluded from cells
            frames[tpd] = df

        def shingle_at(tpd):
            return _time(
                lambda: frames[tpd]
                .select(F.sum(F.size(shingles("text", 3))))
                .collect()
            )

        def repetition_at(tpd):
            return _time(
                lambda: repetition_stats(frames[tpd], "doc_id", "text")
                .agg(F.sum("n_bigrams"))
                .collect()
            )

        def winnow_at(tpd):
            return _time(
                lambda: winnowing_fingerprints(
                    frames[tpd], "doc_id", "text"
                ).count()
            )

        cells: dict[str, list[float]] = {}
        for _ in range(REPS):
            for _, tpd in SHAPES:
                cells.setdefault(f"shingles_{tpd}", []).append(shingle_at(tpd))
                cells.setdefault(f"repetition_{tpd}", []).append(
                    repetition_at(tpd)
                )
                cells.setdefault(f"winnowing_{tpd}", []).append(winnow_at(tpd))

        m = {k: round(min(v), 3) for k, v in cells.items()}
        short, longest = SHAPES[0][1], SHAPES[-1][1]
        out = {
            "metric": "longdoc_scale_study",
            "total_tokens": TOTAL_TOKENS,
            "tokens_per_doc": [t for _, t in SHAPES],
            **m,
            "shingles_long_over_short": round(
                m[f"shingles_{longest}"] / m[f"shingles_{short}"], 2
            ),
            "repetition_long_over_short": round(
                m[f"repetition_{longest}"] / m[f"repetition_{short}"], 2
            ),
            "winnowing_long_over_short": round(
                m[f"winnowing_{longest}"] / m[f"winnowing_{short}"], 2
            ),
        }
        line = json.dumps(out)
        print(line)
        if os.environ.get("LONGDOC_OUT"):
            with open(os.environ["LONGDOC_OUT"], "w") as f:
                f.write(line + "\n")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
