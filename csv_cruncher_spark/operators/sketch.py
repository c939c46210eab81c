"""Count-min sketch as a DataFrame aggregation: bounded-memory token
frequency estimation for unbounded web vocabularies.

At 100 TB the exact token-frequency table (``textstats.token_frequencies``)
is itself huge — 10^9+ distinct tokens — and many consumers (admission
heuristics, stop-token detection, quota gates) only need approximate
counts with a one-sided error bound. A count-min sketch (Cormode &
Muthukrishnan 2005) holds ``depth × width`` int64 counters regardless of
vocabulary size: estimate(t) = min over the ``depth`` rows of the
counter each row hashes t into; the estimate NEVER undercounts and
overcounts by ≤ (total_tokens / width) with probability ≥ 1 − 2^-depth.

Spark-first shape: the sketch IS a DataFrame of (row, bucket, c) — built
by ONE partial-combined aggregation over (row, bucket) keys (depth·width
distinct keys, so the map side collapses everything; the shuffle carries
at most depth·width rows per task). No driver state, no UDAF, no RDDs;
merging sketches of two corpora is a union + re-aggregate, and the
sketch parquet-persists like any table (the ``bloom_bits`` discipline,
operators/bloom.py).

Cross-engine exactness: bucket assignment is the portable
48-bit-md5-prefix-mod trick (``minhash_md5_signatures``,
operators/dedup.py:291) and every counter is an int64 SUM — the DuckDB
oracle replays the build AND the probe bit-for-bit, so this
"approximate" operator still carries a FULL value oracle (the estimates
are deterministic; only their relation to exact counts is approximate,
and the overestimate bound is pinned by tests).

The reference engine has no sketch operators; this is part of the
beyond-reference training-data layer (brief: "a novel sketch").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def count_min_build(
    df: DataFrame,
    text_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Build the sketch over the whitespace token stream of ``text_col``.

    Returns (row, bucket, c): one int64 counter per non-empty cell
    (absent cells are zero — the probe coalesces). Plan: explode tokens
    (narrow), replicate each token ``depth`` times via a literal-array
    explode (still narrow), ONE hash aggregation on (row, bucket) whose
    key space is depth·width — the map-side combine collapses any input
    size to at most depth·width partial rows per task, which is the
    whole point of the sketch."""
    toks = df.select(F.explode(F.split(F.col(text_col), " ")).alias("tok"))
    rows = toks.select(
        "tok",
        F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("row"),
    )
    return (
        rows.select("row", _bucket_for_rows("tok", width))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _bucket_for_rows(tok_col: str, width: int) -> F.Column:
    """Portable bucket hash keyed by the ALREADY-EXPLODED row column:
    uint48 of md5(tok || ':cms:' || row) mod width — bit-identical to
    DuckDB's ('0x' || substr(md5(...), 1, 12))::BIGINT % width. Each
    sketch row value acts as an independent hash function."""
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.col(tok_col), F.lit("cms"), F.col("row").cast("string")
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("long"),
        F.lit(width),
    ).alias("bucket")


def count_min_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    token_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Estimate counts for ``probes[token_col]`` against a built sketch:
    est(t) = min over rows of the counter t hashes into, 0 when any row's
    cell is empty (an absent cell means nothing ever hashed there, and
    min(…, 0) = 0 — tokens never seen estimate exactly 0 unless every
    one of their ``depth`` cells collides).

    Plan: probes replicate ``depth`` ways (narrow), LEFT equi-join on the
    (row, bucket) key — the sketch side is at most depth·width rows, so
    Spark broadcasts it — then ONE MIN aggregation per token. O(probes)
    end-to-end."""
    p = probes.select(F.col(token_col).alias("tok")).select(
        "tok",
        F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("row"),
    )
    keyed = p.select("tok", "row", _bucket_for_rows("tok", width))
    joined = keyed.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return joined.groupBy("tok").agg(
        F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est_count")
    )
