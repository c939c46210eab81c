"""Redirect-chain resolution: (src → dst) hop edges → final landing URL.

A crawl's CDC key is the url, but the web serves the same page under
redirect chains (http→https, host canonicalization, moved paths); an
un-resolved frontier wastes fetches and fractures LWW dedup keys. This
module folds a redirect edge list into a src → final-destination map
with pointer doubling: after ``rounds`` self-joins every chain of up to
``2**rounds`` hops is fully resolved — O(log max-chain) rounds, never a
per-row walk.

Cross-engine exactness: the whole computation is equi-joins + coalesce
on strings and int64 hop addition, so a DuckDB oracle replays the same
unrolled rounds bit-for-bit (cycles included — a cycle never resolves,
it just orbits deterministically, and the fixed round count makes the
orbit position identical on both engines).

Scale shape (10^10 edges): the mapping frame is always
(src, dst, hops) — three narrow columns; each round is ONE self
equi-join on the url key (uniform — urls are unique) plus a projection;
each round's input is persisted so the doubled plan stays linear in
rounds (release points ride the returned frame, `dedup.release`).

Reference parity: csv-cruncher has no link surface; new-engine crawl
canonicalization for the webtext payload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["resolve_redirects"]


def resolve_redirects(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    rounds: int = 4,
) -> DataFrame:
    """Resolve every redirect source to its final landing url.

    Returns (src, final_url, n_hops, resolved): ``resolved`` is false
    when the chain still points at a redirecting url after
    ``2**rounds`` hops — a cycle or an over-long chain; ``n_hops`` is
    the number of edges traversed to reach ``final_url`` (for a cycle,
    the fixed ``2**rounds`` orbit length).

    Input contract: redirect maps are functional (one target per src);
    a src carrying several targets keeps the lexicographically smallest
    (deterministic). Self-loops (src == dst) are cycles of length 1 and
    come back unresolved.
    """
    m = (
        edges.groupBy(F.col(src_col).alias("src"))
        .agg(F.min(dst_col).alias("dst"))
        .select("src", "dst", F.lit(1).cast("long").alias("hops"))
    )
    pinned = []
    for _ in range(rounds):
        m.persist()
        pinned.append(m)
        m = (
            m.alias("a")
            .join(m.alias("b"), F.col("a.dst") == F.col("b.src"), "left")
            .select(
                F.col("a.src").alias("src"),
                F.coalesce(F.col("b.dst"), F.col("a.dst")).alias("dst"),
                (F.col("a.hops") + F.coalesce(F.col("b.hops"), F.lit(0))).alias(
                    "hops"
                ),
            )
        )
    # final dst still having an out-edge == not a landing page
    srcs = pinned[0].select(F.col("src").alias("__rsrc"))
    out = (
        m.alias("m")
        .join(srcs.alias("s"), F.col("m.dst") == F.col("s.__rsrc"), "left")
        .select(
            F.col("m.src").alias("src"),
            F.col("m.dst").alias("final_url"),
            F.col("m.hops").alias("n_hops"),
            F.col("s.__rsrc").isNull().alias("resolved"),
        )
    )
    # already persisted above — register release points without a
    # second persist() call (the _pin contract, minus its persist)
    out._ccs_pinned = getattr(out, "_ccs_pinned", []) + pinned
    return out
