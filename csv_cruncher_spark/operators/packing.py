"""Sequence packing for training-data preparation: concatenate documents
into a token stream and cut it into fixed-budget chunks (the GPT-style
pack-then-split layout — documents may span a chunk boundary; nothing is
padded, nothing is dropped).

Packing is a PREFIX SCAN — each document's position depends on every
document before it — which is the textbook non-commutative shape that
cannot be a hash aggregate. The scalable form shards the corpus first:
one exchange on the shard key, then an ordered window per shard computes
the running token offset. Shards are independent streams (training
shards/files), so the scan parallelizes across them; pick ``n_shards``
so one shard's metadata fits a partition (the window carries only
(id, n_tokens) — payloads are joined back by the caller if needed).

Determinism: shard assignment and in-shard order are pure functions of
the document id, so the chunk layout is bit-reproducible across runs,
partitionings, and cluster sizes — and re-derivable in ANSI SQL (the
DuckDB oracle entry replays the same window math).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["pack_sequences"]


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count_col: str | Column,
    budget: int,
    n_shards: int,
    shard: Column | None = None,
) -> DataFrame:
    """Assign every document its place in the packed token stream.

    Returns the input plus:

      shard         which independent stream the doc belongs to
      start_offset  the doc's first token's offset within its shard
      first_chunk   floor(start_offset / budget)
      last_chunk    the chunk holding the doc's final token (== first
                    for docs shorter than the distance to the boundary;
                    > first when the doc spans; == first for empty docs)

    ``shard`` defaults to ``pmod(id, n_shards)``; pass e.g.
    ``F.pmod(F.xxhash64(id), n)`` when ids are not uniformly spread.
    In-shard order is ascending ``id_col`` — stable under corpus
    APPENDS with increasing ids (existing offsets never change), which
    is what makes packed shards incrementally extensible.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    n_tok = (
        F.col(token_count_col)
        if isinstance(token_count_col, str)
        else token_count_col
    ).cast("long")
    shard_c = (
        shard
        if shard is not None
        else F.pmod(F.col(id_col).cast("long"), F.lit(n_shards))
    ).cast("long")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        df.withColumn("shard", shard_c)
        .withColumn("__n_tok", n_tok)
        .withColumn(
            "start_offset", F.coalesce(F.sum("__n_tok").over(w), F.lit(0))
        )
    )
    first = F.floor(F.col("start_offset") / budget)
    last = F.floor(
        (F.col("start_offset") + F.greatest(F.col("__n_tok"), F.lit(1)) - 1)
        / budget
    )
    return (
        out.withColumn("first_chunk", first)
        .withColumn("last_chunk", last)
        .drop("__n_tok")
    )
