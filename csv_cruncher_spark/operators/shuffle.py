"""Deterministic epoch shuffling: a reproducible global permutation of
the corpus per training epoch — the data-loading order operator that
pairs with sequence packing (operators/packing.py).

Why not ``df.orderBy(rand(seed))``: Spark's ``rand`` draws from a
per-partition stream, so the permutation changes with layout and
parallelism, and a resumed job cannot re-derive "position 1 234 567 of
epoch 3". Hashing the stable key with an epoch-salted md5 makes the
order a pure function of (key, epoch): bit-reproducible on any cluster
size, any partitioning, any engine — and sliceable ("rows [a, b) of the
epoch") for checkpointed training loops.

Scale shape: a SINGLE global ``row_number`` window is the classic
scale-killer (one task sorts everything). Instead the permutation is
sharded — shard = 16-bit prefix of the draw mod ``n_shards``, in-shard
rank = ordered window per shard — so the sort parallelizes across
shards exactly like packing's prefix scan. The global position adds
each shard's offset: a prefix sum over the shard histogram, collected
to the driver (bounded by ``n_shards``, never rows) and applied as a
literal map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .sampling import hash_bucket

__all__ = ["epoch_shuffle"]


def epoch_shuffle(
    df: DataFrame,
    key_col: str,
    epoch: int,
    n_shards: int = 256,
    salt: str = "shuffle-v1",
    global_position: bool = True,
) -> DataFrame:
    """The input plus its epoch-``epoch`` shuffle coordinates:

      shard         which of the ``n_shards`` independent streams
      pos_in_shard  1-based rank within the shard (draw order, key ties)
      global_pos    0-based position in the full epoch permutation
                    (only when ``global_position=True`` — computing it
                    collects the shard histogram, one bounded action)

    Every epoch is an independent permutation (the epoch number is in
    the salt); the same (key, epoch) maps to the same position on every
    run and layout. Draw collisions (32-bit) are broken by the key, so
    the order is total and deterministic."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    draw = hash_bucket(F.col(key_col), f"{salt}:e{epoch}")
    shard = F.pmod(
        F.conv(F.substring(draw, 1, 4), 16, 10).cast("long"), F.lit(n_shards)
    )
    w = Window.partitionBy("shard").orderBy("__draw", key_col)
    out = (
        df.withColumn("__draw", draw)
        .withColumn("shard", shard)
        .withColumn("pos_in_shard", F.row_number().over(w).cast("long"))
    )
    if not global_position:
        return out.drop("__draw")
    hist = {
        r["shard"]: r["n"]
        for r in out.groupBy("shard").agg(F.count("*").alias("n")).collect()
    }
    offsets: list[F.Column] = []
    acc = 0
    for s in sorted(hist):
        offsets += [F.lit(s), F.lit(acc)]
        acc += hist[s]
    off = F.element_at(F.create_map(*offsets), F.col("shard"))
    return out.withColumn(
        "global_pos", (off + F.col("pos_in_shard") - 1).cast("long")
    ).drop("__draw")
