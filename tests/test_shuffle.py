"""Deterministic epoch shuffling (operators/shuffle.py): the global
position must be a true permutation, independent of physical layout,
different per epoch, and produced by a sharded plan (no single global
sort window)."""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_cruncher_spark.operators import shuffle


def _docs(spark, n=500):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def test_global_pos_is_a_permutation(spark):
    n = 500
    out = shuffle.epoch_shuffle(_docs(spark, n), "doc_id", epoch=1, n_shards=8)
    pos = sorted(r["global_pos"] for r in out.collect())
    assert pos == list(range(n))


def test_layout_independent(spark):
    df = _docs(spark)
    order = lambda d: {  # noqa: E731
        r["doc_id"]: r["global_pos"]
        for r in shuffle.epoch_shuffle(d, "doc_id", epoch=3, n_shards=8).collect()
    }
    assert order(df) == order(df.repartition(13, "doc_id")) == order(df.coalesce(1))


def test_epochs_are_independent_permutations(spark):
    df = _docs(spark)
    o1 = {r["doc_id"]: r["global_pos"]
          for r in shuffle.epoch_shuffle(df, "doc_id", epoch=1).collect()}
    o2 = {r["doc_id"]: r["global_pos"]
          for r in shuffle.epoch_shuffle(df, "doc_id", epoch=2).collect()}
    moved = sum(1 for k in o1 if o1[k] != o2[k])
    assert moved > 400  # essentially everything re-shuffles


def test_shard_offsets_consistent(spark):
    """Within a shard positions are contiguous and in draw order; the
    shard offset equals the number of rows in lower shards."""
    out = shuffle.epoch_shuffle(_docs(spark), "doc_id", epoch=1, n_shards=4)
    rows = out.select("shard", "pos_in_shard", "global_pos").collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    base = 0
    for s in sorted(by_shard):
        grp = sorted(by_shard[s], key=lambda r: r["pos_in_shard"])
        assert [r["global_pos"] for r in grp] == list(
            range(base, base + len(grp))
        )
        base += len(grp)


def test_plan_is_sharded_not_global_sort(spark):
    """The scale contract: the rank window partitions by shard — a
    window over an EMPTY partition spec (single-task global sort) must
    not appear anywhere in the plan."""
    out = shuffle.epoch_shuffle(_docs(spark), "doc_id", epoch=1, n_shards=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    for line in plan.splitlines():
        if "Window" in line and "partitionBy" not in line:
            # physical plan prints: Window [...], [shard#...], [draw ASC ...]
            assert "shard" in line, plan


def test_no_global_position_skips_collect(spark):
    out = shuffle.epoch_shuffle(
        _docs(spark), "doc_id", epoch=1, n_shards=8, global_position=False
    )
    assert "global_pos" not in out.columns and "pos_in_shard" in out.columns
