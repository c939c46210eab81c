"""Incrementally-maintained HLL registers (lake/sketch_view.py).

Load-bearing invariant, batch by batch against the REAL table feed:

    MaintainedSketch.registers(spark) == hll_build(table.read(spark))

bit-for-bit — including register death when the last URL hashing into
a register is deleted, endangered-register rescan when a deletion
retracts a stored maximum, and the estimate agreeing with a fresh
hll_estimate over a recompute.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from csv_cruncher_spark.cdc.fixtures import ChangeLogSpec, generate_change_log
from csv_cruncher_spark.cdc.pipeline import CdcPipeline
from csv_cruncher_spark.lake import ivm, sketch_view
from csv_cruncher_spark.lake.table import LakeTable
from csv_cruncher_spark.operators import sketch

M = 64


def _regs(df, group=False):
    if group:
        return {(r["lang"], r["bucket"]): r["r"] for r in df.collect()}
    return {r["bucket"]: r["r"] for r in df.collect()}


def test_maintained_registers_follow_replay(spark, tmp_path):
    paths = generate_change_log(
        ChangeLogSpec(
            n_urls=80,
            n_batches=3,
            events_per_batch=120,
            seed=47,
            out_dir=str(tmp_path / "batches"),
        )
    )
    lake = str(tmp_path / "lake")
    mv = sketch_view.MaintainedSketch(
        lake, str(tmp_path / "hll"), item_col="url", m=M
    )
    staged = tmp_path / "staged"
    staged.mkdir()
    for i, p in enumerate(paths):
        shutil.copy(p, staged / os.path.basename(p))
        CdcPipeline(lake, n_buckets=4).run(spark, str(staged))
        epoch = mv.refresh(spark)
        table = LakeTable.load(lake)
        assert epoch == table.snapshot()["epoch_id"]
        want = sketch.hll_build(table.read(spark), "url", m=M)
        assert _regs(mv.registers(spark)) == _regs(want), f"after batch {i}"
    # idempotent: nothing new -> same epoch, same registers
    before = _regs(mv.registers(spark))
    assert mv.refresh(spark) == epoch
    assert _regs(mv.registers(spark)) == before


def test_grouped_registers_and_estimate_follow_replay(spark, tmp_path):
    paths = generate_change_log(
        ChangeLogSpec(
            n_urls=60,
            n_batches=2,
            events_per_batch=100,
            seed=48,
            out_dir=str(tmp_path / "batches"),
        )
    )
    lake = str(tmp_path / "lake")
    mv = sketch_view.MaintainedSketch(
        lake, str(tmp_path / "hll"), item_col="url", m=M, group_cols=["lang"]
    )
    staged = tmp_path / "staged"
    staged.mkdir()
    for p in paths:
        shutil.copy(p, staged / os.path.basename(p))
        CdcPipeline(lake, n_buckets=4).run(spark, str(staged))
        mv.refresh(spark)
        state = LakeTable.load(lake).read(spark)
        want = sketch.hll_build(state, "url", m=M, group_cols=("lang",))
        assert _regs(mv.registers(spark), group=True) == _regs(want, group=True)
        got_est = sorted(
            map(tuple, mv.estimate(spark).collect())
        )
        want_est = sorted(
            map(
                tuple,
                sketch.hll_estimate(want, m=M, group_cols=("lang",)).collect(),
            )
        )
        assert got_est == want_est


def test_register_death_and_endangered_rescan_on_delete(spark):
    """Pure-DataFrame feed: deleting the register's sole max-rho item
    must either drop the register (last member) or re-derive the max
    from survivors — both must match a recompute exactly."""
    pre = spark.createDataFrame(
        [(f"https://a/{i}",) for i in range(30)], "url string"
    )
    post = spark.createDataFrame(
        [(f"https://a/{i}",) for i in range(0, 30, 3)], "url string"
    )
    from csv_cruncher_spark.operators.sketch import hll_bucket_rho

    b, r = hll_bucket_rho(F.col("url"), M)
    derives = {
        "__hll_bucket": lambda c: hll_bucket_rho(c("url"), M)[0],
        "__hll_rho": lambda c: hll_bucket_rho(c("url"), M)[1],
    }
    pre_d = pre.withColumn("__hll_bucket", b).withColumn("__hll_rho", r)
    post_d = post.withColumn("__hll_bucket", b).withColumn("__hll_rho", r)
    changes = ivm.derive(ivm.diff_states(pre, post, "url"), **derives)
    agg = ivm.compute_minmax(pre_d, ["__hll_bucket"], maxs={"r": "__hll_rho"})
    got = ivm.apply_changes_to_minmax(
        agg, changes, post_d, ["__hll_bucket"], maxs={"r": "__hll_rho"}
    )
    want = sketch.hll_build(post, "url", m=M)
    assert {r_["__hll_bucket"]: r_["r"] for r_ in got.collect()} == _regs(want)


def test_refresh_before_any_data_bootstraps(spark, tmp_path):
    paths = generate_change_log(
        ChangeLogSpec(
            n_urls=20,
            n_batches=1,
            events_per_batch=30,
            seed=49,
            out_dir=str(tmp_path / "batches"),
        )
    )
    lake = str(tmp_path / "lake")
    CdcPipeline(lake, n_buckets=2).run(spark, str(tmp_path / "batches"))
    mv = sketch_view.MaintainedSketch(
        lake, str(tmp_path / "hll"), item_col="url", m=M
    )
    mv.refresh(spark)
    want = sketch.hll_build(LakeTable.load(lake).read(spark), "url", m=M)
    assert _regs(mv.registers(spark)) == _regs(want)
