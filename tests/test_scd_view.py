"""MaintainedScd2 (lake/scd_view.py): batch-by-batch maintained history
equals a full scd2_history rebuild of the concatenated binlog; apply is
idempotent per batch id; the is_current slice agrees with the LWW table
the pipeline builds from the same batches."""

import os

import pytest
from pyspark.sql import functions as F

from csv_cruncher_spark.cdc.fixtures import ChangeLogSpec, generate_change_log
from csv_cruncher_spark.cdc.pipeline import CdcPipeline, read_change_batch
from csv_cruncher_spark.lake.scd_view import MaintainedScd2
from csv_cruncher_spark.lake.table import LakeTable
from csv_cruncher_spark.operators.scd import scd2_history

PAY = ["html", "lang"]


@pytest.fixture(scope="module")
def batch_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("scdlog") / "batches")
    generate_change_log(
        ChangeLogSpec(
            n_urls=60, n_batches=4, events_per_batch=120, seed=7, out_dir=d
        )
    )
    return d


def _hist_key(df):
    return sorted(
        (
            r.url,
            str(r.valid_from),
            str(r.valid_to),
            r.is_current,
            bytes(r.html) if r.html is not None else None,
            r.lang,
        )
        for r in df.collect()
    )


def test_maintained_equals_full_rebuild_after_every_batch(spark, batch_dir, tmp_path):
    mv = MaintainedScd2(str(tmp_path / "hist"))
    files = sorted(
        os.path.join(batch_dir, f)
        for f in os.listdir(batch_dir)
        if f.endswith(".csv")
    )
    log_so_far = None
    for path in files:
        b = read_change_batch(spark, path)
        mv.apply_batch(spark, b, os.path.basename(path))
        sel = b.select("url", "warc_ts", "op", *PAY, F.col("row_idx").cast("long").alias("row_idx"))
        log_so_far = sel if log_so_far is None else log_so_far.unionByName(sel)
        full = scd2_history(
            log_so_far, "url", "warc_ts", PAY, op_col="op", tiebreak_col="row_idx"
        )
        assert _hist_key(mv.read(spark)) == _hist_key(full)


def test_run_is_idempotent(spark, batch_dir, tmp_path):
    mv = MaintainedScd2(str(tmp_path / "hist"))
    st1 = mv.run(spark, batch_dir)
    before = _hist_key(mv.read(spark))
    st2 = mv.run(spark, batch_dir)  # re-delivery of every batch
    assert st2["seq"] == st1["seq"]
    assert st2["batches_applied"] == st1["batches_applied"]
    assert _hist_key(mv.read(spark)) == before


def test_current_slice_agrees_with_lww_table(spark, batch_dir, tmp_path):
    mv = MaintainedScd2(str(tmp_path / "hist"))
    mv.run(spark, batch_dir)
    tpath = str(tmp_path / "lake")
    CdcPipeline(tpath, n_buckets=4).run(spark, batch_dir)
    table_state = {
        r.url: str(r.warc_ts)
        for r in LakeTable.load(tpath).read(spark).select("url", "warc_ts").collect()
    }
    cur = {
        r.url: str(r.valid_from)
        for r in mv.current(spark).select("url", "valid_from").collect()
    }
    assert cur == table_state


def test_point_in_time_has_one_version_per_key(spark, batch_dir, tmp_path):
    from csv_cruncher_spark.operators.scd import asof_lookup

    mv = MaintainedScd2(str(tmp_path / "hist"))
    mv.run(spark, batch_dir)
    h = mv.read(spark)
    mid = h.agg(F.min("valid_to")).collect()[0][0]
    snap = asof_lookup(h.withColumn("valid_from", F.col("valid_from")), mid, ts_type="timestamp")
    dupes = snap.groupBy("url").count().filter("count > 1").count()
    assert dupes == 0


def test_read_before_any_batch_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="no maintained history"):
        MaintainedScd2(str(tmp_path / "empty")).read(spark)
