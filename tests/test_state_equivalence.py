"""State-equivalence after full change-log replay (SURVEY.md §5 implication
(a)): the Spark CDC pipeline's final table state must equal a single-process
reference fold — exact rows, byte-identical extracted text per url."""

import os

import pytest

from csv_cruncher_spark.cdc.fixtures import ChangeLogSpec, generate_change_log, reference_fold
from csv_cruncher_spark.cdc.pipeline import CdcPipeline
from csv_cruncher_spark.lake.table import LakeTable


@pytest.fixture(scope="module")
def change_log(tmp_path_factory):
    d = tmp_path_factory.mktemp("cdc")
    spec = ChangeLogSpec(
        n_urls=300, n_batches=5, events_per_batch=400, seed=7, out_dir=str(d / "batches")
    )
    paths = generate_change_log(spec)
    return d, paths


def _table_state(spark, table_path):
    from pyspark.sql import functions as F

    df = LakeTable.load(table_path).read(spark)
    # format timestamps JVM-side so the comparison is tz-conversion-free
    df = df.withColumn("warc_ts", F.date_format("warc_ts", "yyyy-MM-dd HH:mm:ss"))
    rows = df.collect()
    return {
        r["url"]: {
            "warc_ts": r["warc_ts"],
            "text": r["text"],
            "lang": r["lang"],
            "html": bytes(r["html"]) if r["html"] is not None else None,
        }
        for r in rows
    }


def test_full_replay_matches_reference_fold(spark, change_log):
    d, paths = change_log
    table_path = str(d / "lake")
    pipe = CdcPipeline(table_path, n_buckets=8)
    ckpt = pipe.run(spark, os.path.dirname(paths[0]))
    assert len(ckpt["batches_applied"]) == len(paths)

    got = _table_state(spark, table_path)
    want = reference_fold(paths)

    assert set(got) == set(want), (
        f"url sets differ: extra={set(got) - set(want)} missing={set(want) - set(got)}"
    )
    for url, w in want.items():
        g = got[url]
        assert g["text"] == w["text"], f"text mismatch for {url}"
        assert g["html"] == w["html"], f"html mismatch for {url}"
        assert g["lang"] == w["lang"], f"lang mismatch for {url}"
        assert g["warc_ts"] == w["warc_ts"], url


def test_replay_is_deterministic_across_parallelism(spark, change_log):
    """Partition-count independence: same input, different shuffle width →
    identical state (SURVEY.md §7.5 trap 5)."""
    d, paths = change_log
    p1 = str(d / "lake_p1")
    CdcPipeline(p1, n_buckets=3).run(spark, os.path.dirname(paths[0]))
    s1 = _table_state(spark, p1)
    s2 = _table_state(spark, str(d / "lake"))
    assert s1 == s2


def test_no_deleted_urls_survive(spark, change_log):
    d, paths = change_log
    want = reference_fold(paths)
    got = _table_state(spark, str(d / "lake"))
    assert set(got) == set(want)
