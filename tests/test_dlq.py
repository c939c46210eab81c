"""Dead-letter queue for malformed change events
(CdcPipeline(on_malformed="dlq")): keyless / unknown-op /
unparseable-timestamp rows are quarantined to <table>/dlq/<batch_id>
with a reason instead of applying, counts land in the checkpoint, and
the default 'drop' mode keeps the lenient legacy semantics exactly."""

import base64
import csv
import os

import pytest

from csv_cruncher_spark.cdc.pipeline import CdcPipeline
from csv_cruncher_spark.lake.table import LakeTable


def _write_batch(dirpath: str, seq: int, rows: list[dict]):
    os.makedirs(dirpath, exist_ok=True)
    path = os.path.join(dirpath, f"batch-{seq:05d}.csv")
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["op", "url", "warc_ts", "html", "lang"])
        w.writeheader()
        w.writerows(rows)
    return path


def _row(op="I", url="https://x.example/1", ts="2024-01-01 00:00:10",
         text="hello world page", lang="en"):
    return {
        "op": op, "url": url, "warc_ts": ts,
        "html": base64.b64encode(f"<html><body>{text}</body></html>".encode()).decode(),
        "lang": lang,
    }


BAD = [
    _row(url=""),                                  # null_key
    _row(op="X", url="https://x.example/op"),      # unknown_op
    _row(op="", url="https://x.example/nullop"),   # NULL op -> unknown_op
    _row(url="https://x.example/ts", ts="not-a-time"),  # bad_timestamp
    # a DELETE with a garbage timestamp would apply as a null-version
    # no-op delete -> must be quarantined, not silently lost
    _row(op="D", url="https://x.example/dts", ts="bogus"),
]
GOOD = [
    _row(url="https://x.example/a"),
    _row(url="https://x.example/b", ts="2024-01-01 00:00:20"),
]


def test_dlq_quarantines_and_counts(spark, tmp_path):
    batches = str(tmp_path / "b")
    table = str(tmp_path / "lake")
    _write_batch(batches, 0, GOOD + BAD)
    pipe = CdcPipeline(table, n_buckets=4, on_malformed="dlq")
    ckpt = pipe.run(spark, batches)
    # only the good rows applied
    urls = {r["url"] for r in LakeTable.load(table).read(spark).select("url").collect()}
    assert urls == {"https://x.example/a", "https://x.example/b"}
    # quarantine holds the 5 bad rows with reasons AND the raw value
    dlq = spark.read.parquet(os.path.join(table, "dlq", "batch-00000.csv"))
    rows = {(r["url"], r["__reject"]) for r in dlq.collect()}
    assert rows == {
        (None, "null_key"),
        ("https://x.example/op", "unknown_op"),
        ("https://x.example/nullop", "unknown_op"),
        ("https://x.example/ts", "bad_timestamp"),
        ("https://x.example/dts", "bad_timestamp"),
    }
    raw = {r["url"]: r["warc_ts_raw"] for r in dlq.collect()}
    assert raw["https://x.example/ts"] == "not-a-time"
    assert raw["https://x.example/dts"] == "bogus"
    # checkpoint records the count per batch
    assert ckpt["rejected_rows"] == {"batch-00000.csv": 5}


def test_dlq_clean_batch_writes_nothing(spark, tmp_path):
    batches = str(tmp_path / "b2")
    table = str(tmp_path / "lake2")
    _write_batch(batches, 0, GOOD)
    pipe = CdcPipeline(table, n_buckets=4, on_malformed="dlq")
    ckpt = pipe.run(spark, batches)
    assert ckpt["rejected_rows"] == {"batch-00000.csv": 0}
    assert not os.path.exists(os.path.join(table, "dlq"))


def test_drop_mode_keeps_lenient_semantics(spark, tmp_path):
    """Default mode: keyless rows silently dropped; bad-timestamp rows
    APPLY with a null version (losing LWW ties) and unknown/null-op rows
    apply as upserts — the pre-DLQ behavior, unchanged."""
    batches = str(tmp_path / "b3")
    table = str(tmp_path / "lake3")
    _write_batch(batches, 0, GOOD + BAD)
    pipe = CdcPipeline(table, n_buckets=4)
    pipe.run(spark, batches)
    urls = {r["url"] for r in LakeTable.load(table).read(spark).select("url").collect()}
    assert urls == {
        "https://x.example/a", "https://x.example/b",
        "https://x.example/op", "https://x.example/nullop",
        "https://x.example/ts",
    }
    assert not os.path.exists(os.path.join(table, "dlq"))


def test_on_malformed_validation():
    with pytest.raises(ValueError):
        CdcPipeline("/tmp/nope", on_malformed="explode")
