"""End-to-end warehouse cycle: one binlog stream consumed through every
round-5 warehouse surface at once — pipeline with expectations +
sparse-event resolution → LWW table, the SAME batches tailed into a
durable SCD2 history, point-in-time queries, retention pruning, and the
temporal join — with the cross-surface consistency contracts asserted
at each step (the "could a reference user run their whole day on this"
test, in the spirit of test_crawl_cycle_integration)."""

import base64
import csv
import os

from pyspark.sql import functions as F

from csv_cruncher_spark.cdc.expectations import Expectation
from csv_cruncher_spark.cdc.patch import DEBEZIUM_PLACEHOLDER as PH
from csv_cruncher_spark.cdc.pipeline import CdcPipeline
from csv_cruncher_spark.lake.scd_view import MaintainedScd2
from csv_cruncher_spark.lake.table import LakeTable
from csv_cruncher_spark.operators.scd import asof_lookup, prune_history
from csv_cruncher_spark.operators.joins import asof_join


def _b64(s: str) -> str:
    return base64.b64encode(s.encode()).decode()


def _write_batch(dirpath, seq, rows):
    os.makedirs(dirpath, exist_ok=True)
    path = os.path.join(dirpath, f"batch-{seq:05d}.csv")
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["op", "url", "warc_ts", "html", "lang"])
        w.writeheader()
        w.writerows(rows)
    return path


URLS = [f"https://d{i}.example/page" for i in range(6)]


def _batches(bdir):
    # t0: initial crawl of 6 pages (+1 http:// page the gate must drop)
    _write_batch(bdir, 0, [
        *[{"op": "I", "url": u, "warc_ts": f"2024-01-01 00:00:{10 + i:02d}",
           "html": _b64(f"<html><body>v1 of {u}</body></html>"), "lang": "en"}
          for i, u in enumerate(URLS)],
        {"op": "I", "url": "http://insecure.example/x",
         "warc_ts": "2024-01-01 00:00:30",
         "html": _b64("<html><body>nope</body></html>"), "lang": "en"},
    ])
    # t1: recrawl — page 0 edited; page 1 re-fetched with an ELIDED html
    # (TOAST) but a lang correction; page 2 deleted
    _write_batch(bdir, 1, [
        {"op": "U", "url": URLS[0], "warc_ts": "2024-01-02 00:00:10",
         "html": _b64(f"<html><body>v2 of {URLS[0]}</body></html>"), "lang": "en"},
        {"op": "U", "url": URLS[1], "warc_ts": "2024-01-02 00:00:11",
         "html": _b64(PH), "lang": "de"},
        {"op": "D", "url": URLS[2], "warc_ts": "2024-01-02 00:00:12",
         "html": "", "lang": ""},
    ])
    # t2: page 2 re-discovered (fresh content)
    _write_batch(bdir, 2, [
        {"op": "I", "url": URLS[2], "warc_ts": "2024-01-03 00:00:10",
         "html": _b64(f"<html><body>reborn {URLS[2]}</body></html>"), "lang": "fr"},
    ])


def test_full_warehouse_cycle(spark, tmp_path):
    bdir = str(tmp_path / "batches")
    _batches(bdir)
    tpath = str(tmp_path / "lake")
    rules = [
        Expectation("https_only", "url LIKE 'https://%'", action="drop"),
        Expectation("lang_known", "lang IN ('en','de','fr')",
                    action="dlq", applies_to=("I", "U")),
    ]
    pipe = CdcPipeline(tpath, n_buckets=4, expectations=rules,
                       partial_updates=PH)
    ckpt = pipe.run(spark, bdir)

    # 1. the gate dropped the http page; everything else applied
    t = LakeTable.load(tpath)
    state = {r.url: r for r in t.read(spark).collect()}
    assert "http://insecure.example/x" not in state
    assert ckpt["expectation_violations"]["batch-00000.csv"]["rules"]["https_only"] == 1

    # 2. the elided html resolved to batch-0 bytes, lang updated, text
    #    re-extracted from the REAL bytes
    r1 = state[URLS[1]]
    assert r1.lang == "de"
    assert b"v1 of" in bytes(r1.html)
    assert "v1 of" in r1.text

    # 3. SCD2 history from the same binlog: the history's current slice
    #    must equal the table EXCEPT gated rows (the history tails the
    #    raw binlog, the table the gated stream — so feed the history
    #    the same rules via its own screen: here we assert the delta is
    #    exactly the gated url)
    mv = MaintainedScd2(str(tmp_path / "hist"))
    mv.run(spark, bdir)
    hist = mv.read(spark)
    cur = {r.url: r for r in mv.current(spark).collect()}
    gated = set(cur) - set(state)
    assert gated == {"http://insecure.example/x"}
    for u in URLS:
        if u in cur and u in state:
            assert str(cur[u].valid_from) == str(state[u].warc_ts), u

    # 4. point-in-time: on Jan 2 noon, page 2 is deleted (gap), page 0
    #    shows v2, page 1 shows the elided-placeholder raw event (the
    #    history stores the BINLOG bytes; resolution is the table's
    #    concern — pinned so the contract is explicit)
    jan2 = "2024-01-02 12:00:00"
    snap = {
        r.url: r
        for r in asof_lookup(
            hist, jan2, ts_type="timestamp"
        ).collect()
    }
    assert URLS[2] not in snap
    assert b"v2 of" in bytes(snap[URLS[0]].html)
    assert bytes(snap[URLS[1]].html) == PH.encode()

    # 5. retention: pruning to keep only post-Jan-3 closed versions
    #    keeps every current row and the last closed version per key
    pruned = prune_history(hist, "url", older_than="2024-01-03 00:00:00")
    assert pruned.filter(F.col("is_current")).count() == hist.filter(
        F.col("is_current")
    ).count()

    # 6. temporal join: events at three times resolve to the versions
    #    their timestamps cover
    ev = spark.createDataFrame(
        [(1, URLS[0], "2024-01-01 12:00:00"),
         (2, URLS[0], "2024-01-02 12:00:00"),
         (3, URLS[2], "2024-01-02 12:00:00")],   # mid-gap -> no version
        "event_id long, url string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    joined = asof_join(
        ev,
        hist.select("url", "valid_from", "valid_to", "html"),
        on="url", left_time="ts", right_time="valid_from",
    )
    out = {
        r.event_id: r
        for r in joined.withColumn(
            "ok",
            F.col("r_valid_to").isNull() | (F.col("ts") < F.col("r_valid_to")),
        ).collect()
    }
    assert b"v1 of" in bytes(out[1].r_html) and out[1].ok
    assert b"v2 of" in bytes(out[2].r_html) and out[2].ok
    assert not out[3].ok  # interval closed by the delete before the event

    # 7. exactly-once across the whole composite: re-running everything
    #    changes nothing anywhere
    snap_before = t.snapshot()["snapshot_id"]
    pipe.run(spark, bdir)
    mv.run(spark, bdir)
    assert LakeTable.load(tpath).snapshot()["snapshot_id"] == snap_before
    assert mv.read(spark).count() == hist.count()
