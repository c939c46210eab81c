"""Exactly-once commit protocol + checkpoint/resume tests
(SURVEY.md §7.3 phases 2-3, §7.5 trap 1)."""

import os

import pytest

from csv_cruncher_spark.cdc.fixtures import ChangeLogSpec, generate_change_log, reference_fold
from csv_cruncher_spark.cdc.pipeline import CdcPipeline
from csv_cruncher_spark.lake.table import LakeTable


@pytest.fixture(params=["localfs", "condput"], autouse=True)
def catalog_backend(request, monkeypatch):
    """Run every exactly-once test against BOTH snapshot catalogs: the
    POSIX flock+rename default AND the conditional-put object-store model
    (lake/catalog.py) — proving the commit protocol depends on nothing but
    the catalog's CAS contract (round-2 verdict item #2). The patch makes
    a bare LakeTable(path) resolve to a per-path shared in-memory catalog,
    so every pipeline/load in a test sees the same 'store'."""
    if request.param == "localfs":
        yield request.param
        return
    from csv_cruncher_spark.lake import table as table_mod
    from csv_cruncher_spark.lake.catalog import ConditionalPutCatalog

    registry: dict[str, ConditionalPutCatalog] = {}
    orig_init = table_mod.LakeTable.__init__

    def patched(self, path, catalog=None):
        if catalog is None:
            catalog = registry.setdefault(path, ConditionalPutCatalog())
        orig_init(self, path, catalog)

    monkeypatch.setattr(table_mod.LakeTable, "__init__", patched)
    yield request.param


@pytest.fixture()
def change_log(tmp_path):
    spec = ChangeLogSpec(
        n_urls=120, n_batches=4, events_per_batch=150, seed=11, out_dir=str(tmp_path / "b")
    )
    return tmp_path, generate_change_log(spec)


def _state(spark, path):
    df = LakeTable.load(path).read(spark)
    return {(r["url"], r["text"]) for r in df.collect()}


def test_crash_between_data_write_and_commit_is_recoverable(spark, change_log):
    tmp, paths = change_log
    bdir = os.path.dirname(paths[0])
    table = str(tmp / "lake")
    pipe = CdcPipeline(table, n_buckets=4)
    pipe.fail_after_data_write_on = {os.path.basename(paths[2])}
    with pytest.raises(RuntimeError, match="injected crash"):
        pipe.run(spark, bdir)

    # crashed mid-batch: 2 batches committed, orphan data files on disk,
    # manifest unaffected
    snap = LakeTable.load(table).snapshot()
    assert len(snap["lineage"]) == 2

    # resume with a FRESH pipeline object (as a restarted driver would)
    pipe2 = CdcPipeline(table, n_buckets=4)
    ckpt = pipe2.run(spark, bdir)
    assert ckpt["batches_applied"] == [os.path.basename(p) for p in paths]

    want = {(u, v["text"]) for u, v in reference_fold(paths).items()}
    assert _state(spark, table) == want


def test_crash_between_commit_and_checkpoint_is_idempotent(spark, change_log):
    """Worst spot: snapshot committed but checkpoint not yet written. On
    resume the batch is retried; the table-level lineage fence makes the
    duplicate commit a no-op."""
    tmp, paths = change_log
    bdir = os.path.dirname(paths[0])
    table = str(tmp / "lake2")
    pipe = CdcPipeline(table, n_buckets=4)
    pipe.fail_before_checkpoint_on = {os.path.basename(paths[1])}
    with pytest.raises(RuntimeError, match="injected crash"):
        pipe.run(spark, bdir)

    snap1 = LakeTable.load(table).snapshot()
    assert len(snap1["lineage"]) == 2  # batch 1 committed, checkpoint missed it

    pipe2 = CdcPipeline(table, n_buckets=4)
    pipe2.run(spark, bdir)
    snap2 = LakeTable.load(table).snapshot()
    # batch-00001 appears exactly once in lineage despite the retry
    assert [e["batch"] for e in snap2["lineage"]] == [os.path.basename(p) for p in paths]

    want = {(u, v["text"]) for u, v in reference_fold(paths).items()}
    assert _state(spark, table) == want


def test_rerun_of_fully_applied_log_is_noop(spark, change_log):
    tmp, paths = change_log
    bdir = os.path.dirname(paths[0])
    table = str(tmp / "lake3")
    CdcPipeline(table, n_buckets=4).run(spark, bdir)
    snap_a = LakeTable.load(table).snapshot()
    CdcPipeline(table, n_buckets=4).run(spark, bdir)
    snap_b = LakeTable.load(table).snapshot()
    assert snap_a["snapshot_id"] == snap_b["snapshot_id"]
    assert snap_a["files"] == snap_b["files"]


def test_resume_mid_log(spark, change_log):
    """max_batches simulates an interrupted tail; resume continues from the
    checkpoint without reprocessing."""
    tmp, paths = change_log
    bdir = os.path.dirname(paths[0])
    table = str(tmp / "lake4")
    pipe = CdcPipeline(table, n_buckets=4)
    pipe.run(spark, bdir, max_batches=2)
    ckpt = pipe.load_checkpoint()
    assert len(ckpt["batches_applied"]) == 2
    assert ckpt["epoch_id"] == 1

    CdcPipeline(table, n_buckets=4).run(spark, bdir)
    want = {(u, v["text"]) for u, v in reference_fold(paths).items()}
    assert _state(spark, table) == want
    ckpt2 = CdcPipeline(table, n_buckets=4).load_checkpoint()
    assert ckpt2["epoch_id"] == len(paths) - 1
    assert [e["batch"] for e in ckpt2["lineage"]] == [os.path.basename(p) for p in paths]
    # per-partition metrics (FIXTURES.md §A4): every bucket slot carries
    # the committed offset plus aggregated row/byte/file counts — rows come
    # from the parquet footers recorded in the manifest, so the sum across
    # buckets must equal the resolved table's physical row superset
    # (base + delta winners, before read-time MOR resolution)
    parts = ckpt2["per_partition"]
    assert parts, "checkpoint has no per-partition metrics"
    for slot in parts.values():
        assert slot["offset"] == ckpt2["epoch_id"]
        assert slot["rows"] is not None and slot["rows"] > 0
        assert slot["bytes"] > 0 and slot["files"] >= 1
    assert sum(s["rows"] for s in parts.values()) >= len(reference_fold(paths))


def test_stale_commit_raises_and_same_batch_race_is_noop(spark, change_log):
    """Optimistic concurrency at the commit point: a commit staged
    against a snapshot the manifest has moved past must raise
    ConcurrentCommitError (lost-update prevention), while a racer that
    already committed the SAME batch turns the commit into the fenced
    no-op — exactly-once survives the race."""
    from csv_cruncher_spark.lake.table import ConcurrentCommitError

    tmp, paths = change_log
    bdir = os.path.dirname(paths[0])
    table = str(tmp / "lake_cc")
    CdcPipeline(table, n_buckets=4).run(spark, bdir, max_batches=1)
    t = LakeTable.load(table)

    stale = t.snapshot()  # stage against the current tip...
    CdcPipeline(table, n_buckets=4).run(spark, bdir)  # ...then the tip moves
    import pytest as _pytest

    with _pytest.raises(ConcurrentCommitError):
        t.commit(
            new_files=[],
            replaced_buckets=[],
            epoch_id=stale["epoch_id"] + 1,
            batch_id="zz-racer",
            staged_snapshot=stale,
        )

    # same-batch race: committing an already-lineaged batch from a stale
    # snapshot is the fenced no-op, not an error
    cur = t.snapshot()
    done_batch = cur["lineage"][-1]["batch"]
    got = t.commit(
        new_files=[],
        replaced_buckets=[],
        epoch_id=cur["epoch_id"],
        batch_id=done_batch,
        staged_snapshot=stale,
    )
    assert got["snapshot_id"] == cur["snapshot_id"]


def test_concurrent_commit_retry_reprocesses_batch(spark, change_log, monkeypatch):
    """When publish loses the CAS race, the pipeline reprocesses the
    batch against the new tip (same machinery as crash-resume) instead
    of aborting the replay; final state is unaffected."""
    from csv_cruncher_spark.lake.table import ConcurrentCommitError

    tmp, paths = change_log
    bdir = os.path.dirname(paths[0])
    table = str(tmp / "lake_retry")
    real = LakeTable.commit
    fails = {"n": 0}

    def flaky(self, *a, **kw):
        if fails["n"] == 0:
            fails["n"] += 1
            raise ConcurrentCommitError("simulated racer advanced the tip")
        return real(self, *a, **kw)

    monkeypatch.setattr(LakeTable, "commit", flaky)
    CdcPipeline(table, n_buckets=4).run(spark, bdir)
    assert fails["n"] == 1  # one lost race, one successful reprocess
    want = {(u, v["text"]) for u, v in reference_fold(paths).items()}
    assert _state(spark, table) == want


def test_null_key_events_dropped_at_ingest(spark, tmp_path):
    """An event with an empty url is undeliverable (no bucket, no match);
    ingest drops it with the same tolerance as malformed timestamps
    instead of crashing the replay on a null partition directory."""
    import base64 as _b64

    bdir = tmp_path / "b"
    bdir.mkdir()
    h = _b64.b64encode(b"<p>x</p>").decode()
    (bdir / "batch-00000.csv").write_text(
        "op,url,warc_ts,html,lang\n"
        f"I,https://ok.example.com/a,2024-01-01 00:00:00,{h},en\n"
        f"I,,2024-01-01 00:00:01,{h},en\n"  # empty url → null key
        f"I,https://ok.example.com/b,2024-01-01 00:00:02,{h},de\n"
    )
    table = str(tmp_path / "lake_nullkey")
    CdcPipeline(table, n_buckets=2).run(spark, str(bdir))
    urls = {r["url"] for r in LakeTable.load(table).read(spark).collect()}
    assert urls == {"https://ok.example.com/a", "https://ok.example.com/b"}


def test_remove_orphans_sweeps_unreferenced_files_only(spark, change_log):
    """Orphan data files (crashed writes, lost-CAS retries) are invisible
    to expire_snapshots; remove_orphans deletes exactly the unreferenced
    files past the age gate and never touches referenced ones."""
    tmp, paths = change_log
    bdir = os.path.dirname(paths[0])
    table = str(tmp / "lake_orphan")
    pipe = CdcPipeline(table, n_buckets=4)
    # crash after data write, before commit → orphan w-* files on disk
    pipe.fail_after_data_write_on = {os.path.basename(paths[1])}
    with pytest.raises(RuntimeError, match="injected crash"):
        pipe.run(spark, bdir)
    CdcPipeline(table, n_buckets=4).run(spark, bdir)

    t = LakeTable.load(table)
    before = {(r["url"], r["text"]) for r in t.read(spark).collect()}
    # age gate: a fresh orphan is NOT swept
    assert t.remove_orphans(older_than_s=3600)["files_removed"] == 0
    stats = t.remove_orphans(older_than_s=0)
    assert stats["files_removed"] > 0
    # referenced data intact, table unchanged; second sweep is a no-op
    assert {(r["url"], r["text"]) for r in t.read(spark).collect()} == before
    assert t.remove_orphans(older_than_s=0)["files_removed"] == 0
