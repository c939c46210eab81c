"""SnapshotCatalog contract tests (lake/catalog.py) — spark-free: commit
is pure metadata, so the CAS semantics are testable without a session."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csv_cruncher_spark.lake.catalog import (  # noqa: E402
    ConditionalPutCatalog,
    LocalFsCatalog,
)
from csv_cruncher_spark.lake.table import ConcurrentCommitError, LakeTable  # noqa: E402

FIELDS = [("url", "string"), ("warc_ts", "timestamp"), ("text", "string")]


@pytest.fixture(params=["localfs", "condput"])
def table(request, tmp_path):
    path = str(tmp_path / "t")
    cat = None if request.param == "localfs" else ConditionalPutCatalog()
    return LakeTable.create(path, FIELDS, n_buckets=4, catalog=cat)


def test_localfs_catalog_refuses_object_store_uris():
    """os.replace/flock are not atomic on object stores; pointing the
    POSIX catalog at one must fail loudly, not corrupt silently."""
    for uri in ("s3://bucket/t", "s3a://bucket/t", "gs://bucket/t", "abfss://c@a/t"):
        with pytest.raises(ValueError, match="not atomic on|object store"):
            LocalFsCatalog(uri)


def test_commit_cas_loser_raises_and_winner_content_survives(table):
    """Two commits staged against the same tip: exactly one wins the
    pointer CAS; the loser raises; and — the lost-update the unique
    staged names exist to prevent — the winner's snapshot content is
    still what the pointer resolves to after the loser's failed attempt
    (a deterministic staged name would let the loser's stage clobber the
    winner's object post-swap)."""
    tip = table.snapshot()
    won = table.commit(
        new_files=[{"path": "data/w-a.parquet", "bucket": 0, "bytes": 1, "rows": 1}],
        replaced_buckets=[],
        epoch_id=0,
        batch_id="batch-A",
        staged_snapshot=tip,
    )
    with pytest.raises(ConcurrentCommitError):
        table.commit(
            new_files=[{"path": "data/w-b.parquet", "bucket": 1, "bytes": 1, "rows": 1}],
            replaced_buckets=[],
            epoch_id=0,
            batch_id="batch-B",
            staged_snapshot=tip,  # stale: tip moved to batch-A's snapshot
        )
    cur = table.snapshot()
    assert cur["snapshot_id"] == won["snapshot_id"]
    assert [f["path"] for f in cur["files"]] == ["data/w-a.parquet"]
    assert [e["batch"] for e in cur["lineage"]] == ["batch-A"]


def test_commit_same_batch_race_is_fenced_noop(table):
    tip = table.snapshot()
    won = table.commit([], [], epoch_id=0, batch_id="b0", staged_snapshot=tip)
    again = table.commit([], [], epoch_id=0, batch_id="b0", staged_snapshot=tip)
    assert again["snapshot_id"] == won["snapshot_id"]


def _race_once(table, racer_batch="b-racer"):
    """Arrange a TRUE lost CAS: a racer commits between this table's
    pre-flight tip read and its pointer swap, so the loser's snapshot is
    staged (unique name) and then loses the swap."""
    real_swap = table.catalog.swap_pointer
    state = {"raced": False}

    def racy_swap(expected, new):
        if not state["raced"]:
            state["raced"] = True
            LakeTable(table.path, table.catalog).commit(
                [], [], epoch_id=99, batch_id=racer_batch
            )
        return real_swap(expected, new)

    table.catalog.swap_pointer = racy_swap
    return state


def test_history_chain_skips_lost_cas_orphans(table):
    """A lost-CAS staged snapshot shares the winner's snapshot_id; history
    must follow the parent chain and never surface the orphan."""
    tip = table.snapshot()
    table.commit([], [], epoch_id=0, batch_id="b0", staged_snapshot=tip)
    _race_once(table)
    with pytest.raises(ConcurrentCommitError):
        table.commit([], [], epoch_id=1, batch_id="b-lost")
    hist = table.snapshot_history()
    assert [s["snapshot_id"] for s in hist] == [0, 1, 2]
    assert [s.get("batch_id") for s in hist] == [None, "b0", "b-racer"]
    # orphan + racer share snapshot_id 2: store holds 4 objects, chain 3
    assert len(table.catalog.list_snapshot_names()) == 4


def test_remove_orphans_sweeps_lost_cas_snapshot_metadata(table):
    tip = table.snapshot()
    table.commit([], [], epoch_id=0, batch_id="b0", staged_snapshot=tip)
    _race_once(table)
    with pytest.raises(ConcurrentCommitError):
        table.commit([], [], epoch_id=1, batch_id="b-lost")
    assert len(table.catalog.list_snapshot_names()) == 4
    table.remove_orphans(older_than_s=0)
    assert len(table.catalog.list_snapshot_names()) == 3
    assert [s["snapshot_id"] for s in table.snapshot_history()] == [0, 1, 2]


def test_lost_cas_same_batch_is_fenced_noop_after_race(table):
    """The racer committed the SAME batch → the loser's commit returns the
    racer's snapshot instead of raising (exactly-once survives the race,
    now at the catalog CAS itself, not just the pre-flight)."""
    _race_once(table, racer_batch="b-same")
    got = table.commit([], [], epoch_id=99, batch_id="b-same")
    assert got["batch_id"] == "b-same"
    assert [s.get("batch_id") for s in table.snapshot_history()] == [None, "b-same"]


def test_conditional_put_catalog_counts_cas_failures(table):
    if not isinstance(table.catalog, ConditionalPutCatalog):
        pytest.skip("condput-specific")
    _race_once(table)
    with pytest.raises(ConcurrentCommitError):
        table.commit([], [], epoch_id=1, batch_id="b-lost")
    assert table.catalog.cas_failures >= 1


def test_remove_orphans_age_gate_protects_staged_snapshot(table):
    """Round-3 advice: the age gate must come from the CATALOG contract,
    not local-disk mtimes — with an object-store catalog the old stat-based
    gate saw no file and swept a concurrent committer's staged-but-not-yet
    -swapped snapshot immediately. A young orphan must survive a sweep with
    a non-zero age gate on BOTH catalog types."""
    tip = table.snapshot()
    table.commit([], [], epoch_id=0, batch_id="b0", staged_snapshot=tip)
    # a committer mid-flight: staged, pointer not yet swapped
    staged = dict(table.snapshot(), snapshot_id=99)
    table.catalog.stage_snapshot("snap-00000099-deadbeef.json", staged)
    before = len(table.catalog.list_snapshot_names())
    table.remove_orphans(older_than_s=3600)
    assert len(table.catalog.list_snapshot_names()) == before, (
        "in-flight staged snapshot younger than the gate was swept"
    )
    # once old enough (gate 0), the same orphan is collectable
    table.remove_orphans(older_than_s=0)
    assert len(table.catalog.list_snapshot_names()) == before - 1


def test_snapshot_age_is_known_for_both_catalogs(table):
    tip_name = table.catalog.load_pointer()
    age = table.catalog.snapshot_age_s(tip_name)
    assert age is not None and 0 <= age < 3600
    assert table.catalog.snapshot_age_s("snap-nonexistent.json") is None


def test_legacy_layout_loads_and_commits(tmp_path):
    """Tables written before the catalog abstraction (deterministic
    snap-<id>.json names, no parent_name) must load, walk history, and
    accept new commits whose snapshots chain onto the legacy names."""
    import json

    path = str(tmp_path / "legacy")
    os.makedirs(os.path.join(path, "snapshots"))
    os.makedirs(os.path.join(path, "data"))
    root = {
        "snapshot_id": 0,
        "parent": None,
        "epoch_id": -1,
        "batch_id": None,
        "key_col": "url",
        "version_col": "warc_ts",
        "n_buckets": 4,
        "schema_version": 1,
        "schemas": {"1": [{"id": 1, "name": "url", "type": "string"}]},
        "next_field_id": 2,
        "files": [],
        "lineage": [],
        "metrics": {"rows": 0, "bytes": 0},
    }
    child = dict(root, snapshot_id=1, parent=0, epoch_id=0, batch_id="b0",
                 lineage=[{"batch": "b0", "snapshot": 1, "epoch": 0}])
    for s in (root, child):
        with open(os.path.join(path, "snapshots", f"snap-{s['snapshot_id']:08d}.json"), "w") as f:
            json.dump(s, f)
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump({"snapshot": "snap-00000001.json"}, f)

    t = LakeTable.load(path)
    assert [s["snapshot_id"] for s in t.snapshot_history()] == [0, 1]
    new = t.commit([], [], epoch_id=1, batch_id="b1")
    assert new["parent_name"] == "snap-00000001.json"
    assert [s["snapshot_id"] for s in t.snapshot_history()] == [0, 1, 2]
