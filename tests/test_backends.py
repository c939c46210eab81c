"""TableBackend contract tests — ONE scenario suite, parametrized over the
manifest lake and the Iceberg backend (SURVEY.md §7.1's two-backend
promise). The Iceberg leg is SKIPPED (not absent) when no Iceberg runtime
jar is on the classpath — this sandbox ships none, so these tests document
and pin the contract the production backend must meet, while the manifest
leg proves the scenarios are real."""

import datetime as dt
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csv_cruncher_spark.cdc.extract import extract_text  # noqa: E402
from csv_cruncher_spark.lake.backend import ManifestBackend  # noqa: E402

FIELDS = [
    ("url", "string"),
    ("warc_ts", "timestamp"),
    ("html", "binary"),
    ("text", "string"),
    ("lang", "string"),
]

EVENT_SCHEMA = "op: string, row_idx: long, url: string, warc_ts: timestamp, html: binary, lang: string"


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0, s)


def _backend(kind, spark, tmp_path):
    if kind == "manifest":
        return ManifestBackend(str(tmp_path / "lake"))
    from csv_cruncher_spark.lake.iceberg import IcebergBackend, iceberg_available

    if not iceberg_available(spark):
        pytest.skip("no Iceberg runtime jar on the classpath (sandbox)")
    return IcebergBackend(spark, f"local.db.t_{abs(hash(str(tmp_path))) % 10**8}")


def _events(spark, rows):
    # rows: (op, row_idx, url, ts_second, html_bytes, lang)
    return spark.createDataFrame(
        [(op, i, u, _ts(s), h, lg) for (op, i, u, s, h, lg) in rows], EVENT_SCHEMA
    )


def _state(spark, be):
    return {
        (r["url"], r["warc_ts"], r["text"], r["lang"])
        for r in be.read(spark).collect()
    }


@pytest.fixture(params=["manifest", "iceberg"])
def be(request, spark, tmp_path):
    b = _backend(request.param, spark, tmp_path)
    b.create(FIELDS, n_buckets=4)
    return b


def test_iceberg_batch_id_validation_rejects_sql_splicing():
    """Round-3 advice: batch ids are embedded in ALTER TABLE string
    literals — a quote would corrupt the exactly-once fence property.
    Validation is at the apply_batch boundary and is spark-free."""
    from csv_cruncher_spark.lake.iceberg import _validate_batch_id

    assert _validate_batch_id("batch-01.csv:7_x") == "batch-01.csv:7_x"
    for bad in ("it's", 'a"b', "x;drop", "", "a b", "a\\b", "a'; DROP --", None, 5):
        with pytest.raises(ValueError):
            _validate_batch_id(bad)


def test_lww_upsert_delete_and_stale_rules(spark, be):
    """The full LWW contract in one replay: in-batch dedup on max
    (version, row_idx), cross-batch version guard (equal version → the
    incoming event wins), D deletes, stale events lose."""
    b0 = _events(spark, [
        ("I", 0, "u/a", 10, b"<p>a1</p>", "en"),
        ("I", 1, "u/a", 12, b"<p>a2</p>", "en"),   # in-batch winner (later ts)
        ("I", 2, "u/b", 10, b"<p>b1</p>", "de"),
        ("I", 3, "u/c", 10, b"<p>c1</p>", "cs"),
    ])
    assert be.apply_batch(spark, b0, "batch-0", 0)["applied"]
    b1 = _events(spark, [
        ("U", 0, "u/a", 11, b"<p>a-stale</p>", "en"),  # stale: 11 < 12 → loses
        ("U", 1, "u/b", 10, b"<p>b2</p>", "de"),       # equal ts → incoming wins
        ("D", 2, "u/c", 11, b"", "cs"),                # delete
        ("I", 3, "u/d", 10, b"<p>d1</p>", "fr"),
    ])
    assert be.apply_batch(spark, b1, "batch-1", 1)["applied"]
    assert _state(spark, be) == {
        ("u/a", _ts(12), extract_text(b"<p>a2</p>"), "en"),
        ("u/b", _ts(10), extract_text(b"<p>b2</p>"), "de"),
        ("u/d", _ts(10), extract_text(b"<p>d1</p>"), "fr"),
    }


def test_reapply_is_fenced_noop(spark, be):
    b0 = _events(spark, [("I", 0, "u/a", 10, b"<p>a</p>", "en")])
    assert be.apply_batch(spark, b0, "batch-0", 0)["applied"]
    before = _state(spark, be)
    got = be.apply_batch(spark, b0, "batch-0", 0)
    assert got["applied"] is False
    assert be.applied_batches() == ["batch-0"]
    assert _state(spark, be) == before


def test_reserved_batch_prefix_rejected_and_kind_field(spark, be):
    """Round-4 advice: a user change-batch named schema-evolve-*.csv used
    to vanish from applied_batches (the filter was a name prefix) and
    re-apply on every replay. Now evolve commits carry lineage
    kind='schema' and user ids spelling the reserved prefix are rejected
    at the apply boundary."""
    with pytest.raises(ValueError, match="reserved prefix"):
        be.apply_batch(
            spark,
            _events(spark, [("I", 0, "u/a", 10, b"<p>a</p>", "en")]),
            "schema-evolve-2024.csv",
            0,
        )
    b0 = _events(spark, [("I", 0, "u/a", 10, b"<p>a</p>", "en")])
    be.apply_batch(spark, b0, "batch-0", 0)
    be.evolve(add_columns=[("status", "int")])
    assert be.applied_batches() == ["batch-0"]
    if isinstance(be, ManifestBackend):
        kinds = {e["batch"]: e.get("kind", "data") for e in be._table().snapshot()["lineage"]}
        assert kinds["batch-0"] == "data"
        assert [k for k in kinds.values() if k == "schema"] == ["schema"]
        # legacy lake: a reserved-prefix id that's ALREADY in lineage (data
        # applied before the prefix was reserved) must replay as the fenced
        # no-op, never an error — the fence runs before the rejection
        t = be._table()
        t.commit(
            new_files=[], replaced_buckets=[],
            epoch_id=t.snapshot()["epoch_id"] + 1,
            batch_id="schema-evolve-legacy.csv",
        )
        got = be.apply_batch(
            spark,
            _events(spark, [("I", 0, "u/z", 59, b"<p>z</p>", "en")]),
            "schema-evolve-legacy.csv",
            9,
        )
        assert got == {"applied": False, "reason": "already-in-lineage"}


def test_additive_evolution_then_apply(spark, be):
    b0 = _events(spark, [("I", 0, "u/a", 10, b"<p>a</p>", "en")])
    be.apply_batch(spark, b0, "batch-0", 0)
    be.evolve(add_columns=[("status", "int")])
    assert "status" in be.column_names()
    b1 = spark.createDataFrame(
        [("I", 0, "u/b", _ts(10), b"<p>b</p>", "de", 200)],
        EVENT_SCHEMA + ", status: int",
    )
    be.apply_batch(spark, b1, "batch-1", 1)
    rows = {r["url"]: r["status"] for r in be.read(spark).collect()}
    assert rows == {"u/a": None, "u/b": 200}


def test_evolve_advances_epoch_with_metadata_only_metrics(spark, be):
    """Round-3 advice: a standalone evolve must NOT reuse the tip's
    epoch_id (duplicate epochs made snapshot_at silently resolve 'state as
    of epoch N' to the post-evolve schema) nor inherit the prior batch's
    strategy/file metrics, and the synthetic evolve commit must not leak
    into the exactly-once fence surface."""
    b0 = _events(spark, [("I", 0, "u/a", 10, b"<p>a</p>", "en")])
    be.apply_batch(spark, b0, "batch-0", 0)
    be.evolve(add_columns=[("status", "int")])
    assert be.applied_batches() == ["batch-0"]
    if not isinstance(be, ManifestBackend):
        return  # epoch/metrics introspection is manifest-lake surface
    snap = be._table().snapshot()
    assert snap["epoch_id"] == 1, "evolve must advance the epoch"
    assert snap["metrics"]["last_batch_strategy"] == "metadata-only"
    assert snap["metrics"]["last_batch_files"] == 0
    # time travel to the pre-evolve epoch must return the OLD schema
    old = be._table().snapshot_at(0)
    assert "status" not in {f["name"] for f in old["schemas"][str(old["schema_version"])]}
    # the change feed spans the evolve commit without refusing, and the
    # post-evolve added column arrives as nulls
    feed = be._table().changes_between(spark, from_epoch=0)
    assert feed.count() == 0  # no data changed in (0, 1]


def test_iceberg_single_commit_fence_survives_lost_bookkeeping(spark, be):
    """Round-3 verdict #9 (jar-present environments; skipped-not-absent
    here): the exactly-once fence is the wap.id stamped into the MERGE's
    own snapshot summary, so losing the bookkeeping property commit (the
    old crash window) must NOT re-apply the batch, and the bookkeeping
    must self-heal on the next apply."""
    from csv_cruncher_spark.lake.iceberg import IcebergBackend

    if not isinstance(be, IcebergBackend):
        pytest.skip("fence-summary introspection is Iceberg-specific")
    b0 = _events(spark, [("I", 0, "u/a", 10, b"<p>a</p>", "en")])
    assert be.apply_batch(spark, b0, "batch-0", 0)["applied"]
    # simulate the crash window: the MERGE committed, the bookkeeping
    # property update was lost
    spark.sql(
        f"ALTER TABLE {be.identifier} SET TBLPROPERTIES "
        "('ccs.applied-batches'='[]')"
    )
    assert "batch-0" in be.applied_batches(), "summary-stamped id lost"
    assert be.apply_batch(spark, b0, "batch-0", 0)["applied"] is False
    # next apply's bookkeeping self-heals the epoch map from the summary
    b1 = _events(spark, [("I", 0, "u/b", 10, b"<p>b</p>", "de")])
    assert be.apply_batch(spark, b1, "batch-1", 1)["applied"]
    assert set(be._epoch_snapshots()) >= {"1"}


def _feed(spark, be, from_epoch, to_epoch=None):
    rows = be.changes_between(spark, from_epoch, to_epoch).collect()
    return {(r["__op"], r["url"], r["warc_ts"], r["text"], r["lang"]) for r in rows}


def test_change_feed_contract_net_iud(spark, be):
    """The facade change feed (round-3 verdict #1): net per-key I/U/D over
    an epoch range, bootstrap at -1, empty range empty, stale-LWW losers
    and net-unchanged keys suppressed, D rows with non-key columns nulled.
    Runs on BOTH backends (Iceberg leg skipped-not-absent without a jar)."""
    b0 = _events(spark, [
        ("I", 0, "u/a", 10, b"<p>a1</p>", "en"),
        ("I", 1, "u/b", 10, b"<p>b1</p>", "de"),
        ("I", 2, "u/c", 10, b"<p>c1</p>", "cs"),
    ])
    be.apply_batch(spark, b0, "batch-0", 0)
    b1 = _events(spark, [
        ("U", 0, "u/a", 12, b"<p>a2</p>", "en"),      # net U
        ("U", 1, "u/b", 9, b"<p>b-stale</p>", "de"),  # stale → suppressed
        ("D", 2, "u/c", 11, b"", "cs"),                # net D
        ("I", 3, "u/d", 10, b"<p>d1</p>", "fr"),       # net I
        ("I", 4, "u/e", 10, b"<p>e1</p>", "es"),       # I then D in range →
        ("D", 5, "u/e", 11, b"", "es"),                # suppressed (net zero)
    ])
    be.apply_batch(spark, b1, "batch-1", 1)
    assert _feed(spark, be, 0) == {
        ("U", "u/a", _ts(12), extract_text(b"<p>a2</p>"), "en"),
        ("D", "u/c", None, None, None),
        ("I", "u/d", _ts(10), extract_text(b"<p>d1</p>"), "fr"),
    }
    # bootstrap: full state as inserts
    assert _feed(spark, be, -1) == {
        ("I", "u/a", _ts(12), extract_text(b"<p>a2</p>"), "en"),
        ("I", "u/b", _ts(10), extract_text(b"<p>b1</p>"), "de"),
        ("I", "u/d", _ts(10), extract_text(b"<p>d1</p>"), "fr"),
    }
    # empty range
    assert _feed(spark, be, 1, 1) == set()
    # invalid range
    with pytest.raises(ValueError):
        be.changes_between(spark, 2, 5)


def test_change_feed_contract_spans_schema_evolution(spark, be):
    """A feed window containing an evolve commit must not refuse, and the
    added column must surface (nulls for rows that predate it, values for
    rows written after)."""
    b0 = _events(spark, [("I", 0, "u/a", 10, b"<p>a</p>", "en")])
    be.apply_batch(spark, b0, "batch-0", 0)
    be.evolve(add_columns=[("status", "int")])
    b1 = spark.createDataFrame(
        [("I", 0, "u/b", _ts(10), b"<p>b</p>", "de", 200)],
        EVENT_SCHEMA + ", status: int",
    )
    # the manifest backend's evolve consumed epoch 1 (metadata-only commit)
    be.apply_batch(spark, b1, "batch-1", 2)
    feed = be.changes_between(spark, 0)
    rows = {(r["__op"], r["url"], r["status"]) for r in feed.collect()}
    assert rows == {("I", "u/b", 200)}


def test_rename_is_metadata_only_and_identity_guarded(spark, be):
    b0 = _events(spark, [("I", 0, "u/a", 10, b"<p>a</p>", "en")])
    be.apply_batch(spark, b0, "batch-0", 0)
    be.evolve(renames={"lang": "language"})
    cols = be.column_names()
    assert "language" in cols and "lang" not in cols
    assert {r["language"] for r in be.read(spark).collect()} == {"en"}
    with pytest.raises(Exception, match="identity|key"):
        be.evolve(renames={"url": "page_url"})
