"""Offline validation of IcebergBackend's generated SQL and fence logic
(round-4 verdict #5: the sandbox ships no Iceberg runtime jar and no
pyiceberg, so the live leg cannot execute — attempted and blocked, see
SURVEY.md §7.1; this suite is the strongest evidence available offline).

What executes for real here:

1. every statement the backend would issue is captured via a recording
   session facade and parsed by SPARK'S OWN SQL PARSER (`parsePlan` —
   syntax-checked without execution; Spark 4 parses MERGE INTO, CALL
   with named args, and all the DDL natively), so a quoting/splicing
   regression in statement assembly is a red build, not a production
   surprise;
2. the single-commit `wap.id` fence protocol is asserted on the recorded
   timeline: the MERGE is issued WITH spark.wap.id == batch id, the
   bookkeeping ALTER comes after, and the conf is restored;
3. the changelog post-processing (op mapping, D-row nulling, __before
   folding) runs END-TO-END on a real changelog-shaped DataFrame served
   through the facade's CALL — the Spark code after the procedure call
   is fully executed and value-checked.

Not covered (needs the jar): Iceberg's own execution of the statements.
The contract suite in tests/test_backends.py pins those semantics on the
manifest twin and runs the Iceberg leg wherever a jar exists.
"""

import datetime as dt
import json
import re

import pytest

from csv_cruncher_spark.lake.iceberg import (
    _PROP_BATCHES,
    _PROP_EPOCH,
    _PROP_EPOCH_SNAPSHOTS,
    IcebergBackend,
)

IDENT = "local.db.pages"
FIELDS = [
    ("url", "string"),
    ("warc_ts", "timestamp"),
    ("html", "binary"),
    ("text", "string"),
    ("lang", "string"),
]


class _FakeConf:
    def __init__(self):
        self._d = {}

    def get(self, k, default=None):
        return self._d.get(k, default)

    def set(self, k, v):
        self._d[k] = v

    def unset(self, k):
        self._d.pop(k, None)


class _RecordingSpark:
    """Session facade: records every .sql() string (with the wap.id in
    effect when it was issued), serves scripted metadata reads, and
    delegates DataFrame machinery to the real session."""

    def __init__(self, real):
        self._real = real
        self.statements: list[tuple[str, str | None]] = []
        self.conf = _FakeConf()
        self.catalog = real.catalog
        self.props: dict[str, str] = {}
        # scripted snapshot log: (snapshot_id, wap_id or None)
        self.snapshots: list[tuple[int, str | None]] = []
        self.columns: list[tuple[str, str]] = list(FIELDS)

    # -- scripted result frames ------------------------------------------
    def _rows(self, rows, schema):
        return self._real.createDataFrame(rows, schema)

    def sql(self, q: str):
        self.statements.append((q, self.conf.get("spark.wap.id")))
        s = q.strip()
        if s.startswith("SHOW TBLPROPERTIES"):
            return self._rows(
                list(self.props.items()) or [("", "")], "key string, value string"
            )
        if "FROM " + IDENT + ".snapshots" in s:
            m = re.search(r"summary\['wap\.id'\] = '([^']*)'", s)
            if m:
                sids = [(sid,) for sid, wap in self.snapshots if wap == m.group(1)]
                return self._rows(sids or [], "snapshot_id long")
            if "AS wid" in s:
                return self._rows(
                    [(wap,) for _, wap in self.snapshots if wap is not None],
                    "wid string",
                )
            if "ORDER BY committed_at DESC" in s:
                latest = [(self.snapshots[-1][0],)] if self.snapshots else []
                return self._rows(latest, "snapshot_id long")
            return self._rows(
                [(sid,) for sid, _ in self.snapshots], "snapshot_id long"
            )
        if s.startswith("MERGE INTO"):
            # a MERGE commit: new snapshot stamped with the active wap.id
            nxt = (self.snapshots[-1][0] + 1) if self.snapshots else 1
            self.snapshots.append((nxt, self.conf.get("spark.wap.id")))
            return self._rows([], "x int")
        if "SET TBLPROPERTIES" in s:
            for k, v in re.findall(r"'((?:[^'\\]|\\.)*)'\s*=\s*'((?:[^'\\]|\\.)*)'", s):
                self.props[k] = v
            return self._rows([], "x int")
        if s.startswith("CALL"):
            view = re.search(r"changelog_view => '([^']+)'", s).group(1)
            self._changelog().createOrReplaceTempView(view)
            return self._rows([], "x int")
        m = re.search(r"ADD COLUMN `([^`]+)` (\w+)", s)
        if m:
            self.columns.append((m.group(1), m.group(2)))
            return self._rows([], "x int")
        m = re.search(r"RENAME COLUMN `([^`]+)` TO `([^`]+)`", s)
        if m:
            self.columns = [
                (m.group(2) if n == m.group(1) else n, t) for n, t in self.columns
            ]
            return self._rows([], "x int")
        # CREATE TABLE: record only
        return self._rows([], "x int")

    def table(self, name: str):
        if name == IDENT:
            ddl = ", ".join(f"`{n}` {t}" for n, t in self.columns)
            return self._real.createDataFrame([], ddl)
        return self._real.table(name)

    @property
    def read(self):
        return self._real.read

    # changelog rows served by the CALL: one net update pair, one insert,
    # one delete — the three shapes the feed must project onto I/U/D.
    # Schema follows the table's CURRENT (post-evolve) columns.
    def _changelog(self):
        t = dt.datetime(2024, 1, 1)

        def row(url, text, ct):
            d = {n: None for n, _ in self.columns}
            d["url"], d["warc_ts"], d["text"] = url, t, text
            return tuple(d[n] for n, _ in self.columns) + (ct,)

        rows = [
            row("u/a", "old text a", "UPDATE_BEFORE"),
            row("u/a", "new text a", "UPDATE_AFTER"),
            row("u/b", "text b", "INSERT"),
            row("u/c", "text c", "DELETE"),
        ]
        ddl = ", ".join(f"`{n}` {ty}" for n, ty in self.columns)
        return self._real.createDataFrame(rows, ddl + ", _change_type string")


def _backend(spark) -> tuple[IcebergBackend, _RecordingSpark]:
    fake = _RecordingSpark(spark)
    be = IcebergBackend.__new__(IcebergBackend)  # skip the jar probe
    be.spark = fake
    be.identifier = IDENT
    be.key_col = "url"
    be.version_col = "warc_ts"
    return be, fake


def _events(spark):
    ddl = ("op string, row_idx long, url string, warc_ts timestamp, "
           "html binary, lang string")
    t = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [("I", 0, "u/a", t, b"<p>a</p>", "en"), ("D", 1, "u/c", t, b"", "cs")],
        ddl,
    )


def _drive(spark):
    """Full backend lifecycle against the recorder; returns the fake."""
    be, fake = _backend(spark)
    be.create(FIELDS, n_buckets=16)
    be.evolve(add_columns=[("status", "int")], renames={"lang": "language"})
    assert be.apply_batch(fake, _events(spark), "batch-0.csv", 0)["applied"]
    # re-apply: fenced by the recorded property/summary, no second MERGE
    assert be.apply_batch(fake, _events(spark), "batch-0.csv", 0)["applied"] is False
    assert be.apply_batch(fake, _events(spark), "batch-1.csv", 1)["applied"]
    feed = be.changes_between(fake, from_epoch=0, to_epoch=1, with_before=True)
    return be, fake, feed


def test_every_generated_statement_parses(spark):
    _, fake, _ = _drive(spark)
    parser = spark._jsparkSession.sessionState().sqlParser()
    assert len(fake.statements) >= 8
    for stmt, _wap in fake.statements:
        parser.parsePlan(stmt)  # raises ParseException on bad SQL


def test_wap_fence_protocol_on_recorded_timeline(spark):
    be, fake, _ = _drive(spark)
    merges = [(i, s, w) for i, (s, w) in enumerate(fake.statements)
              if s.startswith("MERGE INTO")]
    assert len(merges) == 2, "re-apply must be fenced before a second MERGE"
    i_merge, merge_sql, wap_at_merge = merges[0]
    # the fence rides IN each MERGE commit
    assert wap_at_merge == "batch-0.csv" and merges[1][2] == "batch-1.csv"
    # conf restored after apply (no wap.id leaks into later statements)
    assert fake.conf.get("spark.wap.id") is None
    # bookkeeping ALTER comes after its MERGE and round-trips the ids
    alters = [(i, s) for i, (s, _) in enumerate(fake.statements)
              if _PROP_BATCHES in s and s.startswith("ALTER TABLE")]
    assert alters and all(i > i_merge for i, _ in alters)
    assert json.loads(fake.props[_PROP_BATCHES]) == ["batch-0.csv", "batch-1.csv"]
    assert fake.props[_PROP_EPOCH] == "1"
    # epoch→snapshot map points at each MERGE-created snapshot
    assert json.loads(fake.props[_PROP_EPOCH_SNAPSHOTS]) == {"0": 1, "1": 2}
    # MERGE shape: version-guarded D/U arms + NOT MATCHED insert, and
    # whole-row semantics null the columns the batch doesn't carry
    assert "WHEN MATCHED AND s.op = 'D' AND s.`warc_ts` >= t.`warc_ts` THEN DELETE" in merge_sql
    assert "WHEN MATCHED AND s.op != 'D' AND s.`warc_ts` >= t.`warc_ts` THEN UPDATE SET" in merge_sql
    assert "WHEN NOT MATCHED AND s.op != 'D' THEN INSERT" in merge_sql
    assert "t.`status` = NULL" in merge_sql  # evolved col absent from batch
    assert be.applied_batches() == ["batch-0.csv", "batch-1.csv"]


def test_applied_batches_heals_from_summary_after_crash(spark):
    """Crash window: MERGE committed (wap.id in a snapshot summary) but
    the bookkeeping ALTER never ran — the id must still be visible and
    a re-apply must be fenced without a second MERGE."""
    be, fake = _backend(spark)
    be.create(FIELDS, n_buckets=16)
    fake.snapshots.append((7, "orphan-batch.csv"))  # summary-only id
    assert be.applied_batches() == ["orphan-batch.csv"]
    got = be.apply_batch(fake, _events(spark), "orphan-batch.csv", 3)
    assert got["applied"] is False
    assert not any(s.startswith("MERGE") for s, _ in fake.statements)


def test_changelog_postprocessing_executes_for_real(spark):
    """Everything after the CALL is real Spark code — run it on the
    scripted changelog view and value-check the I/U/D projection."""
    _, fake, feed = _drive(spark)
    call = next(s for s, _ in fake.statements if s.startswith("CALL"))
    assert "'start-snapshot-id', '1'" in call and "net_changes => true" in call
    assert "identifier_columns => array('url')" in call
    rows = {r["url"]: r for r in feed.collect()}
    assert rows["u/a"]["__op"] == "U" and rows["u/a"]["text"] == "new text a"
    assert rows["u/a"]["__before"]["text"] == "old text a"
    assert rows["u/b"]["__op"] == "I" and rows["u/b"]["__before"] is None
    assert rows["u/c"]["__op"] == "D"
    assert rows["u/c"]["text"] is None, "D rows null non-key payload"
    assert rows["u/c"]["__before"]["text"] == "text c", "D pre-image kept"


def test_changes_between_refuses_expired_start_snapshot(spark):
    be, fake = _backend(spark)
    be.create(FIELDS, n_buckets=16)
    fake.props[_PROP_EPOCH] = "2"
    fake.props[_PROP_EPOCH_SNAPSHOTS] = json.dumps({"0": 1, "1": 2, "2": 3})
    fake.snapshots = [(2, None), (3, None)]  # snapshot 1 expired
    with pytest.raises(ValueError, match="expired|gone"):
        be.changes_between(fake, from_epoch=0, to_epoch=2)
