"""LakeTable — an Iceberg-style snapshot table on Parquet.

No Iceberg/Delta jars exist in this sandbox (SURVEY.md §7.1), so the engine
codes against this thin table abstraction. The ``ManifestParquetBackend``
below is functionally equivalent for every correctness property the north
rule tests:

- **Snapshot isolation + atomic commit**: a snapshot JSON lists every data
  file; ``manifest.json`` is a one-line pointer to the current snapshot.
  Publication is an atomic compare-and-swap of that pointer, delegated to a
  pluggable :class:`~csv_cruncher_spark.lake.catalog.SnapshotCatalog` — the
  default :class:`LocalFsCatalog` uses ``os.replace``+``flock`` (POSIX
  ONLY; it refuses object-store URIs), while an object-store deployment
  supplies a conditional-write catalog (the CAS contract is the only thing
  a backend must provide — proven by running the exactly-once suite
  against :class:`ConditionalPutCatalog`). Readers either see the old
  snapshot or the new one, never a mix.
- **Epoch fencing / exactly-once**: each snapshot records ``epoch_id`` and
  ``batch_id``; committing an epoch ≤ the current one for an already-applied
  batch is a no-op (idempotent re-commit after crash/retry).
- **Bucket layout**: data is hash-bucketed by key (``pmod(xxhash64(url),
  n_buckets)``). A keyed MERGE only rewrites the buckets that contain
  changed keys — copy-on-write at bucket granularity, which is what keeps a
  10^10-row table mergeable: a batch touching 0.1% of keys rewrites ~all
  buckets at small n_buckets but at production n_buckets (e.g. 4096) only
  the affected slices. The bucket of a row is derivable from its key, so
  merge joins co-partition by construction.
- **Schema evolution by field id** (Iceberg-style): columns are tracked as
  ``{id, name, type}``; renames change only the name for an id, additive
  columns append a new id. Old data files keep their physical column names;
  the reader maps physical → current names per file's schema_version, so a
  rename never rewrites data (SURVEY.md §7.5 trap 4).

Reference parity: csv-cruncher's output-table overwrite/backup discipline
(util/HsqlDbTableCreator.kt:91-179) and schema-epoch handling
(util/FilesUtils.kt:288-327) are what this generalizes.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .catalog import MANIFEST, LocalFsCatalog, SnapshotCatalog, _atomic_write_json  # noqa: F401  (re-exported: pipeline checkpoints use _atomic_write_json)


class ConcurrentCommitError(RuntimeError):
    """Another writer advanced the manifest between staging and publish.
    Re-stage against the new tip and retry (optimistic concurrency)."""

_TYPE_MAP: dict[str, T.DataType] = {
    "string": T.StringType(),
    "binary": T.BinaryType(),
    "timestamp": T.TimestampType(),
    "long": T.LongType(),
    "int": T.IntegerType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "date": T.DateType(),
}


def spark_type(name: str) -> T.DataType:
    if name.startswith("decimal"):
        p, s = name[name.index("(") + 1 : -1].split(",")
        return T.DecimalType(int(p), int(s))
    return _TYPE_MAP[name]


def bucket_expr(key_col: str, n_buckets: int):
    """Deterministic bucket of a key — same function everywhere so merge
    joins and file layout agree without a shuffle-side lookup."""
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")


def _snapshot_name(snapshot_id: int) -> str:
    """Unique name per commit ATTEMPT (uuid suffix): two racers staging
    snapshot N+1 must not overwrite each other's staged object before the
    pointer CAS picks the winner — with a deterministic name the loser's
    stage could clobber the winner's content AFTER the winner's swap (a
    lost update the old in-lock write never had). The loser's object stays
    unreferenced (swept by remove_orphans). Names sort by id for human
    listing; the history chain follows ``parent_name``, never directory
    order."""
    return f"snap-{snapshot_id:08d}-{uuid.uuid4().hex[:8]}.json"


def _parquet_num_rows(path: str) -> int | None:
    """Row count from the parquet footer (driver-side, metadata-only read)
    — recorded per data file so the read path can size its broadcast
    resolution precisely instead of guessing from byte sizes."""
    try:
        import pyarrow.parquet as pq

        return pq.ParquetFile(path).metadata.num_rows
    except Exception:
        return None


class LakeTable:
    """Manifest-Parquet lake table. See module docstring."""

    # Broadcast-resolution guards for the merge-on-read read path: when
    # the stacked delta pile is small enough (the steady state the
    # compaction triggers maintain), `read` broadcasts (a) the distinct
    # delta key set — clean base rows bypass resolution via an anti-join
    # — and (b) the folded winner (key, epoch) set — payload rows are
    # fetched with a broadcast semi-join, so html/text bytes NEVER enter
    # a shuffle. Both broadcasts scale with the number of dirty KEYS, so
    # the row guard is primary; the byte guard covers snapshots written
    # before per-file row counts were recorded. Past the guards the same
    # narrow fold runs without broadcasts (payloads shuffle once in the
    # semi-join — still cheaper than the round-1 full-row fold, which
    # also buffered every version of a key in one aggregation buffer).
    RESOLVE_SPLIT_DELTA_ROWS = 4_000_000
    RESOLVE_SPLIT_DELTA_BYTES = 256 * 1024 * 1024

    # Payload-adaptive resolution (measured, experiments/read_split_study.py):
    # for NARROW rows the single-pass wide fold wins — extra narrow scans
    # and join stages cost more than shuffling the (tiny) payloads — while
    # for WIDE rows (web pages are ~100 KB) the narrow two-phase plan wins
    # because payload bytes never shuffle and never sit in a per-key
    # aggregation buffer (a hot key's versions × 100 KB in one collect_list
    # is an OOM, not just a slowdown). The dispatch reads avg bytes/row
    # from the manifest (bytes and rows are recorded per data file).
    # "auto" dispatches on NARROW_RESOLVE_MIN_ROW_BYTES; tests force a
    # mode to assert both paths produce identical state.
    RESOLVE_MODE = "auto"  # "auto" | "narrow" | "widefold"
    NARROW_RESOLVE_MIN_ROW_BYTES = 1024

    # changes_between: when the touched-key set is at or under this, the
    # keys are collected driver-side and the endpoint reads take the
    # LIST path — bucket pruning plus a parquet In/range pushdown that
    # skips row groups (files are key-sorted), so scan I/O shrinks with
    # the key set. MEASURED (experiments, 2026-08-17): the list path is
    # ~50× faster in principle per-row-group skipped, but an isin with
    # tens of thousands of literals explodes Catalyst analysis — 128 s
    # per feed at 40k keys vs 2.6 s on the semi-join path — so the limit
    # stays point-lookup-sized. Past it, the DataFrame path keeps keys
    # distributed (broadcast semi-join filters rows in place in the scan
    # tasks; scans still open every table file, shuffle stays O(changed
    # keys)).
    FEED_COLLECT_KEYS_LIMIT = 1_000

    def __init__(self, path: str, catalog: SnapshotCatalog | None = None):
        self.path = path
        self.catalog = catalog if catalog is not None else LocalFsCatalog(path)

    # ---------- creation / loading ----------

    @classmethod
    def create(
        cls,
        path: str,
        fields: list[tuple[str, str]],
        key_col: str = "url",
        n_buckets: int = 16,
        version_col: str = "warc_ts",
        catalog: SnapshotCatalog | None = None,
    ) -> "LakeTable":
        """fields: [(name, type_str)] — initial schema version 1.
        ``version_col`` is the LWW version column used by merge-on-read
        resolution (the CDC engine's ``warc_ts``)."""
        os.makedirs(os.path.join(path, "data"), exist_ok=True)
        schema = [
            {"id": i + 1, "name": n, "type": t} for i, (n, t) in enumerate(fields)
        ]
        snap = {
            "snapshot_id": 0,
            "parent": None,
            "parent_name": None,
            "epoch_id": -1,
            "batch_id": None,
            "key_col": key_col,
            "version_col": version_col,
            "n_buckets": n_buckets,
            "schema_version": 1,
            "schemas": {"1": schema},
            "next_field_id": len(fields) + 1,
            "files": [],
            "lineage": [],
            "metrics": {"rows": 0, "bytes": 0},
        }
        t = cls(path, catalog)
        name = _snapshot_name(0)
        t.catalog.stage_snapshot(name, snap)
        t.catalog.set_pointer(name)
        return t

    @classmethod
    def load(cls, path: str, catalog: SnapshotCatalog | None = None) -> "LakeTable":
        t = cls(path, catalog)
        t.snapshot()  # raises if missing
        return t

    def snapshot(self) -> dict:
        ptr = self.catalog.load_pointer()
        if ptr is None:
            raise FileNotFoundError(f"no table manifest at {self.path}")
        return self.catalog.load_snapshot(ptr)

    def read_keys(
        self, spark: SparkSession, keys: list[str], snap: dict | None = None
    ) -> DataFrame:
        """Point lookup: current rows for specific keys. The bucket of a
        key is derivable driver-side (same xxhash the writer used), so
        the scan touches only the buckets the keys hash into — at 4096
        buckets a 10-url lookup reads ≤10/4096 of the table, deltas
        included, before the usual read-time resolution."""
        snap = snap or self.snapshot()
        # the key predicate is applied BEFORE resolution (pushed into the
        # parquet scans as an In filter), so the fold replays only the
        # looked-up keys' events — not every key in the touched buckets
        return self.read(
            spark,
            snap=snap,
            buckets=self._buckets_for_keys(spark, snap, keys),
            keys=keys,
        )

    def _buckets_for_keys(self, spark: SparkSession, snap: dict, keys: list) -> list[int]:
        """Bucket ids a key list hashes into, derived driver-side with the
        same JVM xxhash the writer used — prunes the scan to those
        buckets' files."""
        kdf = spark.createDataFrame([(k,) for k in keys], f"{snap['key_col']}: string")
        return sorted(
            r["b"]
            for r in kdf.select(bucket_expr(snap["key_col"], snap["n_buckets"]).alias("b"))
            .distinct()
            .collect()
        )

    def changes_between(
        self,
        spark: SparkSession,
        from_epoch: int,
        to_epoch: int | None = None,
        allow_snapshot_diff: bool = False,
        with_before: bool = False,
    ) -> DataFrame:
        """Incremental change feed (the Iceberg incremental-scan / Delta
        CDF shape): the NET per-key change committed in epochs
        ``(from_epoch, to_epoch]``. Emits one row per key whose resolved
        state differs between the two epochs, with ``__op``:

        - ``I`` — key absent at from_epoch, present at to_epoch
        - ``U`` — present at both with different content
        - ``D`` — present at from_epoch, absent at to_epoch (data columns
          other than the key are null)

        Keys touched in the range but net-unchanged (stale events that
        lost LWW, delete+re-insert of identical content, within-range
        insert+delete) are NOT emitted. ``from_epoch=-1`` means "before
        any commit" — the feed is then the full state as inserts.

        ``with_before=True`` adds a ``__before`` struct column carrying
        the key's resolved content at ``from_epoch`` (Delta CDF's
        ``update_preimage``, folded into the same row): null for ``I``,
        the old row for ``U``/``D``. The pre-image read already happens
        to classify ops, so this costs nothing extra — it lets a
        downstream consumer retract old contributions (incremental
        aggregate maintenance, secondary-index upkeep) without a second
        time-travel read.

        Scale shape: the touched-key set is derived from ONLY the range's
        delta files (batch-sized, found across retained snapshots even
        after compaction rewrote the current file list), and both
        endpoint reads are keyed reads. At or under
        ``FEED_COLLECT_KEYS_LIMIT`` touched keys, the keys are collected
        and the reads prune buckets driver-side and push a parquet
        In/range filter into the scans (files are key-sorted, so row
        groups skip) — scan I/O shrinks with the key set. Above it, a
        broadcast semi-join filters rows in place in the scan tasks —
        shuffle stays O(changed keys), scans still open every table
        file. Raises if the range's delta files or the from-snapshot
        have been expired (``expire_snapshots`` bounds the feed's
        retention window, exactly like Iceberg's).

        ``allow_snapshot_diff=True`` opts into the O(2 full reads)
        fallback when the range is not delta-codeable (copy-on-write
        epochs, expired committing snapshots): both endpoint states are
        resolved in full and diffed. Same output, table-scan cost — an
        explicit opt-in so a cheap incremental read can't silently turn
        into two table scans.
        """
        snap_now = self.snapshot()
        if to_epoch is None:
            to_epoch = snap_now["epoch_id"]
        if not (-1 <= from_epoch <= to_epoch <= snap_now["epoch_id"]):
            raise ValueError(
                f"invalid epoch range ({from_epoch}, {to_epoch}] for a table "
                f"at epoch {snap_now['epoch_id']}"
            )
        key = snap_now["key_col"]
        snap_to = (
            snap_now if to_epoch == snap_now["epoch_id"] else self.snapshot_at(to_epoch)
        )
        data_cols = [f["name"] for f in self.current_fields(snap_to)]
        before_type = T.StructType(self.spark_schema(snap_to).fields)
        change_schema = T.StructType(
            [T.StructField("__op", T.StringType())]
            + self.spark_schema(snap_to).fields
            + ([T.StructField("__before", before_type)] if with_before else [])
        )
        if from_epoch == to_epoch:
            return spark.createDataFrame([], change_schema)
        if from_epoch == -1:
            # bootstrap: no pre-state exists, so the feed is exactly the
            # resolved state as inserts — no delta discovery needed (and
            # none required: this works even after full expiry)
            cur = self.read(spark, snap=snap_to)
            out = cur.select(F.lit("I").alias("__op"), *data_cols)
            if with_before:
                out = out.withColumn("__before", F.lit(None).cast(before_type))
            return out

        # Locate each needed epoch's COMMITTING snapshot (the lineage entry
        # written at its batch commit): that snapshot lists the epoch's
        # COMPLETE delta file set, so a partially-compacted-then-expired
        # epoch cannot silently lose a bucket's file — if the committing
        # snapshot is retained, every file it references is retained too
        # (expire_snapshots keeps referenced files); if it was expired,
        # the feed window is gone and we must refuse.
        need = set(range(from_epoch + 1, to_epoch + 1))
        by_sid = {s["snapshot_id"]: s for s in self.snapshot_history()}
        commit_sid = {e["epoch"]: e["snapshot"] for e in snap_to["lineage"]}
        range_files: list[dict] | None = []
        for e in sorted(need):
            sid = commit_sid.get(e)
            s = by_sid.get(sid) if sid is not None else None
            if s is None:
                if allow_snapshot_diff:
                    range_files = None  # fall back to the full diff
                    break
                raise ValueError(
                    f"change feed for epoch {e} is gone — its committing "
                    f"snapshot was expired (expire_snapshots bounds the "
                    f"feed's retention window; pass allow_snapshot_diff="
                    f"True for the O(2 full reads) fallback)"
                )
            efiles = [
                f
                for f in s["files"]
                if f.get("kind") == "delta" and f.get("epoch") == e
            ]
            if efiles:
                range_files += efiles
                continue
            # committed with no delta files: an empty batch contributes no
            # changes; a copy-on-write apply rewrote base files instead, so
            # its changes are not delta-coded and the feed cannot see them.
            # Strategy None (a snapshot written before the metric existed)
            # is only trustably empty when the snapshot ALSO recorded zero
            # batch files — otherwise it could be a pre-metric COW apply
            # and skipping it would silently drop its changes from the
            # feed (round-2 advice); treat it as not-delta-codeable.
            metrics = s.get("metrics") or {}
            strategy = metrics.get("last_batch_strategy")
            if strategy is None and metrics.get("last_batch_files") == 0:
                strategy = "empty"
            # "metadata-only": a schema-evolve commit (backend.evolve) —
            # no data changed, so it contributes nothing to the feed; the
            # endpoint reads already project across schema versions by
            # field id
            if strategy not in ("mor-delta", "empty", "metadata-only"):
                if allow_snapshot_diff:
                    range_files = None  # fall back to the full diff
                    break
                raise ValueError(
                    f"epoch {e} was applied {strategy} (copy-on-write): its "
                    "changes are not delta-coded, so an incremental feed "
                    "over it is unavailable — pass allow_snapshot_diff=True "
                    "for the O(2 full reads) fallback"
                )
        if range_files is not None and not range_files:
            return spark.createDataFrame([], change_schema)
        touched = None
        buckets_arg = None
        if range_files is not None:
            touched = (
                self._scan(spark, snap_to, range_files).select(key).distinct()
            )
            # one job decides the path: fetch limit+1 rows, keep them if
            # small. On the large-key DataFrame path the touched subtree
            # (range delta scan + distinct) is recomputed per endpoint
            # read; deliberately NOT persist()ed — the returned DataFrame
            # is lazy, so there is no sound place to unpersist, and the
            # recomputed subtree scans only the range's (batch-sized)
            # delta files
            head = touched.limit(self.FEED_COLLECT_KEYS_LIMIT + 1).collect()
            if len(head) <= self.FEED_COLLECT_KEYS_LIMIT:
                # list path: parquet In/range pushdown prunes row groups
                # (files are key-sorted) and the touched buckets are
                # derived driver-side — scan I/O shrinks with the key set
                touched = [r[0] for r in head]
                buckets_arg = self._buckets_for_keys(spark, snap_to, touched)

        post = self.read(
            spark, snap=snap_to, buckets=buckets_arg, keys=touched
        ).select(*data_cols)
        # from_epoch >= 0 here (the -1 bootstrap returned above). The
        # from-snapshot may predate schema evolution in the range: project
        # its read onto the CURRENT schema by field id (renamed columns
        # map across, added columns become nulls)
        snap_from = self.snapshot_at(from_epoch)
        old_by_id = {f["id"]: f["name"] for f in self.current_fields(snap_from)}
        pre = self.read(
            spark, snap=snap_from, buckets=buckets_arg, keys=touched
        ).select(
            *[
                F.col(old_by_id[f["id"]]).alias(f["name"])
                if f["id"] in old_by_id
                else F.lit(None).cast(spark_type(f["type"])).alias(f["name"])
                for f in self.current_fields(snap_to)
            ]
        )
        # content hash over all data columns (null-safe): suppresses
        # touched-but-net-unchanged keys
        pre_f = pre.select(
            F.col(key).alias("__pk"),
            F.xxhash64(F.struct(*[F.col(c) for c in data_cols])).alias("__h_old"),
            *(
                # pre-image piggybacks on the read the op classification
                # already performs; absent pre row (I) → null struct
                [F.struct(*[F.col(c) for c in data_cols]).alias("__before")]
                if with_before
                else []
            ),
        )
        post_f = post.withColumn(
            "__h_new", F.xxhash64(F.struct(*[F.col(c) for c in data_cols]))
        )
        j = post_f.join(pre_f, post_f[key] == pre_f["__pk"], "full_outer")
        op = (
            F.when(F.col("__pk").isNull(), F.lit("I"))
            .when(F.col(key).isNull(), F.lit("D"))
            .when(F.col("__h_new") != F.col("__h_old"), F.lit("U"))
        )
        out = j.withColumn("__op", op).filter(F.col("__op").isNotNull())
        keyed = [
            F.coalesce(F.col(c), F.col("__pk")).alias(c) if c == key else F.col(c)
            for c in data_cols
        ]
        return out.select(
            "__op", *keyed, *(["__before"] if with_before else [])
        )

    def _history_with_names(self) -> list[tuple[str, dict]]:
        """Retained (name, snapshot) ancestry, oldest first, by walking
        ``parent_name`` links from the current pointer. Chain-walk, not
        directory listing: a lost-CAS racer's staged snapshot shares the
        winner's snapshot_id, so listing would make time travel ambiguous;
        the parent chain is unambiguous by construction. Snapshots written
        before parent_name existed (rounds 1-2) fall back to the exact
        legacy name ``snap-<parent_id>.json``. The walk stops at the first
        expired ancestor — retention keeps a contiguous suffix."""
        out: list[tuple[str, dict]] = []
        name = self.catalog.load_pointer()
        seen: set[str] = set()
        while name and name not in seen:
            seen.add(name)
            try:
                s = self.catalog.load_snapshot(name)
            except FileNotFoundError:
                break
            out.append((name, s))
            if s.get("parent_name"):
                name = s["parent_name"]
            elif s.get("parent") is not None and "parent_name" not in s:
                name = f"snap-{s['parent']:08d}.json"  # legacy layout
            else:
                name = None
        out.reverse()
        return out

    def snapshot_history(self) -> list[dict]:
        """All retained snapshots, oldest first."""
        return [s for _, s in self._history_with_names()]

    def snapshot_at(self, epoch_id: int) -> dict:
        """Time travel: the snapshot state as of a committed epoch
        (Iceberg's snapshot-id read, keyed by our epoch counter). Pass the
        result as ``read(snap=...)`` to query the table as it was."""
        candidates = [
            s for s in self.snapshot_history() if s["epoch_id"] <= epoch_id
        ]
        if not candidates:
            raise ValueError(f"No snapshot at or before epoch {epoch_id}")
        return max(candidates, key=lambda s: s["snapshot_id"])

    def expire_snapshots(self, keep_last: int = 1) -> dict:
        """Retention: drop all but the newest ``keep_last`` snapshots and
        DELETE data files no retained snapshot references (compaction and
        COW merges leave replaced files on disk for time travel until
        expired — the Iceberg expire_snapshots/remove_orphans shape).
        Returns {"snapshots_removed": n, "files_removed": n}."""
        named = self._history_with_names()
        history = [s for _, s in named]
        if len(history) <= keep_last:
            return {"snapshots_removed": 0, "files_removed": 0}
        keep = history[-keep_last:]
        drop = history[:-keep_last]
        drop_names = [n for n, _ in named[:-keep_last]]
        current = self.snapshot()
        # hard error, not assert: under `python -O` a stripped assert would
        # let a keep window that excludes the live manifest's snapshot
        # delete files the manifest still references (table corruption)
        if not any(s["snapshot_id"] == current["snapshot_id"] for s in keep):
            raise ValueError(
                "refusing to expire the current snapshot "
                f"(id={current['snapshot_id']}): keep_last={keep_last} "
                "excludes the manifest-referenced snapshot"
            )
        referenced = {f["path"] for s in keep for f in s["files"]}
        removed_files = 0
        for name, s in zip(drop_names, drop):
            for f in s["files"]:
                if f["path"] not in referenced:
                    full = os.path.join(self.path, f["path"])
                    if os.path.exists(full):
                        os.remove(full)
                        removed_files += 1
                    referenced.add(f["path"])  # count each orphan once
            self.catalog.delete_snapshot(name)
        return {"snapshots_removed": len(drop), "files_removed": removed_files}

    def remove_orphans(self, older_than_s: float = 86400) -> dict:
        """Delete files under ``data/`` that NO retained snapshot
        references — the residue of crashed writes and lost-CAS retries,
        which ``expire_snapshots`` cannot see (it only walks dropped
        snapshots' file lists). Age-gated like Iceberg's
        remove_orphan_files: only files with mtime older than
        ``older_than_s`` are eligible, so an in-flight writer's
        not-yet-committed files are never swept. Also sweeps orphan
        SNAPSHOT objects — the uniquely named staged metadata of a
        lost-CAS or crashed commit, which the history chain never
        references. Returns ``{"files_removed": n}``."""
        named = self._history_with_names()
        chain_names = {n for n, _ in named}
        referenced = {f["path"] for _, s in named for f in s["files"]}
        # orphan snapshot metadata: staged-but-never-published attempts.
        # The age gate keeps an in-flight commit's staged object safe for
        # the stage→swap window (microseconds; the gate is hours). The age
        # comes from the CATALOG contract (round-3 advice): stat'ing local
        # paths here would mean any non-filesystem catalog swept a
        # concurrent committer's staged snapshot immediately — and if that
        # committer then won the CAS, the live pointer would reference a
        # deleted snapshot. Unknown age (None) is treated as too-young.
        for name in self.catalog.list_snapshot_names():
            if name in chain_names:
                continue
            age = self.catalog.snapshot_age_s(name)
            if age is None or age < older_than_s:
                continue
            self.catalog.delete_snapshot(name)
        data_root = os.path.join(self.path, "data")
        removed = 0
        now = time.time()
        for dirpath, _dirs, files in os.walk(data_root):
            for fn in files:
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, self.path)
                if rel in referenced:
                    continue
                try:
                    if now - os.path.getmtime(full) < older_than_s:
                        continue
                    os.remove(full)
                    removed += 1
                except FileNotFoundError:
                    pass  # concurrent sweep/expire — already gone
        # drop directories the sweep emptied
        for dirpath, dirs, files in os.walk(data_root, topdown=False):
            if dirpath != data_root and not dirs and not files:
                try:
                    os.rmdir(dirpath)
                except OSError:
                    pass
        return {"files_removed": removed}

    # ---------- schema ----------

    def current_fields(self, snap: dict | None = None) -> list[dict]:
        snap = snap or self.snapshot()
        return snap["schemas"][str(snap["schema_version"])]

    def spark_schema(self, snap: dict | None = None) -> T.StructType:
        return T.StructType(
            [T.StructField(f["name"], spark_type(f["type"]), True) for f in self.current_fields(snap)]
        )

    def evolve_schema(
        self,
        add_columns: list[tuple[str, str]] | None = None,
        renames: dict[str, str] | None = None,
    ) -> dict:
        """Apply additive + rename evolution; returns the staged (uncommitted)
        snapshot dict — the next ``commit`` publishes it. Renames rewrite only
        metadata (field id keeps its identity); adds append a fresh field id.
        """
        snap = self.snapshot()
        fields = [dict(f) for f in self.current_fields(snap)]
        changed = False
        if renames:
            # the key and version columns are engine identity: the merge
            # acceptance rule, bucketing, and the batch wire format are
            # keyed on them, so renaming silently bricks every later
            # read/merge — refuse loudly instead. Rename-to-existing
            # would create duplicate field names (ambiguous columns).
            reserved = {snap["key_col"], snap.get("version_col", "warc_ts")}
            by_name = {f["name"]: f for f in fields}
            for old, new in renames.items():
                if old not in by_name:
                    continue
                if old in reserved:
                    raise ValueError(
                        f"cannot rename engine identity column {old!r} "
                        f"(key_col/version_col) — merge semantics and the "
                        "change-batch wire format are keyed on it"
                    )
                if new in by_name and new != old:
                    raise ValueError(
                        f"cannot rename {old!r} to {new!r}: a column with "
                        "that name already exists"
                    )
                by_name[old]["name"] = new
                changed = True
        if add_columns:
            existing = {f["name"] for f in fields}
            for name, typ in add_columns:
                if name not in existing:
                    fields.append({"id": snap["next_field_id"], "name": name, "type": typ})
                    snap["next_field_id"] += 1
                    changed = True
        if changed:
            snap["schema_version"] += 1
            snap["schemas"][str(snap["schema_version"])] = fields
        return snap

    # ---------- read ----------

    def _scan(
        self,
        spark: SparkSession,
        snap: dict,
        files: list[dict],
        extra_cols: list[str] = (),
    ) -> DataFrame | None:
        """Scan a file list projected to the current schema (field-id
        mapping per schema version; at most #schema-versions scans).
        ``extra_cols`` are physical columns passed through verbatim
        (the delta files' __op/__epoch)."""
        if not files:
            return None
        cur_fields = self.current_fields(snap)
        by_ver: dict[int, list[str]] = {}
        for f in files:
            by_ver.setdefault(f["schema_version"], []).append(
                os.path.join(self.path, f["path"])
            )
        parts: list[DataFrame] = []
        for ver, paths in by_ver.items():
            ver_fields = snap["schemas"][str(ver)]
            phys_by_id = {f["id"]: f["name"] for f in ver_fields}
            df = spark.read.parquet(*paths)
            cols = []
            for f in cur_fields:
                phys = phys_by_id.get(f["id"])
                if phys is not None and phys in df.columns:
                    cols.append(F.col(phys).alias(f["name"]))
                else:
                    cols.append(F.lit(None).cast(spark_type(f["type"])).alias(f["name"]))
            cols += [F.col(c) for c in extra_cols]
            parts.append(df.select(*cols))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def read(
        self,
        spark: SparkSession,
        snap: dict | None = None,
        buckets: list[int] | None = None,
        resolve: bool = True,
        keys: list | None = None,
    ) -> DataFrame:
        """Current-snapshot scan projected to the current schema.

        With merge-on-read deltas present (``resolve=True``), the view is
        reconstructed by replaying each key's delta events over its base
        row IN EPOCH ORDER with the same acceptance rule the eager merge
        uses (stale events lose; a delete resets the version floor, so a
        later re-insert with an OLDER version still lands — plain
        max-by-version would get this wrong).

        Resolution is PAYLOAD-ADAPTIVE (``RESOLVE_MODE`` class attr): for
        narrow rows a single-pass wide fold wins (``_resolve_widefold``);
        for wide rows — the web-page target workload — the replay is a
        NARROW two-phase plan where payload bytes (html/text) never enter
        a shuffle:

        1. **Narrow fold**: only ``(key, version, __op, __epoch)`` is
           folded per key (a JVM ``aggregate`` over a sorted event array
           — one hash shuffle of ~40-byte rows; parquet column pruning
           means the fold scan never reads the payload columns). The
           apply path writes exactly one winner per (key, epoch)
           (``apply_batch_mor``), so the fold's output ``(key, epoch)``
           uniquely identifies the surviving physical row.
        2. **Payload fetch** (within the guards): the base is scanned
           full-width exactly ONCE and filtered in place by a broadcast
           anti-join on the *kill set* — dirty keys whose fold winner is
           not the base row — while delta payload rows pass a broadcast
           semi-join on the winner ``(key, __epoch)`` set. Past the
           guards, one shuffled semi-join of the payload union against
           the winner set (still narrow-keyed; the round-1 design
           buffered every full-width version of a key in one
           ``collect_list`` aggregation buffer).

        Steady-state scale shape (compaction triggers keep delta piles
        small): clean base rows — the overwhelming majority at 100 TB —
        pass the broadcast anti-join untouched in their scan tasks; dirty
        keys pay one narrow shuffle plus the same in-place filters.
        Nothing O(table) shuffles, and the table's payload bytes are read
        once.
        """
        snap = snap or self.snapshot()
        files = snap["files"]
        if buckets is not None:
            bset = set(buckets)
            files = [f for f in files if f["bucket"] in bset]
        base_files = [f for f in files if f.get("kind", "base") == "base"]
        delta_files = [f for f in files if f.get("kind") == "delta"]
        base = self._scan(spark, snap, base_files)

        # keyed-read pushdown: resolution is per-key independent, so
        # filtering every scan to the key set yields identical per-key
        # results while the fold replays only the looked-up keys. A list
        # becomes a parquet In filter (row-group min/max pruning); a
        # DataFrame (one column named like the key — batch-sized sets,
        # e.g. a change feed's touched keys) becomes a broadcast semi-join
        # applied in place in the scan tasks. Lists past the collect limit
        # are silently promoted to the DataFrame path — a many-thousand
        # literal isin costs minutes of Catalyst ANALYSIS (measured:
        # 128 s at 40k literals), not execution.
        if (
            keys is not None
            and not isinstance(keys, DataFrame)
            and len(keys) > self.FEED_COLLECT_KEYS_LIMIT
        ):
            keys = spark.createDataFrame(
                [(k,) for k in keys], f"{snap['key_col']}: string"
            )

        def _keyed(df):
            if df is None or keys is None:
                return df
            if isinstance(keys, DataFrame):
                kdf = keys.select(F.col(keys.columns[0]).alias(snap["key_col"]))
                return df.join(F.broadcast(kdf.distinct()), snap["key_col"], "left_semi")
            return df.filter(F.col(snap["key_col"]).isin(keys))

        base = _keyed(base)
        if not resolve:  # base-only view (diagnostics/compaction internals)
            delta_files = []
        if not delta_files:
            if base is None:
                return spark.createDataFrame([], self.spark_schema(snap))
            return base

        cur_fields = self.current_fields(snap)
        data_cols = [f["name"] for f in cur_fields]
        deltas = _keyed(
            self._scan(spark, snap, delta_files, extra_cols=["__op", "__epoch"])
        )
        key = snap["key_col"]
        vcol = snap.get("version_col", "warc_ts")
        vtype = next(
            (f["type"] for f in cur_fields if f["name"] == vcol), "timestamp"
        )

        # guards: broadcast resolution only while the dirty-key set is
        # modest (rows recorded per delta file; byte heuristic for
        # snapshots that predate row counts)
        delta_rows = [f.get("rows") for f in delta_files]
        if all(r is not None for r in delta_rows):
            small = sum(delta_rows) <= self.RESOLVE_SPLIT_DELTA_ROWS
        else:
            delta_bytes = sum(int(f.get("bytes", 0)) for f in delta_files)
            small = delta_bytes <= self.RESOLVE_SPLIT_DELTA_BYTES
        maybe_bcast = F.broadcast if small else (lambda df: df)

        # payload-adaptive dispatch (see class-attr comment): narrow rows →
        # single-pass wide fold; wide rows (or unknown row counts) → the
        # narrow two-phase plan, which never shuffles or buffers payloads
        mode = self.RESOLVE_MODE
        if mode == "auto":
            sized = [
                (int(f.get("bytes", 0)), f["rows"])
                for f in base_files + delta_files
                if f.get("rows")
            ]
            tot_b = sum(b for b, _ in sized)
            tot_r = sum(r for _, r in sized)
            mode = (
                "widefold"
                if tot_r and tot_b / tot_r < self.NARROW_RESOLVE_MIN_ROW_BYTES
                else "narrow"
            )
        if mode == "widefold":
            return self._resolve_widefold(
                base, deltas, small, data_cols, key, vcol, cur_fields
            )

        # -- phase 0: dirty-key split — untouched base rows skip resolution
        dirty_keys = None
        base_narrow = None
        if base is not None:
            base_narrow = base.select(key, vcol)
            if small:
                # lazy localCheckpoint: dirty_keys feeds TWO consumers (the
                # base semi-join here and kill_keys below) — without a
                # materialization boundary each consumer re-scans the
                # deltas. Lazy keeps read() lazy; the backing blocks are
                # broadcast-guard-sized and freed by the ContextCleaner
                # when the frame is unreferenced (no persist leak).
                dirty_keys = deltas.select(key).distinct().localCheckpoint(eager=False)
                base_narrow = base_narrow.join(
                    F.broadcast(dirty_keys), key, "left_semi"
                )

        # -- phase 1: narrow fold → winner (key, epoch) per surviving key
        ev_narrow = deltas.select(
            key, F.col(vcol).alias("__v"), "__op", "__epoch"
        )
        if base_narrow is not None:
            ev_narrow = base_narrow.select(
                key,
                F.col(vcol).alias("__v"),
                F.lit("I").alias("__op"),
                F.lit(-1).cast("long").alias("__epoch"),
            ).unionByName(ev_narrow)
        acc_ddl = f"STRUCT<v: {spark_type(vtype).simpleString()}, e: BIGINT>"
        ev_struct = F.struct(F.col("__epoch"), F.col("__op"), F.col("__v"))
        grouped = ev_narrow.groupBy(key).agg(
            F.sort_array(F.collect_list(ev_struct)).alias("__evs")
        )
        # eager-merge acceptance rule, replayed per key in epoch order:
        # applies ⟺ no current row ∨ current version null ∨ e.version ≥ current
        fold = (
            f"aggregate(__evs, CAST(NULL AS {acc_ddl}), (acc, e) -> "
            f"CASE WHEN acc IS NULL OR acc.v IS NULL "
            f"          OR (e.__v IS NOT NULL AND e.__v >= acc.v) "
            f"     THEN (CASE WHEN e.__op = 'D' THEN CAST(NULL AS {acc_ddl}) "
            f"           ELSE named_struct('v', e.__v, 'e', e.__epoch) END) "
            f"     ELSE acc END)"
        )
        winners = (
            grouped.select(F.col(key), F.expr(fold).alias("__w"))
            .filter(F.col("__w").isNotNull())
            .select(key, F.col("__w.e").alias("__epoch"))
        )
        if small:
            # the winner set feeds two broadcast branches (base_won /
            # delta_winners) whose differing filters defeat Spark's
            # ReuseExchange — measured: the narrow fold's collect_list
            # aggregation appeared TWICE in the executed plan, doubling
            # the fold and every delta scan under it. One lazy local
            # checkpoint (dirty-key-bounded by the same broadcast guard)
            # makes both branches read the fold's result instead
            # (round-2 watchlist item, now verified and closed).
            winners = winners.localCheckpoint(eager=False)

        # -- phase 2: payload fetch — winner rows filtered in place
        delta_payload = deltas.filter(F.col("__op") != F.lit("D")).select(
            *data_cols, "__epoch"
        )
        if dirty_keys is not None:
            # Single full-width base scan: a base row dies iff its key is
            # dirty AND the fold winner is not the base row itself
            # (__epoch != -1). kill_keys ⊆ dirty keys, so one broadcast
            # anti-join filters the base in place — clean rows and
            # dirty-but-base-won rows both pass, and the base payload
            # bytes are read exactly ONCE (the earlier two-branch plan
            # scanned the base full-width twice: clean anti-join + payload
            # semi-join).
            base_won = winners.filter(F.col("__epoch") == -1).select(key)
            kill_keys = dirty_keys.join(base_won, key, "left_anti")
            out = base.join(F.broadcast(kill_keys), key, "left_anti").select(
                *data_cols
            )
            delta_winners = winners.filter(F.col("__epoch") != -1)
            out = out.unionByName(
                delta_payload.join(
                    F.broadcast(delta_winners), [key, "__epoch"], "left_semi"
                ).select(*data_cols)
            )
            return out
        # fallback (huge delta pile or no base): one shuffled semi-join of
        # the payload union against the winner set
        payload = delta_payload
        if base is not None:
            payload = base.select(
                *data_cols, F.lit(-1).cast("long").alias("__epoch")
            ).unionByName(payload)
        return payload.join(
            maybe_bcast(winners), [key, "__epoch"], "left_semi"
        ).select(*data_cols)

    def _resolve_widefold(
        self, base, deltas, small, data_cols, key, vcol, cur_fields
    ) -> DataFrame:
        """Single-pass resolution for NARROW rows: full rows ride through
        the per-key sort+fold (one shuffle, one pass over the data files).
        Measured faster than the two-phase plan when payloads are small —
        the extra narrow scans and join stages cost more than shuffling
        tiny payloads (experiments/read_split_study.py). The dirty-key
        split still applies: clean base rows bypass via broadcast
        anti-join. Never chosen for wide rows (web-page payloads), where
        the per-key collect_list buffer is an OOM risk."""
        base_clean = None
        if base is not None and small:
            dirty_keys = deltas.select(key).distinct()
            base_clean = base.join(F.broadcast(dirty_keys), key, "left_anti")
            base = base.join(F.broadcast(dirty_keys), key, "left_semi")
        ev_cols = [*data_cols, "__op", "__epoch"]
        if base is not None:
            events = base.select(
                *data_cols,
                F.lit("I").alias("__op"),
                F.lit(-1).cast("long").alias("__epoch"),
            ).unionByName(deltas.select(*ev_cols))
        else:
            events = deltas.select(*ev_cols)
        row_ddl = T.StructType(
            [T.StructField(f["name"], spark_type(f["type"])) for f in cur_fields]
        ).simpleString()
        ev_struct = F.struct(
            F.col("__epoch"),
            F.col("__op"),
            F.struct(*[F.col(c) for c in data_cols]).alias("r"),
        )
        grouped = events.groupBy(key).agg(
            F.sort_array(F.collect_list(ev_struct)).alias("__evs")
        )
        # same acceptance rule as the narrow fold, over full rows
        fold = (
            f"aggregate(__evs, CAST(NULL AS {row_ddl}), (acc, e) -> "
            f"CASE WHEN acc IS NULL OR acc.{vcol} IS NULL "
            f"          OR (e.r.{vcol} IS NOT NULL AND e.r.{vcol} >= acc.{vcol}) "
            f"     THEN (CASE WHEN e.__op = 'D' THEN CAST(NULL AS {row_ddl}) ELSE e.r END) "
            f"     ELSE acc END)"
        )
        resolved = grouped.select(F.expr(fold).alias("__row")).filter(
            F.col("__row").isNotNull()
        )
        out = resolved.select(*[F.col(f"__row.{c}").alias(c) for c in data_cols])
        if base_clean is not None:
            out = base_clean.select(*data_cols).unionByName(out)
        return out

    # ---------- write / commit ----------

    def write_bucket_data(
        self,
        df: DataFrame,
        schema_version: int,
        kind: str = "base",
        epoch: int | None = None,
        cluster_expr=None,
    ) -> list[dict]:
        """Write a DataFrame that carries a ``bucket`` column to new parquet
        files partitioned by bucket; returns file entries (uncommitted).
        One shuffle: repartition by bucket so each bucket lands in few files.
        ``kind='delta'`` entries also record their epoch (merge-on-read).

        Rows are sorted by key WITHIN each partition (local sort after the
        bucket shuffle — spill-safe, no extra exchange) so parquet
        row-group min/max statistics are tight on the key: keyed reads'
        pushed ``In`` filters then skip whole row groups instead of
        scanning the full bucket, and the read-time fold's per-key groups
        arrive clustered.

        ``cluster_expr``: optional Column replacing the key as the
        within-partition sort (e.g. ``zorder.z_value([...])``) — same
        cost, different locality: row-group stats become tight on the
        clustered dimensions instead of the key. Keyed point reads then
        lose their row-group skipping in those files, so cluster only
        tables/slices read mainly by analytical box predicates."""
        rel_dir = os.path.join("data", f"w-{uuid.uuid4().hex[:12]}")
        out_dir = os.path.join(self.path, rel_dir)
        snap = self.snapshot()
        n_buckets = snap["n_buckets"]
        key_col = snap.get("key_col", "url")
        part = df.repartition(
            min(n_buckets, max(1, df.sparkSession.sparkContext.defaultParallelism)),
            "bucket",
        )
        if cluster_expr is not None:
            part = part.withColumn("__cluster", cluster_expr).sortWithinPartitions(
                "bucket", "__cluster"
            ).drop("__cluster")
        elif key_col in df.columns:
            part = part.sortWithinPartitions("bucket", key_col)
        part.write.partitionBy("bucket").parquet(out_dir)
        entries: list[dict] = []
        for bucket_dir in sorted(os.listdir(out_dir)):
            if not bucket_dir.startswith("bucket="):
                continue
            raw_bucket = bucket_dir.split("=")[1]
            if not raw_bucket.lstrip("-").isdigit():
                # bucket=__HIVE_DEFAULT_PARTITION__ = null bucket = null key;
                # ingest filters keyless events, so this is a caller bug —
                # fail with the cause, not a bare int() ValueError
                raise ValueError(
                    f"data write produced a null-bucket partition ({bucket_dir}): "
                    "rows with a null bucket/key must be filtered before "
                    "write_bucket_data"
                )
            b = int(raw_bucket)
            for fn in sorted(os.listdir(os.path.join(out_dir, bucket_dir))):
                if fn.endswith(".parquet"):
                    full = os.path.join(out_dir, bucket_dir, fn)
                    entry = {
                        "path": os.path.join(rel_dir, bucket_dir, fn),
                        "bucket": b,
                        "schema_version": schema_version,
                        "bytes": os.path.getsize(full),
                        "rows": _parquet_num_rows(full),
                        "kind": kind,
                    }
                    if epoch is not None:
                        entry["epoch"] = epoch
                    entries.append(entry)
        return entries

    def delta_epoch_depth(self, snap: dict | None = None) -> int:
        """Max number of delta epochs stacked on any bucket — the
        compaction trigger signal (read-time fold cost grows with it)."""
        snap = snap or self.snapshot()
        per_bucket: dict[int, set] = {}
        for f in snap["files"]:
            if f.get("kind") == "delta":
                per_bucket.setdefault(f["bucket"], set()).add(f.get("epoch"))
        return max((len(v) for v in per_bucket.values()), default=0)

    def delta_bytes_per_bucket(self, snap: dict | None = None) -> dict[int, int]:
        """Stacked delta BYTES per bucket — the second compaction trigger.
        Epoch depth alone misses the hot-key pathology: a url updated
        every epoch keeps all its versions (html+text payloads) in the
        bucket's deltas, and the read-time fold holds them in one
        aggregation buffer. A bytes cap bounds that independent of epoch
        count (round-1 verdict scale note)."""
        snap = snap or self.snapshot()
        out: dict[int, int] = {}
        for f in snap["files"]:
            if f.get("kind") == "delta":
                out[f["bucket"]] = out.get(f["bucket"], 0) + int(f.get("bytes", 0))
        return out

    def compact(
        self,
        spark: SparkSession,
        buckets: list[int] | None = None,
        zorder_by: list[str] | None = None,
        zorder_bits: int = 16,
    ) -> dict:
        """Fold deltas into fresh base files (merge-on-read →
        copy-on-write amortization). Bucket-pruned: only buckets that
        actually carry deltas are resolved and rewritten — at production
        scale compaction cost is proportional to the touched slices, not
        the table. The resolved view is computed with the same read-time
        replay the readers use, written bucket-partitioned, and committed
        atomically replacing exactly those buckets — a crash
        mid-compaction leaves the old snapshot intact.

        ``zorder_by``: cluster the rewritten files on the Morton
        interleave of these (integer-normalized) columns instead of the
        key (``OPTIMIZE ZORDER BY``): analytical box scans on those
        dimensions then skip row groups via parquet min/max stats. The
        view is unchanged — only file layout moves; keyed point reads
        lose their key clustering in the rewritten buckets (documented
        trade in :meth:`write_bucket_data`).
        """
        snap = self.snapshot()
        delta_buckets = sorted(
            {f["bucket"] for f in snap["files"] if f.get("kind") == "delta"}
        )
        if buckets is not None:
            delta_buckets = sorted(set(delta_buckets) & set(buckets))
        if not delta_buckets:
            return snap
        resolved = self.read(spark, snap=snap, buckets=delta_buckets).withColumn(
            "bucket", bucket_expr(snap["key_col"], snap["n_buckets"])
        )
        cluster = None
        if zorder_by:
            from .zorder import z_value

            cluster = z_value(zorder_by, bits=zorder_bits)
        new_files = self.write_bucket_data(
            resolved, snap["schema_version"], kind="base", cluster_expr=cluster
        )
        metrics = dict(snap.get("metrics", {}))
        metrics["last_compaction_snapshot"] = snap["snapshot_id"]
        metrics["last_compaction_buckets"] = len(delta_buckets)
        return self.commit(
            new_files,
            delta_buckets,
            epoch_id=snap["epoch_id"],
            batch_id=None,
            staged_snapshot=snap,
            metrics=metrics,
        )

    def commit(
        self,
        new_files: list[dict],
        replaced_buckets: list[int],
        epoch_id: int,
        batch_id: str | None,
        staged_snapshot: dict | None = None,
        metrics: dict | None = None,
        lineage_kind: str = "data",
    ) -> dict:
        """Publish a new snapshot: keep files of untouched buckets, swap in
        ``new_files`` for ``replaced_buckets``. Idempotent: if ``batch_id``
        is already in lineage, the commit is a no-op (epoch fence).

        Concurrency: publication is the catalog's atomic pointer
        compare-and-swap (Iceberg's catalog model — see lake/catalog.py).
        The new snapshot is STAGED under a uniquely named object, then the
        pointer is CAS'd from the name this commit staged against. A lost
        CAS means another writer advanced the tip: if that racer committed
        the SAME batch the commit degrades to the fenced no-op (exactly-
        once survives the race), otherwise ``ConcurrentCommitError`` (the
        caller re-stages against the new tip and retries). The loser's
        staged object is unreferenced garbage, swept by remove_orphans."""
        snap = staged_snapshot or self.snapshot()
        if batch_id is not None and any(e["batch"] == batch_id for e in snap["lineage"]):
            return snap  # fenced: this batch's effects are already committed
        replaced = set(replaced_buckets)
        kept = [f for f in snap["files"] if f["bucket"] not in replaced]
        new_snap = dict(snap)
        new_snap["snapshot_id"] = snap["snapshot_id"] + 1
        new_snap["parent"] = snap["snapshot_id"]
        new_snap["epoch_id"] = epoch_id
        new_snap["batch_id"] = batch_id
        new_snap["files"] = kept + new_files
        # `kind` distinguishes change batches ("data") from schema-evolve
        # commits ("schema") STRUCTURALLY — the old name-prefix convention
        # let a user batch file named schema-evolve-*.csv slip past the
        # exactly-once fence (round-4 advice); entries written before this
        # field default to "data" on read
        new_snap["lineage"] = snap["lineage"] + (
            [
                {
                    "batch": batch_id,
                    "snapshot": snap["snapshot_id"] + 1,
                    "epoch": epoch_id,
                    "kind": lineage_kind,
                }
            ]
            if batch_id is not None
            else []
        )
        if metrics:
            new_snap["metrics"] = metrics

        def _fence_or_raise(cur: dict) -> dict:
            if batch_id is not None and any(
                e["batch"] == batch_id for e in cur["lineage"]
            ):
                return cur  # a racer committed this very batch first
            raise ConcurrentCommitError(
                f"manifest moved from snapshot {snap['snapshot_id']} to "
                f"{cur['snapshot_id']} since this commit was staged — "
                "re-stage against the new tip and retry"
            )

        # pre-flight: cheap rejection before staging any metadata. The
        # CAS below is what actually closes the race window.
        tip_name = self.catalog.load_pointer()
        cur = self.catalog.load_snapshot(tip_name)
        if cur["snapshot_id"] != snap["snapshot_id"]:
            return _fence_or_raise(cur)

        new_name = _snapshot_name(new_snap["snapshot_id"])
        new_snap["parent_name"] = tip_name
        self.catalog.stage_snapshot(new_name, new_snap)
        winner = self.catalog.swap_pointer(tip_name, new_name)
        if winner == new_name:
            return new_snap
        return _fence_or_raise(self.catalog.load_snapshot(winner))
