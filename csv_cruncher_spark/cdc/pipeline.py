"""CDC replay pipeline: change-batch discovery → schema evolution → LWW
MERGE → exactly-once commit → checkpoint/resume.

This is the engine the north rule describes (BASELINE.json): it tails a
directory of CSV/JSON-encoded change batches (op ∈ {I,U,D} keyed by url),
applies each batch to a LakeTable via the keyed merge in lake/merge.py, and
records a checkpoint manifest after every committed batch with lineage and
per-partition metrics (FIXTURES.md §A4 shape). Re-running a committed batch
is a no-op at BOTH layers: the checkpoint skips it, and even without the
checkpoint the table's lineage fence rejects the duplicate commit.

Replay order = deterministic filename sort — the reference's input-sort
discipline (util/FilesUtils.kt:70-84) is the replay-order contract here.
Schema epochs: a batch whose header differs from the table schema triggers
additive evolution (new columns appended) and/or renames declared in the
batch's sidecar ``<batch>.meta.json`` (FIXTURES.md §A3), applied to table
metadata in lockstep BEFORE the batch data is merged — the reference's
epoch-split behavior (util/FilesUtils.kt:288-327) generalized from
"separate tables per epoch" to "one evolving table".
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..lake.merge import apply_batch
from ..lake.table import LakeTable, _atomic_write_json
from ..sources.discovery import filter_paths

PAGES_FIELDS: list[tuple[str, str]] = [
    ("url", "string"),
    ("warc_ts", "timestamp"),
    ("html", "binary"),
    ("text", "string"),
    ("lang", "string"),
]


def read_change_batch(
    spark: SparkSession, path: str, with_reject_reason: bool = False
) -> DataFrame:
    """Read one change-batch file into the canonical event frame:
    op, url, warc_ts(timestamp), html(binary), lang/…extras, row_idx.

    CSV batches carry html as base64 (FIXTURES.md §A2); JSON batches carry
    it as a base64 string field too.

    ``row_idx`` is the in-file order — the LWW tiebreak — and must stay
    correct under a SPLIT-PARALLEL scan (a 1 GiB binlog segment must not
    parse on one task). ``monotonically_increasing_id`` alone is wrong for
    that: Spark orders splits by size for bin-packing, so partition index
    does not follow file offset. Instead the order key is
    ``file_block_start * 2^20 + partition-local counter``: block start is
    the split's byte offset in the file (``_metadata`` column, constant
    per split), the local counter (low 33 bits of the monotonic id) is the
    in-split line number. Monotone in file order for any split order, any
    parallelism. The 2^20 factor is safe while a split holds < 1M lines —
    guaranteed by maxPartitionBytes ≤ 128 MiB and base64-html lines > 128 B.
    """
    _check_split_bound(spark)
    if path.endswith(".json"):
        # JSON-lines batches are split-parallel the same way
        raw = spark.read.json(path)
    else:
        raw = spark.read.option("header", True).option("mode", "FAILFAST").csv(path)
    cols = raw.columns
    local_counter = F.monotonically_increasing_id().bitwiseAND(F.lit((1 << 33) - 1))
    df = raw.select(
        *cols,
        (
            F.col("_metadata.file_block_start") * F.lit(1 << 20) + local_counter
        ).alias("row_idx"),
    )
    # try_to_timestamp: malformed warc_ts → NULL (ANSI to_timestamp would
    # kill the replay); a null-version event loses LWW to any non-null
    # existing row — identical rule in all three merge strategies
    df = df.withColumn("__ts_raw", F.col("warc_ts")).withColumn(
        "warc_ts", F.try_to_timestamp("warc_ts")
    )
    if with_reject_reason:
        # classification instead of silent tolerance — the DLQ path
        # (CdcPipeline(on_malformed="dlq")) quarantines these rows.
        # Null-handling is load-bearing: a NULL op makes isin() NULL
        # (not true), so the null test comes first or the row slips
        # through as clean; and a D-row's unparseable timestamp is NOT
        # exempt — a null-version delete silently loses LWW to any
        # existing row, which is exactly the kind of no-op the DLQ must
        # surface (empty timestamps stay fine: __ts_raw null ⇒ no claim
        # a value was malformed).
        reject = (
            F.when(F.col("url").isNull(), "null_key")
            .when(
                F.col("op").isNull() | ~F.col("op").isin("I", "U", "D"),
                "unknown_op",
            )
            .when(
                F.col("__ts_raw").isNotNull() & F.col("warc_ts").isNull(),
                "bad_timestamp",
            )
        )
        # __ts_raw is kept: the raw malformed value must travel with the
        # quarantined row — a DLQ entry whose bad timestamp was already
        # nulled can't be inspected or repaired
        df = df.withColumn("__reject", reject)
    else:
        # a keyless event is undeliverable: it can't hash to a bucket and
        # can't match any row — drop it with the same malformed-input
        # tolerance as try_to_timestamp (Spark reads an empty CSV field as
        # null; FAILFAST only checks token counts)
        df = df.filter(F.col("url").isNotNull())
        df = df.drop("__ts_raw")
    df = df.withColumn("html", F.unbase64(F.col("html")))
    for c in cols:
        if c in ("op", "url", "warc_ts", "html"):
            continue
        if c in ("fetch_status",):
            df = df.withColumn(c, F.col(c).cast("int"))
    return df


_SIZE_SUFFIX = {"b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}
ROW_IDX_SPLIT_BOUND = 128 << 20  # 128 MiB: the bound the 2^20 gap math assumes


def _parse_bytes(v: str) -> int:
    """Parse Spark byte-size conf strings ('134217728b', '8m', '128')."""
    s = str(v).strip().lower().removesuffix("ib")
    if s and s[-1] in _SIZE_SUFFIX:
        return int(float(s[:-1]) * _SIZE_SUFFIX[s[-1]])
    return int(s)


def _check_split_bound(spark: SparkSession) -> None:
    """Enforce the convention row_idx's gap math relies on (don't trust
    callers): with maxPartitionBytes > 128 MiB, a tombstone-heavy batch
    (~50-byte lines) could exceed 2^20 lines per split and the
    block_start*2^20 + local-counter key would stop being monotone in
    file order, silently mis-breaking LWW warc_ts ties."""
    raw = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
    if _parse_bytes(raw) > ROW_IDX_SPLIT_BOUND:
        raise ValueError(
            f"spark.sql.files.maxPartitionBytes={raw} exceeds the "
            f"{ROW_IDX_SPLIT_BOUND}-byte bound read_change_batch's row_idx "
            "ordering assumes (<= 1M lines per split); set it to 128m or "
            "lower (get_spark's default is safe)"
        )


def batch_meta(path: str) -> dict:
    meta_path = path + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            return json.load(f)
    return {}


_EVENT_META_COLS = {"op", "row_idx"}


class CdcPipeline:
    """Replay a change log into a LakeTable with exactly-once commits."""

    def __init__(
        self,
        table_path: str,
        checkpoint_path: str | None = None,
        n_buckets: int = 16,
        broadcast_winner_limit: int | None = None,
        mode: str = "mor",
        compact_every: int = 16,
        compact_delta_bytes: int = 4 << 30,
        keep_snapshots: int | None = None,
        catalog=None,
        on_malformed: str = "drop",
        expectations=None,
        partial_updates: str | None = None,
    ):
        """``mode='mor'`` (default): O(batch) delta appends with read-time
        LWW resolution, auto-compacted every ``compact_every`` stacked
        delta epochs OR when any single bucket accumulates
        ``compact_delta_bytes`` of deltas (hot-key version pile-up —
        the bytes trigger compacts just the overloaded buckets).
        ``mode='cow'``: eager copy-on-write merge per batch (the
        compaction/bulk-load path). ``keep_snapshots``: if set, expire
        older snapshots (and their orphaned files) after each compaction
        — bounds on-disk history for long replays. ``catalog``: a
        :class:`~csv_cruncher_spark.lake.catalog.SnapshotCatalog` for the
        table's snapshot-pointer storage (default: local-FS flock+rename;
        pass a conditional-write catalog on object stores).
        ``on_malformed``: ``'drop'`` (default) keeps the lenient
        semantics — keyless rows silently dropped, unparseable
        timestamps become null versions; ``'dlq'`` quarantines keyless /
        unknown-op / bad-timestamp rows to ``<table>/dlq/<batch_id>``
        parquet with a ``__reject`` reason instead of applying them, and
        records per-batch rejected counts in the checkpoint.
        ``expectations``: optional list of
        :class:`~csv_cruncher_spark.cdc.expectations.Expectation` row
        predicates evaluated on every parsed batch in one pass —
        ``warn`` counts, ``drop`` removes, ``dlq`` quarantines (to
        ``<table>/dlq/<batch_id>.expect``), ``fail`` aborts the batch
        before staging (table and checkpoint untouched; the batch
        retries on the next run). Per-rule violation counts land in the
        checkpoint under ``expectation_violations[batch_id]``.
        ``partial_updates``: a placeholder string (e.g.
        ``cdc.patch.DEBEZIUM_PLACEHOLDER``) marking elided unchanged
        columns in sparse change events (Postgres TOAST / Debezium);
        placeholders resolve from earlier in-batch rows first, then
        from the table's current row via a bucket-pruned point lookup
        (O(batch), never a table scan) — see ``cdc/patch.py``. Binary
        columns carry the placeholder as their decoded bytes."""
        from ..lake.merge import BROADCAST_WINNER_LIMIT

        if mode not in ("mor", "cow"):
            raise ValueError(f"mode must be 'mor' or 'cow', got {mode!r}")
        if on_malformed not in ("drop", "dlq"):
            raise ValueError(
                f"on_malformed must be 'drop' or 'dlq', got {on_malformed!r}"
            )
        self.table_path = table_path
        self.checkpoint_path = checkpoint_path or os.path.join(table_path, "checkpoint.json")
        self.n_buckets = n_buckets
        self.mode = mode
        self.compact_every = compact_every
        self.compact_delta_bytes = compact_delta_bytes
        self.keep_snapshots = keep_snapshots
        self.catalog = catalog
        self.on_malformed = on_malformed
        self.partial_updates = partial_updates
        self.expectations = list(expectations or [])
        if self.expectations:
            from .expectations import Expectation

            for e in self.expectations:
                if not isinstance(e, Expectation):
                    raise TypeError(f"expected Expectation, got {type(e)!r}")
        self.broadcast_winner_limit = (
            BROADCAST_WINNER_LIMIT if broadcast_winner_limit is None else broadcast_winner_limit
        )
        # test hooks (SURVEY.md §7.5 trap 1)
        self.fail_after_data_write_on: set[str] = set()
        self.fail_before_checkpoint_on: set[str] = set()

    # ---------- checkpoint ----------

    def load_checkpoint(self) -> dict:
        if os.path.exists(self.checkpoint_path):
            with open(self.checkpoint_path) as f:
                return json.load(f)
        return {
            "epoch_id": -1,
            "batches_applied": [],
            "per_partition": {},
            "lineage": [],
            "schema_version": 1,
        }

    def _write_checkpoint(self, ckpt: dict) -> None:
        _atomic_write_json(self.checkpoint_path, ckpt)

    # ---------- table ----------

    def ensure_table(self) -> LakeTable:
        t = LakeTable(self.table_path, self.catalog)
        if t.catalog.load_pointer() is not None:
            return t
        return LakeTable.create(
            self.table_path,
            PAGES_FIELDS,
            key_col="url",
            n_buckets=self.n_buckets,
            catalog=self.catalog,
        )

    # ---------- replay ----------

    def discover(self, batch_dir: str, include: str | None = None, exclude: str | None = None) -> list[str]:
        files = [
            os.path.join(batch_dir, f)
            for f in os.listdir(batch_dir)
            if f.endswith((".csv", ".json")) and not f.endswith(".meta.json")
        ]
        return sorted(filter_paths(files, include, exclude))

    def run(
        self,
        spark: SparkSession,
        batch_dir: str,
        include: str | None = None,
        exclude: str | None = None,
        max_batches: int | None = None,
    ) -> dict:
        """Apply all un-applied batches in replay order; resumable at any
        point. Returns the final checkpoint dict."""
        table = self.ensure_table()
        ckpt = self.load_checkpoint()
        applied = set(ckpt["batches_applied"])
        batches = self.discover(batch_dir, include, exclude)
        done = 0
        for path in batches:
            batch_id = os.path.basename(path)
            if batch_id in applied:
                continue
            if max_batches is not None and done >= max_batches:
                break
            # optimistic-concurrency retry: if another writer advanced the
            # manifest between staging and publish, reprocess the batch
            # against the new tip — identical machinery to crash-resume,
            # and the commit fence makes a racer's SAME-batch commit turn
            # the retry into a no-op. Failed attempts leave orphan data
            # files, like crashes (harmless, never referenced).
            from ..lake.table import ConcurrentCommitError

            for attempt in range(3):
                try:
                    self._apply_one(spark, table, path, batch_id, ckpt)
                    break
                except ConcurrentCommitError:
                    if attempt == 2:
                        raise
            applied.add(batch_id)
            done += 1
        return ckpt

    def _apply_one(
        self, spark: SparkSession, table: LakeTable, path: str, batch_id: str, ckpt: dict
    ) -> None:
        rejected = 0
        parsed = None
        if self.on_malformed == "dlq":
            # persist the parsed batch: the quarantine write, its count,
            # and the apply below would otherwise each rescan the source
            parsed = read_change_batch(spark, path, with_reject_reason=True).persist()
            bad = parsed.filter(F.col("__reject").isNotNull()).withColumnRenamed(
                "__ts_raw", "warc_ts_raw"
            )
            rejected = bad.count()
            if rejected:
                bad.write.mode("overwrite").parquet(
                    os.path.join(self.table_path, "dlq", batch_id)
                )
            df = parsed.filter(F.col("__reject").isNull()).drop(
                "__reject", "__ts_raw"
            )
        else:
            df = read_change_batch(spark, path)

        expect_counts: dict[str, int] | None = None
        expect_dropped = expect_quarantined = 0
        ev = None
        if self.partial_updates:
            # resolve sparse events BEFORE the quality gate: a payload
            # rule must judge the value the placeholder stands for, not
            # the placeholder string — evaluated-first ordering
            # quarantined legitimate rows (or fail-aborted the batch
            # unretryably) whenever both features were on
            from .patch import resolve_against_table

            df = resolve_against_table(
                spark, df, table, placeholder=self.partial_updates
            )
        if self.expectations:
            from .expectations import (
                ExpectationFailed,
                evaluate,
                route,
                violation_counts,
            )

            # one evaluated+persisted frame serves the count aggregation,
            # the routing filters, and the apply below — the batch source
            # is scanned once
            ev = evaluate(df, self.expectations).persist()
            expect_counts, _n = violation_counts(ev, self.expectations)
            fail_counts = {
                r.name: expect_counts[r.name]
                for r in self.expectations
                if r.action == "fail" and expect_counts[r.name]
            }
            if fail_counts:
                ev.unpersist()
                if parsed is not None:
                    parsed.unpersist()
                # nothing staged, nothing committed: the batch simply
                # has not happened yet; a re-run retries it
                raise ExpectationFailed(batch_id, fail_counts)
            passed, dropped, quarantined = route(ev, self.expectations)
            expect_dropped = dropped.count()
            expect_quarantined = quarantined.count()
            if expect_quarantined:
                quarantined.withColumn(
                    "__reject",
                    F.concat(
                        F.lit("expect:"), F.array_join(F.col("__viol"), ",")
                    ),
                ).write.mode("overwrite").parquet(
                    os.path.join(self.table_path, "dlq", batch_id + ".expect")
                )
            df = passed
        meta = batch_meta(path)

        # --- schema evolution in lockstep with the stream ---
        snap = table.snapshot()
        renames = meta.get("renames") or {}
        cur_names = {f["name"] for f in table.current_fields(snap)}
        batch_extra = [
            c for c in df.columns if c not in cur_names and c not in _EVENT_META_COLS
        ]
        # a renamed column arrives under its new name; don't treat it as additive
        rename_targets = set(renames.values())
        add_cols = [
            (c, _infer_lake_type(df.schema[c].dataType))
            for c in batch_extra
            if c not in rename_targets
        ]
        effective_renames = {
            old: new for old, new in renames.items() if old in cur_names
        }
        if add_cols or effective_renames:
            snap = table.evolve_schema(add_columns=add_cols, renames=effective_renames)

        epoch_id = snap["epoch_id"] + 1 if snap["epoch_id"] >= 0 else 0
        if self.mode == "mor":
            from ..lake.merge import apply_batch_mor

            new_snap = apply_batch_mor(
                spark,
                table,
                df,
                epoch_id=epoch_id,
                batch_id=batch_id,
                staged_snapshot=snap,
                fail_after_data_write=batch_id in self.fail_after_data_write_on,
            )
            heavy = sorted(
                b
                for b, n in table.delta_bytes_per_bucket(new_snap).items()
                if n >= self.compact_delta_bytes
            )
            if table.delta_epoch_depth(new_snap) >= self.compact_every:
                new_snap = table.compact(spark)  # full fold on depth trigger
            elif heavy:
                # bytes trigger: bucket-pruned compaction of just the
                # overloaded buckets (hot-key version pile-up; cost is
                # proportional to the touched slices, not the table)
                new_snap = table.compact(spark, buckets=heavy)
            if new_snap.get("batch_id") is None and self.keep_snapshots is not None:
                table.expire_snapshots(keep_last=self.keep_snapshots)
        else:
            new_snap = apply_batch(
                spark,
                table,
                df,
                epoch_id=epoch_id,
                batch_id=batch_id,
                staged_snapshot=snap,
                fail_after_data_write=batch_id in self.fail_after_data_write_on,
                broadcast_winner_limit=self.broadcast_winner_limit,
            )
        if batch_id in self.fail_before_checkpoint_on:
            raise RuntimeError("injected crash between commit and checkpoint write")

        # --- checkpoint manifest (FIXTURES.md §A4) ---
        per_part: dict[str, dict] = {}
        for f in new_snap["files"]:
            slot = per_part.setdefault(
                str(f["bucket"]),
                {"offset": new_snap["epoch_id"], "rows": 0, "bytes": 0, "files": 0},
            )
            r = f.get("rows")
            slot["rows"] = None if (r is None or slot["rows"] is None) else slot["rows"] + r
            slot["bytes"] += int(f.get("bytes", 0))
            slot["files"] += 1
        if parsed is not None:
            parsed.unpersist()
        if ev is not None:
            ev.unpersist()
        ckpt["epoch_id"] = new_snap["epoch_id"]
        ckpt["batches_applied"] = ckpt["batches_applied"] + [batch_id]
        if self.on_malformed == "dlq":
            rej = dict(ckpt.get("rejected_rows", {}))
            rej[batch_id] = rejected
            ckpt["rejected_rows"] = rej
        if expect_counts is not None:
            exp = dict(ckpt.get("expectation_violations", {}))
            exp[batch_id] = {
                "rules": expect_counts,
                "dropped": expect_dropped,
                "quarantined": expect_quarantined,
            }
            ckpt["expectation_violations"] = exp
        ckpt["per_partition"] = per_part
        ckpt["lineage"] = new_snap["lineage"]
        ckpt["schema_version"] = new_snap["schema_version"]
        self._write_checkpoint(ckpt)


def _infer_lake_type(dt: T.DataType) -> str:
    if isinstance(dt, T.IntegerType):
        return "int"
    if isinstance(dt, T.LongType):
        return "long"
    if isinstance(dt, T.DoubleType):
        return "double"
    if isinstance(dt, T.TimestampType):
        return "timestamp"
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, T.BinaryType):
        return "binary"
    return "string"
