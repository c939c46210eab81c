"""IcebergBackend — the production implementation of
:class:`~csv_cruncher_spark.lake.backend.TableBackend` over a real Apache
Iceberg catalog (SURVEY.md §7.1's second backend).

No Iceberg runtime jar ships in this sandbox, so this backend is
capability-probed: :func:`iceberg_available` checks for the Spark-Iceberg
classes on the session's JVM classpath, the contract tests in
``tests/test_backends.py`` run the SAME scenarios against both backends
and mark the Iceberg leg ``skipped`` (not absent) when the jar is
missing, and every method here issues the real Spark SQL an Iceberg
deployment executes — nothing is a ``pass`` stub.

Mapping of the engine's concepts onto Iceberg (all public API):

=====================  =====================================================
engine concept          Iceberg realization
=====================  =====================================================
bucketed layout         ``PARTITIONED BY (bucket(N, key))`` (Iceberg's own
                        hash-bucket transform; co-partitions MERGE joins
                        exactly like the manifest lake's ``pmod(xxhash64)``)
op-coded LWW upsert     in-batch dedup via the SHARED ``lww_winners`` fold,
                        then one ``MERGE INTO`` with version-guarded
                        WHEN MATCHED DELETE / UPDATE / WHEN NOT MATCHED
                        INSERT arms (Catalyst plans the same broadcast /
                        shuffle strategies the manifest merge picks by hand)
schema evolution        ``ALTER TABLE ADD COLUMN`` / ``RENAME COLUMN`` —
                        Iceberg is field-id based natively, so renames are
                        metadata-only, identical to lake/table.py semantics
exactly-once fence      batch id stamped into the MERGE snapshot's own
                        summary (``wap.id`` via ``spark.wap.id``) —
                        single-commit, atomic with the data; the
                        ``ccs.applied-batches`` property is bookkeeping
snapshot read           ``spark.table(identifier)``; time travel via
                        ``VERSION AS OF``
change feed             ``system.create_changelog_view`` (net_changes +
                        compute_updates) over the snapshot range; epochs
                        map to snapshots via ``ccs.epoch-snapshots``
=====================  =====================================================

**Exactly-once fence (single-commit since round 4):** the batch id rides
INSIDE the MERGE's own snapshot as the ``wap.id`` summary property —
Iceberg stamps it into the committing snapshot whenever the session conf
``spark.wap.id`` is set (the write-audit-publish id; Spark's
``SparkWriteConf.wapId``), with no second commit and no py4j callback.
``applied_batches`` reads the union of the summary-stamped ids (from the
``<table>.snapshots`` metadata table) and the legacy
``ccs.applied-batches`` property, so a crash BETWEEN the MERGE and the
bookkeeping property update no longer re-applies the batch: the fence
check sees the id in the snapshot summary. The property update
(epoch→snapshot map for the change feed + the legacy batch list) remains
a separate, non-load-bearing commit and self-heals by resolving snapshot
ids from the summaries. Two caveats, stated loudly: (a)
``write.wap.enabled`` must stay unset/false on the table — with WAP
enabled Iceberg STAGES wap-id commits instead of publishing them, which
is a different workflow; ``apply_batch`` asserts this. (b) None of this
SQL has executed in this sandbox (no Iceberg jar); the contract tests
cover it in jar-present environments, skipped-not-absent here. The
``CommitMetadata.withCommitProperties`` Java API (the pattern Flink's
Iceberg sink uses for ``flink.max-committed-checkpoint-id``) remains the
alternative for engines that cannot set session confs per batch.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame, SparkSession

from .backend import TableBackend

_PROP_BATCHES = "ccs.applied-batches"
_PROP_EPOCH = "ccs.epoch-id"
# epoch -> Iceberg snapshot id of that epoch's committing MERGE, kept so
# the engine's epoch-ranged change feed can be answered by Iceberg's
# snapshot-ranged changelog (start-snapshot-id is EXCLUSIVE there, which
# matches the feed's (from, to] half-open range exactly)
_PROP_EPOCH_SNAPSHOTS = "ccs.epoch-snapshots"

# Batch ids are interpolated into ALTER TABLE ... SET TBLPROPERTIES string
# literals (Spark SQL has no parameter binding for DDL), so they are
# validated at the apply_batch boundary: a quote or backslash in an id
# would otherwise break the statement — corrupting the exactly-once fence
# property — or worse, splice into the SQL (round-3 advice). The engine's
# own ids (file stems / uuids) all match this set.
_BATCH_ID_RE = re.compile(r"^[A-Za-z0-9._:-]+$")


def _validate_batch_id(batch_id: str) -> str:
    if not isinstance(batch_id, str) or not _BATCH_ID_RE.fullmatch(batch_id):
        raise ValueError(
            f"invalid batch id {batch_id!r}: must be non-empty "
            "[A-Za-z0-9._:-]+ — ids are embedded in SQL string literals "
            "and in the applied-batches table property"
        )
    return batch_id


def iceberg_available(spark: SparkSession, catalog_name: str = "local") -> bool:
    """True iff an Iceberg Spark runtime is on the JVM classpath AND the
    named Spark catalog is configured as an Iceberg catalog."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001 — capability probe
            "org.apache.iceberg.spark.SparkCatalog"
        )
    except Exception:
        return False
    impl = spark.conf.get(f"spark.sql.catalog.{catalog_name}", None)
    return impl is not None


class IcebergBackend(TableBackend):
    """See module docstring. ``identifier`` is the full table identifier
    in an Iceberg-configured catalog, e.g. ``local.db.pages``."""

    def __init__(
        self,
        spark: SparkSession,
        identifier: str,
        key_col: str = "url",
        version_col: str = "warc_ts",
    ):
        if not iceberg_available(spark, identifier.split(".", 1)[0]):
            raise RuntimeError(
                "no Iceberg runtime on the classpath (or catalog not "
                f"configured) for {identifier!r} — add "
                "iceberg-spark-runtime to spark.jars.packages and configure "
                f"spark.sql.catalog.{identifier.split('.', 1)[0]}"
            )
        self.spark = spark
        self.identifier = identifier
        self.key_col = key_col
        self.version_col = version_col

    # ---------- DDL ----------

    def exists(self) -> bool:
        return self.spark.catalog.tableExists(self.identifier)

    def create(self, fields: list[tuple[str, str]], n_buckets: int = 16) -> None:
        cols = ", ".join(f"`{n}` {t}" for n, t in fields)
        self.spark.sql(
            f"CREATE TABLE {self.identifier} ({cols}) USING iceberg "
            f"PARTITIONED BY (bucket({n_buckets}, `{self.key_col}`)) "
            f"TBLPROPERTIES ('{_PROP_BATCHES}'='[]', '{_PROP_EPOCH}'='-1', "
            # v2 + merge-on-read: deletes/updates write positional delete
            # files instead of rewriting data files — the Iceberg analogue
            # of the manifest lake's MOR delta path
            "'format-version'='2', 'write.merge.mode'='merge-on-read', "
            "'write.delete.mode'='merge-on-read', 'write.update.mode'='merge-on-read')"
        )

    def column_names(self) -> list[str]:
        return [f.name for f in self.spark.table(self.identifier).schema.fields]

    def evolve(self, add_columns=None, renames=None) -> None:
        for name, typ in add_columns or []:
            self.spark.sql(
                f"ALTER TABLE {self.identifier} ADD COLUMN `{name}` {typ}"
            )
        for old, new in (renames or {}).items():
            if old == self.key_col or old == self.version_col:
                raise ValueError(
                    f"cannot rename identity column {old!r} (key/version) — "
                    "same rule as lake/table.py evolve_schema"
                )
            self.spark.sql(
                f"ALTER TABLE {self.identifier} RENAME COLUMN `{old}` TO `{new}`"
            )

    # ---------- exactly-once fence ----------

    def _props(self) -> dict:
        rows = self.spark.sql(f"SHOW TBLPROPERTIES {self.identifier}").collect()
        return {r["key"]: r["value"] for r in rows}

    def applied_batches(self) -> list[str]:
        """Union of (a) batch ids stamped into snapshot summaries as
        ``wap.id`` by the MERGE commit itself — the load-bearing fence,
        atomic with the data — and (b) the legacy ``ccs.applied-batches``
        property (tables written before round 4, plus bookkeeping written
        after each MERGE). Order: property list first (it preserves apply
        order), then any summary-only ids (a crash window's orphans) in
        snapshot order."""
        from_props = json.loads(self._props().get(_PROP_BATCHES, "[]"))
        seen = set(from_props)
        out = list(from_props)
        for r in self.spark.sql(
            f"SELECT summary['wap.id'] AS wid FROM {self.identifier}.snapshots "
            "WHERE summary['wap.id'] IS NOT NULL ORDER BY committed_at"
        ).collect():
            if r["wid"] is not None and r["wid"] not in seen:
                seen.add(r["wid"])
                out.append(r["wid"])
        return out

    def _current_snapshot_id(self) -> int | None:
        row = self.spark.sql(
            f"SELECT snapshot_id FROM {self.identifier}.snapshots "
            "ORDER BY committed_at DESC, snapshot_id DESC LIMIT 1"
        ).first()
        return None if row is None else int(row[0])

    def _epoch_snapshots(self) -> dict[str, int]:
        return json.loads(self._props().get(_PROP_EPOCH_SNAPSHOTS, "{}"))

    def _snapshot_id_for_batch(self, batch_id: str) -> int | None:
        row = self.spark.sql(
            f"SELECT snapshot_id FROM {self.identifier}.snapshots "
            f"WHERE summary['wap.id'] = '{_validate_batch_id(batch_id)}' "
            "ORDER BY committed_at DESC LIMIT 1"
        ).first()
        return None if row is None else int(row[0])

    def _record_batch(self, batch_id: str, epoch_id: int) -> None:
        """Bookkeeping commit AFTER the fence-carrying MERGE: the ordered
        batch list and the epoch→snapshot map for the change feed. NOT
        load-bearing for exactly-once (the wap.id summary is) — a crash
        before this runs is healed on the next apply because the id
        resolves from the snapshot summary."""
        batches = json.loads(self._props().get(_PROP_BATCHES, "[]"))
        if batch_id not in batches:
            batches.append(_validate_batch_id(batch_id))
        esnaps = self._epoch_snapshots()
        sid = self._snapshot_id_for_batch(batch_id) or self._current_snapshot_id()
        if sid is not None:
            esnaps[str(int(epoch_id))] = sid
        self.spark.sql(
            f"ALTER TABLE {self.identifier} SET TBLPROPERTIES "
            f"('{_PROP_BATCHES}'='{json.dumps(batches)}', "
            f"'{_PROP_EPOCH}'='{int(epoch_id)}', "
            f"'{_PROP_EPOCH_SNAPSHOTS}'='{json.dumps(esnaps)}')"
        )

    # ---------- merge ----------

    def apply_batch(
        self, spark: SparkSession, events: DataFrame, batch_id: str, epoch_id: int
    ) -> dict:
        from .backend import RESERVED_BATCH_PREFIX
        from .merge import lww_winners

        _validate_batch_id(batch_id)
        if batch_id in self.applied_batches():
            return {"applied": False, "reason": "already-in-lineage"}
        if str(batch_id).startswith(RESERVED_BATCH_PREFIX):
            # contract symmetry with ManifestBackend: the prefix namespace
            # is reserved for schema-evolve lineage entries; checked AFTER
            # the fence so legacy applied ids replay as no-ops
            raise ValueError(
                f"batch id {batch_id!r} uses the reserved prefix "
                f"{RESERVED_BATCH_PREFIX!r} (schema-evolve commits)"
            )

        winners = lww_winners(events, self.key_col)
        table_cols = self.column_names()
        if "text" in table_cols and "html" in winners.columns:
            # same vectorized HTML→text extraction as the manifest merge
            # (byte-identical text per url across backends)
            from pyspark.sql import functions as F

            from ..cdc.extract import extract_text_udf

            winners = winners.withColumn("text", extract_text_udf(F.col("html")))
        have = set(winners.columns)
        src = f"__ccs_src_{abs(hash(batch_id)) % 10**8}"
        winners.createOrReplaceTempView(src)

        k, v = self.key_col, self.version_col
        # whole-row replacement semantics, matching the manifest merge's
        # _winner_upsert_rows: table columns the batch does NOT carry are
        # set to NULL on update, not retained — the winner event is the
        # row's new truth, and the two backends must produce identical
        # state for identical replays. Bare NULL (untyped) resolves to
        # each target column's type.
        set_clause = ", ".join(
            f"t.`{c}` = s.`{c}`" if c in have else f"t.`{c}` = NULL"
            for c in table_cols
            if c != k
        )
        ins_cols = ", ".join(f"`{c}`" for c in table_cols)
        ins_vals = ", ".join(
            f"s.`{c}`" if c in have else "NULL" for c in table_cols
        )
        # WAP must be OFF: with write.wap.enabled=true Iceberg STAGES
        # wap-id commits instead of publishing them — a different
        # workflow that would make the MERGE invisible
        if self._props().get("write.wap.enabled", "false").lower() == "true":
            raise RuntimeError(
                f"{self.identifier} has write.wap.enabled=true — the "
                "exactly-once fence stamps batch ids via spark.wap.id and "
                "requires published (not staged) commits"
            )
        # single-commit fence: the batch id rides in the MERGE snapshot's
        # summary (wap.id) — atomic with the data, no crash window
        prev_wap = self.spark.conf.get("spark.wap.id", None)
        self.spark.conf.set("spark.wap.id", batch_id)
        try:
            # version-guarded arms = the manifest merge's stale-event rule:
            # equal version → incoming wins (later writer under replay order)
            self.spark.sql(
                f"MERGE INTO {self.identifier} t USING {src} s ON t.`{k}` = s.`{k}` "
                f"WHEN MATCHED AND s.op = 'D' AND s.`{v}` >= t.`{v}` THEN DELETE "
                f"WHEN MATCHED AND s.op != 'D' AND s.`{v}` >= t.`{v}` THEN UPDATE SET {set_clause} "
                f"WHEN NOT MATCHED AND s.op != 'D' THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
            )
        finally:
            if prev_wap is None:
                self.spark.conf.unset("spark.wap.id")
            else:
                self.spark.conf.set("spark.wap.id", prev_wap)
        self.spark.catalog.dropTempView(src)
        self._record_batch(batch_id, epoch_id)
        return {"applied": True}

    # ---------- read ----------

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.table(self.identifier)

    def changes_since(self, spark: SparkSession, start_snapshot_id: int) -> DataFrame:
        """Incremental append-scan (Iceberg's native change feed for
        appends; MERGE-produced snapshots need the changelog procedure —
        see :meth:`changes_between`)."""
        return (
            spark.read.format("iceberg")
            .option("start-snapshot-id", str(start_snapshot_id))
            .load(self.identifier)
        )

    def changes_between(
        self,
        spark: SparkSession,
        from_epoch: int,
        to_epoch: int | None = None,
        with_before: bool = False,
    ) -> DataFrame:
        """The TableBackend change-feed contract over Iceberg's changelog
        procedure (``system.create_changelog_view``, Iceberg >= 1.2 —
        the production realization of the manifest lake's
        ``LakeTable.changes_between``).

        Epochs map to snapshots via the ``ccs.epoch-snapshots`` property
        written by ``_record_batch`` at each MERGE commit. The changelog's
        ``start-snapshot-id`` is exclusive and ``end-snapshot-id``
        inclusive — exactly the feed's ``(from, to]`` half-open range.
        ``net_changes`` suppresses in-range touched-but-net-unchanged keys
        and ``compute_updates`` + identifier column folds the DELETE+INSERT
        pair of an update into UPDATE_BEFORE/UPDATE_AFTER, which project
        onto the contract's I/U/D (__op) shape; D rows null their non-key
        data columns to match the manifest feed byte-for-byte.
        ``with_before=True`` folds the UPDATE_BEFORE row (or the DELETE
        row's own payload) into a ``__before`` struct on the surviving
        row, matching the manifest feed's pre-image shape. An expired
        from-snapshot surfaces as the same ``ValueError`` the manifest
        backend raises (retention bounds the feed window on every
        backend)."""
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        props = self._props()
        cur_epoch = int(props.get(_PROP_EPOCH, "-1"))
        if to_epoch is None:
            to_epoch = cur_epoch
        if not (-1 <= from_epoch <= to_epoch <= cur_epoch):
            raise ValueError(
                f"invalid epoch range ({from_epoch}, {to_epoch}] for a "
                f"table at epoch {cur_epoch}"
            )
        data_cols = self.column_names()
        key = self.key_col

        def _before_type(df: DataFrame) -> T.StructType:
            return T.StructType(
                [df.schema[c] for c in data_cols]  # type: ignore[misc]
            )

        if from_epoch == to_epoch:
            base = self.read(spark)
            out = base.select(F.lit("").alias("__op"), *data_cols).limit(0)
            if with_before:
                out = out.withColumn(
                    "__before", F.lit(None).cast(_before_type(base))
                )
            return out
        if from_epoch == -1:
            # bootstrap: the full resolved state as inserts — works even
            # after every pre-range snapshot expired
            base = self.read(spark)
            out = base.select(F.lit("I").alias("__op"), *data_cols)
            if with_before:
                out = out.withColumn(
                    "__before", F.lit(None).cast(_before_type(base))
                )
            return out

        esnaps = self._epoch_snapshots()
        missing = [
            e
            for e in (from_epoch, to_epoch)
            if str(e) not in esnaps and not (e == to_epoch and e == cur_epoch)
        ]
        if missing:
            raise ValueError(
                f"change feed for epochs {missing} is gone — no committing "
                "snapshot recorded (epoch never committed here, or its "
                "snapshot was expired; expire_snapshots bounds the feed's "
                "retention window)"
            )
        start_sid = esnaps[str(from_epoch)]
        end_sid = esnaps.get(str(to_epoch), self._current_snapshot_id())
        # verify the start snapshot is still retained — expire_snapshots
        # silently drops rows otherwise
        retained = {
            int(r[0])
            for r in self.spark.sql(
                f"SELECT snapshot_id FROM {self.identifier}.snapshots"
            ).collect()
        }
        if start_sid not in retained:
            raise ValueError(
                f"change feed from epoch {from_epoch} is gone — its "
                f"committing snapshot {start_sid} was expired "
                "(expire_snapshots bounds the feed's retention window)"
            )
        catalog, _, table_name = self.identifier.partition(".")
        view = f"__ccs_changes_{abs(hash((self.identifier, from_epoch, to_epoch))) % 10**8}"
        self.spark.sql(
            f"CALL {catalog}.system.create_changelog_view("
            f"table => '{table_name}', "
            f"options => map('start-snapshot-id', '{int(start_sid)}', "
            f"'end-snapshot-id', '{int(end_sid)}'), "
            f"changelog_view => '{view}', "
            f"net_changes => true, "
            f"compute_updates => true, "
            f"identifier_columns => array('{key}'))"
        )
        chg = self.spark.table(view)
        op = (
            F.when(F.col("_change_type") == "INSERT", F.lit("I"))
            .when(F.col("_change_type") == "UPDATE_AFTER", F.lit("U"))
            .when(F.col("_change_type") == "DELETE", F.lit("D"))
        )
        # D rows: non-key data columns nulled (contract parity with the
        # manifest feed — a delete's payload is gone, not the old value)
        cols = [
            F.col(c)
            if c == key
            else F.when(F.col("_change_type") == "DELETE", F.lit(None)).otherwise(F.col(c)).alias(c)
            for c in data_cols
        ]
        after = chg.filter(F.col("_change_type") != "UPDATE_BEFORE")
        if not with_before:
            return after.select(op.alias("__op"), *cols)
        # pre-images are already IN the changelog: an UPDATE_BEFORE row is
        # the old content of its key's UPDATE_AFTER (net_changes => one
        # pair per key in the range), and a DELETE row itself carries the
        # deleted content — no time-travel read needed
        row_struct = F.struct(*[F.col(c) for c in data_cols])
        pre = chg.filter(F.col("_change_type") == "UPDATE_BEFORE").select(
            F.col(key).alias("__pk"), row_struct.alias("__ub")
        )
        joined = after.join(pre, after[key] == pre["__pk"], "left")
        before = (
            F.when(F.col("_change_type") == "DELETE", row_struct)
            .when(F.col("_change_type") == "UPDATE_AFTER", F.col("__ub"))
        )
        return joined.select(
            op.alias("__op"), *cols, before.alias("__before")
        )
