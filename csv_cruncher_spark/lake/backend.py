"""TableBackend — the thin batch-level facade SURVEY.md §7.1 promises,
with the manifest lake as the always-available implementation and
:class:`~csv_cruncher_spark.lake.iceberg.IcebergBackend` as the production
implementation (capability-probed; real SQL, skipped-not-absent in the
jarless sandbox).

The facade is deliberately batch-level — exactly the operations the CDC
engine needs from a table store, nothing more:

- idempotent op-coded LWW upsert of one change batch (``apply_batch``),
- applied-batch lineage for the exactly-once fence (``applied_batches``),
- additive/rename schema evolution in lockstep with the stream,
- snapshot-consistent read.

Everything else (compaction cadence, checkpointing, discovery, ordering)
belongs to the pipeline, not the store — mirroring how the reference
delegates storage entirely to its embedded engine
(/root/reference/src/main/kotlin/cz/dynawest/csvcruncher/Cruncher.kt:59).
"""

from __future__ import annotations

from abc import ABC, abstractmethod

from pyspark.sql import DataFrame, SparkSession

from .table import LakeTable

# Batch-id namespace reserved for the facade's own schema-evolve lineage
# entries; apply_batch rejects user ids spelling it (see applied_batches).
RESERVED_BATCH_PREFIX = "schema-evolve-"


class TableBackend(ABC):
    """Batch-level table-store contract. Implementations must make
    ``apply_batch`` idempotent per ``batch_id`` (re-applying an applied
    batch is a no-op) and LWW-consistent (in-batch dedup on max
    ``(version, row_idx)``; an event applies iff its version >= the
    current row's; ``D`` deletes, ``I``/``U`` upsert)."""

    key_col: str
    version_col: str

    @abstractmethod
    def exists(self) -> bool: ...

    @abstractmethod
    def create(self, fields: list[tuple[str, str]], n_buckets: int = 16) -> None: ...

    @abstractmethod
    def column_names(self) -> list[str]: ...

    @abstractmethod
    def evolve(
        self,
        add_columns: list[tuple[str, str]] | None = None,
        renames: dict[str, str] | None = None,
    ) -> None: ...

    @abstractmethod
    def applied_batches(self) -> list[str]: ...

    @abstractmethod
    def apply_batch(
        self, spark: SparkSession, events: DataFrame, batch_id: str, epoch_id: int
    ) -> dict: ...

    @abstractmethod
    def read(self, spark: SparkSession) -> DataFrame: ...

    @abstractmethod
    def changes_between(
        self,
        spark: SparkSession,
        from_epoch: int,
        to_epoch: int | None = None,
        with_before: bool = False,
    ) -> DataFrame:
        """Incremental change feed over the epoch range ``(from_epoch,
        to_epoch]`` (``to_epoch=None`` = the current epoch): one row per
        key whose resolved state NET-changed across the range, shaped
        ``__op`` + the table's current data columns.

        - ``I`` — key absent at from_epoch, present at to_epoch
        - ``U`` — present at both with different content
        - ``D`` — present at from_epoch, absent at to_epoch (non-key
          data columns are null)

        Keys touched but net-unchanged (stale LWW losers, in-range
        insert+delete, identical rewrite) are NOT emitted.
        ``from_epoch=-1`` is the bootstrap: the full state as inserts.
        ``with_before=True`` adds a ``__before`` struct column with the
        key's pre-range content (null for ``I``, the old row for
        ``U``/``D``) — the retraction input for incremental aggregate
        maintenance (:mod:`csv_cruncher_spark.lake.ivm`).
        Raises ``ValueError`` when the range's history has been expired
        (retention bounds the feed window on every backend)."""
        ...


class ManifestBackend(TableBackend):
    """The manifest-parquet lake behind the facade: delegates to
    :class:`LakeTable` + the MOR merge path (the engine's default store —
    all correctness machinery lives there and is tested directly; this
    wrapper only adapts the call shape so contract tests can run
    byte-identical scenarios against both backends)."""

    def __init__(self, path: str, key_col: str = "url", version_col: str = "warc_ts", catalog=None):
        self.path = path
        self.key_col = key_col
        self.version_col = version_col
        self._catalog = catalog

    def _table(self) -> LakeTable:
        return LakeTable(self.path, self._catalog)

    def exists(self) -> bool:
        return self._table().catalog.load_pointer() is not None

    def create(self, fields: list[tuple[str, str]], n_buckets: int = 16) -> None:
        LakeTable.create(
            self.path,
            fields,
            key_col=self.key_col,
            n_buckets=n_buckets,
            version_col=self.version_col,
            catalog=self._catalog,
        )

    def column_names(self) -> list[str]:
        t = self._table()
        return [f["name"] for f in t.current_fields()]

    def evolve(self, add_columns=None, renames=None) -> None:
        import uuid

        t = self._table()
        staged = t.evolve_schema(add_columns=add_columns, renames=renames)
        snap = t.snapshot()
        # Advance the epoch (round-3 advice): reusing the tip's epoch_id
        # created duplicate epochs, so snapshot_at(epoch) — which resolves
        # by max snapshot_id — silently changed "state as of epoch N" to
        # the post-evolve schema. The tagged batch id gives the commit a
        # lineage entry so the change feed can locate this epoch's
        # committing snapshot; the metadata-only metrics replace the prior
        # batch's strategy/file counts, which the old path inherited
        # verbatim (a zero-file schema commit reported as a data batch).
        t.commit(
            new_files=[],
            replaced_buckets=[],
            epoch_id=snap["epoch_id"] + 1,
            batch_id=f"schema-evolve-{uuid.uuid4().hex[:8]}",
            staged_snapshot=staged,
            metrics={
                "last_batch_strategy": "metadata-only",
                "last_batch_files": 0,
                "last_batch_rows": 0,
            },
            lineage_kind="schema",
        )

    def applied_batches(self) -> list[str]:
        # schema-evolve commits are not change batches, so the
        # exactly-once fence surface must not report them. The filter is
        # STRUCTURAL (lineage kind="schema", written by evolve) with the
        # legacy name-prefix kept only for snapshots written before the
        # field existed — safe because apply_batch rejects user batch ids
        # spelling the reserved prefix (round-4 advice: a change-batch
        # file named schema-evolve-*.csv used to vanish from this list
        # and re-apply on every replay)
        return [
            e["batch"]
            for e in self._table().snapshot()["lineage"]
            if e.get("kind", "data") != "schema"
            and not str(e["batch"]).startswith(RESERVED_BATCH_PREFIX)
        ]

    def apply_batch(
        self, spark: SparkSession, events: DataFrame, batch_id: str, epoch_id: int
    ) -> dict:
        from .merge import apply_batch_mor

        t = self._table()
        snap = t.snapshot()
        # fence FIRST, reserved-prefix rejection second: a legacy lake that
        # legitimately applied a batch named schema-evolve-* before the
        # prefix was reserved must replay as the idempotent no-op, not an
        # error (renaming the file would change the id and double-apply)
        if batch_id in {e["batch"] for e in snap["lineage"]}:
            return {"applied": False, "reason": "already-in-lineage"}
        if str(batch_id).startswith(RESERVED_BATCH_PREFIX):
            raise ValueError(
                f"batch id {batch_id!r} uses the reserved prefix "
                f"{RESERVED_BATCH_PREFIX!r} (schema-evolve commits) — "
                "rename the change-batch file; a reserved-prefix id would "
                "be invisible to the exactly-once fence on legacy snapshots"
            )
        apply_batch_mor(
            spark, t, events, epoch_id=epoch_id, batch_id=batch_id, staged_snapshot=snap
        )
        return {"applied": True}

    def read(self, spark: SparkSession) -> DataFrame:
        return self._table().read(spark)

    def changes_between(
        self,
        spark: SparkSession,
        from_epoch: int,
        to_epoch: int | None = None,
        allow_snapshot_diff: bool = False,
        with_before: bool = False,
    ) -> DataFrame:
        # pure delegation — the feed machinery (delta-range key discovery,
        # keyed endpoint reads, net-change hash suppression) lives on
        # LakeTable and is property-tested there; the facade only fixes
        # the contract shape shared with IcebergBackend
        return self._table().changes_between(
            spark,
            from_epoch,
            to_epoch,
            allow_snapshot_diff=allow_snapshot_diff,
            with_before=with_before,
        )
