"""Snapshot catalogs — the ONLY storage contract exactly-once publication
needs.

Every data and metadata file a :class:`~csv_cruncher_spark.lake.table.LakeTable`
writes has a unique, never-overwritten name (``w-<uuid>.parquet`` data files,
``snap-<id>.json`` snapshots). The single mutable object in the whole table is
the snapshot POINTER, and the single primitive exactly-once needs from storage
is an atomic compare-and-swap of that pointer. That is precisely Iceberg's
catalog model (the catalog swaps the table's metadata-file pointer; everything
under it is immutable), re-expressed for this engine:

- :class:`LocalFsCatalog` — the default. Implements the CAS with POSIX rename
  atomicity (``os.replace``) under an exclusive ``flock``. **This is a
  LOCAL-FILESYSTEM assumption, stated loudly:** on S3/GCS (or a FUSE mount of
  them) ``os.replace`` is not atomic and advisory locks do not exist, so this
  catalog MUST NOT be pointed at object storage. The constructor refuses paths
  that look like object-store URIs instead of corrupting silently.
- :class:`ConditionalPutCatalog` — models an object store that offers
  conditional writes (S3 ``If-Match``/``If-None-Match`` preconditions, GCS
  generation-match, DynamoDB conditional put, or an Iceberg REST catalog's
  commit endpoint). Snapshot staging is a plain unconditional PUT (object
  stores give all-or-nothing object visibility natively — no rename needed);
  only the pointer swap is conditional. The exactly-once suite runs against
  this catalog too (``tests/test_exactly_once.py``), proving the CAS contract
  is the only thing a backend must provide.

Reference parity note: the reference engine (csv-cruncher) delegates all
durability to HSQLDB on a local disk and has no commit protocol; this module
is part of the CDC/lake layer the north rule adds on top.
"""

from __future__ import annotations

import json
import os
import threading
import uuid
from abc import ABC, abstractmethod

MANIFEST = "manifest.json"

_OBJECT_STORE_SCHEMES = ("s3://", "s3a://", "s3n://", "gs://", "gcs://", "abfs://", "abfss://", "wasb://", "oss://")


class SnapshotCatalog(ABC):
    """Contract for snapshot-pointer storage.

    Requirements on implementations:

    - :meth:`stage_snapshot` must make the snapshot durable and fully
      visible before returning (a reader that follows a pointer must never
      see a torn snapshot). Names are unique per snapshot id; re-staging
      the same name with identical content is allowed (idempotent retry).
    - :meth:`swap_pointer` must be ATOMIC with respect to all other
      swappers: compare the current pointer to ``expected`` and move it to
      ``new`` only on match, returning the pointer that is current after
      the call (== ``new`` iff this swap won). No torn state, no
      lost-update window. This is the one hard primitive.
    - Everything else is plain durable read/write/list/delete of uniquely
      named immutable objects.
    """

    @abstractmethod
    def load_pointer(self) -> str | None:
        """Current snapshot name, or None if the table doesn't exist yet."""

    @abstractmethod
    def load_snapshot(self, name: str) -> dict:
        """Read a snapshot by name. Raises FileNotFoundError if expired."""

    @abstractmethod
    def stage_snapshot(self, name: str, snap: dict) -> None:
        """Durably write a snapshot object (unique name, never mutated)."""

    @abstractmethod
    def swap_pointer(self, expected: str | None, new: str) -> str:
        """Atomic CAS of the pointer; returns the post-call pointer."""

    @abstractmethod
    def set_pointer(self, name: str) -> None:
        """Unconditional pointer write — table-creation path only."""

    @abstractmethod
    def list_snapshot_names(self) -> list[str]:
        """All retained snapshot names, sorted ascending."""

    @abstractmethod
    def delete_snapshot(self, name: str) -> None:
        """Drop a retained snapshot (retention/expiry path)."""

    def snapshot_age_s(self, name: str) -> float | None:
        """Seconds since ``name`` was staged, or ``None`` if unknown.

        Part of the contract because the orphan sweep's age gate must come
        from the CATALOG, not from local-disk mtimes: with an object-store
        catalog there is no local file to stat, and without an age a
        concurrent committer's staged-but-not-yet-swapped snapshot would be
        swept immediately — the winning pointer could then reference a
        deleted snapshot (table unreadable). ``remove_orphans`` treats
        ``None`` as "too young to sweep" (safe: the object lingers until a
        catalog that knows its age reports it old enough)."""
        return None


def _atomic_write_json(path: str, obj: dict) -> None:
    """POSIX-only durable write: temp file + fsync + rename + parent-dir
    fsync. The parent fsync matters: without it a power loss can roll back
    the rename (dirent not durable) AFTER a later write (e.g. the
    checkpoint) survives — the manifest would point at the old snapshot
    while the checkpoint lists the batch as applied, silently skipping it
    forever on resume."""
    tmp = path + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    dfd = os.open(os.path.dirname(os.path.abspath(path)) or ".", os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


class LocalFsCatalog(SnapshotCatalog):
    """Pointer CAS via ``flock`` + atomic rename. LOCAL FILESYSTEMS ONLY —
    see the module docstring. Layout (unchanged from rounds 1-2, so
    existing tables load as-is): ``<path>/manifest.json`` holds
    ``{"snapshot": "snap-XXXXXXXX.json"}``; snapshots live under
    ``<path>/snapshots/``."""

    def __init__(self, path: str):
        if path.startswith(_OBJECT_STORE_SCHEMES):
            raise ValueError(
                f"LocalFsCatalog({path!r}): os.replace/flock are not atomic on "
                "object stores — use a conditional-write catalog "
                "(ConditionalPutCatalog models the contract) for S3/GCS/ABFS"
            )
        self.path = path
        self._sdir = os.path.join(path, "snapshots")

    def _manifest(self) -> str:
        return os.path.join(self.path, MANIFEST)

    def load_pointer(self) -> str | None:
        try:
            with open(self._manifest()) as f:
                return json.load(f)["snapshot"]
        except FileNotFoundError:
            return None

    def load_snapshot(self, name: str) -> dict:
        with open(os.path.join(self._sdir, name)) as f:
            return json.load(f)

    def stage_snapshot(self, name: str, snap: dict) -> None:
        os.makedirs(self._sdir, exist_ok=True)
        _atomic_write_json(os.path.join(self._sdir, name), snap)

    def swap_pointer(self, expected: str | None, new: str) -> str:
        import fcntl

        with open(os.path.join(self.path, ".commit.lock"), "w") as lf:
            fcntl.flock(lf, fcntl.LOCK_EX)
            cur = self.load_pointer()
            if cur != expected:
                return cur if cur is not None else ""
            _atomic_write_json(self._manifest(), {"snapshot": new})
            return new

    def set_pointer(self, name: str) -> None:
        _atomic_write_json(self._manifest(), {"snapshot": name})

    def list_snapshot_names(self) -> list[str]:
        try:
            return sorted(
                fn
                for fn in os.listdir(self._sdir)
                if fn.startswith("snap-") and fn.endswith(".json")
            )
        except FileNotFoundError:
            return []

    def delete_snapshot(self, name: str) -> None:
        os.remove(os.path.join(self._sdir, name))

    def snapshot_age_s(self, name: str) -> float | None:
        import time

        try:
            return time.time() - os.path.getmtime(os.path.join(self._sdir, name))
        except OSError:
            return None


class ConditionalPutCatalog(SnapshotCatalog):
    """In-process model of an object store with conditional writes.

    Objects (snapshots and the pointer) live in a plain dict; there is no
    rename, no flock, and regular writes are NOT atomic-by-path — exactly
    the S3/GCS surface. The ONLY synchronized primitive is
    :meth:`swap_pointer`, whose lock stands in for the store's
    compare-and-set (S3 ``If-Match`` on ETag, GCS ``ifGenerationMatch``).
    Used by the exactly-once contract tests to prove nothing in the commit
    protocol outside :class:`LocalFsCatalog` relies on POSIX semantics; a
    real S3 catalog replaces the dict with boto3 calls and keeps this
    exact class shape."""

    def __init__(self):
        self._objects: dict[str, str] = {}
        self._staged_at: dict[str, float] = {}
        self._pointer: str | None = None
        self._cas_lock = threading.Lock()
        # counts CAS losses — lets tests assert the race actually happened
        self.cas_failures = 0

    def load_pointer(self) -> str | None:
        return self._pointer

    def load_snapshot(self, name: str) -> dict:
        try:
            return json.loads(self._objects[name])
        except KeyError:
            raise FileNotFoundError(name) from None

    def stage_snapshot(self, name: str, snap: dict) -> None:
        # unconditional PUT: object stores give all-or-nothing visibility.
        # Staged-at is recorded (the store's object-creation timestamp —
        # every real object store exposes one) so the orphan sweep's age
        # gate works here too, not only on local-disk mtimes.
        import time

        self._objects[name] = json.dumps(snap)
        self._staged_at.setdefault(name, time.time())

    def swap_pointer(self, expected: str | None, new: str) -> str:
        with self._cas_lock:
            if self._pointer != expected:
                self.cas_failures += 1
                return self._pointer if self._pointer is not None else ""
            self._pointer = new
            return new

    def set_pointer(self, name: str) -> None:
        self._pointer = name

    def list_snapshot_names(self) -> list[str]:
        return sorted(self._objects)

    def delete_snapshot(self, name: str) -> None:
        self._objects.pop(name, None)
        self._staged_at.pop(name, None)

    def snapshot_age_s(self, name: str) -> float | None:
        import time

        staged = self._staged_at.get(name)
        return None if staged is None else time.time() - staged
