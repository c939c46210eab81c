"""Input discovery: directory walk, include/exclude filtering, sort order,
combine grouping, schema-epoch splitting.

Carries over the reference's ingest dataflow (SURVEY.md §2.A A2–A5):

- walk input dirs collecting data files (reference keeps only ``*.csv`` in
  dir walks, util/FilesUtils.kt:224; we accept csv/json/parquet),
- include-regex then exclude-regex over the whole path
  (util/FilesUtils.kt:246-269, README.md:174-178),
- deterministic sort = replay order (util/FilesUtils.kt:70-84; the
  reference's TIME sort is unimplemented there and optional here),
- combine grouping per dir / per input dir / all
  (app/OptionsEnums.kt:28-45),
- schema-epoch split: a group is split into subgroups every time the file
  header changes, order-sensitively — a revert to an earlier schema still
  opens a NEW subgroup (util/FilesUtils.kt:288-327, doc comment :291-293;
  sample-changedSchema/README.md:2-3).

All of this is driver-side metadata work on file *listings* (cheap at any
scale); the data itself is only touched by executors via multi-path scans.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass
from enum import Enum


class SortMethod(str, Enum):
    PARAMS_ORDER = "paramsOrder"
    ALPHA = "alpha"
    TIME = "time"  # mtime; the reference declares but does not implement this


class CombineMode(str, Enum):
    NONE = "none"
    PER_DIR = "perDir"
    PER_INPUT_DIR = "perInputDir"
    ALL = "all"


def walk_inputs(paths: list[str], extensions: tuple[str, ...] = (".csv", ".json", ".parquet")) -> dict[str, list[str]]:
    """Expand files/dirs into {origin_path: [files]}. Dirs are walked
    recursively; only files with the given extensions are kept (reference:
    util/FilesUtils.kt:224 keeps only .csv)."""
    out: dict[str, list[str]] = {}
    for p in paths:
        if os.path.isdir(p):
            found: list[str] = []
            for root, _dirs, files in os.walk(p):
                for fn in files:
                    if fn.lower().endswith(extensions):
                        found.append(os.path.join(root, fn))
            out[p] = sorted(found)
        elif os.path.isfile(p):
            out[p] = [p]
        else:
            raise FileNotFoundError(p)
    return out


def filter_paths(
    paths: list[str], include: str | None = None, exclude: str | None = None
) -> list[str]:
    """Include-regex then exclude-regex over the whole path (full match),
    mirroring util/FilesUtils.kt:246-269."""
    inc = re.compile(include) if include else None
    exc = re.compile(exclude) if exclude else None
    out = []
    for p in paths:
        if inc is not None and not inc.fullmatch(p):
            continue
        if exc is not None and exc.fullmatch(p):
            continue
        out.append(p)
    return out


def sort_paths(paths: list[str], method: SortMethod = SortMethod.ALPHA) -> list[str]:
    if method == SortMethod.PARAMS_ORDER:
        return list(paths)
    if method == SortMethod.ALPHA:
        return sorted(paths)
    if method == SortMethod.TIME:
        return sorted(paths, key=lambda p: (os.path.getmtime(p), p))
    raise ValueError(method)


def group_inputs(
    expanded: dict[str, list[str]], mode: CombineMode
) -> dict[str, list[str]]:
    """Group files for combining (UNION ALL), per app/OptionsEnums.kt:28-45."""
    if mode == CombineMode.NONE:
        return {f: [f] for files in expanded.values() for f in files}
    if mode == CombineMode.PER_INPUT_DIR:
        return {origin: list(files) for origin, files in expanded.items() if files}
    if mode == CombineMode.PER_DIR:
        out: dict[str, list[str]] = {}
        for files in expanded.values():
            for f in files:
                out.setdefault(os.path.dirname(f), []).append(f)
        return out
    if mode == CombineMode.ALL:
        allf = [f for files in expanded.values() for f in files]
        root = os.path.commonpath(allf) if allf else ""
        return {root or "all": allf}
    raise ValueError(mode)


@dataclass
class SchemaEpoch:
    """One schema-homogeneous run of files (reference: CruncherInputSubpart)."""

    name: str
    files: list[str]
    header: tuple[str, ...]


def split_schema_epochs(
    name: str, files: list[str], header_of, suffix_from: int = 1
) -> list[SchemaEpoch]:
    """Split an ordered file group into epochs at every header change.
    Order-sensitive: re-split even when a schema reverts
    (util/FilesUtils.kt:288-327). Subgroups named ``<name>_1``, ``_2``, …
    only when a split actually happens (:314-318)."""
    epochs: list[SchemaEpoch] = []
    cur: SchemaEpoch | None = None
    for f in files:
        h = tuple(header_of(f))
        if cur is None or h != cur.header:
            cur = SchemaEpoch(name="", files=[], header=h)
            epochs.append(cur)
        cur.files.append(f)
    if len(epochs) == 1:
        epochs[0].name = name
    else:
        for i, e in enumerate(epochs):
            e.name = f"{name}_{suffix_from + i}"
    return epochs
