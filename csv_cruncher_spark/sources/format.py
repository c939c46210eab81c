"""File-format sniffing (reference operator A1).

The reference decides CSV vs JSON per import by regex-matching the first
non-ignored line (/root/reference/src/main/kotlin/cz/dynawest/csvcruncher/
app/Options.kt:69-103, applied Cruncher.kt:70-92): a line starting with
``{`` or ``[`` is JSON; a comma/semicolon-separated header shape is CSV.
Provenance is tracked so explicit user choice wins over sniffing.

This is a driver-side peek at the first bytes of ONE file — never a Spark
job; at 100 TB the sniff cost is a single 64 KiB read.
"""

from __future__ import annotations

import re
from enum import Enum


class DataFormat(str, Enum):
    CSV = "csv"
    JSON = "json"


class FormatFrom(str, Enum):  # app/Options.kt:105 DataFormatFrom
    USER_OPTION = "user"
    EXTENSION = "extension"
    CONTENT = "content"
    DEFAULT = "default"


_JSON_START = re.compile(r"^\s*[\{\[]")
# a CSV header: 1+ identifier-ish cells split by , or ; (Options.kt:69-83)
_CSV_HEADER = re.compile(r"^#?\s*\"?[\w .\-]+\"?\s*([,;]\s*\"?[\w .\-]+\"?\s*)*$")


def detect_format_of_line(line: str) -> DataFormat | None:
    if _JSON_START.match(line):
        return DataFormat.JSON
    if _CSV_HEADER.match(line.rstrip("\r\n")):
        return DataFormat.CSV
    return None


def detect_format(path: str, ignore_first_lines: int = 0) -> tuple[DataFormat, FormatFrom]:
    """Sniff by extension first, content second (Cruncher.kt:70-92)."""
    low = path.lower()
    if low.endswith(".csv"):
        return DataFormat.CSV, FormatFrom.EXTENSION
    if low.endswith(".json"):
        return DataFormat.JSON, FormatFrom.EXTENSION
    with open(path, encoding="utf-8", errors="replace") as f:
        for i, line in enumerate(f):
            if i < ignore_first_lines or not line.strip():
                continue
            fmt = detect_format_of_line(line)
            if fmt is not None:
                return fmt, FormatFrom.CONTENT
            break
    return DataFormat.CSV, FormatFrom.DEFAULT


_COMMENT_PREFIX = "###"  # util/FilesUtils.kt:477


def parse_csv_header(path: str) -> list[str]:
    """Column names from the first non-comment CSV line: skip ``###`` lines,
    strip one leading ``#``, split on ``,`` or ``;``, trim quotes/space
    (util/FilesUtils.kt:422-449). Empty or duplicate names are errors
    (HsqlDbTableCreator.kt:22-24)."""
    with open(path, encoding="utf-8", errors="replace") as f:
        for line in f:
            if line.startswith(_COMMENT_PREFIX):
                continue
            line = line.rstrip("\r\n")
            if not line.strip():
                continue
            line = line.lstrip("#")
            cols = [c.strip().strip('"').strip("'").strip() for c in re.split(r"[,;]", line)]
            if any(not c for c in cols):
                raise ValueError(f"Empty column name in header of {path}: {cols}")
            if len(set(c.lower() for c in cols)) != len(cols):
                raise ValueError(f"Duplicate column names in header of {path}: {cols}")
            return cols
    raise ValueError(f"No header line found in {path}")
