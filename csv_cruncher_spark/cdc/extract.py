"""Deterministic HTML → text extraction (vectorized, Arrow-batched).

The north rule requires byte-identical extracted ``text`` per ``url``
regardless of partitioning, executor count, or replay order. The extraction
is therefore a pure function of the html bytes only: no locale, no
wall-clock, no partition context. ``extract_text`` is the single source of
truth; the Spark-side ``extract_text_udf`` is an Arrow-batched pandas UDF
that applies it per batch (no per-row Python UDF — the reference point for
this rule is BASELINE.json input_hint).

The reference (csv-cruncher) is format-agnostic and has no extraction step;
this operator is new-engine surface (SURVEY.md §2.D "HTML→text extraction").
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.column import Column

# Fixed, ordered entity table — deliberately NOT html.unescape (whose table
# can drift across Python versions); byte-stability beats completeness.
_ENTITIES: list[tuple[str, str]] = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # must be last so "&amp;lt;" → "&lt;" (text), not "<"
]

_RE_SCRIPT_STYLE = re.compile(r"<(script|style)\b.*?</\1\s*>", re.IGNORECASE | re.DOTALL)
_RE_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
_RE_TAG = re.compile(r"<[^>]*>", re.DOTALL)
_RE_WS = re.compile(r"\s+")


def extract_text(html: bytes | None) -> str | None:
    """Pure deterministic html-bytes → text. None in, None out."""
    if html is None:
        return None
    s = html.decode("utf-8", errors="replace")
    s = _RE_SCRIPT_STYLE.sub(" ", s)
    s = _RE_COMMENT.sub(" ", s)
    s = _RE_TAG.sub(" ", s)
    for ent, rep in _ENTITIES:
        s = s.replace(ent, rep)
    s = unicodedata.normalize("NFC", s)
    s = _RE_WS.sub(" ", s).strip()
    return s


def _extract_series(html: pd.Series) -> pd.Series:
    return html.map(extract_text)


def extract_text_udf(html_col: Column) -> Column:
    """Arrow-batched pandas UDF: binary html column → string text column."""
    udf = F.pandas_udf(_extract_series, "string")
    return udf(html_col)
