"""C4-style heuristic document cleanup (Raffel et al. 2020, §2.2 — the
cleaning rules behind the Colossal Clean Crawled Corpus), as a
ZERO-SHUFFLE projection: every rule is per-document, so the whole
operator is one codegen'd map over the corpus — no explode, no
aggregation, no exchange at any corpus size. (Contrast with
``boilerplate.remove_boilerplate_lines``, whose rules are
cross-document and genuinely need a shuffle.)

Line rules (applied to the ``sep``-split lines):

- keep only lines whose trimmed form ends in a terminal-punctuation
  character (``. ! ? "``);
- keep only lines with at least ``min_words`` whitespace-separated
  words;
- drop any line mentioning ``javascript`` (case-insensitive — the
  "please enable JavaScript" banner rule).

Document rules (drop the whole document when):

- it contains ``lorem ipsum`` (case-insensitive placeholder text);
- it contains a curly brace ``{`` (code marker);
- fewer than ``min_kept_lines`` lines survive the line rules
  (C4's "at least three sentences" gate, at line granularity).

NULL-text documents have no surviving lines and are dropped.

Every predicate is replayed verbatim by the DuckDB oracle
(string_split/list_filter/regexp_matches mirror split/filter/rlike),
so the operator is fully cross-engine checkable.

No reference counterpart (csv-cruncher has no corpus tooling);
beyond-reference training-data layer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["c4_clean"]


def c4_clean(
    df: DataFrame,
    id_col: str,
    text_col: str | Column,
    sep: str = "\n",
    min_words: int = 5,
    min_kept_lines: int = 3,
    out_col: str | None = None,
) -> DataFrame:
    """Surviving documents as ``(id, <out_col>, n_kept_lines,
    n_dropped_lines)`` with the text rebuilt from the kept lines in
    original order. ``sep`` is used both as the split regex and the
    re-join string — keep it a plain character."""
    if min_words < 1:
        raise ValueError(f"min_words must be >= 1, got {min_words}")
    if min_kept_lines < 1:
        raise ValueError(f"min_kept_lines must be >= 1, got {min_kept_lines}")
    out_col = out_col or (text_col if isinstance(text_col, str) else "text")
    text = F.col(text_col) if isinstance(text_col, str) else text_col

    def keep_line(x: Column) -> Column:
        t = F.trim(x)
        return (
            t.rlike('[.!?"]$')
            & (F.size(F.split(t, " +")) >= min_words)
            & ~F.lower(x).contains("javascript")
        )

    lines = F.split(text, sep)
    kept = F.filter(lines, keep_line)
    doc_ok = (
        ~F.lower(text).contains("lorem ipsum")
        & ~text.contains("{")
        & (F.size(kept) >= min_kept_lines)
    )
    return (
        df.withColumn("__kept", kept)
        .withColumn("__n_all", F.size(lines))
        # NULL text → NULL predicate → filtered out, as documented
        .where(doc_ok)
        .select(
            id_col,
            F.array_join("__kept", sep).alias(out_col),
            F.size("__kept").cast("long").alias("n_kept_lines"),
            (F.col("__n_all") - F.size("__kept")).cast("long").alias("n_dropped_lines"),
        )
    )
