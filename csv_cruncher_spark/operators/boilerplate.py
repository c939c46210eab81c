"""Boilerplate line removal (CCNet / RefinedWeb-style): lines that
repeat across many documents — navigation menus, cookie banners,
footers — are noise for training; the standard web-corpus cleanup mines
the cross-document line frequency and strips lines above a threshold
while preserving each document's remaining line order.

Scale shape: frequency mining is a two-level partial-combined
aggregation exactly like ``textstats.token_frequencies`` — per
(line, doc) first (collapses within-doc repeats map-side), then per
line — so line skew (the same banner in a billion docs) arrives at the
second stage pre-combined to one row per (line, doc)… and the first
stage's combine keeps even that bounded per task. Removal is an anti
join against the mined set, which the ``min_docs`` threshold keeps far
smaller than the corpus (AQE broadcasts it when it fits); rebuilding
the text is one exchange on the doc id with an order-restoring sorted
collect.

No reference counterpart (csv-cruncher has no corpus tooling); part of
the beyond-reference training-data layer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import _spread

__all__ = [
    "boilerplate_lines",
    "remove_boilerplate_lines",
    "dedup_paragraphs",
]


def _lines(df: DataFrame, id_col: str, text_col: str | Column, sep: str) -> DataFrame:
    # posexplode_outer: a NULL-text document yields ONE (NULL, NULL)
    # line row instead of vanishing — consumers rebuild it as empty text
    # with 0/0 counts rather than silently dropping the id
    text = F.col(text_col) if isinstance(text_col, str) else text_col
    return _spread(df).select(
        F.col(id_col).alias("id"),
        F.posexplode_outer(F.split(text, sep)).alias("line_no", "line"),
    )


def boilerplate_lines(
    df: DataFrame,
    id_col: str,
    text_col: str | Column,
    sep: str = "\n",
    min_docs: int = 2,
) -> DataFrame:
    """(line, n_docs) for every line occurring in at least ``min_docs``
    DISTINCT documents. Two-level aggregation: within-doc repeats
    collapse in the first partial-combined stage, so no count-distinct
    Expand and no skewed reduce key ever carries more than one row per
    (line, doc)."""
    if min_docs < 1:
        raise ValueError(f"min_docs must be >= 1, got {min_docs}")
    per_doc = (
        _lines(df, id_col, text_col, sep)
        .filter(F.col("line").isNotNull())  # NULL-text placeholder rows
        .groupBy("line", "id")
        .agg(F.lit(1).alias("__one"))
    )
    return (
        per_doc.groupBy("line")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def remove_boilerplate_lines(
    df: DataFrame,
    id_col: str,
    text_col: str | Column,
    sep: str = "\n",
    min_docs: int = 2,
    boiler: DataFrame | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Each document's text rebuilt without its boilerplate lines, in
    original line order: (id, <out_col>, n_kept_lines, n_removed_lines).
    Pass ``boiler=`` (from :func:`boilerplate_lines`, possibly mined on
    a different/larger corpus) to reuse a mined set across batches —
    the incremental-ingest shape; otherwise it is mined from ``df``.

    Documents whose every line is boilerplate survive with empty text
    (dropping them is the caller's policy decision, not this
    operator's)."""
    out_col = out_col or (text_col if isinstance(text_col, str) else "text")
    if boiler is None:
        boiler = boilerplate_lines(df, id_col, text_col, sep, min_docs)
    lines = _lines(df, id_col, text_col, sep)
    # mark (left join) instead of remove (anti join): ONE corpus scan and
    # ONE exchange rebuilds the text AND counts kept/removed — collect_list
    # skips the nulls the WHEN produces for boilerplate rows, so the
    # filtered, order-restored concat happens inside the same aggregate
    marked = lines.join(
        boiler.select("line").withColumn("__boiler", F.lit(1)), "line", "left"
    )
    # NULL-text placeholder rows (line IS NULL) are neither kept nor
    # removed: the doc survives as empty text with 0/0 counts
    keep = F.col("__boiler").isNull() & F.col("line").isNotNull()
    return marked.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(keep, F.struct("line_no", "line")))
                ),
                lambda s: s["line"],
            ),
            sep,
        ).alias(out_col),
        F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("n_kept_lines"),
        F.sum(F.when(F.col("__boiler").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_removed_lines"),
    ).withColumnRenamed("id", id_col)


def dedup_paragraphs(
    df: DataFrame,
    id_col: str,
    text_col: str | Column,
    sep: str = "\n\n",
    min_chars: int = 1,
    out_col: str | None = None,
) -> DataFrame:
    """MassiveText-style exact duplicate-paragraph removal: every
    paragraph that occurs more than once in the corpus keeps only its
    FIRST occurrence — the lowest ``(doc id, position)`` — and every
    later occurrence, whether in another document or later in the same
    one, is dropped; each document's text is rebuilt from its surviving
    paragraphs in original order.

    Distinct from :func:`remove_boilerplate_lines`, which strips ALL
    occurrences of lines above a document-frequency threshold: this is
    threshold-free and keeps exactly one copy of every repeated
    paragraph ("we remove all but one of any exact duplicate
    paragraphs" — the Gopher/MassiveText cleanup rule).

    Paragraphs shorter than ``min_chars`` are exempt (always kept), so
    structural stubs — empty separator runs, one-word headings — never
    collapse to a single survivor across the whole corpus.

    Returns ``(id, <out_col>, n_kept_paras, n_removed_paras)``.

    Scale shape: the first-occurrence winner per paragraph is ONE
    partial-combinable aggregation ``min(struct(id, pos))`` grouped by
    the paragraph's md5 fingerprint — never a window over the raw text,
    and the 32-hex key is uniformly distributed by construction, so the
    billion-copy banner that skews boilerplate mining arrives at the
    reduce pre-combined to one row per map task. The join back is on
    that same uniform fingerprint; paragraph text rides exactly one
    well-spread exchange (it must — the rebuild needs it), and the
    order-restoring rebuild is the same single doc-id exchange as
    :func:`remove_boilerplate_lines`. md5's 128 bits make a fingerprint
    collision (two DIFFERENT paragraphs merging their keep-first
    groups) negligible at any corpus size.

    No reference counterpart; beyond-reference training-data layer.
    """
    if min_chars < 0:
        raise ValueError(f"min_chars must be >= 0, got {min_chars}")
    out_col = out_col or (text_col if isinstance(text_col, str) else "text")
    paras = _lines(df, id_col, text_col, sep)
    exempt = F.length("line") < min_chars
    marked = paras.withColumn("__fp", F.when(~exempt, F.md5("line")))
    winners = (
        marked.filter(F.col("__fp").isNotNull())
        .groupBy("__fp")
        .agg(F.min(F.struct("id", "line_no")).alias("__w"))
    )
    joined = marked.join(winners, "__fp", "left")
    # exempt rows carry a NULL fingerprint, join to nothing, and survive;
    # fingerprinted rows survive only as their group's first occurrence;
    # a NULL-text doc's (NULL, NULL) placeholder row is neither kept nor
    # removed — the doc survives as empty text with 0/0 counts
    removed = F.col("__w").isNotNull() & (
        F.struct("id", "line_no") != F.col("__w")
    )
    keep = ~removed & F.col("line").isNotNull()
    return (
        joined.groupBy("id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.when(keep, F.struct("line_no", "line")))
                    ),
                    lambda s: s["line"],
                ),
                sep,
            ).alias(out_col),
            F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("n_kept_paras"),
            F.sum(F.when(removed, 1).otherwise(0))
            .cast("long")
            .alias("n_removed_paras"),
        )
        .withColumnRenamed("id", id_col)
    )
