"""Percentile-threshold selection: "keep the top q fraction by score
(per stratum)" — the quality-curriculum filter a training pipeline runs
after scoring documents (length/repetition/classifier score), e.g.
keep the best half of every language.

Scale shape: the naive form is a ``percent_rank`` window per stratum —
a full sort of every stratum's rows. This implementation instead
computes the per-stratum score threshold with ONE partial-combined
``percentile`` aggregate (exact, no sort of the corpus — Spark's
percentile aggregates per-partition state), broadcasts the tiny
(stratum, threshold) frame back, and filters. The corpus is scanned
twice but never sorted and never shuffled; ties AT the threshold are
kept (``>=``), so the realized fraction can slightly exceed ``q`` when
the boundary value repeats — deterministic, layout-independent, and the
honest semantics for discrete scores.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["percentile_filter"]


def percentile_filter(
    df: DataFrame,
    score: str | Column,
    keep_fraction: float,
    stratum_col: str | None = None,
    threshold_out: str | None = None,
) -> DataFrame:
    """Rows whose ``score`` is at or above the per-stratum
    ``(1 - keep_fraction)`` percentile (exact interpolated percentile,
    NOT an approximation — correctness first; swap in
    ``percentile_approx`` at the call site when a sketch suffices).
    With ``stratum_col=None`` one global threshold applies. Pass
    ``threshold_out`` to keep the applied threshold as a column."""
    if not 0.0 < keep_fraction <= 1.0:
        raise ValueError(f"keep_fraction must be in (0, 1], got {keep_fraction}")
    score_c = F.col(score) if isinstance(score, str) else score
    p = 1.0 - keep_fraction
    df = df.withColumn("__score", score_c)
    if stratum_col is None:
        thr = df.agg(F.percentile("__score", p).alias("__thr"))
        out = df.join(F.broadcast(thr))
    else:
        thr = df.groupBy(stratum_col).agg(
            F.percentile("__score", p).alias("__thr")
        )
        out = df.join(F.broadcast(thr), stratum_col)
    out = out.filter(F.col("__score") >= F.col("__thr"))
    if threshold_out is not None:
        out = out.withColumn(threshold_out, F.col("__thr"))
    return out.drop("__score", "__thr")
