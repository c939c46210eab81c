"""Deterministic hash-based sampling and dataset splitting — the
training-data mixing primitives (per-language/per-source quotas, fixed
train/val/test assignment) a 100 TB corpus pipeline needs.

Why not ``df.sample()``: Spark's native sampler draws from a per-partition
RNG, so the selected rows change whenever partitioning, parallelism, or
the seed's task mapping changes — a re-run on a different cluster layout
yields a DIFFERENT sample, which is unacceptable for reproducible corpus
construction. Hashing the stable business key instead makes membership a
pure function of the row: the same document lands in the same
sample/split on every run, at every scale, on any engine (the DuckDB
oracle entry re-derives the exact row set from the same md5 math).

Mechanism: ``u = substr(md5(key || ':' || salt), 1, 8)`` is 8 lowercase
hex chars — uniform over [0, 2^32) — and fixed-width lowercase hex
compares lexicographically exactly like the integer it encodes, so
``u < format(floor(f * 2^32), '08x')`` keeps an f-fraction. Everything
is built-in JVM expressions (md5/substring/CASE): a pure narrow
projection+filter — no shuffle, no UDF, no driver state; stratum quotas
are a literal ``map`` lookup, not a join. Changing ``salt`` redraws an
independent sample; reusing a salt reproduces it bit-for-bit.

The reference has no sampling surface at all (closest is LIMIT in
delegated SQL, /root/reference/docs/Features.md); this is part of the
beyond-reference training-data layer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["hash_bucket", "hash_sample", "stratified_sample", "assign_split"]


def _hex_threshold(fraction: float) -> str:
    """Keep-threshold for the 8-hex uniform draw. ``"g"`` sorts after
    every hex string (keep-all); ``""`` sorts before (keep-none)."""
    if fraction <= 0.0:
        return ""
    if fraction >= 1.0:
        return "g"
    return format(int(fraction * 2**32), "08x")


def hash_bucket(key: Column, salt: str) -> Column:
    """The 8-hex-char uniform draw for ``key`` under ``salt`` (lowercase;
    compares like the uint32 it encodes). Exposed so callers can bucket
    on the same stream the samplers use (e.g. sharding, A/B cohorts)."""
    return F.substring(
        F.md5(F.concat_ws(":", key.cast("string"), F.lit(salt))), 1, 8
    )


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = "sample-v1"
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows by key hash. Same key +
    same salt → same decision, independent of partitioning, cluster
    size, or row order."""
    return df.filter(
        hash_bucket(F.col(key_col), salt) < F.lit(_hex_threshold(fraction))
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "mix-v1",
) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-mixing operator
    ("keep 50% of English, 10% of everything else"). The stratum →
    threshold table is a literal ``map`` expression, so the plan stays a
    single narrow filter regardless of how many strata are configured
    (no broadcast join, nothing to skew)."""
    if not fractions:
        return hash_sample(df, key_col, default_fraction, salt)
    pairs: list[Column] = []
    for stratum, frac in sorted(fractions.items()):
        pairs += [F.lit(stratum), F.lit(_hex_threshold(frac))]
    thr = F.coalesce(
        F.element_at(F.create_map(*pairs), F.col(stratum_col)),
        F.lit(_hex_threshold(default_fraction)),
    )
    return df.filter(hash_bucket(F.col(key_col), salt) < thr)


def assign_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    salt: str = "split-v1",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic disjoint dataset splits (train/val/test): partition
    the hash space by cumulative weight and label each row with the
    range its draw falls in. Every row gets exactly one label; weights
    are normalized, so {"train": 9, "val": 0.5, "test": 0.5} works. A
    key's split never changes across runs or data growth — documents
    added later cannot migrate existing keys between train and test
    (leakage-safe by construction)."""
    if not weights:
        raise ValueError("assign_split needs at least one split weight")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError(f"split weights must sum > 0, got {weights}")
    u = hash_bucket(F.col(key_col), salt)
    expr: Column | None = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        cond = u < F.lit(_hex_threshold(cum))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, out)
